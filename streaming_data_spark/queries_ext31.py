"""Thirty-first query wave — LM-based document quality scoring:

- x35_lm_score: per-document mean log-probability under the corpus's
  own bigram LM — the perplexity-proxy quality filter of CCNet-style
  curation pipelines (docs whose word sequences are improbable under
  the corpus distribution are boilerplate/gibberish candidates; the
  public method trains KenLM and buckets by perplexity, this is the
  engine-native n=2 analog). Because the LM is estimated from the
  SAME corpus being scored, every scored bigram has count ≥ 1 and
  P(w2|w1) ≥ 1/n_ctx > 0 — no smoothing branch needed, and the
  oracle stays exact.

Shape: one tokenize pass emits bigram-instance rows (doc_id, w1, w2);
bigram and context counts are two groupBys over those instances; the
score join is instance ⋈ (w1, w2)-keyed probabilities — a keyed
SHUFFLE join on both sides, NOT a broadcast, because bigram
vocabulary grows with the corpus (same rule as X17's document-
frequency join). Hot bigrams ("of the") are the skew hazard at
100 TB; the salting pattern from operators/skew.py applies to the
join key unchanged. Float contract: ln() of an IEEE-exact ratio may
differ by an ulp across libm implementations, and the per-doc mean is
an order-dependent sum — round(6) on the final mean absorbs both.

Cites: reference quality gating is length/lang heuristics
(upbit pipeline has none; documents table is this repo's LLM-corpus
extension), composed with operators/text.py metrics in
x12_clean_corpus. [EXT] per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streaming_data_spark.queries import _t


def q_x35_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, avg_logp): mean ln P(w2|w1) over each
    document's bigram instances; docs with <2 tokens emit nothing.
    Thin registry wrapper over operators/text.lm_scores (one
    implementation — the curation job's LM-band stage reuses it)."""
    from streaming_data_spark.operators import text as txt

    return txt.lm_scores(_t(spark, sf_dir, "documents"))


SQL_X35 = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr FROM documents
),
inst AS (
  SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
  FROM toks, unnest(generate_series(1, len(arr) - 1)) AS g(i)
),
big AS (SELECT w1, w2, count(*) AS n_bigram FROM inst GROUP BY 1, 2),
ctx AS (SELECT w1, count(*) AS n_ctx FROM inst GROUP BY 1)
SELECT i.doc_id,
       count(*) AS n_bigrams,
       round(avg(ln(b.n_bigram / CAST(c.n_ctx AS DOUBLE))), 6) AS avg_logp
FROM inst i
JOIN big b ON b.w1 = i.w1 AND b.w2 = i.w2
JOIN ctx c ON c.w1 = i.w1
GROUP BY i.doc_id
"""


EXT31_QUERIES = {
    "x35_lm_score": q_x35_lm_score,
}

EXT31_ORACLES = {
    "x35_lm_score": SQL_X35,
}
