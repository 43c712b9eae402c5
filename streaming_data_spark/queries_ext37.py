"""Thirty-seventh query wave — corpus statistics for curation and
retrieval, completing the LM/text family (x31 bigram LM, x35 LM score,
x30 inverted index are the ancestors):

- x38_pmi_collocations: pointwise mutual information over the bigram
  table's own margins — the classic collocation detector (Church &
  Hanks 1990), the filter that separates "new york" from "of the" in
  tokenizer/vocab curation.
- x39_char_entropy: per-document character-distribution Shannon
  entropy — the gibberish/boilerplate signal (low entropy = repeated
  filler, high = encrypted/binary junk) used alongside the Gopher
  heuristics (x22). Computed as ln(n) − Σc·ln(c)/n (one identical
  FP formula on both engines).
- x40_bm25: BM25 (k1=1.2, b=0.75, the Robertson/Sparck-Jones idf
  with +1 floor) for a fixed keyword query over the corpus — the
  ranking function a user of the inverted index (x30) actually runs.
  Document length rides the token explode (no separate doc join);
  the per-term idf table is bounded by |query| and broadcasts.

Scale shapes: all three are explode → map-side-combinable groupBys
keyed on vocabulary-grade keys; x38's margin joins are vocab⋈vocab
(never broadcast — the x17 rule); x40's only joins are the |query|-row
idf broadcast and the 1-row avgdl scalar. Float contract: single-op
log/division stays IEEE-exact; cross-group sums round to 6.

[EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t

PMI_MIN_COUNT = 20
BM25_TERMS = ("stream", "join", "batch")
BM25_K1 = 1.2
BM25_B = 0.75


def q_x38_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI over bigram-event margins: pmi = ln(n12·N / (n1·n2)) where
    n1/n2 are the first/second-position margins and N the total
    bigram count; bigrams with n12 ≥ PMI_MIN_COUNT only."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    m = F.size(toks) - 1
    grams = F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    inst = docs.select(
        F.explode(F.when(F.size(toks) >= 2, grams)).alias("g")
    ).select("g.w1", "g.w2")
    big = inst.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    m1 = inst.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    m2 = inst.groupBy("w2").agg(F.count(F.lit(1)).alias("n2"))
    total = docs.agg(
        F.sum(F.greatest(m, F.lit(0))).alias("n_total")
    )
    return (
        big.filter(F.col("n12") >= PMI_MIN_COUNT)
        .join(m1, "w1")
        .join(m2, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n12",
            F.round(
                F.log(
                    (F.col("n12") * F.col("n_total"))
                    / (F.col("n1") * F.col("n2"))
                ),
                6,
            ).alias("pmi"),
        )
    )


SQL_X38 = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr FROM documents
),
inst AS (
  SELECT arr[i] AS w1, arr[i + 1] AS w2
  FROM toks, unnest(generate_series(1, len(arr) - 1)) AS g(i)
),
big AS (SELECT w1, w2, count(*) AS n12 FROM inst GROUP BY w1, w2),
m1 AS (SELECT w1, count(*) AS n1 FROM inst GROUP BY w1),
m2 AS (SELECT w2, count(*) AS n2 FROM inst GROUP BY w2),
tot AS (SELECT count(*) AS n_total FROM inst)
SELECT b.w1, b.w2, CAST(b.n12 AS BIGINT) AS n12,
       round(ln((b.n12 * t.n_total) / (CAST(m1.n1 AS BIGINT) * m2.n2)), 6)
         AS pmi
FROM big b JOIN m1 USING (w1) JOIN m2 USING (w2), tot t
WHERE b.n12 >= {PMI_MIN_COUNT}
"""


def q_x39_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution Shannon entropy (nats):
    H = ln(n) − Σ c·ln(c) / n over the character histogram."""
    docs = _t(spark, sf_dir, "documents")
    # empty/NULL docs are excluded in BOTH engines: entropy of an
    # empty string is undefined, and the engines disagree on
    # splitting '' (Spark → [], DuckDB regexp_split_to_array → [''])
    chars = docs.filter(F.length("text") > 0).select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    )
    hist = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    return (
        hist.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_chars_obs"),
            F.sum(F.col("c") * F.log("c")).alias("_clogc"),
        )
        .select(
            "doc_id",
            "n_chars_obs",
            F.round(
                F.log("n_chars_obs") - F.col("_clogc") / F.col("n_chars_obs"), 6
            ).alias("entropy"),
        )
    )


SQL_X39 = """
WITH chars AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS ch
  FROM documents WHERE length(text) > 0
),
hist AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch),
agg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars_obs,
         sum(c * ln(c)) AS clogc
  FROM hist GROUP BY doc_id
)
SELECT doc_id, n_chars_obs,
       round(ln(n_chars_obs) - clogc / n_chars_obs, 6) AS entropy
FROM agg
"""


def q_x40_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 score of every document matching the fixed keyword query
    BM25_TERMS (k1=1.2, b=0.75, idf = ln((N−df+0.5)/(df+0.5) + 1))."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    # doc length rides the explode — no separate doc-length join
    inst = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        F.explode(toks).alias("term"),
    ).filter(F.col("term").isin(*BM25_TERMS))
    tf = inst.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(toks)).alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = (
        dfreq.crossJoin(F.broadcast(stats))
        .select(
            "term",
            "n_docs",
            "avgdl",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ).alias("idf"),
        )
    )
    k1, b = BM25_K1, BM25_B
    scored = tf.join(F.broadcast(idf), "term").select(
        "doc_id",
        (
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            )
        ).alias("part"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum("part"), 6).alias("bm25"),
        )
    )


SQL_X40 = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr FROM documents
),
inst AS (
  SELECT doc_id, len(arr) AS dl, unnest(arr) AS term FROM toks
),
matched AS (
  SELECT * FROM inst WHERE term IN ('stream', 'join', 'batch')
),
tf AS (
  SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
  FROM matched GROUP BY doc_id, term
),
stats AS (
  SELECT count(*) AS n_docs, avg(len(arr)) AS avgdl FROM toks
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
idf AS (
  SELECT term, ln((s.n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf, s.avgdl
  FROM dfreq, stats s
)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       round(sum(i.idf * (t.tf * ({BM25_K1} + 1.0))
                 / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                    + {BM25_B} * t.dl / i.avgdl))), 6) AS bm25
FROM tf t JOIN idf i USING (term)
GROUP BY t.doc_id
"""


EXT37_QUERIES = {
    "x38_pmi_collocations": q_x38_pmi_collocations,
    "x39_char_entropy": q_x39_char_entropy,
    "x40_bm25": q_x40_bm25,
}

EXT37_ORACLES = {
    "x38_pmi_collocations": SQL_X38,
    "x39_char_entropy": SQL_X39,
    "x40_bm25": SQL_X40,
}
