"""Nineteenth query wave — entity resolution and corpus statistics:

- x29_fuzzy_match: blocked fuzzy string matching (edit distance) —
  the entity-resolution primitive behind catalog/name reconciliation.
  Blocking (shared first token) bounds the candidate pairs exactly
  like the shingle equi-join bounds X2: pairs materialize only inside
  a block, never n² across the catalog. ``levenshtein`` is a built-in
  in BOTH engines, so the oracle is exact.
- x30_inverted_index: posting-list build (token → document frequency,
  total term frequency, first-K sorted postings) — the search-index
  construction pass. Hot tokens are the skew hazard; postings are
  capped at K per token (documented, like dedup's hot_shingle_cap)
  and emitted as a joined string so the oracle compare is exact.
- x31_bigram_lm: corpus bigram statistics with conditional
  probabilities P(w2|w1) — the n-gram LM counting pass (public
  Katz/KenLM-style counts, no smoothing here). Bigrams come from the
  same shifted-slice zip as dedup.shingles (linear per row, no
  re-tokenize-per-element trap).
- a18_equidepth_hist: exact equi-depth (ntile) histogram of document
  lengths — percentile binning with deterministic tiebreak. The
  global sort is the documented exact-tier cost; the production tier
  at 100 TB is approx_percentile boundaries (tolerance-tested next to
  the other sketch tiers).

[EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t

POSTINGS_K = 10


def q_x29_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part-name pairs: block on the shared first
    token, keep pairs with edit distance ≤ 4 (strict: > 0 excludes
    exact equals — those are X1's job).

    Shape: dedupe names (64 distinct here; ~millions in a real
    catalog), one equi-join on the block key, per-pair levenshtein —
    cost is Σ block², bounded by the blocking choice, never |catalog|².
    The id< guard keeps each unordered pair once.
    """
    part = _t(spark, sf_dir, "part")
    names = (
        part.select(F.col("p_name").alias("name"))
        .distinct()
        .withColumn("blk", F.split("name", r"\s+")[0])
    )
    a = names.select(F.col("name").alias("name_a"), "blk")
    b = names.select(F.col("name").alias("name_b"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 4)
        .select("name_a", "name_b", "dist")
    )


SQL_X29 = """
WITH names AS (
  SELECT DISTINCT p_name AS name,
         regexp_split_to_array(p_name, '\\s+')[1] AS blk
  FROM part
)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
FROM names a JOIN names b USING (blk)
WHERE a.name < b.name AND levenshtein(a.name, b.name) <= 4
"""


def q_x30_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the corpus: per token, document frequency,
    total term frequency, and the first-10 posting doc_ids
    (ascending, comma-joined).

    One explode + ONE groupBy; df/tf are map-side-combinable. The
    posting list is the unbounded part — collect_set per token is
    capped to POSTINGS_K AFTER sorting, which bounds OUTPUT size but
    not aggregation state for stopword-grade tokens; at 100 TB the
    production guard is the same df-threshold drop the Jaccard path
    uses (hot tokens carry no retrieval signal). Kept uncapped-state
    here because the oracle needs the exact first-K.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token"),
    )
    # r16: df = size of the SAME distinct set the postings column
    # already aggregates — a separate countDistinct forced Spark's
    # two-phase distinct-aggregate rewrite (an extra Expand +
    # re-aggregation exchange) for a value the collect_set state
    # provides for free. One groupBy, one exchange; identical values.
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.sort_array(F.collect_set("doc_id")).alias("_set"),
        )
        .select(
            "token",
            F.size("_set").alias("df"),
            "tf",
            F.array_join(F.slice("_set", 1, POSTINGS_K), ",").alias("postings"),
        )
    )


SQL_X30 = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
)
SELECT token,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS tf,
       array_to_string(list(DISTINCT doc_id ORDER BY doc_id)[1:{POSTINGS_K}], ',')
         AS postings
FROM toks
GROUP BY token
"""


def q_x31_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts + conditional probability P(w2|w1) for
    bigrams seen ≥ 20 times.

    Bigrams are built per row with shifted array slices (linear in
    doc length — see dedup.shingles for why not element_at-per-index)
    then counted in one groupBy; the unigram (context) counts reuse
    the same token explode and broadcast back onto the bigram table
    (vocabulary here is small; at web scale this join flips to a
    keyed shuffle exactly like X17's document-frequency join — same
    rule: broadcast only what cannot grow with the corpus).
    """
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    m = F.size(toks) - 1
    grams = F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    bigrams = (
        docs.select(F.explode(F.when(F.size(toks) >= 2, grams)).alias("g"))
        .select("g.w1", "g.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_bigram"))
    )
    unigrams = (
        docs.select(F.explode(toks).alias("w1"))
        # drop the per-doc LAST token: it opens no bigram context, and
        # P(w2|w1) must condition on contexts, not raw occurrences
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("n_w1_raw"))
    )
    last_toks = (
        docs.select(F.element_at(toks, -1).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("n_last"))
    )
    ctx = (
        unigrams.join(last_toks, "w1", "left")
        .select(
            "w1",
            (F.col("n_w1_raw") - F.coalesce("n_last", F.lit(0))).alias("n_ctx"),
        )
    )
    return (
        bigrams.filter(F.col("n_bigram") >= 20)
        .join(ctx, "w1")
        .select(
            "w1",
            "w2",
            "n_bigram",
            F.round(F.col("n_bigram") / F.col("n_ctx"), 6).alias("p_cond"),
        )
    )


SQL_X31 = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr FROM documents
),
bigrams AS (
  SELECT arr[i] AS w1, arr[i + 1] AS w2, count(*) AS n_bigram
  FROM toks, unnest(generate_series(1, len(arr) - 1)) AS g(i)
  GROUP BY arr[i], arr[i + 1]
),
ctx AS (
  SELECT arr[i] AS w1, count(*) AS n_ctx
  FROM toks, unnest(generate_series(1, len(arr) - 1)) AS g(i)
  GROUP BY arr[i]
)
SELECT b.w1, b.w2, CAST(b.n_bigram AS BIGINT) AS n_bigram,
       round(b.n_bigram / CAST(c.n_ctx AS DOUBLE), 6) AS p_cond
FROM bigrams b JOIN ctx c USING (w1)
WHERE b.n_bigram >= 20
"""


def q_a18_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth histogram of document lengths: 8 ntile
    buckets, each with its count and [min, max] length span.

    ntile needs a GLOBAL order — the documented exact-tier cost (one
    single-partition window at the bucketing step; the input to it is
    just (n_chars, doc_id), not the documents). doc_id tiebreak makes
    bucket assignment total and both engines agree exactly. The 100 TB
    tier replaces the sort with approx_percentile bucket boundaries.
    """
    docs = _t(spark, sf_dir, "documents")
    w = Window.orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "n_chars")
        .withColumn("bucket", F.ntile(8).over(w))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("len_min"),
            F.max("n_chars").alias("len_max"),
        )
    )


SQL_A18 = """
WITH ranked AS (
  SELECT doc_id, n_chars,
         ntile(8) OVER (ORDER BY n_chars ASC, doc_id ASC) AS bucket
  FROM documents
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
       min(n_chars) AS len_min, max(n_chars) AS len_max
FROM ranked
GROUP BY bucket
"""


EXT19_QUERIES = {
    "x29_fuzzy_match": q_x29_fuzzy_match,
    "x30_inverted_index": q_x30_inverted_index,
    "x31_bigram_lm": q_x31_bigram_lm,
    "a18_equidepth_hist": q_a18_equidepth_hist,
}

EXT19_ORACLES = {
    "x29_fuzzy_match": SQL_X29,
    "x30_inverted_index": SQL_X30,
    "x31_bigram_lm": SQL_X31,
    "a18_equidepth_hist": SQL_A18,
}
