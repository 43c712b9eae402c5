"""Eleventh query wave — training-corpus curation operators.

Four steps a large-scale LLM data pipeline runs AFTER dedup (x1/x2/x13)
and cleaning (x12), each with an exact DuckDB oracle:

- x16 benchmark decontamination: flag training documents sharing any
  word n-gram with a held-out benchmark set (the GPT-3-style 13-gram
  overlap check, scaled to n=5 for the synthetic corpus). Scale shape:
  the benchmark side is tiny (eval sets are thousands of docs, not
  billions) — its shingle set broadcasts, so the corpus is ONE scan +
  ONE broadcast join + one groupBy on doc_id; the corpus never shuffles
  by shingle.
- x17 TF-IDF top terms: per-document top-3 salient terms. Shuffles:
  one on (doc, term) for TF, one on term for the DF join, one on
  doc_id for the top-k window — every key is fine-grained so no single
  task ever sees more than one document's terms. The DF table is
  deliberately NOT broadcast: it has one row per distinct token, which
  at 100 TB is hundreds of millions of rows — a shuffled equi-join on
  the unskewed fine-grained `term` key is the scale-safe plan.
- x18 vocabulary heavy-hitters: global top-50 tokens. The global sort
  is TakeOrderedAndProject over per-partition top-50s — no global
  shuffle, driver merges 32×50 rows.
- x19/x20 deterministic sampling: md5-derived per-row buckets (both
  engines compute the identical hash) make the sample reproducible and
  embarrassingly parallel — no shuffle at all for the stratified rate
  sample; one partitioned window for the per-source quota.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.operators import dedup
from streaming_data_spark.queries import _t

# --------------------------------------------------------------------------
# shared SQL fragments
# --------------------------------------------------------------------------


def _sql_shingles(n: int) -> str:
    """DuckDB CTE producing (doc_id, s): distinct word n-grams per doc.
    Mirrors operators.dedup.shingles (docs shorter than n tokens yield
    no rows — range(1, len-(n-2)) is empty)."""
    gram = " || ' ' || ".join(f"t[i+{j}]" if j else "t[i]" for j in range(n))
    return rf"""
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, len(t) - {n - 2}), i -> {gram})
  )) AS s
  FROM toks
)"""


# --------------------------------------------------------------------------
# X16 — benchmark decontamination (n-gram overlap vs held-out set)
# --------------------------------------------------------------------------

_DECON_N = 5
_BENCH_MOD = 20  # doc_id % 20 == 0 plays the role of the benchmark set


def q_x16_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs contaminated by benchmark n-gram overlap:
    (doc_id, n_shared_grams, n_bench_docs). Drop these before training.

    The benchmark shingle set is broadcast — the training corpus is
    never shuffled, only scanned and probed."""
    docs = _t(spark, sf_dir, "documents")
    sh = dedup.shingles(docs, "doc_id", "text", n=_DECON_N)
    is_bench = F.pmod(F.col("doc_id"), F.lit(_BENCH_MOD)) == 0
    bench = sh.filter(is_bench).select(
        F.col("doc_id").alias("bench_id"), F.col("shingle")
    )
    train = sh.filter(~is_bench)
    return (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("shingle").alias("n_shared_grams"),
            F.count_distinct("bench_id").alias("n_bench_docs"),
        )
    )


SQL_X16 = f"""
WITH {_sql_shingles(_DECON_N)}
SELECT tr.doc_id,
       count(DISTINCT tr.s) AS n_shared_grams,
       count(DISTINCT be.doc_id) AS n_bench_docs
FROM sh tr
JOIN sh be ON tr.s = be.s
WHERE tr.doc_id % {_BENCH_MOD} <> 0
  AND be.doc_id % {_BENCH_MOD} = 0
GROUP BY tr.doc_id
"""

# --------------------------------------------------------------------------
# X17 — TF-IDF top terms per document
# --------------------------------------------------------------------------

_TOP_TERMS = 3


def q_x17_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 salient terms per document by smoothed TF-IDF
    (tf · ln((N+1)/(df+1))), deterministic tie-break on term.

    The rank orders by the ROUNDED score so both engines agree even at
    float-ulp boundaries.

    Scale note: the document-frequency table grows with the distinct
    vocabulary (hundreds of millions of rows at 100 TB), so it joins
    via a plain shuffled equi-join on `term` — never a broadcast. The
    scalar corpus size DOES broadcast (one row)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq.hint("shuffle_hash"), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _TOP_TERMS)
        .select("doc_id", "term", "tf", "tfidf", "rank")
    )


SQL_X17 = rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * ln(((SELECT count(*) FROM documents) + 1) * 1.0
                          / (dfreq.df + 1)), 6) AS tfidf
  FROM tf JOIN dfreq USING (term)
), ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
         )::BIGINT AS rank
  FROM scored
)
SELECT doc_id, term, tf, tfidf, rank FROM ranked WHERE rank <= {_TOP_TERMS}
"""

# --------------------------------------------------------------------------
# X18 — vocabulary heavy-hitters (global top-50 tokens)
# --------------------------------------------------------------------------

_VOCAB_K = 50


def q_x18_vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-50 tokens by occurrence count, deterministic
    tie-break on token. orderBy().limit() compiles to
    TakeOrderedAndProject — per-partition top-50s merged on the
    driver, no global sort shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(_VOCAB_K)
    )


SQL_X18 = rf"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents
)
SELECT token, count(*) AS n_occurrences
FROM toks
GROUP BY token
ORDER BY n_occurrences DESC, token ASC
LIMIT {_VOCAB_K}
"""

# --------------------------------------------------------------------------
# X19 — deterministic stratified sample (per-language rates)
# --------------------------------------------------------------------------

# en is over-represented in the corpus (~44%); downsample it, keep the
# long-tail languages at a higher rate — the standard mixing rebalance.
_RATES_PCT = {"en": 30, "de": 60, "es": 60, "fr": 60, "zh": 60}
_DEFAULT_PCT = 50


def _hash_bucket(col: F.Column) -> F.Column:
    """md5-derived bucket in [0, 100) — identical in DuckDB via
    ('0x' || substr(md5(x), 1, 7))::BIGINT % 100."""
    return F.pmod(
        F.conv(F.substring(F.md5(col.cast("string")), 1, 7), 16, 10).cast("long"),
        F.lit(100),
    )


def q_x19_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified sample: keep a doc iff its md5 bucket
    falls under its language's rate. Pure per-row predicate — no
    shuffle, no RNG state, same sample on every run and every engine."""
    docs = _t(spark, sf_dir, "documents")
    rate = F.lit(_DEFAULT_PCT)
    for lang, pct in _RATES_PCT.items():
        rate = F.when(F.col("lang") == lang, pct).otherwise(rate)
    return docs.select(
        "doc_id", "lang", _hash_bucket(F.col("doc_id")).alias("bucket")
    ).filter(F.col("bucket") < rate)


_RATE_CASE = " ".join(
    f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in _RATES_PCT.items()
)

SQL_X19 = f"""
SELECT doc_id, lang,
       ('0x' || substr(md5(doc_id::VARCHAR), 1, 7))::BIGINT % 100 AS bucket
FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 7))::BIGINT % 100
      < (CASE {_RATE_CASE} ELSE {_DEFAULT_PCT} END)
"""

# --------------------------------------------------------------------------
# X20 — per-source quota sample (domain mixing)
# --------------------------------------------------------------------------

_QUOTA = 10


def q_x20_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly ≤10 docs per source, picked in deterministic md5 order
    (a shuffled-but-reproducible draw). One partitioned window keyed by
    source — each task ranks one source's docs; no global ordering."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        _hash_bucket(F.col("doc_id")).asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("pick_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("pick_rank") <= _QUOTA)
    )


SQL_X20 = f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 7))::BIGINT % 100 ASC,
                    doc_id ASC
         )::BIGINT AS pick_rank
  FROM documents
)
SELECT doc_id, source, pick_rank FROM ranked WHERE pick_rank <= {_QUOTA}
"""


EXT11_QUERIES = {
    "x16_decontaminate": q_x16_decontaminate,
    "x17_tfidf_terms": q_x17_tfidf_terms,
    "x18_vocab_top_tokens": q_x18_vocab_top_tokens,
    "x19_stratified_sample": q_x19_stratified_sample,
    "x20_source_quota": q_x20_source_quota,
}

EXT11_ORACLES = {
    "x16_decontaminate": SQL_X16,
    "x17_tfidf_terms": SQL_X17,
    "x18_vocab_top_tokens": SQL_X18,
    "x19_stratified_sample": SQL_X19,
    "x20_source_quota": SQL_X20,
}
