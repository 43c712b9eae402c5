"""Eighth query wave — temporal range join, deterministic dataset
splitting, and the composed corpus-cleaning pipeline.

These are the remaining "what a 100 TB training-data user runs"
shapes: joining events into time windows (the range-join complement
of as-of), carving reproducible train/test splits without sampling
nondeterminism, and the quality-filter → dedup → stats pipeline that
gates a crawl drop before it reaches training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.operators import dedup, joins, text
from streaming_data_spark.queries import _t

# --------------------------------------------------------------------------
# J5 — interval/range join (events into promo windows)
# --------------------------------------------------------------------------

def q_j5_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each lineitem shipped inside a 7-day window opened by a sampled
    set of orders (no shared key — a pure range predicate). The
    operator buckets both sides by day and equi-joins, so the plan is
    a keyed shuffle + in-bucket filter, NEVER a nested-loop over
    |facts|×|intervals|. Oracle runs the naive inequality join.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_shipdate")
    windows = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 601 == 0)  # deterministic sample
        .select(
            F.col("o_orderkey").alias("window_id"),
            F.col("o_orderdate").alias("w_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("w_end"),
        )
    )
    out = joins.interval_join(li, windows, "l_shipdate", "w_start", "w_end")
    return out.groupBy("window_id", "w_start").agg(
        F.count(F.lit(1)).alias("n_shipments"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


SQL_J5 = """
SELECT window_id, w_start,
       count(*) AS n_shipments,
       min(l_shipdate) AS first_ship,
       max(l_shipdate) AS last_ship
FROM (
  SELECT o_orderkey AS window_id, o_orderdate AS w_start,
         o_orderdate + INTERVAL 7 DAY AS w_end
  FROM orders WHERE o_orderkey % 601 = 0
) w
JOIN lineitem ON l_shipdate >= w_start AND l_shipdate < w_end
GROUP BY window_id, w_start
"""

# --------------------------------------------------------------------------
# X11 — deterministic train/test split (portable hash, no RNG)
# --------------------------------------------------------------------------

SPLIT_TEST_PCT = 10  # rows whose hash bucket < this go to 'test'


def split_column(id_col: str = "doc_id", pct: int = SPLIT_TEST_PCT) -> F.Column:
    """'train'/'test' label from a PORTABLE deterministic hash of the
    id (first 7 md5 hex chars mod 100 — same math in any engine).
    Reproducible across runs, engines, and cluster sizes, unlike
    ``df.sample``/``randomSplit`` whose output depends on partitioning
    and seed plumbing. Filter-pushdown-friendly: the label is a pure
    column function, so ``WHERE split = 'train'`` prunes at scan time
    with zero shuffle."""
    bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 7), 16, 10) \
        .cast("long") % 100
    return F.when(bucket < pct, F.lit("test")).otherwise(F.lit("train"))


def q_x11_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", split_column("doc_id"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


SQL_X11 = f"""
SELECT CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 7))::BIGINT % 100
            < {SPLIT_TEST_PCT}
       THEN 'test' ELSE 'train' END AS split,
       count(*) AS n_docs,
       min(doc_id) AS min_id,
       max(doc_id) AS max_id
FROM documents
GROUP BY 1
"""

# --------------------------------------------------------------------------
# X12 — composed corpus-cleaning pipeline (quality gate → dedup → stats)
# --------------------------------------------------------------------------

# gate chosen against the corpus quality distribution (median 0.41,
# max 0.50 at sf0.01): 0.42 keeps ~40% — a real filter, not a no-op
MIN_QUALITY = 0.42


def q_x12_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The acceptance pipeline a crawl drop passes before training:
    quality-score filter → exact dedup (smallest id survives per
    content hash) → per-language corpus stats. One quality pass (all
    JVM built-ins), one dedup shuffle on the digest, one stats shuffle
    on language — the composed plan keeps every stage's scale property.
    """
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "text",
        # round per row BEFORE averaging: the group avg then sums
        # identical 6-decimal values, immune to engine sum-order drift
        F.round(text.quality_score("text"), 6).alias("q"),
        text.lang_id(text.tokens("text")).alias("lang"),
        text.token_count_ws("text").alias("n_tokens"),
    ).filter(F.col("q") >= MIN_QUALITY)
    survivors = dedup.exact_dedup(scored, "doc_id", "text")
    return (
        scored.join(survivors.select("doc_id"), "doc_id", "left_semi")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("q"), 4).alias("avg_quality"),
        )
    )


def _x12_sql() -> str:
    # Same quality/lang encodings as the oracle-proven SQL_X6
    # (queries_ext._text_metrics_sql) — fixed constant lists, fixed
    # operation order, bitwise-identical to the Spark built-ins.
    def hits(lang: str) -> str:
        lst = ", ".join(f"'{w}'" for w in text.STOPWORDS[lang])
        return (
            f"list_sum(list_transform(toks, t -> "
            f"CASE WHEN list_contains([{lst}], t) THEN 1 ELSE 0 END))"
        )

    score_cols = ",\n    ".join(f"{hits(lang)} AS s_{lang}" for lang in text.LANG_PRIORITY)
    mx = "greatest(" + ", ".join(f"s_{lang}" for lang in text.LANG_PRIORITY) + ")"
    lang_case = (
        "CASE WHEN " + mx + " = 0 THEN 'und' "
        + " ".join(f"WHEN s_{lang} = {mx} THEN '{lang}'" for lang in text.LANG_PRIORITY)
        + " ELSE 'und' END"
    )
    quality = (
        "round(least(1.0, n_tok / 200.0) * 0.3 + (s_en * 1.0 / n_tok) * 0.4 "
        "+ (1.0 - praw) * 0.3, 6)"
    )
    return rf"""
WITH base AS (
  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
), metrics AS (
  SELECT doc_id, text, toks,
    {score_cols},
    len(toks) AS n_tok,
    length(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 1.0 / length(text) AS praw
  FROM base
), scored AS (
  SELECT doc_id, text,
         {quality} AS q,
         {lang_case} AS lang,
         n_tok AS n_tokens
  FROM metrics
  WHERE {quality} >= {MIN_QUALITY}
), survivors AS (
  SELECT min(doc_id) AS doc_id
  FROM scored GROUP BY sha256(text)
)
SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(q), 4) AS avg_quality
FROM scored
WHERE doc_id IN (SELECT doc_id FROM survivors)
GROUP BY lang
"""


SQL_X12 = _x12_sql()


EXT8_QUERIES = {
    "j5_interval_join": q_j5_interval_join,
    "x11_train_test_split": q_x11_train_test_split,
    "x12_clean_corpus": q_x12_clean_corpus,
}

EXT8_ORACLES = {
    "j5_interval_join": SQL_J5,
    "x11_train_test_split": SQL_X11,
    "x12_clean_corpus": SQL_X12,
}
