"""Fifty-sixth query wave — fulfillment spans, growth accounting,
transition latency, dedup metrology, embedding norms:

- a65_fulfillment_span: per order priority, the distribution (p50 /
  p95) of each multi-line order's first-ship-to-last-ship span in
  days — the fulfillment-window KPI behind a52's per-line lead time.
- a66_new_vs_returning: per day, active users split into first-ever
  (new) and returning — the growth-accounting table every product
  dashboard leads with.
- a67_transition_latency: mean and p95 seconds from each event type
  to the user's NEXT event, per (from_type, to_type) — the timing
  companion of a32's transition counts (|types|² output).
- x86_dup_family_hist: histogram of exact-duplicate family sizes
  (how many digests have 1, 2, 3… copies) — the dedup metrology that
  distinguishes a corpus of rare twins from one dominated by mass
  mirror families.
- x87_embedding_norms: per-label vector-norm profile (mean / std /
  min / max) — the embedding QA aggregate next to x64's outliers
  (collapsed or exploded norms flag a broken encoder batch before
  any similarity op runs).

Scale shapes: a65 = order-grain span groupBy folded into a
|priorities|-bounded percentile agg; a66 = per-user first-day
groupBy + day-grain counts (keyed join back); a67 = one user-keyed
lead window + a |types|²-bounded agg; x86 = digest groupBy +
|family-size|-bounded histogram; x87 = row-local fold per vector +
|labels|-bounded agg.

[EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t


def q_a65_fulfillment_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderpriority, n_orders, p50_span_days, p95_span_days):
    first-to-last ship span per order, summarized per priority."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    spans = (
        li.groupBy("l_orderkey")
        .agg(
            F.datediff(F.max("l_shipdate"), F.min("l_shipdate")).alias(
                "span"
            )
        )
        .join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    return spans.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.expr("percentile(span, 0.5)"), 6).alias("p50_span_days"),
        F.round(F.expr("percentile(span, 0.95)"), 6).alias("p95_span_days"),
    )


SQL_A65 = """
WITH spans AS (
  SELECT l_orderkey,
         date_diff('day', min(l_shipdate), max(l_shipdate)) AS span
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderpriority,
       count(*) AS n_orders,
       round(quantile_cont(s.span, 0.5), 6) AS p50_span_days,
       round(quantile_cont(s.span, 0.95), 6) AS p95_span_days
FROM spans s JOIN orders o ON s.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


def q_a66_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, n_active, n_new, n_returning): daily actives split by
    whether the day is the user's first-ever active day."""
    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        days.join(first, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(
                F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
            ).alias("n_new"),
            F.sum(
                F.when(F.col("day") != F.col("first_day"), 1).otherwise(0)
            ).alias("n_returning"),
        )
    )


SQL_A66 = """
WITH days AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
), first AS (
  SELECT user_id, min(day) AS first_day FROM days GROUP BY user_id
)
SELECT d.day,
       count(*) AS n_active,
       CAST(sum(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(sum(CASE WHEN d.day <> f.first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returning
FROM days d JOIN first f USING (user_id)
GROUP BY d.day
"""


def q_a67_transition_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(from_type, to_type, n, mean_secs, p95_secs): timing of each
    user's type-to-type event transitions."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = (
        ev.withColumn("to_type", F.lead("event_type").over(w))
        .withColumn("to_ts", F.lead("ts").over(w))
        .filter(F.col("to_type").isNotNull())
        .select(
            F.col("event_type").alias("from_type"),
            "to_type",
            (
                (F.unix_micros("to_ts") - F.unix_micros("ts"))
                / F.lit(1_000_000.0)
            ).alias("secs"),
        )
    )
    return hops.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("secs"), 6).alias("mean_secs"),
        F.round(F.expr("percentile(secs, 0.95)"), 6).alias("p95_secs"),
    )


SQL_A67 = """
WITH hops AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER w AS to_type,
         date_diff('microsecond', ts, lead(ts) OVER w) / 1000000.0 AS secs
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT from_type, to_type,
       count(*) AS n,
       round(avg(secs), 6) AS mean_secs,
       round(quantile_cont(secs, 0.95), 6) AS p95_secs
FROM hops WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
"""


def q_x86_dup_family_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(family_size, n_families, n_docs): exact-duplicate family-size
    histogram over content digests."""
    docs = _t(spark, sf_dir, "documents")
    fams = docs.select(F.sha2(F.col("text"), 256).alias("digest")).groupBy(
        "digest"
    ).agg(F.count(F.lit(1)).alias("family_size"))
    return fams.groupBy("family_size").agg(
        F.count(F.lit(1)).alias("n_families"),
        F.sum("family_size").alias("n_docs"),
    )


SQL_X86 = """
WITH fams AS (
  SELECT sha256(text) AS digest, count(*) AS family_size
  FROM documents GROUP BY sha256(text)
)
SELECT family_size, count(*) AS n_families,
       CAST(sum(family_size) AS BIGINT) AS n_docs
FROM fams
GROUP BY family_size
"""


def q_x87_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, n, mean_norm, std_norm, min_norm, max_norm): L2-norm
    profile of the embedding column per label."""
    emb = _t(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        emb.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("norm"), 6).alias("mean_norm"),
            F.round(F.stddev_samp("norm"), 6).alias("std_norm"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
    )


SQL_X87 = """
WITH norms AS (
  SELECT label,
         sqrt(list_sum(list_transform(embedding,
              x -> x::DOUBLE * x::DOUBLE))) AS norm
  FROM embeddings
)
SELECT label,
       count(*) AS n,
       round(avg(norm), 6) AS mean_norm,
       round(stddev_samp(norm), 6) AS std_norm,
       round(min(norm), 6) AS min_norm,
       round(max(norm), 6) AS max_norm
FROM norms
GROUP BY label
"""


EXT56_QUERIES = {
    "a65_fulfillment_span": q_a65_fulfillment_span,
    "a66_new_vs_returning": q_a66_new_vs_returning,
    "a67_transition_latency": q_a67_transition_latency,
    "x86_dup_family_hist": q_x86_dup_family_hist,
    "x87_embedding_norms": q_x87_embedding_norms,
}

EXT56_ORACLES = {
    "a65_fulfillment_span": SQL_A65,
    "a66_new_vs_returning": SQL_A66,
    "a67_transition_latency": SQL_A67,
    "x86_dup_family_hist": SQL_X86,
    "x87_embedding_norms": SQL_X87,
}
