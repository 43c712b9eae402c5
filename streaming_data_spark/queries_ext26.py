"""Twenty-sixth query wave — BI reporting shapes:

- a22_wow_growth: week-over-week revenue growth per order priority —
  the period-over-period comparison every dashboard renders. Shape:
  one rollup to (priority, week), then lag() over each priority's
  week series (tiny frame — windows run on the AGGREGATE, never the
  fact, the same discipline as a20).
- a23_topn_others: top-3 revenue nations plus a single OTHERS bucket
  — the long-tail-folding rollup reports use so charts stay legible.
  Rank on the aggregate, conditional re-group; the fact is scanned
  and shuffled exactly once.
- a24_cooccurrence: event-type pair co-occurrence across users (how
  many users exhibit BOTH behaviors) — market-basket-lite over the
  behavioral space. Distinct (user, type) pairs self-join within
  user; with a bounded type vocabulary the fan-out is ≤ |types|² per
  user, and the join rides the user_id keying.

[EXT]-classic per SURVEY.md §2.5 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t


def q_a22_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly revenue per order priority with week-over-week growth
    percent (NULL for each priority's first week)."""
    orders = _t(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        "o_orderpriority",
        F.date_trunc("week", "o_orderdate").cast("date").alias("week"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("week").asc())
    prev = F.lag("revenue").over(w)
    return weekly.select(
        F.col("o_orderpriority").alias("priority"),
        "week",
        "revenue",
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias("wow_pct"),
    )


SQL_A22 = """
WITH weekly AS (
  SELECT o_orderpriority AS priority,
         CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY o_orderpriority, date_trunc('week', o_orderdate)
)
SELECT priority, week, revenue,
       round((revenue - lag(revenue) OVER w) / lag(revenue) OVER w * 100, 4)
         AS wow_pct
FROM weekly
WINDOW w AS (PARTITION BY priority ORDER BY week ASC)
"""


def q_a23_topn_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation folded to the top 3 plus one OTHERS bucket.
    Rank ties break by nation name so the fold is total."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    by_nation = (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    # Deliberate GLOBAL window: ranking ~25 nation AGGREGATE rows, so
    # the single-partition WindowExec is benign at any fact size; the
    # sanctioned-sites plan gate in tests/test_plans.py pins this.
    w = Window.orderBy(F.col("rev").desc(), F.col("n_name").asc())
    ranked = by_nation.withColumn("rk", F.row_number().over(w))
    return (
        ranked.withColumn(
            "bucket",
            F.when(F.col("rk") <= 3, F.col("n_name")).otherwise(F.lit("OTHERS")),
        )
        .groupBy("bucket")
        .agg(
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


SQL_A23 = """
WITH by_nation AS (
  SELECT n_name, sum(o_totalprice) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
),
ranked AS (
  SELECT n_name, rev,
         row_number() OVER (ORDER BY rev DESC, n_name ASC) AS rk
  FROM by_nation
)
SELECT CASE WHEN rk <= 3 THEN n_name ELSE 'OTHERS' END AS bucket,
       round(sum(rev), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_nations
FROM ranked
GROUP BY CASE WHEN rk <= 3 THEN n_name ELSE 'OTHERS' END
"""


def q_a24_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each unordered pair of event types, how many users did
    BOTH — behavioral co-occurrence counts."""
    events = _t(spark, sf_dir, "events")
    ut = events.select("user_id", "event_type").distinct()
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    return (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


SQL_A24 = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM ut a JOIN ut b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
"""


EXT26_QUERIES = {
    "a22_wow_growth": q_a22_wow_growth,
    "a23_topn_others": q_a23_topn_others,
    "a24_cooccurrence": q_a24_cooccurrence,
}

EXT26_ORACLES = {
    "a22_wow_growth": SQL_A22,
    "a23_topn_others": SQL_A23,
    "a24_cooccurrence": SQL_A24,
}
