"""Fifth query wave — classic decision-support shapes that round out
the relational surface: EXISTS semi-join aggregation, correlated
per-group average (decorrelated to a window), and distinct-count
aggregation. All Catalyst-built-in; no custom operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t

# --------------------------------------------------------------------------
# Q4 shape — EXISTS subquery as a left-semi join + agg
# --------------------------------------------------------------------------

def q_q4_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in 1996Q1 having at least one lineitem shipped after the
    order date, counted per priority. EXISTS decorrelates to a
    left-semi join — the build side never duplicates order rows, so
    the aggregate input stays |orders|-sized at any scale."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    lineitem = _t(spark, sf_dir, "lineitem")
    hits = orders.join(
        lineitem,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return hits.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


SQL_Q4 = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""

# --------------------------------------------------------------------------
# Q17 shape — correlated per-group average, decorrelated to a window
# --------------------------------------------------------------------------

def q_q17_below_avg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue (yearly-averaged) from lineitems whose quantity is
    under 20% of their part's average quantity, per brand. The
    correlated scalar subquery becomes one window pass over the fact —
    a single shuffle on l_partkey instead of a per-row probe.

    Float note: l_quantity is integer-valued, so avg = exact-sum/count
    is bit-identical in both engines and the 20% threshold can't flip.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("l_partkey")
    flagged = lineitem.withColumn("part_avg_qty", F.avg("l_quantity").over(w))
    small = flagged.filter(F.col("l_quantity") < 0.2 * F.col("part_avg_qty"))
    return (
        small.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


SQL_Q17 = """
SELECT p_brand,
       round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_quantity < (
  SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
  WHERE l2.l_partkey = lineitem.l_partkey
)
GROUP BY p_brand
"""

# --------------------------------------------------------------------------
# A9 — distinct-count aggregation (exact; the expand-based plan)
# --------------------------------------------------------------------------

def q_a9_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) per group — Spark plans this as expand +
    two-level aggregate, still one logical pass. The approximate
    (HyperLogLog) form is property-tested in tests instead of
    oracle-matched (sketches differ across engines by design)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_items"),
    )


SQL_A9 = """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(*) AS n_items
FROM lineitem
GROUP BY l_returnflag
"""


EXT5_QUERIES = {
    "q4_exists_priority": q_q4_exists_priority,
    "q17_below_avg_revenue": q_q17_below_avg_revenue,
    "a9_count_distinct": q_a9_count_distinct,
}

EXT5_ORACLES = {
    "q4_exists_priority": SQL_Q4,
    "q17_below_avg_revenue": SQL_Q17,
    "a9_count_distinct": SQL_A9,
}
