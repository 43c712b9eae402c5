"""Thirteenth query wave — the remaining classic decision-support
shapes (TPC-H Q9/Q11/Q13/Q15 analogs), adapted to the driver testdata
schema (no partsupp table, no commit/receipt dates, no comment
columns — each query keeps its ancestor's PLAN SHAPE, which is what
the engine is being exercised on, with the available columns).

Shapes this wave adds that no earlier query covers:
- q9:  multi-dim star join + profit rollup by (nation, year) — two
       broadcast dims feeding one fact-side group-by.
- q11: HAVING-over-share — per-group value filtered against a scalar
       fraction of the global total (scalar agg broadcast, no second
       fact scan... the fact is scanned twice: once for the total,
       once grouped; at scale the grouped side would be cached or the
       total derived from the grouped result — here the optimizer
       shares the shuffle via exchange reuse).
- q13: LEFT OUTER join + two-level aggregation (per-customer order
       count, then the distribution of those counts) — the only
       query whose final group key is itself an aggregate.
- q15: argmax-vs-scalar — per-supplier windowed revenue equi-joined
       against its own broadcast max (ties preserved, per TPC-H).

Reference anchor: the reference's single analytical join
(upbit_data_pipeline.py:171-176) generalized per SURVEY.md §2.4/§2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t

def _rev():
    # lazy: classic-mode Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))

# --------------------------------------------------------------------------
# Q9 shape — profit by (nation, year) for one product line
# --------------------------------------------------------------------------

Q9_PART_TYPE = "PROMO"


def q_q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by supplier nation and ship year for PROMO-type parts.

    Plan: part (filtered to one type) and supplier⋈nation both
    broadcast — the lineitem fact never shuffles before the final
    25×7-group rollup; the p_type filter prunes at the part scan.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == Q9_PART_TYPE)
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).alias("sum_profit"))
    )


SQL_Q9 = f"""
SELECT n_name AS nation,
       year(l_shipdate) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = '{Q9_PART_TYPE}'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, year(l_shipdate)
"""


# --------------------------------------------------------------------------
# Q11 shape — groups exceeding a fixed share of the global total
# --------------------------------------------------------------------------

Q11_SHARE = 0.0008  # ~7 heavy parts at sf0.01 (non-trivial, non-huge)


def q_q11_heavy_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose total revenue exceeds Q11_SHARE of global revenue.

    Plan: per-part rollup (one fact shuffle on l_partkey) plus a
    1-row global total broadcast into the HAVING filter; AQE reuses
    the scan. The share test compares ROUNDED revenue to the rounded
    cutoff in both engines so the boundary is engine-agnostic.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    per_part = lineitem.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.round(F.sum(_rev()), 2).alias("value")
    )
    total = lineitem.agg(
        F.round(F.sum(_rev()) * Q11_SHARE, 2).alias("cutoff")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("cutoff"))
        .select("partkey", "value")
    )


SQL_Q11 = f"""
SELECT l_partkey AS partkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS value
FROM lineitem
GROUP BY l_partkey
HAVING round(sum(l_extendedprice * (1 - l_discount)), 2) >
       (SELECT round(sum(l_extendedprice * (1 - l_discount)) * {Q11_SHARE}, 2)
        FROM lineitem)
"""


# --------------------------------------------------------------------------
# Q13 shape — distribution of per-customer order counts (incl. zero)
# --------------------------------------------------------------------------


def q_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed exactly N orders, for every N seen —
    including N=0, which only a LEFT OUTER join can surface (an inner
    join silently drops orderless customers; the reference's FK checks
    have the same orphan-visibility concern, SURVEY.md §2.4 J2).

    Plan: left join shuffles on custkey, per-customer count, then a
    tiny second shuffle on the count value itself.
    """
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count() skips NULLs
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


SQL_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# Q15 shape — supplier(s) achieving the maximum windowed revenue
# --------------------------------------------------------------------------

Q15_START = "1996-01-01"
Q15_END = "1996-04-01"


def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier(s) with the highest revenue in one quarter, with
    that revenue — ties all surface (equality join, not a LIMIT 1).

    Plan: the date filter pushes to the lineitem scan; one shuffle to
    the per-supplier rollup; the 1-row max broadcast back into the
    equality filter; supplier dim broadcast for the name lookup.
    """
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q15_START) & (F.col("l_shipdate") < Q15_END)
    )
    revenue = lineitem.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supplier = _t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("s_name"),
            "total_revenue",
        )
    )


SQL_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_START}'
    AND l_shipdate < TIMESTAMP '{Q15_END}'
  GROUP BY l_suppkey
)
SELECT s_suppkey AS suppkey, s_name, total_revenue
FROM revenue
JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


EXT13_QUERIES = {
    "q9_profit_by_nation_year": q_q9_profit_by_nation_year,
    "q11_heavy_parts": q_q11_heavy_parts,
    "q13_order_count_distribution": q_q13_order_count_distribution,
    "q15_top_supplier": q_q15_top_supplier,
}

EXT13_ORACLES = {
    "q9_profit_by_nation_year": SQL_Q9,
    "q11_heavy_parts": SQL_Q11,
    "q13_order_count_distribution": SQL_Q13,
    "q15_top_supplier": SQL_Q15,
}
