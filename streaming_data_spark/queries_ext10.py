"""Tenth query wave — remaining classic decision-support shapes the
testdata schema supports (Q6 / Q14 / Q16 / Q19 analogs).

These complete the scan-heavy single-pass family started in
queries_ext4/ext6 (the reference delegates all relational execution to
Postgres, upbit_data_pipeline.py:171-176; these are the shapes its
analytical workload would grow into). Scale notes per query:

- q6: pure filter+agg — every predicate reaches the parquet scan
  (PushedFilters), output is one row; at 100 TB this is scan-bound and
  embarrassingly parallel, zero shuffles after the map-side partial agg.
- q14: fact ⋈ part with the part side broadcast — the fact table never
  shuffles; the month filter prunes the scan first.
- q16: anti-join against a tiny blacklist (broadcast), then a
  distinct-agg keyed by (brand, type, size) — one shuffle on the group
  key; count(DISTINCT) is two-phase (partial distinct map-side).
- q19: disjunctive predicate — per-side implications of the OR are
  applied as redundant conjuncts on EACH side before the join, so the
  part scan and the lineitem scan both prune even though the full
  disjunction can only be evaluated after the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t

# --------------------------------------------------------------------------
# Q6 analog — forecast revenue change (pure filter + aggregate)
# --------------------------------------------------------------------------


def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: one-table filter + agg. All four predicates push to the
    parquet scan; the agg is a map-side partial + single final row."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


SQL_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

# --------------------------------------------------------------------------
# Q14 analog — promotion revenue share for one month
# --------------------------------------------------------------------------


def q_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: month-filtered fact ⋈ broadcast part dim, conditional
    share-of-total aggregate. The fact side never shuffles."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", net).otherwise(0.0))
                / F.sum(net),
                4,
            ).alias("promo_pct")
        )
    )


SQL_Q14 = """
SELECT round(
         100.0 * sum(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0.0 END)
         / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
"""

# --------------------------------------------------------------------------
# Q16 analog — distinct suppliers per (brand, type, size), blacklist anti-join
# --------------------------------------------------------------------------

_Q16_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)


def q_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: NOT-IN subquery becomes a broadcast left-anti join
    against the (tiny) negative-balance supplier set; the distinct-agg
    shuffles once on the (brand, type, size) group key."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(*_Q16_SIZES)
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


SQL_Q16 = f"""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#3'
  AND p_type <> 'PROMO'
  AND p_size IN {_Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
"""

# --------------------------------------------------------------------------
# Q19 analog — disjunctive brand/size/quantity predicate
# --------------------------------------------------------------------------

# (brand, max_size, qty_lo, qty_hi) per disjunct
_Q19_ARMS = (
    ("Brand#5", 5, 1.0, 11.0),
    ("Brand#14", 10, 10.0, 20.0),
    ("Brand#22", 15, 20.0, 30.0),
)


def q_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs across both join sides. Each side gets the
    union of its own implied predicates as a redundant conjunct
    (brands / size ranges on part, quantity envelope on lineitem) so
    both scans prune before the broadcast join; the exact disjunction
    is evaluated post-join."""
    brands = [a[0] for a in _Q19_ARMS]
    max_size = max(a[1] for a in _Q19_ARMS)
    qty_lo = min(a[2] for a in _Q19_ARMS)
    qty_hi = max(a[3] for a in _Q19_ARMS)

    part = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin(*brands)
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= max_size)
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= qty_lo) & (F.col("l_quantity") <= qty_hi)
    )
    arm = None
    for brand, size_hi, lo, hi in _Q19_ARMS:
        cond = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") <= size_hi)
            & (F.col("l_quantity") >= lo)
            & (F.col("l_quantity") <= hi)
        )
        arm = cond if arm is None else (arm | cond)
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(arm)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


SQL_Q19 = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


EXT10_QUERIES = {
    "q6_forecast_revenue": q_q6_forecast_revenue,
    "q14_promo_revenue": q_q14_promo_revenue,
    "q16_supplier_cnt": q_q16_supplier_cnt,
    "q19_disjunctive_revenue": q_q19_disjunctive_revenue,
}

EXT10_ORACLES = {
    "q6_forecast_revenue": SQL_Q6,
    "q14_promo_revenue": SQL_Q14,
    "q16_supplier_cnt": SQL_Q16,
    "q19_disjunctive_revenue": SQL_Q19,
}
