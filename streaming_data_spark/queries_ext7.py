"""Seventh query wave — statistical & profiling aggregates.

Rounds out the §2.5 aggregation family with the three shapes a
training-data/analytics user reaches for next: exact quantiles,
multi-dimensional subtotal lattices (CUBE), and one-pass table
profiling (the null-ratio/distinct/extremes scan every ingest
pipeline runs before accepting a drop). All exact, all oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t

# --------------------------------------------------------------------------
# A10 — exact per-group quantiles (percentile with interpolation)
# --------------------------------------------------------------------------

def q_a10_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartiles of lineitem quantity and price per return flag.

    Spark's ``percentile`` is the exact interpolated quantile —
    semantically DuckDB's ``quantile_cont`` — computed with ONE
    shuffle on the group key (each group's sort happens inside its
    partition, no global sort). At 100 TB you'd swap in
    ``approx_percentile`` for a fixed-memory sketch; the exact form
    is the correctness baseline.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("qty_p25"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("qty_p50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 6).alias("qty_p75"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("price_p50"),
    )


SQL_A10 = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25), 6) AS qty_p25,
       round(quantile_cont(l_quantity, 0.5),  6) AS qty_p50,
       round(quantile_cont(l_quantity, 0.75), 6) AS qty_p75,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS price_p50
FROM lineitem
GROUP BY l_returnflag
"""

# --------------------------------------------------------------------------
# A11 — CUBE subtotal lattice (generalizes the rollup query)
# --------------------------------------------------------------------------

def q_a11_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts and revenue over the full (returnflag × linestatus)
    subtotal lattice — all 2^2 grouping sets in one pass (Spark
    expands the sets map-side; still ONE shuffle). ``grouping_id``
    disambiguates real NULLs from subtotal rows, identically in both
    engines."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.grouping_id().alias("gid"),
        )
    )


SQL_A11 = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       GROUPING(l_returnflag, l_linestatus) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

# --------------------------------------------------------------------------
# A12 — one-pass numeric table profile (ingest acceptance scan)
# --------------------------------------------------------------------------

_PROFILE_COLS = ("c_custkey", "c_nationkey", "c_acctbal")


def q_a12_profile_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null count, distinct count, min, max for customer's
    numeric columns — computed in ONE aggregation job (every stat for
    every column in the same pass; a naive profiler runs one job per
    column and rescans the table N times), then unpivoted with
    ``stack`` into (column, stat...) rows. distinct counts are exact
    here; at 100 TB swap approx_count_distinct.
    """
    cust = _t(spark, sf_dir, "customer")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.round(F.min(F.col(c).cast("double")), 6).alias(f"{c}__min"),
            F.round(F.max(F.col(c).cast("double")), 6).alias(f"{c}__max"),
        ]
    wide = cust.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (column_name, n_nulls, n_distinct, min_val, max_val)"
        )
    )


def _profile_sql() -> str:
    parts = [
        f"""
SELECT '{c}' AS column_name,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       round(min({c}::DOUBLE), 6) AS min_val,
       round(max({c}::DOUBLE), 6) AS max_val
FROM customer"""
        for c in _PROFILE_COLS
    ]
    return "\nUNION ALL\n".join(parts)


SQL_A12 = _profile_sql()


EXT7_QUERIES = {
    "a10_percentiles": q_a10_percentiles,
    "a11_cube_counts": q_a11_cube_counts,
    "a12_profile_customer": q_a12_profile_customer,
}

EXT7_ORACLES = {
    "a10_percentiles": SQL_A10,
    "a11_cube_counts": SQL_A11,
    "a12_profile_customer": SQL_A12,
}
