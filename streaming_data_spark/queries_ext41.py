"""Forty-first query wave — distribution-drift monitors, the
data-quality checks a pipeline runs between ingest periods (the
engine-side upgrade of the reference's log-grep monitor loop,
monitor_errors.py — instead of grepping for failures, test whether
this period's DATA still looks like last period's):

- x46_ks_drift: per event_type, the exact two-sample
  Kolmogorov-Smirnov statistic of `value` between the Jan-1..15 and
  Jan-15..31 halves. KS = max |F_a(v) − F_b(v)| over observed
  values; computed from per-value counts + one window cumsum per
  type, so every arithmetic step is EXACT (integer cumsums, one
  IEEE division each) — no rounding contract needed.
- x47_chi2_drift: chi-square statistic of the event_type MIX between
  the same halves (categorical drift; dof = |types|−1). The Σ over
  the |types|×2 cells is the one order-dependent float sum → rounded
  to 6 on both sides.

Scale shapes: x46 is two map-side-combinable groupBys + one
(type)-keyed window over DISTINCT values (cardinality-bounded, sort
spillable); x47 aggregates to a |types|×2 cell table and everything
after is dimension-sized. Both thresholds-free: they return the
statistic, the caller alerts (the K9 listener family).

[EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t

SPLIT_TS = "2024-01-15 00:00:00"


def q_x46_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_a, n_b, ks): exact two-sample KS per type."""
    ev = _t(spark, sf_dir, "events")
    counts = (
        ev.select(
            "event_type",
            "value",
            (F.col("ts") < SPLIT_TS).cast("int").alias("is_a"),
        )
        .groupBy("event_type", "value")
        .agg(
            F.sum("is_a").alias("c_a"),
            F.sum(1 - F.col("is_a")).alias("c_b"),
        )
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    stepped = counts.select(
        "event_type",
        F.sum("c_a").over(w_cum).alias("cum_a"),
        F.sum("c_b").over(w_cum).alias("cum_b"),
        F.sum("c_a").over(w_all).alias("n_a"),
        F.sum("c_b").over(w_all).alias("n_b"),
    )
    return (
        stepped.groupBy("event_type")
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.max(
                F.abs(
                    F.col("cum_a") / F.col("n_a") - F.col("cum_b") / F.col("n_b")
                )
            ).alias("ks"),
        )
    )


SQL_X46 = f"""
WITH counts AS (
  SELECT event_type, value,
         sum(CASE WHEN ts < TIMESTAMP '{SPLIT_TS}' THEN 1 ELSE 0 END) AS c_a,
         sum(CASE WHEN ts < TIMESTAMP '{SPLIT_TS}' THEN 0 ELSE 1 END) AS c_b
  FROM events GROUP BY event_type, value
),
stepped AS (
  SELECT event_type,
         sum(c_a) OVER (PARTITION BY event_type ORDER BY value
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
         sum(c_b) OVER (PARTITION BY event_type ORDER BY value
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
         sum(c_a) OVER (PARTITION BY event_type) AS n_a,
         sum(c_b) OVER (PARTITION BY event_type) AS n_b
  FROM counts
)
SELECT event_type,
       CAST(max(n_a) AS BIGINT) AS n_a,
       CAST(max(n_b) AS BIGINT) AS n_b,
       max(abs(cum_a * 1.0 / n_a - cum_b * 1.0 / n_b)) AS ks
FROM stepped GROUP BY event_type
"""


def q_x47_chi2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: (n_a, n_b, dof, chi2) for the event_type mix between
    the two halves."""
    ev = _t(spark, sf_dir, "events")
    cells = (
        ev.select(
            "event_type", (F.col("ts") < SPLIT_TS).cast("int").alias("is_a")
        )
        .groupBy("event_type", "is_a")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    # margins as broadcast aggregates, NOT global windows: the cell
    # table is |types|x2 but the pattern must not normalize a
    # single-task window into the fleet (the sanctioned-list stays
    # minimal); row margin keys on event_type (partitioned window ok)
    w_row = Window.partitionBy("event_type")
    col_margin = cells.groupBy("is_a").agg(
        F.sum("o").alias("col_tot"), F.count(F.lit(1)).alias("n_types")
    )
    total = cells.agg(F.sum("o").alias("n"))
    terms = (
        cells.withColumn("row_tot", F.sum("o").over(w_row))
        .join(F.broadcast(col_margin), "is_a")
        .crossJoin(F.broadcast(total))
        .select(
            "is_a",
            "n",
            "n_types",
            "col_tot",
            (
                (F.col("o") - F.col("row_tot") * F.col("col_tot") / F.col("n"))
                * (F.col("o") - F.col("row_tot") * F.col("col_tot") / F.col("n"))
                / (F.col("row_tot") * F.col("col_tot") / F.col("n"))
            ).alias("term"),
        )
    )
    return terms.groupBy().agg(
        F.max(F.when(F.col("is_a") == 1, F.col("col_tot"))).alias("n_a"),
        F.max(F.when(F.col("is_a") == 0, F.col("col_tot"))).alias("n_b"),
        (F.max("n_types") - 1).alias("dof"),
        F.round(F.sum("term"), 6).alias("chi2"),
    )


SQL_X47 = f"""
WITH cells AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '{SPLIT_TS}' THEN 1 ELSE 0 END AS is_a,
         count(*) AS o
  FROM events GROUP BY 1, 2
),
terms AS (
  SELECT is_a, o,
         sum(o) OVER (PARTITION BY event_type) AS row_tot,
         sum(o) OVER (PARTITION BY is_a) AS col_tot,
         sum(o) OVER () AS n,
         count(*) OVER (PARTITION BY is_a) AS n_types
  FROM cells
)
SELECT CAST(max(CASE WHEN is_a = 1 THEN col_tot END) AS BIGINT) AS n_a,
       CAST(max(CASE WHEN is_a = 0 THEN col_tot END) AS BIGINT) AS n_b,
       CAST(max(n_types) - 1 AS BIGINT) AS dof,
       round(sum((o - row_tot * col_tot * 1.0 / n)
                 * (o - row_tot * col_tot * 1.0 / n)
                 / (row_tot * col_tot * 1.0 / n)), 6) AS chi2
FROM terms
"""


EXT41_QUERIES = {
    "x46_ks_drift": q_x46_ks_drift,
    "x47_chi2_drift": q_x47_chi2_drift,
}

EXT41_ORACLES = {
    "x46_ks_drift": SQL_X46,
    "x47_chi2_drift": SQL_X47,
}
