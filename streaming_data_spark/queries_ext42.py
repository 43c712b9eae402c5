"""Forty-second query wave — the drift-monitor family completed
(operators/drift.py; the engine-side upgrade of the reference's
log-grep monitor loop, airflow/dags/monitor_errors.py — wave 41 added
the KS/chi-square tests, this wave adds the three standard ML-ops
drift scores):

- x48_psi_drift: Population Stability Index of `value` per
  event_type between the Jan-1..15 and Jan-15..31 halves, over 10
  equal-width bins on the type's full [min, max]; Laplace-smoothed
  (α=0.5) so one-sided bins stay finite.
- x49_js_hourly: Jensen-Shannon divergence (natural log) of the
  hour-of-day activity profile per event_type between the same
  halves — "did the temporal pattern shift", complementing x47's
  type-mix chi-square.
- x50_cusum: two-sided CUSUM (Page's test, in-sample reference
  level, k=0.5σ slack) over each type's daily-mean series — the
  sequential changepoint detector, run as the ewma/rsi
  partition-level ``mapInPandas`` fold with a DuckDB RECURSIVE-CTE
  oracle repeating the identical op order. Fold inputs (daily mean,
  μ, σ) are rounded to 6 on BOTH sides first, making every
  max/add/sub step bit-reproducible; outputs are exact, unrounded.

Scale shapes: x48/x49 are one map-side-combinable fact groupBy onto
a (type × bins) cell table (bin edges via a broadcast join — the
fact is never window-shuffled); everything after is
dimension-sized. x50 folds the types × days daily table inside
partitions. All thresholds-free: they return the statistic, the
caller alerts (the K9 listener family).

[EXT]-classic per SURVEY.md §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.operators import drift
from streaming_data_spark.queries import _t
from streaming_data_spark.queries_ext41 import SPLIT_TS


def q_x48_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_a, n_b, psi): 10-bin PSI of value between halves."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "is_a", (F.col("ts") < SPLIT_TS).cast("int")
    )
    return drift.psi(
        ev, key="event_type", value_col="value", split_col="is_a",
        n_bins=10, alpha=0.5,
    )


SQL_X48 = f"""
WITH edges AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi
  FROM events GROUP BY event_type
),
binned AS (
  SELECT e.event_type,
         CASE WHEN g.hi = g.lo THEN 0
              ELSE least(CAST(floor((e.value - g.lo) / ((g.hi - g.lo) / 10.0))
                         AS INT), 9)
         END AS bin,
         CASE WHEN e.ts < TIMESTAMP '{SPLIT_TS}' THEN 1 ELSE 0 END AS is_a
  FROM events e JOIN edges g USING (event_type)
),
cells AS (
  SELECT event_type, bin, sum(is_a) AS c_a, sum(1 - is_a) AS c_b
  FROM binned GROUP BY event_type, bin
),
tot AS (
  SELECT event_type, c_a, c_b,
         sum(c_a) OVER (PARTITION BY event_type) AS n_a,
         sum(c_b) OVER (PARTITION BY event_type) AS n_b
  FROM cells
)
SELECT event_type,
       CAST(max(n_a) AS BIGINT) AS n_a,
       CAST(max(n_b) AS BIGINT) AS n_b,
       round(sum(((c_b + 0.5) / (n_b + 5.0) - (c_a + 0.5) / (n_a + 5.0))
                 * ln(((c_b + 0.5) / (n_b + 5.0))
                      / ((c_a + 0.5) / (n_a + 5.0)))), 6) AS psi
FROM tot GROUP BY event_type
"""


def q_x49_js_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_a, n_b, js): JS divergence of the hour-of-day
    profile between halves."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").alias("hr"),
        (F.col("ts") < SPLIT_TS).cast("int").alias("is_a"),
    )
    return drift.js_divergence(
        ev, key="event_type", bucket_col="hr", split_col="is_a"
    )


SQL_X49 = f"""
WITH cells AS (
  SELECT event_type, extract(hour FROM ts) AS hr,
         sum(CASE WHEN ts < TIMESTAMP '{SPLIT_TS}' THEN 1 ELSE 0 END) AS c_a,
         sum(CASE WHEN ts < TIMESTAMP '{SPLIT_TS}' THEN 0 ELSE 1 END) AS c_b
  FROM events GROUP BY event_type, extract(hour FROM ts)
),
tot AS (
  SELECT event_type, c_a, c_b,
         sum(c_a) OVER (PARTITION BY event_type) AS n_a,
         sum(c_b) OVER (PARTITION BY event_type) AS n_b
  FROM cells
)
SELECT event_type,
       CAST(max(n_a) AS BIGINT) AS n_a,
       CAST(max(n_b) AS BIGINT) AS n_b,
       round(sum(
         CASE WHEN c_a > 0
              THEN 0.5 * (c_a / n_a)
                   * ln((c_a / n_a) / (((c_a / n_a) + (c_b / n_b)) / 2.0))
              ELSE 0.0 END
         + CASE WHEN c_b > 0
                THEN 0.5 * (c_b / n_b)
                     * ln((c_b / n_b) / (((c_a / n_a) + (c_b / n_b)) / 2.0))
                ELSE 0.0 END), 6) AS js
FROM tot GROUP BY event_type
"""


def q_x50_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day, x, s_pos, s_neg): two-sided CUSUM over each
    type's daily-mean series, k=0.5σ slack."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.round(F.avg("value"), 6).alias("x"))
    return drift.cusum(daily, key="event_type", order_col="day", x_col="x",
                       k=0.5)


SQL_X50 = """
WITH RECURSIVE daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         round(avg(value), 6) AS x
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
stats AS (
  SELECT event_type, round(avg(x), 6) AS mu, round(stddev(x), 6) AS sigma
  FROM daily GROUP BY event_type
),
numbered AS (
  SELECT d.event_type, d.day, d.x, s.mu, s.sigma,
         row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS rn
  FROM daily d JOIN stats s USING (event_type)
  WHERE s.sigma IS NOT NULL
),
r AS (
  -- seed: s0 = 0 on both sides, so step 1 is max(0, (x - mu) - 0.5*sigma)
  SELECT event_type, day, x, mu, sigma, rn,
         greatest(0.0, (x - mu - 0.5 * sigma)) AS s_pos,
         greatest(0.0, (mu - 0.5 * sigma - x)) AS s_neg
  FROM numbered WHERE rn = 1
  UNION ALL
  -- EXACTLY the engine fold's op order: s + ((x - mu) - slack)
  SELECT n.event_type, n.day, n.x, n.mu, n.sigma, n.rn,
         greatest(0.0, r.s_pos + (n.x - n.mu - 0.5 * n.sigma)),
         greatest(0.0, r.s_neg + (n.mu - 0.5 * n.sigma - n.x))
  FROM numbered n JOIN r ON n.event_type = r.event_type AND n.rn = r.rn + 1
)
SELECT event_type, day, x, s_pos, s_neg FROM r
"""


EXT42_QUERIES = {
    "x48_psi_drift": q_x48_psi_drift,
    "x49_js_hourly": q_x49_js_hourly,
    "x50_cusum": q_x50_cusum,
}

EXT42_ORACLES = {
    "x48_psi_drift": SQL_X48,
    "x49_js_hourly": SQL_X49,
    "x50_cusum": SQL_X50,
}
