"""Twenty-ninth query wave — tumbling-window median:

- a26_window_median: exact median of ``events.value`` per (1-day
  tumbling window × event_type) — the BATCH twin of the streaming
  approximate tier (streaming/pipeline.streaming_windowed_median,
  which keeps a bounded percentile_approx sketch per window cell
  instead of the full value list). Together with a25 (per-row rolling
  median over sorted frames) this completes the robust-statistics
  family: a25 answers "smoothed series per entity", a26 answers
  "typical value per period" — the reference's daily-candle cadence
  (airflow/dags/upbit_daily_candels.py) applied to a robust location
  estimate instead of OHLC.

Shape: one shuffle on (window, event_type); the per-group median sorts
inside each hash partition (no global sort). ``F.window`` is the
Spark-idiomatic tumbling bucket — epoch-aligned, so DuckDB's
``date_trunc('day', ...)`` is the same partition of the time axis.
Median is interpolated for even counts in BOTH engines
(Spark ``median`` == ``percentile(v, 0.5)`` ~ DuckDB ``median`` ==
``quantile_cont(0.5)``); round(6) absorbs the one-ulp interpolation
arithmetic differences, same as a10_percentiles.

[EXT]-classic per SURVEY.md §2.5 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t


def q_a26_window_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket_ts, event_type, med, n) per 1-day tumbling window."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.round(F.median("value"), 6).alias("med"),
            F.count("value").alias("n"),
        )
        .select(
            F.col("window.start").alias("bucket_ts"),
            "event_type",
            "med",
            "n",
        )
    )


SQL_A26 = """
SELECT date_trunc('day', ts) AS bucket_ts,
       event_type,
       round(median(value), 6) AS med,
       count(value) AS n
FROM events
GROUP BY 1, 2
"""


EXT29_QUERIES = {
    "a26_window_median": q_a26_window_median,
}

EXT29_ORACLES = {
    "a26_window_median": SQL_A26,
}
