"""Twenty-eighth query wave — robust rolling statistics:

- a25_rolling_median: per-user trailing-15-event rolling MEDIAN — the
  robust companion to the rolling mean/stddev family (a4/a16); one
  outlier shifts a rolling mean for the whole window but moves the
  median one rank at most. Spark has no native windowed median
  (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC — ordered-set aggregates
  don't run over frames), so the exact form is
  ``array_sort(collect_list(v) OVER frame)[middle]`` — all JVM
  built-ins, no UDF; with the ODD frame size the middle element is
  exact (no interpolation ambiguity), and DuckDB's NATIVE windowed
  median is the oracle. Cost is O(w log w) per row — inherent to
  exact rolling medians; the approximate tier at 100 TB is a
  two-heap/sketch custom stateful op, with approx_percentile per
  TUMBLING window as the cheap engine-native compromise.

[EXT]-classic per SURVEY.md §2.5 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t

FRAME = 15  # ODD on purpose: the median is a single element, exact


def q_a25_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, user_id, ts, value, med_15) for every event with a
    fully-warmed trailing window of 15 events (incl. current).

    NULL contract: ``collect_list`` drops NULL values, so ``w_n``
    counts NON-NULL values inside the 15-row frame; the oracle uses
    ``count(value) OVER w`` (not ``count(*)``) so both engines agree
    on what "fully warmed" means when ``events.value`` has NULLs
    (the schema allows it even though current testdata has none)."""
    events = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc())
        .rowsBetween(-(FRAME - 1), 0)
    )
    frame = F.array_sort(F.collect_list("value").over(w))
    return (
        events.select(
            "event_id",
            "user_id",
            "ts",
            "value",
            F.element_at(frame, (FRAME + 1) // 2).alias("med_15"),
            F.size(frame).alias("w_n"),
        )
        .filter(F.col("w_n") == FRAME)
        .drop("w_n")
    )


SQL_A25 = f"""
WITH rolled AS (
  SELECT event_id, user_id, ts, value,
         median(value) OVER w AS med_15,
         count(value) OVER w AS w_n
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC
               ROWS BETWEEN {FRAME - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts, value, med_15
FROM rolled WHERE w_n = {FRAME}
"""


EXT28_QUERIES = {
    "a25_rolling_median": q_a25_rolling_median,
}

EXT28_ORACLES = {
    "a25_rolling_median": SQL_A25,
}
