"""Sixteenth query wave — time-series densification and
multi-granularity rollup:

- a13_gapfill_daily: calendar densification with carry-forward — the
  canonical warehouse gap-fill (every (user, day) cell exists even
  when no event landed, value carried from the last observed day).
  The reference's daily-candle ingest has exactly this hole: a market
  with no trade on a day simply has no row (upbit_daily_candels.py
  fetches day candles per market; gaps are silent). Shape: per-key
  span agg → sequence() explode → left join → last(ignorenulls)
  window.
- a14_grouping_sets: GROUPING SETS — the generalization of the
  rollup/cube pair already in the registry (rollup_totals,
  a11_cube_counts) to an arbitrary, non-hierarchical set list; one
  shuffle produces all granularities via Expand.

[EXT]-classic per SURVEY.md §2.5/§2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t


def q_a13_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-user event value, densified over each user's active
    span with carry-forward for gap days.

    Plan: one shuffle to the (user, day) rollup; the span agg and the
    calendar join both ride the same user_id keying (AQE reuses the
    exchange); sequence()+explode generates the calendar DISTRIBUTED
    per user — no driver-side date loop, no global calendar broadcast
    (each key only materializes its own span). The carry-forward is
    one ordered window per user. Day counts grow ∝ span, not ∝ rows —
    at 100 TB the explode output is bounded by keys × days, and a
    runaway span (bad data: one 1970 timestamp) is the operator's
    known hazard — dq_audit's in_range rule is the guard.
    """
    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.col("user_id"),
        F.col("ts").cast("date").alias("day"),
    ).agg(F.round(F.avg("value"), 6).alias("day_value"))
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = spans.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("day").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        calendar.join(daily, on=["user_id", "day"], how="left")
        .select(
            "user_id",
            "day",
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
            F.col("day_value").isNull().alias("is_gap"),
        )
    )


SQL_A13 = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         round(avg(value), 6) AS day_value
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
spans AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
),
calendar AS (
  SELECT user_id,
         CAST(unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP,
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM spans
)
SELECT c.user_id, c.day,
       last_value(d.day_value IGNORE NULLS)
         OVER (PARTITION BY c.user_id ORDER BY c.day ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       d.day_value IS NULL AS is_gap
FROM calendar c
LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
"""


def q_a14_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts + revenue at three explicit granularities —
    by status, by priority, and the grand total — in ONE pass.

    Plan: a single Expand (3 output rows per input) feeding one
    hash aggregate; the alternative (three separate groupBys
    unioned) scans and shuffles the fact three times.
    """
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "n_orders",
            "revenue",
        )
    )


SQL_A14 = """
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


EXT16_QUERIES = {
    "a13_gapfill_daily": q_a13_gapfill_daily,
    "a14_grouping_sets": q_a14_grouping_sets,
}

EXT16_ORACLES = {
    "a13_gapfill_daily": SQL_A13,
    "a14_grouping_sets": SQL_A14,
}
