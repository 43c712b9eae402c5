"""Twenty-first query wave — time-series session/structure analytics:

- a19_activity_streaks: gaps-and-islands — each user's LONGEST run of
  consecutive active days (with its start/end). The canonical
  row_number-anchor trick: day − row_number(day) is constant exactly
  within a consecutive run, so islands fall out of one groupBy with
  no self-joins. The structural complement of a13's gap-fill (a13
  repairs gaps; a19 measures the islands between them).
- a20_rolling_corr: trailing 7-day Pearson correlation between two
  daily metric series (click vs purchase value) — windowed two-series
  co-movement, the time-series analytics step past single-series
  rolling stats (a4/a6/a16).

[EXT]-classic per SURVEY.md §2.5 scope; the reference's nearest shape
is the per-market daily candle series (upbit_daily_candels.py), which
these operators consume rather than produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t


def q_a19_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user.

    Shape: dedupe to (user, day) — one shuffle; row_number per user
    over day ASC; anchor = day − rn days is the island invariant; one
    groupBy (user, anchor) sizes each island; min_by picks the
    longest (ties → earliest start, made total by the struct order).
    Everything rides the user_id keying; no joins at all.
    """
    events = _t(spark, sf_dir, "events")
    ud = events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy(F.col("day").asc())
    islands = (
        ud.withColumn("rn", F.row_number().over(w))
        .withColumn("anchor", F.expr("date_sub(day, rn)"))
        .groupBy("user_id", "anchor")
        .agg(
            F.count(F.lit(1)).alias("streak_days"),
            F.min("day").alias("streak_start"),
            F.max("day").alias("streak_end"),
        )
    )
    best = (
        islands.groupBy("user_id")
        .agg(
            F.max(
                F.struct(
                    F.col("streak_days"),
                    # tiebreak: EARLIEST start wins ⇒ maximize the
                    # negated epoch day inside the max-struct
                    (-F.unix_date("streak_start")).alias("neg_start"),
                    F.col("streak_start"),
                    F.col("streak_end"),
                )
            ).alias("s")
        )
        .select(
            "user_id",
            F.col("s.streak_days").alias("streak_days"),
            F.col("s.streak_start").alias("streak_start"),
            F.col("s.streak_end").alias("streak_end"),
        )
    )
    return best


SQL_A19 = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
islands AS (
  SELECT user_id,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day ASC)::INTEGER
           AS anchor,
         day
  FROM ud
),
sized AS (
  SELECT user_id, anchor,
         CAST(count(*) AS BIGINT) AS streak_days,
         min(day) AS streak_start, max(day) AS streak_end
  FROM islands GROUP BY user_id, anchor
),
ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY user_id
           ORDER BY streak_days DESC, streak_start ASC) AS rk
  FROM sized
)
SELECT user_id, streak_days, streak_start, streak_end
FROM ranked WHERE rk = 1
"""


def q_a20_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day Pearson correlation between the daily mean
    click value and the daily mean purchase value.

    Shape: one conditional-avg rollup to the daily two-series frame
    (days × 2 columns — tiny), then corr() over a trailing row frame.
    The window is on the DAILY table, so the single-partition window
    warning is irrelevant at any corpus size: rows = days. Emitted
    only for fully-warmed 7-day windows with variance on both sides
    (corr is NULL-unstable below that); rounded — corr is a ratio of
    order-dependent float sums.
    """
    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.avg(F.when(F.col("event_type") == "click", F.col("value"))).alias("click_v"),
        F.avg(F.when(F.col("event_type") == "purchase", F.col("value"))).alias("purchase_v"),
    )
    # Deliberate GLOBAL window: input is one row per DAY (aggregate-
    # sized at any corpus scale), so the single-partition WindowExec is
    # benign. A literal partitionBy key can't silence the warning
    # (Catalyst folds it away); the sanctioned-sites plan gate in
    # tests/test_plans.py pins this as one of the few allowed
    # partition-less windows, and bench.py demotes the logger.
    w = Window.orderBy(F.col("day").asc()).rowsBetween(-6, 0)
    return (
        daily.select(
            "day",
            F.round(F.corr("click_v", "purchase_v").over(w), 6).alias("corr_7d"),
            F.count(F.lit(1)).over(w).alias("w_n"),
        )
        .filter(F.col("w_n") >= 7)
        # degenerate windows (zero variance, or <2 days where both
        # series are non-null) are Spark NaN but DuckDB NULL — drop
        # both spellings so sparse corpora can't diverge the oracle
        .filter(F.col("corr_7d").isNotNull() & ~F.isnan("corr_7d"))
        .select("day", "corr_7d")
    )


SQL_A20 = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         avg(CASE WHEN event_type = 'click' THEN value END) AS click_v,
         avg(CASE WHEN event_type = 'purchase' THEN value END) AS purchase_v
  FROM events GROUP BY CAST(ts AS DATE)
),
rolled AS (
  SELECT day,
         round(corr(click_v, purchase_v) OVER w, 6) AS corr_7d,
         count(*) OVER w AS w_n
  FROM daily
  WINDOW w AS (ORDER BY day ASC ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day, corr_7d FROM rolled WHERE w_n >= 7 AND corr_7d IS NOT NULL
"""


EXT21_QUERIES = {
    "a19_activity_streaks": q_a19_activity_streaks,
    "a20_rolling_corr": q_a20_rolling_corr,
}

EXT21_ORACLES = {
    "a19_activity_streaks": SQL_A19,
    "a20_rolling_corr": SQL_A20,
}
