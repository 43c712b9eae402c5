"""Seventeenth query wave — behavioral analytics over the event stream:

- funnel_conversion: ordered multi-step funnel (signup → click →
  purchase) with per-step user counts and conversion vs the top of
  the funnel. The reference's pipeline is exactly this kind of
  event-stream analytics (upbit_data_pipeline.py ingests trade events
  and downstream dashboards count state transitions); an analytics
  engine over an events table needs the ordered-funnel shape.
- cohort_retention: weekly cohort × week-offset retention matrix —
  users grouped by first-seen week, counted in each subsequent active
  week. The canonical growth-analytics rollup.
- a15_robust_stats: per-group median / MAD / MAD-outlier count —
  robust location+scale, the outlier rule that a mean/stddev audit
  (dq_audit_orders) gets wrong under heavy tails.
- a16_rolling_zscore: per-key trailing-window z-score anomaly flags —
  the batch form of the reference's monitoring loop
  (monitor_errors.py polls logs and alerts on anomalies; here the
  anomaly score is a windowed aggregate, not a driver-side poll).

All four are single-digit-shuffle plans keyed on their natural keys
(user_id / event_type); nothing materializes more than |keys| ×
|window| rows. [EXT]-classic per SURVEY.md §2.5/§2.9 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t

FUNNEL_STEPS = ("signup", "click", "purchase")


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first signup precedes a later click
    precedes a later purchase; per-step reach + conversion rate.

    Shape: ONE groupBy pass over the events scan collects, per user,
    the first-signup time plus the sorted click/purchase timestamp
    arrays; the ordering constraint (each step must FOLLOW the
    previous step's time) is then a per-row array filter+min — so a
    k-step funnel is one shuffle regardless of k, vs the k-1
    self-joins of the textbook SQL form (the oracle below). Per-user
    state is bounded by that user's step-event count, the same bound
    sessionization already carries. The final step-count pivot is a
    3-row explode on an already-1-row-per-user frame, and the
    conversion denominator is a window over the 3-row aggregate —
    no driver-side action.

    At 100 TB: one shuffle keyed by user_id (the natural partitioning
    for every per-user analytic here), then a tiny global agg. Skewed
    users are impossible by construction (one row per user after the
    first agg).
    """
    events = _t(spark, sf_dir, "events")
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t1"),
            # collect each later step's candidate set once; the
            # ordering constraint needs the PREVIOUS step's time, so
            # fold it in with sorted arrays (exact, still one pass)
            F.sort_array(
                F.collect_list(F.when(F.col("event_type") == "click", F.col("ts")))
            ).alias("clicks"),
            F.sort_array(
                F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts")))
            ).alias("purchases"),
        )
        .withColumn(
            "t2",
            F.array_min(F.filter("clicks", lambda c: c > F.col("t1"))),
        )
        .withColumn(
            "t3",
            F.array_min(F.filter("purchases", lambda p: p > F.col("t2"))),
        )
    )
    steps = per_user.select(
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("step"), F.lit("signup").alias("step_name"), F.col("t1").isNotNull().alias("hit")),
                F.struct(F.lit(2).alias("step"), F.lit("click").alias("step_name"), F.col("t2").isNotNull().alias("hit")),
                F.struct(F.lit(3).alias("step"), F.lit("purchase").alias("step_name"), F.col("t3").isNotNull().alias("hit")),
            )
        ).alias("s")
    ).select("s.*")
    # Deliberate GLOBAL window over exactly 3 funnel-step rows — the
    # single-partition WindowExec is free at any fact size, and beats
    # the alternatives (a broadcast-scalar cross join would add a
    # BroadcastNestedLoopJoin and a second subtree). The sanctioned-
    # sites plan gate in tests/test_plans.py pins which queries may
    # carry a partition-less window; bench.py demotes the logger.
    w_all = Window.orderBy("step").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # denominator: explicitly the STEP-1 count, not "first surviving
    # row" — the hit chain (t2 needs t1) makes them equal whenever any
    # row exists, but the explicit form can't silently renormalize if
    # a future edit breaks that invariant
    entered = F.max(F.when(F.col("step") == 1, F.col("users"))).over(w_all)
    return (
        steps.filter("hit")
        .groupBy("step", "step_name")
        .agg(F.count(F.lit(1)).alias("users"))
        # 3-row frame: the single-partition window is free here
        .withColumn(
            "conversion",
            F.round(F.col("users") / entered.cast("double"), 6),
        )
        .select("step", "step_name", "users", "conversion")
    )


SQL_FUNNEL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t1
  FROM events GROUP BY user_id
),
step2 AS (
  SELECT p.user_id, p.t1, min(e.ts) AS t2
  FROM per_user p JOIN events e
    ON e.user_id = p.user_id AND e.event_type = 'click' AND e.ts > p.t1
  GROUP BY p.user_id, p.t1
),
step3 AS (
  SELECT s.user_id, min(e.ts) AS t3
  FROM step2 s JOIN events e
    ON e.user_id = s.user_id AND e.event_type = 'purchase' AND e.ts > s.t2
  GROUP BY s.user_id
),
counts AS (
  SELECT 1 AS step, 'signup' AS step_name,
         count(*) FILTER (WHERE t1 IS NOT NULL) AS users FROM per_user
  UNION ALL
  SELECT 2, 'click', count(*) FROM step2
  UNION ALL
  SELECT 3, 'purchase', count(*) FROM step3
)
SELECT step, step_name, CAST(users AS BIGINT) AS users,
       round(users / (SELECT CAST(users AS DOUBLE) FROM counts WHERE step = 1),
             6) AS conversion
FROM counts
WHERE users > 0
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week,
    counted per (cohort_week, week_offset) of later activity.

    Shape: first-seen agg (shuffle on user_id) → join back on user_id
    (same key — AQE reuses the exchange layout) → distinct + count on
    (cohort, offset). The (user, week) distinct is the only row
    amplification and is bounded by users × active-weeks.
    """
    events = _t(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    return (
        active.join(first_seen, "user_id")
        .withColumn(
            "week_offset",
            (F.datediff("week", "cohort_week") / 7).cast("long"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("users"))
    )


SQL_COHORT = """
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.week) // 7 AS BIGINT) AS week_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS users
FROM active a JOIN first_seen f USING (user_id)
GROUP BY f.cohort_week, week_offset
"""


def q_a15_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust stats: exact median, MAD (median absolute
    deviation), and the count of 3-MAD outliers.

    Median/MAD need two dependent exact-quantile passes; both group on
    event_type (5 keys), so the med/mad side is a broadcast back onto
    the scan — the fact shuffles once per quantile pass, never on a
    fabricated join key. ``median`` is Spark's exact interpolated
    median (SQL:2023 PERCENTILE_CONT 0.5), matching DuckDB's.

    At 100 TB exact median is a real cost (full sort per group);
    ``approx_percentile`` is the documented production tier — this
    registry entry keeps the exact form because the oracle is exact.
    """
    events = _t(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
    )


SQL_A15 = """
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type, round(any_value(d.med), 6) AS med,
       round(any_value(m.mad), 6) AS mad,
       CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       CAST(count(*) AS BIGINT) AS n
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""


def q_a16_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing z-score anomaly detection: each event scored
    against the mean/stddev of its user's PREVIOUS 20 events; rows
    with |z| > 2.5 (and a warmed-up window of ≥ 10) are flagged.

    The trailing frame (20 PRECEDING .. 1 PRECEDING) excludes the
    current row — scoring a point against a window that contains it
    dilutes the anomaly, the classic self-contamination bug. One
    shuffle on user_id, sort within partitions by ts; at 100 TB this
    is the same keyed layout every per-user analytic shares.

    Batch twin of the streaming anomaly path (monitor_errors.py's
    alert loop → streaming/listeners.py); z is rounded to 6dp since
    windowed mean/variance are order-dependent float sums.
    """
    events = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc())
        .rowsBetween(-20, -1)
    )
    scored = events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.avg("value").over(w).alias("w_avg"),
        F.stddev_samp("value").over(w).alias("w_std"),
        F.count("value").over(w).alias("w_n"),
    ).withColumn(
        "z", F.round((F.col("value") - F.col("w_avg")) / F.col("w_std"), 6)
    )
    return scored.filter(
        (F.col("w_n") >= 10) & (F.col("w_std") > 0) & (F.abs("z") > 2.5)
    ).select("event_id", "user_id", "ts", "value", "z")



SQL_A16 = """
WITH scored AS (
  SELECT event_id, user_id, ts, value,
         avg(value) OVER w AS w_avg,
         stddev_samp(value) OVER w AS w_std,
         count(value) OVER w AS w_n
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, ts, value,
       round((value - w_avg) / w_std, 6) AS z
FROM scored
WHERE w_n >= 10 AND w_std > 0
  AND abs(round((value - w_avg) / w_std, 6)) > 2.5
"""


EXT17_QUERIES = {
    "funnel_conversion": q_funnel_conversion,
    "cohort_retention": q_cohort_retention,
    "a15_robust_stats": q_a15_robust_stats,
    "a16_rolling_zscore": q_a16_rolling_zscore,
}

EXT17_ORACLES = {
    "funnel_conversion": SQL_FUNNEL,
    "cohort_retention": SQL_COHORT,
    "a15_robust_stats": SQL_A15,
    "a16_rolling_zscore": SQL_A16,
}
