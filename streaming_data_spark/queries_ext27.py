"""Twenty-seventh query wave — session-scoped funnel:

- funnel_in_session: the signup → click → purchase funnel evaluated
  WITHIN each 30-minute-gap session rather than over a user's whole
  history — "did the user convert in one sitting". Composes the two
  already-oracle-proven shapes: the gap-sessionization assignment
  (queries_ext3.q_sessionization) and the one-shuffle array funnel
  (queries_ext17.q_funnel_conversion), now keyed by (user, session).
  Product analytics runs BOTH horizons; the session-scoped one is the
  stricter (and usually the honest) conversion number.

Shape: the session assignment is two window passes on the user_id
keying; the funnel agg then groups by (user_id, session_seq) — the
SAME keyed layout, so AQE reuses the exchange end to end. Per-session
state is the session's step-event timestamp arrays (bounded by
session length). [EXT] per SURVEY.md §2.5/§2.9 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t

GAP_US = 30 * 60 * 1_000_000


def q_funnel_in_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-step session counts + conversion vs sessions that started
    the funnel (step 1 = a signup inside the session)."""
    events = _t(spark, sf_dir, "events")
    # event_id tiebreak makes session assignment TOTAL: two same-user
    # events sharing a ts would otherwise get order-dependent
    # cumulative-sum session numbers (and could diverge vs the oracle).
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w_order))
    sessioned = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > GAP_US), 1).otherwise(0),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(w_order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = (
        sessioned.groupBy("user_id", "session_seq")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t1"),
            F.sort_array(
                F.collect_list(F.when(F.col("event_type") == "click", F.col("ts")))
            ).alias("clicks"),
            F.sort_array(
                F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts")))
            ).alias("purchases"),
        )
        .withColumn("t2", F.array_min(F.filter("clicks", lambda c: c > F.col("t1"))))
        .withColumn("t3", F.array_min(F.filter("purchases", lambda p: p > F.col("t2"))))
    )
    steps = per_session.select(
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("step"), F.lit("signup").alias("step_name"), F.col("t1").isNotNull().alias("hit")),
                F.struct(F.lit(2).alias("step"), F.lit("click").alias("step_name"), F.col("t2").isNotNull().alias("hit")),
                F.struct(F.lit(3).alias("step"), F.lit("purchase").alias("step_name"), F.col("t3").isNotNull().alias("hit")),
            )
        ).alias("s")
    ).select("s.*")
    # Deliberate GLOBAL window over exactly 3 funnel-step rows (see
    # q_funnel_conversion: single-partition WindowExec is free here,
    # and the sanctioned-sites plan gate pins the allowed sites).
    w_all = Window.orderBy("step").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    entered = F.max(F.when(F.col("step") == 1, F.col("n_sessions"))).over(w_all)
    return (
        steps.filter("hit")
        .groupBy("step", "step_name")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .withColumn(
            "conversion",
            F.round(F.col("n_sessions") / entered.cast("double"), 6),
        )
        .select("step", "step_name", "n_sessions", "conversion")
    )


SQL_FUNNEL_SESSION = """
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT user_id, ts, event_type,
    (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
      AS session_seq
  FROM flagged
), s1 AS (
  SELECT user_id, session_seq,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t1
  FROM sessioned GROUP BY user_id, session_seq
), s2 AS (
  SELECT p.user_id, p.session_seq, min(e.ts) AS t2
  FROM s1 p JOIN sessioned e
    ON e.user_id = p.user_id AND e.session_seq = p.session_seq
   AND e.event_type = 'click' AND e.ts > p.t1
  GROUP BY p.user_id, p.session_seq
), s3 AS (
  SELECT s.user_id, s.session_seq, min(e.ts) AS t3
  FROM s2 s JOIN sessioned e
    ON e.user_id = s.user_id AND e.session_seq = s.session_seq
   AND e.event_type = 'purchase' AND e.ts > s.t2
  GROUP BY s.user_id, s.session_seq
), counts AS (
  SELECT 1 AS step, 'signup' AS step_name,
         count(*) FILTER (WHERE t1 IS NOT NULL) AS n_sessions FROM s1
  UNION ALL
  SELECT 2, 'click', count(*) FROM s2
  UNION ALL
  SELECT 3, 'purchase', count(*) FROM s3
)
SELECT step, step_name, CAST(n_sessions AS BIGINT) AS n_sessions,
       round(n_sessions / (SELECT CAST(n_sessions AS DOUBLE)
                           FROM counts WHERE step = 1), 6) AS conversion
FROM counts
WHERE n_sessions > 0
"""


EXT27_QUERIES = {
    "funnel_in_session": q_funnel_in_session,
}

EXT27_ORACLES = {
    "funnel_in_session": SQL_FUNNEL_SESSION,
}
