"""Twentieth query wave — temporal enrichment, relational reshaping,
and incremental aggregate maintenance:

- j7_temporal_join: point-in-time (temporal) join — each fact row
  picks the dimension VERSION effective at its own timestamp from the
  SCD2 history (wave 15). The warehouse op behind "what was this
  key's attribute WHEN the event happened" — a plain join against the
  current dimension silently backdates today's attributes onto
  history.
- p14_unpivot: UNPIVOT/melt — wide measure columns to (measure,
  value) rows via Spark's native ``unpivot`` (one Expand, no union of
  per-column scans). Completes the reshaping pair with pivot_counts.
- incremental_rollup: aggregate maintenance by partial merge — yesterday's
  rollup STATE plus today's DELTA re-aggregate to exactly the
  full-recompute answer, because sum/count are commutative monoids.
  At 100 TB this is the difference between touching one day and
  touching the whole history; the oracle IS the full recompute, so
  the merge being lossless is what the hash check proves.

[EXT]-classic per SURVEY.md §2.4/§2.3/§2.5 scope; the reference's
incremental candle loader (upbit_daily_candels.py fetch-since-max) is
the ingestion half of incremental_rollup — this wave adds the
aggregation half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.operators import aggregates as agg
from streaming_data_spark.queries import _t

# split point for the state/delta halves (observed span is 2024-01).
# Mid-DAY on purpose: the (user, day=Jan-21) groups then have partials
# on BOTH sides, so the oracle hash actually exercises the merge —
# a midnight split would leave every group wholly inside one half.
INCR_SPLIT = "2024-01-21 12:00:00"


def q_j7_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich each purchase event with the event_type VERSION its user
    was in at purchase time, from the SCD2 history.

    Join shape: equi on user_id with the range predicate riding the
    same sort-merge join (ts >= effective_from AND (effective_to IS
    NULL OR ts < effective_to)) — a keyed join with a residual
    condition, never a nested loop. Because SCD2 versions tile each
    key's timeline (the wave-15 property test), every fact matches
    EXACTLY one version — the join cannot fan out, which is the
    invariant that makes temporal joins safe at 100 TB.
    """
    events = _t(spark, sf_dir, "events")
    # both sides derive from the same scan — rename the history side
    # up front so the join condition has no ambiguous lineage
    hist = agg.scd2_history(
        events, key="user_id", order_col="ts", tracked="event_type",
        tiebreak="event_id",
    ).select(
        F.col("user_id").alias("h_user_id"),
        F.col("event_type").alias("version_type"),
        "effective_from",
        "effective_to",
    )
    facts = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    cond = (
        (facts["user_id"] == hist["h_user_id"])
        & (facts["ts"] >= hist["effective_from"])
        & (hist["effective_to"].isNull() | (facts["ts"] < hist["effective_to"]))
    )
    return facts.join(hist, cond).select(
        "event_id", "user_id", "ts", "value", "version_type", "effective_from"
    )


SQL_J7 = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS prev
  FROM events
),
hist AS (
  SELECT user_id, event_type, ts AS effective_from,
         lead(ts) OVER (PARTITION BY user_id
                        ORDER BY ts ASC, event_id ASC) AS effective_to
  FROM ordered
  WHERE prev IS NULL OR prev <> event_type
)
SELECT f.event_id, f.user_id, f.ts, f.value,
       h.event_type AS version_type, h.effective_from
FROM events f
JOIN hist h
  ON f.user_id = h.user_id
 AND f.ts >= h.effective_from
 AND (h.effective_to IS NULL OR f.ts < h.effective_to)
WHERE f.event_type = 'purchase'
"""


def q_p14_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt lineitem's four measure columns into (measure, value)
    rows — native ``unpivot``: ONE Expand over one scan (the UNION-of-
    projections rewrite scans the fact once per measure)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )


SQL_P14 = """
SELECT l_orderkey, l_linenumber, measure, value
FROM (
  SELECT l_orderkey, l_linenumber,
         l_quantity, l_extendedprice, l_discount, l_tax
  FROM lineitem
) UNPIVOT (value FOR measure IN
           (l_quantity, l_extendedprice, l_discount, l_tax))
"""


def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, day) event rollup maintained incrementally: the
    pre-split STATE (itself an aggregate) merged with the post-split
    DELTA re-aggregates to the exact full-history answer.

    sum/count are merged by summing partials; avg is DERIVED at read
    time from the merged monoids — averaging averages is the classic
    incremental-maintenance bug, and the exact-oracle hash would catch
    it. Both halves here scan the same parquet with disjoint pushed
    date filters; in production the state side is yesterday's
    materialized rollup table, so only the delta touches raw events.
    """
    events = _t(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "user_id", F.col("ts").cast("date").alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
        )

    state = partial(events.filter(F.col("ts") < F.lit(INCR_SPLIT).cast("timestamp")))
    delta = partial(events.filter(F.col("ts") >= F.lit(INCR_SPLIT).cast("timestamp")))
    return (
        state.unionByName(delta)
        .groupBy("user_id", "day")
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
        .select(
            "user_id",
            "day",
            "n",
            F.round("total", 6).alias("total"),
            F.round(F.col("total") / F.col("n"), 6).alias("avg_value"),
        )
    )


SQL_INCR = """
SELECT user_id, CAST(ts AS DATE) AS day,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 6) AS total,
       round(sum(value) / count(*), 6) AS avg_value
FROM events
GROUP BY user_id, CAST(ts AS DATE)
"""


EXT20_QUERIES = {
    "j7_temporal_join": q_j7_temporal_join,
    "p14_unpivot": q_p14_unpivot,
    "incremental_rollup": q_incremental_rollup,
}

EXT20_ORACLES = {
    "j7_temporal_join": SQL_J7,
    "p14_unpivot": SQL_P14,
    "incremental_rollup": SQL_INCR,
}
