"""Thirty-fourth query wave — behavioral Markov transitions:

- a32_event_transitions: the first-order event-transition model of a
  user-behavior stream — for every (prev_type → next_type) pair, its
  count, conditional probability P(next | prev), and mean inter-event
  gap. The session-modeling companion to the funnel (which fixes the
  step order up front) and the event-sequence analog of the bigram LM
  (x31 counts token bigrams; this counts behavior bigrams with a time
  axis). Product analytics uses it for next-action prediction and
  drop-off diagnosis; the gap column is the dwell-time signal.

Shape: ONE user_id window pass (lag of type and ts, event_id
tiebreak so same-ts events order identically in both engines —
the ext3/ext27 determinism contract) feeding two dimension-bounded
groupBys (|types|² transition cells); the conditional join is on the
~|types| context counts. Float contract: gap seconds are exact
per-row (integer µs difference / 1e6); the mean gap and P(next|prev)
are order-dependent/derived → round(6).

[EXT]-classic per SURVEY.md §2.5/§2.6 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t


def q_a32_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(prev_type, next_type, n, p_next, avg_gap_s) over all
    consecutive same-user event pairs."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
            (
                (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
                / F.lit(1_000_000.0)
            ).alias("gap_s"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    trans = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("gap_s"), 6).alias("avg_gap_s"),
    )
    # context totals derive from the ALREADY-aggregated |types|² cells
    # (a partition-only window over trans) — a second fact-sized
    # groupBy of pairs would re-run the window pass over all events
    n_prev = F.sum("n").over(Window.partitionBy("prev_type"))
    return trans.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / n_prev, 6).alias("p_next"),
        "avg_gap_s",
    )


SQL_A32 = """
WITH pairs AS (
  SELECT lag(event_type) OVER w AS prev_type,
         event_type AS next_type,
         (epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 1000000.0 AS gap_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
trans AS (
  SELECT prev_type, next_type, count(*) AS n,
         round(avg(gap_s), 6) AS avg_gap_s
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
         AS p_next,
       avg_gap_s
FROM trans
"""


EXT34_QUERIES = {
    "a32_event_transitions": q_a32_event_transitions,
}

EXT34_ORACLES = {
    "a32_event_transitions": SQL_A32,
}
