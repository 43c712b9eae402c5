"""Forty-fourth query wave — forecasting + feature relevance:

- a37_holt_forecast: Holt's linear-trend exponential smoothing over
  each user's daily closes (level + trend double-state recursion,
  the third mapInPandas fold after ewma/rsi) with the one-step-ahead
  forecast. Daily closes are exact selections (max_by) and the
  smoothing constants — INCLUDING the precomputed (1−α)/(1−β) — are
  interpolated into the DuckDB RECURSIVE-CTE oracle with repr(), so
  every fold step is the same IEEE op sequence in both engines:
  outputs exact, unrounded.
- x53_mutual_info: mutual information I(event_type; value-bin) in
  nats over 10 equal-width global bins — the feature-relevance score
  between a categorical column and a numeric one (the "should this
  feature enter the model" number). Cell/margin arithmetic is exact
  integer counts + single IEEE ops; the one cross-cell Σ rounds to 6
  on both sides.

Scale shapes: a37 consumes the keys × days daily grid (the one
fact-sized pass is the daily-close groupBy); x53 is one map-side-
combinable fact groupBy onto a |types|×10 cell table, margins via
windows over cells, the scalar total via the sanctioned one-row
broadcast.

[EXT]-classic per SURVEY.md §2.5 / §2.11 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark.operators import indicators as ind
from streaming_data_spark.queries import _t
from streaming_data_spark.queries_ext30 import _DAILY_SQL

ALPHA = 0.2
BETA = 0.1


def q_a37_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, day, close, level, trend, fc_next): Holt smoothing
    per user-day."""
    daily = ind.daily_closes(_t(spark, sf_dir, "events"))
    return ind.holt(daily, alpha=ALPHA, beta=BETA)


# repr()-interpolated constants: (1.0 - 0.2) etc. computed in PYTHON
# and pasted as decimal literals — DuckDB evaluating the subtraction
# itself can land one ulp away (the r6 DECIMAL lesson).
_A, _OMA = repr(ALPHA), repr(1.0 - ALPHA)
_B, _OMB = repr(BETA), repr(1.0 - BETA)

SQL_A37 = f"""
WITH RECURSIVE daily AS ({_DAILY_SQL}),
numbered AS (
  SELECT user_id, day, close,
         row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM daily
),
r AS (
  -- trend seed MUST be typed DOUBLE: a bare 0.0 pins the recursive
  -- column to DECIMAL(1,1) and the recursion overflows its scale
  SELECT user_id, day, close, rn,
         close AS level, CAST(0.0 AS DOUBLE) AS trend
  FROM numbered WHERE rn = 1
  UNION ALL
  -- EXACTLY the engine fold's op order; the trend term recomputes
  -- the new level expression (identical arithmetic, identical bits)
  SELECT n.user_id, n.day, n.close, n.rn,
         {_A} * n.close + {_OMA} * (r.level + r.trend),
         {_B} * (({_A} * n.close + {_OMA} * (r.level + r.trend)) - r.level)
           + {_OMB} * r.trend
  FROM numbered n JOIN r ON n.user_id = r.user_id AND n.rn = r.rn + 1
)
SELECT user_id, day, close, level, trend, level + trend AS fc_next
FROM r
"""


def q_x53_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n, n_cells, mi): mutual information between event_type
    and the 10-bin global value discretization, in nats."""
    ev = _t(spark, sf_dir, "events")
    edges = ev.agg(
        F.min("value").alias("_lo"), F.max("value").alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(10.0)
    binned = ev.crossJoin(F.broadcast(edges)).select(
        "event_type",
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("value") - F.col("_lo")) / width), F.lit(9)
            )
        )
        .cast("int")
        .alias("bin"),
    )
    cells = binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_t = Window.partitionBy("event_type")
    w_b = Window.partitionBy("bin")
    total = cells.agg(F.sum("c").alias("n"))
    p_xy = F.col("c") / F.col("n")
    p_x = F.col("ct") / F.col("n")
    p_y = F.col("cb") / F.col("n")
    return (
        cells.withColumn("ct", F.sum("c").over(w_t))
        .withColumn("cb", F.sum("c").over(w_b))
        .crossJoin(F.broadcast(total))
        .withColumn("term", p_xy * F.log(p_xy / (p_x * p_y)))
        .groupBy()
        .agg(
            F.max("n").alias("n"),
            F.count(F.lit(1)).alias("n_cells"),
            F.round(F.sum("term"), 6).alias("mi"),
        )
    )


SQL_X53 = """
WITH edges AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
binned AS (
  SELECT event_type,
         CASE WHEN g.hi = g.lo THEN 0
              ELSE least(CAST(floor((e.value - g.lo) / ((g.hi - g.lo) / 10.0))
                         AS INT), 9)
         END AS bin
  FROM events e, edges g
),
cells AS (
  SELECT event_type, bin, count(*) AS c FROM binned GROUP BY event_type, bin
),
marg AS (
  SELECT event_type, bin, c,
         sum(c) OVER (PARTITION BY event_type) AS ct,
         sum(c) OVER (PARTITION BY bin) AS cb,
         sum(c) OVER () AS n
  FROM cells
)
SELECT CAST(max(n) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_cells,
       round(sum((c / n) * ln((c / n) / ((ct / n) * (cb / n)))), 6) AS mi
FROM marg
"""


EXT44_QUERIES = {
    "a37_holt_forecast": q_a37_holt_forecast,
    "x53_mutual_info": q_x53_mutual_info,
}

EXT44_ORACLES = {
    "a37_holt_forecast": SQL_A37,
    "x53_mutual_info": SQL_X53,
}
