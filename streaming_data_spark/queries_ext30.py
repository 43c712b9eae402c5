"""Thirtieth query wave — technical indicators over daily closes.

The reference materializes daily candles and change codes
(airflow/dags/upbit_daily_candels.py:60-90) and charts them in
Kibana; these are the indicators a charting/alerting layer derives
from exactly that daily grid:

- a27_sma_crossover: 5/20-day moving-average golden/death crosses.
- a28_bollinger: 20-day mean ± 2σ bands + close position.
- a29_ewma: recursive exponential smoothing (the one inherently
  sequential recursion — a partition-level ``mapInPandas`` fold over
  key-sorted partitions, state carried across Arrow batches, with a
  DuckDB RECURSIVE-CTE oracle repeating the same IEEE fold).
- a30_max_drawdown: worst peak-to-trough decline per key.

Shape: one fact-sized pass (the daily-close groupBy, map-side
combinable); every rolling form rides the same user_id keying so the
whole family is ONE exchange deep. Output rows are keys × calendar
days (a27-a29) or keys (a30) — dimension-bounded regardless of fact
volume. Cross-engine float contract: rolling means/stddevs are
order-dependent sums → rounded to 6 BEFORE any comparison that feeds
a signal column, on BOTH sides; single-op arithmetic (drawdown
division) stays unrounded until the final aggregate.

[EXT]-classic per SURVEY.md §2.5/§2.6 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.operators import indicators as ind
from streaming_data_spark.queries import _t

# row_number (not arg_max) because DuckDB's arg_max rejects a STRUCT
# ordering key; ts DESC, event_id DESC first-row == Spark's
# max_by(value, struct(ts, event_id)) — the same total order.
_DAILY_SQL = """
  SELECT user_id, day, close FROM (
    SELECT user_id, date_trunc('day', ts) AS day, value AS close,
           row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events)
  WHERE rn = 1
"""


def q_a27_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden/death crosses of the 5-day vs 20-day SMA per user."""
    daily = ind.daily_closes(_t(spark, sf_dir, "events"))
    return ind.sma_crossover(daily, short=5, long=20)


SQL_A27 = f"""
WITH daily AS ({_DAILY_SQL}),
sm AS (
  SELECT user_id, day, close,
    round(avg(close) OVER (PARTITION BY user_id ORDER BY day
          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS sma_s,
    round(avg(close) OVER (PARTITION BY user_id ORDER BY day
          ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 6) AS sma_l,
    count(close) OVER (PARTITION BY user_id ORDER BY day
          ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS n_l
  FROM daily
),
lagged AS (
  SELECT user_id, day, close, sma_s, sma_l, n_l,
         lag(sma_s) OVER w AS p_sma_s,
         lag(sma_l) OVER w AS p_sma_l,
         lag(n_l) OVER w AS p_n_l
  FROM sm
  WINDOW w AS (PARTITION BY user_id ORDER BY day)
)
SELECT user_id, day, close, sma_s, sma_l,
       CASE WHEN sma_s > sma_l AND p_sma_s <= p_sma_l THEN 'GOLDEN'
            WHEN sma_s < sma_l AND p_sma_s >= p_sma_l THEN 'DEATH'
       END AS signal
FROM lagged
WHERE n_l = 20 AND p_n_l = 20
"""


def q_a28_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-day Bollinger bands + close position per user-day."""
    daily = ind.daily_closes(_t(spark, sf_dir, "events"))
    return ind.bollinger_bands(daily, periods=20, n_std=2.0)


SQL_A28 = f"""
WITH daily AS ({_DAILY_SQL}),
banded AS (
  SELECT user_id, day, close,
    round(avg(close) OVER w, 6) AS mid,
    round(avg(close) OVER w + 2.0 * stddev_samp(close) OVER w, 6) AS upper,
    round(avg(close) OVER w - 2.0 * stddev_samp(close) OVER w, 6) AS lower,
    count(close) OVER w AS w_n
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT user_id, day, close, mid, upper, lower,
       CASE WHEN close > upper THEN 'ABOVE'
            WHEN close < lower THEN 'BELOW'
            ELSE 'IN' END AS position
FROM banded
WHERE w_n = 20
"""


def q_a29_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive EWMA (alpha=0.2) of each user's daily close."""
    daily = ind.daily_closes(_t(spark, sf_dir, "events"))
    return ind.ewma(daily, alpha=0.2).withColumn("ewma", F.round("ewma", 6))


SQL_A29 = f"""
WITH RECURSIVE daily AS ({_DAILY_SQL}),
numbered AS (
  SELECT user_id, day, close,
         row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM daily
),
r AS (
  SELECT user_id, day, close, rn, close AS ewma
  FROM numbered WHERE rn = 1
  UNION ALL
  -- EXACTLY the engine's fold: 0.2*x + 0.8*y_prev, same IEEE op order
  SELECT n.user_id, n.day, n.close, n.rn, 0.2 * n.close + 0.8 * r.ewma
  FROM numbered n JOIN r ON n.user_id = r.user_id AND n.rn = r.rn + 1
)
SELECT user_id, day, close, round(ewma, 6) AS ewma FROM r
"""


def q_a30_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst peak-to-trough decline of each user's daily close."""
    daily = ind.daily_closes(_t(spark, sf_dir, "events"))
    return ind.max_drawdown(daily)


SQL_A30 = f"""
WITH daily AS ({_DAILY_SQL}),
dd AS (
  SELECT user_id, close,
    max(close) OVER (PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM daily
)
SELECT user_id,
       round(min((close - peak) / peak), 6) AS max_drawdown,
       count(*) AS n_days
FROM dd GROUP BY user_id
"""


EXT30_QUERIES = {
    "a27_sma_crossover": q_a27_sma_crossover,
    "a28_bollinger": q_a28_bollinger,
    "a29_ewma": q_a29_ewma,
    "a30_max_drawdown": q_a30_max_drawdown,
}

EXT30_ORACLES = {
    "a27_sma_crossover": SQL_A27,
    "a28_bollinger": SQL_A28,
    "a29_ewma": SQL_A29,
    "a30_max_drawdown": SQL_A30,
}
