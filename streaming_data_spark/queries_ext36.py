"""Thirty-sixth query wave — the indicator panel completed (ATR, RSI,
stochastic oscillator, OBV) over the reference's daily-candle grid
(airflow/dags/upbit_daily_candels.py:60-90 materializes the candles;
these are the remaining indicators its charting layer derives).

- a33_atr: Average True Range (SMA variant) over daily OHLC — range
  volatility with the prev-close gap folded in.
- a34_rsi: Wilder's RSI — the second inherently-sequential indicator
  recursion (seed mean then avg=(avg·13+x)/14), run as the same
  partition-level ``mapInPandas`` fold as a29's EWMA with a DuckDB
  RECURSIVE-CTE oracle repeating the identical op order.
- a35_stochastic: %K/%D with a NULL contract for zero-range windows
  (both engines branch on exact 0).
- a36_obv: on-balance volume with the day's trade COUNT as the
  volume unit — integer-exact cumulative sum, no float rounding
  contract needed.

Shape: ONE fact-sized pass each (the daily OHLCV groupBy, map-side
combinable); every window rides the same user_id keying — the wave
inherits wave 30's one-exchange-deep budget (a34's fold adds the
repartition(key) exchange, the price of the recursion, identical to
a29). Outputs are keys × days — dimension-bounded.

[EXT]-classic per SURVEY.md §2.5/§2.6 scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.operators import indicators as ind
from streaming_data_spark.queries import _t
from streaming_data_spark.queries_ext30 import _DAILY_SQL

# close takes the (ts DESC, event_id DESC) head — the same total-order
# tiebreak daily_closes hardened into the close path (two same-ts
# events must resolve identically in both engines; DuckDB's arg_max
# rejects struct keys, hence the row_number form — the a27 pattern).
_OHLCV_DAILY_SQL = """
  SELECT a.user_id, a.day, a.high, a.low, c.close, a.n_trades
  FROM (
    SELECT user_id, date_trunc('day', ts) AS day,
           max(value) AS high, min(value) AS low,
           CAST(count(*) AS BIGINT) AS n_trades
    FROM events GROUP BY user_id, date_trunc('day', ts)
  ) a JOIN (
    SELECT user_id, day, value AS close FROM (
      SELECT user_id, date_trunc('day', ts) AS day, value,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
  ) c USING (user_id, day)
"""


def _daily_ohlcv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", F.struct("ts", "event_id")).alias("close"),
        F.count(F.lit(1)).alias("n_trades"),
    )


def q_a33_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day average true range per user-day (warmed windows only)."""
    return ind.atr(_daily_ohlcv(spark, sf_dir), periods=14)


SQL_A33 = f"""
WITH ohlcv AS ({_OHLCV_DAILY_SQL}),
tr AS (
  SELECT user_id, day,
    CASE WHEN lag(close) OVER w IS NULL THEN high - low
         ELSE greatest(high - low,
                       abs(high - lag(close) OVER w),
                       abs(low - lag(close) OVER w))
    END AS tr
  FROM ohlcv
  WINDOW w AS (PARTITION BY user_id ORDER BY day)
),
rolled AS (
  SELECT user_id, day, tr,
         round(avg(tr) OVER f, 6) AS atr,
         count(tr) OVER f AS w_n
  FROM tr
  WINDOW f AS (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT user_id, day, round(tr, 6) AS tr, atr
FROM rolled WHERE w_n = 14
"""


def q_a34_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilder 14-day RSI per user-day."""
    daily = ind.daily_closes(_t(spark, sf_dir, "events"))
    return ind.rsi(daily, periods=14)


SQL_A34 = f"""
WITH RECURSIVE daily AS ({_DAILY_SQL}),
numbered AS (
  SELECT user_id, day, close,
         close - lag(close) OVER (PARTITION BY user_id ORDER BY day) AS delta,
         row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM daily
),
gl AS (
  SELECT user_id, day, close, rn,
         CASE WHEN delta > 0 THEN delta ELSE 0.0 END AS gain,
         CASE WHEN delta < 0 THEN -delta ELSE 0.0 END AS loss
  FROM numbered
),
r AS (
  -- seed: simple mean of the first 14 deltas, emitted at rn = 15
  SELECT user_id, day, close, rn,
         sum(gain) OVER f / 14.0 AS ag,
         sum(loss) OVER f / 14.0 AS al
  FROM gl
  WINDOW f AS (PARTITION BY user_id ORDER BY rn
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
  QUALIFY rn = 15
  UNION ALL
  -- Wilder recursion: EXACTLY the engine fold's op order
  SELECT g.user_id, g.day, g.close, g.rn,
         (r.ag * 13.0 + g.gain) / 14.0,
         (r.al * 13.0 + g.loss) / 14.0
  FROM gl g JOIN r ON g.user_id = r.user_id AND g.rn = r.rn + 1
)
SELECT user_id, day, close,
       round(CASE WHEN al = 0.0 THEN 100.0
                  ELSE 100.0 - 100.0 / (1.0 + ag / al) END, 6) AS rsi
FROM r
"""


def q_a35_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day stochastic oscillator (%K, 3-day %D) per user-day."""
    return ind.stochastic(_daily_ohlcv(spark, sf_dir), periods=14, smooth=3)


SQL_A35 = f"""
WITH ohlcv AS ({_OHLCV_DAILY_SQL}),
k AS (
  SELECT user_id, day, close,
         count(close) OVER f AS w_n,
         CASE WHEN max(high) OVER f = min(low) OVER f THEN NULL
              ELSE round(100.0 * (close - min(low) OVER f)
                         / (max(high) OVER f - min(low) OVER f), 6)
         END AS pct_k
  FROM ohlcv
  WINDOW f AS (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
),
full_rows AS (
  SELECT user_id, day, close, pct_k,
         row_number() OVER w AS rn_full,
         round(avg(pct_k) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
               6) AS pct_d
  FROM k WHERE w_n = 14
  WINDOW w AS (PARTITION BY user_id ORDER BY day)
)
SELECT user_id, day, close, pct_k, pct_d
FROM full_rows WHERE rn_full >= 3
"""


def q_a36_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-balance volume (trade-count unit) per user-day."""
    return ind.obv(_daily_ohlcv(spark, sf_dir))


SQL_A36 = f"""
WITH ohlcv AS ({_OHLCV_DAILY_SQL}),
signed AS (
  SELECT user_id, day, close,
    CASE WHEN lag(close) OVER w IS NULL THEN 0
         WHEN close > lag(close) OVER w THEN n_trades
         WHEN close < lag(close) OVER w THEN -n_trades
         ELSE 0 END AS s
  FROM ohlcv
  WINDOW w AS (PARTITION BY user_id ORDER BY day)
)
SELECT user_id, day, close,
       CAST(sum(s) OVER (PARTITION BY user_id ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS obv
FROM signed
"""


EXT36_QUERIES = {
    "a33_atr": q_a33_atr,
    "a34_rsi": q_a34_rsi,
    "a35_stochastic": q_a35_stochastic,
    "a36_obv": q_a36_obv,
}

EXT36_ORACLES = {
    "a33_atr": SQL_A33,
    "a34_rsi": SQL_A34,
    "a35_stochastic": SQL_A35,
    "a36_obv": SQL_A36,
}
