"""Reference pipeline replays (SURVEY.md §3) — each top-level entry
point of the reference, recomposed from engine parts. A user of the
reference runs these instead of their Airflow DAGs; the data path is
one Catalyst plan per stage instead of SQL strings + psycopg2 loops.

§3.1  upbit_data_pipeline      → market_price_pipeline()
§3.3  collect_upbit_daily_candles → incremental_candles_job()
      log_to_csv / monitor_errors  → failed_rows_job()
(§3.2's streaming path lives in streaming.pipeline.)
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from streaming_data_spark.operators.joins import dim_join
from streaming_data_spark.schemas import UPBIT_MARKETS
from streaming_data_spark.sinks.writers import gated_write, incremental_load, write_csv, write_if_absent
from streaming_data_spark.sources.rest import FetchFn, rest_paginated, rest_per_key, rest_snapshot
from streaming_data_spark.streaming.listeners import AlertFn, run_job_with_alerts


def market_price_pipeline(
    spark: SparkSession,
    fetch: FetchFn,
    ticker_fetch_factory: Callable[[], FetchFn],
    price_schema: StructType,
    warehouse: str,
    markets_url: str = "https://api.upbit.com/v1/market/all",
    ticker_url_template: str = "https://api.upbit.com/v1/ticker?markets={key}",
    alert: AlertFn = lambda payload: None,
) -> DataFrame:
    """§3.1 — fetch markets → store (idempotent) → per-key price fetch
    → store (idempotent) → join + project → materialize combined table
    → success/failure alert. Mirrors upbit_data_pipeline.py:239-271's
    four tasks; tasks 1-3's relational work is one lazy plan each.
    """

    def _run() -> DataFrame:
        markets = rest_snapshot(spark, fetch, markets_url, UPBIT_MARKETS)
        write_if_absent(markets, f"{warehouse}/upbit_markets", keys=["market"])
        markets_stored = spark.read.parquet(f"{warehouse}/upbit_markets")

        prices = rest_per_key(
            markets_stored, "market", ticker_url_template,
            ticker_fetch_factory, price_schema,
        )
        write_if_absent(prices, f"{warehouse}/upbit_prices", keys=["market"])
        prices_stored = spark.read.parquet(f"{warehouse}/upbit_prices")

        combined = dim_join(
            prices_stored, markets_stored, on="market",
            select=["market", "korean_name", "english_name", "trade_price", "trade_volume"],
        )
        combined.write.mode("overwrite").parquet(f"{warehouse}/upbit_combined_data")
        return spark.read.parquet(f"{warehouse}/upbit_combined_data")

    return run_job_with_alerts(_run, alert, name="market_price_pipeline")


def incremental_candles_job(
    spark: SparkSession,
    markets: Sequence[str],
    candle_fetch: FetchFn,
    candle_schema: StructType,
    warehouse: str,
    url_template: str = "https://api.upbit.com/v1/candles/days?market={market}&to={cursor}&count={count}",
    page_size: int = 200,
    alert: AlertFn = lambda payload: None,
) -> int:
    """§3.3 — per market: watermark lookup → paginated backward fetch →
    union → composite-key idempotent upsert. The watermark probe and
    upsert run through incremental_load (A2 + K2 composed)."""

    def _run() -> int:
        total = 0
        for market in markets:
            page_url = url_template.replace("{market}", market)
            fresh = rest_paginated(
                spark, candle_fetch, page_url, candle_schema,
                cursor_field="candle_date_time_kst", page_size=page_size,
                sleep=lambda s: None,
            )
            total += incremental_load(
                fresh,
                f"{warehouse}/daily_candles",
                keys=["market", "candle_date_time_kst"],
                watermark_col="candle_date_time_kst",
            )
        return total

    return run_job_with_alerts(_run, alert, name="incremental_candles_job")


def failed_rows_job(
    log_df: DataFrame,
    out_csv: str,
    event_col: str = "event",
    failed_value: str = "FAILED",
    alert: AlertFn = lambda payload: None,
) -> bool:
    """log_to_csv.py:21-35 + monitor_errors.py:22-43 — filter failed
    rows, write CSV only when any exist (K10 gate), alert either way."""
    failed = log_df.filter(F.col(event_col) == failed_value)
    wrote = gated_write(failed, write_csv, out_csv)
    alert({"event": "failed_rows_check", "wrote": wrote})
    return wrote
