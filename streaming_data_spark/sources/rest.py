"""REST ingestion connectors (SURVEY.md §2.1 S1–S3).

The reference ingests from the Upbit REST API three ways:
- S1 single GET → list of dicts (upbit_data_pipeline.py:15-19)
- S2 per-key loop with HTTP-429 retry + exponential backoff
  min(60·2^n, 3600), max 5 retries (upbit_data_pipeline.py:54-55,97-151)
- S3 async cursor pagination: page size 200, cursor = last timestamp,
  stop on short page; ≤10 concurrent, 5 req/s
  (api_rapid/upbit_api_candle_info.py:12-13,59-89)

Engine design: connectors are plain Python producing DataFrames — NOT
a custom DataSourceV2 (SURVEY §4.2-6: ingestion volume never
justifies planner surgery). The fetch callable is injected so tests
run hermetically and prod swaps in requests/aiohttp. Per-key fetches
(S2) distribute via mapInPandas over key partitions — the driver
never serializes the fetch loop.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FetchFn = Callable[[str], object]  # url -> parsed JSON (list/dict) or raises


class RetryableError(Exception):
    """HTTP 429-equivalent: retry with backoff (upbit_data_pipeline.py:141-144)."""


def backoff_seconds(retry: int) -> float:
    """min(60·2^n, 3600) — upbit_data_pipeline.py:54-55."""
    return min(60.0 * (2.0 ** retry), 3600.0)


def fetch_with_retry(
    fetch: FetchFn,
    url: str,
    max_retries: int = 5,
    sleep: Callable[[float], None] = time.sleep,
) -> object:
    """S2's retry loop: bounded retries on RetryableError with the
    reference's backoff curve."""
    for retry in range(max_retries + 1):
        try:
            return fetch(url)
        except RetryableError:
            if retry == max_retries:
                raise
            sleep(backoff_seconds(retry))
    raise AssertionError("unreachable")


def rest_snapshot(
    spark: SparkSession,
    fetch: FetchFn,
    url: str,
    schema: StructType,
) -> DataFrame:
    """S1 — single-endpoint snapshot (GET /v1/market/all →
    DataFrame). Driver-side fetch is correct here: the payload is a
    dimension (hundreds of rows), not data-plane volume."""
    rows = fetch_with_retry(fetch, url)
    return spark.createDataFrame(rows, schema=schema)  # type: ignore[arg-type]


def rest_per_key(
    keys_df: DataFrame,
    key_col: str,
    url_template: str,
    fetch_factory: Callable[[], FetchFn],
    schema: StructType,
    max_retries: int = 5,
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """S2 — per-key dependent fetch (the nested-loop 'join' against a
    remote keyed service, upbit_data_pipeline.py:97-108), distributed:
    each partition of keys fetches its own slice inside mapInPandas —
    N executors × their key subsets, with per-worker rate limiting.

    ``fetch_factory`` builds the fetcher ON THE EXECUTOR (connections
    aren't picklable; a factory closure is).
    """
    import pandas as pd  # local import: executors re-import cheaply

    field_names = [f.name for f in schema.fields]

    def _fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = fetch_factory()
        for batch in batches:
            out = []
            for key in batch[key_col]:
                payload = fetch_with_retry(
                    fetch, url_template.format(key=key),
                    max_retries=max_retries, sleep=sleep,
                )
                rows = payload if isinstance(payload, list) else [payload]
                out.extend(rows)
            if out:
                yield pd.DataFrame(out, columns=field_names)

    return keys_df.select(key_col).mapInPandas(_fetch_partition, schema=schema)


def rest_paginated(
    spark: SparkSession,
    fetch: FetchFn,
    url_template: str,
    schema: StructType,
    cursor_field: str,
    page_size: int = 200,
    start_cursor: str = "",
    max_pages: int = 10_000,
    rate_limit_per_s: float = 5.0,
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """S3 — cursor pagination: request pages of ``page_size``, cursor =
    last row's ``cursor_field``, stop on a short page (the
    upbit_api_candle_info.py:59-89 protocol, rate-capped at 5 req/s).

    Pages accumulate as a union of per-page DataFrames (§2.7 —
    the reference's all_candles.extend). Bounded batch ingestion;
    the streaming analog is maxOffsetsPerTrigger.
    """
    pages: list[DataFrame] = []
    cursor = start_cursor
    for _ in range(max_pages):
        payload = fetch_with_retry(
            fetch, url_template.format(cursor=cursor, count=page_size), sleep=sleep
        )
        rows = list(payload)  # type: ignore[arg-type]
        if rows:
            pages.append(spark.createDataFrame(rows, schema=schema))
            cursor = rows[-1][cursor_field] if isinstance(rows[-1], dict) else getattr(rows[-1], cursor_field)
        if len(rows) < page_size:
            break
        sleep(1.0 / rate_limit_per_s)
    if not pages:
        return spark.createDataFrame([], schema=schema)
    out = pages[0]
    for page in pages[1:]:
        out = out.unionByName(page)
    return out
