"""S3 as a native Spark 4 Python Data Source: partition-parallel
paginated REST ingest.

The reference walks pages sequentially on one machine
(api_rapid/upbit_api_candle_info.py:59-89: page size 200, stop when a
page comes back short, retry/backoff on failure). Round 1 mapped that
to a driver-side connector loop (sources/rest.py); this module is the
scale-native form: ``spark.read.format("rest_pages")`` where EVERY
EXECUTOR fetches its own slice of the page space in parallel —
`partitions()` carves the page range into one InputPartition per
``pages_per_partition`` pages, so a 10,000-page backfill fans out
across the whole cluster instead of serializing through the driver.

Also provides the streaming form (``spark.readStream``): offsets are
page numbers, each micro-batch reads the pages that appeared since the
last one — the incremental-offset pattern the reference hand-rolls
with per-key max-date lookups (upbit_daily_candels.py:184-207) falls
out of Structured Streaming's offset tracking for free.

Retry semantics follow the reference's F17 backoff formula
min(base·2^n, cap) (upbit_data_pipeline.py:54-55).

Options (all strings, per the DataSource API):
  url                  template containing ``{page}``
  pages                total page count (batch mode)
  start_page           first page (default 0)
  pages_per_partition  batch-mode fan-out granularity (default 8)
  max_pages_per_batch  streaming-mode micro-batch cap (default 16)
  max_retries          per-page retry budget (default 3)
  backoff_base         seconds, first retry sleep (default 0.05)
  backoff_cap          seconds, max sleep (default 3600)

Schema comes from the caller via ``.schema(ddl)``; rows are JSON
objects and fields are extracted by name in schema order. Executors
must be able to import this package (ship the wheel via --py-files on
a real cluster), same as any Python data source.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


def _fetch_page(url_tpl: str, page: int, max_retries: int, base: float, cap: float) -> list[dict]:
    """GET one page with exponential backoff; [] means 'page absent'
    (HTTP 404 or an empty JSON array) — the pagination stop signal.

    Retry policy: backoff is reserved for transient failures (5xx,
    408/429, network errors, and 200s with a non-list body such as an
    ``{"error": ...}`` maintenance payload). Permanent client errors
    (400/401/403/...) raise immediately — a bad URL or credential must
    fail the task fast, not stall an executor through the full backoff
    budget."""
    attempt = 0
    while True:
        try:
            with urllib.request.urlopen(url_tpl.format(page=page), timeout=30) as resp:
                payload = json.loads(resp.read().decode("utf-8"))
            if isinstance(payload, list):
                return payload
            # 200 with a non-list body is NOT "page absent": treating it
            # as [] would silently drop the page (batch) or cap the
            # micro-batch (streaming). Treat as transient and retry.
            if attempt >= max_retries:
                raise ValueError(
                    f"rest_pages: page {page} returned a non-list JSON body "
                    f"({type(payload).__name__}); refusing to treat it as end-of-data"
                )
        except urllib.error.HTTPError as exc:
            if exc.code == 404:
                return []
            if 400 <= exc.code < 500 and exc.code not in (408, 429):
                raise  # permanent client error: no retry budget
            if attempt >= max_retries:
                raise
        except (urllib.error.URLError, TimeoutError):
            if attempt >= max_retries:
                raise
        time.sleep(min(base * (2 ** attempt), cap))  # F17 backoff
        attempt += 1


class _PageRange(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        super().__init__((start, end))
        self.start = start
        self.end = end


class _RestPagesReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType) -> None:
        self.url = options["url"]
        self.start_page = int(options.get("start_page", 0))
        self.pages = int(options["pages"])
        self.per_part = max(1, int(options.get("pages_per_partition", 8)))
        self.max_retries = int(options.get("max_retries", 3))
        self.base = float(options.get("backoff_base", 0.05))
        self.cap = float(options.get("backoff_cap", 3600))
        self.fields = schema.fieldNames()
        # optional pushdown contract: options declare that column
        # `monotonic_field` equals the global row number, i.e.
        # page * rows_per_page + offset-within-page — then range
        # predicates on it prune whole pages before any HTTP request.
        self.mono_field = options.get("monotonic_field")
        self.rows_per_page = int(options.get("rows_per_page", 0))
        self._lo_id: int | None = None
        self._hi_id: int | None = None

    def pushFilters(self, filters: list[Filter]) -> list[Filter]:
        """Harvest range bounds on the monotonic field for page-range
        PRUNING. Every filter is returned, so Spark re-applies all of
        them post-scan — pruning is an optimization, never a
        correctness claim (same posture as parquet row-group stats)."""
        if self.mono_field and self.rows_per_page > 0:
            col = (self.mono_field,)
            for f in filters:
                if getattr(f, "attribute", None) != col or not isinstance(
                    getattr(f, "value", None), int
                ):
                    continue
                if isinstance(f, (GreaterThanOrEqual, EqualTo)):
                    lo = f.value
                elif isinstance(f, GreaterThan):
                    lo = f.value + 1
                else:
                    lo = None
                if isinstance(f, (LessThanOrEqual, EqualTo)):
                    hi = f.value
                elif isinstance(f, LessThan):
                    hi = f.value - 1
                else:
                    hi = None
                if lo is not None:
                    self._lo_id = lo if self._lo_id is None else max(self._lo_id, lo)
                if hi is not None:
                    self._hi_id = hi if self._hi_id is None else min(self._hi_id, hi)
        return filters

    def partitions(self) -> list[InputPartition]:
        first = self.start_page
        end = self.start_page + self.pages
        if self.mono_field and self.rows_per_page > 0:
            # monotonic_field = page * rows_per_page + offset, with
            # ABSOLUTE page numbers (the documented contract) — so the
            # id bounds map straight to page numbers, clamped to the
            # configured [start_page, start_page+pages) window.
            if self._lo_id is not None:
                first = max(first, self._lo_id // self.rows_per_page)
            if self._hi_id is not None:
                end = min(end, self._hi_id // self.rows_per_page + 1)
        if end <= first:  # contradiction (e.g. id < 0): one empty range
            return [_PageRange(first, first)]
        return [
            _PageRange(p, min(p + self.per_part, end))
            for p in range(first, end, self.per_part)
        ]

    def read(self, partition: _PageRange) -> Iterator[tuple]:
        for page in range(partition.start, partition.end):
            for rec in _fetch_page(self.url, page, self.max_retries, self.base, self.cap):
                yield tuple(rec.get(f) for f in self.fields)


class _RestPagesStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict, schema: StructType) -> None:
        self.url = options["url"]
        self.start_page = int(options.get("start_page", 0))
        self.max_batch = max(1, int(options.get("max_pages_per_batch", 16)))
        self.max_retries = int(options.get("max_retries", 3))
        self.base = float(options.get("backoff_base", 0.05))
        self.cap = float(options.get("backoff_cap", 3600))
        self.fields = schema.fieldNames()

    def initialOffset(self) -> dict:
        return {"page": self.start_page}

    def _rows_of(self, page: int) -> list[tuple]:
        return [
            tuple(rec.get(f) for f in self.fields)
            for rec in _fetch_page(self.url, page, self.max_retries, self.base, self.cap)
        ]

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        """Advance past every page that exists right now (bounded by
        max_pages_per_batch); an absent/empty page is the high-water
        mark, exactly like the reference's stop-on-short-page rule."""
        page = int(start["page"])
        out: list[tuple] = []
        while page - int(start["page"]) < self.max_batch:
            rows = self._rows_of(page)
            if not rows:
                break
            out.extend(rows)
            page += 1
        return iter(out), {"page": page}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for page in range(int(start["page"]), int(end["page"])):
            yield from self._rows_of(page)


class RestPagesDataSource(DataSource):
    """``spark.read.format("rest_pages")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "rest_pages"

    def schema(self) -> str:
        raise NotImplementedError(
            "rest_pages has no fixed schema; pass one with .schema(ddl)"
        )

    def reader(self, schema: StructType) -> _RestPagesReader:
        return _RestPagesReader(self.options, schema)

    def simpleStreamReader(self, schema: StructType) -> _RestPagesStreamReader:
        return _RestPagesStreamReader(self.options, schema)


def register(spark) -> None:
    """Register the source AND enable Python-source filter pushdown.

    Spark 4 refuses to plan a Python DataSourceReader that defines
    ``pushFilters`` unless ``spark.sql.python.filterPushdown.enabled``
    is true — it raises [DATA_SOURCE_PUSHDOWN_DISABLED] at read time.
    It is a runtime SQL conf, so setting it here covers any session
    that registers the source; ``get_session()`` also sets it at build
    time. Assert afterwards so a session that silently rejects the
    conf fails loudly here instead of cryptically at plan time.
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    assert spark.conf.get("spark.sql.python.filterPushdown.enabled") == "true"
    spark.dataSource.register(RestPagesDataSource)
