"""Scalar function library (SURVEY.md §2.8, F1–F18).

Thin, documented aliases over ``pyspark.sql.functions`` so every
scalar behavior the reference exhibits has one named, tested home.
All JVM-side built-ins — nothing here leaves whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "yyyymmdd",
    "parse_iso_timestamp",
    "format_timestamp",
    "date_partition_token",
    "epoch_millis",
    "from_epoch_millis",
    "minus_days",
    "extract_url_path_id",
    "extract_query_param",
    "json_get",
    "to_json_row",
    "empty_to_null",
    "backoff_seconds",
    "gen_uuid",
]


def yyyymmdd(col: Column | str) -> Column:
    """F1 — date→'YYYYMMDD' string. Ref: generate_fake_data.py:22,
    monitor_errors.py:38 (S3 key stamp)."""
    return F.date_format(col, "yyyyMMdd")


def parse_iso_timestamp(col: Column | str) -> Column:
    """F2 — ISO-8601 string→timestamp ('%Y-%m-%dT%H:%M:%S').
    Ref: upbit_daily_candels.py:171,211."""
    return F.to_timestamp(col, "yyyy-MM-dd'T'HH:mm:ss")


def format_timestamp(col: Column | str) -> Column:
    """F3 — timestamp→'YYYY-MM-DD HH:MM:SS' string.
    Ref: generate_fake_data.py:23, upbit_data_pipeline.py:190."""
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def date_partition_token(col: Column | str) -> Column:
    """F7 — the Logstash '%{+YYYY.MM.dd}' index-name token, as a
    partition column. Ref: container-logs.conf:23."""
    return F.date_format(col, "yyyy.MM.dd")


def epoch_millis(col: Column | str) -> Column:
    """F6 — timestamp→epoch millis (upbit_prices.timestamp BIGINT).
    Ref: upbit_data_pipeline.py:90."""
    return F.unix_millis(F.col(col) if isinstance(col, str) else col)


def from_epoch_millis(col: Column | str) -> Column:
    """F6 inverse — epoch millis→timestamp."""
    return F.timestamp_millis(F.col(col) if isinstance(col, str) else col)


def minus_days(col: Column | str, days: int = 1) -> Column:
    """F5 — date arithmetic (the pagination cursor walks back 1 day).
    Ref: upbit_daily_candels.py:171-172."""
    c = F.col(col) if isinstance(col, str) else col
    return c - F.expr(f"INTERVAL {days} DAYS")


def extract_url_path_id(col: Column | str, segment: str = "/vp/products/") -> Column:
    """F8 — URL path-id extraction (href.split('/vp/products/')[1]...).
    Ref: get_coopang_best_item_id.py:21-23. Regex, not a Python split."""
    return F.regexp_extract(col, f"{segment}(\\d+)", 1)


def extract_query_param(col: Column | str, param: str) -> Column:
    """F8 — URL query-param extraction (split('itemId=')[1].split('&')[0]).
    Ref: get_coopang_best_item_id.py:22."""
    return F.regexp_extract(col, f"[?&]{param}=([^&]*)", 1)


def json_get(col: Column | str, path: str) -> Column:
    """F14 — ad-hoc JSON field access. Ref: container-logs.conf:11-13."""
    return F.get_json_object(col, f"$.{path}")


def to_json_row(*cols: str) -> Column:
    """F13 — serialize a row to a JSON string (the Kafka producer value
    and the XCom round-trip). Ref: send_to_kafka.py:15, etl_pipeline.py:50."""
    return F.to_json(F.struct(*cols))


def empty_to_null(col: Column | str) -> Column:
    """F16 — empty-string→missing. Ref: instagram-profiles.conf:50-58."""
    return F.nullif(F.col(col) if isinstance(col, str) else col, F.lit(""))


def gen_uuid() -> Column:
    """F12 — random UUID v4 id generation (generate_fake_data.py:20,
    send_to_kafka.py:12 message keys). Executor-side, JVM built-in;
    non-deterministic by nature so it's property-tested (format,
    uniqueness) rather than oracle-gated."""
    return F.expr("uuid()")


def backoff_seconds(retry: Column | str) -> Column:
    """F17 — exponential backoff min(60·2^n, 3600).
    Ref: upbit_data_pipeline.py:54-55. Connector util, kept expressible
    in SQL for parity tests."""
    return F.least(F.lit(3600.0), F.lit(60.0) * F.pow(F.lit(2.0), retry))
