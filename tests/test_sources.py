"""Source/connector tests: hermetic fake fetchers exercise the retry,
per-key distribution, and pagination protocols; synthetic generation
is deterministic; CSV validation rejects bad files."""

from __future__ import annotations

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from streaming_data_spark.sources import files, rest, synthetic

MARKET_SCHEMA = StructType([
    StructField("market", StringType(), False),
    StructField("korean_name", StringType(), True),
])


def test_backoff_curve():
    """min(60·2^n, 3600) — upbit_data_pipeline.py:54-55."""
    assert [rest.backoff_seconds(n) for n in range(8)] == [
        60.0, 120.0, 240.0, 480.0, 960.0, 1920.0, 3600.0, 3600.0
    ]


def test_fetch_with_retry_recovers():
    calls = {"n": 0}
    slept: list[float] = []

    def flaky(url):
        calls["n"] += 1
        if calls["n"] < 3:
            raise rest.RetryableError("429")
        return [{"ok": url}]

    out = rest.fetch_with_retry(flaky, "u", sleep=slept.append)
    assert out == [{"ok": "u"}]
    assert slept == [60.0, 120.0]


def test_fetch_with_retry_exhausts():
    def always_429(url):
        raise rest.RetryableError("429")

    with pytest.raises(rest.RetryableError):
        rest.fetch_with_retry(always_429, "u", max_retries=2, sleep=lambda s: None)


def test_rest_snapshot(spark):
    fetch = lambda url: [{"market": "KRW-BTC", "korean_name": "비트코인"},
                         {"market": "KRW-ETH", "korean_name": "이더리움"}]
    df = rest.rest_snapshot(spark, fetch, "http://x/v1/market/all", MARKET_SCHEMA)
    assert df.count() == 2
    assert df.schema == MARKET_SCHEMA


def test_rest_per_key_distributed(spark):
    """S2 — the per-key ticker fetch runs inside mapInPandas, one call
    per key, keys fanned across partitions."""
    keys = spark.createDataFrame([("KRW-BTC",), ("KRW-ETH",), ("KRW-XRP",)], ["market"])
    price_schema = StructType([
        StructField("market", StringType(), False),
        StructField("price", StringType(), True),
    ])

    def factory():
        return lambda url: [{"market": url.rsplit("=", 1)[1], "price": "100"}]

    out = rest.rest_per_key(
        keys, "market", "http://x/ticker?markets={key}", factory, price_schema,
        sleep=lambda s: None,
    )
    rows = {r.market for r in out.collect()}
    assert rows == {"KRW-BTC", "KRW-ETH", "KRW-XRP"}


def test_rest_paginated_protocol(spark):
    """S3 — pages of 2, cursor = last ts, stop on short page."""
    data = [{"ts": f"t{i}", "v": str(i)} for i in range(5)]
    calls: list[str] = []

    def fetch(url):
        calls.append(url)
        cursor = url.split("cursor=")[1].split("&")[0]
        start = 0 if cursor == "" else int(cursor[1:]) + 1
        return data[start:start + 2]

    schema = StructType([StructField("ts", StringType()), StructField("v", StringType())])
    out = rest.rest_paginated(
        spark, fetch, "http://x?cursor={cursor}&count={count}", schema,
        cursor_field="ts", page_size=2, sleep=lambda s: None,
    )
    assert out.count() == 5
    assert len(calls) == 3  # 2+2+1: short page stops the walk


def test_csv_validation(spark, tmp_path):
    path = str(tmp_path / "m.csv")
    with open(path, "w") as fh:
        fh.write("market,korean_name\nKRW-BTC,비트코인\n")
    df = files.read_csv(spark, path, required_columns=["market"])
    assert df.count() == 1
    with pytest.raises(files.SchemaValidationError):
        files.read_csv(spark, path, required_columns=["market", "nope"])


def test_fake_users_deterministic(spark):
    a = synthetic.fake_users(spark, 50).collect()
    b = synthetic.fake_users(spark, 50).collect()
    assert a == b
    assert len({r.uuid for r in a}) == 50
    row = a[0]
    assert len(row.birthdate) == 8 and row.birthdate.isdigit()
    assert row.phone_number.startswith("010-")
    assert "@example.com" in row.email


def test_jdbc_reader_plumbing(spark):
    """No database in this container: prove the reader is wired into
    Spark's JDBC layer (connection attempt, not option typos) and that
    partitioned scans validate their bounds."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from streaming_data_spark.sources import jdbc

    reader = jdbc.jdbc_reader(
        spark, "jdbc:postgresql://localhost:1/nope", "log",
        partition_column="id", lower_bound=0, upper_bound=100, num_partitions=4,
    )
    with pytest.raises(Exception) as err:
        reader.load()
    assert "driver" in str(err.value).lower() or "connection" in str(err.value).lower()

    with pytest.raises(ValueError, match="partition_column requires"):
        jdbc.jdbc_reader(spark, "jdbc:x", "t", partition_column="id")


def test_orc_round_trip_with_pushdown(spark, sf_small, tmp_path):
    """S8+ — ORC: write/read equality plus pushdown reaching the ORC
    scan (the format claim is only real if the scan prunes)."""
    from streaming_data_spark import plans
    from streaming_data_spark.schemas import load_table
    from streaming_data_spark.sources.files import read_orc, write_orc

    events = load_table(spark, sf_small, "events").select(
        "event_id", "event_type", "value"
    )
    path = str(tmp_path / "events_orc")
    write_orc(events, path)
    back = read_orc(spark, path, required_columns=["event_id", "event_type"])
    assert back.count() == events.count()
    assert back.exceptAll(events).isEmpty()
    filtered = back.filter(back.event_type == "click")
    pushed = plans.pushed_filters(filtered)
    assert any("event_type" in p for p in pushed), pushed


def test_orc_missing_required_column_raises(spark, sf_small, tmp_path):
    from streaming_data_spark.schemas import load_table
    from streaming_data_spark.sources.files import (
        SchemaValidationError,
        read_orc,
        write_orc,
    )

    docs = load_table(spark, sf_small, "documents").select("doc_id", "lang")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    import pytest

    with pytest.raises(SchemaValidationError, match="text"):
        read_orc(spark, path, required_columns=["doc_id", "text"])


def test_parquet_schema_evolution_mergeschema(spark, sf_small, tmp_path):
    """Operational reality at 100 TB: a column is ADDED mid-corpus and
    old files lack it. mergeSchema must unify the footprints — old
    rows read the new column as NULL, new rows carry it — and
    filters on the evolved column must still push down."""
    from pyspark.sql import functions as F

    from streaming_data_spark.schemas import load_table

    base = load_table(spark, sf_small, "documents").select("doc_id", "lang")
    old_batch = base.filter(F.col("doc_id") < 250)
    new_batch = base.filter(F.col("doc_id") >= 250).withColumn(
        "quality_tier", F.when(F.col("doc_id") % 2 == 0, "hi").otherwise("lo")
    )
    path = tmp_path / "evolving"
    old_batch.write.parquet(str(path / "d=a"))
    new_batch.write.parquet(str(path / "d=b"))

    merged = spark.read.option("mergeSchema", "true").parquet(
        str(path / "d=a"), str(path / "d=b")
    )
    assert "quality_tier" in merged.columns
    assert merged.count() == base.count()
    # old-era rows surface the evolved column as NULL
    assert (
        merged.filter(F.col("doc_id") < 250)
        .filter(F.col("quality_tier").isNotNull())
        .isEmpty()
    )
    n_hi = merged.filter(F.col("quality_tier") == "hi").count()
    assert n_hi == new_batch.filter(F.col("quality_tier") == "hi").count()
