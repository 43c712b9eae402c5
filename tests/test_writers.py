"""Writer properties (SURVEY.md §5.2): idempotency of the keyed
writer, incremental load, conditional gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_data_spark.schemas import load_table
from streaming_data_spark.sinks import gated_write, incremental_load, write_csv, write_if_absent


@pytest.fixture()
def target(tmp_path):
    return str(tmp_path / "target")


def test_write_if_absent_idempotent(spark, sf_small, target):
    """The ON CONFLICT DO NOTHING property: re-running on overlapping
    input adds zero duplicates (insert_csv_to_postgres.py:104)."""
    events = load_table(spark, sf_small, "events").limit(200)
    n1 = write_if_absent(events, target, keys=["event_id"])
    assert n1 == 200
    n2 = write_if_absent(events, target, keys=["event_id"])
    assert n2 == 0
    stored = spark.read.parquet(target)
    assert stored.count() == 200
    assert stored.select("event_id").distinct().count() == 200


def test_write_if_absent_partial_overlap(spark, sf_small, target):
    events = load_table(spark, sf_small, "events")
    first = events.filter(F.col("event_id") < 100)
    overlap = events.filter((F.col("event_id") >= 50) & (F.col("event_id") < 150))
    write_if_absent(first, target, keys=["event_id"])
    n = write_if_absent(overlap, target, keys=["event_id"])
    assert n == 50  # only the 100-149 half is new
    assert spark.read.parquet(target).count() == 150


def test_write_if_absent_dedups_batch(spark, sf_small, target):
    events = load_table(spark, sf_small, "events").limit(50)
    doubled = events.unionByName(events)
    n = write_if_absent(doubled, target, keys=["event_id"])
    assert n == 50


def test_incremental_load_watermark(spark, sf_small, target):
    """The upbit_daily_candels incremental pattern: only rows past the
    target's max watermark are fetched and appended."""
    events = load_table(spark, sf_small, "events")
    old = events.filter(F.col("event_id") < 300)
    incremental_load(old, target, keys=["event_id"], watermark_col="ts")
    n = incremental_load(events, target, keys=["event_id"], watermark_col="ts")
    stored = spark.read.parquet(target)
    assert stored.count() == old.count() + n
    # re-run: nothing new
    assert incremental_load(events, target, keys=["event_id"], watermark_col="ts") == 0


def test_gated_write(spark, sf_small, tmp_path):
    events = load_table(spark, sf_small, "events")
    empty = events.filter(F.col("event_type") == "nope")
    assert gated_write(empty, write_csv, str(tmp_path / "a")) is False
    assert gated_write(events.limit(5), write_csv, str(tmp_path / "b")) is True
    assert spark.read.option("header", "true").csv(str(tmp_path / "b")).count() == 5


def test_write_text_log_date_partitioned(spark, sf_small, tmp_path):
    """K8 — failed-rows-to-text with the reference's date-stamped key
    layout (monitor_errors.py:38): one dt= partition per day, JSON-line
    payloads round-trip."""
    from streaming_data_spark.sinks.writers import write_text_log

    events = load_table(spark, sf_small, "events").limit(50)
    out = str(tmp_path / "logs")
    write_text_log(events, out, stamp_col="ts")
    back = spark.read.text(out)
    assert back.count() == 50
    days = {r.dt for r in spark.read.format("text").option("pathGlobFilter", "*").load(out)
            .select(F.regexp_extract(F.input_file_name(), r"dt=(\d{8})", 1).alias("dt"))
            .collect()}
    assert all(len(d) == 8 for d in days) and days
    parsed = spark.read.json(out)
    assert "event_id" in parsed.columns


def test_single_writer_lock_blocks_concurrent_append(spark, sf_small, tmp_path):
    """The advisory lock makes the documented single-writer assumption
    enforced: a second writer starting while the lock is held fails
    FAST (instead of racing the anti-join into double inserts), and
    the lock is released after a successful write."""
    import os

    import pytest

    from streaming_data_spark.schemas import load_table
    from streaming_data_spark.sinks.writers import (
        ConcurrentWriterError,
        write_if_absent,
    )

    rows = load_table(spark, sf_small, "documents").select("doc_id", "lang").limit(20)
    target = str(tmp_path / "locked_table")

    n = write_if_absent(rows, target, keys=["doc_id"], enforce_single_writer=True)
    assert n == 20
    assert not os.path.exists(os.path.join(target, "_sds_writer.lock"))

    # simulate a concurrent holder
    lock = os.path.join(target, "_sds_writer.lock")
    with open(lock, "w") as fh:
        fh.write("{}")
    with pytest.raises(ConcurrentWriterError, match="another writer"):
        write_if_absent(rows, target, keys=["doc_id"], enforce_single_writer=True)
    os.remove(lock)

    # replay after release: idempotent, appends nothing
    n2 = write_if_absent(rows, target, keys=["doc_id"], enforce_single_writer=True)
    assert n2 == 0
