"""Scalar-function tests not covered by the oracle registry (§2.8)."""

from __future__ import annotations

import re

from streaming_data_spark import functions as sf

UUID_V4 = re.compile(
    r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
)


def test_gen_uuid_format_and_uniqueness(spark):
    """F12 — random id generation (generate_fake_data.py:20,
    send_to_kafka.py:12). Non-deterministic, so property-tested:
    RFC-4122 v4 format, all distinct, stable across the row set."""
    rows = spark.range(1000).select(sf.gen_uuid().alias("id")).collect()
    ids = [r.id for r in rows]
    assert len(set(ids)) == 1000
    assert all(UUID_V4.match(u) for u in ids)
