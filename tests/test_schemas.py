"""Testdata dtype-drift guard.

Round 3 proved a driver testdata regeneration can silently flip
events.ts between parquet TIMESTAMP(NANOS) (→ long under the legacy
conf), timezone-less TIMESTAMP(MICROS) (→ TIMESTAMP_NTZ), and proper
TIMESTAMP — and each flip broke every downstream events query
(unix_micros, window range frames, sessionization) plus the whole
bench run. These tests pin load_table's OUTPUT contract to the
declared EVENTS schema so the next regeneration fails here, loudly,
instead of as five cascading query errors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from streaming_data_spark import schemas


@pytest.mark.parametrize("fixture_name", ["sf_small", "sf_oracle"])
def test_events_ts_is_timestamp(spark, fixture_name, request):
    sf_dir = request.getfixturevalue(fixture_name)
    df = schemas.load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType == TimestampType(), (
        "events.ts must normalize to TIMESTAMP regardless of the parquet "
        f"era the driver shipped; got {df.schema['ts'].dataType}"
    )


def test_events_full_schema_matches_declared(spark, sf_small):
    df = schemas.load_table(spark, sf_small, "events")
    declared = {f.name: f.dataType for f in schemas.EVENTS.fields}
    actual = {f.name: f.dataType for f in df.schema.fields}
    assert actual == declared


def test_events_ts_usable_by_micros_functions(spark, sf_small):
    # The exact expression class that broke in r3: unix_micros requires
    # TIMESTAMP (not TIMESTAMP_NTZ). One row is enough — this is an
    # analysis-time check, not a data check.
    df = schemas.load_table(spark, sf_small, "events")
    row = df.select(
        F.unix_micros("ts").alias("us"), F.unix_millis("ts").alias("ms")
    ).first()
    assert row.us is not None and row.ms == row.us // 1000


def test_documents_and_embeddings_schemas_match_declared(spark, sf_small):
    """Extend the drift guard to the other [EXT]-critical tables: a
    regeneration that flips embeddings to array<double> (or renames a
    documents column) should fail HERE, not inside ANN/quantization
    math or the text toolchain."""
    docs = schemas.load_table(spark, sf_small, "documents")
    assert {f.name: f.dataType for f in docs.schema.fields} == {
        f.name: f.dataType for f in schemas.DOCUMENTS.fields
    }
    emb = schemas.load_table(spark, sf_small, "embeddings")
    assert {f.name: f.dataType for f in emb.schema.fields} == {
        f.name: f.dataType for f in schemas.EMBEDDINGS.fields
    }


def test_relational_tables_have_expected_key_columns(spark, sf_small):
    """Cheap presence guard for the TPC-H-ish tables: the join keys
    every registry query depends on must exist with integral types —
    a regeneration that re-types a key breaks half the registry."""
    from pyspark.sql.types import IntegerType, LongType

    keys = {
        "region": ["r_regionkey"],
        "nation": ["n_nationkey", "n_regionkey"],
        "customer": ["c_custkey", "c_nationkey"],
        "supplier": ["s_suppkey", "s_nationkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    }
    for table, cols in keys.items():
        df = schemas.load_table(spark, sf_small, table)
        fields = {f.name: f.dataType for f in df.schema.fields}
        for c in cols:
            assert c in fields, (table, c, sorted(fields))
            assert isinstance(fields[c], (LongType, IntegerType)), (table, c, fields[c])
