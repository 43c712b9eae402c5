"""Real JDBC round-trips against embedded Apache Derby (S6/S7/K3, T1).

The reference's relational engine is Postgres
(upbit_data_pipeline.py:171-176); no Postgres runs in this container,
but Spark ships the Derby jars (for its Hive metastore), and Derby in
embedded mode is a real transactional JDBC database in-process. These
tests run the ACTUAL jdbc read/write code paths — connection, type
mapping, batching, generated SELECT pruning — not option mocks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_data_spark.schemas import load_table
from streaming_data_spark.sinks import writers
from streaming_data_spark.sources import jdbc

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_append_and_read_back(spark, sf_small, derby_url):
    """K3 + S6 — batched append, then full-scan read-back equality
    (values AND schema survive the SQL type round-trip)."""
    src = (
        load_table(spark, sf_small, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
    )
    writers.append_jdbc(src, derby_url, "nation", batchsize=10, properties=DERBY_PROPS)
    back = jdbc.jdbc_table(spark, derby_url, "nation", properties=DERBY_PROPS)
    assert back.count() == src.count() == 25
    got = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in back.collect()}
    want = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in src.collect()}
    assert got == want


def test_jdbc_key_scan_prunes_columns(spark, sf_small, derby_url):
    """S7 — the pruned key scan ships only the key column: the loaded
    DataFrame has exactly one column and matches the source key set."""
    src = load_table(spark, sf_small, "region").select("r_regionkey", "r_name")
    writers.append_jdbc(src, derby_url, "region", properties=DERBY_PROPS)
    keys = jdbc.jdbc_key_scan(
        spark, derby_url, "region", "r_regionkey", properties=DERBY_PROPS
    )
    assert keys.columns == ["r_regionkey"]
    assert {r.r_regionkey for r in keys.collect()} == {0, 1, 2, 3, 4}


def test_jdbc_partitioned_scan(spark, sf_small, derby_url):
    """S6 scale path — range-partitioned parallel scan returns the
    same rows as the single-connection scan, split across N partitions."""
    src = load_table(spark, sf_small, "customer").select("c_custkey", "c_acctbal")
    writers.append_jdbc(src, derby_url, "customer", properties=DERBY_PROPS)
    part = jdbc.jdbc_table(
        spark, derby_url, "customer",
        properties=DERBY_PROPS,
        partition_column="c_custkey", lower_bound=0, upper_bound=200,
        num_partitions=4,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == src.count()
    assert part.agg(F.sum("c_custkey")).collect()[0][0] == \
        src.agg(F.sum("c_custkey")).collect()[0][0]


def test_jdbc_write_if_absent_idempotent(spark, sf_small, derby_url):
    """K1/K2 over JDBC — replaying an overlapping batch adds zero
    duplicates (the ON CONFLICT DO NOTHING contract,
    upbit_data_pipeline.py:109-140)."""
    src = load_table(spark, sf_small, "region").select("r_regionkey", "r_name")
    n1 = writers.write_if_absent_jdbc(
        src, derby_url, "region", keys=["r_regionkey"], properties=DERBY_PROPS
    )
    assert n1 == 5  # first load: table created, everything appended
    # replay the same batch plus one genuinely new row
    extra = spark.createDataFrame([(99, "ATLANTIS")], ["r_regionkey", "r_name"])
    n2 = writers.write_if_absent_jdbc(
        src.union(extra), derby_url, "region",
        keys=["r_regionkey"], properties=DERBY_PROPS,
    )
    assert n2 == 1  # only the new key lands
    back = jdbc.jdbc_table(spark, derby_url, "region", properties=DERBY_PROPS)
    assert back.count() == 6
    assert back.select("r_regionkey").distinct().count() == 6
