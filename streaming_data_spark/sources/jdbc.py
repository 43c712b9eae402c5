"""JDBC sources (SURVEY.md §2.1 S6/S7).

The reference reads Postgres with ``SELECT *`` over psycopg2
(stored_postgres_data_send_s3.py:11, monitor_errors.py:26,
log_to_csv.py:25) and a column-pruned key scan
(upbit_data_pipeline.py:64-65). Spark's JDBC source subsumes both —
Catalyst pushes predicates (``pushDownPredicate``, default on) and
prunes columns into the generated SQL, so ``jdbc_table(...).select(
"market")`` ships ``SELECT market FROM ...`` exactly like the
reference's hand-written scan.

Tests exercise the full load/append path against an embedded Apache
Derby database (the Derby jars ship with Spark for its Hive metastore)
— a real JDBC round-trip, not a mock — plus option plumbing for the
Postgres-shaped URLs the reference uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 1000,
) -> DataFrameReader:
    """Configured (not yet loaded) JDBC reader.

    ``partition_column``/bounds/``num_partitions`` turn the scan into N
    parallel range-partitioned queries — the scale path for large
    tables; without them the scan is a single connection (fine for the
    reference's dimension-sized tables). ``fetch_size`` mirrors the
    reference's 1000-row batching (etl_pipeline.py:69).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError("partition_column requires lower/upper bounds and num_partitions")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for key, value in (properties or {}).items():
        reader = reader.option(key, value)
    return reader


def jdbc_table(spark: SparkSession, url: str, table: str, **kwargs) -> DataFrame:
    """S6 — full table scan (``SELECT *`` equivalent; prune with
    .select / .filter and Catalyst pushes both into the SQL)."""
    return jdbc_reader(spark, url, table, **kwargs).load()


def jdbc_key_scan(
    spark: SparkSession, url: str, table: str, key_col: str, **kwargs
) -> DataFrame:
    """S7 — column-pruned key scan (upbit_data_pipeline.py:64-65)."""
    return jdbc_table(spark, url, table, **kwargs).select(key_col)
