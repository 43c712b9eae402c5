"""SQL entry point — run the reference's dialect directly on Spark.

The reference's relational engine is PostgreSQL: every analytical
operation a user of it runs today is a SQL string shipped over
psycopg2/SQLAlchemy (the CTAS join at upbit_data_pipeline.py:171-176,
the filtered read at log_to_csv.py:25, the per-key max at
upbit_daily_candels.py:152-156, the insert-if-absent staging pattern
at upbit_daily_candels.py:241). Those users switch engines by keeping
their SQL: ``register_catalog`` exposes the testdata tables as temp
views and ``run_sql`` executes any ANSI query against them through
Catalyst — same optimizer, same pushdown, same plans as the DataFrame
API (Spark compiles both to one logical plan language).

Temp views are session-scoped metadata over the parquet scans — no
data copy, no extra jobs; predicate pushdown and column pruning reach
the files exactly as with ``load_table``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streaming_data_spark.schemas import TESTDATA_TABLES, load_table


def register_catalog(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a session temp view (idempotent).

    Views go through ``load_table`` so the events.ts dtype
    normalization (nanos/NTZ era handling) applies to SQL users too.
    """
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the catalog and run one SQL query against it."""
    register_catalog(spark, sf_dir)
    return spark.sql(query)
