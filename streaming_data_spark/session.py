"""SparkSession factory.

One place to configure the engine so every entry point (tests, bench,
driver contract, jobs) gets identical semantics:

- AQE on (runtime re-planning, skew-join handling) — the 100 TB story:
  partition counts chosen at runtime from real sizes, not guesses.
- Arrow on for the few Pandas-UDF operators (vectorized transfer).
- Session timezone pinned to UTC so timestamp semantics are stable and
  oracle-comparable (DuckDB timestamps are UTC-naive).
- ``spark.sql.shuffle.partitions`` sized from the local core count;
  on a real cluster AQE coalesces from the 2048 default we set there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_cores() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_session(
    app_name: str = "streaming-data-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local mode defaults to ``local[$SPARK_GRAFT_CPUS]`` with shuffle
    partitions = cores (the guide's rule: ~cores for local; a real
    cluster relies on AQE coalescing instead).
    """
    cores = _local_cores()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cores}]")
        # -- correctness-critical session semantics --------------------
        .config("spark.sql.session.timeZone", "UTC")
        # -- adaptive execution: the scale story -----------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # -- JVM sizing: in local[N] the ONE driver JVM hosts all N
        # task slots, and Spark's 1g default heap starves 32-way
        # parallel shuffles (observed: q21's triple self-join OOMs at
        # 10x sf0.1). Only consulted at JVM launch — a getOrCreate
        # against a live session keeps its existing heap. On a real
        # cluster executors size their own JVMs and this is moot.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
        )
        # -- shuffle sizing -------------------------------------------
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else cores),
        )
        # -- Python data sources: allow pushFilters() (rest_pages) -----
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # -- Arrow for pandas_udf / mapInPandas / toPandas -------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # -- quieter local runs ---------------------------------------
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
