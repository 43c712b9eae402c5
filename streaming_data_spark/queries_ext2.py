"""Second wave of registry queries: as-of join, scalar-function parity
(backoff, uuid-free hashing), pandas-UDF surface, set ops, and
null handling — rounding out SURVEY.md §2 coverage.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from streaming_data_spark.operators import joins
from streaming_data_spark.queries import _t

# --------------------------------------------------------------------------
# As-of join ([EXT] §2.4 / §4.2-5) — oracle: DuckDB's native ASOF JOIN
# --------------------------------------------------------------------------

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, the most recent prior 'view' value of
    the same user (union + last(ignorenulls) pattern — ONE shuffle on
    the key, no range probe; SURVEY §4.2-5)."""
    events = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("last_view_value")
    )
    out = joins.asof_join(
        purchases, views, key="user_id", ts="ts", value_cols=["last_view_value"]
    )
    return out.select("event_id", "user_id", "ts", "value", "last_view_value")


SQL_ASOF = """
SELECT p.event_id, p.user_id, p.ts, p.value, v.last_view_value
FROM (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
) p
ASOF LEFT JOIN (
  SELECT user_id, ts, value AS last_view_value FROM events WHERE event_type = 'view'
) v ON p.user_id = v.user_id AND v.ts <= p.ts
"""


# --------------------------------------------------------------------------
# F17 — backoff formula parity (connector util, SQL-expressible)
# --------------------------------------------------------------------------

def q_f17_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min(60·2^n, 3600) over n = retry counts derived from data
    (upbit_data_pipeline.py:54-55)."""
    from streaming_data_spark.functions import backoff_seconds

    events = _t(spark, sf_dir, "events")
    retries = events.select((F.col("event_id") % 8).alias("retry")).distinct()
    return retries.select("retry", backoff_seconds(F.col("retry")).alias("backoff_s"))


SQL_F17 = """
SELECT DISTINCT (event_id % 8) AS retry,
       least(3600.0, 60.0 * pow(2.0, (event_id % 8))) AS backoff_s
FROM events
"""


# --------------------------------------------------------------------------
# §2.10 — Pandas-UDF surface (Arrow-vectorized scalar + grouped-agg)
# --------------------------------------------------------------------------

def q_udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF: winsorize to [1, 99] — representative of the
    reference's arbitrary-Python transform step (etl_pipeline.py:43-50),
    Arrow-batched instead of row-at-a-time. (Defined inside the
    callable: pandas_udf registration needs an active session.)"""

    @pandas_udf("double")
    def clip_udf(v: pd.Series) -> pd.Series:
        return v.clip(lower=1.0, upper=99.0)

    events = _t(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.round(clip_udf(F.col("value")), 4).alias("value_clipped"),
    )


SQL_UDF_SCALAR = """
SELECT event_id,
       round(CASE WHEN value < 1.0 THEN 1.0 WHEN value > 99.0 THEN 99.0 ELSE value END, 4)
         AS value_clipped
FROM events
"""


def q_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (per-user value median — not otherwise a
    single built-in aggregate)."""

    @pandas_udf("double")
    def median_udf(v: pd.Series) -> float:
        return float(v.median())

    events = _t(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.round(median_udf(F.col("value")), 4).alias("median_value")
    )


SQL_UDF_GROUPED = """
SELECT user_id, round(median(value), 4) AS median_value
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# §2.7 — remaining set ops (exposed surface: intersect / except)
# --------------------------------------------------------------------------

def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who both purchased and signed up (intersect distinct)."""
    events = _t(spark, sf_dir, "events")
    purchasers = events.filter(F.col("event_type") == "purchase").select("user_id")
    signups = events.filter(F.col("event_type") == "signup").select("user_id")
    return purchasers.intersect(signups)


SQL_INTERSECT = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'signup'
"""


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who viewed but never purchased (except distinct)."""
    events = _t(spark, sf_dir, "events")
    viewers = events.filter(F.col("event_type") == "view").select("user_id")
    purchasers = events.filter(F.col("event_type") == "purchase").select("user_id")
    return viewers.subtract(purchasers)  # EXCEPT DISTINCT semantics


SQL_EXCEPT = """
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


# --------------------------------------------------------------------------
# P7 — null-row drop on a real nullable derivation
# --------------------------------------------------------------------------

def q_p7_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropna after a lossy parse (etl_pipeline.py:48): events whose
    props lack 'k' drop out."""
    events = _t(spark, sf_dir, "events")
    parsed = events.select(
        "event_id",
        F.get_json_object("props", "$.missing").cast("int").alias("maybe"),
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    return parsed.na.drop(subset=["k"]).select("event_id", "k")


SQL_P7 = """
SELECT event_id, json_extract_string(props, '$.k')::INTEGER AS k
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
"""


EXT2_QUERIES = {
    "asof_join": q_asof_join,
    "f17_backoff": q_f17_backoff,
    "udf_scalar_pandas": q_udf_scalar_pandas,
    "udf_grouped_agg": q_udf_grouped_agg,
    "set_intersect": q_set_intersect,
    "set_except": q_set_except,
    "p7_dropna": q_p7_dropna,
}

EXT2_ORACLES = {
    "asof_join": SQL_ASOF,
    "f17_backoff": SQL_F17,
    "udf_scalar_pandas": SQL_UDF_SCALAR,
    "udf_grouped_agg": SQL_UDF_GROUPED,
    "set_intersect": SQL_INTERSECT,
    "set_except": SQL_EXCEPT,
    "p7_dropna": SQL_P7,
}
