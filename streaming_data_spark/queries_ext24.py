"""Twenty-fourth query wave — native semi-structured processing:

- f_variant_json: the events ``props`` JSON payload processed through
  Spark 4's VARIANT type (``try_parse_json`` once → typed
  ``try_variant_get`` extractions) instead of per-path
  ``get_json_object`` string re-parsing. Same answers as the string
  path (f_dates_json extracts the same field) — the difference is the
  execution model: VARIANT parses each payload ONCE into a binary
  form and every extraction is a cheap typed probe, where N
  get_json_object calls re-parse the string N times. That is the
  100 TB semi-structured story (and the open-format direction —
  Parquet variant shredding), demonstrated on the reference's own
  payload shape (Logstash-side JSON parse, container-logs.conf).

[EXT] per SURVEY.md §2.8 scope (F12-F16 json family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t


def q_f_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type stats over the VARIANT-extracted ``props.k``:
    rows with a parseable integer k, its min/max/avg. One parse_json
    per row feeds every probe."""
    events = _t(spark, sf_dir, "events")
    v = events.select(
        "event_type",
        # try_ at BOTH layers: parse_json throws on malformed payloads,
        # while every other json-family query here null-tolerates them
        F.try_variant_get(F.try_parse_json("props"), "$.k", "int").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.round(F.avg("k"), 6).alias("k_avg"),
    )


SQL_F_VARIANT = """
SELECT event_type,
       CAST(count(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS n_with_k,
       min(CAST(props->>'$.k' AS INTEGER)) AS k_min,
       max(CAST(props->>'$.k' AS INTEGER)) AS k_max,
       round(avg(CAST(props->>'$.k' AS INTEGER)), 6) AS k_avg
FROM events
GROUP BY event_type
"""


EXT24_QUERIES = {
    "f_variant_json": q_f_variant_json,
}

EXT24_ORACLES = {
    "f_variant_json": SQL_F_VARIANT,
}
