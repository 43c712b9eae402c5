"""streaming_data_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference multi-pipeline project (Airflow + Postgres + Kafka +
Logstash + Elasticsearch), re-expressed Spark-first: batch relational
core on the DataFrame API (Catalyst optimizes), Structured Streaming
for the Kafka/Logstash-equivalent stream path, and an [EXT] layer of
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Design rules (see SURVEY.md §7):
- declare plans with DataFrame/SQL; never hand-schedule what Catalyst does
- built-in ``pyspark.sql.functions`` in the hot path; Pandas UDFs only
  where built-ins can't express the semantics
- every operator ships with an oracle-differential test (DuckDB)
"""

from streaming_data_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
