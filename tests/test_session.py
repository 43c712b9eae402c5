"""Config-contract pin for the session factory: the settings the whole
correctness and scale story silently depends on. Losing any of these
in a refactor produces distant, confusing failures (UTC: every
timestamp oracle; AQE trio: the documented skew/coalesce behavior;
Arrow: every pandas-UDF hot path), so they fail HERE by name."""

from __future__ import annotations

from streaming_data_spark.session import get_session


def test_session_factory_pins_correctness_and_scale_confs(spark):
    # `spark` fixture is built by get_session — assert on the live conf
    conf = spark.conf
    assert conf.get("spark.sql.session.timeZone") == "UTC"
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
    assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert (
        conf.get("spark.sql.execution.arrow.pyspark.enabled", "false") == "true"
    )


def test_session_factory_is_reentrant(spark):
    again = get_session(app_name="second-call")
    assert again is spark or again.sparkContext is spark.sparkContext
