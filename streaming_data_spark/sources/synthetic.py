"""Synthetic row generation (SURVEY.md §2.1 S10).

The reference generates fake person records with Faker
(airflow/modules/generate_fake_data.py:7-32) to feed Postgres and the
``fake-data`` Kafka topic. Engine form: ``spark.range(n)`` +
deterministic hash-derived column expressions — fully distributed
(each executor generates its partition), reproducible (pure functions
of the row id), no Python in the row path. Faker fidelity is traded
for determinism on purpose; a mapInPandas+Faker variant would drop in
where realism matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NAMES = ("Kim", "Lee", "Park", "Choi", "Jung", "Kang", "Cho", "Yoon", "Jang", "Lim")
_JOBS = ("engineer", "teacher", "nurse", "designer", "analyst", "chef", "writer", "driver")
_CITIES = ("Seoul", "Busan", "Incheon", "Daegu", "Daejeon", "Gwangju", "Suwon", "Ulsan")
_BLOOD = ("A", "B", "AB", "O")
_SEX = ("M", "F")


def _pick(options: tuple[str, ...], seed_col, salt: str):
    """Deterministic category pick: hash(id, salt) mod |options|."""
    idx = F.pmod(F.hash(seed_col, F.lit(salt)), F.lit(len(options)))
    mapping = F.array(*[F.lit(o) for o in options])
    return F.element_at(mapping, idx + 1)


def fake_users(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """S10 — the 10-field fake-user record (generate_fake_data.py:11-23):
    uuid, name, job, residence, blood_group, sex, birthdate ('YYYYMMDD'
    string, as the reference keeps it), phone_number, email, timestamp."""
    base = spark.range(n).withColumn("_seed", F.col("id") + F.lit(seed))
    birth_epoch_day = F.pmod(F.hash(F.col("_seed"), F.lit("birth")), F.lit(18_262))  # 1970..2019
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0),
        F.pmod(F.hash(F.col("_seed"), F.lit("ts")), F.lit(86_400)).cast("double"),
    )
    return base.select(
        F.sha2(F.concat(F.lit("uuid"), F.col("_seed").cast("string")), 256).substr(1, 22).alias("uuid"),
        _pick(_NAMES, F.col("_seed"), "name").alias("name"),
        _pick(_JOBS, F.col("_seed"), "job").alias("job"),
        _pick(_CITIES, F.col("_seed"), "residence").alias("residence"),
        _pick(_BLOOD, F.col("_seed"), "blood").alias("blood_group"),
        _pick(_SEX, F.col("_seed"), "sex").alias("sex"),
        F.date_format(F.date_add(F.lit("1970-01-01").cast("date"), birth_epoch_day), "yyyyMMdd").alias("birthdate"),
        F.concat(F.lit("010-"),
                 F.lpad(F.pmod(F.hash(F.col("_seed"), F.lit("ph1")), F.lit(10_000)).cast("string"), 4, "0"),
                 F.lit("-"),
                 F.lpad(F.pmod(F.hash(F.col("_seed"), F.lit("ph2")), F.lit(10_000)).cast("string"), 4, "0"),
                 ).alias("phone_number"),
        F.concat(F.lower(_pick(_NAMES, F.col("_seed"), "name")),
                 F.col("id").cast("string"), F.lit("@example.com")).alias("email"),
        ts.alias("timestamp"),
    )
