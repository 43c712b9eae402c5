"""Twenty-third query wave — snapshot diffing and candle
re-aggregation:

- cdc_snapshot_diff: table diff between two snapshots — the CDC
  (change-data-capture) primitive behind "what changed since
  yesterday's load". The reference does this by hand per row
  (upbit_daily_candels.py probes max-date and upserts); the engine
  form is ONE full-outer join on the key emitting I/U/D rows. Here
  the "new" snapshot is derived deterministically from orders (a
  price revision for open orders, a deletion slice, an insertion
  slice with shifted keys) so the diff has all three classes and an
  exact oracle.
- a21_candle_resample: 6-hour OHLCV candles built FROM hourly candles
  rather than raw events — candle re-aggregation. high/low/volume are
  plain monoids; open/close need the ORDERED merge (min_by/max_by on
  the sub-candle's bucket time), which is exactly the part a naive
  re-rollup gets wrong (first() over an unordered frame). The oracle
  computes 6h candles straight from raw events — equality proves the
  cascade is lossless, the same maintenance argument as
  incremental_rollup but for ordered aggregates. At 100 TB this is
  why candle stores keep ONE fine granularity and derive the rest.

[EXT]-classic per SURVEY.md §2.5 scope; reference anchors:
upbit_daily_candels.py (incremental candle upsert), daily_candles DDL
(insert_csv_to_postgres.py:34-42).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_spark.queries import _t

# deterministic "new snapshot" construction knobs
_PRICE_BUMP = 1.10      # open orders get a 10% revision → U rows
_DELETE_MOD = 97        # o_orderkey % 97 == 0 rows vanish → D rows
_INSERT_SHIFT = 50_000_000  # shifted-key clones of a slice → I rows
_INSERT_MOD = 101


def _new_snapshot(orders: DataFrame) -> DataFrame:
    """Tomorrow's orders snapshot, derived deterministically: open
    orders reprice, every 97th key is deleted, and every 101st key is
    re-inserted under a shifted key."""
    survived = orders.filter(F.pmod("o_orderkey", F.lit(_DELETE_MOD)) != 0)
    # the bump is deliberately UNROUNDED: round() on a 2-decimal grid
    # is the cross-engine boundary hazard the q2 fix documents, while
    # a bare IEEE multiply is bit-identical in every engine
    revised = survived.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderstatus") == "O",
            F.col("o_totalprice") * _PRICE_BUMP,
        ).otherwise(F.col("o_totalprice")),
    )
    inserted = orders.filter(F.pmod("o_orderkey", F.lit(_INSERT_MOD)) == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(_INSERT_SHIFT)
    )
    return revised.unionByName(inserted)


def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff old→new: (o_orderkey, op, old_price, new_price)
    where op ∈ I (key only in new), D (key only in old), U (key in
    both, tracked column changed). Unchanged rows are NOT emitted —
    a diff that echoes the unchanged majority defeats its purpose.

    Shape: ONE full-outer equi-join on the key; both sides shuffle
    once on o_orderkey. At scale both snapshots are bucketed on the
    key (sinks/writers.write_bucketed) and the diff is exchange-free.
    """
    orders = _t(spark, sf_dir, "orders")
    # presence comes from explicit NON-NULLABLE markers, never from
    # the tracked column: a NULL-priced row present in both snapshots
    # must read as unchanged, not as an insert
    old = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("old_price"),
        F.lit(1).alias("in_old"),
    )
    new = _new_snapshot(orders).select(
        "o_orderkey",
        F.col("o_totalprice").alias("new_price"),
        F.lit(1).alias("in_new"),
    )
    joined = old.join(new, "o_orderkey", "full_outer")
    return (
        joined.withColumn(
            "op",
            F.when(F.col("in_old").isNull(), F.lit("I"))
            .when(F.col("in_new").isNull(), F.lit("D"))
            .when(
                ~F.col("old_price").eqNullSafe(F.col("new_price")), F.lit("U")
            ),
        )
        .filter(F.col("op").isNotNull())
        .select("o_orderkey", "op", "old_price", "new_price")
    )


SQL_CDC = f"""
WITH survived AS (
  SELECT * FROM orders WHERE o_orderkey % {_DELETE_MOD} <> 0
),
revised AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'O'
              THEN o_totalprice * {_PRICE_BUMP}
              ELSE o_totalprice END AS o_totalprice
  FROM survived
),
inserted AS (
  SELECT o_orderkey + {_INSERT_SHIFT} AS o_orderkey, o_totalprice
  FROM orders WHERE o_orderkey % {_INSERT_MOD} = 0
),
new_snap AS (
  SELECT * FROM revised UNION ALL SELECT * FROM inserted
),
joined AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         o.o_totalprice AS old_price, n.o_totalprice AS new_price,
         o.o_orderkey IS NOT NULL AS in_old,
         n.o_orderkey IS NOT NULL AS in_new
  FROM orders o FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
),
classified AS (
  SELECT o_orderkey, old_price, new_price,
         CASE WHEN NOT in_old THEN 'I'
              WHEN NOT in_new THEN 'D'
              WHEN old_price IS DISTINCT FROM new_price THEN 'U' END AS op
  FROM joined
)
SELECT o_orderkey, op, old_price, new_price
FROM classified WHERE op IS NOT NULL
"""


def q_a21_candle_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour OHLCV candles per user derived from HOURLY candles.

    The ordered fields merge by sub-candle time: open = the open of
    the EARLIEST hourly candle (min_by on the hour bucket), close =
    the close of the LATEST; high/low/volume are plain max/min/sum.
    The oracle computes the same 6h candles directly from raw events,
    so the hash check proves the cascade loses nothing.
    """
    events = _t(spark, sf_dir, "events")
    hourly = events.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.min_by("value", F.struct(F.col("ts"), F.col("event_id"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", F.struct(F.col("ts"), F.col("event_id"))).alias("close"),
        F.sum("value").alias("volume"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        hourly.groupBy(
            "user_id",
            F.date_trunc("hour", F.expr(
                "make_timestamp(year(h), month(h), day(h), 6 * (hour(h) div 6), 0, 0)"
            )).alias("bucket6h"),
        )
        .agg(
            F.min_by("open", "h").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "h").alias("close"),
            F.round(F.sum("volume"), 6).alias("volume"),
            F.sum("n").alias("n"),
        )
    )


SQL_A21 = """
WITH raw AS (
  SELECT user_id, ts, event_id, value,
         date_trunc('hour', ts)
           - INTERVAL (CAST(extract(hour FROM ts) AS INTEGER) % 6) HOUR
           AS bucket6h
  FROM events
),
ordered AS (
  SELECT user_id, bucket6h, value,
         row_number() OVER (PARTITION BY user_id, bucket6h
                            ORDER BY ts ASC, event_id ASC) AS rk_open,
         row_number() OVER (PARTITION BY user_id, bucket6h
                            ORDER BY ts DESC, event_id DESC) AS rk_close
  FROM raw
)
SELECT user_id, bucket6h,
       max(CASE WHEN rk_open = 1 THEN value END) AS open,
       max(value) AS high, min(value) AS low,
       max(CASE WHEN rk_close = 1 THEN value END) AS close,
       round(sum(value), 6) AS volume,
       CAST(count(*) AS BIGINT) AS n
FROM ordered
GROUP BY user_id, bucket6h
"""


EXT23_QUERIES = {
    "cdc_snapshot_diff": q_cdc_snapshot_diff,
    "a21_candle_resample": q_a21_candle_resample,
}

EXT23_ORACLES = {
    "cdc_snapshot_diff": SQL_CDC,
    "a21_candle_resample": SQL_A21,
}
