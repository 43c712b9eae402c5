"""Driver-contract query registry (core relational surface).

Every operator from SURVEY.md §2 that the engine claims is represented
here as a pair:
  - a PySpark callable ``(spark, sf_dir) -> DataFrame``
  - an equivalent ANSI-SQL oracle string for DuckDB

Naming discipline: every computed column is aliased identically in
both forms (the driver sorts columns by name before value-hashing).
Floating-point discipline: columns produced by ORDER-DEPENDENT float
math (sums, avgs, window sums) are rounded identically on both sides;
pass-through / selection / single-op arithmetic columns are left exact
(IEEE ops are bit-deterministic in both engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_spark import functions as sf_fn
from streaming_data_spark.operators import aggregates as agg
from streaming_data_spark.operators import joins, transforms
from streaming_data_spark.schemas import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Pin session TZ defensively — the driver may hand us a session that
    # didn't go through our factory; timestamp comparisons need UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Joins (SURVEY §2.4)
# --------------------------------------------------------------------------

def q_j1_dim_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — the reference's flagship CTAS join (markets ⋈ prices +
    projection; upbit_data_pipeline.py:171-176), transposed to
    customer ⋈ nation ⋈ region. Both dims broadcast: zero fact shuffle."""
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    enriched = joins.dim_join(
        customer,
        nation.withColumnRenamed("n_nationkey", "c_nationkey"),
        on="c_nationkey",
    )
    enriched = joins.dim_join(
        enriched,
        region.withColumnRenamed("r_regionkey", "n_regionkey"),
        on="n_regionkey",
    )
    return transforms.project(
        enriched,
        [
            F.col("c_custkey"),
            F.col("c_name"),
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            F.col("c_acctbal"),
        ],
    )


SQL_J1 = """
SELECT c_custkey, c_name, n_name AS nation, r_name AS region, c_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


def q_j3_upsert_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — the ON CONFLICT DO NOTHING anti-join (rows whose key is
    absent in the target; upbit_data_pipeline.py:116): customers with
    no finalized ('F') order."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    missing = joins.anti_join(
        customer.withColumn("o_custkey", F.col("c_custkey")),
        orders,
        ["o_custkey"],
    )
    return missing.select("c_custkey", "c_name", "c_acctbal")


SQL_J3 = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
)
"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 complement — EXISTS semi join (FK liveness check): customers
    holding at least one open ('O') order."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    live = joins.semi_join(
        customer.withColumn("o_custkey", F.col("c_custkey")),
        orders,
        ["o_custkey"],
    )
    return live.select("c_custkey", "c_mktsegment")


SQL_SEMI = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
)
"""


# --------------------------------------------------------------------------
# Aggregations (SURVEY §2.5)
# --------------------------------------------------------------------------

def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship aggregation (TPC-H Q1 shape): the candle/rollup
    capability (A3 family) exercised as a wide grouped aggregate with
    map-side partial aggregation."""
    lineitem = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_Q1 = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 6) AS avg_qty,
  round(avg(l_extendedprice), 4) AS avg_price,
  round(avg(l_discount), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + top-k (TPC-H Q3 shape): broadcast dim filter, one
    shuffle agg, global top-10 by revenue.

    Join ORDER (r16, guide §3.1/§2.3): the customer segment filter is
    applied to orders FIRST (a broadcast join, no shuffle), so the
    orders side entering the lineitem join is already ~1/5 its size.

    PRE-AGGREGATION (r17, guide §2.3 — aggregate before you shuffle):
    lineitem is summed per l_orderkey BEFORE the orders join. The big
    exchange then carries one partial-agged row per (map partition,
    orderkey) — ~4x fewer rows, 2 narrow columns — instead of every
    raw lineitem row, and the orderkey-hash partitioning the aggregate
    establishes is reused by the join (no re-shuffle of the agg side).
    Sparks's runtime Bloom filter cannot fire here (the creation side
    is a join, not a filter-over-scan) and a broadcast semi-join
    prefilter hits the broadcast cap at true 100 TB (~30B building
    orderkeys), so shrinking the shuffle via the aggregate is the
    shape that survives every scale. Value-identical: revenue groups
    are orderkey-grain either way (o_orderdate/o_orderpriority are
    functions of the orderkey), each surviving group sums the SAME
    lineitem row set with the same partial-per-scan-partition
    structure (the join never filtered lineitems WITHIN a building
    order), and non-building groups are simply dropped by the join
    after the fact. Measured (interleaved A/B, x1000 replica):
    83.7 -> 53.6 s floor (-36%), identical top-10 at sf0.1/x100/x1000,
    flat at sf0.1 (1.671 vs 1.690) where the agg covers 5x the groups
    but the volume is trivial."""
    customer = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    building_orders = orders.join(
        F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.round(F.sum(revenue), 2).alias("revenue")
    )
    return (
        per_order.join(building_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "o_orderdate", "o_orderpriority", "revenue")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


SQL_Q3 = """
SELECT
  l_orderkey, o_orderdate, o_orderpriority,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_a1_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — count round-trip (the kafka/test.sh produce-100/consume-100
    pattern, batch form)."""
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


SQL_A1 = "SELECT count(*) AS n FROM lineitem"


def q_a2_max_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — per-key watermark lookup (latest timestamp per market →
    latest event per user; upbit_daily_candels.py:185-190)."""
    return agg.max_per_key(_t(spark, sf_dir, "events"), ["user_id"], "ts", alias="last_ts")


SQL_A2 = "SELECT user_id, max(ts) AS last_ts FROM events GROUP BY user_id"


def q_a3_ohlcv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — OHLCV candle aggregation (daily_candles shape,
    insert_csv_to_postgres.py:34-42) from raw events."""
    out = agg.ohlcv(_t(spark, sf_dir, "events"), key="user_id", ts="ts", price="value")
    return out.withColumn("volume", F.round("volume", 4))


SQL_A3 = """
SELECT
  user_id,
  date_trunc('day', ts) AS bucket_ts,
  arg_min(value, ts) AS open,
  max(value) AS high,
  min(value) AS low,
  arg_max(value, ts) AS close,
  round(sum(value), 4) AS volume,
  count(*) AS n_trades
FROM events
GROUP BY user_id, date_trunc('day', ts)
"""


def q_a7_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — distinct values before load (insert_csv_to_postgres.py:61)."""
    return agg.distinct_keys(_t(spark, sf_dir, "events"), ["event_type"])


SQL_A7 = "SELECT DISTINCT event_type FROM events"


def q_a8_metric_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — periodic metric rollup (metricbeat 10 s cadence → per-minute
    batch form; metricbeat.yml:22-52)."""
    out = agg.periodic_rollup(
        _t(spark, sf_dir, "events"), ts="ts", keys=["event_type"], value="value", period="minute"
    )
    return out.withColumn("avg_value", F.round("avg_value", 6))


SQL_A8 = """
SELECT
  date_trunc('minute', ts) AS period_start,
  event_type,
  count(*) AS n,
  round(avg(value), 6) AS avg_value,
  max(value) AS max_value
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Window analytics (SURVEY §2.5 A4–A6, §2.6)
# --------------------------------------------------------------------------

def q_a4_rolling_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — 24h rolling accumulation (acc_trade_price_24h semantics,
    upbit_data_pipeline.py:83-85) over the event stream, batch form."""
    out = agg.rolling_window_sum(
        _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value"),
        key="user_id", ts="ts", col="value",
        window_seconds=24 * 3600, alias="acc_value_24h",
    )
    return out.select(
        "event_id", "user_id", "ts", F.round("acc_value_24h", 4).alias("acc_value_24h")
    )


SQL_A4 = """
SELECT
  event_id, user_id, ts,
  round(sum(value) OVER (
    PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW
  ), 4) AS acc_value_24h
FROM events
"""


def q_a5_change_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — prev-close / RISE|EVEN|FALL change codes
    (upbit_data_pipeline.py:77-80) over per-user daily closes."""
    events = _t(spark, sf_dir, "events")
    daily = (
        events.groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.max_by(F.col("value"), F.col("ts")).alias("close"))
    )
    out = agg.change_vs_previous(daily, key="user_id", order_col="day", price="close")
    return out.select(
        "user_id", "day", "close", "prev_closing_price", "change_price",
        F.round("change_rate", 6).alias("change_rate"), "change",
    )


SQL_A5 = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, arg_max(value, ts) AS close
  FROM events GROUP BY 1, 2
)
SELECT
  user_id, day, close,
  lag(close) OVER w AS prev_closing_price,
  close - lag(close) OVER w AS change_price,
  round(CASE WHEN lag(close) OVER w IS NOT NULL AND lag(close) OVER w <> 0
        THEN (close - lag(close) OVER w) / lag(close) OVER w END, 6) AS change_rate,
  CASE WHEN lag(close) OVER w IS NULL THEN NULL
       WHEN close > lag(close) OVER w THEN 'RISE'
       WHEN close < lag(close) OVER w THEN 'FALL'
       ELSE 'EVEN' END AS change
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY day)
"""


def q_a6_rolling_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — rolling-window extremes AND the date each occurred
    (highest_52_week_price/date, upbit_data_pipeline.py:86-89) — 7-day
    frame over per-user daily closes; struct-max carries the date in
    one window pass."""
    events = _t(spark, sf_dir, "events")
    daily = (
        events.groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.max_by(F.col("value"), F.col("ts")).alias("close"))
    )
    out = agg.rolling_extremes_with_dates(daily, key="user_id", day="day", price="close", days=6)
    return out.select(
        "user_id", "day", "close",
        "highest_price", "highest_date", "lowest_price", "lowest_date",
    )


SQL_A6 = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, arg_max(value, ts) AS close
  FROM events GROUP BY 1, 2
)
SELECT
  user_id, day, close,
  (max({'p': close, 'nd': -epoch(day), 'd': day}) OVER w).p AS highest_price,
  (max({'p': close, 'nd': -epoch(day), 'd': day}) OVER w).d AS highest_date,
  (min({'p': close, 'nd': epoch(day), 'd': day}) OVER w).p AS lowest_price,
  (min({'p': close, 'nd': epoch(day), 'd': day}) OVER w).d AS lowest_date
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
"""


def q_w1_top1_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — top-1 per key as one windowed pass (the reference's per-key
    ORDER BY ts DESC LIMIT 1 loop; upbit_daily_candels.py:187-189)."""
    return agg.top_k_per_key(
        _t(spark, sf_dir, "events"),
        keys=["user_id"],
        order_by=[F.desc("ts"), F.desc("event_id")],
        k=1,
    )


SQL_W1 = """
SELECT event_id, ts, user_id, event_type, value, props
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_w3_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — global sort + limit for presentation (csv written in
    collection order; log_to_csv.py:29-33)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


SQL_W3 = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Projections / filters / transforms (SURVEY §2.3) + set ops (§2.7)
# --------------------------------------------------------------------------

def q_p4_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P4 — equality filter + projection (WHERE event='FAILED';
    log_to_csv.py:25, monitor_errors.py:26). Pushed to the parquet scan."""
    events = _t(spark, sf_dir, "events")
    return transforms.project(
        transforms.filter_eq(events, "event_type", "error"),
        ["event_id", "user_id", "ts", "value"],
    )


SQL_P4 = """
SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'error'
"""


def q_p6_p12_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6+P12 — substring filter (get_coopang_best_item_id.py:20) +
    empty-string→null normalization (instagram-profiles.conf:50-58)."""
    docs = _t(spark, sf_dir, "documents")
    filtered = transforms.filter_contains(docs, "text", "spark")
    return transforms.normalize_nulls(filtered, ["lang", "source"]).select(
        "doc_id", "lang", "source", "n_chars"
    )


SQL_P6 = """
SELECT doc_id, nullif(lang, '') AS lang, nullif(source, '') AS source, n_chars
FROM documents
WHERE contains(text, 'spark')
"""


def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 — union-all accumulation (all_candles.extend pattern;
    upbit_api_candle_info.py:75)."""
    events = _t(spark, sf_dir, "events")
    signup = transforms.filter_eq(events, "event_type", "signup")
    error = transforms.filter_eq(events, "event_type", "error")
    return signup.unionByName(error).select("event_id", "event_type", "value")


SQL_UNION = """
SELECT event_id, event_type, value FROM events WHERE event_type = 'signup'
UNION ALL
SELECT event_id, event_type, value FROM events WHERE event_type = 'error'
"""


# --------------------------------------------------------------------------
# Scalar functions (SURVEY §2.8)
# --------------------------------------------------------------------------

def q_f_dates_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F3/F5/F6/F14 — date formatting, epoch millis, date arithmetic,
    JSON field extraction, all JVM built-ins."""
    events = _t(spark, sf_dir, "events")
    return events.select(
        "event_id",
        sf_fn.yyyymmdd("ts").alias("d8"),
        sf_fn.format_timestamp("ts").alias("ts_str"),
        sf_fn.epoch_millis("ts").alias("ts_ms"),
        F.date_trunc("day", sf_fn.minus_days("ts", 1)).alias("prev_day"),
        sf_fn.json_get("props", "k").cast("int").alias("k"),
    )


SQL_F_DATES = """
SELECT
  event_id,
  strftime(ts, '%Y%m%d') AS d8,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
  epoch_ms(ts) AS ts_ms,
  date_trunc('day', ts - INTERVAL 1 DAY) AS prev_day,
  json_extract_string(props, '$.k')::INTEGER AS k
FROM events
"""


def q_f_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8–F11 — regex extraction, trim, concat, containment over the
    document corpus (the crawler's string surface,
    get_coopang_best_item_id.py:20-23)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract(F.col("text"), r"^(\w+)", 1).alias("first_token"),
        F.length(F.trim(F.col("text"))).alias("text_len"),
        F.concat(F.col("source"), F.lit(":"), F.col("lang")).alias("source_lang"),
        F.col("text").contains("join").alias("mentions_join"),
    )


SQL_F_STRINGS = r"""
SELECT
  doc_id,
  regexp_extract(text, '^(\w+)', 1) AS first_token,
  length(trim(text)) AS text_len,
  source || ':' || lang AS source_lang,
  contains(text, 'join') AS mentions_join
FROM documents
"""


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

CORE_QUERIES: dict[str, QueryFn] = {
    "j1_dim_fact_join": q_j1_dim_fact_join,
    "j3_upsert_anti": q_j3_upsert_anti,
    "semi_join_exists": q_semi_join,
    "q1_pricing_summary": q_q1_pricing_summary,
    "q3_shipping_priority": q_q3_shipping_priority,
    "a1_count": q_a1_count,
    "a2_max_per_key": q_a2_max_per_key,
    "a3_ohlcv": q_a3_ohlcv,
    "a7_distinct": q_a7_distinct,
    "a8_metric_rollup": q_a8_metric_rollup,
    "a4_rolling_24h": q_a4_rolling_24h,
    "a5_change_codes": q_a5_change_codes,
    "a6_rolling_extremes": q_a6_rolling_extremes,
    "w1_top1_per_key": q_w1_top1_per_key,
    "w3_global_topk": q_w3_global_topk,
    "p4_filter_project": q_p4_filter_project,
    "p6_p12_normalize": q_p6_p12_normalize,
    "union_all": q_union_all,
    "f_dates_json": q_f_dates_json,
    "f_strings": q_f_strings,
}

CORE_ORACLES: dict[str, str] = {
    "j1_dim_fact_join": SQL_J1,
    "j3_upsert_anti": SQL_J3,
    "semi_join_exists": SQL_SEMI,
    "q1_pricing_summary": SQL_Q1,
    "q3_shipping_priority": SQL_Q3,
    "a1_count": SQL_A1,
    "a2_max_per_key": SQL_A2,
    "a3_ohlcv": SQL_A3,
    "a7_distinct": SQL_A7,
    "a8_metric_rollup": SQL_A8,
    "a4_rolling_24h": SQL_A4,
    "a5_change_codes": SQL_A5,
    "a6_rolling_extremes": SQL_A6,
    "w1_top1_per_key": SQL_W1,
    "w3_global_topk": SQL_W3,
    "p4_filter_project": SQL_P4,
    "p6_p12_normalize": SQL_P6,
    "union_all": SQL_UNION,
    "f_dates_json": SQL_F_DATES,
    "f_strings": SQL_F_STRINGS,
}
