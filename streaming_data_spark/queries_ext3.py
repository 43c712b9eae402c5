"""Third wave of registry queries — latent capabilities SURVEY.md
marks as exposed-but-untested, now oracle-tested: batch flatten/cast
(the Logstash chain in batch form), pagination windows, sessionization,
rollup totals, pivot. Closes the §2.3/§2.6/§2.5 long tail.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from streaming_data_spark.operators import transforms
from streaming_data_spark.queries import _t

# --------------------------------------------------------------------------
# P3/P9/P10/P11 — batch form of the Logstash flatten/cast/copy chain
# --------------------------------------------------------------------------

def q_p10_flatten_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json → flatten one-level struct → cast → rename → copy
    column (instagram-profiles.conf:24-46 as a batch query)."""
    events = _t(spark, sf_dir, "events")
    payload = StructType([StructField("k", IntegerType(), True)])
    parsed = events.withColumn("parsed", F.from_json(F.col("props"), payload))
    flat = transforms.flatten_struct(parsed.select("event_id", "event_type", "value", "parsed"), "parsed")
    flat = transforms.cast_columns(flat, {"k": "long"})
    flat = transforms.copy_column(flat, "value", "log_value")
    return transforms.rename(
        flat,
        {"event_id": "event_id", "event_type": "evt", "k": "k", "log_value": "log_value"},
    )


SQL_P10 = """
SELECT event_id,
       event_type AS evt,
       json_extract_string(props, '$.k')::BIGINT AS k,
       value AS log_value
FROM events
"""

# --------------------------------------------------------------------------
# W2 — pagination ordering (cursor walks a global order)
# --------------------------------------------------------------------------

def keyset_page(
    df: DataFrame,
    page_size: int,
    cursor: tuple | None = None,
    desc_col: str = "o_orderdate",
    asc_col: str = "o_orderkey",
) -> DataFrame:
    """Keyset (cursor) pagination over the order (desc_col DESC,
    asc_col ASC): rows strictly after ``cursor`` = (last desc value,
    last asc value) of the previous page, top-``page_size`` of them.

    The scale story: the cursor filter pushes to the scan and the
    sort+limit compiles to TakeOrderedAndProject — a per-partition
    top-k merged on the driver, NO global sort, NO single-partition
    window. Each page costs one pruned scan regardless of page depth,
    which is exactly the reference's day-cursor API walk
    (upbit_daily_candels.py:170-172)."""
    if cursor is not None:
        cd, ck = cursor
        df = df.filter(
            (F.col(desc_col) < F.lit(cd))
            | ((F.col(desc_col) == F.lit(cd)) & (F.col(asc_col) > F.lit(ck)))
        )
    return df.orderBy(F.desc(desc_col), F.asc(asc_col)).limit(page_size)


# Fixed cursor for the registry query: in the real protocol the CLIENT
# holds the cursor (the last row of the page it already has), so the
# measured query is exactly one page fetch — filter + top-k. The
# two-page walk (fetch page 1, extract cursor, fetch page 2) stays a
# pytest (tests/test_queries_ext3.py) because it is a client protocol,
# not a single engine query. Mid-range TPC-H o_orderdate so the page
# is non-trivial at every scale factor.
_W2_CURSOR_DATE = "1995-06-17"
_W2_CURSOR_KEY = 0


def q_w2_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One keyset page of orders by (o_orderdate desc, o_orderkey asc)
    strictly after a client-held cursor — the API pagination protocol
    (upbit_daily_candels.py:170-172). Filter + TakeOrderedAndProject:
    per-partition top-k merged on the driver, no global sort, constant
    cost at any page depth."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    cursor = (datetime.date.fromisoformat(_W2_CURSOR_DATE), _W2_CURSOR_KEY)
    return keyset_page(orders, 100, cursor=cursor)


SQL_W2 = f"""
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders
WHERE o_orderdate < DATE '{_W2_CURSOR_DATE}'
   OR (o_orderdate = DATE '{_W2_CURSOR_DATE}' AND o_orderkey > {_W2_CURSOR_KEY})
ORDER BY o_orderdate DESC, o_orderkey ASC
LIMIT 100
"""

# --------------------------------------------------------------------------
# Sessionization — gap-based sessions (guide §OLAP patterns; latent T3)
# --------------------------------------------------------------------------

def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions split on >30 min inactivity: lag + cumulative
    sum of gap flags — one shuffle on user_id, two window passes."""
    events = _t(spark, sf_dir, "events")
    # event_id tiebreak: same-ts events would otherwise make the
    # cumulative-sum session assignment order-dependent (see ext27).
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w_order))
    flagged = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    sessioned = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w_order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessioned.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
    )


SQL_SESSION = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT user_id, ts, value,
    -- ::BIGINT: DuckDB window sum yields HUGEINT, which pandas widens
    -- to float64 and breaks the driver's value hash vs Spark's int64.
    (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       round(sum(value), 4) AS session_value
FROM sessioned
GROUP BY user_id, session_seq
"""

# --------------------------------------------------------------------------
# Rollup — subtotal/total grouping (latent §2.5 note)
# --------------------------------------------------------------------------

def q_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): per-group, per-flag
    subtotal, and grand-total rows in one pass."""
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


SQL_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

# --------------------------------------------------------------------------
# Pivot — wide per-key counts (latent; guide §OLAP patterns)
# --------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events pivoted to one column per type (fixed value list keeps
    the schema deterministic; absent cells coalesce to 0)."""
    events = _t(spark, sf_dir, "events")
    pivoted = (
        events.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    )


# count(CASE...) not sum(CASE...): DuckDB sum yields HUGEINT (pandas
# float64, hash-mismatch vs Spark int64); count is plain BIGINT.
SQL_PIVOT = """
SELECT user_id,
       count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
       count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
FROM events
GROUP BY user_id
"""


EXT3_QUERIES = {
    "p10_flatten_cast": q_p10_flatten_cast,
    "w2_pagination": q_w2_pagination,
    "sessionization": q_sessionization,
    "rollup_totals": q_rollup_totals,
    "pivot_counts": q_pivot_counts,
}

EXT3_ORACLES = {
    "p10_flatten_cast": SQL_P10,
    "w2_pagination": SQL_W2,
    "sessionization": SQL_SESSION,
    "rollup_totals": SQL_ROLLUP,
    "pivot_counts": SQL_PIVOT,
}
