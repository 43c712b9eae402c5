"""Aggregations & window analytics (SURVEY.md §2.5, §2.6).

The reference's aggregate shapes are latent in its data model (candles
ARE pre-aggregated OHLCV; acc_*_24h are rolling sums computed server-
side). This module produces those shapes from raw events with
map-side-combinable built-ins — partial aggregation, AQE and codegen
apply automatically; no Python crosses the row path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exists(df: DataFrame) -> bool:
    """A1/K10 — cheap existence gate (``if failed_logs:``).
    Ref: log_to_csv.py:28. ``limit(1)`` avoids a full count at scale."""
    return bool(df.limit(1).count())


def max_per_key(df: DataFrame, keys: Sequence[str], col: str, alias: str = "max_value") -> DataFrame:
    """A2 — per-key watermark lookup (latest candle timestamp per market).
    Ref: upbit_daily_candels.py:185-190. Map-side combinable groupBy,
    not the reference's per-key ORDER BY ... LIMIT 1 loop."""
    return df.groupBy(*keys).agg(F.max(col).alias(alias))


def ohlcv(
    df: DataFrame,
    key: str,
    ts: str,
    price: str,
    bucket: str = "day",
) -> DataFrame:
    """A3 — OHLCV candle aggregation, the model behind ``daily_candles``
    (insert_csv_to_postgres.py:34-42).

    open/close via ``min_by``/``max_by`` on the event timestamp — one
    hash aggregate, no window+filter second pass. Volume is the sum of
    the priced quantity (here: the value column itself).
    """
    bucket_col = F.date_trunc(bucket, F.col(ts)).alias("bucket_ts")
    return (
        df.groupBy(F.col(key), bucket_col)
        .agg(
            F.min_by(F.col(price), F.col(ts)).alias("open"),
            F.max(price).alias("high"),
            F.min(price).alias("low"),
            F.max_by(F.col(price), F.col(ts)).alias("close"),
            F.sum(price).alias("volume"),
            F.count(F.lit(1)).alias("n_trades"),
        )
    )


def rolling_window_sum(
    df: DataFrame,
    key: str,
    ts: str,
    col: str,
    window_seconds: int,
    alias: str = "rolling_sum",
) -> DataFrame:
    """A4 — rolling accumulation (acc_trade_price_24h semantics).
    Ref: upbit_data_pipeline.py:83-85 (server-computed in ref).

    Range frame over microsecond-precision epoch so sub-second event
    times bucket exactly like the oracle. One shuffle on ``key``.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(F.unix_micros(F.col(ts)))
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    return df.withColumn(alias, F.sum(col).over(w))


def change_vs_previous(
    df: DataFrame,
    key: str,
    order_col: str,
    price: str,
) -> DataFrame:
    """A5 — prev close / change code / change amount / change rate
    (the RISE|EVEN|FALL enum of upbit_prices).
    Ref: upbit_data_pipeline.py:77-80 (server-computed in ref).
    """
    w = Window.partitionBy(key).orderBy(order_col)
    prev = F.lag(F.col(price)).over(w)
    diff = F.col(price) - prev
    return (
        df.withColumn("prev_closing_price", prev)
        .withColumn("change_price", diff)
        .withColumn(
            "change_rate",
            F.when(prev.isNotNull() & (prev != 0), diff / prev),
        )
        .withColumn(
            "change",
            F.when(prev.isNull(), F.lit(None).cast("string"))
            .when(diff > 0, "RISE")
            .when(diff < 0, "FALL")
            .otherwise("EVEN"),
        )
    )


def rolling_extremes_with_dates(
    df: DataFrame,
    key: str,
    day: str,
    price: str,
    days: int = 364,
) -> DataFrame:
    """A6 — 52-week high/low and the date each occurred
    (highest_52_week_price/date columns of upbit_prices).
    Ref: upbit_data_pipeline.py:86-89 (server-computed in ref).

    Date-of-extreme via max/min over struct(price, tiebreak, day):
    Spark compares structs lexicographically, so one window pass
    carries the day of the extreme — no self-join. Ties on price
    resolve deterministically to the EARLIEST day (the negated day
    ordinal as second struct field).
    """
    w = (
        Window.partitionBy(key)
        .orderBy(F.unix_date(F.col(day).cast("date")))
        .rangeBetween(-days, 0)
    )
    ordinal = F.unix_date(F.col(day).cast("date"))
    hi = F.max(F.struct(F.col(price).alias("p"), (-ordinal).alias("nd"), F.col(day).alias("d"))).over(w)
    lo = F.min(F.struct(F.col(price).alias("p"), ordinal.alias("nd"), F.col(day).alias("d"))).over(w)
    return (
        df.withColumn("highest_price", hi["p"])
        .withColumn("highest_date", hi["d"])
        .withColumn("lowest_price", lo["p"])
        .withColumn("lowest_date", lo["d"])
    )


def top_k_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int = 1,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """W1 — top-k per key (the reference's per-key ORDER BY DESC LIMIT 1,
    executed as ONE windowed pass instead of a loop).
    Ref: upbit_daily_candels.py:187-189.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def distinct_keys(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A7 — distinct values before load. Ref: insert_csv_to_postgres.py:61."""
    return df.select(*cols).distinct()


def periodic_rollup(
    df: DataFrame,
    ts: str,
    keys: Sequence[str],
    value: str,
    period: str = "minute",
) -> DataFrame:
    """A8 — periodic metric rollup (the 10 s metricbeat cadence, batch
    form). Ref: docker-elk/extensions/metricbeat/config/metricbeat.yml:22-52.
    Streaming form lives in streaming.pipeline.windowed_rollup."""
    return (
        df.groupBy(F.date_trunc(period, F.col(ts)).alias("period_start"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(value).alias("avg_value"),
            F.max(value).alias("max_value"),
        )
    )


def scd2_history(
    df: DataFrame,
    key: str,
    order_col: str,
    tracked: str,
    tiebreak: str,
) -> DataFrame:
    """[EXT] Slowly-changing-dimension type-2 history build: collapse a
    per-key event stream into effective-dated versions of ``tracked``.

    A row opens a new version when its tracked value differs from the
    previous event's (or it is the key's first event); the version is
    effective from its own ``order_col`` until the next version opens
    (NULL effective_to + is_current for the open version). This is the
    warehouse materialization of the reference's upsert-on-change
    pattern (upbit_data_pipeline.py:95-117 rewrites the current row;
    SCD2 keeps every version instead).

    Two window passes over the SAME (key × order) partitioning — one
    shuffle total, AQE reuses the sort: lag() finds change points,
    lead() over the surviving change rows closes each version. The
    ``tiebreak`` column pins ordering when ``order_col`` duplicates
    (at 100 TB simultaneous events are the norm, and a nondeterministic
    sort under lag() makes the whole history nondeterministic).
    """
    w = Window.partitionBy(key).orderBy(F.col(order_col).asc(), F.col(tiebreak).asc())
    prev = F.lag(F.col(tracked)).over(w)
    changes = (
        df.withColumn("_sds_prev", prev)
        .filter(F.col("_sds_prev").isNull() | (F.col("_sds_prev") != F.col(tracked)))
        .drop("_sds_prev")
    )
    w2 = Window.partitionBy(key).orderBy(F.col(order_col).asc(), F.col(tiebreak).asc())
    nxt = F.lead(F.col(order_col)).over(w2)
    return changes.select(
        F.col(key),
        F.col(tracked),
        F.col(order_col).alias("effective_from"),
        nxt.alias("effective_to"),
        nxt.isNull().alias("is_current"),
    )
