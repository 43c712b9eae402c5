"""Technical-indicator operators over per-key daily closes.

The reference's candle pipeline materializes daily OHLCV rows and
change codes (airflow/dags/upbit_daily_candels.py:60-90) and charts
them in Kibana; the indicators a charting layer derives from those
candles — moving-average crossovers, Bollinger bands, EWMA smoothing,
drawdown — are the natural next operators over the same daily grid.
All are built on ONE shuffle per key (the daily aggregate), with every
rolling form riding that same keyed window — no re-partitioning
between indicator passes.

Scale notes: inputs are per-(key, day) aggregates, so row counts are
bounded by keys × calendar days regardless of fact volume; the only
fact-sized pass is the daily-close groupBy, a map-side-combinable
aggregation. The EWMA is the one inherently-sequential recursion
(y_t = a·x_t + (1-a)·y_{t-1}); it runs as a partition-level
``mapInPandas`` fold over key-sorted partitions (state carried
across Arrow batches — see ``ewma``'s docstring) — vectorized,
parallel across partitions, sequential only in the dimension the
math requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)


def daily_closes(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    price_col: str = "value",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """(key, day, close): the last price of each key's day — the same
    shape the reference stores per candle (trade_price at day end).

    ``tiebreak_col`` (an event id) makes the close TOTAL when two of a
    key's events share the day's max timestamp — max_by over a bare ts
    would pick by partition/merge order there, and every indicator
    downstream (crossovers, bands, EWMA, drawdown) would inherit the
    flap. Pass None only when (key, ts) is known unique."""
    order = (
        F.col(ts_col)
        if tiebreak_col is None
        else F.struct(F.col(ts_col), F.col(tiebreak_col))
    )
    return events.groupBy(
        key, F.date_trunc("day", F.col(ts_col)).alias("day")
    ).agg(F.max_by(F.col(price_col), order).alias("close"))


def sma_crossover(
    daily: DataFrame,
    key: str = "user_id",
    short: int = 5,
    long: int = 20,
) -> DataFrame:
    """Golden/death-cross detection: short-window SMA crossing the
    long-window SMA between consecutive days. Emitted only where the
    LONG window is fully warmed (n = ``long`` days) on both the
    current and previous day, so every signal compares two real SMAs.

    SMAs are rounded to 6 decimals BEFORE the comparison — rolling
    averages are order-dependent float sums, and comparing rounded
    values keeps the signal identical across engines (the oracle
    compares the same rounded values).
    """
    w = Window.partitionBy(key).orderBy("day")
    w_s = w.rowsBetween(-(short - 1), 0)
    w_l = w.rowsBetween(-(long - 1), 0)
    enriched = (
        daily.withColumn("sma_s", F.round(F.avg("close").over(w_s), 6))
        .withColumn("sma_l", F.round(F.avg("close").over(w_l), 6))
        .withColumn("n_l", F.count("close").over(w_l))
    )
    lagged = (
        enriched.withColumn("p_sma_s", F.lag("sma_s").over(w))
        .withColumn("p_sma_l", F.lag("sma_l").over(w))
        .withColumn("p_n_l", F.lag("n_l").over(w))
    )
    return (
        lagged.filter((F.col("n_l") == long) & (F.col("p_n_l") == long))
        .withColumn(
            "signal",
            F.when(
                (F.col("sma_s") > F.col("sma_l"))
                & (F.col("p_sma_s") <= F.col("p_sma_l")),
                F.lit("GOLDEN"),
            ).when(
                (F.col("sma_s") < F.col("sma_l"))
                & (F.col("p_sma_s") >= F.col("p_sma_l")),
                F.lit("DEATH"),
            ),
        )
        .select(key, "day", "close", "sma_s", "sma_l", "signal")
    )


def bollinger_bands(
    daily: DataFrame,
    key: str = "user_id",
    periods: int = 20,
    n_std: float = 2.0,
) -> DataFrame:
    """Rolling mean ± n_std·sample-stddev bands over ``periods`` days,
    plus the close's position (ABOVE/IN/BELOW) against the ROUNDED
    bands (same cross-engine determinism contract as sma_crossover).
    Only fully-warmed windows emit — a 2-day "20-day band" is noise."""
    w = Window.partitionBy(key).orderBy("day").rowsBetween(-(periods - 1), 0)
    mid = F.avg("close").over(w)
    sd = F.stddev_samp("close").over(w)
    banded = (
        daily.withColumn("mid", F.round(mid, 6))
        .withColumn("upper", F.round(mid + n_std * sd, 6))
        .withColumn("lower", F.round(mid - n_std * sd, 6))
        .withColumn("w_n", F.count("close").over(w))
    )
    return (
        banded.filter(F.col("w_n") == periods)
        .withColumn(
            "position",
            F.when(F.col("close") > F.col("upper"), F.lit("ABOVE"))
            .when(F.col("close") < F.col("lower"), F.lit("BELOW"))
            .otherwise(F.lit("IN")),
        )
        .select(key, "day", "close", "mid", "upper", "lower", "position")
    )


def ewma(
    daily: DataFrame,
    key: str = "user_id",
    alpha: float = 0.2,
    day_col: str = "day",
    price_col: str = "close",
) -> DataFrame:
    """Recursive exponentially-weighted moving average per key:
    y_1 = x_1; y_t = alpha·x_t + (1-alpha)·y_{t-1}.

    The recursion is inherently sequential along each key's day axis.
    It runs inside ``mapInPandas`` over a key-partitioned,
    (key, day)-sorted layout — NOT per-key ``applyInPandas``: with
    thousands of small keys (1500 users × ~27 days at sf0.1) the
    per-GROUP Arrow round-trip dominated (~5 s for 40k rows); one
    Arrow transfer per PARTITION with the fold state carried across
    record batches is ~5× cheaper, same math. The fold is written as
    EXACTLY ``a*x + (1-a)*y`` so an engine repeating the same IEEE
    ops (the DuckDB recursive-CTE oracle) reproduces it bit-for-bit
    before rounding.

    A closed-form window expression exists (y_t = Σ a(1-a)^(t-k)x_k)
    but needs (1-a)^(-k) factors that overflow past a few thousand
    rows — the per-key fold is the numerically-honest form.
    """
    a = float(alpha)
    cols = [f.name for f in daily.schema.fields]
    out_schema = StructType(
        list(daily.schema.fields) + [StructField("ewma", DoubleType())]
    )

    def _fold_partition(pdfs):
        # one partition = many whole keys, sorted by (key, day);
        # Arrow may slice it into several record batches, so the
        # (current key, running value) state crosses batch boundaries
        cur = object()
        y = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            out = []
            for k_val, x in zip(pdf[key], pdf[price_col]):
                if k_val != cur:
                    cur = k_val
                    y = float(x)
                else:
                    y = a * float(x) + (1.0 - a) * y
                out.append(y)
            pdf = pdf.copy()
            pdf["ewma"] = out
            yield pdf[cols + ["ewma"]]

    return (
        daily.repartition(key)
        .sortWithinPartitions(key, day_col)
        .mapInPandas(_fold_partition, schema=out_schema)
    )


def max_drawdown(daily: DataFrame, key: str = "user_id") -> DataFrame:
    """Worst peak-to-trough decline per key: running peak via an
    expanding max, drawdown = (close - peak) / peak, then the per-key
    minimum. Division and min are IEEE-exact single ops, so only the
    final value is rounded (no accumulation-order hazard)."""
    w = Window.partitionBy(key).orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dd = daily.withColumn("peak", F.max("close").over(w)).withColumn(
        "drawdown", (F.col("close") - F.col("peak")) / F.col("peak")
    )
    return dd.groupBy(key).agg(
        F.round(F.min("drawdown"), 6).alias("max_drawdown"),
        F.count(F.lit(1)).alias("n_days"),
    )


def atr(
    ohlcv_daily: DataFrame,
    key: str = "user_id",
    periods: int = 14,
) -> DataFrame:
    """Average True Range (SMA variant) over per-key daily OHLC rows:
    TR = greatest(high-low, |high-prev_close|, |low-prev_close|)
    (first day: high-low, no prev close), ATR = rolling mean of TR
    over ``periods`` days, emitted only for fully-warmed windows.
    Wilder's recursive smoothing variant is the ``rsi`` fold pattern;
    the SMA form stays windows-only (one keyed exchange)."""
    w_ord = Window.partitionBy(key).orderBy("day")
    w_frame = w_ord.rowsBetween(-(periods - 1), 0)
    prev_close = F.lag("close").over(w_ord)
    tr = F.when(
        prev_close.isNull(), F.col("high") - F.col("low")
    ).otherwise(
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - prev_close),
            F.abs(F.col("low") - prev_close),
        )
    )
    out = (
        ohlcv_daily.withColumn("tr", tr)
        .withColumn("atr", F.round(F.avg("tr").over(w_frame), 6))
        .withColumn("w_n", F.count("tr").over(w_frame))
    )
    return (
        out.filter(F.col("w_n") == periods)
        .select(key, "day", F.round("tr", 6).alias("tr"), "atr")
    )


def rsi(
    daily: DataFrame,
    key: str = "user_id",
    periods: int = 14,
    day_col: str = "day",
    price_col: str = "close",
) -> DataFrame:
    """Wilder's RSI over per-key daily closes — the second inherently
    sequential indicator recursion (after ewma): the seed average
    gain/loss over the first ``periods`` deltas is followed by
    avg = (avg·(periods-1) + x) / periods per day. Runs as the same
    partition-level ``mapInPandas`` fold as ``ewma`` (key-sorted
    partitions, state across Arrow batches); the DuckDB oracle is a
    RECURSIVE CTE repeating the identical op order. Emits from day
    ``periods``+1 (the first day with a full delta window).

    avg_loss == 0 ⇒ RSI 100 (the charting convention — both engines
    branch on exact 0, deterministic)."""
    p = float(periods)
    cols = [key, day_col, price_col]
    out_schema = StructType(
        [
            daily.schema[key],
            daily.schema[day_col],
            daily.schema[price_col],
            StructField("rsi", DoubleType()),
        ]
    )

    def _fold_partition(pdfs):
        # state per key: (n_deltas, seed_gain_sum, seed_loss_sum,
        # avg_gain, avg_loss, prev_close) — carried across batches
        cur = object()
        n = 0
        gsum = lsum = 0.0
        ag = al = None
        prev = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            keys_out, days_out, closes_out, rsis_out = [], [], [], []
            for k_val, d_val, x in zip(pdf[key], pdf[day_col], pdf[price_col]):
                x = float(x)
                if k_val != cur:
                    cur, n, gsum, lsum, ag, al, prev = k_val, 0, 0.0, 0.0, None, None, x
                    continue
                delta = x - prev
                prev = x
                gain = delta if delta > 0 else 0.0
                loss = -delta if delta < 0 else 0.0
                n += 1
                if n < periods:
                    gsum += gain
                    lsum += loss
                    continue
                if n == periods:
                    gsum += gain
                    lsum += loss
                    ag = gsum / p
                    al = lsum / p
                else:
                    ag = (ag * (p - 1.0) + gain) / p
                    al = (al * (p - 1.0) + loss) / p
                r = 100.0 if al == 0.0 else 100.0 - 100.0 / (1.0 + ag / al)
                keys_out.append(k_val)
                days_out.append(d_val)
                closes_out.append(x)
                rsis_out.append(r)
            if keys_out:
                import pandas as pd

                yield pd.DataFrame(
                    {
                        key: keys_out,
                        day_col: days_out,
                        price_col: closes_out,
                        "rsi": rsis_out,
                    }
                )

    return (
        daily.select(*cols)
        .repartition(key)
        .sortWithinPartitions(key, day_col)
        .mapInPandas(_fold_partition, schema=out_schema)
        .withColumn("rsi", F.round("rsi", 6))
    )


def stochastic(
    ohlcv_daily: DataFrame,
    key: str = "user_id",
    periods: int = 14,
    smooth: int = 3,
) -> DataFrame:
    """Stochastic oscillator over per-key daily OHLC: %K = 100 ·
    (close − min_low) / (max_high − min_low) over ``periods`` days
    (NULL when the range is 0 — both engines branch identically),
    %D = ``smooth``-day mean of %K over fully-warmed rows. Emits rows
    where both windows are full."""
    w_frame = Window.partitionBy(key).orderBy("day").rowsBetween(-(periods - 1), 0)
    lo = F.min("low").over(w_frame)
    hi = F.max("high").over(w_frame)
    with_k = (
        ohlcv_daily.withColumn("w_n", F.count("close").over(w_frame))
        .withColumn(
            "pct_k",
            F.when(hi == lo, F.lit(None).cast("double")).otherwise(
                F.round(100.0 * (F.col("close") - lo) / (hi - lo), 6)
            ),
        )
        .filter(F.col("w_n") == periods)
    )
    w_full = Window.partitionBy(key).orderBy("day")
    w_d = w_full.rowsBetween(-(smooth - 1), 0)
    return (
        with_k.withColumn("rn_full", F.row_number().over(w_full))
        .withColumn("pct_d", F.round(F.avg("pct_k").over(w_d), 6))
        .filter(F.col("rn_full") >= smooth)
        .select(key, "day", "close", "pct_k", "pct_d")
    )


def obv(
    ohlcv_daily: DataFrame,
    key: str = "user_id",
) -> DataFrame:
    """On-balance volume over per-key daily candles, with the day's
    trade COUNT as the volume unit (integer-exact — no float
    accumulation, so the cumulative sum needs no rounding contract):
    +n on up days, −n on down days, 0 on flat/first days; OBV is the
    running total."""
    w_ord = Window.partitionBy(key).orderBy("day")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    prev_close = F.lag("close").over(w_ord)
    signed = (
        F.when(prev_close.isNull(), F.lit(0))
        .when(F.col("close") > prev_close, F.col("n_trades"))
        .when(F.col("close") < prev_close, -F.col("n_trades"))
        .otherwise(F.lit(0))
    )
    return (
        ohlcv_daily.withColumn("signed", signed)
        .withColumn("obv", F.sum("signed").over(w_cum))
        .select(key, "day", "close", "obv")
    )


def holt(
    daily: DataFrame,
    key: str = "user_id",
    alpha: float = 0.2,
    beta: float = 0.1,
    day_col: str = "day",
    price_col: str = "close",
) -> DataFrame:
    """Holt's linear-trend exponential smoothing per key — the
    third inherently-sequential recursion (a DOUBLE-state fold:
    level + trend), run exactly like ``ewma``/``rsi``:

        l_1 = x_1,  b_1 = 0
        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    and the one-step-ahead forecast ``fc_next = l_t + b_t`` (what the
    model predicts for tomorrow, the number a trading dashboard
    plots against the next candle). Daily closes are exact value
    SELECTIONS (max_by), and (1−α)/(1−β) are precomputed once and
    interpolated into the oracle with repr() — every fold step is
    then the same IEEE op sequence in both engines, so outputs are
    exact and unrounded.
    """
    a, bb = float(alpha), float(beta)
    oma, omb = 1.0 - a, 1.0 - bb
    cols = [key, day_col, price_col]
    out_schema = StructType(
        [daily.schema[c] for c in cols]
        + [
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("fc_next", DoubleType()),
        ]
    )

    def _fold_partition(pdfs):
        cur = object()
        lvl = trd = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            lvls, trds, fcs = [], [], []
            for k_val, x in zip(pdf[key], pdf[price_col]):
                x = float(x)
                if k_val != cur:
                    cur = k_val
                    lvl, trd = x, 0.0
                else:
                    prev = lvl
                    lvl = a * x + oma * (lvl + trd)
                    trd = bb * (lvl - prev) + omb * trd
                lvls.append(lvl)
                trds.append(trd)
                fcs.append(lvl + trd)
            pdf = pdf.copy()
            pdf["level"], pdf["trend"], pdf["fc_next"] = lvls, trds, fcs
            yield pdf[cols + ["level", "trend", "fc_next"]]

    return (
        daily.select(*cols)
        .repartition(key)
        .sortWithinPartitions(key, day_col)
        .mapInPandas(_fold_partition, schema=out_schema)
    )


def clamped_balance(
    deltas: DataFrame,
    key: str = "l_suppkey",
    seq_col: str = "month",
    delta_col: str = "delta",
    start: float = 250.0,
    cap: float = 500.0,
) -> DataFrame:
    """Capped running-balance ledger per key: fold
    ``bal_t = min(cap, max(0, bal_{t-1} + delta_t))`` over the key's
    seq order, with ``bal_0`` seeded from ``start + delta_1``. Emits
    every input row plus ``balance`` and a ``clamp`` flag (-1 the step
    hit the floor, +1 the ceiling, 0 in range) — the inventory /
    wallet / quota simulation a prefix-sum window cannot express
    because clamping destroys the prefix structure.

    Same execution shape as ``ewma``: ONE Arrow transfer per
    key-sorted partition (``mapInPandas`` with fold state carried
    across record batches), never per-key ``applyInPandas``. When the
    deltas sit on an integer grid (whole-unit quantities), every
    add/clamp is IEEE-exact, so a recursive-CTE oracle repeating the
    identical op order reproduces the fold bit-for-bit.

    Reference parity: the reference keeps running stock levels in
    Postgres application code (upserts per event); this is the
    engine-side, partition-parallel form.
    """
    cap_f, start_f = float(cap), float(start)
    cols = [f.name for f in deltas.schema.fields]
    out_schema = StructType(
        list(deltas.schema.fields)
        + [StructField("balance", DoubleType()),
           StructField("clamp", IntegerType())]
    )

    def _fold_partition(pdfs):
        cur = object()
        bal = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            bals, clamps = [], []
            for k_val, d in zip(pdf[key], pdf[delta_col]):
                prev = start_f if k_val != cur else bal
                cur = k_val
                raw = prev + float(d)
                if raw < 0.0:
                    bal, flag = 0.0, -1
                elif raw > cap_f:
                    bal, flag = cap_f, 1
                else:
                    bal, flag = raw, 0
                bals.append(bal)
                clamps.append(flag)
            pdf = pdf.copy()
            pdf["balance"], pdf["clamp"] = bals, clamps
            yield pdf[cols + ["balance", "clamp"]]

    return (
        deltas.select(*cols)
        .repartition(key)
        .sortWithinPartitions(key, seq_col)
        .mapInPandas(_fold_partition, schema=out_schema)
    )
