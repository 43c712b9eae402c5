"""Custom stateful streaming operators (SURVEY.md §2.9 T6).

The reference's streaming path (Logstash) is stateless per event; state
only enters through windowed aggregation. This module adds the one
genuinely custom stateful operator a training-data event pipeline
needs — gap-based sessionization — as an ``applyInPandasWithState``
operator, the Spark-idiomatic escape hatch when ``window()`` can't
express the semantics (session length is data-dependent, not fixed).

Scale notes: state is per-key and O(1) per key (one open session
tuple); the shuffle is the groupBy on the session key, identical to
what any keyed stateful op pays. Arrow moves each key-batch into
pandas, so per-event Python overhead is amortized per batch, not paid
per row.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("session_value", DoubleType()),
    ]
)

# open-session state: (start_us, end_us, n_events, value_sum)
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 30,
    timeout: bool = False,
) -> DataFrame:
    """Split each key's event stream into sessions separated by more
    than ``gap_minutes`` of inactivity; emit a session row the moment a
    later event (possibly in a later micro-batch) proves it closed.

    The open session per key lives in Spark state across micro-batches.
    With ``timeout=True`` an open session is flushed once processing
    time exceeds the gap with no new events; otherwise open sessions
    close only when a late-enough event arrives (matching the batch
    form in queries_ext3.q_sessionization, which sees all data).
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def _fn(
        key: Tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def emit(rows: list[tuple[int, int, int, float]]) -> "pd.DataFrame":
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(rows),
                    "session_start": pd.to_datetime([r[0] for r in rows], unit="us"),
                    "session_end": pd.to_datetime([r[1] for r in rows], unit="us"),
                    "n_events": [r[2] for r in rows],
                    "session_value": [r[3] for r in rows],
                }
            )

        if state.hasTimedOut:
            start_us, end_us, n, total = state.get
            state.remove()
            yield emit([(start_us, end_us, n, total)])
            return

        batch = pd.concat(list(pdfs)).sort_values(ts_col)
        ts_us = batch[ts_col].astype("int64") // 1000
        values = batch[value_col].astype("float64")

        open_sess = list(state.get) if state.exists else None
        closed: list[tuple[int, int, int, float]] = []
        for t, v in zip(ts_us, values):
            if open_sess is None:
                open_sess = [t, t, 1, float(v)]
            elif t - open_sess[1] > gap_us:
                closed.append(tuple(open_sess))
                open_sess = [t, t, 1, float(v)]
            else:
                # late events inside the gap extend, never shrink
                open_sess[1] = max(open_sess[1], t)
                open_sess[2] += 1
                open_sess[3] += float(v)
        state.update(tuple(open_sess))
        if timeout:
            state.setTimeoutDuration(gap_minutes * 60 * 1000)
        if closed:
            yield emit(closed)

    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(key_col).applyInPandasWithState(
        _fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )
