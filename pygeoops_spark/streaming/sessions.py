"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState.

The batch engine sessionizes with a window lag + cumulative sum
(text/pipeline.py). On an unbounded stream that is not expressible as
a windowed aggregate — a session only closes when the NEXT event (or
an idle timeout) reveals the gap — so this is the engine's genuine
arbitrary-stateful operator: per-user GroupState holds the open
session (start, last_ts, n_events); each micro-batch folds its events
in event-time order, emitting every session the gap rule closes;
a processing-time timeout flushes sessions idle past the gap.

Scale shape: state is O(active users) and keyed by user_id (the same
shuffle key as the batch sessionizer), events stream through Arrow
batches — no per-row Python.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — pandas_udf/applyInPandas type hints

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start", TimestampType()),
        StructField("last", TimestampType()),
        StructField("n", LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    idle_flush_ms: int = 30_000,
) -> DataFrame:
    """Closed sessions per user: (user_id, session_start, session_end,
    n_events). A session closes when the next event arrives more than
    gap_seconds later, or when the user goes idle for `idle_flush_ms`
    processing time (the stream analog of end-of-input)."""

    def fold(key, pdfs, state: GroupState):
        import pandas as pdl

        user = int(key[0])
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pdl.DataFrame(
                {
                    "user_id": [user],
                    "session_start": [start],
                    "session_end": [last],
                    "n_events": [n],
                }
            )
            return
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(pdl.to_datetime(pdf[ts_col]).tolist())
        ts_all.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        closed = []
        for ts in ts_all:
            if last is not None and (ts - last).total_seconds() > gap_seconds:
                closed.append((user, start, last, n))
                start, last, n = None, None, 0
            if start is None:
                start, last = ts, ts
            else:
                # cross-batch late arrivals merge into the OPEN session
                # (min/max, never regressing session_end — an event
                # older than an already-closed session cannot reopen
                # it; that is the watermark-less late-data policy)
                start = min(start, ts)
                last = max(last, ts)
            n += 1
        state.update((start, last, n))
        state.setTimeoutDuration(idle_flush_ms)
        yield pdl.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events"]
        )

    return events.groupBy(user_col).applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
