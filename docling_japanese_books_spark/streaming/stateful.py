"""Custom stateful streaming operator via applyInPandasWithState:
gap-based sessionization that carries open sessions across micro-batches.

The batch sessionization query (analytics_queries.events_sessionization)
needs the whole history in one window pass; a stream can't. Here the open
session per user lives in GroupState: each micro-batch appends its events,
CLOSED sessions (gap exceeded) are emitted downstream, and the still-open
tail survives to the next batch. State is bounded: one row per active user.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), False),
    ]
)

STATE_SCHEMA = "session_start timestamp, last_ts timestamp, n_events long, sum_value double"


def _sessionize_group(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
    gap_seconds: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    events = pd.concat(list(batches), ignore_index=True).sort_values(
        ["ts", "event_id"]
    )

    if state.exists:
        session_start, last_ts, n_events, sum_value = state.get
    else:
        session_start = last_ts = None
        n_events, sum_value = 0, 0.0

    closed = []
    for ts, value in zip(events["ts"], events["value"]):
        ts = ts.to_pydatetime()
        if last_ts is not None and (ts - last_ts).total_seconds() > gap_seconds:
            closed.append((user_id, session_start, last_ts, n_events, sum_value))
            session_start, n_events, sum_value = ts, 0, 0.0
        if session_start is None:
            session_start = ts
        last_ts = ts
        n_events += 1
        sum_value += float(value)

    state.update((session_start, last_ts, n_events, sum_value))
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
        )


def stateful_sessionize(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """events(user_id, event_id, ts, value) stream -> closed sessions.

    Scale: state shuffles on user_id once; per-group memory is O(1)
    (four scalars), so a billion active users is a storage question, not
    an operator question."""

    def fn(key, pdf_iter, state):
        return _sessionize_group(key, pdf_iter, state, gap_seconds)

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
