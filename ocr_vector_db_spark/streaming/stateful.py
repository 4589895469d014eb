"""Custom stateful streaming operator: per-user session tracking with
`applyInPandasWithState`.

The batch twin is inventory q30 (lag-gap sessionization); this is the
streaming form with explicit state: per user we keep (session_seq,
session_start, last_ts, n_events) in the state store, emit one row per
CLOSED session (gap > timeout), and use processing-time timeouts to flush
sessions that stop receiving events. State size is O(active users), not
O(events) — the property that makes it viable on an unbounded stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_seq", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
])

SESSION_STATE_SCHEMA = T.StructType([
    T.StructField("session_seq", T.LongType()),
    T.StructField("session_start", T.DoubleType()),   # epoch seconds
    T.StructField("last_ts", T.DoubleType()),
    T.StructField("n_events", T.LongType()),
])

GAP_SECONDS = 1800.0


def make_session_fn(register_timeout: bool):
    """Build the per-group state function. `register_timeout=True` arms a
    processing-time timer per group so idle users' open sessions flush after
    the gap (production mode); with False, open sessions simply stay in
    state until more data arrives — the right mode for availableNow /
    drive-to-completion batch tests, where registered timers keep the query
    from draining."""

    def _session_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key

        if register_timeout and state.hasTimedOut:
            if state.exists:
                seq, start, last, n = state.get
                state.remove()
                yield pd.DataFrame({
                    "user_id": [user_id], "session_seq": [seq], "n_events": [n],
                    "session_start": [pd.Timestamp(start, unit="s")],
                    "session_end": [pd.Timestamp(last, unit="s")],
                })
            return

        if state.exists:
            seq, start, last, n = state.get
        else:
            seq, start, last, n = 0, None, None, 0

        closed: list[tuple] = []
        for pdf in pdfs:
            for ts in sorted(pdf["ts"]):
                t = ts.timestamp()
                if last is not None and t - last > GAP_SECONDS:
                    closed.append((seq, start, last, n))
                    seq, start, n = seq + 1, t, 0
                if start is None:
                    start = t
                last = t
                n += 1

        state.update((seq, start, last, n))
        if register_timeout:
            state.setTimeoutDuration(int(GAP_SECONDS * 1000))
        if closed:
            yield pd.DataFrame({
                "user_id": [user_id] * len(closed),
                "session_seq": [c[0] for c in closed],
                "n_events": [c[3] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="s") for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="s") for c in closed],
            })

    return _session_fn


def sessionize_stream(events_stream: DataFrame, with_timeout: bool = False) -> DataFrame:
    """events stream (user_id, ts, ...) → closed-session rows."""
    return (
        events_stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(with_timeout),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if with_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
