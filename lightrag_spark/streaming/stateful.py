"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch variant (operators/datapipe.sessionize_events) is a lag+running-
sum window; on an unbounded stream the same semantics need per-key state:
each user's open session (start, last-event, count) lives in the state
store, a session CLOSES when a later event arrives more than ``gap`` after
the last one (emitting one output row), and an idle timeout flushes
sessions that never see another event.

This is the Structured-Streaming shape the north rule calls "custom
stateful operators": groupBy(key).applyInPandasWithState with an explicit
state schema, append output, processing-time timeouts.  State per key is a
fixed-width 4-tuple — memory is O(active users), never O(events).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_idx long, n_events long, "
    "start_epoch long, end_epoch long, closed_by string"
)
STATE_SCHEMA = "last_epoch long, session_idx long, n_events long, start_epoch long"


def _close_row(user_id, sidx, n, start, last, reason) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [int(user_id)],
            "session_idx": [int(sidx)],
            "n_events": [int(n)],
            "start_epoch": [int(start)],
            "end_epoch": [int(last)],
            "closed_by": [reason],
        }
    )


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """events stream (user_id, ts, ...) -> closed-session rows.

    A session row is emitted when (a) a later event opens a new session
    for the key (gap exceeded), or (b) the key's processing-time timeout
    fires with no new events.  The still-open session stays in state.
    Works on both streaming and batch DataFrames (batch: timeouts never
    fire, so only gap-closed sessions emit — the test covers both).
    """
    gap_sec = gap_minutes * 60

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            last, sidx, n, start = state.get
            state.remove()
            yield _close_row(user_id, sidx, n, start, last, "timeout")
            return

        if state.exists:
            last, sidx, n, start = state.get
        else:
            last, sidx, n, start = None, 0, 0, None

        epochs: list[int] = []
        for pdf in pdfs:
            epochs.extend(int(e) for e in pdf["_epoch"])
        epochs.sort()

        out: list[pd.DataFrame] = []
        for e in epochs:
            if last is None:
                sidx, n, start = sidx + 1, 1, e
            elif e - last > gap_sec:
                out.append(_close_row(user_id, sidx, n, start, last, "gap"))
                sidx, n, start = sidx + 1, 1, e
            else:
                n += 1
            last = e

        if last is not None:
            state.update((int(last), int(sidx), int(n), int(start)))
            state.setTimeoutDuration(gap_sec * 1000)
        yield from out

    prepared = events.select(
        F.col(user_col).alias("user_id"),
        F.unix_timestamp(F.col(ts_col).cast("timestamp")).alias("_epoch"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
