"""Custom stateful streaming operator: incremental sessionization.

``applyInPandasWithState`` keeps per-user session state (last event time,
session counter) across micro-batches — the custom-stateful-operator
pattern for telemetry pipelines (SURVEY.md §2.5 notes the reference has no
state at all; this is the graft's streaming extension).

State: (last_ts_epoch, session_no, n_events_in_session). A new session
starts when the gap to the previous event exceeds ``gap_seconds``.
Emits one row per (user, closed-or-updated session) per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_no", LongType()),
        StructField("n_events", LongType()),
        StructField("first_event", LongType()),
        StructField("last_event", LongType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("session_no", LongType()),
        StructField("n_events", LongType()),
        StructField("first_event", LongType()),
        StructField("last_event", LongType()),
    ]
)


def make_sessionizer(gap_seconds: int = 1800):
    """Returns the (key, pdf_iter, state) -> pdf_iter function for
    ``applyInPandasWithState``; factored out so batch tests can call it
    with a fake state object."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts, session_no, n_events, first_ev, last_ev = state.get
        else:
            last_ts, session_no, n_events, first_ev, last_ev = None, 0, 0, None, None

        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_epoch", "event_id"])
            for ts, eid in zip(pdf["ts_epoch"], pdf["event_id"]):
                ts = int(ts)
                eid = int(eid)
                if last_ts is None or ts - last_ts > gap_seconds:
                    if n_events:
                        out_rows.append(
                            (user_id, session_no, n_events, first_ev, last_ev)
                        )
                    session_no += 1
                    n_events = 0
                    first_ev = eid
                last_ts = ts
                last_ev = eid
                n_events += 1
        # emit the (possibly still-open) current session's running snapshot
        if n_events:
            out_rows.append((user_id, session_no, n_events, first_ev, last_ev))
        state.update((last_ts, session_no, n_events, first_ev, last_ev))
        yield pd.DataFrame(
            out_rows,
            columns=["user_id", "session_no", "n_events", "first_event", "last_event"],
        )

    return update


def sessionize_stream(events_stream, gap_seconds: int = 1800):
    """events stream (user_id, event_id, ts) -> per-session updates.

    ``ts`` is converted to epoch seconds JVM-side; grouping shuffles on
    user_id once; state lives in the state store, sized O(users)."""
    from pyspark.sql import functions as F

    prepared = events_stream.select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").cast("long").alias("ts_epoch"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_seconds),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
