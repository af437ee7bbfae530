"""Custom stateful streaming operator #2: per-source rate anomaly
detection with EWMA state.

Telemetry pipelines watch per-source request rates; an anomaly is a
micro-batch whose event count deviates from the source's smoothed history
by more than ``threshold`` times. ``applyInPandasWithState`` holds
(ewma_rate, n_batches) per source across micro-batches — numeric
streaming state, complementing the sessionizer's window state (SURVEY.md
§2.5: the reference has no state at all; both operators are graft
extensions).

Deterministic integer-free math: EWMA in float with fixed alpha; the
first ``warmup`` batches never flag (no history yet).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ANOMALY_OUTPUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("batch_count", LongType()),
        StructField("ewma_before", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)

ANOMALY_STATE_SCHEMA = StructType(
    [
        StructField("ewma", DoubleType()),
        StructField("n_batches", LongType()),
    ]
)


def make_rate_anomaly(alpha: float = 0.3, threshold: float = 3.0, warmup: int = 2):
    """(key, pdf_iter, state) -> pdf_iter for ``applyInPandasWithState``.

    Each micro-batch contributes ONE observation per source (its row
    count); the state is the EWMA of those counts. A batch is anomalous
    when count > threshold * ewma or count < ewma / threshold, after
    ``warmup`` batches of history.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.exists:
            ewma, n_batches = state.get
        else:
            ewma, n_batches = 0.0, 0
        count = sum(len(pdf) for pdf in pdfs)
        is_anomaly = bool(
            n_batches >= warmup
            and ewma > 0
            and (count > threshold * ewma or count < ewma / threshold)
        )
        ewma_before = float(ewma)
        ewma = float(count) if n_batches == 0 else alpha * count + (1 - alpha) * ewma
        state.update((float(ewma), n_batches + 1))
        yield pd.DataFrame(
            [(source, count, ewma_before, is_anomaly)],
            columns=["source", "batch_count", "ewma_before", "is_anomaly"],
        )

    return update


def rate_anomaly_stream(
    lines_stream,
    alpha: float = 0.3,
    threshold: float = 3.0,
    warmup: int = 2,
    source_col: str = "source",
):
    """lines stream -> one (source, batch_count, ewma_before, is_anomaly)
    row per source per micro-batch. Shuffles once on source; state is
    O(sources) — two doubles per key, bounded regardless of line volume."""
    return lines_stream.groupBy(source_col).applyInPandasWithState(
        make_rate_anomaly(alpha, threshold, warmup),
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
