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


def ewma_step(
    ewma: float,
    n_batches: int,
    count: int,
    alpha: float,
    threshold: float,
    warmup: int,
) -> tuple[float, bool, float]:
    """One step of the anomaly recurrence, shared by the streaming state
    op and the batch twin (and mirrored by the recursive-CTE oracle):
    returns (ewma_before, is_anomaly, ewma_after). NOTE the ``(1 -
    alpha)`` form — the oracle must write ``(1 - 0.3)`` too, because the
    double ``1 - 0.3`` differs from the literal ``0.7`` in the last bit
    and the recurrence would drift."""
    is_anomaly = bool(
        n_batches >= warmup
        and ewma > 0
        and (count > threshold * ewma or count < ewma / threshold)
    )
    ewma_after = float(count) if n_batches == 0 else alpha * count + (1 - alpha) * ewma
    return float(ewma), is_anomaly, float(ewma_after)


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
        ewma_before, is_anomaly, ewma = ewma_step(
            ewma, n_batches, count, alpha, threshold, warmup
        )
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


BATCH_ANOMALY_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("batch_ord", StringType()),
        StructField("batch_count", LongType()),
        StructField("ewma_before", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)


def rate_anomaly_batch(
    counts,
    alpha: float = 0.3,
    threshold: float = 3.0,
    warmup: int = 2,
    source_col: str = "source",
    order_col: str = "batch_ord",
    count_col: str = "batch_count",
):
    """Batch twin of :func:`rate_anomaly_stream`: replays the SAME
    recurrence (:func:`ewma_step`) over a (source, batch_ord,
    batch_count) frame, batches ordered by ``order_col`` within each
    source. Equals the streaming op fed the same per-batch counts in the
    same order (test-pinned), and is SQL-expressible (recursive CTE), so
    the stateful operator's math gets an oracle. One shuffle on source;
    per-source work is a linear scan in one Arrow batch."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        # input arrives with the canonical (source, batch_ord, batch_count)
        # names — the caller's columns are renamed before the groupBy
        pdf = pdf.sort_values("batch_ord")
        rows = []
        ewma, n = 0.0, 0
        for _, r in pdf.iterrows():
            c = int(r["batch_count"])
            before, is_anom, ewma = ewma_step(ewma, n, c, alpha, threshold, warmup)
            n += 1
            rows.append((r["source"], r["batch_ord"], c, before, is_anom))
        return pd.DataFrame(
            rows,
            columns=["source", "batch_ord", "batch_count", "ewma_before", "is_anomaly"],
        )

    base = counts.select(
        counts[source_col].alias("source"),
        counts[order_col].alias("batch_ord"),
        counts[count_col].alias("batch_count"),
    )
    return base.groupBy("source").applyInPandas(run, BATCH_ANOMALY_SCHEMA)


def zscore_spikes(
    df,
    key_col: str = "key",
    bucket_col: str = "bucket",
    threshold: float = 3.0,
    min_buckets: int = 3,
):
    """Batch z-score spike detection per (key, time-bucket) — the
    global-statistics complement of the sequential EWMA detector above
    (:func:`rate_anomaly_batch` reacts online with warm-up bias; this
    one judges every bucket against the key's FULL history, the shape
    a daily batch audit over an access-log corpus wants).

    Counts per (key, bucket), then per-key moments computed from EXACT
    integer sums (n, sum c, sum c^2 — engine-portable: no float
    accumulation order to disagree on; the sample variance
    (s2 - s1^2/n)/(n-1) goes float only in the final expression):

        z = (c - mean) / sqrt(var)     (NULL when the key has fewer
                                        than ``min_buckets`` buckets or
                                        zero variance — flat history
                                        has no meaningful z)
        is_spike = z >= threshold      (one-sided: traffic SPIKES; dips
                                        are not spikes)

    Returns (key, bucket, c, mean, z, is_spike); mean/z rounded to 4 dp.

    Plan at 100 TB: ONE (key, bucket) count with map-side combine, ONE
    key-keyed aggregate over the (small) bucket-count table, broadcast
    of the per-key moments back onto it — nothing corpus-sized past the
    first count."""
    from pyspark.sql import functions as F

    counts = df.groupBy(
        F.col(key_col).alias("key"), F.col(bucket_col).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c"))
    moments = counts.groupBy("key").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("c").alias("_s1"),
        F.sum(F.col("c") * F.col("c")).alias("_s2"),
    )
    n, s1, s2 = F.col("_n"), F.col("_s1"), F.col("_s2")
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - 1)
    z = F.when(
        (n >= min_buckets) & (var > 0),
        (F.col("c") - mean) / F.sqrt(var),
    )
    return (
        counts.join(moments, "key")
        .select(
            "key",
            "bucket",
            "c",
            F.round(mean, 4).alias("mean"),
            F.round(z, 4).alias("z"),
            F.coalesce(z >= threshold, F.lit(False)).alias("is_spike"),
        )
    )
