"""Streaming per-host politeness rate limiter.

A polite crawler must space fetches per host (robots Crawl-delay /
default politeness) — and a crawler is a STREAMING system: fetch
requests arrive continuously, and whether a request is allowed depends
on when the host's last ALLOWED fetch happened, which is inherently
sequential state. That makes the operator window-inexpressible in batch
SQL (allowed(i) depends on the previous ALLOWED row, not the previous
row — a greedy scan), so it ships in two forms:

- :func:`rate_limit_batch` — the deterministic batch twin:
  ``applyInPandas`` per host runs the greedy scan (bounded by the
  host's request count in the planning window; a frontier shard, not
  the corpus). This is the oracle-gated form — DuckDB replays the
  greedy walk as a recursive CTE.
- :func:`rate_limit_stream` — the production form:
  ``applyInPandasWithState`` keyed by host; state is ONE long (epoch
  of the last allowed fetch), so the state store is O(hosts) no matter
  how long the stream runs. Replaying the same input through the
  stream (in event-time order across micro-batches) emits exactly the
  batch twin's rows — pinned by tests/test_round4.py.

Greedy semantics (pinned for both forms and the oracle): requests per
host are processed in (ts_epoch, url) order; the first request is
always allowed; a later request is allowed iff its ts_epoch is at
least ``delay_seconds`` after the last ALLOWED ts_epoch, and only
allowed requests advance the clock. Complements the batch planner
``webtext.fetch_schedule`` (which ASSIGNS times; this one GATES given
times).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RATE_OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("ts_epoch", LongType()),
        StructField("allowed", BooleanType()),
    ]
)

RATE_STATE_SCHEMA = StructType([StructField("last_ok", LongType())])


def _greedy(
    host: str,
    rows: pd.DataFrame,
    delay_seconds: int,
    last_ok: int | None,
) -> tuple[list[tuple], int | None]:
    """The shared greedy scan: returns (out_rows, new_last_ok)."""
    out = []
    rows = rows.sort_values(["ts_epoch", "url"])
    for ts, url in zip(rows["ts_epoch"], rows["url"]):
        ts = int(ts)
        ok = last_ok is None or ts >= last_ok + delay_seconds
        if ok:
            last_ok = ts
        out.append((host, str(url), ts, bool(ok)))
    return out, last_ok


def rate_limit_batch(
    df: DataFrame,
    delay_seconds: int,
    host_col: str = "host",
    url_col: str = "url",
    ts_col: str = "ts_epoch",
) -> DataFrame:
    """Batch twin: greedy per-host gate over (host, url, ts_epoch).

    Plan at 100 TB: ONE host-keyed shuffle; the per-group scan is
    Arrow-batched Python bounded by the host's request count in the
    planning window (a crawler plans per frontier shard, not per
    corpus). The scan is inherently sequential per host — this is the
    documented applyInPandas case, not an avoidable UDF."""
    prepared = df.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("ts_epoch"),
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        host = str(pdf["host"].iloc[0])
        out, _ = _greedy(host, pdf, delay_seconds, None)
        return pd.DataFrame(
            out, columns=["host", "url", "ts_epoch", "allowed"]
        )

    return prepared.groupBy("host").applyInPandas(run, RATE_OUTPUT_SCHEMA)


def make_rate_limiter(delay_seconds: int):
    """(key, pdf_iter, state) -> pdf_iter for applyInPandasWithState;
    factored out so tests can drive it with a fake state object."""
    from pyspark.sql.streaming.state import GroupState

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: "GroupState",
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        last_ok = state.get[0] if state.exists else None
        for pdf in pdfs:
            out, last_ok = _greedy(str(host), pdf, delay_seconds, last_ok)
            yield pd.DataFrame(
                out, columns=["host", "url", "ts_epoch", "allowed"]
            )
        state.update((last_ok,))

    return update


def rate_limit_stream(requests_stream, delay_seconds: int):
    """Streaming form: fetch-request stream (host, url, ts) ->
    per-request (host, url, ts_epoch, allowed). One shuffle on host;
    state is one long per host (O(hosts) state store)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepared = requests_stream.select(
        "host",
        "url",
        F.col("ts").cast("timestamp").cast("long").alias("ts_epoch"),
    )
    return prepared.groupBy("host").applyInPandasWithState(
        make_rate_limiter(delay_seconds),
        outputStructType=RATE_OUTPUT_SCHEMA,
        stateStructType=RATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
