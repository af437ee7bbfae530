"""applyInPandasWithState sessionizer: state carries across micro-batches."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from access_log_parser_spark.streaming.stateful import (
    SESSION_OUTPUT_SCHEMA,
    make_sessionizer,
    sessionize_stream,
)


class FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def run_batches(batches, gap=1800):
    fn = make_sessionizer(gap)
    state = FakeState()
    out = []
    for b in batches:
        pdf = pd.DataFrame(b, columns=["event_id", "ts_epoch"])
        for res in fn((7,), iter([pdf]), state):
            out.extend(map(tuple, res.itertuples(index=False)))
    return out, state._v


def test_sessionizer_logic_single_batch():
    out, st = run_batches([[(1, 0), (2, 100), (3, 5000)]])
    # events 1,2 in session 1; event 3 opens session 2 (gap > 1800)
    assert (7, 1, 2, 1, 2) in out
    assert (7, 2, 1, 3, 3) in out
    assert st[1] == 2  # session counter persisted


def test_sessionizer_state_across_batches():
    out1, _ = run_batches([[(1, 0)]])
    # same state object continues in batch 2
    fn = make_sessionizer(1800)
    state = FakeState()
    for b in ([[(1, 0)]], [[(2, 100), (3, 9000)]]):
        pdf = pd.DataFrame(b[0], columns=["event_id", "ts_epoch"])
        rows = []
        for res in fn((7,), iter([pdf]), state):
            rows.extend(map(tuple, res.itertuples(index=False)))
    # batch 2: event 2 continues session 1 (n_events=2), event 3 opens s2
    assert (7, 1, 2, 1, 2) in rows
    assert (7, 2, 1, 3, 3) in rows


def test_sessionize_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    ev = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:00"), (1, 11, "2024-01-01 00:10:00"),
         (1, 12, "2024-01-01 02:00:00"), (2, 20, "2024-01-01 00:00:00")],
        "user_id long, event_id long, ts string",
    ).select("user_id", "event_id", F.to_timestamp("ts").alias("ts"))
    ev.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)

    # update-mode stateful output -> file sink via foreachBatch
    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_no"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert (1, 1, 2) in got       # events 10,11 in one session
    assert (1, 2, 1) in got       # event 12 after 2h gap
    assert (2, 1, 1) in got


class _FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_rate_anomaly_logic_unit():
    """EWMA spike detector: warmup never flags; a 10x spike after stable
    history flags; recovery to normal rate does not re-flag once EWMA
    re-adapts."""
    import pandas as pd

    from access_log_parser_spark.streaming import make_rate_anomaly

    fn = make_rate_anomaly(alpha=0.5, threshold=3.0, warmup=2)
    state = _FakeState()

    def feed(n):
        (out,) = list(fn(("srcA",), iter([pd.DataFrame({"x": range(n)})]), state))
        return bool(out["is_anomaly"][0]), float(out["ewma_before"][0])

    assert feed(100) == (False, 0.0)       # batch 0: warmup
    assert feed(100)[0] is False           # batch 1: warmup
    assert feed(100)[0] is False           # stable
    flagged, ewma = feed(1000)             # 10x spike
    assert flagged and abs(ewma - 100.0) < 1e-6
    assert feed(5)[0] is True              # collapse is also anomalous


def test_rate_anomaly_stream_end_to_end(spark, tmp_path):
    """Two micro-batches through a real stream: state carries across
    batches (second batch sees the first's EWMA)."""
    import pandas as pd

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from access_log_parser_spark.streaming import rate_anomaly_stream

    schema = StructType(
        [StructField("source", StringType()), StructField("line_no", LongType())]
    )
    src_dir = str(tmp_path / "anom_src")
    out_dir = str(tmp_path / "anom_out")
    ckpt = str(tmp_path / "anom_ckpt")

    def write_batch(n, suffix):
        df = spark.createDataFrame(
            [("s1", i) for i in range(n)], schema
        )
        df.write.mode("append").parquet(src_dir)

    write_batch(50, "a")
    stream = spark.readStream.schema(schema).parquet(src_dir).select("source", "line_no")
    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        rate_anomaly_stream(stream, warmup=0)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    write_batch(50, "b")
    q2 = (
        rate_anomaly_stream(stream, warmup=0)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    rows = sorted(
        spark.read.parquet(out_dir).collect(), key=lambda r: r["ewma_before"]
    )
    assert len(rows) == 2
    assert rows[0]["ewma_before"] == 0.0       # first batch: no history
    assert rows[1]["ewma_before"] == 50.0      # state carried across batches


def test_rate_anomaly_batch_twin_matches_streaming_logic(spark):
    """The batch twin must replay EXACTLY what the streaming state op
    computes when fed the same per-batch counts in the same order —
    ewma_before bit-identical, flags identical."""
    import pandas as pd

    from access_log_parser_spark.streaming import make_rate_anomaly
    from access_log_parser_spark.streaming.anomaly import rate_anomaly_batch

    counts = [7, 9, 8, 80, 8, 8, 1]
    fn = make_rate_anomaly(alpha=0.3, threshold=3.0, warmup=2)
    state = _FakeState()
    want = []
    for i, c in enumerate(counts):
        (out,) = list(fn(("s",), iter([pd.DataFrame({"x": range(c)})]), state))
        want.append((f"b{i}", c, float(out["ewma_before"][0]), bool(out["is_anomaly"][0])))

    df = spark.createDataFrame(
        [("s", f"b{i}", c) for i, c in enumerate(counts)],
        "source string, batch_ord string, batch_count long",
    )
    got = [
        (r["batch_ord"], r["batch_count"], r["ewma_before"], r["is_anomaly"])
        for r in rate_anomaly_batch(df).orderBy("batch_ord").collect()
    ]
    assert got == want
    assert any(f for _, _, _, f in got)  # the spike and the collapse flag
