"""Sequence packing (operators/packing.py): python recomputation of both
strategies + the invariants each one promises."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from access_log_parser_spark.operators.packing import pack_greedy, pack_streaming

DOCS = [(i, i % 3, 10 + (i * 7) % 90) for i in range(40)]  # (doc_id, shard, tokens)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "shard", "ws_tokens"])


def test_pack_streaming_matches_python(docs):
    out = {r["doc_id"]: r["pack_id"] for r in pack_streaming(
        docs, budget=100, shard_col="shard"
    ).collect()}
    want = {}
    for shard in {s for _, s, _ in DOCS}:
        cum = 0
        for doc, s, tok in sorted(DOCS):
            if s != shard:
                continue
            want[doc] = cum // 100
            cum += tok
    assert out == want


def test_pack_greedy_never_exceeds_budget(docs):
    rows = pack_greedy(docs, budget=100, shard_col="shard").collect()
    # no pack exceeds the budget (no single doc here exceeds it alone)
    assert all(r["pack_tokens"] <= 100 for r in rows)
    # exhaustive: every doc packed exactly once
    assert sorted(r["doc_id"] for r in rows) == [i for i, _, _ in DOCS]
    # python recomputation of the greedy reset
    want = {}
    for shard in {s for _, s, _ in DOCS}:
        pack, used = 0, 0
        for doc, s, tok in sorted(DOCS):
            if s != shard:
                continue
            if used and used + tok > 100:
                pack, used = pack + 1, 0
            used += tok
            want[doc] = (shard, pack)
    got = {r["doc_id"]: (r["shard"], r["pack_id"]) for r in rows}
    assert got == want


def test_streaming_overflow_bounded_by_one_doc(docs):
    """The streaming approximation can overflow a pack by at most the last
    document's tokens."""
    out = pack_streaming(docs, budget=100, shard_col="shard")
    totals = out.groupBy("shard", "pack_id").agg(
        F.sum("ws_tokens").alias("tot"), F.max("ws_tokens").alias("mx")
    )
    assert totals.filter(F.col("tot") - F.col("mx") >= 100).count() == 0
