"""Round-3 second-wave curation operators: per-host frequency cap,
encoding-noise signals, int8 embedding quantization, SemDedup,
cross-snapshot incremental dedup, CCNet perplexity buckets.

Each test checks semantics against a hand-computable or brute-force
reference; the cross-engine value checks live in the driver oracle
queries (__spark_entry__.py)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from access_log_parser_spark.operators.dedup import cross_snapshot_dedup
from access_log_parser_spark.operators.similarity import (
    quantize_embeddings,
    select_centroids_by_hash,
    semdedup,
)
from access_log_parser_spark.operators.text_quality import perplexity_buckets
from access_log_parser_spark.operators.webtext import (
    encoding_signals,
    host_frequency_cap,
)


# ---------------------------------------------------------------- host cap
def test_host_frequency_cap_caps_and_is_content_addressed(spark):
    rows = [Row(doc_id=i, source=f"h{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows)
    out = host_frequency_cap(df, "source", k=4).collect()
    by_host: dict[str, list[int]] = {}
    for r in out:
        by_host.setdefault(r["source"], []).append(r["doc_id"])
    assert all(len(v) <= 4 for v in by_host.values())
    # replay the md5 pick in python: first 4 ids per host by (md5(id), id)
    for h, ids in by_host.items():
        pool = [i for i in range(30) if f"h{i % 3}" == h]
        pool.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        assert sorted(ids) == sorted(pool[:4])


def test_host_frequency_cap_keeps_small_hosts_whole(spark):
    df = spark.createDataFrame([Row(doc_id=i, source="only") for i in range(3)])
    assert host_frequency_cap(df, "source", k=10).count() == 3


# ---------------------------------------------------------- encoding noise
def test_encoding_signals_counts_each_class(spark):
    clean = "a perfectly ordinary sentence with nothing wrong"
    dirty = "bad � stuff \x01\x02 and Ã© plus â€™ end"
    df = spark.createDataFrame(
        [Row(doc_id=0, text=clean), Row(doc_id=1, text=dirty),
         Row(doc_id=2, text=None)]
    )
    out = {r["doc_id"]: r for r in encoding_signals(df).collect()}
    assert (out[0]["n_replacement"], out[0]["n_control"], out[0]["n_mojibake"]) == (0, 0, 0)
    assert out[0]["enc_clean"] is True
    assert out[1]["n_replacement"] == 1
    assert out[1]["n_control"] == 2
    assert out[1]["n_mojibake"] == 2  # Ã© and â€™
    assert out[1]["enc_clean"] is False
    assert out[2]["enc_clean"] is True  # NULL text -> zero noise


def test_encoding_signals_mojibake_prefix_ordering(spark):
    # the bare 'â€' prefix must not shadow the longer digraphs:
    # one â€™ occurrence counts once, not twice
    df = spark.createDataFrame([Row(doc_id=0, text="xâ€™y")])
    r = encoding_signals(df).collect()[0]
    assert r["n_mojibake"] == 1


def test_encoding_signals_tab_newline_not_control(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="a\tb\nc\rd")])
    r = encoding_signals(df).collect()[0]
    assert r["n_control"] == 0 and r["enc_clean"] is True


# ------------------------------------------------------------ quantization
def test_quantize_embeddings_matches_numpy_reference(spark):
    vecs = [
        (0, [0.5, -1.0, 0.25, 0.0]),
        (1, [1e-3, 2e-3, -3e-3, 4e-3]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # all-zero edge
    ]
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in vecs],
        "vec_id long, embedding array<double>",
    )
    out = {r["id"]: r for r in quantize_embeddings(df).collect()}
    for i, v in vecs:
        amax = max(abs(x) for x in v)
        if amax == 0:
            assert out[i]["codes"] == [0, 0, 0, 0]
            assert out[i]["scale"] == 0.0
            continue
        expect = [math.floor(x * 127.0 / amax + 0.5) for x in v]
        assert out[i]["codes"] == expect
        assert abs(out[i]["scale"] - amax / 127.0) < 1e-15
        # reconstruction error bounded by half a step
        for c, x in zip(out[i]["codes"], v):
            assert abs(c * out[i]["scale"] - x) <= out[i]["scale"] / 2 + 1e-12
        assert max(abs(c) for c in out[i]["codes"]) == 127


# ---------------------------------------------------------------- semdedup
def test_semdedup_drops_only_within_cluster_near_dups(spark):
    # two well-separated directions; 10/20/30 are near-copies of 0,
    # 40 is the lone vector of the second direction
    base = [1.0, 0.0, 0.0, 0.0]
    other = [0.0, 1.0, 0.0, 0.0]
    rows = [
        Row(vec_id=0, embedding=base),
        Row(vec_id=10, embedding=[0.99, 0.01, 0.0, 0.0]),
        Row(vec_id=20, embedding=[0.98, -0.01, 0.0, 0.0]),
        Row(vec_id=30, embedding=base),
        Row(vec_id=40, embedding=other),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, base), (1, other)]
    kept = semdedup(df, cents, threshold=0.95)
    ids = sorted(r["id"] for r in kept.collect())
    assert ids == [0, 40]  # min-id owner survives per semantic group


def test_semdedup_threshold_gates_drops(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0]),
        Row(vec_id=1, embedding=[0.9, 0.45]),  # cos ~ 0.894
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, [1.0, 0.0])]
    assert semdedup(df, cents, threshold=0.95).count() == 2
    assert semdedup(df, cents, threshold=0.85).count() == 1


def test_select_centroids_by_hash_deterministic(spark, tmp_path):
    df = spark.range(0, 50).select(
        F.col("id").alias("vec_id"),
        F.array(F.col("id").cast("double"), F.lit(1.0)).alias("embedding"),
    )
    a = select_centroids_by_hash(df, 5)
    b = select_centroids_by_hash(df, 5)
    assert a == b and len(a) == 5
    expect = sorted(range(50), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:5]
    assert [cid for cid, _ in a] == expect


# ---------------------------------------------------- cross-snapshot dedup
def test_cross_snapshot_dedup_exact_and_near(spark):
    old = spark.createDataFrame(
        [
            Row(doc_id=0, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=1, text="completely different content about spark engines"),
        ]
    )
    new = spark.createDataFrame(
        [
            # exact re-crawl of old 0 (case/space normalize)
            Row(doc_id=100, text="The quick  brown fox jumps over the lazy dog today"),
            # near-dup of old 0: one token appended
            Row(doc_id=101, text="the quick brown fox jumps over the lazy dog today extra"),
            # genuinely new
            Row(doc_id=102, text="an entirely unrelated document about typhoons and maps"),
            # NULL text passes through
            Row(doc_id=103, text=None),
        ]
    )
    kept_near = sorted(
        r["doc_id"] for r in cross_snapshot_dedup(new, old).collect()
    )
    assert 100 not in kept_near          # exact dropped
    assert 101 not in kept_near          # near dropped via shared band
    assert 102 in kept_near and 103 in kept_near
    kept_exact = sorted(
        r["doc_id"] for r in cross_snapshot_dedup(new, old, near=False).collect()
    )
    assert kept_exact == [101, 102, 103]  # exact stage alone keeps the near-dup


def test_cross_snapshot_dedup_disjoint_snapshots_keep_everything(spark):
    old = spark.createDataFrame([Row(doc_id=0, text="alpha beta gamma delta epsilon zeta")])
    new = spark.createDataFrame([Row(doc_id=1, text="one two three four five six seven")])
    assert cross_snapshot_dedup(new, old).count() == 1


# ------------------------------------------------------ perplexity buckets
def test_perplexity_buckets_tiers_are_equal_frequency_per_key(spark):
    rows = []
    # src a: 9 docs of varying fluency (repeat common tokens vs rare ones)
    for i in range(9):
        rows.append(Row(doc_id=i, source="a",
                        text=("common " * (i + 1) + f"rare{i}").strip()))
    for i in range(9, 12):
        rows.append(Row(doc_id=i, source="b", text=f"only{i} token{i}"))
    df = spark.createDataFrame(rows)
    out = perplexity_buckets(df, key_col="source", n_buckets=3).collect()
    a = [r for r in out if r["source"] == "a"]
    b = [r for r in out if r["source"] == "b"]
    assert sorted(r["bucket"] for r in a) == [1, 1, 1, 2, 2, 2, 3, 3, 3]
    assert sorted(r["bucket"] for r in b) == [1, 2, 3]
    # head bucket holds the highest mean_logprob docs
    head = max(a, key=lambda r: r["mean_logprob"])
    assert head["bucket"] == 1


def test_perplexity_buckets_deterministic_tie_break(spark):
    # identical docs => identical scores; ntile order falls to doc_id
    df = spark.createDataFrame(
        [Row(doc_id=i, source="s", text="same text here") for i in range(4)]
    )
    out = {r["doc_id"]: r["bucket"] for r in perplexity_buckets(df, n_buckets=2).collect()}
    assert out == {0: 1, 1: 1, 2: 2, 3: 2}
