"""Sampling + corpus-vocabulary operators (operators/sampling.py,
text_quality.vocab_topk / doc_frequency_idf).

Independent Python/numpy recomputation of every result (same md5-derived
bucket formula), plus the structural invariants the operators promise:
disjoint + exhaustive splits, stability under repartitioning, bounded
per-stratum output.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from access_log_parser_spark.operators.sampling import (
    hash_mod_sample,
    split_train_holdout,
    stratified_sample,
)
from access_log_parser_spark.operators.text_quality import (
    doc_frequency_idf,
    vocab_topk,
)

DOCS = [
    (i, f"the quick brown fox {i % 7} jumps over the lazy dog {i % 3}", f"src{i % 4}")
    for i in range(60)
]


def _bucket(key: int, buckets: int) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % buckets


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "source"])


def test_hash_mod_sample_matches_python(docs):
    got = sorted(r["doc_id"] for r in hash_mod_sample(docs, "doc_id", 5).collect())
    want = sorted(i for i, _, _ in DOCS if _bucket(i, 5) == 0)
    assert got == want
    assert 0 < len(got) < len(DOCS)


def test_hash_mod_sample_stable_under_repartition(docs):
    a = sorted(r["doc_id"] for r in hash_mod_sample(docs, "doc_id", 5).collect())
    b = sorted(
        r["doc_id"]
        for r in hash_mod_sample(docs.repartition(13), "doc_id", 5).collect()
    )
    assert a == b


def test_split_train_holdout_disjoint_exhaustive(docs):
    train, holdout = split_train_holdout(docs, "doc_id", 4, 1)
    tr = {r["doc_id"] for r in train.collect()}
    ho = {r["doc_id"] for r in holdout.collect()}
    assert tr.isdisjoint(ho)
    assert tr | ho == {i for i, _, _ in DOCS}
    assert ho == {i for i, _, _ in DOCS if _bucket(i, 4) == 1}


def test_stratified_sample_bounded_and_deterministic(docs):
    out = stratified_sample(docs, "source", "doc_id", 3).collect()
    per = Counter(r["source"] for r in out)
    assert all(v <= 3 for v in per.values())
    assert set(per) == {f"src{i}" for i in range(4)}
    # python recomputation: first 3 per stratum by (md5(id), id)
    want: dict[str, list[int]] = {}
    for i, _, src in DOCS:
        want.setdefault(src, []).append(i)
    expect = set()
    for src, ids in want.items():
        ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        expect |= {(src, i) for i in ranked[:3]}
    assert {(r["source"], r["doc_id"]) for r in out} == expect


def test_vocab_topk_counts(docs):
    out = vocab_topk(docs, k=5).collect()
    cnt = Counter()
    for _, text, _ in DOCS:
        cnt.update(text.split())
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["token"], r["freq"]) for r in out] == want


def test_doc_frequency_idf(docs):
    out = {r["token"]: (r["doc_freq"], r["idf"]) for r in doc_frequency_idf(
        docs, min_df=10
    ).collect()}
    dfreq = Counter()
    for _, text, _ in DOCS:
        dfreq.update(set(text.split()))
    want = {
        t: (n, round(math.log((len(DOCS) + 1) / (n + 1)), 6))
        for t, n in dfreq.items()
        if n >= 10
    }
    assert out == want
    assert out["the"][0] == 60  # every doc contains "the"


def test_vocab_topk_plan_has_partial_agg(docs):
    plan = vocab_topk(docs, k=5)._jdf.queryExecution().executedPlan().toString()
    # partial aggregation before the exchange => map-side combine at scale
    assert "partial_count" in plan or "HashAggregate" in plan


def test_write_training_shards(spark, tmp_path, docs):
    import os

    from access_log_parser_spark.sinks import write_training_shards

    out = str(tmp_path / "shards")
    sharded = write_training_shards(docs, out, key_col="doc_id", n_shards=4)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(4)]
    back = spark.read.parquet(out)
    assert back.count() == len(DOCS)
    # shard assignment matches the python bucket formula and is total
    got = {(r["doc_id"], r["shard"]) for r in back.select("doc_id", "shard").collect()}
    assert got == {(i, _bucket(i, 4)) for i, _, _ in DOCS}
