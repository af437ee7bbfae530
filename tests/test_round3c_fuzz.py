"""Seeded randomized equivalence: the round-3c operators (token entropy,
bigram LM, DSIR weights, epoch shuffle, best-copy dedup) vs brute-force
Python references on random corpora — one bulk DataFrame per operator so
the sweep stays fast."""

from __future__ import annotations

import hashlib
import math
import random
from collections import Counter

from pyspark.sql import Row
from pyspark.sql import functions as F

from access_log_parser_spark.operators.dedup import keep_best_duplicate
from access_log_parser_spark.operators.sampling import (
    dsir_logweights,
    epoch_shuffle,
)
from access_log_parser_spark.operators.text_quality import (
    bigram_logprob,
    token_entropy,
)


def _toks(s: str) -> list[str]:
    # engine convention: split of trimmed text; "" tokenizes to [""]
    return s.strip().split() if s.strip() else [""]


def _rand_corpus(rng: random.Random, n_docs: int, vocab: int,
                 max_len: int) -> dict[int, str]:
    words = [f"w{i}" for i in range(vocab)]
    out = {}
    for d in range(n_docs):
        n = rng.randint(0, max_len)
        out[d] = " ".join(rng.choice(words) for _ in range(n))
    return out


def test_token_entropy_fuzz(spark):
    rng = random.Random(7)
    corpus = _rand_corpus(rng, 80, 12, 40)
    df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in corpus.items()])
    got = {r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["entropy"])
           for r in token_entropy(df).collect()}
    for d, t in corpus.items():
        c = Counter(_toks(t))
        n = sum(c.values())
        h = round(math.log(n) - sum(v * math.log(v) for v in c.values()) / n, 4)
        assert got[d] == (n, len(c), h), d


def test_bigram_logprob_fuzz(spark):
    rng = random.Random(11)
    corpus = _rand_corpus(rng, 60, 8, 25)
    toks = {d: _toks(t) for d, t in corpus.items()}
    uni: Counter = Counter(t for ts in toks.values() for t in ts)
    T = sum(uni.values())
    bi: Counter = Counter(
        (ts[i - 1], ts[i]) for ts in toks.values() for i in range(1, len(ts))
    )
    lam = 0.7
    want = {}
    for d, ts in toks.items():
        lps = [math.log(uni[ts[0]] / T)]
        for i in range(1, len(ts)):
            p = (lam * bi[(ts[i - 1], ts[i])] / uni[ts[i - 1]]
                 + (1 - lam) * uni[ts[i]] / T)
            lps.append(math.log(p))
        want[d] = (len(ts), round(sum(lps) / len(lps), 4))
    df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in corpus.items()])
    got = {r["doc_id"]: (r["n_tokens"], r["mean_logprob"])
           for r in bigram_logprob(df).collect()}
    assert got == want


def test_dsir_logweights_fuzz(spark):
    rng = random.Random(13)
    raw = _rand_corpus(rng, 50, 15, 30)
    target = _rand_corpus(rng, 10, 6, 20)  # narrower vocab = a real target
    B, S = 128, 1.0

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B

    rc = Counter(bucket(t) for s in raw.values() for t in _toks(s))
    tc = Counter(bucket(t) for s in target.values() for t in _toks(s))
    tr, tt = sum(rc.values()), sum(tc.values())

    def lam(b: int) -> float:
        return (math.log((tc.get(b, 0) + S) / (tt + S * B))
                - math.log((rc.get(b, 0) + S) / (tr + S * B)))

    want = {d: (len(_toks(s)), round(sum(lam(bucket(t)) for t in _toks(s)), 4))
            for d, s in raw.items()}
    rdf = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in raw.items()])
    tdf = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in target.items()]
    )
    got = {r["doc_id"]: (r["n_tokens"], r["logweight"])
           for r in dsir_logweights(rdf, tdf, buckets=B).collect()}
    assert got == want


def test_epoch_shuffle_fuzz_multiple_epochs(spark):
    df = spark.createDataFrame([Row(doc_id=i) for i in range(120)])
    for epoch in (0, 5, 17):
        got = {r["doc_id"]: r["position"]
               for r in epoch_shuffle(df, epoch=epoch).collect()}
        order = sorted(
            range(120),
            key=lambda i: (hashlib.md5(f"{epoch}:{i}".encode()).hexdigest(), i),
        )
        assert got == {d: p + 1 for p, d in enumerate(order)}, epoch


def test_keep_best_duplicate_fuzz(spark):
    rng = random.Random(19)
    pool = [f"text variant {i} shared" for i in range(12)]  # forces dup groups
    rows = [
        Row(doc_id=d, text=rng.choice(pool), score=float(rng.randint(0, 5)))
        for d in range(100)
    ]
    df = spark.createDataFrame(rows)
    got = {(r["fp"], r["doc_id"], r["score"], r["n_dups"])
           for r in keep_best_duplicate(df, "score").collect()}

    def fp(t: str) -> str:
        norm = " ".join(t.strip().split()).lower()
        return hashlib.md5(norm.encode()).hexdigest()

    groups: dict[str, list[Row]] = {}
    for r in rows:
        groups.setdefault(fp(r["text"]), []).append(r)
    want = set()
    for f, members in groups.items():
        best = min(members, key=lambda r: (-r["score"], r["doc_id"]))
        want.add((f, best["doc_id"], best["score"], len(members)))
    assert got == want
