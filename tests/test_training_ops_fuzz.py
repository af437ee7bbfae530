"""Seeded randomized equivalence: the round-3 training operators vs
brute-force Python references on random corpora — one bulk DataFrame per
operator (not one Spark job per example) so the sweep stays fast."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from access_log_parser_spark.operators.packing import chunk_documents
from access_log_parser_spark.operators.webtext import (
    luhn_valid_col,
    repeated_ngram_span_removal,
)


# --- brute-force references -------------------------------------------------


def _ref_span_removal(corpus: dict[int, str], n: int, min_docs: int):
    toks = {d: t.strip().split() if t.strip() else [""] for d, t in corpus.items()}
    # NOTE: split() on "" gives [] in Python but the engine's split of
    # trimmed "" gives [""]; the dict above pins the engine convention.
    owners: dict[tuple, set] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - n + 1):
            owners.setdefault(tuple(ts[i : i + n]), set()).add(d)
    out = {}
    for d, ts in toks.items():
        cov = set()
        for i in range(len(ts) - n + 1):
            if len(owners[tuple(ts[i : i + n])]) >= min_docs:
                cov.update(range(i, i + n))
        kept = [t for i, t in enumerate(ts) if i not in cov]
        out[d] = (len(ts), len(cov), " ".join(kept))
    return out


def _ref_luhn(d: str) -> bool:
    if len(d) < 13:
        return False
    total = 0
    for i, ch in enumerate(reversed(d), start=1):
        v = int(ch)
        if i % 2 == 0:
            v *= 2
            if v > 9:
                v -= 9
        total += v
    return total % 10 == 0


def _ref_chunks(text: str, c: int, s: int):
    ts = text.strip().split() if text.strip() else [""]
    n = len(ts)
    k = 1 if n <= c else -((n - c) // -s) + 1
    out = []
    for i in range(k):
        st = min(i * s, max(n - c, 0))
        out.append((i, st, ts[st : st + c]))
    return [(i, st, len(w), " ".join(w)) for i, st, w in out]


# --- sweeps -----------------------------------------------------------------


def test_span_removal_matches_bruteforce_random_corpora(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]  # small vocab => shared grams abound
    corpus = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))
        for d in range(60)
    }
    n, min_docs = 4, 2
    ref = _ref_span_removal(corpus, n, min_docs)
    df = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text"])
        for r in repeated_ngram_span_removal(df, n=n, min_docs=min_docs).collect()
    }
    assert got == ref


def test_span_removal_min_docs_three(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(6)]
    corpus = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 15)))
        for d in range(40)
    }
    ref = _ref_span_removal(corpus, 3, 3)
    df = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text"])
        for r in repeated_ngram_span_removal(df, n=3, min_docs=3).collect()
    }
    assert got == ref


def test_luhn_matches_reference_random_digit_strings(spark):
    rng = random.Random(3)
    cases = ["".join(rng.choice("0123456789") for _ in range(rng.randint(12, 20)))
             for _ in range(200)]
    df = spark.createDataFrame([(c,) for c in cases], ["d"])
    got = {r["d"]: r["ok"] for r in df.select("d", luhn_valid_col(F.col("d")).alias("ok")).collect()}
    for c in cases:
        assert got[c] == _ref_luhn(c), c


def test_chunking_matches_reference_random_docs(spark):
    rng = random.Random(19)
    params = [(8, 8), (8, 5), (16, 4), (5, 1)]
    docs = {d: " ".join(f"t{rng.randint(0, 9)}" for _ in range(rng.randint(0, 40)))
            for d in range(50)}
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    for c, s in params:
        ref = {
            (d, i): (st, ln, txt)
            for d, t in docs.items()
            for i, st, ln, txt in _ref_chunks(t, c, s)
        }
        got = {
            (r["doc_id"], r["chunk_id"]): (r["start_pos"], r["n_chunk_tokens"], r["chunk_text"])
            for r in chunk_documents(df, chunk_tokens=c, stride=s).collect()
        }
        assert got == ref, (c, s)
