"""Winnowing document fingerprints (Schleimer et al. 2003).

Pins: (1) the closed-form polynomial k-gram hash equals the literal
Karp-Rabin rolling recurrence; (2) the Spark chain equals an independent
pure-Python reference winnower on seeded fuzz corpora (tokenize, 32-bit
md5 codes, base-33 polynomial, rightmost-min window rule); (3) the
paper's guarantee — any shared token run of length >= w + k - 1 yields a
shared fingerprint; (4) edge cases (NULL text, < k tokens, < w grams);
(5) overlap pair detection with the document-frequency cap.
"""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from access_log_parser_spark.operators import fingerprint as fpm

K, W, B = fpm.KGRAM_K, fpm.WINNOW_W, fpm.POLY_B


# --- independent pure-Python reference ---

def _ref_codes(text: str) -> list[int]:
    toks = [t for t in text.strip().lower().split() if t]
    return [
        int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) for t in toks
    ]


def _ref_grams(codes: list[int], k: int = K, b: int = B) -> list[int]:
    out = []
    for i in range(len(codes) - k + 1):
        g = 0
        for c in codes[i : i + k]:
            g = g * b + c
        out.append(g)
    return out


def _ref_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    grams = _ref_grams(_ref_codes(text), k)
    if not grams:
        return set()
    sel = set()
    for j in range(max(len(grams) - w + 1, 1)):
        sl = grams[j : j + w]
        mn = min(sl)
        # rightmost occurrence of the min (robust winnowing)
        rp = len(sl) - 1 - sl[::-1].index(mn)
        sel.add((j + rp + 1, mn))  # 1-based gram position
    return sel


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.doc_id, r.pos, r.fp)
        for r in fpm.winnow_fingerprints(df).collect()
    }


def test_rolling_equals_closed_form(spark):
    texts = [
        "a b c d e f g h i j",
        "one two three four five",  # exactly k tokens -> 1 gram
        "x y z w",  # k-1 tokens -> no grams
        "solo",
        "",
        "repeat repeat repeat repeat repeat repeat repeat",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    codes = fpm.token_codes(F.col("text"))
    got = df.select(
        fpm.kgram_hashes(codes).alias("a"),
        fpm.kgram_hashes_rolling(codes).alias("b"),
    ).collect()
    for r in got:
        assert r.a == r.b


def test_matches_python_reference_fuzz(spark):
    rng = random.Random(42)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "the"]
    rows = []
    for i in range(40):
        n = rng.randint(0, 30)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    got = _fps(spark, rows)
    want = {
        (i, pos, fp) for i, t in rows for (pos, fp) in _ref_winnow(t)
    }
    assert got == want


def test_shared_run_guarantee(spark):
    # any shared token run of >= w + k - 1 = 8 tokens must produce at
    # least one shared fingerprint hash (Schleimer et al., theorem 2)
    shared = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    rows = [
        (1, "aaa bbb ccc " + shared + " xxx yyy"),
        (2, "qqq www " + shared + " rrr sss ttt uuu"),
        (3, "totally different words with no common run at all here"),
    ]
    fps = _fps(spark, rows)
    h1 = {fp for (d, _, fp) in fps if d == 1}
    h2 = {fp for (d, _, fp) in fps if d == 2}
    h3 = {fp for (d, _, fp) in fps if d == 3}
    assert h1 & h2
    assert not (h1 & h3) and not (h2 & h3)


def test_edges(spark):
    rows = [
        (1, None),  # NULL -> no rows
        (2, "a b c d"),  # k-1 tokens -> no rows
        (3, "a b c d e"),  # exactly k -> 1 gram -> 1 fingerprint
        (4, "a b c d e f"),  # 2 grams < w -> single truncated window
    ]
    fps = _fps(spark, rows)
    by_doc = {d: [(p, f) for (dd, p, f) in fps if dd == d] for d in (1, 2, 3, 4)}
    assert by_doc[1] == [] and by_doc[2] == []
    assert len(by_doc[3]) == 1 and by_doc[3][0][0] == 1
    assert len(by_doc[4]) == 1  # one window over both grams
    assert {(p, f) for p, f in by_doc[4]} == _ref_winnow("a b c d e f")


def test_rightmost_min_tiebreak(spark):
    # identical tokens -> every gram hash equal -> min ties everywhere;
    # the rightmost rule must pick the LAST position in each window
    t = " ".join(["same"] * 12)  # 8 grams, 5 windows
    fps = _fps(spark, [(1, t)])
    want = {(1, p, f) for (p, f) in _ref_winnow(t)}
    assert fps == want
    # positions are the window-final gram indices w..m
    assert sorted(p for (_, p, _) in fps) == [4, 5, 6, 7, 8]


def test_overlap_pairs(spark):
    shared = "the quick brown fox jumps over the lazy dog again today"
    rows = [(i, f"filler{i} pad{i} " + shared + f" tail{i}") for i in (1, 2)]
    rows += [(3, "completely unrelated text body with many distinct words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = fpm.fingerprint_overlap(df, min_shared=1, max_df=50).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 2)}


def test_overlap_df_cap_drops_stop_fingerprints(spark):
    # a fingerprint present in MORE than max_df docs carries no signal:
    # with max_df=2 a 3-doc-ubiquitous span must produce no pairs
    shared = "common boilerplate navigation header repeated on every page x"
    rows = [(i, f"u{i} v{i} " + shared) for i in (1, 2, 3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = fpm.fingerprint_overlap(df, min_shared=1, max_df=2).collect()
    assert got == []
