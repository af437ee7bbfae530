"""Hypothesis fuzz pins for the round-4b/4c math operators: the Spark
expression chains must agree with plain-python references on arbitrary
inputs, not just the crafted cases in test_round4b/4c. Collection is
batched per example set (one Spark job per property) to keep the suite
fast — strategies draw modest sizes."""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from access_log_parser_spark.operators import sre, sketches

FAST = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    ks=st.lists(
        st.tuples(st.integers(0, 40), st.integers(1, 40)).map(
            lambda t: (min(t[0], t[1]), max(t[1], 1))
        ),
        min_size=1,
        max_size=5,
    )
)
@FAST
def test_fuzz_wilson_matches_python(spark, ks):
    rows = []
    for i, (k, n) in enumerate(ks):
        key = f"k{i}"
        rows += [(key, 1)] * k + [(key, 0)] * (n - k)
    df = spark.createDataFrame(rows, "k string, err int")
    got = {
        r["k"]: (r["wilson_low"], r["wilson_high"])
        for r in sre.error_rate_wilson(df, "k", "err").collect()
    }
    z = 1.959963984540054
    for i, (k, n) in enumerate(ks):
        p = k / n
        z2 = z * z
        denom = 1.0 + z2 / n
        center = p + z2 / (2.0 * n)
        rad = z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
        lo = round(max(0.0, (center - rad) / denom), 6)
        hi = round(min(1.0, (center + rad) / denom), 6)
        assert got[f"k{i}"] == pytest.approx((lo, hi), abs=1e-9)


@given(
    lats=st.lists(
        st.floats(0.0, 100.0, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=30,
    ),
    t=st.floats(0.01, 10.0, allow_nan=False),
)
@FAST
def test_fuzz_apdex_matches_python(spark, lats, t):
    df = spark.createDataFrame([("a", v) for v in lats], "k string, lat double")
    r = sre.apdex(df, "k", "lat", t=t).collect()[0]
    sat = sum(1 for v in lats if v <= t)
    tol = sum(1 for v in lats if t < v <= 4 * t)
    assert (r["satisfied"], r["tolerating"], r["frustrated"]) == (
        sat, tol, len(lats) - sat - tol,
    )
    assert r["apdex"] == pytest.approx(
        round((sat + tol / 2.0) / len(lats), 6), abs=1e-9
    )


@given(
    n_shards=st.integers(2, 10),
    keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
)
@FAST
def test_fuzz_rendezvous_matches_python(spark, n_shards, keys):
    df = spark.createDataFrame([(i,) for i in keys], "key long")
    got = {
        r["shard"]: (r["n_keys"], r["n_moved_on_remove_last"])
        for r in sre.rendezvous_shards(df, "key", n_shards).collect()
    }

    def hrw(key: str, n: int) -> int:
        ds = [hashlib.md5(f"{key}:{s}".encode()).hexdigest() for s in range(n)]
        return ds.index(max(ds))

    want: dict[int, list[int]] = {}
    for i in keys:
        s = hrw(str(i), n_shards)
        w = want.setdefault(s, [0, 0])
        w[0] += 1
        w[1] += 1 if s != hrw(str(i), n_shards - 1) else 0
    assert got == {s: tuple(v) for s, v in want.items()}
    # HRW invariant regardless of draw: only the dropped shard's keys move
    for s, (n_keys, moved) in got.items():
        assert moved == (n_keys if s == n_shards - 1 else 0)


@given(
    toks=st.lists(
        st.sampled_from(["a", "b", "c", "dd", "ee", "ff", "gg", "hh"]),
        min_size=1,
        max_size=60,
    ),
    depth=st.integers(1, 4),
    width=st.integers(2, 16),
)
@FAST
def test_fuzz_cms_one_sided_and_exact_reference(spark, toks, depth, width):
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    rows = sketches.cms_vs_exact(df, "tok", depth=depth, width=width).collect()

    def h(r: int, t: str) -> int:
        return int(hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:8], 16) % width

    grid: dict[tuple[int, int], int] = {}
    for t in toks:
        for r in range(depth):
            key = (r, h(r, t))
            grid[key] = grid.get(key, 0) + 1
    for row in rows:
        want = min(grid[(r, h(r, row["item"]))] for r in range(depth))
        assert row["est"] == want
        assert row["est"] >= row["exact"]  # the one-sided CMS guarantee
        assert row["overshoot"] == row["est"] - row["exact"]


@given(
    texts=st.lists(
        st.text(
            alphabet="abcdefghij .!?\n",
            min_size=0,
            max_size=80,
        ),
        min_size=1,
        max_size=8,
    )
)
@FAST
def test_fuzz_readability_matches_python(spark, texts):
    import re as _re

    from access_log_parser_spark.operators.text_quality import readability

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["words"], r["sentences"], r["syllables"], r["flesch"])
        for r in readability(df).collect()
    }
    for i, t in enumerate(texts):
        words = len([w for w in _re.split(r"\s+", t) if w != ""])
        if words == 0:
            assert i not in got
            continue
        sentences = max(len(_re.findall(r"[.!?]+", t)), 1)
        syllables = len(_re.findall(r"[aeiouy]+", t.lower()))
        flesch = round(
            206.835 - 1.015 * (words / sentences) - 84.6 * (syllables / words),
            6,
        )
        assert got[i][:3] == (words, sentences, syllables)
        assert got[i][3] == pytest.approx(flesch, abs=1e-9)
