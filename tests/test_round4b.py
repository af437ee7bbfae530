"""Round-4b SRE/analytics operators: python-replay pins and property
checks for operators/sre.py, operators/sketches.py, the utm/readability
additions. Each test builds a small crafted frame where the expected
output is hand-computable (or replayed with a pure-python reference) —
the driver-oracle pair covers the synthetic-corpus scale; these pin the
semantics on adversarial edges."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest
from pyspark.sql import functions as F

from access_log_parser_spark.operators import sre, sketches


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------- latency

def test_latency_percentiles_match_numpy(spark):
    import numpy as np

    vals = [0.01, 0.02, 0.05, 0.10, 0.10, 0.30, 0.90, 1.50]
    df = spark.createDataFrame([("a", v) for v in vals], "k string, lat double")
    row = sre.latency_percentiles(df, "k", "lat").collect()[0]
    for p, col in [(50, "p50"), (90, "p90"), (99, "p99")]:
        want = round(float(np.percentile(vals, p)), 6)  # linear interpolation
        assert row[col] == pytest.approx(want, abs=1e-9), col
    assert row["n"] == len(vals)


def test_latency_percentiles_approx_close(spark):
    vals = [float(i) for i in range(1, 1001)]
    df = spark.createDataFrame([("a", v) for v in vals], "k string, lat double")
    row = sre.latency_percentiles(df, "k", "lat", exact=False).collect()[0]
    # approx_percentile at accuracy 10000 is exact-rank on 1000 rows
    assert abs(row["p50"] - 500.0) <= 1.0
    assert abs(row["p99"] - 990.0) <= 2.0


# ------------------------------------------------------------------ apdex

def test_apdex_classes_and_score(spark):
    # T=1.0: satisfied <=1, tolerating (1,4], frustrated >4
    rows = [("a", 0.5), ("a", 1.0), ("a", 2.0), ("a", 4.0), ("a", 9.0)]
    df = spark.createDataFrame(rows, "k string, lat double")
    r = sre.apdex(df, "k", "lat", t=1.0).collect()[0]
    assert (r["satisfied"], r["tolerating"], r["frustrated"]) == (2, 2, 1)
    assert r["apdex"] == pytest.approx((2 + 2 / 2) / 5, abs=1e-9)


# ----------------------------------------------------------------- wilson

def _wilson_ref(k: int, n: int, z: float = 1.959963984540054):
    p = k / n
    z2 = z * z
    denom = 1.0 + z2 / n
    center = p + z2 / (2.0 * n)
    rad = z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
    return (
        max(0.0, (center - rad) / denom),
        min(1.0, (center + rad) / denom),
    )


@pytest.mark.parametrize("k,n", [(0, 10), (10, 10), (3, 7), (1, 1000)])
def test_wilson_matches_reference(spark, k, n):
    rows = [("e", 1)] * k + [("e", 0)] * (n - k)
    df = spark.createDataFrame(rows, "k string, err int")
    r = sre.error_rate_wilson(df, "k", "err").collect()[0]
    lo, hi = _wilson_ref(k, n)
    assert r["n"] == n and r["errors"] == k
    assert r["wilson_low"] == pytest.approx(round(lo, 6), abs=1e-9)
    assert r["wilson_high"] == pytest.approx(round(hi, 6), abs=1e-9)
    # the interval brackets the point estimate
    assert r["wilson_low"] <= r["rate"] <= r["wilson_high"]


def test_wilson_low_needs_evidence(spark):
    """Same 50% rate: 2/4 has a far lower bound than 50/100 — the
    reason to alert on the bound, not the rate."""
    small = spark.createDataFrame(
        [("s", 1)] * 2 + [("s", 0)] * 2, "k string, err int"
    )
    big = spark.createDataFrame(
        [("b", 1)] * 50 + [("b", 0)] * 50, "k string, err int"
    )
    lo_small = sre.error_rate_wilson(small, "k", "err").collect()[0]["wilson_low"]
    lo_big = sre.error_rate_wilson(big, "k", "err").collect()[0]["wilson_low"]
    assert lo_small < lo_big


# --------------------------------------------------------------- slo burn

def test_slo_burn_multiwindow_gate(spark):
    """A spike confined to one fast bucket alerts only when the slow
    window ALSO exceeds its threshold."""
    base = _ts("2024-01-01T00:00:00")
    rows = []
    # 4 fast buckets (6 h) in one slow day: bucket 0 is a total outage,
    # buckets 1-3 are clean, 100 requests each.
    for b in range(4):
        t0 = base + dt.timedelta(hours=6 * b)
        for i in range(100):
            rows.append((t0 + dt.timedelta(seconds=i), 1 if b == 0 else 0))
    df = spark.createDataFrame(rows, "ts timestamp, err int")
    out = {
        r["bucket"]: r
        for r in sre.slo_burn(
            df, "ts", "err", slo=0.99, fast_hours=6, slow_hours=24
        ).collect()
    }
    assert len(out) == 4
    spike = out[base]
    assert spike["fast_burn"] == pytest.approx(100.0, rel=1e-6)
    # slow burn = 25% errors / 1% budget = 25 > 1 -> alert fires
    assert spike["alert"] is True
    clean = out[base + dt.timedelta(hours=6)]
    assert clean["fast_burn"] == 0.0 and clean["alert"] is False


def test_slo_burn_rejects_non_multiple():
    with pytest.raises(ValueError):
        sre.slo_burn(None, "ts", "err", fast_hours=5, slow_hours=24)


# ------------------------------------------------------------ cache report

def test_cache_report_refreshhit_counts_as_hit(spark):
    rows = [
        ("d1", "Hit", 100),
        ("d1", "RefreshHit", 50),
        ("d1", "Miss", 30),
        ("d1", "Error", 0),
    ]
    df = spark.createDataFrame(rows, "h string, rt string, b long")
    r = sre.cache_report(df, "h", "rt", "b").collect()[0]
    assert r["requests"] == 4 and r["hits"] == 2
    assert r["hit_ratio"] == pytest.approx(0.5)
    assert r["bytes_total"] == 180 and r["bytes_from_cache"] == 150


# ------------------------------------------------------------- transitions

def test_session_transitions_pairs_and_tiebreak(spark):
    base = _ts("2024-01-01T00:00:00")
    rows = [
        (1, base, "a"),
        (1, base + dt.timedelta(seconds=1), "b"),
        (1, base + dt.timedelta(seconds=2), "a"),
        (2, base, "a"),
        (2, base + dt.timedelta(seconds=1), "b"),
        # user 3: two events at the SAME ts -> page tiebreak orders (a, b)
        (3, base, "b"),
        (3, base, "a"),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, page string")
    got = {
        (r["prev_page"], r["page"]): r["n_transitions"]
        for r in sre.session_transitions(df, "u", "ts", "page").collect()
    }
    assert got == {("a", "b"): 3, ("b", "a"): 1}


# ------------------------------------------------------------------- gaps

def test_gap_windows_thresholds(spark):
    base = _ts("2024-01-01T00:00:00")
    rows = [
        ("s", base),
        ("s", base + dt.timedelta(seconds=100)),     # gap 100 — below
        ("s", base + dt.timedelta(seconds=4100)),    # gap 4000 — reported
        ("t", base),                                  # single event: no gap
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = sre.gap_windows(df, "k", "ts", min_gap_s=3600).collect()
    assert len(out) == 1
    g = out[0]
    assert g["k"] == "s" and g["gap_s"] == 4000
    assert g["gap_start"] == base + dt.timedelta(seconds=100)
    assert g["gap_end"] == base + dt.timedelta(seconds=4100)


# -------------------------------------------------------------- retention

def test_retention_cohorts_offsets(spark):
    rows = [
        (1, _ts("2024-01-01T05:00:00")),
        (1, _ts("2024-01-01T09:00:00")),  # same day: one activity row
        (1, _ts("2024-01-03T00:00:00")),  # offset 2
        (2, _ts("2024-01-02T00:00:00")),  # cohort Jan 2
        (2, _ts("2024-01-03T00:00:00")),  # offset 1
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {
        (r["cohort_day"].date().isoformat(), r["day_offset"]): r["n_users"]
        for r in sre.retention_cohorts(df, "u", "ts").collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-02", 1): 1,
    }


# ------------------------------------------------------------- rendezvous

def _hrw_ref(key: str, n: int) -> int:
    digests = [hashlib.md5(f"{key}:{s}".encode()).hexdigest() for s in range(n)]
    return digests.index(max(digests))


def test_rendezvous_matches_python_and_stability(spark):
    n = 5
    df = spark.createDataFrame([(i,) for i in range(300)], "key long")
    got = {
        r["shard"]: (r["n_keys"], r["n_moved_on_remove_last"])
        for r in sre.rendezvous_shards(df, "key", n).collect()
    }
    # python replay of the same assignment
    ref: dict[int, int] = {}
    moved: dict[int, int] = {}
    for i in range(300):
        s = _hrw_ref(str(i), n)
        ref[s] = ref.get(s, 0) + 1
        moved[s] = moved.get(s, 0) + (1 if s != _hrw_ref(str(i), n - 1) else 0)
    assert {k: v[0] for k, v in got.items()} == ref
    # HRW: only the dropped shard's keys move
    for s, (n_keys, n_moved) in got.items():
        assert n_moved == (n_keys if s == n - 1 else 0)


# -------------------------------------------------------------------- cms

def test_cms_one_sided_and_exact_when_wide(spark):
    rows = [("w%d" % (i % 7),) for i in range(70)]
    df = spark.createDataFrame(rows, "tok string")
    # wide grid: no collisions -> est == exact everywhere
    wide = sketches.cms_vs_exact(df, "tok", depth=4, width=4096).collect()
    assert all(r["overshoot"] == 0 for r in wide)
    # brutally narrow grid: estimates never undershoot
    narrow = sketches.cms_vs_exact(df, "tok", depth=2, width=2).collect()
    assert all(r["est"] >= r["exact"] for r in narrow)
    assert {r["item"] for r in narrow} == {"w%d" % i for i in range(7)}


def test_cms_matches_python_reference(spark):
    toks = ["a", "b", "a", "c", "a", "b", "d", "d", "d", "d"]
    d, w = 3, 4
    df = spark.createDataFrame([(t,) for t in toks], "tok string")

    def h(r: int, t: str) -> int:
        return int(hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:8], 16) % w

    grid: dict[tuple[int, int], int] = {}
    for t in toks:
        for r in range(d):
            key = (r, h(r, t))
            grid[key] = grid.get(key, 0) + 1
    want = {
        t: min(grid[(r, h(r, t))] for r in range(d)) for t in set(toks)
    }
    got = {
        r["item"]: r["est"]
        for r in sketches.cms_vs_exact(df, "tok", depth=d, width=w).collect()
    }
    assert got == want


# -------------------------------------------------------------------- utm

def test_utm_attribution_grammar(spark):
    from access_log_parser_spark.operators.referrers import utm_attribution

    rows = [
        ("/p?utm_source=News+Letter&utm_medium=Email&utm_campaign=C1",),
        ("/p?utm_source=News+Letter&utm_medium=Email&utm_campaign=C1",),
        ("/p?utm_source=ads",),               # medium/campaign -> '-'
        ("/p?other=1",),                       # untagged: drops
        ("/p",),                               # untagged: drops
        ("/p?utm_source=&utm_medium=cpc",),    # empty source -> '-'
    ]
    df = spark.createDataFrame(rows, "request_uri string")
    got = {
        (r["utm_source"], r["utm_medium"], r["utm_campaign"]): r["hits"]
        for r in utm_attribution(df).collect()
    }
    assert got == {
        ("news letter", "email", "c1"): 2,
        ("ads", "-", "-"): 1,
        ("-", "cpc", "-"): 1,
    }


# ------------------------------------------------------------ readability

def test_readability_hand_counted(spark):
    from access_log_parser_spark.operators.text_quality import readability

    # "the cat sat. it ran!" -> words 5, sentences 2,
    # vowel groups: e, a, a, i, a -> 5
    df = spark.createDataFrame(
        [(1, "the cat sat. it ran!"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = readability(df).collect()
    assert len(out) == 1  # empty and NULL docs drop
    r = out[0]
    assert (r["words"], r["sentences"], r["syllables"]) == (5, 2, 5)
    want = 206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)
    assert r["flesch"] == pytest.approx(round(want, 6), abs=1e-9)
    assert r["band"] == "difficult" if want < 30 else True


def test_readability_bands_cuts(spark):
    from access_log_parser_spark.operators.text_quality import readability

    # one-word one-sentence one-syllable doc: 206.835 - 1.015 - 84.6 > 60
    df = spark.createDataFrame([(1, "go.")], "doc_id long, text string")
    assert readability(df).collect()[0]["band"] == "easy"
