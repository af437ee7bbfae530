"""Round-4c operators: UA structuring, IP anonymization k-check,
rolling active users, last-touch attribution, k-core peel, latency
regression. Same strategy as test_round4b: crafted frames with
hand-computable expectations on the adversarial edges."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from access_log_parser_spark.operators import sre
from access_log_parser_spark.operators.uaparse import ua_breakdown


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# --------------------------------------------------------------------- ua

UA_CASES = [
    # Edge carries Chrome/ and Safari/ — edge must win
    ("Mozilla/5.0 (Windows NT 10.0) Chrome/120.0.0.0 Safari/537.36 "
     "Edg/120.0.100.0", ("edge", "windows", 120)),
    # Chrome carries Safari/ — chrome must win
    ("Mozilla/5.0 (Windows NT 10.0) Chrome/119.0.0.0 Safari/537.36",
     ("chrome", "windows", 119)),
    # iOS carries 'like Mac OS X' — ios must win over macos
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) Version/17.0 "
     "Safari/604.1", ("safari", "ios", 604)),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Version/17.0 "
     "Safari/605.1.15", ("safari", "macos", 605)),
    ("Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Firefox/121.0",
     ("firefox", "linux", 121)),
    # bot wins over everything, case-insensitive
    ("Mozilla/5.0 (compatible; GOOGLEBOT/2.1) Chrome/1.0 Safari/1.0",
     ("bot", "other", None)),
    ("curl/8.5.0", ("bot", "other", None)),
    ("SomethingElse/1.0", ("other", "other", None)),
    (None, ("other", "other", None)),
]


def test_ua_breakdown_detection_order(spark):
    df = spark.createDataFrame(
        [(ua,) for ua, _ in UA_CASES], "user_agent string"
    )
    got = {
        (r["family"], r["os"], r["major"]): r["requests"]
        for r in ua_breakdown(df).collect()
    }
    want: dict = {}
    for _, key in UA_CASES:
        want[key] = want.get(key, 0) + 1
    assert got == want


# --------------------------------------------------------------- ip anon

def test_ip_anonymize_k_threshold(spark):
    rows = (
        [(f"10.0.0.{i}",) for i in range(6)]        # 6 distinct tails: ok
        + [("10.0.1.1",)] * 5 + [("10.0.1.2",)]     # 2 distinct: not ok
    )
    df = spark.createDataFrame(rows, "ip string")
    got = {
        r["prefix24"]: (r["n_requests"], r["k_distinct_ips"], r["k_ok"])
        for r in sre.ip_anonymize_report(df, "ip", k_threshold=5).collect()
    }
    assert got == {"10.0.0.0": (6, 6, True), "10.0.1.0": (6, 2, False)}


# ---------------------------------------------------------- rolling users

def test_active_users_rolling_window_math(spark):
    # u1 active day 1 and day 3; u2 active day 1 only; window 3 days
    rows = [
        (1, _ts("2024-01-01T10:00:00")),
        (1, _ts("2024-01-01T12:00:00")),  # same day, dedups
        (1, _ts("2024-01-03T10:00:00")),
        (2, _ts("2024-01-01T10:00:00")),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {
        r["day"].date().isoformat(): (r["dau"], r["wau"])
        for r in sre.active_users_rolling(df, "u", "ts", window_days=3).collect()
    }
    # day1: dau 2; wau(day1) = users active in {day-2..day1} = {u1,u2} = 2
    # day3: dau 1; wau(day3) = active in {day1..day3} = {u1,u2} = 2
    assert got == {"2024-01-01": (2, 2), "2024-01-03": (1, 2)}


# ------------------------------------------------------------- last touch

def test_last_touch_attribution_semantics(spark):
    from access_log_parser_spark.operators.referrers import (
        last_touch_attribution,
    )

    base = _ts("2024-01-01T00:00:00")
    rows = [
        # u1: touch c1, untagged, convert -> c1; later touch c2, convert -> c2
        (1, base, "c1", False),
        (1, base + dt.timedelta(minutes=1), None, False),
        (1, base + dt.timedelta(minutes=2), None, True),
        (1, base + dt.timedelta(minutes=3), "c2", False),
        (1, base + dt.timedelta(minutes=4), None, True),
        # u2: converts with no touch anywhere -> organic '-'
        (2, base, None, True),
        # u3: conversion row ITSELF tagged -> credits its own campaign
        (3, base, "c9", True),
    ]
    df = spark.createDataFrame(
        rows, "u long, ts timestamp, campaign string, conv boolean"
    )
    got = {
        r["campaign"]: r["conversions"]
        for r in last_touch_attribution(df, "u", "ts", "campaign", "conv").collect()
    }
    assert got == {"c1": 1, "c2": 1, "-": 1, "c9": 1}


# ------------------------------------------------------------------ kcore

def test_kcore_peel_cascade(spark):
    # K4 core (a,b,c,d all-pairs), fringe f with 2 core edges + 1 leaf,
    # leaf l. k=2: everything survives except nothing; k=3: l peels
    # round 1, f (then degree 2) peels round 2, K4 stays at degree 3.
    core = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
            ("c", "d")]
    fringe = [("f", "a"), ("f", "b"), ("f", "l")]
    df = spark.createDataFrame(core + fringe, "src string, dst string")
    from access_log_parser_spark.operators.graph import kcore_peel

    got3 = {r["node"]: r["degree"] for r in kcore_peel(df, k=3, rounds=3).collect()}
    assert got3 == {"a": 3, "b": 3, "c": 3, "d": 3}
    # one round is NOT enough: f survives round 1 (leaf peeled, f now
    # degree 2 — visible as an under-peeled node, not hidden)
    got1 = {
        r["node"]: r["degree"] for r in kcore_peel(df, k=3, rounds=1).collect()
    }
    assert got1["f"] == 2
    # k=2 keeps the fringe node (degree 3 >= 2) but not the leaf
    got2 = {r["node"] for r in kcore_peel(df, k=2, rounds=3).collect()}
    assert got2 == {"a", "b", "c", "d", "f"}


def test_kcore_peel_self_loops_and_dupes_ignored(spark):
    df = spark.createDataFrame(
        [("x", "x"), ("x", "y"), ("y", "x"), ("x", "y")],
        "src string, dst string",
    )
    from access_log_parser_spark.operators.graph import kcore_peel

    got = {r["node"]: r["degree"] for r in kcore_peel(df, k=1, rounds=2).collect()}
    # self-loop dropped from BOTH orientations; dupes collapse
    assert got == {"x": 1, "y": 1}


# --------------------------------------------------------------- lat regr

def test_latency_regression_flags(spark):
    split = _ts("2024-01-10T00:00:00")
    before = [("e", 0.1, _ts("2024-01-05T00:00:00"))] * 10
    after_bad = [("e", 0.5, _ts("2024-01-15T00:00:00"))] * 10
    other = (
        [("ok", 0.1, _ts("2024-01-05T00:00:00"))] * 10
        + [("ok", 0.11, _ts("2024-01-15T00:00:00"))] * 10
    )
    only_before = [("gone", 0.2, _ts("2024-01-05T00:00:00"))]
    df = spark.createDataFrame(
        before + after_bad + other + only_before,
        "k string, lat double, ts timestamp",
    )
    rows = {
        r["k"]: r
        for r in sre.latency_regression(
            df, "k", "lat", "ts", split_ts=split, p=0.95, threshold=0.1
        ).collect()
    }
    assert set(rows) == {"e", "ok"}  # single-period keys drop
    assert rows["e"]["regressed"] is True
    assert rows["e"]["delta"] == pytest.approx(0.4, abs=1e-9)
    assert rows["ok"]["regressed"] is False
    assert rows["ok"]["n_before"] == 10 and rows["ok"]["n_after"] == 10
