"""Round-5 operators: HyperLogLog register sketch pinned against a
pure-Python reference (build, both estimation branches, mergeability)
and the approx_percentile (KLL) exactness window the
latency_percentiles_kll oracle relies on."""

from __future__ import annotations

import hashlib
import math
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from access_log_parser_spark.operators.sketches import (
    HLL_HASH_BITS,
    hll_alpha,
    hll_estimate,
    hll_registers,
    hll_vs_exact,
)


def _ref_registers(values, b):
    m = 1 << b
    w_bits = HLL_HASH_BITS - b
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        bucket = h % m
        w = h >> b
        rho = (w_bits + 1) if w == 0 else (w_bits + 1 - w.bit_length())
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _ref_estimate(regs, b):
    m = 1 << b
    scale = HLL_HASH_BITS - b + 1
    zint = sum(1 << (scale - rho) for rho in regs.values())
    v = m - len(regs)
    raw = (
        hll_alpha(m) * m * m * float(2**scale)
        / float((v << scale) + zint)
    )
    if raw <= 2.5 * m and v > 0:
        return round(float(m) * math.log(float(m) / float(v)), 4)
    return round(raw, 4)


@pytest.mark.parametrize("b,n", [(8, 40), (8, 2000), (4, 25), (6, 5000)])
def test_hll_matches_python_reference(spark, b, n):
    rng = random.Random(42 + b + n)
    values = [f"item-{rng.randrange(10**9)}" for _ in range(n)]
    df = spark.createDataFrame([Row(item=v) for v in values])
    got_regs = {
        r["bucket"]: r["rho"]
        for r in hll_registers(df, "item", b=b).collect()
    }
    assert got_regs == _ref_registers(values, b)
    got_est = hll_estimate(hll_registers(df, "item", b=b), b=b).collect()
    assert got_est[0]["est"] == _ref_estimate(_ref_registers(values, b), b)
    # the estimate is actually close to the true cardinality
    exact = len(set(values))
    assert abs(got_est[0]["est"] - exact) / exact < 5 / math.sqrt(1 << b)


def test_hll_both_branches_exercised(spark):
    # n << m forces linear counting; n >> m forces the raw path (b=8)
    small = spark.createDataFrame([Row(item=f"s{i}") for i in range(30)])
    big = spark.createDataFrame([Row(item=f"b{i}") for i in range(4000)])
    m = 256
    est_small = hll_estimate(hll_registers(small, "item")).collect()[0]["est"]
    est_big = hll_estimate(hll_registers(big, "item")).collect()[0]["est"]
    regs_small = _ref_registers([f"s{i}" for i in range(30)], 8)
    v = m - len(regs_small)
    assert est_small == round(m * math.log(m / v), 4)  # linear-counting
    assert est_big > 2.5 * m  # raw path (no small-range rewrite possible)


def test_hll_registers_merge_by_max(spark):
    """The property that makes the sketch storable: registers built from
    two halves max-merge to exactly the registers of the union."""
    a = spark.createDataFrame([Row(item=f"x{i}") for i in range(300)])
    bdf = spark.createDataFrame([Row(item=f"x{i}") for i in range(150, 500)])
    merged = (
        hll_registers(a, "item")
        .union(hll_registers(bdf, "item"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("rho"))
    )
    whole = hll_registers(a.union(bdf), "item")
    assert {
        (r["bucket"], r["rho"]) for r in merged.collect()
    } == {(r["bucket"], r["rho"]) for r in whole.collect()}
    # and estimating from the merged table equals estimating the union
    assert (
        hll_estimate(merged).collect()[0]["est"]
        == hll_estimate(whole).collect()[0]["est"]
    )


def test_hll_vs_exact_groups_and_nulls(spark):
    rows = [Row(g="a", item=i % 50) for i in range(200)] + [
        Row(g="b", item=i) for i in range(120)
    ] + [Row(g="a", item=None)]
    df = spark.createDataFrame(rows)
    out = {r["g"]: r for r in hll_vs_exact(df, "item", ["g"]).collect()}
    assert out["a"]["exact_n"] == 50 and out["b"]["exact_n"] == 120
    for r in out.values():
        assert r["rel_err"] < 0.35  # m=256 on tiny n: generous bound
        assert r["est"] == _ref_estimate(
            _ref_registers(
                [i % 50 for i in range(200)] if r["g"] == "a" else list(range(120)),
                8,
            ),
            8,
        )


def test_approx_percentile_is_exact_below_rank_error_window(spark):
    """latency_percentiles_kll's oracle contract: at accuracy=100000 and
    group sizes n with n/accuracy < 0.5, approx_percentile returns the
    exact lower nearest-rank value ceil(p*n) — the quantile_disc
    definition — for every probed group size and percentile."""
    rng = random.Random(7)
    for n in (9, 100, 777, 3000):
        vals = sorted(round(rng.uniform(0, 10), 3) for _ in range(n))
        df = spark.createDataFrame([Row(v=float(x)) for x in vals])
        got = df.agg(
            F.expr("approx_percentile(v, array(0.5, 0.9, 0.99), 100000)")
        ).collect()[0][0]
        want = [vals[math.ceil(p * n) - 1] for p in (0.5, 0.9, 0.99)]
        assert got == want, (n, got, want)


# ------------------------------------------------- epoch_shuffle fuzz
def _epoch_positions_ref(keys: list[str], epoch: int) -> dict[str, set[int]]:
    """Pure-Python replay of the epoch_shuffle contract: key groups are
    ordered by (md5(epoch:key), key) and each group owns the contiguous
    1-based position range at its rank. Within a duplicate-key group the
    order key ties, so any assignment of the group's range is legal —
    the reference therefore pins per-key position SETS, which are exact
    (singletons) whenever keys are unique."""
    from collections import Counter

    cnt = Counter(keys)
    ordered = sorted(
        cnt, key=lambda k: (hashlib.md5(f"{epoch}:{k}".encode()).hexdigest(), k)
    )
    want: dict[str, set[int]] = {}
    pos = 1
    for k in ordered:
        want[k] = set(range(pos, pos + cnt[k]))
        pos += cnt[k]
    return want


@pytest.mark.parametrize(
    "n,parts,dup",
    [(0, 4, False), (1, 1, False), (2, 8, False), (17, 5, True),
     (101, 13, True), (300, 32, False)],
)
def test_epoch_shuffle_offsets_fuzz_vs_python_reference(spark, n, parts, dup):
    """Fuzz the scale path (range exchange + per-partition numbering +
    broadcast offsets) against the pure-Python md5-rank reference across
    sizes, partition counts (including parts > n, so empty range
    partitions exercise the offset arithmetic), duplicate keys, and the
    empty frame."""
    from access_log_parser_spark.operators.sampling import epoch_shuffle

    rng = random.Random(1000 + n * 7 + parts)
    pool = max(1, n // 3) if dup else n
    keys = [f"k{rng.randrange(pool) if dup else i}" for i in range(n)]
    rng.shuffle(keys)  # input order must never matter
    if n:
        df = spark.createDataFrame([Row(doc_id=k) for k in keys])
    else:
        df = spark.createDataFrame([], "doc_id string")

    got_rows = [
        (r["doc_id"], r["position"])
        for r in epoch_shuffle(df, epoch=7, num_partitions=parts).collect()
    ]
    assert sorted(p for _, p in got_rows) == list(range(1, n + 1))
    got: dict[str, set[int]] = {}
    for k, p in got_rows:
        got.setdefault(k, set()).add(p)
    assert got == _epoch_positions_ref(keys, 7)


def test_epoch_shuffle_strategies_agree_under_duplicate_keys(spark):
    """Offsets and legacy-window strategies must assign every duplicate
    key group the same position range (within-group order is a tie both
    may break arbitrarily)."""
    from access_log_parser_spark.operators.sampling import epoch_shuffle

    rng = random.Random(99)
    keys = [f"k{rng.randrange(11)}" for _ in range(60)]
    df = spark.createDataFrame([Row(doc_id=k) for k in keys])

    def per_key(strategy):
        out: dict[str, set[int]] = {}
        for r in epoch_shuffle(
            df, epoch=3, strategy=strategy, num_partitions=6
        ).collect():
            out.setdefault(r["doc_id"], set()).add(r["position"])
        return out

    assert per_key("offsets") == per_key("window")


def test_epoch_shuffle_replaces_position_and_tolerates_reserved_names(spark):
    """Inputs that already carry `position` (re-shuffling a numbered
    frame for a new epoch) or columns named like the offsets path's
    internal temporaries must behave identically under both strategies:
    position is REPLACED in place (withColumn semantics) and user
    columns named _ord/_bkt pass through untouched."""
    from access_log_parser_spark.operators.sampling import epoch_shuffle

    df = spark.range(50).select(
        F.col("id").cast("string").alias("doc_id"),
        F.lit(0).cast("long").alias("position"),
        F.lit("x").alias("_ord"),
        F.lit(7).alias("_bkt"),
    )
    outs = {}
    for strat in ("offsets", "window"):
        out = epoch_shuffle(df, epoch=2, strategy=strat)
        assert out.columns == ["doc_id", "position", "_ord", "_bkt"]
        rows = out.collect()
        assert sorted(r["position"] for r in rows) == list(range(1, 51))
        assert all(r["_ord"] == "x" and r["_bkt"] == 7 for r in rows)
        outs[strat] = {r["doc_id"]: r["position"] for r in rows}
    assert outs["offsets"] == outs["window"]


def test_epoch_shuffle_pins_no_storage(spark):
    """The offsets path is pure recomputation of a deterministic plan —
    constructing AND consuming it must leave nothing persisted or
    checkpointed in executor block storage (the r05 localCheckpoint
    design pinned a full input copy per call for the session lifetime)."""
    from access_log_parser_spark.operators.sampling import epoch_shuffle

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    df = spark.range(2000).select(F.col("id").cast("string").alias("doc_id"))
    out = epoch_shuffle(df, epoch=5, num_partitions=8)
    assert out.count() == 2000
    assert jsc.getPersistentRDDs().size() == before
