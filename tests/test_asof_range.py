"""Round-3 operators: distributed as-of join (operators/asof.py), binned
range join (enrich.binned_range_join), host-level boilerplate line
removal (webtext.boilerplate_line_removal), and corpus unigram-LM
scoring (text_quality.unigram_logprob)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from access_log_parser_spark.enrich import binned_range_join
from access_log_parser_spark.operators.asof import asof_join
from access_log_parser_spark.operators.text_quality import unigram_logprob
from access_log_parser_spark.operators.webtext import boilerplate_line_removal


def _ts(s: str):
    from datetime import datetime

    return datetime.fromisoformat(s)


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 00:00:05"), 10.0),
            (2, "A", _ts("2024-01-01 00:00:10"), 11.0),  # == quote ts
            (3, "A", _ts("2024-01-01 00:00:30"), 12.0),
            (4, "B", _ts("2024-01-01 00:00:01"), 13.0),  # before any quote
            (5, "C", _ts("2024-01-01 00:00:20"), 14.0),  # key with no quotes
        ],
        "trade_id long, sym string, ts timestamp, price double",
    )


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 00:00:00"), 100),
            ("A", _ts("2024-01-01 00:00:10"), 110),
            ("A", _ts("2024-01-01 00:00:25"), 125),
            ("B", _ts("2024-01-01 00:00:02"), 200),
        ],
        "sym string, ts timestamp, quote int",
    )


def test_asof_backward(spark, trades, quotes):
    out = {
        r["trade_id"]: r["quote"]
        for r in asof_join(trades, quotes, on="sym").collect()
    }
    # trade 1 @5s -> quote @0s; trade 2 @10s -> the COINCIDENT quote @10s
    # (inclusive); trade 3 @30s -> quote @25s; trade 4 precedes every B
    # quote -> null; trade 5's key has no quotes -> null.
    assert out == {1: 100, 2: 110, 3: 125, 4: None, 5: None}
    assert asof_join(trades, quotes, on="sym").count() == 5  # left keeps all


def test_asof_forward_inner_tolerance(spark, trades, quotes):
    fwd = {
        r["trade_id"]: r["quote"]
        for r in asof_join(trades, quotes, on="sym", direction="forward").collect()
    }
    # forward: next quote at-or-after the trade
    assert fwd == {1: 110, 2: 110, 3: None, 4: 200, 5: None}

    inner = asof_join(trades, quotes, on="sym", how="inner")
    assert {r["trade_id"] for r in inner.collect()} == {1, 2, 3}

    tol = {
        r["trade_id"]: r["quote"]
        for r in asof_join(
            trades, quotes, on="sym", tolerance_seconds=6.0
        ).collect()
    }
    # trade 1 is 5s from its match (in tolerance), trade 2 is 0s,
    # trade 3 is 5s; tolerance only nulls matches farther than 6s.
    assert tol == {1: 100, 2: 110, 3: 125, 4: None, 5: None}
    near = asof_join(trades, quotes, on="sym", tolerance_seconds=3.0)
    assert {r["trade_id"]: r["quote"] for r in near.collect()}[1] is None


def test_asof_rejects_colliding_columns(spark, trades, quotes):
    with pytest.raises(ValueError, match="collide"):
        asof_join(trades, quotes.withColumnRenamed("quote", "price"), on="sym")


def test_asof_plan_single_exchange(spark, trades, quotes):
    plan = asof_join(trades, quotes, on="sym")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the union + running-window formulation: no join operator at all
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_binned_range_join(spark):
    facts = spark.createDataFrame(
        [(i, v) for i, v in enumerate([0, 5, 9, 10, 99, 100, 250, 999])],
        "fact_id long, v long",
    )
    ranges = spark.createDataFrame(
        [(0, 0, 10), (1, 10, 100), (2, 100, 1000)], "range_id long, lo long, hi long"
    )
    out = binned_range_join(facts, ranges, "v", bin_size=16)
    got = {r["fact_id"]: r["range_id"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 2}

    # plan: hash join on the bin, never a nested loop
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_binned_range_join_left_and_overlap(spark):
    facts = spark.createDataFrame([(0, 5), (1, 5000)], "fact_id long, v long")
    ranges = spark.createDataFrame(
        [(0, 0, 10), (1, 3, 7)], "range_id long, lo long, hi long"
    )
    rows = binned_range_join(facts, ranges, "v", bin_size=4, how="left").collect()
    by_fact: dict[int, set] = {}
    for r in rows:
        by_fact.setdefault(r["fact_id"], set()).add(r["range_id"])
    assert by_fact[0] == {0, 1}  # overlapping ranges -> one row each
    assert by_fact[1] == {None}  # left keeps unmatched facts


def test_boilerplate_line_removal(spark):
    # footer appears in 3 docs of host h1 -> removed there; the same text
    # in h2 appears only once -> kept (per-group counting).
    df = spark.createDataFrame(
        [
            (0, "h1", "content zero\nFOOTER"),
            (1, "h1", "content one\nFOOTER\nmore one"),
            (2, "h1", "FOOTER\ncontent two"),
            (3, "h1", "FOOTER\nFOOTER"),  # repeated within ONE doc: counts once
            (4, "h2", "content four\nFOOTER"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in boilerplate_line_removal(df, min_docs=3).collect()
    }
    assert out[0] == "content zero"
    assert out[1] == "content one\nmore one"
    assert out[2] == "content two"
    assert out[3] == ""  # all-boilerplate doc survives with empty text
    assert out[4] == "content four\nFOOTER"
    assert len(out) == 5


def test_boilerplate_distinct_doc_count(spark):
    # 2 docs contain the line (one of them twice): min_docs=3 keeps it,
    # min_docs=2 removes it — the count is DISTINCT docs, not occurrences.
    df = spark.createDataFrame(
        [(0, "h", "x\nx\na"), (1, "h", "x\nb")],
        "doc_id long, source string, text string",
    )
    keep3 = {r["doc_id"]: r["text"] for r in boilerplate_line_removal(df, min_docs=3).collect()}
    assert keep3 == {0: "x\nx\na", 1: "x\nb"}
    keep2 = {r["doc_id"]: r["text"] for r in boilerplate_line_removal(df, min_docs=2).collect()}
    assert keep2 == {0: "a", 1: "b"}


def test_boilerplate_single_exchange_for_count(spark):
    df = spark.createDataFrame(
        [(0, "h", "a\nb")], "doc_id long, source string, text string"
    )
    plan = (
        boilerplate_line_removal(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # two shuffles total: (group, digest) for the windows + doc_id regroup
    assert plan.count("Exchange") <= 2 + plan.count("ENSURE_REQUIREMENTS, [plan_id")


def test_unigram_logprob(spark):
    df = spark.createDataFrame(
        [(0, "a a b"), (1, "b c")], "doc_id long, text string"
    )
    # corpus counts: a=2, b=2, c=1, total=5
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    exp0 = round((2 * math.log(2 / 5) + math.log(2 / 5)) / 3, 4)
    exp1 = round((math.log(2 / 5) + math.log(1 / 5)) / 2, 4)
    assert out[0]["mean_logprob"] == pytest.approx(exp0, abs=1e-9)
    assert out[1]["mean_logprob"] == pytest.approx(exp1, abs=1e-9)
    assert out[0]["n_tokens"] == 3 and out[1]["n_tokens"] == 2
