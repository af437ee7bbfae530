"""Tests for the round-3 training-data operators: corpus-wide repeated
n-gram span removal, Luhn card signals, temperature-mixture sampling,
and context-window chunking."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from access_log_parser_spark.operators.packing import chunk_documents
from access_log_parser_spark.operators.sampling import (
    hash_bucket,
    temperature_mixture_rates,
    temperature_mixture_sample,
)
from access_log_parser_spark.operators.webtext import (
    card_signals,
    luhn_valid_col,
    repeated_ngram_span_removal,
)


# --- repeated_ngram_span_removal -------------------------------------------


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_repeated_span_removed_from_all_docs(spark):
    shared = "the quick brown fox jumps"
    docs = spark.createDataFrame(
        [
            (1, f"alpha {shared} omega"),
            (2, f"{shared} tail words here"),
            (3, "totally unique text nothing shared"),
        ],
        ["doc_id", "text"],
    )
    out = _rows(repeated_ngram_span_removal(docs, n=5, min_docs=2))
    assert out[1]["text"] == "alpha omega"
    assert out[1]["n_removed"] == 5 and out[1]["n_tokens"] == 7
    assert out[2]["text"] == "tail words here"
    assert out[3]["text"] == "totally unique text nothing shared"
    assert out[3]["n_removed"] == 0


def test_repeated_span_overlapping_grams_cover_union(spark):
    # Two docs share a 6-token run; with n=5 the two overlapping 5-grams
    # cover the full 6-token union in both docs.
    run = "a b c d e f"
    docs = spark.createDataFrame(
        [(1, f"x {run} y"), (2, f"{run} z")], ["doc_id", "text"]
    )
    out = _rows(repeated_ngram_span_removal(docs, n=5, min_docs=2))
    assert out[1]["text"] == "x y" and out[1]["n_removed"] == 6
    assert out[2]["text"] == "z" and out[2]["n_removed"] == 6


def test_repeated_span_within_one_doc_not_removed(spark):
    # min_docs=2 counts DISTINCT docs: a gram repeated only inside one
    # document survives.
    docs = spark.createDataFrame(
        [(1, "p q r s t p q r s t"), (2, "unrelated words entirely here now")],
        ["doc_id", "text"],
    )
    out = _rows(repeated_ngram_span_removal(docs, n=5, min_docs=2))
    assert out[1]["n_removed"] == 0


def test_repeated_span_all_removed_gives_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, "only shared tokens here now"), (2, "only shared tokens here now")],
        ["doc_id", "text"],
    )
    out = _rows(repeated_ngram_span_removal(docs, n=5, min_docs=2))
    assert out[1]["text"] == "" and out[1]["n_removed"] == 5
    assert set(out) == {1, 2}


def test_repeated_span_short_and_null_docs_pass_through(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, None), (3, "a b c d e"), (4, "a b c d e")],
        ["doc_id", "text"],
    )
    out = _rows(repeated_ngram_span_removal(docs, n=5, min_docs=2))
    assert out[1]["text"] == "too short"
    assert out[2]["text"] == "" and out[2]["n_removed"] == 0
    assert out[3]["text"] == "" and out[3]["n_removed"] == 5


# --- Luhn / card_signals ----------------------------------------------------


def test_luhn_known_vectors(spark):
    cases = {
        "4111111111111111": True,   # Visa test PAN
        "5500005555555559": True,   # MC test PAN
        "4111111111111112": False,  # checksum off by one
        "123456789012": False,      # 12 digits: too short even if mod-10
    }
    df = spark.createDataFrame([(d,) for d in cases], ["d"])
    got = {r["d"]: r["ok"] for r in df.select("d", luhn_valid_col(F.col("d")).alias("ok")).collect()}
    assert got == cases


def test_card_signals_counts_and_separators(spark):
    docs = spark.createDataFrame(
        [
            (1, "pay 4111 1111 1111 1111 now or 4111-1111-1111-1112 later"),
            (2, "no cards, just a phone +123456789012345"),
            (3, None),
        ],
        ["doc_id", "text"],
    )
    out = _rows(card_signals(docs))
    assert out[1]["n_candidates"] == 2 and out[1]["n_luhn_valid"] == 1
    assert out[2]["n_candidates"] == 1 and out[2]["n_luhn_valid"] == 0
    assert out[3]["n_candidates"] == 0 and out[3]["n_luhn_valid"] == 0


# --- temperature mixture sampling ------------------------------------------


def _mix_df(spark):
    rows = [(i, "big" if i < 800 else "small") for i in range(1000)]
    return spark.createDataFrame(rows, ["doc_id", "source"])


def test_temperature_rates_closed_form(spark):
    df = _mix_df(spark)
    rates = {
        r["stratum"]: r.asDict()
        for r in temperature_mixture_rates(df, alpha=0.5, target_frac=0.5).collect()
    }
    z = math.sqrt(800) + math.sqrt(200)
    for name, c in (("big", 800), ("small", 200)):
        expect = min(1.0, 0.5 * 1000 * (math.sqrt(c) / z) / c)
        assert rates[name]["rate_ppm"] == math.floor(expect * 1e6 + 0.5)
        assert rates[name]["n_in"] == c


def test_temperature_sample_deterministic_and_flattened(spark):
    df = _mix_df(spark)
    out = temperature_mixture_sample(df, alpha=0.5, target_frac=0.5)
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in out.collect())
    assert a == b and 0 < len(a) < 1000
    kept = out.groupBy("source").count().collect()
    frac = {r["source"]: r["count"] for r in kept}
    # alpha=0.5 up-weights the small stratum: its keep-RATE must exceed
    # the big stratum's.
    assert frac["small"] / 200 > frac["big"] / 800
    # membership is exactly the bucket < rate_ppm rule
    rates = {
        r["stratum"]: r["rate_ppm"]
        for r in temperature_mixture_rates(df, alpha=0.5, target_frac=0.5).collect()
    }
    manual = df.filter(
        hash_bucket(F.col("doc_id"), 1_000_000)
        < F.when(F.col("source") == "big", rates["big"]).otherwise(rates["small"])
    )
    assert sorted(r["doc_id"] for r in manual.collect()) == a


def test_temperature_alpha_one_is_proportional(spark):
    df = _mix_df(spark)
    rates = {
        r["stratum"]: r["rate_ppm"]
        for r in temperature_mixture_rates(df, alpha=1.0, target_frac=0.5).collect()
    }
    assert rates["big"] == rates["small"] == 500_000


# --- chunk_documents --------------------------------------------------------


def test_chunk_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    rows = chunk_documents(docs, chunk_tokens=5, stride=3).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r == {
        "doc_id": 1, "chunk_id": 0, "start_pos": 0,
        "n_chunk_tokens": 3, "chunk_text": "a b c",
    }


def test_chunk_exact_multiple_and_right_aligned_tail(spark):
    text = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        (r.asDict() for r in chunk_documents(docs, chunk_tokens=4, stride=3).collect()),
        key=lambda r: r["chunk_id"],
    )
    # n=10, chunk=4, stride=3 -> k = ceil(6/3)+1 = 3, starts 0,3,6
    assert [r["start_pos"] for r in rows] == [0, 3, 6]
    assert all(r["n_chunk_tokens"] == 4 for r in rows)
    assert rows[2]["chunk_text"] == "t6 t7 t8 t9"
    # n=10, chunk=4, stride=2 -> k = 4, last start right-aligned to 6
    rows2 = sorted(
        (r.asDict() for r in chunk_documents(docs, chunk_tokens=4, stride=2).collect()),
        key=lambda r: r["chunk_id"],
    )
    assert [r["start_pos"] for r in rows2] == [0, 2, 4, 6]
    # full coverage: union of [start, start+4) == [0, 10)
    covered = set()
    for r in rows2:
        covered |= set(range(r["start_pos"], r["start_pos"] + r["n_chunk_tokens"]))
    assert covered == set(range(10))


def test_chunk_rejects_bad_params(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0, stride=0)
