"""linear_quality_score and script_signals: closed-form checks against
Python references and edge cases."""

from __future__ import annotations

import hashlib
import math

from access_log_parser_spark.operators.text_quality import (
    linear_quality_score,
    script_signals,
)


def _ref_score(text: str, dim=1024, mod=997):
    toks = text.strip().split() if text.strip() else [""]
    z = 0.0
    for t in toks:
        j = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim
        z += ((j * 2654435761) % mod) / mod - 0.5
    return len(toks), round(1.0 / (1.0 + math.exp(-(z / len(toks)))), 4)


def test_linear_quality_matches_reference(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "aaa aaa aaa aaa",
        3: "",
        4: None,
        5: "mixed CASE Tokens 123 !!",
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["score"])
        for r in linear_quality_score(df).collect()
    }
    for d, t in texts.items():
        assert got[d] == _ref_score(t or ""), d


def test_linear_quality_score_bounds_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i} filler words here maybe") for i in range(50)],
        ["doc_id", "text"],
    )
    rows = linear_quality_score(df).collect()
    assert all(0.0 < r["score"] < 1.0 for r in rows)
    again = {r["doc_id"]: r["score"] for r in linear_quality_score(df).collect()}
    assert {r["doc_id"]: r["score"] for r in rows} == again


def test_script_signals_counts_and_argmax(spark):
    docs = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "привет мир"),
            (3, "你好世界"),
            (4, "مرحبا"),
            (5, "hi 你好世界的朋友们大家好"),  # CJK outnumbers latin
            (6, ""),
            (7, None),
            (8, "ab 12"),  # tie latin=2 digit=2 -> first-wins latin
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict() for r in script_signals(docs).collect()}
    assert got[1]["main_script"] == "latin" and got[1]["n_latin"] == 10
    assert got[2]["main_script"] == "cyrillic" and got[2]["n_cyrillic"] == 9
    assert got[3]["main_script"] == "cjk" and got[3]["n_cjk"] == 4
    assert got[4]["main_script"] == "arabic"
    assert got[5]["main_script"] == "cjk"
    assert got[6]["main_script"] == "none"
    assert got[7]["main_script"] == "none"
    assert got[8]["main_script"] == "latin"


def test_domain_quality_filter_drops_spam_and_tiny_domains(spark):
    from access_log_parser_spark.operators.webtext import domain_quality_filter

    rows = (
        [(i, "good", "tok28 " * 30) for i in range(25)]          # w(tok28)=+0.499
        + [(100 + i, "spam", "tok95 " * 30) for i in range(25)]  # w(tok95)=-0.496
        + [(200 + i, "tiny", "tok28 " * 30) for i in range(5)]   # too few docs
    )
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    kept = domain_quality_filter(df, min_mean_x1e4=4500, min_docs=20)
    got = kept.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in got} == {"good": 25}
    assert "score_x1e4" in kept.columns
    # spam domain's per-doc score really is below the threshold
    one = kept.limit(1).collect()[0]
    assert one["score_x1e4"] >= 4500
