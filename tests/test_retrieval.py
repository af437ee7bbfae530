"""BM25 lexical retrieval (operators/retrieval.py) — pinned against an
independent pure-Python replay plus ranking-property checks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from access_log_parser_spark.operators.retrieval import bm25_score

DOCS = [
    (0, "spark shuffle join spark spark"),
    (1, "window window window window window window window window"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "spark window"),
    (4, ""),
    (5, None),
]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    """Independent reference: same tokens() semantics (split of trimmed
    text on whitespace; ''/None -> [''])."""
    toks = {i: (t or "").strip().split() or [""] for i, t in docs}
    n = len(toks)
    sum_dl = sum(len(v) for v in toks.values())
    out = {}
    for i, tk in toks.items():
        dl = len(tk)
        s = 0.0
        for term in terms:
            tf = tk.count(term)
            df = sum(1 for v in toks.values() if term in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            norm = 1.0 - b + b * (dl * n / sum_dl)
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * norm)
        out[i] = (dl, round(s, 4))
    return out


def _spark_bm25(spark, terms, **kw):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in DOCS],
        "doc_id long, text string",
    )
    return {
        r["doc_id"]: (r["n_tokens"], r["score"])
        for r in bm25_score(df, terms, **kw).collect()
    }


def test_bm25_matches_python_reference(spark):
    terms = ["spark", "window", "fox"]
    assert _spark_bm25(spark, terms) == _py_bm25(DOCS, terms)


def test_bm25_zero_for_no_match_and_ranking(spark):
    got = _spark_bm25(spark, ["spark"])
    assert got[1][1] == 0.0 and got[2][1] == 0.0  # no 'spark' -> 0
    assert got[4] == (1, 0.0) and got[5] == (1, 0.0)  # empty/null text
    # doc 0 (tf=3, dl=5) must outrank doc 3 (tf=1, dl=2)
    assert got[0][1] > got[3][1] > 0.0


def test_bm25_rare_term_outweighs_common(spark):
    # 'fox' appears in 1 doc, 'spark' in 2 -> for equal tf/dl the rare
    # term's idf dominates: doc 2 (fox only) vs doc 3 (spark only)
    got = _spark_bm25(spark, ["fox", "spark"])
    ref = _py_bm25(DOCS, ["fox", "spark"])
    assert got == ref
    # idf(fox) > idf(spark)
    assert math.log(1 + (6 - 1 + 0.5) / 1.5) > math.log(1 + (6 - 2 + 0.5) / 2.5)


def test_bm25_query_term_dedup_and_empty_raises(spark):
    assert _spark_bm25(spark, ["spark", "spark"]) == _spark_bm25(
        spark, ["spark"]
    )
    with pytest.raises(ValueError):
        _spark_bm25(spark, [])


def test_bm25_length_normalization(spark):
    # same tf=1: the shorter doc scores higher with b>0 ...
    got = _spark_bm25(spark, ["window"], b=0.75)
    # ... but doc 1 has tf=8, which saturates past doc 3's tf=1 anyway;
    # check the b=0 (no normalization) monotone-in-tf ordering too
    got0 = _spark_bm25(spark, ["window"], b=0.0)
    assert got0[1][1] > got0[3][1]
    assert got[3][1] > 0.0 and got[1][1] > 0.0


# ------------------------------------------------------------ RRF fusion
def _ranked(spark, pairs):
    return spark.createDataFrame([Row(doc_id=d, rank=r) for d, r in pairs])


def test_rrf_two_lists_pinned_values(spark):
    from access_log_parser_spark.operators.retrieval import rrf_fuse

    lex = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    sem = _ranked(spark, [(2, 1), (4, 2)])
    out = {r["doc_id"]: r for r in rrf_fuse([lex, sem]).collect()}
    assert out[2]["n_lists"] == 2
    assert out[2]["rrf_score"] == round(1 / 62 + 1 / 61, 6)
    assert out[1]["rrf_score"] == round(1 / 61, 6)
    assert out[4]["rrf_score"] == round(1 / 62, 6)
    # a doc ranked #1 in one list loses to a doc ranked #2 in BOTH
    assert out[2]["rrf_score"] > out[1]["rrf_score"]


def test_rrf_single_list_and_custom_k(spark):
    from access_log_parser_spark.operators.retrieval import rrf_fuse

    lst = _ranked(spark, [(7, 1), (8, 2)])
    out = {r["doc_id"]: r["rrf_score"]
           for r in rrf_fuse([lst], k=0.0).collect()}
    assert out == {7: 1.0, 8: 0.5}


def test_rrf_empty_input_raises(spark):
    from access_log_parser_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])
