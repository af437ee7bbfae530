"""Lexical retrieval scoring over the corpus — BM25 (Robertson et al.,
the Okapi/Lucene formulation).

A training-data pipeline uses this to pull topic slices out of a web
corpus ("find the docs about X") and as the lexical leg of hybrid
retrieval next to the ANN operators in ``similarity.py``. Reference
parity note: the reference engine (nekrassov01/access-log-parser) has
no retrieval surface — this is graft-side, built on the same
``tokens()`` split semantics every text oracle shares
(text_quality.py:26).

Scale shape: the query is a tiny LITERAL term list, so per-term term
frequencies are within-row array HOFs (``filter``+``size``) — no
explode, no (doc, token) shuffle. Corpus statistics (N, total length,
per-term document frequencies) come from ONE single-row aggregate over
the same projection, broadcast back via a 1-row cross join (the
doc_frequency_idf pattern). Total cost at 100 TB: two corpus scans
(one agg, one scoring projection), zero data-sized shuffles, zero
Python. Contrast an exploded-index BM25 (needed only when the query
set is itself corpus-sized).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from .text_quality import tokens


def bm25_score(
    df: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document against ``query_terms`` with BM25.

    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` (Lucene's
    always-positive variant), ``tf`` saturating via ``k1`` with length
    normalization ``b`` against the corpus mean doc length. Terms
    absent from a doc contribute exactly 0, so the returned ``score``
    is 0.0 for docs matching nothing (callers filter or top-k as
    needed). Scores round to 4 dp (the repo's float-drift absorber).

    Returns (id_col, n_tokens, score). Deterministic: ties are the
    caller's problem (order by (score, id_col) for stable top-k).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = list(dict.fromkeys(query_terms))  # dedup, keep order

    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))

    def _tf(term: str) -> Column:
        # single-arg lambda on purpose: a 2-arg lambda would make Spark
        # pass the element INDEX as the second argument
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    tf_cols = [_tf(t).alias(f"_tf_{i}") for i, t in enumerate(terms)]
    proj = df.select(
        F.col(id_col), F.size(toks).alias("_dl"), *tf_cols
    )

    stats = proj.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.sum("_dl").alias("_sum_dl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )

    scored = proj.join(F.broadcast(stats))

    def _term(i: int) -> Column:
        tf = F.col(f"_tf_{i}")
        dfreq = F.col(f"_df_{i}")
        idf = F.log(
            1.0
            + (F.col("_n_docs") - dfreq + 0.5) / (dfreq + 0.5)
        )
        # dl/avgdl written as dl*N/sum_dl: one division, replayed
        # byte-identically by the DuckDB oracle
        norm = 1.0 - b + b * (
            F.col("_dl") * F.col("_n_docs") / F.col("_sum_dl")
        )
        return idf * (tf * (k1 + 1.0)) / (tf + k1 * norm)

    score = F.round(
        sum((_term(i) for i in range(len(terms))), F.lit(0.0)), 4
    )
    return scored.select(
        F.col(id_col),
        F.col("_dl").cast("long").alias("n_tokens"),
        score.alias("score"),
    )


def rrf_fuse(
    ranked: Sequence[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: float = 60.0,
    round_dp: int = 6,
) -> DataFrame:
    """Reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of N ranked candidate lists — the standard score-free way to merge
    the lexical (:func:`bm25_score` top-k) and semantic
    (``similarity.cosine_topk``) legs of hybrid retrieval:

        rrf(d) = sum over lists containing d of 1 / (k + rank_list(d))

    with the canonical k = 60. Inputs are top-k candidate lists that
    already carry an integer ``rank_col`` (1-based); a doc absent from
    a list contributes nothing for it. Returns
    ``(id_col, n_lists, rrf_score)`` with the score rounded to
    ``round_dp`` dp.

    Determinism: each contribution is an exact function of an integer
    rank, and IEEE addition of two doubles is commutative — so with up
    to two lists the fused score is bit-stable regardless of union
    order. Beyond two lists the groupBy sum order is engine-chosen;
    callers needing bit-parity across engines at >2 lists should lower
    ``round_dp``.

    Plan at 100 TB: inputs are top-k lists (bounded by construction),
    so this is a union of tiny frames + ONE id-keyed groupBy — cost is
    O(k x n_lists), independent of corpus size. The corpus-sized work
    happens upstream in the rankers."""
    if not ranked:
        raise ValueError("ranked must be a non-empty sequence")
    parts = [
        df.select(
            F.col(id_col).alias("_id"),
            (1.0 / (F.lit(float(k)) + F.col(rank_col).cast("double")))
            .alias("_c"),
        )
        for df in ranked
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lists"),
            F.sum("_c").alias("_s"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_lists",
            F.round("_s", round_dp).alias("rrf_score"),
        )
    )


def build_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 1000,
) -> DataFrame:
    """Inverted-index construction: one row per token with its document
    frequency and a tf-ranked posting list — the artifact a lexical
    search tier serves from (and the exploded-index counterpart of the
    literal-query :func:`bm25_score`, for when the QUERY side is itself
    corpus-sized).

    ``postings`` is a deterministic string: the top ``max_postings``
    docs per token ordered by (tf desc, id asc), serialized as
    ``id:tf`` joined by ','. The cap is the standard impact-ordered
    truncation (stopword posting lists are corpus-sized; a serving tier
    keeps the high-impact prefix) — it is part of the CONTRACT, not a
    silent bound: ``df_docs`` always reports the FULL document
    frequency, so cap loss is observable per token.

    Returns (token, df_docs, postings).

    Plan at 100 TB: ONE (token, doc) keyed count with map-side combine,
    whose exchange is SHARED (ReuseExchange) by two token-keyed
    branches — the document-frequency count, and the rank-filter whose
    ``row_number() <= cap`` compiles to WindowGroupLimit with a
    Partial pass BEFORE the token exchange, so a stopword's
    corpus-sized posting list is top-k-truncated map-side instead of
    fully sorted in one reducer partition (the skew case this operator
    lives in). Keeping df_docs out of the windowed branch is what
    makes the pushdown legal: a combined single-window formulation
    must carry every row through the hot partition's sort. The final
    join is token-keyed on both already-partitioned sides; per-token
    ordering happens inside ``array_sort`` over the capped struct list
    (<= max_postings elements), never a corpus sort."""
    from pyspark.sql import Window

    tf = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(tokens(F.coalesce(F.col(text_col), F.lit(""))))
            .alias("token"),
        )
        .groupBy("token", "_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df_docs")
    )
    w = Window.partitionBy("token").orderBy(
        F.col("tf").desc(), F.col("_id").asc()
    )
    entry = F.struct(
        (-F.col("tf")).alias("neg_tf"),
        F.col("_id").alias("id"),
        F.concat_ws(":", F.col("_id").cast("string"),
                    F.col("tf").cast("string")).alias("s"),
    )
    capped = (
        tf.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_postings)
    )
    postings = capped.groupBy("token").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(entry)), lambda e: e["s"]
            ),
            ",",
        ).alias("postings")
    )
    return dfreq.join(postings, "token")
