"""Pipeline-evaluation operators — calibration of the curation layer.

A web-corpus pipeline gates documents on classifier scores
(text_quality.linear_quality_score, perplexity tiers, spam scores);
choosing the cutoff is a precision/recall trade made against a labeled
sample (CCNet picks perplexity tier cuts this way; fastText-filter
pipelines sweep the classifier threshold). ``threshold_sweep`` computes
the full confusion matrix + P/R/F1 per candidate threshold in ONE
corpus scan. Reference parity note: the reference engine
(nekrassov01/access-log-parser) has no evaluation surface — graft-side.

Scale shape: thresholds are a tiny literal list, so the sweep is a
single aggregate of 4 x |thresholds| conditional sums (map-side partial
combine -> one single-row reduce), unpivoted to rows with an in-plan
literal struct array + explode. One scan, one 1-row shuffle,
zero joins, zero Python — never the |df| x |thresholds| cross join the
naive formulation shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def threshold_sweep(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    thresholds: Sequence[float] = (0.1, 0.25, 0.5, 0.75, 0.9),
    round_dp: int = 6,
) -> DataFrame:
    """Confusion matrix + precision/recall/F1 at each threshold.

    A row is predicted positive iff ``score_col >= threshold``; its
    truth is ``label_col > 0`` (0/1 int or boolean both work). NULL
    scores or labels are excluded up front (they belong to neither
    class). Returns one row per threshold, in the given order:
    ``(threshold, tp, fp, fn, tn, precision, recall, f1)`` with the
    ratios rounded to ``round_dp`` dp and NULL when undefined (no
    predicted positives -> precision NULL; no actual positives ->
    recall NULL; P+R == 0 or either NULL -> f1 NULL).
    """
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    ts = [float(t) for t in thresholds]
    score = F.col(score_col).cast("double")
    truth = F.col(label_col).cast("double") > 0.0
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )

    def _n(cond):
        return F.sum(cond.cast("long"))

    aggs = []
    for i, t in enumerate(ts):
        pos = score >= F.lit(t)
        aggs += [
            _n(pos & truth).alias(f"_tp{i}"),
            _n(pos & ~truth).alias(f"_fp{i}"),
            _n(~pos & truth).alias(f"_fn{i}"),
            _n(~pos & ~truth).alias(f"_tn{i}"),
        ]
    one = base.agg(*aggs)

    rows = F.array(
        *[
            F.struct(
                F.lit(t).alias("threshold"),
                F.coalesce(F.col(f"_tp{i}"), F.lit(0)).cast("long")
                .alias("tp"),
                F.coalesce(F.col(f"_fp{i}"), F.lit(0)).cast("long")
                .alias("fp"),
                F.coalesce(F.col(f"_fn{i}"), F.lit(0)).cast("long")
                .alias("fn"),
                F.coalesce(F.col(f"_tn{i}"), F.lit(0)).cast("long")
                .alias("tn"),
            )
            for i, t in enumerate(ts)
        ]
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    prec = F.when(tp + fp > 0, tp / (tp + fp))
    rec = F.when(tp + fn > 0, tp / (tp + fn))
    f1 = F.when(prec + rec > 0, 2.0 * prec * rec / (prec + rec))
    return (
        one.select(F.explode(rows).alias("_r"))
        .select("_r.*")
        .select(
            "threshold",
            "tp",
            "fp",
            "fn",
            "tn",
            F.round(prec, round_dp).alias("precision"),
            F.round(rec, round_dp).alias("recall"),
            F.round(f1, round_dp).alias("f1"),
        )
    )


def ndcg_at_k(
    df: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    score_col: str = "score",
    rel_col: str = "rel",
    id_col: str = "doc_id",
) -> DataFrame:
    """NDCG@k per query (Jarvelin & Kekalainen 2002, the exponential
    gain form) — the ranking-quality metric for the retrieval legs
    (:mod:`retrieval`'s BM25 / RRF, similarity's ANN): given per-query
    candidates with a ranker ``score`` and a graded relevance label
    ``rel`` (integer >= 0),

        DCG@k  = sum over the top-k by (score desc, id asc) of
                 (2^rel - 1) / log2(position + 1)
        IDCG@k = the same sum under the IDEAL order (rel desc, id asc)
        NDCG@k = DCG/IDCG            (0.0 when IDCG = 0: no relevant
                                      docs -> every ranking is equally
                                      uninformative, pinned for the
                                      oracle)

    Both tie-breaks are pinned on the id column so the metric — and its
    DuckDB replay — is deterministic. Returns
    (query_id, dcg, idcg, ndcg), each rounded to 6 dp.

    Plan at 100 TB: ONE query-keyed exchange shared by the two window
    ranks (same partition key, Catalyst reuses the sort) and the final
    per-query aggregate; candidate lists are ranker output (k-bounded
    upstream), so nothing here is corpus-sized."""
    from pyspark.sql import Window

    wr = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    wi = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(id_col).asc()
    )
    gain = F.pow(F.lit(2.0), F.col(rel_col)) - F.lit(1.0)
    ranked = df.withColumn("_r", F.row_number().over(wr)).withColumn(
        "_ir", F.row_number().over(wi)
    )
    dcg = F.sum(
        F.when(F.col("_r") <= k, gain / F.log2(F.col("_r") + 1.0))
        .otherwise(0.0)
    )
    idcg = F.sum(
        F.when(F.col("_ir") <= k, gain / F.log2(F.col("_ir") + 1.0))
        .otherwise(0.0)
    )
    return (
        ranked.groupBy(F.col(query_col))
        .agg(dcg.alias("_dcg"), idcg.alias("_idcg"))
        .select(
            query_col,
            F.round("_dcg", 6).alias("dcg"),
            F.round("_idcg", 6).alias("idcg"),
            F.round(
                F.when(F.col("_idcg") > 0, F.col("_dcg") / F.col("_idcg"))
                .otherwise(0.0),
                6,
            ).alias("ndcg"),
        )
    )
