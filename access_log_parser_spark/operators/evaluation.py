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
