"""Bounded-state frequency sketches for heavy-hitter estimation.

At the 100 TB design point "how often does token X appear" cannot
afford a full exact count table in memory on the serving side; the
count-min sketch (Cormode & Muthukrishnan 2005) answers it from a
CONSTANT d x w counter grid with a one-sided error guarantee
(estimate >= truth, overshoot <= eN with probability 1 - delta for
w = ceil(e/eps), d = ceil(ln 1/delta)).

The Spark shape matters more than the formula: building the grid is a
(row, bucket)-keyed hash aggregate whose map-side partial is AT MOST
d*w rows per task regardless of input size — the reducer receives
bounded data no matter how skewed the tokens are (the same reason
count-min beats exact counting under skew). Probing broadcasts the
finished grid (d*w rows, a few KB) and evaluates the d-way min as a
plain expression join — the probe never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h(item: Column, row: int, width: int) -> Column:
    """Row-i bucket for an item: first 8 md5 hex chars as an int, mod w.

    md5 keeps the oracle replayable in any SQL dialect; 8 hex chars
    (32 bits) is plenty for bucket selection and stays inside exact
    BIGINT arithmetic on both sides.
    """
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), item)), 1, 8), 16, 10
    ).cast("long") % width


def cms_build(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the d x w counter grid: (row, bucket, cnt).

    One exploded projection (d rows per occurrence — a constant
    factor, not a shuffle) into ONE hash aggregate keyed by
    (row, bucket); partial combine bounds every map task's output at
    d*w rows.
    """
    item = F.col(item_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), _h(item, r, width).alias("bucket")
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    items: DataFrame,
    sketch: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Probe the grid for each distinct item: est = min over d rows.

    ``items`` is a frame with one row per item to query. The sketch
    (d*w rows) broadcasts; each of the d probes is a broadcast hash
    join, and the min folds them back per item. Adds column ``est``.
    """
    item = F.col(item_col).cast("string")
    out = items
    for r in range(depth):
        probe = sketch.filter(F.col("row") == r).select(
            F.col("bucket").alias(f"_b{r}"), F.col("cnt").alias(f"_c{r}")
        )
        out = out.join(
            F.broadcast(probe),
            _h(item, r, width) == F.col(f"_b{r}"),
            "left",
        ).drop(f"_b{r}")
    probes = [F.coalesce(F.col(f"_c{r}"), F.lit(0)) for r in range(depth)]
    est = probes[0] if depth == 1 else F.least(*probes)
    return out.select(
        *[c for c in items.columns], est.cast("long").alias("est")
    )


def cms_vs_exact(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """End-to-end accuracy report: every distinct item's exact count
    next to its sketch estimate and the (always >= 0) overshoot.

    Output: (item, exact, est, overshoot). Two passes over the input
    (grid build + exact counts — the exact side exists only for the
    report; production probes skip it), then the broadcast probe.
    """
    exact = df.groupBy(F.col(item_col).alias("item")).agg(
        F.count(F.lit(1)).cast("long").alias("exact")
    )
    sk = cms_build(df, item_col, depth, width)
    est = cms_estimate(exact, sk, "item", depth, width)
    return est.select(
        "item", "exact", "est", (F.col("est") - F.col("exact")).alias("overshoot")
    )
