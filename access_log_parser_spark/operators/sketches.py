"""Bounded-state sketches: count-min (frequency) and HyperLogLog
(cardinality).

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

The HyperLogLog half (Flajolet-Fuks-Gandouet-Meunier 2007) is the
matching cardinality sketch: "how many distinct users" from m = 2^b
max-of-rho registers. Spark's built-in ``approx_count_distinct`` IS an
HLL++, but its register hash is engine-private — these functions build
the register TABLE itself from an md5-derived hash, so (a) the sketch
is a first-class mergeable dataset that can be stored, unioned across
days, and re-estimated without touching raw data (max() commutes — the
same partial/final shape as any hash agg), and (b) a SQL oracle in any
dialect replays it bit-for-bit. Estimation arithmetic is kept EXACT
until the final division: the indicator sum Z = sum(2^-rho) is scaled
to integers (sum of shifted 1-bits), so no float-summation-order
nondeterminism can split engines.
"""

from __future__ import annotations

import math

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


HLL_HASH_BITS = 60  # 15 md5 hex chars: inside exact BIGINT on any engine


def hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias constant for m registers (m >= 16)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(
    df: DataFrame, item_col: str, group_cols: list[str] | None = None, b: int = 8
) -> DataFrame:
    """Build the HLL register table: (group..., bucket, rho) with
    rho = max over the group's items hashing into the bucket.

    hash = first 15 md5 hex chars (60 bits, exact BIGINT everywhere);
    bucket = low b bits; rho = leading-zero count of the remaining
    W = 60-b bits, plus 1 — computed as W - length(bin(w)) + 1, which
    is integer-exact (length(bin(w)) = floor(log2 w)+1 with no float
    log anywhere). ONE hash aggregate keyed by (group, bucket): the
    map-side partial is at most m rows per group per task regardless
    of input size, and registers from different days/partitions merge
    by max() — the mergeability that makes the sketch storable.
    """
    group_cols = group_cols or []
    w_bits = HLL_HASH_BITS - b
    m = 1 << b
    h = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    bucket = h % m
    w = F.shiftright(h, b)  # h div m via bit shift: exact, no float div
    rho = F.when(w > 0, F.lit(w_bits + 1) - F.length(F.bin(w))).otherwise(
        F.lit(w_bits + 1)
    )
    return (
        df.filter(F.col(item_col).isNotNull())
        .select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").cast("int").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None, b: int = 8
) -> DataFrame:
    """Estimate distinct counts per group from a register table.

    Z's float-sum order-dependence is removed by exact integer scaling:
    each register contributes 2^(SCALE - rho) (a shifted 1-bit, SCALE =
    W+1 >= max rho), empty registers contribute 2^SCALE, so the sum is
    a plain BIGINT (bounded by m * 2^W = 2^60 — no overflow) and the
    single final division is the only float op. Small-range correction
    (linear counting, E <= 2.5m with empty registers present) applies
    per the 2007 paper; the 32-bit large-range correction is obsolete
    here (60-bit hash space). Output: (group..., est).
    """
    group_cols = group_cols or []
    w_bits = HLL_HASH_BITS - b
    m = 1 << b
    scale = w_bits + 1
    alpha = hll_alpha(m)
    # SQL form: the Python shiftleft() helper takes only a literal count
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - rho)")
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("_filled"),
        F.sum(term).cast("long").alias("_zint"),
    )
    v = F.lit(m) - F.col("_filled")  # empty registers
    # denom stays an exact BIGINT (v*2^SCALE + Zint <= 2^62) until the
    # one final IEEE division — no accumulation-order float effects
    denom = F.shiftleft(v.cast("long"), scale) + F.col("_zint")
    raw = F.lit(alpha * m * m * float(2**scale)) / denom.cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 4).alias("est"))


def hll_vs_exact(
    df: DataFrame, item_col: str, group_cols: list[str] | None = None, b: int = 8
) -> DataFrame:
    """Accuracy report per group: HLL estimate next to the exact
    distinct count and the relative error. The exact side exists only
    for the report (it is the thing the sketch replaces at scale).

    Output: (group..., exact_n, est, rel_err).
    """
    group_cols = group_cols or []
    est = hll_estimate(hll_registers(df, item_col, group_cols, b), group_cols, b)
    exact = (
        df.filter(F.col(item_col).isNotNull())
        .groupBy(*group_cols)
        .agg(F.count_distinct(F.col(item_col)).cast("long").alias("exact_n"))
    )
    joined = (
        est.join(exact, group_cols) if group_cols else est.crossJoin(exact)
    )
    return joined.select(
        *group_cols,
        "exact_n",
        "est",
        F.round(
            F.abs(F.col("est") - F.col("exact_n")) / F.col("exact_n"), 4
        ).alias("rel_err"),
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
