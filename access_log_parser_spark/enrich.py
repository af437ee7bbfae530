"""Enrichment joins: broadcast lookups + skew-safe repartitioning.

The reference has no joins (SURVEY.md §2.3); the graft's north_rule adds
lookup enrichment (lang/geo maps). Small dimension tables are broadcast
(hash join, no shuffle of the fact side); skewed url-host keys get
explicit salting on top of AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_enrich(
    facts: DataFrame,
    lookup: DataFrame,
    on: str | list[str] | Column,
    how: str = "left",
) -> DataFrame:
    """Left-join a small lookup via broadcast hash join: zero shuffle on the
    100 TB side, the plan must show BroadcastHashJoin."""
    return facts.join(F.broadcast(lookup), on=on, how=how)


def ip_prefix_enrich(
    facts: DataFrame,
    geo: DataFrame,
    ip_col: str = "remote_ip",
    prefix_col: str = "ip_prefix",
) -> DataFrame:
    """Geo enrich on the /24-style dotted prefix of an IP column
    (FIXTURES.md §2 geo_map)."""
    prefix = F.substring_index(F.col(ip_col), ".", 3)
    return facts.withColumn("_ip_prefix", prefix).join(
        F.broadcast(geo.withColumnRenamed(prefix_col, "_ip_prefix")),
        on="_ip_prefix",
        how="left",
    ).drop("_ip_prefix")


def salted_repartition(
    df: DataFrame, key: str | Column, buckets: int, num_partitions: int | None = None
) -> DataFrame:
    """Explicit skew mitigation: repartition by (key, salt) so one hot key
    (e.g. a host owning >=50% of a crawl) spreads over ``buckets`` reducers.
    Use ahead of per-key groupBy when AQE alone can't split a single
    aggregation key. Salt is deterministic (hash of a per-row coordinate),
    not random, so reruns are stable."""
    key_col = F.col(key) if isinstance(key, str) else key
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(buckets))
    salted = F.concat(key_col.cast("string"), F.lit("#"), salt.cast("string"))
    if num_partitions:
        return df.repartition(num_partitions, salted)
    return df.repartition(salted)


def binned_range_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_size: int = 1 << 16,
    broadcast: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Join each fact to the range row(s) with ``lo <= value < hi`` —
    IP->geo blocks, size->tier tables, time->maintenance windows.

    Spark plans a bare non-equi join as BroadcastNestedLoopJoin
    (O(|facts| x |ranges|) compares, banned by the plan-discipline
    sweep). The standard scale rewrite: explode every range into the
    fixed-width bins it covers (``sequence(floor(lo/b), floor((hi-1)/b))``,
    one row per bin), derive the fact's bin with the same floor, and
    hash-join on the bin with the exact ``lo <= v < hi`` residual as an
    extra join predicate. Each fact is compared only against ranges
    touching its bin.

    Pick ``bin_size`` near the typical range width: expansion factor is
    ~width/bin_size + 1 rows per range. ``broadcast=True`` (default) for
    dimension-sized range tables — zero shuffle on the fact side; set
    False for huge range sets (millions of CIDR blocks x many bins) and
    the equi-join shuffles both sides by bin, which stays uniform because
    bins are fixed-width. Overlapping ranges yield one output row per
    covering range, as a SQL range join would.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left': {how!r}")
    b = F.lit(int(bin_size)).cast("bigint")
    lo, hi = F.col(lo_col).cast("bigint"), F.col(hi_col).cast("bigint")
    binned = ranges.withColumn(
        "_bin", F.explode(F.sequence(F.floor(lo / b), F.floor((hi - F.lit(1)) / b)))
    )
    right = F.broadcast(binned) if broadcast else binned
    v = facts[value_col].cast("bigint")
    cond = (
        (binned["_bin"] == F.floor(v / b))
        & (v >= binned[lo_col].cast("bigint"))
        & (v < binned[hi_col].cast("bigint"))
    )
    return facts.join(right, on=cond, how=how).drop("_bin")


def two_phase_count(df: DataFrame, key: str, buckets: int = 16) -> DataFrame:
    """Skew-proof groupBy(key).count(): partial agg on (key, salt), final on
    key — the classic salting rewrite; both stages are hash aggs with
    map-side combine, so the hot key never lands on a single reducer."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return partial.groupBy(key).agg(F.sum("_c").alias("count"))


def key_skew_profile(
    df: DataFrame, key: str, topk: int = 10
) -> DataFrame:
    """Pre-shuffle skew diagnosis: the evidence a pipeline inspects
    BEFORE deciding where :func:`salted_repartition` /
    :func:`two_phase_count` / AQE skew-join hints are needed. Every
    groupBy/join on ``key`` sends each key's rows to one reducer, so
    the hot-key share IS the stage's parallelism ceiling: a key holding
    20%% of rows caps the shuffle at 5 effective reducers no matter the
    cluster size.

    Returns the ``topk`` heaviest keys, one row each:
    (rank, key, n_rows, share, imbalance) — share = n_rows/total,
    imbalance = n_rows/mean-rows-per-distinct-key, both rounded to 6 dp
    (imbalance ~1 everywhere = uniform; imbalance >> buckets = salt).

    Plan at 100 TB: ONE key-keyed count with map-side combine (itself
    skew-prone, but a count's partial agg collapses the hot key's rows
    to one partial per map task — the diagnosis never suffers the
    disease it measures), a 1-row global aggregate broadcast back, and
    TakeOrderedAndProject for the top-k (per-partition top-k + a k-row
    merge — NEVER a global window over the key table, which would
    single-partition a million-host count at web scale; the rank
    window runs over the <= topk survivors only). Output <= topk
    rows."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_distinct"),
    )
    top = counts.orderBy(
        F.col("n_rows").desc(), F.col("key").asc()
    ).limit(topk)
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc())
    return (
        top.join(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w))
        .select(
            F.col("rank").cast("long").alias("rank"),
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
            F.round(
                F.col("n_rows") / (F.col("_total") / F.col("_distinct")), 6
            ).alias("imbalance"),
        )
    )
