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
