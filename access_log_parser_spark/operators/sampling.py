"""Deterministic sampling operators for training-data pipelines.

Random sampling (``df.sample``) is not reproducible across engines or
cluster sizes; training-data curation wants *content-addressed* sampling
so that the same document always lands in the same split regardless of
partitioning, executor count, or engine. Both operators here are pure
JVM-side column expressions (whole-stage codegen, no shuffle for the
hash sample; one shuffle on the stratum key for the stratified top-n) and
are reproduced bit-for-bit by a DuckDB oracle in ``__spark_entry__``.

Scale notes (100 TB): the hash-mod sample is a narrow map-side filter —
it composes with parquet scan pruning and costs nothing beyond the md5;
the stratified sample shuffles once on the stratum column and keeps only
n rows per stratum via a window, so output size is bounded by
n x |strata| regardless of input size. For heavily skewed strata the
window sort is bounded per stratum by the shuffle partition, and AQE
skew-split keeps partitions balanced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(c: Column, buckets: int) -> Column:
    """Stable content-addressed bucket in [0, buckets): first 8 hex chars
    of md5 as an integer, mod buckets. Engine-portable (no hash seed)."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % buckets


def hash_mod_sample(
    df: DataFrame, key_col: str, buckets: int, keep: int = 0
) -> DataFrame:
    """Keep rows whose md5-derived bucket equals ``keep`` — a deterministic
    1/buckets sample keyed on content, stable under repartitioning.

    The reference has no sampling (its corpus fits one reader); at
    10^12 docs a reproducible split operator is the first thing a
    train/holdout pipeline needs.
    """
    return df.filter(hash_bucket(F.col(key_col), buckets) == keep)


def stratified_sample(
    df: DataFrame, stratum_col: str, key_col: str, n_per_stratum: int
) -> DataFrame:
    """Deterministic n-per-stratum sample: rank rows inside each stratum by
    (md5(key), key) and keep the first n. One shuffle on the stratum key;
    the md5 order is a reproducible stand-in for a random draw.
    """
    order = [F.md5(F.col(key_col).cast("string")).asc(), F.col(key_col).asc()]
    w = Window.partitionBy(stratum_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def split_train_holdout(
    df: DataFrame, key_col: str, holdout_buckets: int = 100, holdout_keep: int = 0
) -> tuple[DataFrame, DataFrame]:
    """Content-addressed train/holdout split: the holdout is the rows whose
    hash bucket equals ``holdout_keep``; train is everything else. The two
    sides are disjoint and exhaustive by construction, and membership is a
    pure function of the key — re-running on new data never moves an old
    document across the split (the leakage guarantee training pipelines
    need)."""
    b = hash_bucket(F.col(key_col), holdout_buckets)
    return (
        df.filter(b != holdout_keep),
        df.filter(b == holdout_keep),
    )
