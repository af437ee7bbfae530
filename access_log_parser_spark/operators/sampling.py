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


def temperature_mixture_rates(
    df: DataFrame,
    stratum_col: str = "source",
    alpha: float = 0.5,
    target_frac: float = 0.5,
    ppm: int = 1_000_000,
) -> DataFrame:
    """Per-stratum keep rates for temperature-flattened mixture sampling
    (the multilingual-LM recipe: sample stratum s proportional to
    ``c_s**alpha`` so small domains are up-weighted relative to their
    raw frequency; alpha=1 is proportional, alpha=0 is uniform):

        w_s    = c_s**alpha / sum_s c_s**alpha
        rate_s = min(1, target_frac * N_total * w_s / c_s)

    Returns one row per stratum: (stratum, n_in, rate_ppm) with the rate
    quantized to parts-per-million (round-half-up via floor(x+0.5), so
    the oracle reproduces it bit-for-bit without float-tie drift).
    Stratum counts are ONE shuffle with map-side partial agg; the totals
    fold is driver-free (a 1-row broadcast, same pattern as idf)."""
    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_in")
    )
    tot = counts.agg(
        F.sum("n_in").alias("_n_total"),
        F.sum(F.pow("n_in", F.lit(float(alpha)))).alias("_z"),
    )
    w = F.pow("n_in", F.lit(float(alpha))) / F.col("_z")
    rate = F.least(
        F.lit(1.0), F.lit(float(target_frac)) * F.col("_n_total") * w / F.col("n_in")
    )
    return counts.join(F.broadcast(tot)).select(
        "stratum",
        F.col("n_in").cast("long").alias("n_in"),
        F.floor(rate * ppm + F.lit(0.5)).cast("long").alias("rate_ppm"),
    )


def temperature_mixture_sample(
    df: DataFrame,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    alpha: float = 0.5,
    target_frac: float = 0.5,
    ppm: int = 1_000_000,
) -> DataFrame:
    """Deterministic temperature-mixture resample: keep a row iff its
    content-addressed bucket (md5 of the key, uniform on [0, ppm)) falls
    below its stratum's ``rate_ppm`` from
    :func:`temperature_mixture_rates`. Membership is a pure function of
    (key, stratum counts) — stable under repartitioning and engine, the
    same leakage guarantee as :func:`split_train_holdout`.

    Plan at scale: the rate table is |strata| rows — broadcast hash join
    onto the fact side (zero fact shuffle), then a codegen filter; the
    only corpus shuffle is the count agg inside the rate builder."""
    rates = temperature_mixture_rates(df, stratum_col, alpha, target_frac, ppm)
    bucket = hash_bucket(F.col(key_col), ppm)
    return (
        df.join(
            F.broadcast(rates),
            df[stratum_col] == rates["stratum"],
        )
        .filter(bucket < F.col("rate_ppm"))
        .drop("stratum", "n_in", "rate_ppm")
    )
