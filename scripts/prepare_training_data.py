"""spark-submit entry point for the training-data preparation pipeline —
the stage a 100-TB deployment runs between the curated web corpus and the
trainer. Composes the repo's curation / dedup / sampling / packing
operators end-to-end:

    1. curate          pipeline.curate_corpus (join-free gate battery:
                       quality, repetition, optional Gopher + C4 lines,
                       PII scrub, paragraph + exact dedup; stats ride ONE
                       action via observe)
    2. cross-snapshot  optional --prev snapshot: drop re-crawls with the
                       exact+MinHash anti-joins (dedup.cross_snapshot_dedup)
    3. near-dup        MinHash -> LSH pairs -> connected components ->
                       cluster_canonical keeps the HIGHEST-quality member
                       per near-dup cluster
    4. sample          optional temperature-flattened domain mixture
                       (sampling.temperature_mixture_sample, --alpha)
    5. shuffle         deterministic epoch permutation
                       (sampling.epoch_shuffle, --epoch)
    6. pack + shard    token counts -> pack_streaming(--budget) ->
                       content-addressed size-balanced shards (sinks)
    7. manifest        stage counts + pack/shard stats as JSON

Cluster usage (north_rule: multi-executor, spark-submit --py-files):

    spark-submit --py-files alp.zip scripts/prepare_training_data.py \
        --pages /data/pages_parquet --out /data/train --prev /data/prev \
        --epoch 0 --budget 2048 --shards 64

Local demo (synthesizes a deterministic pages corpus first):

    python scripts/prepare_training_data.py --synth 2000 --out /tmp/alp_train

Every stage is a composition of operators that are individually
oracle-verified in __spark_entry__ (the driver CORRECTNESS gate); this
script adds only plumbing and the manifest.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def prepare(
    spark,
    pages,
    out_dir: str,
    prev=None,
    epoch: int = 0,
    budget: int = 2048,
    n_shards: int = 8,
    alpha: float = 0.0,
    gopher: bool = False,
    c4_lines: bool = False,
    quality_min: float = 0.3,
    rep_max: float = 0.9,
    checkpoint_dir: str | None = None,
) -> dict:
    """Run the full preparation pass; returns the manifest dict.

    ``checkpoint_dir`` (optional) makes the iterative
    connected-components stage use reliable checkpoints instead of
    localCheckpoint — pass a durable path on a real cluster so an
    executor loss mid-iteration recovers instead of failing the job."""
    from pyspark.sql import functions as F

    from access_log_parser_spark.operators.dedup import (
        cluster_canonical,
        connected_components,
        cross_snapshot_dedup,
        lsh_candidate_pairs,
        minhash_signatures_hof,
    )
    from access_log_parser_spark.operators.packing import (
        pack_manifest,
        pack_streaming,
    )
    from access_log_parser_spark.operators.sampling import (
        epoch_shuffle,
        temperature_mixture_sample,
    )
    from access_log_parser_spark.operators.text_quality import (
        quality_score_col,
        tokens,
    )
    from access_log_parser_spark.pipeline import curate_corpus
    from access_log_parser_spark.sinks import write_training_shards

    manifest: dict = {"stages": {}}

    # 1. curation battery (its own per-stage stats ride one action)
    curated, stats = curate_corpus(
        pages, gopher=gopher, c4_lines=c4_lines, collect_stats=True,
        quality_min=quality_min, rep_max=rep_max,
    )
    manifest["stages"]["curate"] = stats

    # 2. optional cross-snapshot dedup against the previous crawl
    if prev is not None:
        curated = cross_snapshot_dedup(curated, prev)
        manifest["stages"]["after_cross_snapshot"] = curated.count()

    # 3. near-dup clusters resolved to the highest-quality member.
    #    The candidate graph and components run on (doc_id, text) only;
    #    the winners join back on doc_id to recover url/text.
    pairs = lsh_candidate_pairs(
        minhash_signatures_hof(curated), distinct=False
    )
    assign = connected_components(
        curated.select("doc_id"), pairs, checkpoint_dir=checkpoint_dir
    )
    scored = assign.join(
        curated.select(
            "doc_id", quality_score_col(F.col("text")).alias("_q")
        ),
        "doc_id",
    )
    winners = cluster_canonical(scored, "_q").select("doc_id")
    # PERSIST the post-near-dup corpus: everything downstream (stage
    # counts, packing, shard write, checksums) is an eager action over
    # it — without the persist each action re-runs the full
    # curate -> MinHash -> LSH -> components chain from scratch.
    curated = _pinned = curated.join(winners, "doc_id", "left_semi").persist()
    try:
        manifest["stages"]["after_near_dup"] = curated.count()

        # 4. optional temperature-flattened domain mixture
        if alpha > 0:
            host = F.regexp_extract(F.col("url"), r"^[a-z]+://([^/:?#]*)", 1)
            curated = temperature_mixture_sample(
                curated.withColumn("_host", host),
                stratum_col="_host",
                key_col="doc_id",
                alpha=alpha,
            ).drop("_host")
            manifest["stages"]["after_mixture"] = curated.count()

        # 5. deterministic epoch order; 6. token counts -> packs -> shards
        ordered = epoch_shuffle(curated, key_col="doc_id", epoch=epoch)
        ordered = ordered.withColumn(
            "ws_tokens", F.size(tokens(F.col("text"))).cast("long")
        )
        from access_log_parser_spark.operators.sampling import hash_bucket

        ordered = ordered.withColumn(
            "shard", hash_bucket(F.col("doc_id"), n_shards)
        )
        # packed feeds THREE actions (shard write, pack stats, manifest
        # parquet) — persist it so the pack window runs once
        packed = pack_streaming(
            ordered, budget=budget, shard_col="shard",
            order_col="position", token_col="ws_tokens",
        ).persist()
        try:
            sharded = write_training_shards(
                packed, out_dir, key_col="doc_id", n_shards=n_shards
            )

            pack_stats = (
                packed.groupBy("shard", "pack_id")
                .agg(F.sum("ws_tokens").alias("toks"))
                .agg(
                    F.count(F.lit(1)).alias("n_packs"),
                    F.max("toks").alias("max_pack_tokens"),
                )
                .collect()[0]
            )
            manifest["packs"] = {
                "n_packs": pack_stats["n_packs"],
                # empty post-filter corpus: max() is NULL — keep the
                # manifest machine-readable with an explicit 0
                "max_pack_tokens": pack_stats["max_pack_tokens"] or 0,
                "budget": budget,
            }
            manifest["shards"] = {
                str(r["shard"]): r["n"]
                for r in sharded.groupBy("shard")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            # pack boundaries (attention-reset metadata) + order-invariant
            # integrity digests ride along as parquet/manifest artifacts
            pack_manifest(packed).write.mode("overwrite").parquet(
                str(Path(out_dir) / "_pack_manifest")
            )
        finally:
            packed.unpersist()
        from access_log_parser_spark.operators.sampling import shard_checksums

        manifest["checksums"] = {
            str(r["shard"]): r["checksum"]
            for r in shard_checksums(
                curated, key_col="doc_id", n_shards=n_shards
            ).collect()
        }
    finally:
        _pinned.unpersist()  # alpha>0 rebinds curated; release the persisted frame
    manifest["epoch"] = epoch
    Path(out_dir, "_manifest.json").write_text(json.dumps(manifest, indent=2))
    return manifest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages parquet dir (url, ..., text)")
    ap.add_argument("--synth", type=int, default=0, help="synthesize N pages")
    ap.add_argument("--prev", help="previous snapshot pages parquet dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--epoch", type=int, default=0)
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--alpha", type=float, default=0.0,
                    help="temperature-mixture alpha (0 = no resample)")
    ap.add_argument("--quality-min", type=float, default=0.3)
    ap.add_argument("--rep-max", type=float, default=0.9)
    ap.add_argument("--gopher", action="store_true")
    ap.add_argument("--c4-lines", action="store_true")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="reliable checkpoint dir for the iterative "
                         "connected-components stage (cluster deploys)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from access_log_parser_spark.pages import synth_pages
    from access_log_parser_spark.pipeline import curate_corpus  # noqa: F401
    from access_log_parser_spark.session import get_spark

    spark = get_spark(app_name="alp-train-prep", master=args.master)
    if args.synth:
        pages = synth_pages(spark, args.synth)
    elif args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        ap.error("one of --pages / --synth is required")
    prev = None
    if args.prev:
        from access_log_parser_spark.pipeline import curate_corpus as _cc
        prev_pages = spark.read.parquet(args.prev)
        prev, _ = _cc(prev_pages, collect_stats=False)
    manifest = prepare(
        spark, pages, args.out, prev=prev, epoch=args.epoch,
        budget=args.budget, n_shards=args.shards, alpha=args.alpha,
        gopher=args.gopher, c4_lines=args.c4_lines,
        quality_min=args.quality_min, rep_max=args.rep_max,
        checkpoint_dir=args.checkpoint_dir,
    )
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
