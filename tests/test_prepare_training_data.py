"""End-to-end smoke of scripts/prepare_training_data.py: the composed
curate -> near-dup -> mixture -> epoch-shuffle -> pack -> shard pass over
a varied corpus, with manifest invariants."""

from __future__ import annotations

import json
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from prepare_training_data import prepare  # noqa: E402


def _pages(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return docs.select(
        F.concat(
            F.lit("https://host-"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example/p/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        "text",
    )


def test_prepare_training_data_end_to_end(spark, tmp_path):
    out = str(tmp_path / "train")
    m = prepare(
        spark, _pages(spark), out,
        epoch=2, budget=256, n_shards=4, alpha=0.5,
        quality_min=0.0, rep_max=1.0,
    )
    st = m["stages"]
    # funnel is monotone from the url dedup on
    assert st["curate"]["input"] == 500
    assert st["curate"]["after_exact_dedup"] >= st["after_near_dup"] > 0
    assert st["after_near_dup"] >= st["after_mixture"] > 0
    # every surviving row landed in exactly one shard
    assert sum(m["shards"].values()) == st["after_mixture"]
    assert set(map(int, m["shards"])) <= set(range(4))
    # packs exist and respect the bin-fill shape: a pack overflows the
    # budget by at most one document (streaming bin-fill semantics)
    assert m["packs"]["n_packs"] >= 1
    # manifest persisted next to the shards
    disk = json.loads((tmp_path / "train" / "_manifest.json").read_text())
    assert disk["epoch"] == 2 and disk["shards"] == m["shards"]
    # shard directories really exist with parquet inside
    shard_dirs = sorted(p.name for p in (tmp_path / "train").glob("shard=*"))
    assert len(shard_dirs) == len(m["shards"])


def test_prepare_training_data_is_deterministic(spark, tmp_path):
    a = prepare(
        spark, _pages(spark), str(tmp_path / "a"),
        epoch=1, budget=512, n_shards=2, quality_min=0.0, rep_max=1.0,
    )
    b = prepare(
        spark, _pages(spark), str(tmp_path / "b"),
        epoch=1, budget=512, n_shards=2, quality_min=0.0, rep_max=1.0,
    )
    assert a == b  # same input + epoch -> identical manifest, bit for bit


def test_prepare_training_data_emits_pack_manifest_and_checksums(spark, tmp_path):
    out = str(tmp_path / "train")
    m = prepare(
        spark, _pages(spark), out,
        epoch=0, budget=256, n_shards=4, quality_min=0.0, rep_max=1.0,
    )
    assert set(m["checksums"]) == set(m["shards"])
    pm = spark.read.parquet(f"{out}/_pack_manifest")
    assert pm.count() == m["packs"]["n_packs"]
    # offsets[0] == 0 on every pack
    assert pm.filter(F.element_at("offsets", 1) != 0).count() == 0
