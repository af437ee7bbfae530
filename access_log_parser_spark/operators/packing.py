"""Sequence packing for training pipelines: assign documents to packs of
roughly ``budget`` tokens so short documents share a training example.

Two strategies:

- :func:`pack_streaming` — "streaming bin fill": within each shard,
  documents (in a deterministic order) accumulate; a document starts at
  pack ``floor(cumsum_before / budget)``. Pure window cumsum, whole-stage
  codegen, and exactly reproducible in SQL (the DuckDB oracle) — packs
  can overflow by at most one document, the standard large-scale
  approximation.
- :func:`pack_greedy` — exact greedy reset packing (a pack never exceeds
  the budget unless a single document alone does): per-shard sequential
  scan, so it runs as ``applyInPandas`` per shard — the canonical
  "per-key imperative logic" escape hatch, bounded by shard size.

Shards come from the content-addressed bucket (operators/sampling.py), so
both strategies are stable under repartitioning and cluster size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_streaming(
    df: DataFrame,
    budget: int,
    shard_col: str,
    order_col: str = "doc_id",
    token_col: str = "ws_tokens",
) -> DataFrame:
    """(shard, order, tokens) -> + pack_id via floor(cumsum_before/budget)."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(
        "pack_id", F.floor(cum_before / budget).cast("long")
    )


PACK_SCHEMA_FIELDS = [
    StructField("doc_id", LongType()),
    StructField("pack_id", LongType()),
    StructField("pack_tokens", LongType()),
]


def pack_greedy(
    df: DataFrame,
    budget: int,
    shard_col: str,
    order_col: str = "doc_id",
    token_col: str = "ws_tokens",
) -> DataFrame:
    """Exact greedy packing per shard: close the pack when adding the next
    document would exceed ``budget``. Returns (doc_id, pack_id,
    pack_tokens) with pack_id globally unique via (shard, local pack)."""
    schema = StructType(
        [StructField(shard_col, LongType())] + PACK_SCHEMA_FIELDS
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        shard = int(pdf[shard_col].iloc[0])
        rows = []
        pack, used = 0, 0
        for doc, tok in zip(pdf[order_col], pdf[token_col]):
            tok = int(tok)
            if used and used + tok > budget:
                pack += 1
                used = 0
            used += tok
            rows.append((shard, int(doc), pack, used))
        out = pd.DataFrame(rows, columns=[shard_col, "doc_id", "pack_id", "pack_tokens"])
        # pack_tokens: total of the pack each doc landed in
        out["pack_tokens"] = out.groupby("pack_id")["pack_tokens"].transform("max")
        return out

    return df.select(shard_col, order_col, token_col).groupBy(shard_col).applyInPandas(
        run, schema
    )
