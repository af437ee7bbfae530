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


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Split documents into fixed-size context windows (the step before
    sequence packing when docs exceed the model's context length):
    full-length windows of ``chunk_tokens`` whitespace tokens starting at
    multiples of ``stride``, with the LAST window right-aligned to the
    document end (``start = min(i*stride, n - chunk_tokens)``) so every
    token is covered, overlaps are exactly ``chunk_tokens - stride``, and
    no degenerate tail chunk is emitted. Docs with <= chunk_tokens tokens
    yield one chunk. Deterministic closed form:

        k = 1                                    if n <= chunk
            ceil((n - chunk) / stride) + 1       otherwise

    Returns (doc_id, chunk_id, start_pos, n_chunk_tokens, chunk_text).

    Scale shape: pure per-row HOF expansion (sequence -> transform ->
    posexplode) — no shuffle at all; output size is bounded by
    ~n/stride chunks per doc. Integer math throughout (floor-div ceil),
    so the oracle reproduces starts exactly.
    """
    if stride <= 0 or chunk_tokens <= 0 or stride > chunk_tokens:
        raise ValueError(
            f"need 0 < stride <= chunk_tokens: stride={stride}, chunk={chunk_tokens}"
        )
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n = F.size(toks)
    c, s = F.lit(chunk_tokens), F.lit(stride)
    k = F.when(n <= c, F.lit(1)).otherwise(
        F.floor((n - c + s - F.lit(1)) / s).cast("int") + 1
    )
    starts = F.transform(
        F.sequence(F.lit(0), k - 1), lambda i: F.least(i * s, F.greatest(n - c, F.lit(0)))
    )
    chunks = F.transform(starts, lambda st: F.struct(
        st.cast("long").alias("start_pos"),
        F.slice(toks, st + 1, chunk_tokens).alias("_ctoks"),
    ))
    return df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(chunks).alias("chunk_id", "_c")
    ).select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("_c.start_pos").alias("start_pos"),
        F.size("_c._ctoks").cast("long").alias("n_chunk_tokens"),
        F.array_join("_c._ctoks", " ").alias("chunk_text"),
    )


def pack_manifest(
    packed: DataFrame,
    shard_col: str = "shard",
    order_col: str = "position",
    token_col: str = "ws_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boundary manifest for packed training sequences: for every
    (shard, pack_id) emit the ordered member doc ids and each member's
    token OFFSET inside the pack — the metadata an attention-mask-aware
    trainer needs to reset attention at document boundaries instead of
    attending across packed neighbors.

    Input: :func:`pack_streaming` output. Returns
    (shard, pack_id, n_docs, pack_tokens, doc_ids array<long>,
    offsets array<long>) with offsets[i] = sum of tokens of members
    0..i-1 (so offsets[0] = 0 and offsets[i+1]-offsets[i] = tokens[i]).

    Plan at scale: ONE exchange on (shard, pack_id) with the members
    collected per pack — pack size is budget-bounded by construction,
    so the collect_list is bounded too; the offset scan is a per-row
    HOF fold over that bounded array."""
    members = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(order_col).alias("o"),
                F.col(id_col).alias("id"),
                F.col(token_col).alias("t"),
            )
        )
    )
    g = packed.groupBy(shard_col, "pack_id").agg(members.alias("m"))
    toks = F.transform(F.col("m"), lambda s: s["t"])
    offsets = F.aggregate(
        toks,
        F.struct(
            F.array().cast("array<long>").alias("a"),
            F.lit(0).cast("long").alias("p"),
        ),
        lambda acc, t: F.struct(
            F.concat(acc["a"], F.array(acc["p"])).alias("a"),
            (acc["p"] + t).cast("long").alias("p"),
        ),
        lambda acc: acc["a"],
    )
    return g.select(
        shard_col,
        "pack_id",
        F.size("m").cast("long").alias("n_docs"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, t: a + t
        ).alias("pack_tokens"),
        F.transform(F.col("m"), lambda s: s["id"]).alias("doc_ids"),
        offsets.alias("offsets"),
    )
