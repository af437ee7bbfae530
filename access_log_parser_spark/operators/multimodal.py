"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, batching, partition shape) is real and
tested; the actual media decode is STUBBED — the container has no
image/audio libraries — behind a deterministic fake (or
NotImplementedError for the strict variant). Swap `_decode_image_stub`
for a real decoder (PIL/ffmpeg) on a production cluster; the mapInPandas
contract does not change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)


def binary_metadata(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """JVM-side metadata over a binary column: byte length + md5 digest.
    No Python, fully codegen'd — the cheap pre-filter before any decode."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.length(F.col(bin_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(bin_col)).alias("digest"),
    )


def _decode_image_stub(data: bytes) -> tuple[int, int, str]:
    """Deterministic fake decode: width/height/format derived from the md5
    digest. A real deployment replaces this body with PIL/libvips; the
    signature (bytes -> (w, h, fmt)) is the decode contract."""
    h = hashlib.md5(data).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, ("jpeg", "png", "webp")[h[2] % 3]


def decode_media(
    df: DataFrame, id_col: str, bin_col: str, strict: bool = False
) -> DataFrame:
    """Arrow-batched decode stage: one mapInPandas pass, binary column in,
    typed metadata struct out. ``strict=True`` raises NotImplementedError
    (no media libs in this sandbox) instead of using the fake decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "media decode requires image/audio libraries not present in "
                "this container; deploy with PIL/ffmpeg and replace "
                "_decode_image_stub"
            )
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(data)
                w, hgt, fmt = _decode_image_stub(raw)
                rows.append(
                    (int(mid), len(raw), hashlib.md5(raw).hexdigest(), w, hgt, fmt)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "digest", "width", "height", "format"],
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        run, MEDIA_META_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_media(
    df: DataFrame, id_col: str, bin_col: str, width: int = 224, height: int = 224
) -> DataFrame:
    """Resize stage plumbing: binary in -> (dims, binary) out, one
    mapInPandas pass. The stub 'resize' truncates/pads the payload
    deterministically; a real deployment swaps in PIL's resize while the
    schema, batching and partition shape stay identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height // 64  # fake byte budget
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(data)
                resized = (raw * (target // max(len(raw), 1) + 1))[:target]
                rows.append((int(mid), width, height, bytearray(resized)))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "payload"]
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(run, RESIZE_SCHEMA)


FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Feature-extraction stage plumbing: binary -> fixed-dim float vector
    (Arrow-batched). The stub derives 16 deterministic floats from the md5
    digest (unit-normalized); a real model (CLIP et al.) replaces the stub
    body; downstream ANN/dedup operators consume the vector unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for mid, data in zip(pdf[id_col], pdf[bin_col]):
                h = hashlib.md5(bytes(data)).digest()
                v = [(h[i] - 127.5) / 127.5 for i in range(FEATURE_DIM)]
                norm = sum(x * x for x in v) ** 0.5 or 1.0
                ids.append(int(mid))
                vecs.append([x / norm for x in v])
            yield pd.DataFrame({"media_id": ids, "features": vecs})

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, id_col: str, bin_col: str, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_idx) rows for
    frames 0, n, 2n... of a fake 100-frame clip. Real decoders replace the
    frame count with container metadata; the explode shape is the point."""
    frames = F.sequence(F.lit(0), F.lit(99), F.lit(every_n))
    return df.select(
        F.col(id_col).alias("media_id"), F.explode(frames).alias("frame_idx")
    )
