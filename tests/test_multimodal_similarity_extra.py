"""Resize/feature-extract stubs and IVF ANN."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from access_log_parser_spark.operators import multimodal, similarity


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(
        [(1, bytearray(b"img-one-bytes")), (2, bytearray(b"img-two"))],
        "media_id long, payload binary",
    )


def test_resize_stub_shape(spark, media):
    out = {r["media_id"]: r for r in
           multimodal.resize_media(media, "media_id", "payload", 64, 64).collect()}
    assert out[1]["width"] == 64 and out[1]["height"] == 64
    assert len(bytes(out[1]["payload"])) == 64 * 64 // 64
    # deterministic
    again = multimodal.resize_media(media, "media_id", "payload", 64, 64).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in again} == {
        k: bytes(v["payload"]) for k, v in out.items()
    }


def test_feature_extract_stub(spark, media):
    out = {r["media_id"]: r["features"] for r in
           multimodal.extract_features(media, "media_id", "payload").collect()}
    v = np.array(out[1])
    assert v.shape == (multimodal.FEATURE_DIM,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5  # unit-normalized
    assert out[1] != out[2]


def test_ivf_ann_finds_planted_neighbor(spark):
    rng = np.random.RandomState(11)
    base = rng.randn(20, 8).astype(np.float32)
    base[1] = base[0] + 0.01 * rng.randn(8).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    # deterministic centroids: first 3 corpus vectors
    cents = [(i, [float(x) for x in base[i]]) for i in range(3)]
    out = similarity.ivf_ann(df, df.filter(F.col("vec_id") == 0), cents, k=3)
    ids = [r["neighbor_id"] for r in out.orderBy("rank").collect()]
    assert 1 in ids  # near-identical vector shares the cell


def test_ivf_assign_partitions_corpus(spark):
    rng = np.random.RandomState(3)
    base = rng.randn(30, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    cents = [(i, [float(x) for x in base[i]]) for i in range(4)]
    cells = similarity.ivf_assign(df, cents)
    assert cells.count() == 30
    assert cells.select("cell").distinct().count() <= 4
    # each centroid lands in its own cell
    own = {r["id"]: r["cell"] for r in cells.filter(F.col("id") < 4).collect()}
    assert all(own[i] == i for i in range(4))


def test_ann_recall_vs_brute_force(spark):
    """Approximate ANN quality, two honest properties:

    - IVF (nprobe=1 over 3 cells) keeps a meaningful share of the exact
      top-5 on random data — its probed cell is the query's own cell.
    - LSH must retrieve PLANTED exact-duplicate vectors (identical sign
      pattern => same bucket in every table). Random near-orthogonal
      vectors carry no signal for hyperplane LSH, so no recall floor is
      asserted for them — planted-dup retrieval is the property.
    """
    from pyspark.sql import functions as F

    from access_log_parser_spark.operators.similarity import (
        cosine_topk,
        ivf_ann,
        lsh_ann,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    truth = {}
    for r in cosine_topk(emb, queries, k=5).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 3).collect()
    ]
    got = {}
    for r in ivf_ann(emb, queries, cents, k=5).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    recall = hits / sum(len(v) for v in truth.values())
    assert recall >= 0.3, ("ivf", recall)

    # plant exact duplicates of the queries under new ids
    dups = queries.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    planted = emb.unionAll(dups)
    found = {}
    for r in lsh_ann(planted, queries, k=5, dim=64).collect():
        found.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    n_found = sum(1 for q in range(10) if (q + 100000) in found.get(q, set()))
    assert n_found == 10, found  # every planted dup retrieved


def test_ivf_nprobe_probes_extra_cells(spark):
    """nprobe=2 must recover a neighbor whose cell differs from the
    query's primary cell, and fan out ONLY the query side."""
    import math

    # centroids along two axes; query sits between them, its true
    # neighbor lives in the second-best cell
    dim = 4
    def vec(*xs):
        return [float(x) for x in xs] + [0.0] * (dim - len(xs))
    rows = [
        (0, vec(1.0, 0.0)),          # centroid/corpus in cell 0
        (1, vec(0.0, 1.0)),          # centroid/corpus in cell 1
        (10, vec(0.9, 0.45)),        # query: cell 0 primary, cell 1 second
        (11, vec(0.1, 0.99)),        # near-neighbor of the query, cell 1
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<float>"
    )
    cents = [(0, vec(1.0, 0.0)), (1, vec(0.0, 1.0))]
    q = df.filter(df.vec_id == 10)
    got1 = {r["neighbor_id"] for r in
            similarity.ivf_ann(df, q, cents, k=3, nprobe=1).collect()}
    got2 = {r["neighbor_id"] for r in
            similarity.ivf_ann(df, q, cents, k=3, nprobe=2).collect()}
    assert 11 not in got1          # cell-1 resident invisible at nprobe=1
    assert {0, 1, 11} == got2      # visible once the second cell is probed
    # assignment fan-out is bounded: |queries| x nprobe rows
    multi = similarity.ivf_assign_multi(q, cents, nprobe=2)
    assert multi.count() == 2


# --- real image-header decode (magic bytes, no libraries) ---

def _png(w, h):
    import struct
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00" + b"\x00" * 4)


def _jpeg(w, h):
    import struct
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _gif(w, h):
    import struct
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def _webp_vp8(w, h):
    import struct
    body = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h) + b"\x00" * 8
    return b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP" + b"VP8 " + struct.pack("<I", len(body)) + body


def _webp_vp8l(w, h):
    import struct
    bits = (w - 1) | ((h - 1) << 14)
    body = b"\x2f" + struct.pack("<I", bits) + b"\x00" * 8
    return b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP" + b"VP8L" + struct.pack("<I", len(body)) + body


def _webp_vp8x(w, h):
    import struct
    body = (b"\x00" * 4 + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
            + b"\x00" * 8)
    return b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP" + b"VP8X" + struct.pack("<I", len(body)) + body


@pytest.mark.parametrize(
    "maker,fmt",
    [(_png, "png"), (_jpeg, "jpeg"), (_gif, "gif"),
     (_webp_vp8, "webp"), (_webp_vp8l, "webp"), (_webp_vp8x, "webp")],
)
def test_parse_image_header_formats(maker, fmt):
    assert multimodal.parse_image_header(maker(640, 480)) == (640, 480, fmt)
    assert multimodal.parse_image_header(maker(1, 1)) == (1, 1, fmt)


def test_parse_image_header_rejects_garbage_and_truncation():
    assert multimodal.parse_image_header(b"not an image at all") is None
    assert multimodal.parse_image_header(b"") is None
    assert multimodal.parse_image_header(_png(9, 9)[:12]) is None
    # JPEG with no SOF marker (EOI right after SOI)
    assert multimodal.parse_image_header(b"\xff\xd8\xff\xd9") is None


class _FakeImg:
    """Minimal PIL.Image stand-in: 16 gray pixels 0,16,...,240."""

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def resize(self, wh):
        return self

    def convert(self, mode):
        return self

    def getdata(self):
        return [i * 16 for i in range(16)]

    def save(self, buf, format):
        buf.write(b"FAKEPNG:" + format.encode())


class _FakePIL:
    @staticmethod
    def open(bio):
        return _FakeImg()


class _RaisingPIL:
    @staticmethod
    def open(bio):
        raise OSError("cannot identify image file")


def test_pil_paths_engage_when_library_present(monkeypatch):
    """With PIL importable, _resize_one re-encodes via the library and
    _features_one computes the thumbnail feature; when PIL rejects the
    payload both fall through to the deterministic stubs (the contract
    in both modes)."""
    monkeypatch.setattr(multimodal, "_PIL_Image", _FakePIL)
    assert multimodal._resize_one(b"img", 224, 224) == b"FAKEPNG:PNG"
    v = multimodal._features_one(b"img")
    assert len(v) == 16 and abs(sum(x * x for x in v) - 1.0) < 1e-9
    # mean-centered thumbnail: first pixel (0) below mean, last above
    assert v[0] < 0 < v[-1]

    # PIL present but payload unreadable -> stub values, same shapes
    monkeypatch.setattr(multimodal, "_PIL_Image", _RaisingPIL)
    stub_r = multimodal._resize_one(b"img", 224, 224)
    stub_v = multimodal._features_one(b"img")
    monkeypatch.setattr(multimodal, "_PIL_Image", None)
    assert multimodal._resize_one(b"img", 224, 224) == stub_r
    assert multimodal._features_one(b"img") == stub_v
    assert len(stub_v) == multimodal.FEATURE_DIM


def test_parse_image_header_jpeg_stops_at_sos_and_eoi():
    """The marker walk must stop at SOS/EOI: 0xFF bytes inside
    entropy-coded scan data are NOT markers, so a spurious 0xFFC0 after
    SOS must not be parsed as a frame header (round-2 ADVICE)."""
    import struct
    # SOS before any SOFn (corrupt layout), then scan bytes containing a
    # fake SOF0 with garbage dims — must fall through to None
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x00\x00\x00\x3f\x00"
    fake_sof = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 9999, 9999) + b"\x03" + b"\x00" * 9
    assert multimodal.parse_image_header(b"\xff\xd8" + sos + fake_sof + b"\xff\xd9") is None
    # fake SOF after EOI likewise ignored
    assert multimodal.parse_image_header(b"\xff\xd8\xff\xd9" + fake_sof) is None
    # 0xFF00 stuffing and 0xFF fill bytes before a REAL SOF are skipped
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    real_sof = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 48, 64) + b"\x03" + b"\x00" * 9
    data = b"\xff\xd8" + app0 + b"\xff\x00" + b"\xff\xff" + real_sof + b"\xff\xd9"
    assert multimodal.parse_image_header(data) == (64, 48, "jpeg")


def test_decode_media_real_headers_strict(spark):
    """strict=True succeeds on recognized headers (real dims, no stub) and
    fails only on unrecognized payloads."""
    df = spark.createDataFrame(
        [(1, bytearray(_png(320, 200))), (2, bytearray(_jpeg(64, 48))),
         (3, bytearray(_webp_vp8l(100, 50)))],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in
           multimodal.decode_media(df, "media_id", "payload", strict=True).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["format"]) == (320, 200, "png")
    assert (out[2]["width"], out[2]["height"], out[2]["format"]) == (64, 48, "jpeg")
    assert (out[3]["width"], out[3]["height"], out[3]["format"]) == (100, 50, "webp")
