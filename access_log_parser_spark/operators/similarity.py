"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  query set against the (huge) corpus; cosine is a pure JVM expression
  (``zip_with`` + ``aggregate``), ranking is one window per query. This is
  the correctness baseline and the right plan whenever |queries| is small:
  corpus-side work is a single scan, no shuffle until the per-query top-k
  (which AQE keeps tiny).
- :func:`lsh_ann` — the scale path: random-hyperplane LSH buckets (sign
  bits of deterministic md5-derived hyperplanes), candidate join on bucket
  key, exact re-rank within candidates. Recall < 1 by construction; the
  bucket key is reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SIM_ROUND = 6


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self-matches by
    id). Returns (query_id, neighbor_id, rank, cosine); ties broken by
    neighbor_id for determinism."""
    # norms are per-ROW constants: materialize them before the join, or
    # every candidate PAIR re-runs two O(d) aggregate passes (B^2 vs B
    # evaluations per bucket)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", _norm(F.col("qv")))
    cos = F.round(
        _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), SIM_ROUND
    )
    scored = (
        c.join(F.broadcast(q))  # corpus x small-query broadcast product
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplane_sign(vec_col, plane: int, dim: int):
    """Deterministic pseudo-random hyperplane: weight of dim j in plane p is
    +1 if md5("p:j") has an even first hex digit else -1. Cross-engine
    reproducible (md5 everywhere); good enough spread for bucketing."""
    import hashlib

    weights = [
        1.0 if int(hashlib.md5(f"{plane}:{j}".encode()).hexdigest()[0], 16) % 2 == 0 else -1.0
        for j in range(dim)
    ]
    w = F.array(*[F.lit(x) for x in weights])
    return (
        F.aggregate(
            F.zip_with(vec_col, w, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        >= 0
    ).cast("int")


def lsh_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    dim: int | None = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): bucket = sign-bit string over n_planes hyperplanes.

    ``dim`` must equal the vector width (the hyperplane weights are a
    static literal array, so it has to be known at plan time); pass
    ``dim=None`` to probe it from the data. Rows whose vectors do NOT
    have ``dim`` elements get a NULL bucket — without that gate,
    zip_with pads with NULLs, the sign aggregate goes NULL, concat_ws
    silently drops the NULL bits and EVERY row lands in the same ''
    bucket, degenerating the downstream bucket join to an O(n²) cross
    product that still "works"."""
    if dim is None:
        row = emb.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = row["d"] if row is not None else 1  # empty input: any plan
    v = _as_double(F.col(vec_col))
    bits = [_hyperplane_sign(v, p, dim).cast("string") for p in range(n_planes)]
    return emb.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        F.when(
            F.size(F.col(vec_col)) == F.lit(dim), F.concat_ws("", *bits)
        ).alias("bucket"),
    )


def ivf_assign(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (inverted-file cell).

    Centroids are a small driver-side list -> the argmax unrolls to a
    greatest-of-structs Catalyst expression, no join, no Python. A real
    deployment trains centroids with k-means (MLlib); for determinism here
    callers typically use a fixed sample of the corpus as centroids."""
    v = _as_double(F.col(vec_col))
    scored = [
        F.struct(
            _dot(v, F.array(*[F.lit(float(x)) for x in cvec])).alias("score"),
            F.lit(cid).alias("cell"),
        )
        for cid, cvec in centroids
    ]
    best = F.array_max(F.array(*scored))
    return emb.select(
        F.col(id_col).alias("id"), v.alias("v"), best["cell"].alias("cell")
    )


def ivf_assign_join(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Join-based nearest-centroid assignment — the production-k path.

    :func:`ivf_assign` unrolls the argmax into a literal Catalyst
    expression: ideal for tens of centroids (zero shuffle), but the
    plan grows linearly with k, so at web-scale k (thousands of
    k-means cells) the centroids belong in a DataFrame instead: a
    BROADCAST hash join fans each vector out against the k-row
    centroid table, then ONE per-id ``max(struct(score, cell, v))``
    aggregation picks the argmax — map-side partial combine means the
    single exchange carries one row per vector. The struct ordering
    reproduces :func:`ivf_assign`'s tie-break exactly (highest score,
    then highest centroid id; scores are identical doubles since both
    paths evaluate the same zip_with/aggregate dot product).

    Returns (id, v, cell) — the same contract as :func:`ivf_assign`.
    """
    cdf = emb.sparkSession.createDataFrame(
        [(int(cid), [float(x) for x in cvec]) for cid, cvec in centroids],
        "cell int, cvec array<double>",
    )
    v = _as_double(F.col(vec_col))
    base = emb.select(F.col(id_col).alias("id"), v.alias("v"))
    score = _dot(F.col("v"), F.col("cvec"))
    return (
        base.join(F.broadcast(cdf))
        .groupBy("id")
        .agg(
            F.max(
                F.struct(
                    score.alias("score"),
                    F.col("cell").alias("cell"),
                    F.col("v").alias("v"),
                )
            ).alias("_b")
        )
        .select("id", F.col("_b.v").alias("v"), F.col("_b.cell").alias("cell"))
    )


def ivf_assign_multi(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids: one output
    row per (vector, probed cell). Like :func:`ivf_assign`, the argmax —
    here arg-top-nprobe — unrolls to a sorted array-of-structs Catalyst
    expression (scores descending, centroid id ascending on ties), then
    a bounded explode: no join, no Python, fan-out exactly nprobe."""
    v = _as_double(F.col(vec_col))
    scored = [
        F.struct(
            (-_dot(v, F.array(*[F.lit(float(x)) for x in cvec]))).alias("neg"),
            F.lit(cid).alias("cell"),
        )
        for cid, cvec in centroids
    ]
    top = F.slice(F.array_sort(F.array(*scored)), 1, nprobe)
    return emb.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        F.explode(F.transform(top, lambda s: s["cell"])).alias("cell"),
    )


def ivf_ann(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF approximate NN: probe the query's ``nprobe`` nearest cells,
    exact cosine re-rank within the probed candidates. The cell join
    shuffles on a small integer key; corpus cells are the bucketing unit
    a production index would persist partitioned-by-cell for pruned
    scans. Raising ``nprobe`` trades candidates scanned for recall —
    only the QUERY side fans out (corpus rows stay single-cell), so
    corpus-side cost is unchanged."""
    c = ivf_assign(corpus, centroids, id_col, vec_col).withColumnRenamed(
        "id", "neighbor_id"
    ).withColumnRenamed("v", "cv").withColumn("cn", _norm(F.col("cv")))
    if nprobe <= 1:
        q = ivf_assign(queries, centroids, id_col, vec_col)
    else:
        q = ivf_assign_multi(queries, centroids, nprobe, id_col, vec_col)
    q = q.withColumnRenamed("id", "query_id").withColumnRenamed("v", "qv")
    q = q.withColumn("qn", _norm(F.col("qv")))
    # per-row norms materialized pre-join (see cosine_topk)
    cos = F.round(
        _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), SIM_ROUND
    )
    scored = (
        c.join(q, on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lsh_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine re-rank. At scale the bucket join shuffles each side once
    on a short key instead of broadcasting a cross product."""
    c = lsh_buckets(corpus, n_planes, dim, id_col, vec_col).withColumnRenamed(
        "id", "neighbor_id"
    ).withColumnRenamed("v", "cv").withColumn("cn", _norm(F.col("cv")))
    q = lsh_buckets(queries, n_planes, dim, id_col, vec_col).withColumnRenamed(
        "id", "query_id"
    ).withColumnRenamed("v", "qv").withColumn("qn", _norm(F.col("qv")))
    # per-row norms materialized pre-join (see cosine_topk)
    cos = F.round(
        _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), SIM_ROUND
    )
    scored = (
        c.join(q, on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column — the standard
    storage/serving compression for billion-vector ANN indexes (4x
    smaller than float32, SIMD-friendly dot products):

        scale  = max(|x_i|) / 127          (per vector)
        code_i = floor(x_i / scale + 0.5)  in [-127, 127]

    Everything is a JVM array higher-order expression over one scan —
    zero shuffle, zero Python, Arrow-free. The all-zero vector edge case
    quantizes to all-zero codes (scale 0 kept rather than NULL so
    dequantization `code * scale` stays well-defined).

    Cross-engine exactness: inputs are float32 read from parquet, math
    is IEEE-754 double in the same operation order on both engines, and
    `floor(+0.5)` rounds half-up identically — the driver oracle
    replays the codes bit-for-bit, no tolerance window.

    Returns (id, codes:array<int>, scale:double).
    """
    v = _as_double(F.col(vec_col))
    with_amax = emb.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        F.array_max(F.transform(v, F.abs)).alias("amax"),
    )
    codes = F.when(
        F.col("amax") == 0.0,
        F.transform(F.col("v"), lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            F.col("v"),
            lambda x: F.floor(x * 127.0 / F.col("amax") + 0.5).cast("int"),
        )
    )
    return with_amax.select(
        "id",
        codes.alias("codes"),
        (F.col("amax") / 127.0).alias("scale"),
    )


def semdedup(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_join_threshold: int = 100,
) -> DataFrame:
    """SemDedup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings and dropping all-but-one of
    each within-cluster group of semantically identical items. The
    point of the clustering is SCALE: pairwise cosine is only ever
    computed within a cluster, so the quadratic blow-up is bounded by
    the largest cluster, never the corpus.

    This implementation:
      1. assigns every vector to its nearest centroid — via the same
         unrolled argmax expression as :func:`ivf_assign` (broadcast
         literal centroids, no join, no Python) when the centroid list
         is small, switching to :func:`ivf_assign_join` (broadcast hash
         join + one per-id argmax aggregation) when
         ``len(centroids) > assign_join_threshold``, so production-k
         k-means cell counts don't unroll into a plan-sized expression;
         both paths break ties to the highest centroid id and produce
         identical assignments (pinned by test);
      2. self-joins WITHIN each cell on the cell key (one hash-partition
         exchange on a small integer key) and keeps pairs with
         ``round(cosine, 6) >= threshold``;
      3. drops a vector iff some LOWER-id vector in its cell clears the
         threshold against it (the deterministic min-id-owner rule this
         repo also uses for streaming near-dup; the paper keeps the
         item closest to the centroid — with deterministic ids the two
         rules differ only in which representative survives).

    Returns the kept rows: (id, cell). The dropped set is the anti-join
    complement.
    """
    if len(centroids) > assign_join_threshold:
        assigned = ivf_assign_join(emb, centroids, id_col, vec_col)
    else:
        assigned = ivf_assign(emb, centroids, id_col, vec_col)
    a = assigned.select(
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("cell"),
        _norm(F.col("v")).alias("na"),
    )
    b = assigned.select(
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("cell"),
        _norm(F.col("v")).alias("nb"),
    )
    cos = F.round(
        _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), SIM_ROUND
    )
    dropped = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= F.lit(threshold))
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return assigned.select("id", "cell").join(dropped, "id", "left_anti")


def select_centroids_by_hash(
    emb: DataFrame,
    n: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic pseudo-random centroid pick: the ``n`` vectors with
    the smallest ``(md5(id), id)`` key — a content-addressed sample the
    driver oracle can replay in SQL. Bounded driver collect (n rows; the
    same pattern ann_ivf uses). A production SemDedup would train real
    k-means centroids (MLlib) — the assignment/prune plan is unchanged."""
    rows = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(n)
        .collect()
    )
    return [(int(r["id"]), [float(x) for x in r["v"]]) for r in rows]


def embedding_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group embedding centroid (mean vector) — the building block
    of embedding-space corpus monitoring (is this month's crawl drifting
    away from last month's in representation space?) and of k-means-
    style assignment refresh.

    The scalable vector mean: posexplode to (group, dim, x), ONE
    (group, dim)-keyed sum/count aggregate (map-side combined — the
    shuffle carries |groups| x dim rows, not the corpus), then
    reassemble each centroid by sorting the per-dim means into an array.
    The per-group collect_list is bounded by the embedding
    dimensionality (64 here; 4k at production scale — still one row's
    worth), NOT by the corpus.

    Returns (group, n_vectors, centroid: array<double>)."""
    ex = df.select(
        F.col(group_col).alias("group"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    )
    agg = ex.groupBy("group", "dim").agg(
        F.sum(F.col("x").cast("double")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        agg.groupBy("group")
        .agg(
            F.max("n").cast("long").alias("n_vectors"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("dim").alias("dim"),
                        (F.col("s") / F.col("n")).alias("m"),
                    )
                )
            ).alias("_pairs"),
        )
        .select(
            "group",
            "n_vectors",
            F.transform(F.col("_pairs"), lambda p: p["m"]).alias("centroid"),
        )
    )


def centroid_drift(
    old: DataFrame,
    new: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space drift between two corpus snapshots: per group,
    the cosine similarity and L2 distance between the old and new
    centroids — the representation-space counterpart of the token-level
    KL drift in text_quality.snapshot_drift (a label whose centroid
    moved is a topic whose CONTENT changed even if its volume didn't).

    Groups present in only one snapshot are reported with NULL metrics
    (full outer join) — appearance/disappearance is itself drift.

    Returns (group, n_old, n_new, cosine 6dp, l2_dist 6dp). Rounding at
    the end absorbs summation-order float drift across engines.

    Plan at 100 TB: two (group, dim) aggregates (each ONE exchange over
    dim-exploded rows with map-side combine) + a group-keyed join of two
    dimension-sized centroid tables; the pairwise math is a within-row
    zip_with/aggregate expression chain — no further shuffle."""
    co = embedding_centroids(old, group_col, vec_col).select(
        "group",
        F.col("n_vectors").alias("n_old"),
        F.col("centroid").alias("_a"),
    )
    cn = embedding_centroids(new, group_col, vec_col).select(
        "group",
        F.col("n_vectors").alias("n_new"),
        F.col("centroid").alias("_b"),
    )
    j = co.join(cn, "group", "full_outer")
    dot = F.aggregate(
        F.zip_with(F.col("_a"), F.col("_b"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sq = lambda c: F.aggregate(  # noqa: E731
        F.col(c), F.lit(0.0), lambda acc, v: acc + v * v
    )
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("_a"), F.col("_b"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    both = F.col("_a").isNotNull() & F.col("_b").isNotNull()
    return j.select(
        "group",
        "n_old",
        "n_new",
        F.when(both, F.round(dot / (F.sqrt(sq("_a")) * F.sqrt(sq("_b"))), 6))
        .alias("cosine"),
        F.when(both, F.round(l2, 6)).alias("l2_dist"),
    )
