"""Link-graph operators: fixed-iteration PageRank over an edge list.

The web graph is the one corpus-scale signal the text operators can't
see: a page's in-link mass (PageRank) is the classic crawl-priority /
quality prior (Brin & Page 1998), and host-level rank is a standard
feature in corpus curation mixes. Spark expresses the power iteration
naturally as repeated (join on src -> groupBy dst) rounds — each round
is one key-partitioned shuffle, no driver-side graph state.

Scale notes (100 TB): ranks and out-degrees are node-keyed tables —
orders of magnitude smaller than the page corpus once edges are
host-aggregated; each iteration shuffles the edge list once on src (the
join) and once on dst (the sum). Iterations are a fixed unrolled count
so the whole computation is ONE lazy plan (checkpoint between rounds at
true web scale — same pattern as dedup.connected_components). Dangling
nodes (no out-links) keep the (1-d)/N floor and do not redistribute
their mass — the standard simplification, mirrored exactly in the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _round_cut(checkpoint_dir: str | None):
    """Per-round lineage cut: ``localCheckpoint`` by default (correct and
    cheap in-sandbox), or reliable ``checkpoint`` into ``checkpoint_dir``
    on a real cluster — a localCheckpoint dies with its executor, so an
    executor loss mid-iteration would fail the job instead of recovering
    from the checkpoint (the same swap dedup.connected_components
    documents)."""
    if checkpoint_dir is not None:
        def cut(df: DataFrame) -> DataFrame:
            df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
            return df.checkpoint()
        return cut
    return lambda df: df.localCheckpoint()


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Nodes are the union of sources and destinations; duplicate edges are
    collapsed first (rank is a link-existence signal, not a link-count
    one). rank_0 = 1/N for every node;

        rank_{t+1}(v) = (1-d)/N + d * sum over in-edges (u,v) of
                        rank_t(u) / out_degree(u)

    Returns (node, rank) with rank rounded to 6 dp at the END only
    (intermediate iterations stay full-precision; the final round
    absorbs engine summation-order drift — the repo's standard float
    convention).
    """
    # Iterative lineage DOUBLES per round if left lazy (every reference
    # to rank_t re-expands the whole prefix): cut it with a per-round
    # checkpoint of the node-sized rank table and a cached edge list —
    # the same discipline as dedup.connected_components. Pass
    # ``checkpoint_dir`` on a real cluster for executor-loss-safe
    # reliable checkpoints (see _round_cut).
    cut = _round_cut(checkpoint_dir)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().cache()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).cache()
    try:
        nodes = cut(
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        n = nodes.count()  # one small action; node table is dimension-sized
        if n == 0:
            return nodes.select("node", F.lit(0.0).alias("rank"))
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
        for _ in range(iterations):
            contrib = (
                e.join(ranks, e["src"] == ranks["node"])
                .join(out_deg, "src")
                .select(F.col("dst").alias("node"),
                        (F.col("rank") / F.col("deg")).alias("c"))
                .groupBy("node")
                .agg(F.sum("c").alias("in_mass"))
            )
            ranks = cut(
                nodes.join(contrib, "node", "left")
                .select(
                    "node",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping)
                        * F.coalesce(F.col("in_mass"), F.lit(0.0))
                    ).alias("rank"),
                )
            )
        return ranks.select("node", F.round("rank", 6).alias("rank"))
    finally:
        # every round already ran eagerly (the checkpoints), so the
        # returned frame depends only on the final checkpointed ranks —
        # the edge/degree caches can be released before returning
        e.unpersist()
        out_deg.unpersist()


def hits(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999): hub and authority scores
    over a directed edge list — the complementary link signal to
    :func:`pagerank` (a page can be a great directory without being an
    authority, and vice versa).

        auth_{t}(v) = sum over in-edges  (u,v) of hub_{t-1}(u)
        hub_{t}(u)  = sum over out-edges (u,v) of auth_{t}(v)

    with L1 normalization after every update (sum of scores = 1; L1
    instead of the textbook L2 keeps every quantity a ratio of sums —
    reproducible across engines without sqrt drift). Scores start
    uniform. Returns (node, hub, authority), both rounded to 6 dp at
    the END only.

    Plan at scale: per iteration, one edge shuffle per direction plus a
    1-row broadcast for each normalizer — node tables stay
    dimension-sized; each round's score tables are localCheckpointed so
    lineage stays flat (as with connected_components).
    """
    # same lineage discipline as pagerank: cached edges, per-round
    # checkpoint of the node-sized score tables (reliable when
    # ``checkpoint_dir`` is given — see _round_cut)
    cut = _round_cut(checkpoint_dir)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().cache()
    try:
        nodes = cut(
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        n = nodes.count()
        if n == 0:
            return nodes.select(
                "node",
                F.lit(0.0).alias("hub"),
                F.lit(0.0).alias("authority"),
            )
        hub = nodes.withColumn("h", F.lit(1.0 / n))
        auth = None
        for _ in range(iterations):
            raw_a = (
                e.join(hub, e["src"] == hub["node"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("h").alias("a_raw"))
            )
            a_norm = raw_a.agg(F.sum("a_raw").alias("z"))
            auth = cut(
                nodes.join(raw_a, "node", "left")
                .join(F.broadcast(a_norm))
                .select(
                    "node",
                    (F.coalesce(F.col("a_raw"), F.lit(0.0))
                     / F.col("z")).alias("a"),
                )
            )
            raw_h = (
                e.join(auth, e["dst"] == auth["node"])
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("a").alias("h_raw"))
            )
            h_norm = raw_h.agg(F.sum("h_raw").alias("z"))
            hub = cut(
                nodes.join(raw_h, "node", "left")
                .join(F.broadcast(h_norm))
                .select(
                    "node",
                    (F.coalesce(F.col("h_raw"), F.lit(0.0))
                     / F.col("z")).alias("h"),
                )
            )
        return (
            hub.join(auth, "node")
            .select(
                "node",
                F.round("h", 6).alias("hub"),
                F.round("a", 6).alias("authority"),
            )
        )
    finally:
        e.unpersist()  # rounds ran eagerly; the result needs only hub/auth


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-iteration TrustRank (Gyongyi, Garcia-Molina & Pedersen,
    VLDB 2004): PageRank with the teleport vector BIASED to a small
    hand-vetted seed set of trusted hosts, so rank mass can only reach
    a node through link paths from the seeds — the standard webspam
    demotion prior a corpus-curation mix uses next to raw PageRank.

    Semantics (pinned for the DuckDB oracle):

    - edges deduped as in :func:`pagerank`; nodes = union of endpoints.
    - seeds are restricted to nodes present in the graph (a seed with
      no edges can neither receive nor forward trust); S = their count.
    - teleport t(v) = 1/S for seeds, 0 otherwise; trust_0 = t;
      trust_{t+1}(v) = (1-d)*t(v) + d * sum over in-edges (u,v) of
      trust_t(u)/out_degree(u). Dangling mass is dropped (same
      simplification as pagerank, mirrored in the oracle).

    Returns (node, trust), trust rounded to 6 dp at the END only.
    Plan at 100 TB: identical shape to :func:`pagerank` — one edge
    shuffle per round, node-sized tables, per-round lineage cut — plus
    one node-sized seed semi-join up front."""
    cut = _round_cut(checkpoint_dir)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().cache()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).cache()
    tele = None
    try:
        nodes = cut(
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        s = (
            seeds.select(F.col(node_col).alias("node"))
            .distinct()
            .join(nodes, "node", "left_semi")
        )
        n_seeds = s.count()  # seed table is tiny by definition
        if n_seeds == 0:
            return nodes.select("node", F.lit(0.0).alias("trust"))
        tele = (
            nodes.join(
                s.withColumn("is_seed", F.lit(True)), "node", "left"
            )
            .select(
                "node",
                F.when(F.col("is_seed"), F.lit(1.0 / n_seeds))
                .otherwise(F.lit(0.0))
                .alias("t"),
            )
            .cache()
        )
        ranks = tele.select("node", F.col("t").alias("trust"))
        for _ in range(iterations):
            contrib = (
                e.join(ranks, e["src"] == ranks["node"])
                .join(out_deg, "src")
                .select(F.col("dst").alias("node"),
                        (F.col("trust") / F.col("deg")).alias("c"))
                .groupBy("node")
                .agg(F.sum("c").alias("in_mass"))
            )
            ranks = cut(
                tele.join(contrib, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(1.0 - damping) * F.col("t")
                        + F.lit(damping)
                        * F.coalesce(F.col("in_mass"), F.lit(0.0))
                    ).alias("trust"),
                )
            )
        return ranks.select("node", F.round("trust", 6).alias("trust"))
    finally:
        e.unpersist()
        out_deg.unpersist()
        if tele is not None:
            tele.unpersist()


def spam_mass(
    pagerank_df: DataFrame,
    trustrank_df: DataFrame,
    rank_col: str = "rank",
    trust_col: str = "trust",
) -> DataFrame:
    """Relative spam mass (Gyongyi, Berkhin, Garcia-Molina & Pedersen
    2005): the fraction of a node's PageRank NOT accounted for by trust
    flowing from the seed set, m(v) = (pr(v) - tr(v)) / pr(v) — high
    values mark hosts whose rank comes from unendorsed (likely spam)
    link structure; trusted hubs go negative-or-near-zero. Computed
    over the two operators' ROUNDED outputs so the oracle replays it
    exactly; pr >= (1-d)/N > 0, so the division is total.

    Plan: one node-keyed join of two node-sized rank tables."""
    return (
        pagerank_df.join(trustrank_df, "node")
        .select(
            "node",
            F.col(rank_col).alias("rank"),
            F.col(trust_col).alias("trust"),
            F.round(
                (F.col(rank_col) - F.col(trust_col)) / F.col(rank_col), 6
            ).alias("spam_mass"),
        )
    )


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
    directed: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Semi-supervised label propagation (Zhu & Ghahramani 2002) over the
    link graph — how a curation pipeline spreads a SMALL set of manually
    labeled hosts (spam blocklist entries, known-good news domains) to
    the millions of unlabeled hosts that link to or are linked from
    them. The classic web instance is TrustRank-style spam demotion:
    labels flow along links because linking is an endorsement.

    Semantics (pinned so the DuckDB oracle can replay them exactly):

    - edges are deduped, self-loops dropped; ``directed=False`` (the
      default) symmetrizes first — endorsement flows both ways.
    - seed labels are CLAMPED: a seed node keeps its label forever (a
      node seeded with two labels deterministically keeps the
      lexicographically smallest).
    - each round, every non-seed node adjacent to >=1 labeled node takes
      the MAJORITY label among its labeled neighbors' previous-round
      labels; ties break to the lexicographically smallest label. Nodes
      with no labeled neighbor stay unlabeled (absent) this round.
    - a fixed unrolled ``iterations`` count (labels reach at most
      ``iterations`` hops from a seed).

    Returns (node, label, is_seed) for nodes labeled by the end.

    Plan at 100 TB: per round, ONE edge-keyed shuffle (the neighbor-label
    join) + two node-keyed aggregates; label tables are node-sized
    (host-level: millions of rows, not the corpus). Same per-round
    lineage-cut discipline as :func:`pagerank` — localCheckpoint by
    default, reliable ``checkpoint_dir`` on a real cluster."""
    cut = _round_cut(checkpoint_dir)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.filter(F.col("src") != F.col("dst")).distinct().cache()
    s = (
        seeds.select(
            F.col(node_col).alias("node"), F.col(label_col).alias("label")
        )
        .groupBy("node")
        .agg(F.min("label").alias("label"))
    ).cache()
    try:
        labels = cut(s)
        for _ in range(iterations):
            nbr = (
                e.join(
                    labels.select(
                        F.col("node").alias("_ln"), F.col("label")
                    ),
                    e["src"] == F.col("_ln"),
                )
                .select(F.col("dst").alias("node"), "label")
            )
            cnt = nbr.groupBy("node", "label").agg(
                F.count(F.lit(1)).alias("c")
            )
            # majority with min-label tiebreak, no sort: min of
            # (-count, label) structs picks the largest count and, on
            # ties, the lexicographically smallest label
            best = (
                cnt.groupBy("node")
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("c")).alias("neg_c"),
                            F.col("label").alias("label"),
                        )
                    ).alias("b")
                )
                .select("node", F.col("b.label").alias("label"))
            )
            labels = cut(
                s.unionByName(
                    best.join(s.select("node"), "node", "left_anti")
                )
            )
        return labels.join(
            s.select("node", F.lit(True).alias("is_seed")), "node", "left"
        ).select(
            "node", "label",
            F.coalesce(F.col("is_seed"), F.lit(False)).alias("is_seed"),
        )
    finally:
        e.unpersist()
        s.unpersist()


def link_reciprocity(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node link reciprocity: the fraction of a host's distinct
    out-links that are linked BACK (edge (u,v) with (v,u) also
    present). Organic linking is largely one-directional (pages cite
    authorities); near-1.0 reciprocity over a non-trivial out-degree is
    the classic link-exchange / link-farm fingerprint (used alongside
    :func:`spam_mass` — structural evidence vs rank-flow evidence).

    Self-loops are dropped and edges deduped first. Returns
    (node, n_out, n_reciprocal, reciprocity) for every node with >=1
    out-edge; reciprocity rounded to 6 dp.

    Plan at 100 TB: one distinct over the edge list, one (src,dst)-
    keyed semi-join against the swapped edges, two src-keyed counts —
    all edge-sized exchanges with map-side combine, output node-sized."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = (
        e.join(rev, ["src", "dst"], "left_semi")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n_reciprocal"))
    )
    out = e.groupBy("src").agg(F.count(F.lit(1)).alias("n_out"))
    return out.join(recip, "src", "left").select(
        F.col("src").alias("node"),
        "n_out",
        F.coalesce(F.col("n_reciprocal"), F.lit(0)).alias("n_reciprocal"),
        F.round(
            F.coalesce(F.col("n_reciprocal"), F.lit(0)) / F.col("n_out"), 6
        ).alias("reciprocity"),
    )


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    UNDIRECTED simple graph (edges symmetrized, deduped, self-loops
    dropped) — the third structural spam/community signal next to
    :func:`link_reciprocity` and :func:`spam_mass`: link farms and
    tight cliques have anomalously high clustering; organic hub pages
    sit in sparse neighborhoods.

    Each triangle {a < b < c} is enumerated exactly once by joining the
    canonical (low-id -> high-id) edge list as (a,b) |><| (b,c) and
    closing the wedge against (a,c); per-node counts come from
    exploding the triangle's three corners.

        clustering(v) = 2 * T(v) / (deg(v) * (deg(v) - 1))   (deg >= 2)

    Returns (node, degree, triangles, clustering), clustering rounded
    to 6 dp; degree is the distinct-neighbor count.

    Plan at 100 TB: the wedge join is keyed on the shared corner (one
    edge-list shuffle per side), the closing join on (a,c) — never an
    all-pairs product. On heavy-tailed host graphs, swap the id
    orientation for degree orientation (orient edges low-degree ->
    high-degree) to bound per-key wedge fan-out at O(sqrt(m)) per the
    standard compact-forward argument — the triangle SET is identical,
    only intermediate wedge counts change; the id orientation is the
    pinned deterministic contract here."""
    d = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    und = d.unionByName(
        d.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    canon = und.filter(F.col("src") < F.col("dst"))
    ab = canon.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = canon.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = canon.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    t = F.coalesce(F.col("t"), F.lit(0))
    return deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        t.alias("triangles"),
        F.round(
            F.when(
                F.col("degree") >= 2,
                2.0 * t / (F.col("degree") * (F.col("degree") - 1.0)),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("clustering"),
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Log2-binned in/out-degree distribution of the link graph — the
    standard first look at a crawled webgraph (degree distributions are
    heavy-tailed; the histogram is how you SEE the tail that makes
    naive per-node work skew) and the skew evidence a pipeline uses to
    decide where salting is needed.

    Input: an edge list (src, dst); parallel edges count (multigraph
    semantics — dedupe upstream for simple-graph counts). Returns one
    row per (direction, bin): ``direction`` 'in'|'out',
    ``degree_bin_lo`` = 2^floor(log2(degree)) (1,2,4,8,...),
    ``n_nodes`` = nodes whose degree lands in [bin_lo, 2*bin_lo).

    floor(log2(d)) is engine-stable: log2 of a power of two is IEEE-
    exact, and away from powers of two the distance to an integer
    (>= log2(1+1/d)) dwarfs any libm ulp difference — so the DuckDB
    oracle replays the same binning without float drift.

    Plan at 100 TB: two degree counts (each ONE node-keyed exchange
    with map-side combine) + two tiny bin groupBys; never materializes
    per-node rows beyond the degree tables PageRank needs anyway."""

    def _side(col: str, direction: str) -> DataFrame:
        deg = edges.groupBy(F.col(col).alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        binned = deg.select(
            F.pow(F.lit(2.0), F.floor(F.log2("deg"))).cast("long")
            .alias("degree_bin_lo")
        )
        return binned.groupBy("degree_bin_lo").agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes")
        ).select(F.lit(direction).alias("direction"), "degree_bin_lo",
                 "n_nodes")

    return _side("dst", "in").unionByName(_side("src", "out"))


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-round k-core peeling over the undirected simple graph —
    the density tier above :func:`triangle_counts` for spam/community
    structure: the k-core (maximal subgraph where every node keeps
    degree >= k) survives the iterated removal of low-degree fringe,
    so boilerplate-linked leaf hosts peel away while link farms and
    genuine dense communities remain. Matula & Beck 1983 degeneracy
    peeling, round-limited like :func:`pagerank`'s fixed power
    iterations: each round drops every node whose CURRENT degree is
    below k, together with its edges; ``rounds`` rounds reach the true
    core on graphs whose fringe is at most ``rounds`` layers deep
    (the remainder is the documented fixed-iteration contract — at
    web scale, run until a round removes nothing).

    Returns (node, degree) — the EXACT state after ``rounds`` peels:
    degree is the distinct-neighbor count inside the surviving
    subgraph, and a node with degree < k may remain when ``rounds``
    was too small to reach the fixpoint (no hidden extra filter — the
    reported degrees are always self-consistent with the reported
    node set, and an under-peeled result is visible instead of being
    silently half-filtered).

    Plan at 100 TB: one symmetrize + distinct up front, then per round
    ONE degree aggregate + a broadcast-able semi-join of the edge list
    against the surviving (small, shrinking) node set — the edge list
    shuffles on the node key once per round, the same per-round cost
    shape as pagerank; no window, no all-pairs anywhere. Each round's
    surviving edge list takes a lineage cut (the pagerank/hits
    ``_round_cut`` pattern): every round references ``e`` three times
    (degree count + both semi-join probes), so an uncut plan re-derives
    the whole prior-round chain per reference and replans
    near-exponentially with ``rounds`` (measured: 15.5 s -> ~2 s on the
    sf0.1 driver query after the cut).
    """
    cut = _round_cut(checkpoint_dir)
    s, d = F.col(src_col), F.col(dst_col)
    e = cut(
        edges.select(s.alias("a"), d.alias("b"))
        .union(edges.select(d.alias("a"), s.alias("b")))
        .filter(
            F.col("a").isNotNull()
            & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
        .distinct()
    )
    for _ in range(rounds):
        deg = e.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("a")
        e = cut(
            e.join(keep, "a", "left_semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
        )
    return (
        e.groupBy("a")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .select(F.col("a").alias("node"), "degree")
    )
