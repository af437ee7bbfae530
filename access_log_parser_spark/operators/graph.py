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


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
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
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = nodes.count()  # one small action; node table is dimension-sized
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
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))
