"""Distributed graph operators over edge DataFrames.

Companion to the connected-components machinery in dedup.py (min-label
CC): here live the value-propagation algorithms.  PageRank is the
canonical one — centrality over the corpus kNN graph ranks documents/
embeddings by how "referenced" they are by their neighborhoods, a
prototypicality signal used for coreset selection and curriculum
ordering (beyond-reference operator; scale bar is the 100 TB north
star).

Determinism: iteration counts are FIXED (the unrolled plan is the same
DAG every run) and all rank mass is e9 fixed-point INTEGER arithmetic —
`div`/`//` floor divisions and integer multiplies only, so every
iteration is bit-identical in the DuckDB oracle with zero float drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_ITERS = 3
PAGERANK_DAMPING_E2 = 85  # 0.85 damping as an integer percentage


def pagerank(
    edges: DataFrame,
    iters: int = PAGERANK_ITERS,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    p_0(v) = floor(1e9 / N); each iteration
        p_{t+1}(v) = floor(0.15e9 / N) + (85 * sum_{u->v} floor(p_t(u) /
                     outdeg(u))) div 100
    — the standard damped update with every division a floor on
    integers, so the result is exact and engine-independent.  Nodes with
    no in-edges keep the teleport term (left join + coalesce); dangling
    nodes (outdeg 0) simply leak their mass, the common simplification —
    on kNN graphs every member of a non-singleton bucket has out-edges,
    so no mass leaks there.

    Plan: outdeg is one partial-agg'd shuffle; each iteration is an
    edge-to-rank shuffle join (rank table is N rows — NEVER broadcast;
    the round-5 anti-pattern) + a dst-keyed partial-agg'd sum + a
    node-keyed left join.  Work per iteration is O(|E|) with ~3
    exchanges; iterations are unrolled into one DAG, which AQE
    re-optimizes stage by stage.  The only broadcast is the 1-row node
    count.

    Output: (node, pr_e9) for every node, pr_e9 a BIGINT of e9 rank
    mass.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = e.select(F.col("src").alias("node")).union(e.select(F.col("dst"))).distinct()
    n = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    nb = nodes.crossJoin(F.broadcast(n)).select(
        "node",
        F.expr("1000000000 div n_nodes").alias("p0_e9"),
        F.expr("150000000 div n_nodes").alias("base_e9"),
    )
    p = nb.select("node", F.col("p0_e9").alias("pr_e9"))
    for _ in range(iters):
        contrib = (
            e.join(p.select(F.col("node").alias("src"), "pr_e9"), "src")
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"), F.expr("pr_e9 div outdeg").alias("share"))
        )
        summed = contrib.groupBy("node").agg(F.sum("share").alias("s"))
        p = nb.join(summed, "node", "left").select(
            "node",
            (
                F.col("base_e9")
                + F.expr(f"({PAGERANK_DAMPING_E2} * coalesce(s, 0L)) div 100")
            ).alias("pr_e9"),
        )
    return p


def triangle_stats(
    edges: DataFrame, src_col: str = "src_id", dst_col: str = "dst_id"
) -> DataFrame:
    """Per-node triangle count and local clustering coefficient over an
    undirected view of the edge list — the graph-health panel run on
    corpus kNN graphs: a node whose neighborhood closes into triangles
    sits in a dense semantic clump (dedup/coreset candidate); a hub with
    zero closure is a hubness artifact of the embedding space.

    Exact and deterministic: triangles are counted once each with the
    canonical orientation a < b < c (each triangle's minimum node is the
    wedge center), the coefficient is 2T/(deg·(deg−1)) — exact integers
    into ONE IEEE division (0.0 when deg < 2).

    Plan: canonical edge set = least/greatest projection + distinct
    [1 shuffle]; wedges = edge⋈edge on the shared MIN node with b < c —
    fanout bounded by per-node degree (k-bounded on kNN graphs, so
    wedges ≤ N·k²/2, never corpus²); closure = one more equi-join of the
    wedge's (b, c) against the edge set; per-node participation = one
    posexplode + partial-agg'd count.  Every join keys on node ids —
    nothing broadcast (node tables are corpus-sized).

    Output: (node, degree, n_triangles, clustering) per node.
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    e1, e2 = und.alias("e1"), und.alias("e2")
    wedges = e1.join(e2, F.col("e1.a") == F.col("e2.a")).where(
        F.col("e1.b") < F.col("e2.b")
    ).select(F.col("e1.a").alias("ctr"), F.col("e1.b").alias("x"), F.col("e2.b").alias("y"))
    closer = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tris = wedges.join(closer, ["x", "y"])
    per_node = (
        tris.select(F.explode(F.array("ctr", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            (2 * F.coalesce(F.col("n_triangles"), F.lit(0))).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )
