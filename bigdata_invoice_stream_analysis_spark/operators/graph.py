"""Relational graph analytics beyond connected components
(operators/dedup.py) and triangle counting (plans/queries.py):
fixed-iteration PageRank over an edge DataFrame.

Everything runs in **exact integer arithmetic** so results are
bit-reproducible across engines and across shuffle orders: float
PageRank sums are order-dependent under parallel aggregation, while
BIGINT sums are associative. Ranks are maintained at a fixed scale of
1e9 ("nano-rank"); per-edge contributions and the damping step use
floor division, mirrored exactly by DuckDB's `//`.

Scale notes (100 TB posture): each iteration is one join of the edge
list against the current rank vector plus one hash aggregation on the
destination key — the textbook bulk-synchronous PageRank step. The
rank vector is O(nodes) and joins by key (AQE picks broadcast when it
fits, shuffle-hash otherwise); the edge list is never re-shuffled on
the same key twice per round. `localCheckpoint` truncates the lineage
each round so the plan stays O(1) deep instead of O(iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000_000  # initial rank per node ("nano-rank" units)
DAMP_NUM, DAMP_DEN = 85, 100  # damping factor 0.85 as an exact rational


def copurchase_edges(lineitem: DataFrame, min_quantity: int = 30) -> DataFrame:
    """Part co-purchase edge list (u < v, distinct) from a lineitem
    table: bulk lines (quantity > min_quantity) self-joined on the
    order key with a partkey inequality, so each unordered pair is
    emitted once. Shared by q_copurchase_pagerank / the triangle query
    family and scripts/scaling_probe.py — ONE builder, so the probe
    always times the exact graph the graded queries run on. Per-order
    fanout bounds the pair blowup (orders have bounded line counts);
    the join is an equi-join on l_orderkey with the inequality as a
    post-condition, never a cartesian."""
    op = (
        lineitem.where(F.col("l_quantity") > min_quantity)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )


def symmetrize(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Undirected edge list (each edge stored once, either orientation)
    → symmetric directed edge list with both (u,v) and (v,u)."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return fwd.unionAll(rev)


def pagerank_int(edges_sym: DataFrame, iterations: int = 5) -> DataFrame:
    """Integer PageRank over a symmetric directed edge list
    (columns src, dst; every node must have out-degree >= 1 — true by
    construction for symmetrized graphs, so there is no dangling-mass
    term).

    r_0(v)     = RANK_SCALE
    r_{t+1}(v) = (1-d)*RANK_SCALE + floor(d * sum_{u->v} floor(r_t(u)/deg(u)))

    with d = 85/100 carried as exact integer math:
    `(DAMP_NUM * s) div DAMP_DEN` and `(1-d)*RANK_SCALE` =
    RANK_SCALE - DAMP_NUM*RANK_SCALE/DAMP_DEN (exact: 150_000_000).

    Returns (node BIGINT, pr_score BIGINT) after `iterations` rounds.
    """
    base = RANK_SCALE - (DAMP_NUM * RANK_SCALE) // DAMP_DEN
    deg = edges_sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Edge list with out-degree attached once, reused every round.
    ed = edges_sym.join(deg, "src").localCheckpoint()
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(RANK_SCALE).cast("long").alias("pr_score")
    )
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", F.expr("pr_score div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (F.lit(base) + F.expr(f"({DAMP_NUM} * s) div {DAMP_DEN}"))
            .cast("long")
            .alias("pr_score"),
        ).localCheckpoint()
    return ranks
