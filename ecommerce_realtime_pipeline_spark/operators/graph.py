"""Graph analytics over relationship tables derived from the star
schema — here fixed-iteration PageRank, the influence/centrality
companion to the connected-components operators in ``dedup``.

Scale stance (100 TB): PageRank is the canonical iterative
edge-propagation workload. Each iteration is ONE equi-join of the
rank table (node-sized) against the edge list (edge-sized) + ONE
partial-agg shuffle on dst — never materializing anything bigger than
the edge list. A fixed iteration count keeps the whole computation a
finite expression chain (the property that lets a SQL oracle replicate
it CTE-for-CTE, exactly like ``kmeans_refine`` and the logistic-GD
trainer); convergence-driven stopping would add the driver-side probe
pattern of ``neardup_clusters``. At web scale you additionally
pre-partition edges by src so every iteration reuses one partitioning
(no re-shuffle of the static side) — here AQE handles the small case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decimal type for exact partition-order-independent contribution
#: sums (same exactness contract as label_centroids / logistic GD).
_DEC = "decimal(28,14)"


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (for an
    undirected graph pass both directions).

    r_0(v) = 1/N;  r_{t+1}(v) = (1-d)/N + d · Σ_{u→v} r_t(u)/deg(u)

    Exactness: each contribution r_u/deg_u is ONE IEEE double divide
    (bit-identical across engines); contributions are cast to DECIMAL
    and summed exactly, so the per-iteration totals are independent of
    partitioning and hash-comparable to the DuckDB oracle. Dangling
    nodes cannot occur on a symmetrized edge list (every node has
    out-degree ≥ 1); the simplified update (no dangling-mass
    redistribution) is the documented contract.

    Output: (node, rank) for every node in the edge list, rank as the
    raw double after ``iters`` rounds.
    """
    # The edge list (and its out-degree) is STATIC across iterations —
    # fuse deg INTO the edge table and pin both ONCE, otherwise every
    # round's contrib subtree re-evaluates the edge lineage (here a
    # basket self-join; 3 rounds ⇒ ~7 recomputations) and re-joins deg.
    # Per round only the node-sized rank table moves — the local-mode
    # form of "pre-partition the static edge table" from the module
    # docstring.
    e = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
    deg = e.groupBy("_u").agg(F.count("*").alias("_deg"))
    ew = e.join(deg, "_u").localCheckpoint()
    nodes = ew.select(F.col("_u").alias("node")).distinct().localCheckpoint()
    # 1-row scalar broadcast (node count), not a cartesian blowup
    n_row = nodes.agg(F.count("*").alias("_n"))
    ranks = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    for _ in range(iters):
        contrib = ew.join(ranks, ew["_u"] == ranks["node"]).select(
            F.col("_v").alias("node"),
            (F.col("rank") / F.col("_deg")).cast(_DEC).alias("_c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        ranks = (
            nodes.join(sums, "node", "left")
            .crossJoin(F.broadcast(n_row))
            .select(
                "node",
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("_n")
                    + F.lit(damping)
                    * F.coalesce(
                        F.col("_s").cast("double"), F.lit(0.0)
                    )
                ).alias("rank"),
            )
        )
    return ranks
