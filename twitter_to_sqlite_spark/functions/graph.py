"""Graph analytics over edge DataFrames.

Connected components live in functions/dedup.py (near_dup_components,
where their consumer is); this module holds rank-propagation style
algorithms. Reference analogue: the follower/friend edge tables the
reference maintains (twitter_to_sqlite/cli.py followers/friends
commands) are exactly the edge lists these operators consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iterations: int = 6, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst",
             decimals: int = 6) -> DataFrame:
    """PageRank by power iteration: rank(v) ← (1−d) + d·Σ_{u→v}
    rank(u)/outdeg(u), the classic simplified formulation (dangling
    mass not redistributed — callers wanting ergodic PageRank should
    symmetrize their edge list, which also guarantees outdeg ≥ 1).

    Ranks are rounded to `decimals` after every iteration, which makes
    the trajectory reproducible across engines/aggregation orders (the
    same absorb-the-float-noise device as classifier.logreg_train —
    probabilistic, not a hard guarantee) and lets a relational oracle
    replay the exact computation. Returns (node, rank).

    Scale: per iteration, one shuffle join of edges against the
    current rank vector on src and one partial-agg shuffle onto dst —
    the standard distributed PageRank shape (edges never move if
    pre-partitioned by src; only the rank vector reshuffles).
    Lineage is truncated every iteration (localCheckpoint) so the
    plan doesn't deepen linearly; 6 iterations ≈ power-iteration
    convergence to ~1e-2 on graphs with spectral gap, which is rank-
    ordering-stable for curation purposes.
    """
    # The caller's edge expression may be an expensive subtree (a
    # fact-table join + distinct); every iteration re-reads it, so
    # materialize it ONCE and pre-join the out-degree weight — per
    # iteration only the (small) rank vector moves.
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = e.join(outdeg, "src").localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        contrib = (
            ew.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("__c"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("__c", F.lit(0.0)),
                    decimals,
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
