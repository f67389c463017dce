"""Graph operators: connected components for duplicate-cluster resolution.

The reference has no graph semantics; this is the standard closing step of
a near-dup pipeline (LSH/Jaccard candidate pairs → clusters → keep one doc
per cluster), expressed as iterative min-label propagation over DataFrames.

Scale posture: each iteration is one equi-join of the (sparse, post-
verification) edge list against the label table plus a map-side-combinable
min aggregate — no driver-side graph ever materializes.  Convergence takes
O(component diameter) rounds; near-dup clusters are shallow (duplicates of
a common original), so the loop terminates in a handful of rounds.  For
adversarially deep graphs at 100 TB the large-star/small-star
contraction (Kiveris et al., "Connected Components in MapReduce") halves
the rounds; the propagation kernel below is the same join+min building
block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, component) for every node with at least one edge; the
    component id is the minimum node id in the component.

    Min-label propagation to fixpoint: every round each node takes the
    minimum of its own label and its neighbors' labels; unchanged-label
    count 0 ends the loop (one lightweight count job per round).
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        und.select(F.col("a").alias("node")).distinct()
        .withColumn("lbl", F.col("node"))
        .persist()
    )
    prev = labels
    for _ in range(max_iterations):
        nbr_min = (
            und.join(
                labels.select(F.col("node").alias("b"), F.col("lbl").alias("b_lbl")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("b_lbl").alias("nbr_min"))
            .select(F.col("a").alias("node"), "nbr_min")
        )
        # One joined frame carries both the old and the propagated label, so
        # the convergence count reuses the cached join instead of re-joining
        # new labels against old (one equi-join per round, not two).
        joined = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.col("lbl").alias("old_lbl"),
                F.least(F.col("lbl"), F.coalesce("nbr_min", F.col("lbl"))).alias("lbl"),
            )
            .persist()
        )
        changed = joined.filter(F.col("lbl") != F.col("old_lbl")).count()
        prev.unpersist()
        prev = joined
        labels = joined.select("node", "lbl")
        if changed == 0:
            break
    und.unpersist()
    return labels
