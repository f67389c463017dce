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

Iterative-plan hygiene: a naive loop stacks every round's join into ONE
logical plan, so Catalyst re-analysis grows linearly with rounds — on a
tiny cached graph the analysis overhead (seconds per round) dwarfs the
actual work, and on a 1000-executor cluster it serializes on the driver.
Each round therefore ends with ``localCheckpoint`` to truncate lineage
(the same strategy GraphFrames uses for its iterative algorithms); on a
real cluster swap in a reliable ``checkpoint`` dir for executor-loss
tolerance.
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

    Min-label propagation to fixpoint:

    - round 0 is folded into initialization — ``lbl = min(node, neighbors)``
      is a single map-side-combinable aggregate over the symmetrized edge
      list, no join (this alone fully resolves star-shaped components, the
      common case for duplicate clusters);
    - each later round joins neighbor labels and takes the elementwise min;
      an unchanged-label count of 0 ends the loop.  Every round's label
      frame is lineage-truncated so plan analysis stays O(1) per round.
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    # Round 0 without a join: label = min over {self} ∪ neighbors.
    labels = (
        und.groupBy("a")
        .agg(F.min("b").alias("nbr_min"))
        .select(
            F.col("a").alias("node"),
            F.least(F.col("a"), F.col("nbr_min")).alias("lbl"),
        )
        .localCheckpoint()
    )
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
        # One joined frame carries both the old and the propagated label:
        # the lineage-truncating materialization and the convergence count
        # run against the same flat plan (one equi-join per round, not two).
        joined = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.col("lbl").alias("old_lbl"),
                F.least(F.col("lbl"), F.coalesce("nbr_min", F.col("lbl"))).alias("lbl"),
            )
            .localCheckpoint()
        )
        changed = joined.filter(F.col("lbl") != F.col("old_lbl")).count()
        labels = joined.select("node", "lbl")
        if changed == 0:
            break
    return labels
