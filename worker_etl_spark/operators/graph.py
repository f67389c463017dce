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

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@contextmanager
def _bounded_shuffle(df: DataFrame):
    """Scope ``spark.sql.shuffle.partitions`` to the cluster's parallelism
    for the duration of an iterative loop.

    Iterative algorithms materialize each round (``localCheckpoint``), so
    every round schedules real tasks for every shuffle partition — with the
    vanilla 200 default that is 200 near-empty tasks per stage per round on
    a graph that has long since contracted to thousands of edges.  AQE
    cannot help: checkpointed rounds are separate short queries and the
    RDD-scan boundary pins their partitioning.  Bounding the conf to
    ``defaultParallelism`` (the session's own tuned value is already ≤ this)
    keeps per-round scheduling O(cores); the conf is restored on exit so
    surrounding queries are untouched.  Single-threaded driver assumption
    documented: the correctness gate and bench run queries sequentially."""
    spark = df.sparkSession
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    target = spark.sparkContext.defaultParallelism
    try:
        # shuffle_width() tolerates "auto" on AQE auto-partitioning
        # platforms (ADVICE r5) — falls back to defaultParallelism.
        from worker_etl_spark.session import shuffle_width

        if shuffle_width(spark) > target:
            spark.conf.set(key, str(target))
        yield
    finally:
        spark.conf.set(key, old)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    algorithm: str = "propagation",
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

    ``algorithm='star'`` switches to the alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", public): O(log n) rounds instead of O(diameter), the right
    choice for adversarially DEEP graphs (long near-dup chains) where
    propagation's per-round barrier dominates.  Both return identical
    labels; duplicate clusters are shallow, so propagation stays the
    default.
    """
    if algorithm == "star":
        with _bounded_shuffle(edges):
            return _connected_components_star(edges, src, dst, max_iterations)
    if algorithm != "propagation":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    with _bounded_shuffle(edges):
        return _connected_components_propagation(edges, src, dst, max_iterations)


def _connected_components_propagation(
    edges: DataFrame, src: str, dst: str, max_iterations: int
) -> DataFrame:
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
    else:
        # Silent truncation would return WRONG labels for any node the min
        # hasn't reached yet — fail loudly instead (the star contraction
        # handles deep graphs in O(log n) rounds).
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds (component diameter exceeds max_iterations); raise "
            "max_iterations or use algorithm='star'"
        )
    return labels


def _symmetrize(e: DataFrame) -> DataFrame:
    return (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _edge_signature(e: DataFrame) -> tuple[int, int]:
    """Order-independent (count, checksum) of an edge frame — one action."""
    # bit_xor: order-independent and overflow-free (the edge set is
    # distinct, so xor multiplicity cancellation can't hide a change
    # that count doesn't catch).
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(a, b))"), F.lit(0)).alias("sig"),
    ).first()
    return int(row["n"]), int(row["sig"])


def _connected_components_star(
    edges: DataFrame, src: str, dst: str, max_iterations: int
) -> DataFrame:
    """Alternating large-star/small-star contraction to the star fixpoint.

    Each half-round is one groupBy(min) + one equi-join over the CURRENT
    edge set — which contracts geometrically, so later rounds are nearly
    free.  Fixpoint: every edge is (node, component-min); labels read off
    the final edge set plus the identity rows for the minima themselves.
    Lineage is truncated per half-round like the propagation loop.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    if not e.take(1):
        return e.select(F.col("a").alias("node"), F.col("b").alias("lbl"))
    prev_sig = None
    for _ in range(max_iterations):
        und = _symmetrize(e)
        # large-star(u): m = min(Γ(u) ∪ u); connect every LARGER neighbor
        # v > u to m.
        mins = und.groupBy("a").agg(
            F.least(F.min("b"), F.col("a")).alias("m")
        )
        e = (
            und.filter(F.col("b") > F.col("a"))
            .join(mins, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .distinct()
            .localCheckpoint()
        )
        # small-star(u): m = min of the SMALLER neighborhood Γ≤(u);
        # connect u and every v ∈ Γ≤(u) \ {m} to m.
        le = _symmetrize(e).filter(F.col("b") < F.col("a"))
        m = le.groupBy("a").agg(F.min("b").alias("m"))
        e = (
            le.join(m, "a")
            .filter(F.col("b") != F.col("m"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .union(m.select(F.col("a"), F.col("m").alias("b")))
            .distinct()
            .localCheckpoint()
        )
        sig = _edge_signature(e)
        if sig == prev_sig:
            break
        prev_sig = sig
    # Fixpoint edges are (node, component_min) with node > min.
    return (
        e.select(F.col("a").alias("node"), F.col("b").alias("lbl"))
        .union(e.select(F.col("b").alias("node"), F.col("b").alias("lbl")))
        .distinct()
    )
