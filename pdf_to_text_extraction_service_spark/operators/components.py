"""Connected components over near-duplicate pair edges — the step
after pairwise dedup in a training pipeline: near-dup PAIRS become
CLUSTERS, and each cluster keeps one canonical document (the min id).

Algorithm: CCF-Iterate (Kang et al., "Connected Components in
MapReduce and Beyond" family): each round groups edges by node,
propagates the minimum label to every neighbor (emitting only from
groups whose key shrinks, per the paper), and counts newly created
pairs; convergence in O(d) rounds for diameter d (near-dup clusters
are shallow — a handful of rounds in practice). Each round costs two
wide shuffles (the label groupBy and the emission dedup) plus the
convergence-check anti-join; the relation is localCheckpointed
between rounds so plan lineage stays constant-depth. The per-node
neighbor set is bounded by the upstream per-bucket candidate caps
(operators/neardup.py), so no group explodes.

Everything is integer min-propagation — deterministic under any
partitioning, so the DuckDB oracle (recursive-CTE transitive closure
+ min label) matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 100) -> DataFrame:
    """(id, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id reachable from ``id``."""
    # materialize the edge list ONCE (localCheckpoint: truncated
    # lineage AND no never-unpersisted cache leaking per invocation —
    # the input is typically an expensive near-dup pipeline, and
    # every CCF round plus the final vertex join reads it)
    base = edges.select(
        F.col(id_a).cast("long").alias("a"),
        F.col(id_b).cast("long").alias("b"),
    ).distinct().localCheckpoint(eager=True)
    pairs = base
    converged = False
    for _ in range(max_iter):
        # CCF maps every pair in BOTH directions each round — the
        # reversal is what lets a label flow back up a chain. No
        # distinct here: min/collect_set are duplicate-insensitive,
        # so deduping the symmetrized relation would be a wasted
        # full-width shuffle.
        sym = pairs.union(
            pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        grouped = sym.groupBy("a").agg(
            F.min("b").alias("m"),
            F.collect_set("b").alias("vs"),
        )
        # CCF-Iterate emission, gated on a shrinking key (m < a):
        # (a, m) plus (v, m) for the other neighbors
        nxt = (
            grouped.filter(F.col("m") < F.col("a"))
            .select(
                F.expr(
                    "explode(concat(array(struct(a as x, m as y)), "
                    "  transform(filter(vs, v -> v != m and m < v), "
                    "            v -> struct(v as x, m as y))"
                    ")) as e"
                )
            )
            .select(F.col("e.x").alias("a"), F.col("e.y").alias("b"))
            .distinct()
        )
        # localCheckpoint (not persist): each round's plan would
        # otherwise stack the whole previous lineage — after tens of
        # rounds Catalyst analysis blows up; checkpointing truncates
        # the plan while keeping the data executor-local
        nxt = nxt.localCheckpoint(eager=True)
        n_new = nxt.join(pairs, ["a", "b"], "left_anti").count()
        pairs = nxt
        if n_new == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "rounds — raise max_iter (graph diameter exceeds it)")
    # after convergence every non-root points at its component min;
    # roots label themselves
    labels = pairs.groupBy("a").agg(F.min("b").alias("component"))
    vertices = (
        base.select("a")
        .union(base.select(F.col("b").alias("a")))
        .distinct()
    )
    return (
        vertices.join(labels, "a", "left")
        .select(
            F.col("a").alias("id"),
            F.when(F.col("component") < F.col("a"), F.col("component"))
            .otherwise(F.col("a")).alias("component"),
        )
    )
