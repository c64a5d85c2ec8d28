"""Connected components over near-duplicate pair edges — the step
after pairwise dedup in a training pipeline: near-dup PAIRS become
CLUSTERS, and each cluster keeps one canonical document (the min id).

Algorithm: CCF-Iterate (Kang et al., "Connected Components in
MapReduce and Beyond" family): each round groups edges by node,
propagates the minimum label to every neighbor, and counts newly
created pairs; convergence in O(d) rounds for diameter d (near-dup
clusters are shallow — a handful of rounds in practice) with one
shuffle per round. The per-node neighbor set is bounded by the
upstream per-bucket candidate caps (operators/neardup.py), so no
group explodes.

Everything is integer min-propagation — deterministic under any
partitioning, so the DuckDB oracle (recursive-CTE transitive closure
+ min label) matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 50) -> DataFrame:
    """(id, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id reachable from ``id``."""
    # materialize the edge list ONCE: the input is typically an
    # expensive near-dup pipeline, and every CCF round (plus the
    # final vertex join) would otherwise recompute its whole lineage
    base = edges.select(
        F.col(id_a).cast("long").alias("a"),
        F.col(id_b).cast("long").alias("b"),
    ).distinct().persist()
    pairs = base
    for _ in range(max_iter):
        # CCF maps every pair in BOTH directions each round — the
        # reversal is what lets a label flow back up a chain
        sym = pairs.union(
            pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct()
        grouped = sym.groupBy("a").agg(
            F.min("b").alias("m"),
            F.collect_set("b").alias("vs"),
        )
        # label shrink: (a, m) when m < a, plus (v, m) for the other
        # neighbors — the CCF-Iterate emission
        nxt = (
            grouped.select(
                F.expr(
                    "explode(concat("
                    "  case when m < a then array(struct(a as x, m as y)) "
                    "       else array() end,"
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
            break
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
