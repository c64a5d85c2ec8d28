"""SemDeDup-style semantic deduplication over an embedding column.

The published method (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", public
arXiv): k-means-cluster the embedding space, compare pairs only
WITHIN a cluster, and drop every document whose cosine similarity to
a lower-id cluster-mate exceeds the threshold.  The clustering is
the candidate generator — the LSH-free counterpart of
operators/similarity.embedding_neardup_pairs, preferred when the
corpus already needs cluster structure (curriculum mixing, per-topic
caps) or when duplicates are semantic rather than near-verbatim.

Spark-first shape (100 TB posture):

- k-means = operators/ivf.train_kmeans — the bit-deterministic
  fixed-shape reduction tree already used by the IVF index, so the
  DuckDB oracle can recompute identical centroids driver-side
  (ivf.train_kmeans_mirror) and mirror the assignment exactly;
- assignment is one JVM expression per row (argmin over k squared
  distances — ivf.assign_clusters); vectors cross exactly one
  Exchange (the cluster-key self-join);
- a flooded cluster (boilerplate embeddings all at one point) is
  capped by the partial-agg flood sampler (operators/floodcap.py),
  never a rank window; clusters at or under the cap are EXACT;
- the exact cosine verify (float64 dot / norms, JVM fold) runs
  inside clusters only — never all-pairs.

Returns the REMOVED rows: (id, kept_id, cosine) where kept_id is
the lowest-id qualifying cluster-mate (deterministic witness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .floodcap import cap_flooded_buckets
from .ivf import assign_clusters, train_kmeans

_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> "
        "cast(x as double) * cast(y as double)), "
        "cast(0.0 as double), (acc, v) -> acc + v)")


def semantic_dedup(df: DataFrame, k: int = 8, iters: int = 3,
                   threshold: float = 0.95,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   max_cluster: int = 4096,
                   centroids: list[list[float]] | None = None,
                   eager: bool = True) -> DataFrame:
    """Cluster-then-prune semantic dedup; see module docstring.

    ``centroids`` lets callers reuse an already-trained IVF
    codebook (index build + dedup in one pass over the corpus);
    ``eager`` materializes the scalar output and releases the
    internal caches (the LSH pair ops' production contract)."""
    if centroids is None:
        centroids = train_kmeans(df, k=k, iters=iters,
                                 id_col=id_col, vec_col=vec_col)
    assigned = assign_clusters(
        df.select(id_col, vec_col), centroids, vec_col,
    ).select(
        "cluster", F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.expr("sqrt(" + _DOT.format(a=vec_col, b=vec_col) + ")")
        .alias("_n"),
    ).persist()    # flood-count pass + both join sides read this

    capped = cap_flooded_buckets(assigned, ["cluster"], "_id",
                                 max_cluster)
    left = capped.select("cluster", F.col("_id").alias("_ida"),
                         F.col("_v").alias("_va"),
                         F.col("_n").alias("_na"))
    right = capped.select("cluster", F.col("_id").alias("_idb"),
                          F.col("_v").alias("_vb"),
                          F.col("_n").alias("_nb"))
    pairs = (
        left.join(right, "cluster")
        .filter(F.col("_ida") < F.col("_idb"))
        .withColumn(
            "cosine",
            F.expr(_DOT.format(a="_va", b="_vb"))
            / (F.col("_na") * F.col("_nb")),
        )
        .filter(F.col("cosine") >= threshold)
    )
    # each removed id keeps its LOWEST-id qualifying witness: min
    # over struct(kept_id, cosine) — map-side combinable partial agg,
    # no window
    out = (
        pairs.groupBy(F.col("_idb").alias(id_col))
        .agg(F.min(F.struct(
            F.col("_ida").alias("kept_id"),
            F.col("cosine").alias("cosine"))).alias("w"))
        .select(id_col, F.col("w.kept_id").alias("kept_id"),
                F.round("w.cosine", 6).alias("cosine"))
    )
    if eager:
        out = out.localCheckpoint(eager=True)
        assigned.unpersist()
    return out
