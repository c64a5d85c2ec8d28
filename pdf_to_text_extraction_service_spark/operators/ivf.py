"""IVF (inverted-file) approximate nearest neighbor — the trained
scale path beyond hyperplane LSH (operators/similarity.py).

Coarse quantizer = k-means trained with DataFrame-only Lloyd
iterations (posexplode → per-(cluster, dim) means → re-broadcast), so
training is fully distributed; centroids are tiny and come back to
the driver only between iterations (k × dim floats). The index is the
vector table with a ``cluster`` column — at 100 TB you write it
partitioned by cluster so a query scans nprobe/k of the data.

Determinism: initial centroids are the k lowest-id vectors; no RNG,
no wall clock.  Since round 3 the per-(cluster, dim) means are
BIT-deterministic too: instead of ``avg`` (whose float sum follows
Spark's nondeterministic partition order), values fold through a
fixed-shape reduction tree — left-fold in ``vec_id`` order inside
fixed id-blocks of 4096, then left-fold the block sums in block
order.  The tree shape depends only on the ids, never on the
physical partitioning, so the same corpus yields the same IEEE-754
centroid on every run, on any cluster size — which is what lets a
DuckDB/numpy oracle mirror the index exactly
(``train_kmeans_mirror`` below).  Block folds are bounded
(``collect_list`` ≤ 4096 structs), so the shape survives scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import brute_force_topk


def _dist2_expr(vec_col: str, centroid: list[float]) -> str:
    arr = "array(" + ",".join(f"cast({float(v)} as double)" for v in centroid) + ")"
    return (
        f"aggregate(zip_with({vec_col}, {arr}, "
        f"(x, y) -> (cast(x as double) - y) * (cast(x as double) - y)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def assign_clusters(df: DataFrame, centroids: list[list[float]],
                    vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid assignment as one JVM expression (argmin over
    k squared distances via struct-least)."""
    structs = ", ".join(
        f"struct({_dist2_expr(vec_col, c)} as d, {i} as c)"
        for i, c in enumerate(centroids)
    )
    return df.withColumn(
        "cluster", F.expr(f"array_min(array({structs})).c")
    )


#: id-block width of the deterministic reduction tree — values fold
#: left-to-right inside a block, block sums fold in block order.
FOLD_BLOCK = 4096


def train_kmeans(df: DataFrame, k: int = 16, iters: int = 5,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> list[list[float]]:
    """Distributed Lloyd iterations; returns k centroids.

    The per-(cluster, dim) mean uses the fixed-shape reduction tree
    described in the module docstring, so the result is bit-identical
    across runs and across cluster sizes (mirrored by
    ``train_kmeans_mirror`` for the DuckDB oracle)."""
    init = (
        df.orderBy(id_col).limit(k)
        .select(vec_col).collect()
    )
    centroids = [[float(v) for v in r[vec_col]] for r in init]
    for _ in range(iters):
        assigned = assign_clusters(df, centroids, vec_col)
        # per-(cluster, dim, block) ordered fold, then per-(cluster,
        # dim) ordered fold of the block sums — two shuffles per
        # iteration, both on tiny (cluster, dim[, block]) keys with
        # bounded collect_list payloads (<= FOLD_BLOCK structs).
        exploded = assigned.select(
            "cluster",
            (F.col(id_col) / F.lit(FOLD_BLOCK)).cast("long").alias("blk"),
            F.col(id_col).alias("_vid"),
            F.posexplode(vec_col).alias("dim", "val"),
        )
        block_sums = (
            exploded.groupBy("cluster", "dim", "blk")
            .agg(
                F.expr(
                    "aggregate(array_sort(collect_list("
                    "struct(_vid, val))), cast(0.0 as double), "
                    "(acc, s) -> acc + cast(s.val as double))"
                ).alias("bsum"),
                F.count("*").alias("bn"),
            )
        )
        means = (
            block_sums.groupBy("cluster", "dim")
            .agg(
                F.expr(
                    "aggregate(array_sort(collect_list("
                    "struct(blk, bsum))), cast(0.0 as double), "
                    "(acc, s) -> acc + s.bsum)"
                ).alias("tot"),
                F.sum("bn").alias("n"),
            )
            .withColumn("m", F.col("tot") / F.col("n"))
            .groupBy("cluster")
            .agg(F.array_sort(
                F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cluster",
                    F.expr("transform(dm, x -> x.m)").alias("centroid"))
            .collect()
        )
        new = {r["cluster"]: [float(v) for v in r["centroid"]]
               for r in means}
        centroids = [new.get(i, centroids[i]) for i in range(k)]
    return centroids


def train_kmeans_mirror(ids, vecs, k: int = 16,
                        iters: int = 5) -> list[list[float]]:
    """Driver-side bit-exact mirror of :func:`train_kmeans` (numpy;
    no Spark).  Used by the DuckDB oracle to recompute the centroids
    the engine trained, and by tests to pin the determinism claim.

    ``ids``/``vecs``: parallel sequences (any order) of vec ids and
    float32-or-float64 vectors.  Every float op replicates the Spark
    expression: values cast to double, distances folded left-to-right
    over dims, sums folded through the same FOLD_BLOCK reduction
    tree in id order."""
    import numpy as np

    order = np.argsort(np.asarray(ids, dtype=np.int64), kind="stable")
    ids_s = np.asarray(ids, dtype=np.int64)[order]
    mat = np.asarray(
        [vecs[i] for i in order], dtype=np.float64)  # float32 -> double, exact
    n, dim = mat.shape
    centroids = [list(map(float, mat[i])) for i in range(min(k, n))]
    blk = ids_s // FOLD_BLOCK
    for _ in range(iters):
        cmat = np.asarray(centroids, dtype=np.float64)
        # per-(vec, centroid) squared distance with a SEQUENTIAL
        # left-fold over dims (np.cumsum is defined sequentially) —
        # same IEEE sum as Spark's aggregate(zip_with(...)).
        diff2 = (mat[:, None, :] - cmat[None, :, :]) ** 2
        d2 = np.cumsum(diff2, axis=2)[:, :, -1]
        assign = np.argmin(d2, axis=1)  # first minimum = lowest cluster
        new = []
        for c in range(len(centroids)):
            sel = assign == c
            if not sel.any():
                new.append(centroids[c])
                continue
            sub = mat[sel]
            sub_blk = blk[sel]
            cent = []
            for d in range(dim):
                tot = 0.0
                for b in np.unique(sub_blk):  # ascending block order
                    col = sub[sub_blk == b, d]
                    bsum = float(np.cumsum(col)[-1]) if len(col) else 0.0
                    tot += bsum
                cent.append(tot / float(len(sub)))
            new.append(cent)
        centroids = new
    return centroids


def build_ivf_index(df: DataFrame, k: int = 16, iters: int = 5,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding"):
    """Returns (indexed_df, centroids). Persist indexed_df partitioned
    by ``cluster`` for pruned scans at scale."""
    centroids = train_kmeans(df, k, iters, id_col, vec_col)
    return assign_clusters(df, centroids, vec_col), centroids


def write_ivf_index(df: DataFrame, path: str, k: int = 16,
                    iters: int = 5, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Build ONCE, query many: persist the clustered vector table
    partitioned by ``cluster`` (so a query's nprobe filter becomes
    parquet partition PRUNING — untouched clusters are never read)
    plus the k centroids as a tiny side table. At 100 TB this is the
    index build job; queries never retrain."""
    indexed, centroids = build_ivf_index(df, k, iters, id_col, vec_col)
    indexed.write.mode("overwrite").partitionBy("cluster") \
        .parquet(f"{path}/vectors")
    spark = df.sparkSession
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cluster int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def load_ivf_index(spark, path: str):
    """Returns (indexed_df, centroids). The vectors df is the
    partition-pruned parquet scan; centroids come back to the driver
    (k x dim floats — tiny)."""
    indexed = spark.read.parquet(f"{path}/vectors")
    rows = spark.read.parquet(f"{path}/centroids").collect()
    by_cluster = {r["cluster"]: [float(v) for v in r["centroid"]]
                  for r in rows}
    centroids = [by_cluster[i] for i in range(len(by_cluster))]
    return indexed, centroids


def ivf_topk(indexed: DataFrame, centroids: list[list[float]],
             query_vec: list[float], topk: int = 10, nprobe: int = 4,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Scan only the nprobe nearest clusters; exact rerank inside."""
    q = [float(v) for v in query_vec]
    order = sorted(
        range(len(centroids)),
        key=lambda i: sum((x - y) ** 2 for x, y in zip(centroids[i], q)),
    )
    probe = order[:nprobe]
    cand = indexed.filter(F.col("cluster").isin(probe))
    return brute_force_topk(cand, q, topk, id_col, vec_col)
