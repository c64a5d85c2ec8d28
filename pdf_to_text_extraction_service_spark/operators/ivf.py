"""IVF (inverted-file) approximate nearest neighbor — the trained
scale path beyond hyperplane LSH (operators/similarity.py).

Coarse quantizer = k-means trained with DataFrame-only Lloyd
iterations (posexplode → per-(cluster, dim) means → re-broadcast), so
training is fully distributed; centroids are tiny and come back to
the driver only between iterations (k × dim floats). The index is the
vector table with a ``cluster`` column — at 100 TB you write it
partitioned by cluster so a query scans nprobe/k of the data.

Determinism: initial centroids are the k lowest-id vectors; no RNG,
no wall clock.
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


def train_kmeans(df: DataFrame, k: int = 16, iters: int = 5,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> list[list[float]]:
    """Distributed Lloyd iterations; returns k centroids."""
    init = (
        df.orderBy(id_col).limit(k)
        .select(vec_col).collect()
    )
    centroids = [[float(v) for v in r[vec_col]] for r in init]
    for _ in range(iters):
        assigned = assign_clusters(df, centroids, vec_col)
        # per-(cluster, dim) means via posexplode — one shuffle per
        # iteration, partial aggregation applies
        means = (
            assigned.select("cluster",
                            F.posexplode(vec_col).alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
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
