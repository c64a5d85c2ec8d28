"""Similarity search over embedding columns (array<float>).

Two paths (prompt mandate):
- brute_force_topk: exact cosine top-k — the correctness baseline.
  Dot products are one JVM ``aggregate(zip_with(...))`` expression per
  row (whole-stage codegen; no Python). One shuffle for the global
  top-k (rank window over a single ordered column set).
- lsh_topk: the scale path — random-hyperplane LSH buckets; the query
  only scans its own bucket (and optionally multi-probe neighbors).
  At 100 TB the bucketed table is precomputed + partitioned by bucket,
  so a query touches 1/2^bits of the data; the brute path stays as
  the recall oracle.

An IVF variant (k-means coarse quantizer) would need an iterative
trainer; random-hyperplane LSH gives the same pruning shape without
iterative state, so it is the round-1 scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .floodcap import cap_flooded_buckets


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * "
        f"cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm(a: str):
    return F.sqrt(F.expr(
        f"aggregate({a}, cast(0.0 as double), (acc, v) -> "
        f"acc + cast(v as double) * cast(v as double))"
    ))


def with_cosine(df: DataFrame, query_vec: list[float],
                vec_col: str = "embedding") -> DataFrame:
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    df = df.withColumn("_q", q)
    return (
        df.withColumn(
            "cosine",
            _dot(vec_col, "_q")
            / (_norm(vec_col) * _norm("_q")),
        )
        .drop("_q")
    )


def brute_force_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k, deterministic tiebreak on id.

    orderBy().limit(k) expresses TakeOrderedAndProject directly —
    each partition keeps its local top-k and only k rows ever reach
    the driver-side merge — rather than a partition-less row_number
    window that relies on the WindowGroupLimit pushdown."""
    scored = with_cosine(df, query_vec, vec_col)
    return (
        scored.orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("cosine", 6).alias("cosine"))
    )


def hyperplane_bucket(vec_col: str, planes: list[list[float]]):
    """LSH bucket id: sign bits against fixed random hyperplanes."""
    bits = []
    for i, p in enumerate(planes):
        arr = "array(" + ",".join(f"cast({v} as double)" for v in p) + ")"
        bits.append(
            f"(case when aggregate(zip_with({vec_col}, {arr}, "
            f"(x, y) -> cast(x as double) * y), cast(0.0 as double), "
            f"(acc, v) -> acc + v) >= 0 then {1 << i} else 0 end)"
        )
    return F.expr(" + ".join(bits))


def make_planes(dim: int, bits: int = 4, seed: int = 7) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)]
            for _ in range(bits)]


def lsh_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             bits: int = 4, seed: int = 7) -> DataFrame:
    """Approximate top-k: scan only the query's hyperplane bucket."""
    planes = make_planes(len(query_vec), bits, seed)
    qbits = 0
    for i, p in enumerate(planes):
        if sum(x * y for x, y in zip(query_vec, p)) >= 0:
            qbits |= 1 << i
    bucketed = df.withColumn("_bkt", hyperplane_bucket(vec_col, planes))
    cand = bucketed.filter(F.col("_bkt") == qbits)
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


def embedding_neardup_pairs(df: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.99,
                            tables: int = 4, bits: int = 8,
                            seed: int = 11,
                            max_bucket: int = 256,
                            eager: bool = True) -> DataFrame:
    """Embedding-cosine NEAR-DUP pairs (the dedup counterpart of
    lsh_topk's search): multi-table random-hyperplane blocking, then
    exact cosine verification inside buckets only — never all-pairs.

    Returns (id_a, id_b, cosine) with id_a < id_b and cosine >=
    threshold. Recall math: a pair at angle θ splits on one plane
    with p = θ/π, shares one table's bucket with (1-p)^bits, and is
    missed entirely with (1-(1-p)^bits)^tables — for true near-dups
    (cosine >= 0.99 → θ <= 8.1°, p <= 0.045) that is < 2e-5 at
    (4 tables × 8 bits). False bucket-mates are removed by the exact
    cosine check, so the output equals the quadratic truth w.h.p.;
    max_bucket caps the per-bucket self-join exactly like the MinHash
    banding cap (boilerplate/zero-vector floods at web scale):
    buckets at or under the cap are exact, flooded buckets keep a
    deterministic hash-prefix sample (operators/floodcap.py) — the
    exact verify means sampling only loses flood-internal pairs,
    never fabricates them.

    ``eager`` (default) materializes the scalar pair output and
    releases the vector/banded caches before returning
    (minhash_lsh_pairs' contract); ``eager=False`` keeps the lazy
    plan for audits/composition.
    """
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:
        return df.sparkSession.createDataFrame(
            [], f"id_a long, id_b long, cosine double")
    dim = dim_row["d"]
    base = df.select(F.col(id_col).alias("_id"),
                     F.col(vec_col).alias("_v")).persist()
    banded = None
    for t in range(tables):
        planes = make_planes(dim, bits, seed + t)
        part = base.select(
            "_id", "_v", F.lit(t).alias("_tbl"),
            hyperplane_bucket("_v", planes).alias("_bkt"),
        )
        banded = part if banded is None else banded.unionByName(part)
    # persist: the flood-count pass and both self-join sides read
    # this relation — without it each reader recomputes all tables x
    # bits hyperplane dot products per vector. The cap itself is the
    # partial-agg flood sampler (operators/floodcap.py): the count
    # shuffle carries (table, bucket, count) scalars only, never the
    # vectors, and no rank window funnels a flooded bucket onto one
    # reducer.
    banded = banded.persist()
    capped = cap_flooded_buckets(banded, ["_tbl", "_bkt"], "_id",
                                 max_bucket)
    left = capped.select("_tbl", "_bkt", F.col("_id").alias("id_a"),
                         F.col("_v").alias("_va"))
    right = capped.select("_tbl", "_bkt", F.col("_id").alias("id_b"),
                          F.col("_v").alias("_vb"))
    cand = (
        left.join(right, ["_tbl", "_bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    scored = cand.withColumn(
        "cosine",
        _dot("_va", "_vb") / (_norm("_va") * _norm("_vb")),
    )
    out = (
        scored.filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
    if eager:
        out = out.localCheckpoint(eager=True)
        banded.unpersist()
        base.unpersist()
    return out
