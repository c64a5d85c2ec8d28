"""IVF ANN: k-means training determinism + recall vs brute force."""

from __future__ import annotations

import pytest

from pdf_to_text_extraction_service_spark.operators.ivf import (
    build_ivf_index,
    ivf_topk,
    train_kmeans,
)
from pdf_to_text_extraction_service_spark.operators.similarity import (
    brute_force_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    df.count()
    return df


def test_kmeans_deterministic(spark, emb):
    c1 = train_kmeans(emb, k=4, iters=2)
    c2 = train_kmeans(emb, k=4, iters=2)
    assert c1 == c2
    assert len(c1) == 4 and len(c1[0]) == 64


def test_ivf_recall(spark, emb):
    indexed, centroids = build_ivf_index(emb, k=8, iters=3)
    q = [float(v) for v in
         emb.filter("vec_id = 0").first()["embedding"]]
    brute = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    approx = [r["vec_id"]
              for r in ivf_topk(indexed, centroids, q, topk=10,
                                nprobe=4).collect()]
    # self-match always survives; recall@10 with half the clusters
    # probed should be high on 50 clustered vectors
    assert approx[0] == brute[0] == 0
    recall = len(set(approx) & set(brute)) / 10
    assert recall >= 0.5
    # full probe == exact
    exact = [r["vec_id"]
             for r in ivf_topk(indexed, centroids, q, topk=10,
                               nprobe=8).collect()]
    assert exact == brute
