"""IVF ANN + Pandas-UDF cosine: recall against the exact baseline."""

from __future__ import annotations

from ug_dwh_etl_spark.operators.similarity import (
    N_CENTROIDS,
    cosine_topk,
    cosine_topk_pandas,
    ivf_assign,
    ivf_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_pandas_cosine_equals_native(spark):
    native = cosine_topk(_emb(spark), query_id=0, k=10).collect()
    arrow = cosine_topk_pandas(_emb(spark), query_id=0, k=10).collect()
    assert [(r.vec_id, r.cosine) for r in native] == [(r.vec_id, r.cosine) for r in arrow]


def test_ivf_assign_covers_all_clusters(spark):
    clusters = {r.cluster for r in ivf_assign(_emb(spark)).select("cluster").distinct().collect()}
    assert clusters <= set(range(N_CENTROIDS))
    assert len(clusters) >= 2  # seeded centroids actually partition the space


def test_ivf_topk_recall_vs_exact(spark):
    exact = {r.vec_id for r in cosine_topk(_emb(spark), query_id=0, k=10).collect()}
    approx = {r.vec_id for r in ivf_topk(_emb(spark), query_id=0, k=10, n_probe=2).collect()}
    # approximate search: require meaningful overlap with the exact top-10
    assert len(exact & approx) >= 3
