"""IVF approximate-ANN operator tests: assignment, pruning, recall vs brute."""

from __future__ import annotations

from pyspark.sql import functions as F

from jsonify2ai_spark.operators.ann import ivf_assign, ivf_topk, probe_clusters
from jsonify2ai_spark.operators.search import knn_brute


def _centroids(tables, k=4):
    emb = tables["embeddings"]
    rows = emb.filter(F.col("vec_id") < k).orderBy("vec_id").select("embedding").collect()
    return [[float(x) for x in r[0]] for r in rows]


def _query_vec(tables, vec_id=0):
    r = tables["embeddings"].filter(F.col("vec_id") == vec_id).select("embedding").collect()
    return [float(x) for x in r[0][0]]


def test_ivf_assign_covers_all_rows(tables):
    emb = tables["embeddings"]
    cents = _centroids(tables)
    assigned = ivf_assign(emb, cents)
    assert assigned.count() == emb.count()
    clusters = {r[0] for r in assigned.select("cluster").distinct().collect()}
    assert clusters <= set(range(len(cents)))


def test_probe_clusters_prefers_own_centroid(tables):
    cents = _centroids(tables)
    # centroid 2's own vector must rank itself first
    probe = probe_clusters(cents[2], cents, n_probe=1)
    assert probe == [2]


def test_ivf_topk_hits_query_vector_and_recall(tables):
    emb = tables["embeddings"]
    cents = _centroids(tables)
    q = _query_vec(tables)
    approx = ivf_topk(emb, q, cents, k=10, n_probe=2)
    rows = approx.collect()
    assert len(rows) == 10
    # the query vector itself lives in a probed cluster (it IS centroid 0)
    assert rows[0]["vec_id"] == 0 and abs(rows[0]["score"] - 1.0) < 1e-6
    # recall vs exact brute force: probing half the cells must keep >= 50%
    exact_ids = {r["vec_id"] for r in knn_brute(emb, q, k=10).collect()}
    approx_ids = {r["vec_id"] for r in rows}
    assert len(exact_ids & approx_ids) >= 5
