"""IVF-style approximate nearest-neighbor search (north-star scale path).

Brute-force cosine top-k (operators/search.py) scans every vector — exact, and
the right baseline, but a 100 TB embedding table needs sublinear probing. The
IVF (inverted-file) pattern:

1. OFFLINE: pick K coarse centroids (MLlib KMeans in production; any
   deterministic vector set works — the operator contract is the probe
   pipeline, not the training loop), assign every vector to its nearest
   centroid, and PARTITION the table by `cluster` so each cell is its own
   file set.
2. QUERY: score the K centroids against the query (K is tiny — driver-side),
   keep the `n_probe` nearest cells, and scan ONLY those partitions —
   partition pruning turns top-k into a scan of ~n_probe/K of the data.

Recall < 1.0 by construction; measure against `knn_brute` on the same query.

Reference parity: the reference's vector search is exact HNSW-backed top-k
(worker/app/services/qdrant_client.py:469-608 — J1 in SURVEY §2.3); IVF is
the Spark-native approximate analog for cluster scale, alongside MLlib LSH
(BucketedRandomProjectionLSH) for the hash-based alternative.

Determinism: every similarity here is the sequential-fold cosine from
functions/vectors.py, so assignments and scores replicate bit-for-bit in any
engine that folds left-to-right (the DuckDB oracle does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jsonify2ai_spark.functions.vectors import cosine_similarity


def _vec_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def centroid_scores(vector: Column, centroids: list[list[float]]) -> Column:
    """array<double> of cosine(vector, centroid_i) — one entry per centroid."""
    return F.array(*[cosine_similarity(vector, _vec_lit(c)) for c in centroids])


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vector_col: str = "embedding",
) -> DataFrame:
    """Append `cluster` = 0-based index of the nearest centroid (first wins on
    ties). Pure projection — at scale this is the one-time ETL that feeds
    `.write.partitionBy("cluster")`."""
    sims = centroid_scores(F.col(vector_col), centroids)
    cluster = F.array_position(sims, F.array_max(sims)) - 1
    return df.withColumn("cluster", cluster.cast("int"))


def probe_clusters(
    query_vec: list[float], centroids: list[list[float]], n_probe: int
) -> list[int]:
    """Driver-side: the n_probe centroid ids nearest to the query (ties by
    lower id). K centroids always fit on the driver — this is query planning,
    not data-plane work."""
    import math

    def cos(a: list[float], b: list[float]) -> float:
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
            na += float(x) * float(x)
            nb += float(y) * float(y)
        d = math.sqrt(na) * math.sqrt(nb)
        return dot / d if d else float("-inf")

    ranked = sorted(
        range(len(centroids)), key=lambda i: (-cos(query_vec, centroids[i]), i)
    )
    return ranked[:n_probe]


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Approximate top-k: assign -> prune to the n_probe nearest cells ->
    exact cosine top-k within them.

    Here assignment is computed inline; the production layout assigns offline
    and partitions by `cluster`, making the `.isin(probe)` filter a partition
    prune (only n_probe/K of files scanned). Output (id, cluster, score).
    """
    probe = probe_clusters(query_vec, centroids, n_probe)
    assigned = ivf_assign(df.select(id_col, vector_col), centroids, vector_col)
    pruned = assigned.filter(F.col("cluster").isin(probe))
    scored = pruned.withColumn(
        "score", cosine_similarity(F.col(vector_col), _vec_lit(query_vec))
    )
    out = (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "cluster", "score")
    )
    if round_to is not None:
        out = out.withColumn("score", F.round("score", round_to))
    return out
