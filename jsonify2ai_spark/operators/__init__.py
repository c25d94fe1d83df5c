"""Engine operators (SURVEY §2) as DataFrame-in, DataFrame-out functions.

Every operator is declarative — it builds a logical plan and lets Catalyst pick
the physical strategy. Nothing here collects to the driver except explicit
single-value helpers (e.g. embedding one query string).
"""

from jsonify2ai_spark.operators.search import cosine_topk, knn_brute, similarity_self_join
from jsonify2ai_spark.operators.dedup import (
    exact_dedup,
    exact_dup_groups,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from jsonify2ai_spark.operators.textstats import (
    with_text_stats,
    language_id,
    language_id_df,
    quality_score,
)
from jsonify2ai_spark.operators.inventory import documents_inventory, counts_by, count_where
from jsonify2ai_spark.operators.chunker import chunk_text_py, chunk_documents
from jsonify2ai_spark.operators.upsert import replace_documents, delete_documents, write_chunks
from jsonify2ai_spark.operators.snippets import select_snippets
from jsonify2ai_spark.operators.ann import ivf_assign, ivf_topk, kmeans_centroids, lsh_similarity_join
from jsonify2ai_spark.operators.textsearch import build_postings, bm25_topk
from jsonify2ai_spark.operators.temporal import asof_join, sessionize
from jsonify2ai_spark.operators.skew import salted_agg, salted_join
from jsonify2ai_spark.operators.evalharness import batch_retrieve, eval_metrics
from jsonify2ai_spark.operators.dedup import simhash_pairs, winnowing_fingerprints

__all__ = [
    "cosine_topk", "knn_brute", "similarity_self_join",
    "exact_dedup", "exact_dup_groups", "minhash_signatures", "minhash_lsh_pairs",
    "ngram_jaccard_pairs", "simhash",
    "with_text_stats", "language_id", "language_id_df", "quality_score",
    "documents_inventory", "counts_by", "count_where",
    "chunk_text_py", "chunk_documents",
    "replace_documents", "delete_documents", "write_chunks",
    "select_snippets",
    "ivf_assign", "ivf_topk", "kmeans_centroids", "lsh_similarity_join",
    "build_postings", "bm25_topk",
    "asof_join", "sessionize",
    "salted_agg", "salted_join",
    "batch_retrieve", "eval_metrics",
    "simhash_pairs", "winnowing_fingerprints",
]
