"""jsonify2ai_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference RAG engine (Mugiwara555343/jsonify2ai),
re-expressed Spark-first.

The reference is a local-first RAG stack (parse -> chunk -> embed -> vector upsert ->
filtered top-k search / inventory / export). This package implements the same data
model and operator inventory as DataFrame transformations over Parquet, designed for
a 1000-executor cluster at ~100 TB:

- ``schema``      — the unified chunk schema (reference: worker/app/schema/chunk_schema.py)
- ``session``     — tuned SparkSession builder (AQE, Arrow, shuffle sizing)
- ``functions``   — scalar building blocks: ids (UUID5), dev-mode embeddings,
                    cosine similarity, text normalization
- ``operators``   — search (top-k, similarity join), dedup (exact/minhash/simhash),
                    chunkers, text stats, inventory aggregations, idempotent upsert
- ``sources``     — file-format parsers (csv/json/jsonl/text flatteners, router)
- ``streaming``   — Structured Streaming dropzone watcher (incremental ingest)
"""

__version__ = "0.1.0"
