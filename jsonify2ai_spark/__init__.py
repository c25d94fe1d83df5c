"""jsonify2ai_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference RAG engine (Mugiwara555343/jsonify2ai),
re-expressed Spark-first.

The reference is a local-first RAG stack (parse -> chunk -> embed -> vector upsert ->
filtered top-k search / inventory / export). This package implements the same data
model and operator inventory as DataFrame transformations over Parquet, designed for
a 1000-executor cluster at ~100 TB:

- ``schema``      — the unified chunk schema (reference: worker/app/schema/chunk_schema.py)
- ``session``     — tuned SparkSession builder (AQE, Arrow, shuffle sizing)
- ``functions``   — scalar building blocks: ids (UUID5), dev-mode + live embeddings,
                    cosine similarity, text normalization, BPE-ish tokens
- ``operators``   — search (top-k, similarity joins incl. broadcast-GEMM), ANN
                    (IVF, MLlib KMeans/LSH), dedup (exact/minhash/simhash/jaccard/
                    winnowing), BM25 text search, chunkers, text stats, snippets,
                    inventory, idempotent upsert, skew mitigation, temporal
                    (sessionize, as-of), eval harness
- ``sources``     — file-format parsers + detectors (csv/json/chatgpt/transcript/
                    notes), the §3.1 ingest dataflow
- ``sinks``       — JSONL/ZIP export with manifests, table ensure/repair
- ``streaming``   — dropzone watcher, watermarked windows, stateful debounce
- ``multimodal``  — binary media columns + decode/feature/frame-sample stubs
- ``plans``       — physical-plan inspection/assertion helpers
- ``api``         — the reference's HTTP surface as functions (search/ask/...)
"""

__version__ = "0.1.0"
