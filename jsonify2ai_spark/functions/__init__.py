"""Scalar building blocks, all JVM-side Column expressions unless noted.

These are the engine's "F-series" functions from SURVEY.md §2.6 — every one is
expressed with built-in ``pyspark.sql.functions`` so it stays inside whole-stage
codegen; pandas UDFs appear only where Python semantics are irreducible (none in
this module).
"""

from jsonify2ai_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
    dev_embedding,
)
from jsonify2ai_spark.functions.ids import uuid5_sql, uuid5_py, document_id_for, chunk_id_for
from jsonify2ai_spark.functions.text import (
    normalize_ws,
    normalize_newlines,
    truncate_ellipsis,
    tokens,
    token_count,
    shingles,
    bpe_tokens,
    bpe_token_count,
)
from jsonify2ai_spark.functions.embed_live import embed_column, live_embedding_udf

__all__ = [
    "cosine_similarity", "dot", "l2_norm", "l2_normalize", "dev_embedding",
    "uuid5_sql", "uuid5_py", "document_id_for", "chunk_id_for",
    "normalize_ws", "normalize_newlines", "truncate_ellipsis",
    "tokens", "token_count", "shingles", "bpe_tokens", "bpe_token_count",
    "embed_column", "live_embedding_udf",
]
