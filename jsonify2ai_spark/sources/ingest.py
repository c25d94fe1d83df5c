"""The ingest dataflow (SURVEY §3.1) as one Spark plan.

Reference lifecycle: admission -> canonicalize/identify -> parse (with
detector fan-out: one file may become N documents) -> idempotency delete ->
chunk -> embed -> upsert -> record. In the reference this is 4 HTTP process
boundaries and a per-file Python loop; here it collapses into:

    binaryFile scan -> mapInPandas(parse + detect + fan-out)
      -> chunk (posexplode pandas UDF) -> dev-embed (pure SQL projection)
      -> replace_documents merge into the chunks table

Parallelism is per-file for parsing and per-document for chunking — the right
grain at 100 TB (no file is big enough to need intra-file parallelism; the
detectors/parsers are cheap relative to IO).
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, MapType, StringType, StructField, StructType,
)

from jsonify2ai_spark.functions.ids import chunk_id_for, uuid5_py
from jsonify2ai_spark.functions.vectors import dev_embedding
from jsonify2ai_spark.operators.chunker import chunk_chat_py, chunk_text_py

# Output schema of the parse/fan-out stage: one row per *document*.
DOC_SCHEMA = StructType([
    StructField("document_id", StringType(), False),
    StructField("kind", StringType(), False),
    StructField("path", StringType(), False),
    StructField("text", StringType(), True),
    StructField("meta", MapType(StringType(), StringType()), True),
    StructField("skip_reason", StringType(), True),
])

CHUNK_OUT_SCHEMA = StructType([
    StructField("id", StringType(), False),
    StructField("document_id", StringType(), False),
    StructField("kind", StringType(), False),
    StructField("path", StringType(), False),
    StructField("idx", IntegerType(), False),
    StructField("text", StringType(), True),
    StructField("meta", MapType(StringType(), StringType()), True),
])


def read_binary_files(spark: SparkSession, root: str, glob: str | None = None) -> DataFrame:
    """T1/S17: the dropzone scan — Spark's binaryFile source does recursive
    discovery, modification times, and (at scale) partitioned listing."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.option("recursiveFileLookup", "true").load(root)


def _parse_one(path: str, content: bytes, dev_mode: bool) -> list[dict[str, Any]]:
    """Parse one file into >= 0 document rows (detector fan-out included)."""
    from jsonify2ai_spark.sources.chatgpt import is_chatgpt_export, parse_chatgpt_export
    from jsonify2ai_spark.sources.router import (
        SkipFile, ext_of, extract_text_auto, kind_for_ext, should_ignore,
    )
    from jsonify2ai_spark.sources.transcript import detect_transcript, parse_transcript

    # binaryFile paths carry a scheme ("file:/tmp/x" or "s3a://b/x"); strip it
    # for canonical relpaths so document ids don't depend on the filesystem
    rel = re.sub(r"^[a-zA-Z][\w+.-]*:/+", "", path).lstrip("/")
    if should_ignore(rel):
        return []
    ext = ext_of(rel)
    kind = kind_for_ext(ext)
    base_meta = {"ext": ext, "bytes": str(len(content)), "source_system": "filesystem"}

    def doc(doc_id: str, k: str, text: str, meta: dict) -> dict:
        return {
            "document_id": doc_id, "kind": k, "path": rel, "text": text,
            "meta": {**base_meta, **meta}, "skip_reason": None,
        }

    try:
        text = extract_text_auto(rel, content, dev_mode=dev_mode)
    except SkipFile as e:
        return [{
            "document_id": uuid5_py(rel), "kind": kind, "path": rel, "text": None,
            "meta": base_meta, "skip_reason": str(e),
        }]
    if not text or not text.strip():
        return []

    # detector fan-outs (§3.1 step 3)
    if ext in ("json",):
        try:
            data = json.loads(text if kind != "json" else content.decode("utf-8", "ignore"))
        except ValueError:
            data = None
        if data is not None and is_chatgpt_export(data, rel):
            return [
                doc(doc_id, "chat", t, m)
                for doc_id, t, m in parse_chatgpt_export(data, source_file=rel)
            ]
    if ext in ("txt", "md", "markdown"):
        detected, conf = detect_transcript(text, rel)
        if detected:
            return [
                doc(doc_id, "chat", t, {**m, "detect_confidence": str(conf)})
                for doc_id, t, m in parse_transcript(text, rel)
            ]

    return [doc(uuid5_py(rel), kind, text, {"doc_type": kind, "detected_as": kind})]


def parse_files(files: DataFrame, dev_mode: bool = True) -> DataFrame:
    """binaryFile rows -> document rows (mapInPandas: one file may fan out)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(_parse_one(path, bytes(content), dev_mode))
            yield pd.DataFrame(
                rows, columns=[f.name for f in DOC_SCHEMA.fields]
            ) if rows else pd.DataFrame(columns=[f.name for f in DOC_SCHEMA.fields])

    return files.select("path", "content").mapInPandas(gen, DOC_SCHEMA)


def chunk_parsed(docs: DataFrame, size: int = 800, overlap: int = 100) -> DataFrame:
    """Documents -> chunk rows with deterministic chunk ids and provenance.

    Chat documents use the chat-aware chunker (W2), everything else the
    sliding window (W1) — the same dispatch the reference makes
    (process.py:470-475 vs :586-591).
    """

    @F.pandas_udf(ArrayType(StringType()))
    def _chunks(text: pd.Series, kind: pd.Series) -> pd.Series:
        return pd.Series([
            (chunk_chat_py(t, size) if k == "chat" else chunk_text_py(t, size, overlap))
            if t else []
            for t, k in zip(text, kind)
        ])

    live = docs.filter(F.col("skip_reason").isNull() & F.col("text").isNotNull())
    exploded = live.select(
        "document_id", "kind", "path", "meta",
        F.posexplode(_chunks(F.col("text"), F.col("kind"))).alias("idx", "chunk_text"),
    )
    return exploded.select(
        chunk_id_for("document_id", "idx").alias("id"),
        "document_id", "kind", "path", "idx",
        F.col("chunk_text").alias("text"),
        "meta",
    )


def embed_chunks(chunks: DataFrame, dim: int = 768, text_col: str = "text") -> DataFrame:
    """F6 dev-mode embedding projection (pluggable: swap for an
    iterator-of-batches pandas UDF hitting a real model server)."""
    return chunks.withColumn("vector", dev_embedding(F.col(text_col), dim=dim))


def ingest_summary(docs: DataFrame, chunks: DataFrame) -> DataFrame:
    """A5 per-run ingest summary in two small aggregations: files scanned,
    documents parsed/skipped (with reasons), chunk count, per-kind counts —
    the reference accumulates these in Python dicts per file
    (ingest_dropzone.py:349-356,512-522); here each is a map-side-combined
    aggregate over the run's DataFrames."""
    doc_stats = docs.agg(
        F.count(F.lit(1)).alias("documents_seen"),
        F.count(F.when(F.col("skip_reason").isNotNull(), 1)).alias("documents_skipped"),
        F.countDistinct("path").alias("files_scanned"),
        F.array_sort(F.collect_set("skip_reason")).alias("skip_reasons"),
    )
    # one pass over chunks: the total is the sum of the per-kind counts, so
    # a second chunks aggregation (which would re-run the whole parse ->
    # chunk -> embed pipeline when called on an in-flight frame) is wasted
    chunk_stats = (
        chunks.groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum("n").alias("chunks_emitted"),
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("kind", "n")))
            ).alias("per_kind"),
        )
        .withColumn("chunks_emitted", F.coalesce(F.col("chunks_emitted"), F.lit(0)))
    )
    return doc_stats.crossJoin(chunk_stats)


def ingest_files(
    spark: SparkSession,
    root: str,
    existing: DataFrame | None = None,
    size: int = 800,
    overlap: int = 100,
    dim: int = 768,
    dev_mode: bool = True,
) -> DataFrame:
    """Full §3.1 pipeline returning the new chunks-table state (lazily).

    With ``existing`` provided, performs the idempotent replace-by-document_id
    merge (J5); ingesting the same tree twice converges to the same table.
    """
    from jsonify2ai_spark.operators.upsert import replace_documents

    files = read_binary_files(spark, root)
    docs = parse_files(files, dev_mode=dev_mode)
    chunks = embed_chunks(chunk_parsed(docs, size, overlap), dim=dim)
    if existing is None:
        return chunks
    return replace_documents(existing, chunks)
