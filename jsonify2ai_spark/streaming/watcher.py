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

from jsonify2ai_spark.operators.upsert import N_BUCKETS_DEFAULT, bucket_expr, replace_documents
from jsonify2ai_spark.sinks.tables import recover_table, swap_dir
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
    n_buckets: int = N_BUCKETS_DEFAULT,
):
    """Start the incremental ingest stream; returns the StreamingQuery.

    Each micro-batch runs the batch ingest pipeline over just the new files
    and merges idempotently into the Parquet chunks table — the reference's
    whole-folder re-ingest collapses to touched-documents-only work.

    The table is hash-bucket partitioned on document_id (`bucket=N/` dirs) and
    each micro-batch rewrites ONLY the buckets its documents hash into: read
    those partitions (pruned scan), anti-join-merge, write to staging, swap
    the touched bucket directories. Batch cost is O(touched buckets), not
    O(table) — at 100 TB a file drop rewrites a few hundred MB, and untouched
    bucket files are never opened. (Production: Delta/Iceberg MERGE gives the
    same file-pruned rewrite plus cross-bucket snapshot atomicity; per-bucket
    os.replace here is atomic per bucket, like the previous whole-table swap
    was atomic per table.)
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
        # lazy localCheckpoint: the touched-bucket collect below materializes
        # the parse->chunk->embed pipeline ONCE; without it the merged.write
        # re-executes the whole (embed-heavy) subtree a second time
        chunks = (
            embed_chunks(chunk_parsed(docs, size, overlap), dim=dim)
            .withColumn("bucket", bucket_expr("document_id", n_buckets))
            .localCheckpoint(eager=False)
        )
        if os.path.exists(table_path):
            # every document this batch can replace lives in one of the
            # incoming buckets (same hash), so the merge only needs those
            # partitions — the filter is a partition prune, not a data scan
            touched = sorted(
                r["bucket"] for r in chunks.select("bucket").distinct().collect()
            )
            existing = sess.read.parquet(table_path).filter(F.col("bucket").isin(touched))
            merged = replace_documents(existing, chunks)
        else:
            merged = chunks
        # Stage-and-swap, bucket-granular: the merge plan READS the current
        # bucket files, so writing over them in place would delete files
        # mid-scan. Write the merged touched buckets to staging, then swap
        # exactly those bucket dirs (crash-safe rename-aside swap; see
        # sinks.tables.swap_dir); untouched buckets are never rewritten.
        staging = f"{table_path}__staging"
        merged.write.mode("overwrite").partitionBy("bucket").parquet(staging)
        os.makedirs(table_path, exist_ok=True)
        for entry in os.listdir(staging):
            if entry.startswith("bucket="):
                swap_dir(os.path.join(staging, entry), os.path.join(table_path, entry))
        shutil.rmtree(staging, ignore_errors=True)

    # finish or roll back any swap a previous run crashed in the middle of;
    # the stream's checkpoint then replays the interrupted batch idempotently
    recover_table(table_path)
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def reconcile_deletes(
    spark: SparkSession,
    dropzone,
    table: DataFrame,
    path_col: str = "path",
    broadcast_listing: bool = True,
) -> DataFrame:
    """T4: the surviving rows of ``table`` — those whose source file still
    exists (semi-join of table keys against the current listing; flip to
    ``left_anti`` to get the deleted set). Writing the survivors back (or
    Delta DELETE WHERE on the anti set) completes delete propagation.

    ``dropzone`` is a directory path (listed via the binaryFile source —
    column pruning keeps the scan metadata-only, file CONTENTS are never
    read) or a prebuilt listing/manifest DataFrame with ``path_col`` — the
    100 TB form, where the listing comes from an object-store inventory
    manifest instead of a live LIST.

    ``broadcast_listing=True`` (default) broadcasts the listing: right for
    dropzone-scale reconciliation (a 100k-path listing is ~10 MB — one
    driver round-trip, no shuffle of the table side, and the semi-join
    prunes inside the scan). For listings past ~10M paths flip it off: the
    plan becomes a shuffled semi-join on path, O(listing) memory per
    executor instead of a driver-sized broadcast. See PERF.md for the
    measured cost curve."""
    if isinstance(dropzone, DataFrame):
        raw = dropzone.select(F.col(path_col).alias("path"))
    else:
        from jsonify2ai_spark.sources.ingest import read_binary_files

        raw = read_binary_files(spark, dropzone).select("path")
    # same scheme-strip as ingest._parse_one so keys align
    listing = raw.select(
        F.regexp_replace(F.regexp_replace("path", r"^[a-zA-Z][\w+.-]*:/+", ""), r"^/+", "")
        .alias(path_col)
    ).distinct()
    if broadcast_listing:
        listing = F.broadcast(listing)
    return table.join(listing, on=path_col, how="left_semi")
