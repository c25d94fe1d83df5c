#!/usr/bin/env python
"""Streaming ingest throughput micro-benchmark (T5 foreachBatch merge).

Measures end-to-end rows/s through streaming/watcher.watch_dropzone — file
discovery -> parse -> chunk -> embed -> bucket-pruned merge -> crash-safe
bucket swap — at two bucket counts. Files are pre-dropped and
maxFilesPerTrigger slices them into several micro-batches, so the number
includes the repeated merge-into-existing-table cost, not just a first
write. Results are recorded in PERF.md; the soak test in
tests/test_streaming.py runs a smaller configuration of the same harness.

Usage: python bench_streaming.py [n_files] [chars_per_file]
       python bench_streaming.py sweep
Prints one JSON line per configuration. ``sweep`` runs the file-size x
maxFilesPerTrigger grid that separates per-TRIGGER overhead from per-ROW
cost: at 4 KB/file the stream is scheduling-bound (rows/s tracks trigger
count), so scaling file size 4 KB -> 1 MB and batching 32 -> 256 files per
trigger must scale rows/s with DATA — the cluster-relevant regime.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def run_once(
    spark,
    n_buckets: int,
    n_files: int = 200,
    chars_per_file: int = 4000,
    max_files_per_trigger: int = 32,
    dim: int = 64,
    timeout_s: float = 600.0,
) -> dict:
    """Drop ``n_files`` markdown files, stream them through the watcher's
    foreachBatch merge, and return rows/s once every document has landed."""
    from jsonify2ai_spark.streaming.watcher import watch_dropzone

    base = tempfile.mkdtemp(prefix=f"stream_bench_b{n_buckets}_")
    dz = os.path.join(base, "dz")
    os.makedirs(dz)
    table = os.path.join(base, "table")
    ckpt = os.path.join(base, "ckpt")
    line = "spark streaming merge throughput probe line\n"
    body = (line * (chars_per_file // len(line) + 1))[:chars_per_file]
    for i in range(n_files):
        with open(os.path.join(dz, f"f{i:05d}.md"), "w") as f:
            f.write(f"file {i}\n{body}")

    t0 = time.time()
    q = watch_dropzone(
        spark,
        dz,
        table,
        ckpt,
        trigger_seconds=1,
        dim=dim,
        n_buckets=n_buckets,
        max_files_per_trigger=max_files_per_trigger,
    )
    rows = docs = 0
    try:
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if q.exception():
                raise AssertionError(q.exception())
            q.processAllAvailable()
            try:
                t = spark.read.parquet(table)
                rows = t.count()
                docs = t.select("document_id").distinct().count()
            except Exception:
                rows = docs = 0
            if docs >= n_files:
                break
            time.sleep(0.25)
        dt = time.time() - t0
        # assert BEFORE cleanup so a timeout leaves the table/checkpoint
        # inspectable exactly when debugging needs them
        assert docs >= n_files, f"only {docs}/{n_files} documents landed (workdir kept: {base})"
    finally:
        q.stop()
    shutil.rmtree(base, ignore_errors=True)
    n_batches = -(-n_files // max_files_per_trigger)  # ceil
    return {
        "metric": "streaming_merge_throughput",
        "n_buckets": n_buckets,
        "files": n_files,
        "chars_per_file": chars_per_file,
        "max_files_per_trigger": max_files_per_trigger,
        "micro_batches": n_batches,
        "chunk_rows": rows,
        "seconds": round(dt, 2),
        "rows_per_sec": round(rows / dt, 1),
        "files_per_sec": round(n_files / dt, 1),
        "sec_per_batch": round(dt / n_batches, 2),
    }


def main() -> int:
    from jsonify2ai_spark.session import get_spark

    sweep = len(sys.argv) > 1 and sys.argv[1] == "sweep"
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 and not sweep else 200
    chars = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    spark = get_spark("stream_bench")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM warmup plus one small throwaway stream: the first stream in a
    # session pays ~18s of one-time codegen/scheduler compile across its
    # micro-batch merge plans (measured by swapping run order), which would
    # otherwise be billed to whichever configuration runs first
    spark.range(5_000_000).selectExpr("sum(id * 2)").collect()
    run_once(spark, 4, n_files=16, chars_per_file=1000)
    if sweep:
        # (files, chars/file, maxFilesPerTrigger): same total trigger count
        # with 16x/256x the data, then one-big-batch to amortize triggers
        grid = [
            (200, 4_000, 32),       # r3 baseline: scheduling-bound
            (200, 64_000, 32),      # 16x data, same trigger cadence
            (200, 1_000_000, 32),   # 250x data, same trigger cadence
            (200, 4_000, 200),      # same data as baseline, ONE batch
            (200, 1_000_000, 200),  # big data AND one batch
        ]
        for nf, cf, mfpt in grid:
            print(
                json.dumps(
                    run_once(
                        spark, 32, n_files=nf, chars_per_file=cf,
                        max_files_per_trigger=mfpt,
                    )
                ),
                flush=True,
            )
    else:
        for n_buckets in (8, 32):
            print(json.dumps(run_once(spark, n_buckets, n_files, chars)))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
