#!/usr/bin/env python
"""Streaming shard-ingest throughput (r11): what does the standing
TokenizeGate -> PackGate -> StreamShardSink path cost per trigger, and
how does it compare to the periodic-batch alternative
(append_token_shards) it replaces?

Protocol: one base run mints the tokenizer + layout at sf0.1; a fixed
2,000-doc stream corpus is encoded ONCE through the frozen tokenizer
(so the probe isolates the ADAPTER: PackGate fold + increment write +
manifest discipline, not encode cost — encode is corpus-linear and
identical on both paths); the same id rows then flow through
StreamShardSink at trigger sizes {50, 200, 1000} (40/10/2 triggers)
and, as the batch baseline, through ONE append_token_shards call of
all 2,000 docs (which re-encodes — its wall is reported both raw and
minus a measured encode-only pass, for the apples-to-apples number).

Prints ONE JSON line last. Run on a quiet machine; min-of-1 per cell
(each cell is already 2-40 Spark jobs — variance shows in the
per-trigger spread, reported as total/n).
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time


def main() -> int:
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.bpe import tokenize_to_ids
    from jsonify2ai_spark.pipelines import (
        StreamShardSink,
        append_token_shards,
        corpus_to_token_shards,
        load_tokenizer,
        read_token_shards,
    )
    from jsonify2ai_spark.session import get_spark, load_tables

    spark = get_spark("bench-stream-shards")
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        load_tables(spark, "/root/testdata/sf0.1", ["documents"])["documents"]
        .select("doc_id", "text")
        .localCheckpoint()
    )
    n_stream = 2000
    base_docs = docs.filter(F.col("doc_id") % 2 == 0)
    stream_docs = (
        docs.filter(F.col("doc_id") % 2 == 1).limit(n_stream).localCheckpoint()
    )

    work = tempfile.mkdtemp(prefix="bench_stream_shards_")
    results: dict = {}
    try:
        out = f"{work}/run"
        t0 = time.perf_counter()
        corpus_to_token_shards(
            base_docs,
            out,
            num_merges=100,
            exact=False,
            budget=512,
            n_groups=32,
            assemble=True,
            eos_id=0,
        )
        results["base_run_s"] = round(time.perf_counter() - t0, 2)

        merges, vocab = load_tokenizer(spark, out)
        t0 = time.perf_counter()
        ids = tokenize_to_ids(
            stream_docs, merges, vocab
        ).select("doc_id", "token_ids").localCheckpoint()
        n_ids_rows = ids.count()
        encode_s = time.perf_counter() - t0
        results["encode_once_s"] = round(encode_s, 2)

        grid = {}
        for trig in (50, 200, 1000):
            # each cell simulates its OWN standing stream: drop the
            # previous cell's persisted gate state (otherwise
            # from_artifacts resumes it and the fresh batch_id=0
            # correctly trips the replay-ordering guard)
            shutil.rmtree(f"{out}/pack_gate_state", ignore_errors=True)
            sink = StreamShardSink.from_artifacts(
                out, run_prefix=f"t{trig}-"
            )
            rows = ids.collect()  # driver-held; re-dataframed per trigger
            t0 = time.perf_counter()
            nb = 0
            for b, lo in enumerate(range(0, n_ids_rows, trig)):
                batch = spark.createDataFrame(
                    rows[lo : lo + trig], ids.schema
                )
                sink(batch, b)
                nb += 1
            sink.flush()
            wall = time.perf_counter() - t0
            grid[str(trig)] = {
                "triggers": nb,
                "wall_s": round(wall, 2),
                "ms_per_trigger": round(wall * 1000 / nb, 1),
                "docs_per_s": round(n_ids_rows / wall, 1),
            }
        results["sink_grid"] = grid

        # batch baseline: ONE append of the same docs (re-encodes text)
        t0 = time.perf_counter()
        append_token_shards(stream_docs, out, run_id="batch-baseline")
        raw = time.perf_counter() - t0
        results["append_batch_s"] = round(raw, 2)
        results["append_minus_encode_s"] = round(max(raw - encode_s, 0.0), 2)

        # sanity: the loader sees every path's rows
        results["loaded_rows"] = read_token_shards(spark, out).count()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({"stream_shards": results, "n_stream_docs": n_stream}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
