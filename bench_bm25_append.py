#!/usr/bin/env python
"""Index-maintenance economics for ShardedBM25Index.append (r13): the
claim to verify is that appending an ingest batch costs O(batch) while
the alternative — rebuilding the merged corpus — costs O(corpus), and
that the segment-mode serving tax (per-query df_t recompute window +
one extra pruned scan) is modest and fully removed by compact().

Measured at x16 replication (~80k chunks) with a 1/16 increment:
  build_base      full build of the base corpus (the sunk cost)
  rebuild_full    fresh build of base+increment — the naive maintenance
  append          ShardedBM25Index.append of the increment (segments)
  compact         folding the segment back into an exact base
  q_base/q_seg/q_compacted
                  min-of-3 batched wall for the 24-question eval set on
                  the base, the appended (segment-mode), and the
                  compacted index

Usage: python bench_bm25_append.py    # one JSON line last
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time

from pyspark.sql import functions as F


def main() -> int:
    from jsonify2ai_spark.operators.evalharness import eval_corpus_from_documents
    from jsonify2ai_spark.operators.textsearch import ShardedBM25Index
    from jsonify2ai_spark.session import get_spark

    spark = get_spark("bench-bm25-append")
    spark.sparkContext.setLogLevel("ERROR")

    with open("eval/qa.jsonl", encoding="utf-8") as f:
        rows = [json.loads(line) for line in f if line.strip()]
    questions = list(
        dict.fromkeys(r.get("q") or r.get("question", "") for r in rows)
    )

    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base0 = eval_corpus_from_documents(spark, sf_dir)
    rep = 16
    reps = spark.range(rep).select(F.col("id").alias("rep"))
    corpus = (
        base0.crossJoin(reps)
        .select(
            F.concat_ws("-", "id", "rep").alias("id"),
            F.concat_ws(" ", "text", F.concat(F.lit("entity"), "rep")).alias(
                "text"
            ),
        )
        .localCheckpoint()
    )
    # base = 15/16, increment = the last replica (a ~6% ingest batch)
    base = corpus.filter(~F.col("id").endswith("-15"))
    incr = corpus.filter(F.col("id").endswith("-15"))
    n_base, n_incr = base.count(), incr.count()

    d_base = tempfile.mkdtemp()
    d_full = tempfile.mkdtemp()
    out = {"chunks_base": n_base, "chunks_incr": n_incr}
    try:
        t0 = time.time()
        idx = ShardedBM25Index.build(base, d_base, n_buckets=64, id_col="id")
        out["build_base_s"] = round(time.time() - t0, 2)

        def timed_queries(index):
            best = None
            for _ in range(3):
                t = time.time()
                index.topk_batch(questions, k=10).collect()
                w = time.time() - t
                best = w if best is None or w < best else best
            return round(best, 3)

        out["q_base_s"] = timed_queries(idx)

        t0 = time.time()
        full = ShardedBM25Index.build(
            base.unionByName(incr), d_full, n_buckets=64, id_col="id"
        )
        out["rebuild_full_s"] = round(time.time() - t0, 2)
        full.close()

        t0 = time.time()
        idx = idx.append(incr, "ingest-1")
        out["append_s"] = round(time.time() - t0, 2)
        out["q_segment_s"] = timed_queries(idx)

        t0 = time.time()
        idx = idx.compact()
        out["compact_s"] = round(time.time() - t0, 2)
        out["q_compacted_s"] = timed_queries(idx)
        idx.close()

        out["append_vs_rebuild"] = round(
            out["append_s"] / out["rebuild_full_s"], 3
        )
        out["segment_query_tax"] = round(
            out["q_segment_s"] / out["q_base_s"], 3
        )
    finally:
        shutil.rmtree(d_base, ignore_errors=True)
        shutil.rmtree(d_full, ignore_errors=True)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
