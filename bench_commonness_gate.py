#!/usr/bin/env python
"""CommonnessGate per-batch cost probe.

The design claim under test (streaming/windowed.py CommonnessGate): the
corpus's shingle-df table is built ONCE and each trigger's probe is cut
to the batch's own shingle set first (broadcast semi-join), so per-batch
annotate cost is proportional to the BATCH, ~flat as the corpus grows.

Corpus = sf0.1 documents replicated with per-replica perturbation
(bench_posting_scale recipe); batches draw half corpus-duplicated, half
novel rows so the df join does real work on both regimes.

Usage: python bench_commonness_gate.py [corpus_sizes...] (default 100000 400000)
Prints one JSON line per (corpus, batch) cell; record in PERF.md.
"""
from __future__ import annotations

import json
import sys
import time


from bench_bloom_gate import batch_pool
from bench_posting_scale import replicated_docs
from jsonify2ai_spark.session import get_spark

BATCH_SIZES = [1_000, 4_000, 16_000]


def main() -> None:
    corpus_sizes = [int(s) for s in sys.argv[1:]] or [100_000, 400_000]
    spark = get_spark("bench-commonness-gate")
    spark.sparkContext.setLogLevel("ERROR")
    from jsonify2ai_spark.streaming.windowed import CommonnessGate

    for n_corpus in corpus_sizes:
        corpus = replicated_docs(spark, n_corpus)
        pool = batch_pool(spark, corpus, max(BATCH_SIZES))
        t0 = time.time()
        gate = CommonnessGate(corpus)
        build_s = round(time.time() - t0, 2)
        for n_batch in BATCH_SIZES:
            batch = pool.limit(n_batch).localCheckpoint(eager=True)
            gate.annotate_batch(batch).count()  # warm: plan compile
            dt = None
            for _ in range(3):
                t0 = time.time()
                n = gate.annotate_batch(batch).count()
                d = time.time() - t0
                dt = d if dt is None else min(dt, d)
            assert n == n_batch  # annotate is total
            print(
                json.dumps(
                    {
                        "corpus": n_corpus,
                        "batch": n_batch,
                        "build_s": build_s,
                        "batch_s": round(dt, 3),
                        "rows_per_s": int(n_batch / dt),
                    }
                ),
                flush=True,
            )
        gate.close()


if __name__ == "__main__":
    main()
