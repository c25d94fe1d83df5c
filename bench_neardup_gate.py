#!/usr/bin/env python
"""CorpusNearDupGate per-batch cost probe (VERDICT r5 #7).

The design claim under test (streaming/windowed.py CorpusNearDupGate): the
corpus's shingle sets + sh-partitioned posting frame are built ONCE, so
per-micro-batch cost is proportional to the BATCH, never the corpus. This
probe measures filter_batch wall-clock on a (corpus size x batch size)
grid — if the claim holds, rows/s for a given batch size is ~flat as the
corpus quadruples (a corpus-sized term would scale the batch cost ~4x).

Corpus = sf0.1 documents replicated with per-replica token perturbation
(same recipe as bench_posting_scale). Batches draw from the same
distribution with their own perturbation so a realistic fraction near-dups
the corpus — the gate does real verification work, not all-miss fast
paths.

Usage: python bench_neardup_gate.py [corpus_sizes...]  (default 100000 400000)
Prints one JSON line per (corpus, batch) cell; record the table in PERF.md.
"""
from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from bench_posting_scale import replicated_docs
from jsonify2ai_spark.session import get_spark

BATCH_SIZES = [1_000, 4_000, 16_000]


def main() -> None:
    corpus_sizes = [int(s) for s in sys.argv[1:]] or [100_000, 400_000]
    spark = get_spark("bench-neardup-gate")
    spark.sparkContext.setLogLevel("ERROR")
    from jsonify2ai_spark.streaming.windowed import CorpusNearDupGate

    # batch pool, built once: perturbed differently from corpus replicas so
    # some rows near-dup the corpus (token appended keeps ~high jaccard)
    pool = (
        replicated_docs(spark, max(BATCH_SIZES))
        .select(
            (F.col("doc_id") + 500_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" qbatch")).alias("text"),
        )
        .localCheckpoint(eager=True)
    )

    for n_corpus in corpus_sizes:
        corpus = replicated_docs(spark, n_corpus)
        t0 = time.time()
        gate = CorpusNearDupGate(corpus, threshold=0.8, df_cap=64)
        build_s = round(time.time() - t0, 2)
        for n_batch in BATCH_SIZES:
            batch = pool.limit(n_batch).localCheckpoint(eager=True)
            # warm once (plan compile), then min-of-3 the steady-state call
            # — the per-trigger cost a stream actually pays (single runs at
            # these sizes showed +/-40% machine noise; min is the honest
            # steady-state estimator per the repo's variance protocol)
            gate.filter_batch(batch).count()
            dt, kept = None, 0
            for _ in range(3):
                t0 = time.time()
                kept = gate.filter_batch(batch).count()
                d = time.time() - t0
                dt = d if dt is None else min(dt, d)
            print(
                json.dumps(
                    {
                        "corpus": n_corpus,
                        "batch": n_batch,
                        "kept": kept,
                        "dropped": n_batch - kept,
                        "build_s": build_s,
                        "batch_s": round(dt, 2),
                        "rows_per_s": int(n_batch / dt),
                    }
                ),
                flush=True,
            )
        gate.close()
        corpus.unpersist()


if __name__ == "__main__":
    main()
