#!/usr/bin/env python
"""mine_hard_negatives cost probe: one corpus pass per BATCH.

The design claim (operators/textsearch.py mine_hard_negatives): the
whole mining batch is one plan — the corpus tokenizes once per batch
(not per query), postings are restricted to the batch vocabulary via a
broadcast semi-join, and per-query cost is the amortized share. So wall
per batch should be ~flat in batch size (corpus pass dominates) and
ms/query should fall ~linearly as the batch grows.

Usage: python bench_mining_scale.py [corpus_sizes...] (default 100000 400000)
Prints one JSON line per (corpus, n_queries) cell; record in PERF.md.
"""
from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from bench_posting_scale import replicated_docs
from jsonify2ai_spark.session import get_spark

BATCHES = [4, 24, 96]


def main() -> None:
    corpus_sizes = [int(s) for s in sys.argv[1:]] or [100_000, 400_000]
    spark = get_spark("bench-mining-scale")
    spark.sparkContext.setLogLevel("ERROR")
    from jsonify2ai_spark.operators.textsearch import mine_hard_negatives

    for n_corpus in corpus_sizes:
        corpus = replicated_docs(spark, n_corpus)
        # queries: prefixes of real corpus docs, positives = the doc
        qpool = (
            corpus.limit(max(BATCHES))
            .select(
                F.col("doc_id").alias("query_id"),
                F.array_join(
                    F.slice(F.split(F.trim("text"), r"\s+"), 1, 6), " "
                ).alias("query_text"),
                F.col("doc_id").alias("positive_id"),
            )
            .localCheckpoint(eager=True)
        )
        for n_q in BATCHES:
            pairs = qpool.limit(n_q).localCheckpoint(eager=True)
            mine_hard_negatives(pairs, corpus, k=5).count()  # warm
            dt = None
            for _ in range(3):
                t0 = time.time()
                mine_hard_negatives(pairs, corpus, k=5).count()
                d = time.time() - t0
                dt = d if dt is None else min(dt, d)
            print(
                json.dumps(
                    {
                        "corpus": n_corpus,
                        "n_queries": n_q,
                        "batch_s": round(dt, 3),
                        "ms_per_query": round(1000 * dt / n_q, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
