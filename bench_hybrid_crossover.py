#!/usr/bin/env python
"""Measured brute-vs-ANN crossover for the batched hybrid arm (r9,
VERDICT r8 #8): the claim "the ANN vector arm repays its pruning
overhead at scale" gets numbers instead of a design argument.

For each corpus size the SAME 24-question set runs through
``hybrid_topk_batch`` twice — default (exact brute vector arm: one
broadcast of the query set into a corpus crossJoin, |corpus| x |batch|
flops by construction) and ``ann=`` (partition-pruned int8 quantized
IVF) — warm pass first, then min-of-3 wall per arm, amortized per
query. Corpus sizes: sf0.001 (500 chunks), sf0.1 (5 000), and sf0.1
replicated x16 with distinct ids (80 000) — the repo's q106-style
replication probe for sizes the synthetic set doesn't ship. K scales
with the corpus (8 / 32 / 64 cells at n_probe=3) exactly as a served
IVF deployment scales its quantizer, so the probed fraction shrinks as
the corpus grows — that is the IVF design point being measured.

Usage: python bench_hybrid_crossover.py   # prints one JSON line last
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F


def main() -> int:
    from jsonify2ai_spark.api import hybrid_topk_batch
    from jsonify2ai_spark.operators.ann import (
        build_quantized_ivf,
        kmeans_centroids,
    )
    from jsonify2ai_spark.operators.evalharness import eval_corpus_from_documents
    from jsonify2ai_spark.operators.textsearch import BM25Index
    from jsonify2ai_spark.session import get_spark

    spark = get_spark("bench-hybrid-crossover")
    spark.sparkContext.setLogLevel("ERROR")

    with open("eval/qa.jsonl", encoding="utf-8") as f:
        rows = [json.loads(line) for line in f if line.strip()]
    questions = list(
        dict.fromkeys(r.get("q") or r.get("question", "") for r in rows)
    )

    def corpus_at(sf_dir: str, replicate: int = 1):
        base = eval_corpus_from_documents(spark, sf_dir)
        if replicate > 1:
            parts = [
                base.select(
                    F.concat(F.lit(f"r{i}-"), F.col("id")).alias("id"),
                    *[c for c in base.columns if c != "id"],
                )
                for i in range(replicate)
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            base = out
        return base.localCheckpoint()

    cells = {"sf0.001": 8, "sf0.1": 32, "sf0.1x16": 64, "sf0.1x64": 128}
    sizes = [
        ("sf0.001", "/root/testdata/sf0.001", 1),
        ("sf0.1", "/root/testdata/sf0.1", 1),
        ("sf0.1x16", "/root/testdata/sf0.1", 16),
        # r11 (r10 verdict #6 / r9 #8): one more replication step so the
        # ANN arm's flat-ish trend is confirmed before the 2.7x/1.7x
        # numbers get quoted at face value
        ("sf0.1x64", "/root/testdata/sf0.1", 64),
    ]
    results = {}
    for label, sf_dir, rep in sizes:
        corpus = corpus_at(sf_dir, rep)
        n = corpus.count()
        idx = BM25Index(corpus, id_col="id", attr_cols=("path",))
        cents = kmeans_centroids(corpus, k=cells[label], vector_col="vector")
        ivf = build_quantized_ivf(
            corpus, cents, vector_col="vector", id_col="id"
        ).localCheckpoint()

        def timed(**kw):
            hybrid_topk_batch(corpus, questions[:2], idx, k=5, dim=64, **kw).collect()
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                hybrid_topk_batch(corpus, questions, idx, k=5, dim=64, **kw).collect()
                dt = (time.perf_counter() - t0) * 1000.0
                best = dt if best is None else min(best, dt)
            return best

        brute = timed()
        ann = timed(ann=(ivf, cents, 3))
        results[label] = {
            "chunks": n,
            "cells": cells[label],
            "hybrid_per_q_ms": round(brute / len(questions), 1),
            "hybrid_ann_per_q_ms": round(ann / len(questions), 1),
        }
        idx.close()
        print(label, results[label], flush=True)

    print(json.dumps({"crossover": results, "n_queries": len(questions)}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
