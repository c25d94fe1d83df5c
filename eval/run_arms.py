#!/usr/bin/env python
"""Four-arm /ask eval runner (run from the repo root) — regenerates
eval/results/last.json, the committed artifact VERDICT reads against
BASELINE.md's /ask p50.

Arms: vector (the reference's /ask path), bm25, bm25+vector RRF hybrid,
and corpus-trained Word2Vec. The w2v arm gets the full question list up
front so the whole eval set is embedded in ONE MLlib transform (the r5
arms table paid a per-question transform job — p50 1114 ms of scheduler
overhead, not retrieval).

Usage: python eval/run_arms.py [sf_dir] [out_path]
"""

from __future__ import annotations

import json
import os
import sys

# `python eval/run_arms.py` puts eval/ (not the repo root) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    # default must match the corpus eval/qa.jsonl was generated from
    # (make_qa.py SF_DIR) — a mismatched corpus scores 0/24 on every arm
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "eval/results/last.json"

    from jsonify2ai_spark.operators.evalharness import (
        default_arms,
        eval_corpus_from_documents,
        run_qa_eval,
        word2vec_arm,
    )
    from jsonify2ai_spark.session import get_spark

    spark = get_spark("eval-arms")
    spark.sparkContext.setLogLevel("ERROR")

    with open("eval/qa.jsonl", encoding="utf-8") as f:
        qa = [json.loads(line) for line in f if line.strip()]
    questions = [item.get("q") or item.get("question", "") for item in qa]

    corpus = eval_corpus_from_documents(spark, sf_dir).localCheckpoint()
    # serving-shaped lexical arms: the BM25 postings build once (BM25Index)
    # instead of re-tokenizing the corpus per question — the same
    # build-once/query-many split the w2v arm gets from batched embedding
    from jsonify2ai_spark.api import ask, bm25_search, hybrid_search
    from jsonify2ai_spark.operators.textsearch import BM25Index

    idx = BM25Index(corpus, id_col="id")
    arms = default_arms()
    arms["bm25"] = lambda c, q: ask(
        c, q, k=5, dim=64,
        retriever=lambda ch, qq, **kw: bm25_search(ch, qq, index=idx, **kw),
        min_synth_score=0.0, min_snippet_score=0.0,
    )
    arms["hybrid"] = lambda c, q: ask(
        c, q, k=5, dim=64,
        retriever=lambda ch, qq, **kw: hybrid_search(ch, qq, bm25_index=idx, **kw),
        min_synth_score=1.0 / 70.0, min_snippet_score=1.0 / 1000.0,
    )
    arms["w2v"] = word2vec_arm(corpus, questions=questions)

    # fifth arm: the quantized-IVF SERVING path (coarse probe -> partition
    # prune -> int8 cosine) end-to-end through the ask data plane — the
    # shape a 100 TB deployment retrieves with, next to the exact arms
    from jsonify2ai_spark.api import _project_sources
    from jsonify2ai_spark.functions.vectors import dev_embedding_py
    from jsonify2ai_spark.operators.ann import (
        build_quantized_ivf,
        kmeans_centroids,
        quantized_ivf_topk,
    )
    from pyspark.sql import functions as F

    cents = kmeans_centroids(corpus, k=8, vector_col="vector")
    ivf = build_quantized_ivf(
        corpus, cents, vector_col="vector", id_col="id"
    ).localCheckpoint()

    def ivf_retriever(ch, qq, k=5, dim=64, embed=None, **_f):
        qv = (embed or (lambda t: dev_embedding_py(t, dim=dim)))(qq)
        top = quantized_ivf_topk(
            ivf, qv, cents, k=max(k, 20), n_probe=3, id_col="id"
        ).select("id", F.col("qcos").alias("score"))
        out = ch.drop("score").join(F.broadcast(top), "id")
        return _project_sources(out, k=k)

    arms["ivf"] = lambda c, q: ask(c, q, k=5, dim=64, retriever=ivf_retriever)

    # one warm pass (not timed): JIT/codegen/Python-worker spinup, so the
    # recorded latencies measure serving, not first-call compilation
    for fn in arms.values():
        fn(corpus, questions[0])

    res = run_qa_eval(corpus, qa, out_path=out, arms=arms)
    print(
        json.dumps(
            {
                name: {k: r[k] for k in ("n", "hit@1", "p50_ms", "p95_ms")}
                for name, r in res["arms"].items()
            },
            indent=2,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
