#!/usr/bin/env python
"""Six-arm /ask eval runner (run from the repo root) — regenerates
eval/results/last.json, the committed artifact VERDICT reads against
BASELINE.md's /ask p50.

Arms: vector (the reference's /ask path), bm25 via the built-once
BM25Index, FILTERED bm25 through the same index (pool-scalar recompute,
r7), bm25+vector RRF hybrid, corpus-trained Word2Vec, and the quantized
IVF serving path — plus a "batched" section measuring topk_batch for
bm25 and ivf (one job per question SET, r7). The w2v arm gets the full
question list up front so the whole eval set is embedded in ONE MLlib
transform (the r5 arms table paid a per-question transform job — p50
1114 ms of scheduler overhead, not retrieval).

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
    from pyspark.sql import functions as F

    from jsonify2ai_spark.api import ask, bm25_search, hybrid_search
    from jsonify2ai_spark.operators.textsearch import BM25Index

    # attr_cols=("path",) lets the SAME index serve the filtered arm below
    idx = BM25Index(corpus, id_col="id", attr_cols=("path",))
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
    # filtered BM25 serving arm (VERDICT r6 #6): pool restricted to the
    # most common source THROUGH the index (pool scalars recomputed from
    # its per-doc table — no corpus re-tokenize). hit@1 is structurally
    # lower (answers outside the pool can't hit); the arm exists to show
    # the filtered path's latency is index-class, not retokenize-class.
    top_src = (
        corpus.groupBy("path").count().orderBy(F.desc("count"), "path").first()["path"]
    )
    arms["bm25_filt"] = lambda c, q: ask(
        c, q, k=5, dim=64,
        retriever=lambda ch, qq, **kw: bm25_search(
            ch, qq, index=idx, path=top_src, **kw
        ),
        min_synth_score=0.0, min_snippet_score=0.0,
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

    # seventh arm (r15, VERDICT r14 #3/#7): filtered kNN INSIDE the
    # persisted vector store — IVFIndex with the path payload
    # denormalized onto the index rows, served with where= (the q156
    # face; the vector twin of bm25_filt). Same structural hit@1 caveat;
    # the arm exists to show filtered-store latency is index-class.
    import shutil
    import tempfile

    from jsonify2ai_spark.operators.ann import IVFIndex

    store_dir = tempfile.mkdtemp(prefix="eval_ivfstore_")
    store = IVFIndex.build(
        corpus, store_dir, centroids=cents, vector_col="vector",
        id_col="id", attr_cols=("path",),
    )

    def ivf_filt_retriever(ch, qq, k=5, dim=64, embed=None, **_f):
        qv = (embed or (lambda t: dev_embedding_py(t, dim=dim)))(qq)
        top = store.topk(
            qv, k=max(k, 20), n_probe=3, where=F.col("path") == top_src
        ).select("id", F.col("qcos").alias("score"))
        out = ch.drop("score").join(F.broadcast(top), "id")
        return _project_sources(out, k=k)

    arms["ivf_filt"] = lambda c, q: ask(
        c, q, k=5, dim=64, retriever=ivf_filt_retriever
    )

    # eighth arm (r15): residual-PQ serving through the persisted store
    # (quantize="pq_res", the q161 face) — the memory-optimized layout
    # (~M bytes/vector) in the ask data plane, next to the int8 arms.
    # Codebooks are the production kmeans trainer in residual space.
    from jsonify2ai_spark.operators.ann import pq_codebooks_kmeans

    pqr_cb = pq_codebooks_kmeans(
        corpus, n_codes=16, n_sub=4, vector_col="vector",
        seed=7, max_iter=5, centroids=cents,
    )
    pqr_dir = tempfile.mkdtemp(prefix="eval_pqres_")
    pqr_store = IVFIndex.build(
        corpus, pqr_dir, centroids=cents, vector_col="vector",
        id_col="id", quantize="pq_res", codebooks=pqr_cb,
    )

    def pqres_retriever(ch, qq, k=5, dim=64, embed=None, **_f):
        qv = (embed or (lambda t: dev_embedding_py(t, dim=dim)))(qq)
        top = pqr_store.topk(qv, k=max(k, 20), n_probe=3).select(
            "id", F.col("pqcos").alias("score")
        )
        out = ch.drop("score").join(F.broadcast(top), "id")
        return _project_sources(out, k=k)

    arms["ivf_pqres"] = lambda c, q: ask(
        c, q, k=5, dim=64, retriever=pqres_retriever
    )

    # one warm pass (not timed): JIT/codegen/Python-worker spinup, so the
    # recorded latencies measure serving, not first-call compilation
    for fn in arms.values():
        fn(corpus, questions[0])

    res = run_qa_eval(corpus, qa, out_path=out, arms=arms)

    # batched serving (VERDICT r6 #7): the per-question arms above pay a
    # ~200 ms scheduler floor PER QUERY on local mode; topk_batch pays ONE
    # job for the whole set. Record wall total + amortized per-query ms +
    # hit@1 computed from the same retrieval results.
    import time

    from jsonify2ai_spark.operators.ann import quantized_ivf_topk_batch

    uniq_qs = list(dict.fromkeys(questions))
    needles = {
        (item.get("q") or item.get("question", "")): (
            item.get("answer_contains") or ""
        ).lower()
        for item in qa
    }
    texts = None  # id -> text, fetched once

    def _batch_hits(by_q):
        nonlocal texts
        if texts is None:
            texts = {
                r["id"]: (r["text"] or "").lower()
                for r in corpus.select("id", "text").collect()
            }
        # same criterion as the per-question arms: needle anywhere in the
        # k-doc response (run_qa_eval serializes all k snippets) — which is
        # hit@k, and the batched dict labels it so (r7 advisor: the old
        # "hit@1" key overstated the batched numbers vs a true rank-1 check)
        hits = 0
        for qi, q in enumerate(uniq_qs):
            lst = by_q.get(qi, [])
            if needles[q] and any(
                needles[q] in texts.get(r["id"], "") for r in lst
            ):
                hits += 1
        return hits

    batched = {}
    # warm pass (JIT/codegen), then the timed one-job run
    idx.topk_batch(uniq_qs[:2], k=5).collect()
    t0 = time.perf_counter()
    rows = idx.topk_batch(uniq_qs, k=5).collect()
    total = (time.perf_counter() - t0) * 1000.0
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    batched["bm25"] = {
        "n": len(uniq_qs),
        "total_ms": round(total, 1),
        "per_q_ms": round(total / len(uniq_qs), 1),
        "hit@k": _batch_hits(by_q),
    }

    # sharded lexical serving (r12): same arithmetic, postings
    # partitioned by term bucket and partition-pruned per query — the
    # corpus-scale form of the bm25 row above (resident state: doclens)
    import shutil
    import tempfile

    from jsonify2ai_spark.operators.textsearch import ShardedBM25Index

    stmp = tempfile.mkdtemp(prefix="eval_bm25shard_")
    sidx = ShardedBM25Index.build(corpus, stmp, n_buckets=16, id_col="id")
    sidx.topk_batch(uniq_qs[:2], k=5).collect()
    t0 = time.perf_counter()
    rows = sidx.topk_batch(uniq_qs, k=5).collect()
    total = (time.perf_counter() - t0) * 1000.0
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    batched["bm25_sharded"] = {
        "n": len(uniq_qs),
        "total_ms": round(total, 1),
        "per_q_ms": round(total / len(uniq_qs), 1),
        "hit@k": _batch_hits(by_q),
    }

    # impact-ordered prefix serving (r13): same index (impact columns
    # land at build by default), per-query read bounded by
    # |terms| * depth postings — the dynamic-pruning serving form; at
    # this corpus size the depth covers every list, so hit@k must equal
    # the exact arm's (the covering-depth parity contract)
    sidx.topk_batch_impact(uniq_qs[:2], k=5, depth=1000).collect()
    t0 = time.perf_counter()
    rows = sidx.topk_batch_impact(uniq_qs, k=5, depth=1000).collect()
    total = (time.perf_counter() - t0) * 1000.0
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    batched["bm25_impact"] = {
        "n": len(uniq_qs),
        "total_ms": round(total, 1),
        "per_q_ms": round(total / len(uniq_qs), 1),
        "hit@k": _batch_hits(by_q),
    }
    sidx.close()
    shutil.rmtree(stmp, ignore_errors=True)

    from jsonify2ai_spark.functions.vectors import dev_embedding_py

    qvecs = [dev_embedding_py(q, dim=64) for q in uniq_qs]
    quantized_ivf_topk_batch(ivf, qvecs[:2], cents, k=5, n_probe=3, id_col="id").collect()
    t0 = time.perf_counter()
    rows = quantized_ivf_topk_batch(
        ivf, qvecs, cents, k=5, n_probe=3, id_col="id"
    ).collect()
    total = (time.perf_counter() - t0) * 1000.0
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    batched["ivf"] = {
        "n": len(uniq_qs),
        "total_ms": round(total, 1),
        "per_q_ms": round(total / len(uniq_qs), 1),
        "hit@k": _batch_hits(by_q),
    }

    from jsonify2ai_spark.api import hybrid_topk_batch

    hybrid_topk_batch(corpus, uniq_qs[:2], idx, k=5, dim=64).collect()
    t0 = time.perf_counter()
    rows = hybrid_topk_batch(corpus, uniq_qs, idx, k=5, dim=64).collect()
    total = (time.perf_counter() - t0) * 1000.0
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    batched["hybrid"] = {
        "n": len(uniq_qs),
        "total_ms": round(total, 1),
        "per_q_ms": round(total / len(uniq_qs), 1),
        "hit@k": _batch_hits(by_q),
    }

    # hybrid with the ANN vector arm (r8, r7 verdict #4): same fusion,
    # vector side partition-pruned quantized-IVF instead of the brute
    # corpus crossJoin — the 100 TB form of the batched hybrid
    hybrid_topk_batch(
        corpus, uniq_qs[:2], idx, k=5, dim=64, ann=(ivf, cents, 3)
    ).collect()
    t0 = time.perf_counter()
    rows = hybrid_topk_batch(
        corpus, uniq_qs, idx, k=5, dim=64, ann=(ivf, cents, 3)
    ).collect()
    total = (time.perf_counter() - t0) * 1000.0
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    batched["hybrid_ann"] = {
        "n": len(uniq_qs),
        "total_ms": round(total, 1),
        "per_q_ms": round(total / len(uniq_qs), 1),
        "hit@k": _batch_hits(by_q),
    }

    # residual-PQ batched serving (r15): one ADC job for the whole set
    pqr_store.topk_batch(qvecs[:2], k=5, n_probe=3).collect()
    t0 = time.perf_counter()
    rows = pqr_store.topk_batch(qvecs, k=5, n_probe=3).collect()
    total = (time.perf_counter() - t0) * 1000.0
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    batched["ivf_pqres"] = {
        "n": len(uniq_qs),
        "total_ms": round(total, 1),
        "per_q_ms": round(total / len(uniq_qs), 1),
        "hit@k": _batch_hits(by_q),
    }

    res["batched"] = batched
    shutil.rmtree(store_dir, ignore_errors=True)
    shutil.rmtree(pqr_dir, ignore_errors=True)
    with open(out, "w", encoding="utf-8") as f:
        json.dump(res, f, ensure_ascii=False, indent=2)
    print(
        json.dumps(
            {
                name: {k: r[k] for k in ("n", "hit@1", "p50_ms", "p95_ms")}
                for name, r in res["arms"].items()
            }
            | {"batched": batched},
            indent=2,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
