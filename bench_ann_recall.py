#!/usr/bin/env python
"""ANN recall-vs-scale probe (VERDICT r4 #2/#5): recall@10 and per-query
latency for the float IVF path (q25's operator), the composed int8-IVF
serving path (q69), and MLlib BucketedRandomProjectionLSH, at 512k and 1M
vectors.

Corpus: sf0.1 embeddings (2,000 x 64 float) replicated R times; replica 0
keeps the original vectors, replica r>0 perturbs element i by
0.02*sin(r*2.4 + i*0.7 + vec_id) — deterministic, JVM-side, no two replicas
equal. Queries are 10 original vectors, so ground truth contains each
query's own replica-0 row.

Ground truth: exact float cosine top-10 over the full corpus (knn_brute).
Centroids: MLlib KMeans (k=64, seed=7) fit on a ~2% sample — the production
coarse-quantizer recipe (fit on a sample, assign everything).

Offline costs (assignment, quantization, LSH hashing) are materialized once
and excluded from per-query timings, mirroring the production layout where
they are write-time ETL. Prints per-(scale, path, param) rows then ONE
compact JSON line for PERF.md.

Usage: python bench_ann_recall.py [--scales 256,512] [--queries 10]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F


N_QUERIES = 10
K_CENTROIDS = 64
KNN_K = 10


def replicate(emb, reps: int, mode: str = "uniform"):
    """(vec_id, embedding) x reps with deterministic perturbation; replica 0
    is the original row. New ids = old_id * reps + r (collision-free).

    mode="uniform": noise amplitude GROWS with the replica index (0.02*r, up
    to ~5 at r=255) — the corpus stays near-uniform overall, the adversarial
    geometry for IVF (no cluster structure for the coarse quantizer to find).
    mode="clustered": small bounded PSEUDO-RANDOM noise (amp 0.05->0.15
    ramped by r; phase mixed from (r, i, base) with large coprime strides so
    no two replicas share a noise pattern) — each base vector becomes a
    tight, well-separated cluster of `reps` points, the geometry real
    semantic embeddings have and IVF is designed for; a query's true top-10
    are its own low-r replicas. (A FIRST version used a shared sinusoid
    sin(r*2.4 + i*0.7 + base): KMeans then clustered by the per-r noise
    PATTERN instead of by base — true neighbors scattered across ~10 cells
    and recall maxed at 0.62. Structured noise is itself structure.)"""
    r = F.col("r").cast("int")
    if mode == "uniform":
        noise = "0.02 * r * sin(r * 2.4 + i * 0.7 + vec_id)"
    else:
        noise = (
            f"(0.05 + 0.1 * r / {reps})"
            " * sin((r * 131 + i * 17 + vec_id * 7919) * 0.61)"
        )
    return (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(
            emb.sparkSession.range(reps).select(F.col("id").alias("r"))
        ))
        .select(
            (F.col("vec_id") * reps + r).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> cast(x as double)"
                f" + {noise})"
            ).alias("embedding"),
        )
        # the crossJoin inherits the 2k-row input's partitioning (1-2
        # partitions) — without this every downstream scan runs on 1 of 32
        # cores (measured: the whole probe serialized)
        .repartition(64)
    )


def recall(approx_ids: set, exact_ids: set) -> float:
    return len(approx_ids & exact_ids) / max(1, len(exact_ids))


def main() -> int:
    scales = [256, 512]
    n_queries = N_QUERIES
    mode = "uniform"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--scales":
            scales = [int(x) for x in sys.argv[i + 2].split(",")]
        if a == "--queries":
            n_queries = int(sys.argv[i + 2])
        if a == "--mode":
            mode = sys.argv[i + 2]

    from jsonify2ai_spark.operators.ann import (
        build_pq_ivf,
        build_quantized_ivf,
        ivf_assign,
        ivf_topk,
        kmeans_centroids,
        pq_codebooks_kmeans,
        pq_ivf_topk,
        quantized_ivf_topk,
    )
    from jsonify2ai_spark.operators.search import knn_brute
    from jsonify2ai_spark.session import get_spark, load_tables

    spark = get_spark("bench-ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, "/root/testdata/sf0.1", ["embeddings"])["embeddings"]
    queries = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < n_queries)
        .orderBy("vec_id").select("embedding").collect()
    ]

    results = []
    for reps in scales:
        n = 2000 * reps
        big = replicate(emb, reps, mode).localCheckpoint()  # materialize corpus
        print(f"== scale {n:,} vectors, mode={mode} ==", flush=True)

        # offline: coarse quantizer fit on a ~2% sample, then assignment +
        # int8 quantization materialized (write-time ETL in production)
        t0 = time.time()
        cents = kmeans_centroids(big.sample(0.02, seed=7), k=K_CENTROIDS, seed=7)
        t_fit = time.time() - t0
        # impl="arrow": numpy-GEMM assignment — at K=64 the Column-expression
        # form drops out of codegen into interpreted eval (see ivf_assign)
        t0 = time.time()
        assigned = ivf_assign(big, cents, impl="arrow").localCheckpoint()
        t_assign = time.time() - t0
        t0 = time.time()
        qindex = build_quantized_ivf(big, cents, impl="arrow").localCheckpoint()
        t_quant = time.time() - t0
        # PQ offline: per-subspace kmeans codebooks on the same ~2% sample,
        # then GEMM encoding (r15 — 8 bytes/vector vs int8's 64 vs float's 512)
        t0 = time.time()
        pq_cb = pq_codebooks_kmeans(
            big.sample(0.02, seed=7), n_codes=256, n_sub=8, seed=7
        )
        t_pq_fit = time.time() - t0
        t0 = time.time()
        pqindex = build_pq_ivf(big, cents, pq_cb).localCheckpoint()
        t_pq_enc = time.time() - t0
        # residual PQ (r15): codebooks trained on v - centroid[cluster]
        # over the same sample, encoding against the same coarse layout —
        # same bytes, the recall fix when plain PQ saturates
        t0 = time.time()
        pqr_cb = pq_codebooks_kmeans(
            big.sample(0.02, seed=7), n_codes=256, n_sub=8, seed=7,
            centroids=cents,
        )
        t_pqr_fit = time.time() - t0
        t0 = time.time()
        pqrindex = build_pq_ivf(big, cents, pqr_cb, residual=True).localCheckpoint()
        t_pqr_enc = time.time() - t0
        print(f"offline: kmeans_fit={t_fit:.1f}s assign={t_assign:.1f}s "
              f"quantize={t_quant:.1f}s pq_fit={t_pq_fit:.1f}s "
              f"pq_encode={t_pq_enc:.1f}s pqres_fit={t_pqr_fit:.1f}s "
              f"pqres_encode={t_pqr_enc:.1f}s", flush=True)

        # ground truth + brute-force latency baseline
        exact: list[set] = []
        t_brute = []
        for q in queries:
            t0 = time.time()
            exact.append({r["vec_id"] for r in knn_brute(big, q, k=KNN_K).collect()})
            t_brute.append(time.time() - t0)
        brute_p50 = sorted(t_brute)[len(t_brute) // 2]
        results.append({"n": n, "path": "brute", "param": None,
                        "recall_at_10": 1.0, "p50_query_s": round(brute_p50, 3)})
        print(f"brute:           recall=1.000 p50={brute_p50:.2f}s", flush=True)

        for n_probe in (1, 2, 4, 8, 16):
            recs, ts = [], []
            for q, ex in zip(queries, exact):
                t0 = time.time()
                ids = {r["vec_id"] for r in ivf_topk(
                    assigned, q, cents, k=KNN_K, n_probe=n_probe,
                    preassigned=True).collect()}
                ts.append(time.time() - t0)
                recs.append(recall(ids, ex))
            p50 = sorted(ts)[len(ts) // 2]
            mean_rec = sum(recs) / len(recs)
            results.append({"n": n, "path": "ivf_float", "param": n_probe,
                            "recall_at_10": round(mean_rec, 3),
                            "p50_query_s": round(p50, 3)})
            print(f"ivf   nprobe={n_probe:>2}: recall={mean_rec:.3f} "
                  f"p50={p50:.2f}s", flush=True)

            recs, ts = [], []
            for q, ex in zip(queries, exact):
                t0 = time.time()
                ids = {r["vec_id"] for r in quantized_ivf_topk(
                    qindex, q, cents, k=KNN_K, n_probe=n_probe).collect()}
                ts.append(time.time() - t0)
                recs.append(recall(ids, ex))
            p50 = sorted(ts)[len(ts) // 2]
            mean_rec = sum(recs) / len(recs)
            results.append({"n": n, "path": "ivf_int8", "param": n_probe,
                            "recall_at_10": round(mean_rec, 3),
                            "p50_query_s": round(p50, 3)})
            print(f"ivf8  nprobe={n_probe:>2}: recall={mean_rec:.3f} "
                  f"p50={p50:.2f}s", flush=True)

            recs, ts = [], []
            for q, ex in zip(queries, exact):
                t0 = time.time()
                ids = {r["vec_id"] for r in pq_ivf_topk(
                    pqindex, q, cents, pq_cb, k=KNN_K,
                    n_probe=n_probe).collect()}
                ts.append(time.time() - t0)
                recs.append(recall(ids, ex))
            p50 = sorted(ts)[len(ts) // 2]
            mean_rec = sum(recs) / len(recs)
            results.append({"n": n, "path": "ivf_pq8x256", "param": n_probe,
                            "recall_at_10": round(mean_rec, 3),
                            "p50_query_s": round(p50, 3)})
            print(f"ivfPQ nprobe={n_probe:>2}: recall={mean_rec:.3f} "
                  f"p50={p50:.2f}s", flush=True)

            recs, ts = [], []
            for q, ex in zip(queries, exact):
                t0 = time.time()
                ids = {r["vec_id"] for r in pq_ivf_topk(
                    pqrindex, q, cents, pqr_cb, k=KNN_K,
                    n_probe=n_probe, residual=True).collect()}
                ts.append(time.time() - t0)
                recs.append(recall(ids, ex))
            p50 = sorted(ts)[len(ts) // 2]
            mean_rec = sum(recs) / len(recs)
            results.append({"n": n, "path": "ivf_pqres8x256", "param": n_probe,
                            "recall_at_10": round(mean_rec, 3),
                            "p50_query_s": round(p50, 3)})
            print(f"ivfPR nprobe={n_probe:>2}: recall={mean_rec:.3f} "
                  f"p50={p50:.2f}s", flush=True)

        # MLlib LSH approxNearestNeighbors vs numHashTables
        from pyspark.ml.feature import BucketedRandomProjectionLSH
        from pyspark.ml.functions import array_to_vector
        from pyspark.ml.linalg import Vectors

        from jsonify2ai_spark.functions.vectors import l2_normalize

        normed = big.select(
            "vec_id",
            array_to_vector(l2_normalize(F.col("embedding")).cast("array<double>")
                            ).alias("features"),
        ).localCheckpoint()
        import math
        for nht in (2, 6):
            lsh = BucketedRandomProjectionLSH(
                inputCol="features", outputCol="hashes", bucketLength=0.5,
                numHashTables=nht, seed=7)
            model = lsh.fit(normed)
            hashed = model.transform(normed).localCheckpoint()
            recs, ts = [], []
            for q, ex in zip(queries, exact):
                nq = math.sqrt(sum(x * x for x in q))
                key = Vectors.dense([x / nq for x in q])
                t0 = time.time()
                ids = {r["vec_id"] for r in model.approxNearestNeighbors(
                    hashed, key, KNN_K).collect()}
                ts.append(time.time() - t0)
                recs.append(recall(ids, ex))
            p50 = sorted(ts)[len(ts) // 2]
            mean_rec = sum(recs) / len(recs)
            results.append({"n": n, "path": "mllib_lsh", "param": nht,
                            "recall_at_10": round(mean_rec, 3),
                            "p50_query_s": round(p50, 3)})
            print(f"lsh   tables={nht:>2}: recall={mean_rec:.3f} "
                  f"p50={p50:.2f}s", flush=True)

    spark.stop()
    print(json.dumps({"metric": "ann_recall_curve", "mode": mode, "rows": results},
                     separators=(",", ":")), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
