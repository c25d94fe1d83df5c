#!/usr/bin/env python
"""Sharded-BM25 serving scale probe (r11 verdict #7): the crossover
bench's own conclusion was that the hybrid arm's wall at scale is the
LEXICAL floor — BM25Index's per-query cost scans its memory-persisted
postings, corpus-linear, and the cache itself must hold the corpus.
ShardedBM25Index partitions the postings by md5(term) % n_buckets and
prunes each query's scan to its terms' buckets, so per-query IO is
~|terms|/n_buckets of the postings; sizing n_buckets WITH the corpus
(exactly how the IVF arm scales its cell count) keeps the touched bytes
per query roughly flat.

For each corpus size the 24-question eval set runs through topk_batch
on BOTH indexes (same scoring arithmetic, parity test-pinned) — warm
pass, then min-of-3 wall, amortized per query. n_buckets scales
16/64/256 as the corpus replicates x1/x16/x64 (5k -> 80k -> 320k
chunks), holding per-bucket postings roughly constant — the
cell-parallel design point being measured.

Usage: python bench_bm25_sharded.py   # one JSON line last
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time

from pyspark.sql import functions as F


def main() -> int:
    from jsonify2ai_spark.operators.evalharness import eval_corpus_from_documents
    from jsonify2ai_spark.operators.textsearch import BM25Index, ShardedBM25Index
    from jsonify2ai_spark.session import get_spark

    spark = get_spark("bench-bm25-sharded")
    spark.sparkContext.setLogLevel("ERROR")

    with open("eval/qa.jsonl", encoding="utf-8") as f:
        rows = [json.loads(line) for line in f if line.strip()]
    questions = list(
        dict.fromkeys(r.get("q") or r.get("question", "") for r in rows)
    )

    def corpus_at(sf_dir: str, replicate: int = 1):
        base = eval_corpus_from_documents(spark, sf_dir)
        # the synthetic vocabulary has NO df skew (min df on the x1
        # corpus is already large) — real corpora do; inject one entity
        # token per base document so the discriminative-query regime
        # (rare term + common words, df = replicate after replication)
        # exists to measure
        base = base.withColumn(
            "text",
            F.concat_ws(
                " ",
                "text",
                F.concat(
                    F.lit("entity"), F.regexp_replace("id", "[^0-9]", "")
                ),
            ),
        )
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

    sizes = [
        ("sf0.1", "/root/testdata/sf0.1", 1, 16),
        ("sf0.1x16", "/root/testdata/sf0.1", 16, 64),
        ("sf0.1x64", "/root/testdata/sf0.1", 64, 256),
    ]
    results = {}
    for label, sf_dir, rep, n_buckets in sizes:
        corpus = corpus_at(sf_dir, rep)
        n = corpus.count()

        def timed(idx):
            idx.topk_batch(questions[:2], k=5).collect()  # warm
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                idx.topk_batch(questions, k=5).collect()
                dt = (time.perf_counter() - t0) * 1000.0
                best = dt if best is None else min(best, dt)
            return best

        t0 = time.perf_counter()
        mem = BM25Index(corpus, id_col="id")
        mem_build_s = time.perf_counter() - t0
        mem_ms = timed(mem)
        mem.close()

        tmp = tempfile.mkdtemp(prefix="bm25shard_bench_")
        t0 = time.perf_counter()
        sharded = ShardedBM25Index.build(
            corpus, tmp, n_buckets=n_buckets, id_col="id"
        )
        shard_build_s = time.perf_counter() - t0
        shard_ms = timed(sharded)
        sharded.close()
        shutil.rmtree(tmp, ignore_errors=True)

        results[label] = {
            "chunks": n,
            "n_buckets": n_buckets,
            "mem_per_q_ms": round(mem_ms / len(questions), 1),
            "sharded_per_q_ms": round(shard_ms / len(questions), 1),
            "mem_build_s": round(mem_build_s, 1),
            "sharded_build_s": round(shard_build_s, 1),
        }

        if label == "sf0.1x64":
            # static impact pruning at the biggest size: the df-linear
            # residue capped at 2000 postings/term — per-query cost and
            # the quality bill (recall@10 vs the exact index)
            tmp2 = tempfile.mkdtemp(prefix="bm25prune_bench_")
            t0 = time.perf_counter()
            pruned = ShardedBM25Index.build(
                corpus, tmp2, n_buckets=n_buckets, id_col="id",
                max_postings_per_term=2000,
            )
            pruned_build_s = time.perf_counter() - t0
            pruned_ms = timed(pruned)
            # recall@10 vs exact, per query
            tmp3 = tempfile.mkdtemp(prefix="bm25full_")
            sharded_full = ShardedBM25Index.build(
                corpus, tmp3, n_buckets=n_buckets, id_col="id",
            )
            def recall_at_10(qlist):
                exact_ids = {}
                for r in sharded_full.topk_batch(qlist, k=10).collect():
                    exact_ids.setdefault(r["query_id"], set()).add(r["id"])
                pruned_ids = {}
                for r in pruned.topk_batch(qlist, k=10).collect():
                    pruned_ids.setdefault(r["query_id"], set()).add(r["id"])
                rs = [
                    len(pruned_ids.get(qi, set()) & ids) / max(1, len(ids))
                    for qi, ids in exact_ids.items()
                ]
                return round(sum(rs) / max(1, len(rs)), 3)

            # two query regimes: the eval questions are bags of COMMON
            # terms (pruning's worst case — ranking is a sum of tail
            # contributions the cap discards), vs discriminative queries
            # (one rare term + common words — the entity-lookup shape
            # impact pruning is designed for)
            rare_terms = [
                r["term"]
                for r in sharded_full._posts.select("term", "df_t")
                .distinct()
                .filter(F.col("term").startswith("entity"))
                .orderBy("term")
                .limit(24)
                .collect()
            ]
            assert rare_terms, "entity injection missing from corpus_at"
            disc = [f"{t} spark data window" for t in rare_terms]
            results["sf0.1x64_pruned2000"] = {
                "chunks": n,
                "n_buckets": n_buckets,
                "sharded_per_q_ms": round(pruned_ms / len(questions), 1),
                "sharded_build_s": round(pruned_build_s, 1),
                "recall_at_10_common": recall_at_10(questions),
                "recall_at_10_discriminative": recall_at_10(disc),
            }
            # RoutedBM25 batched routing (r12 verdict #2): the probe for
            # the full 24-question batch is ONE action with constant job
            # count — measure its wall and job count at the biggest size
            from jsonify2ai_spark.operators.textsearch import RoutedBM25

            routed = RoutedBM25(sharded_full, pruned, df_max=rep * 2)
            routed._route_batch(questions[:2])  # warm
            sc = spark.sparkContext
            sc.setJobGroup("route24", "batched routing probe")
            t0 = time.perf_counter()
            routed._route_batch(questions + disc)
            route_ms = (time.perf_counter() - t0) * 1000.0
            route_jobs = len(
                sc.statusTracker().getJobIdsForGroup("route24")
            )
            sc.setJobGroup(None, None)
            results["routing_48q"] = {
                "probe_ms": round(route_ms, 1),
                "probe_jobs": route_jobs,
            }
            print("routing_48q", results["routing_48q"], flush=True)

            # impact-ordered dynamic pruning (r12 verdict #5): per-query
            # read bounded by |terms| * depth regardless of df — measure
            # cost + recall@10 per regime per depth against the exact
            # index (sharded_full is impact_ordered by default)
            def recall_vs_exact(qlist, depth):
                exact_ids = {}
                for r in sharded_full.topk_batch(qlist, k=10).collect():
                    exact_ids.setdefault(r["query_id"], set()).add(r["id"])
                got = {}
                for r in sharded_full.topk_batch_impact(
                    qlist, k=10, depth=depth
                ).collect():
                    got.setdefault(r["query_id"], set()).add(r["id"])
                rs = [
                    len(got.get(qi, set()) & ids) / max(1, len(ids))
                    for qi, ids in exact_ids.items()
                ]
                return round(sum(rs) / max(1, len(rs)), 3)

            for depth in (1000, 4000, 16000):
                sharded_full.topk_batch_impact(
                    questions[:2], k=10, depth=depth
                ).collect()  # warm
                best = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    sharded_full.topk_batch_impact(
                        questions, k=10, depth=depth
                    ).collect()
                    dt = (time.perf_counter() - t0) * 1000.0
                    best = dt if best is None else min(best, dt)
                results[f"impact_d{depth}"] = {
                    "per_q_ms": round(best / len(questions), 1),
                    "recall_at_10_common": recall_vs_exact(questions, depth),
                    "recall_at_10_discriminative": recall_vs_exact(disc, depth),
                }
                print(f"impact_d{depth}", results[f"impact_d{depth}"], flush=True)

            pruned.close()
            sharded_full.close()
            shutil.rmtree(tmp2, ignore_errors=True)
            shutil.rmtree(tmp3, ignore_errors=True)
            print("sf0.1x64_pruned2000", results["sf0.1x64_pruned2000"], flush=True)

        print(label, results[label], flush=True)

    print(json.dumps({"bm25_sharded": results, "n_queries": len(questions)}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
