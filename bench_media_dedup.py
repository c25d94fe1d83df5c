#!/usr/bin/env python
"""media_dup_clusters exact-vs-blocked cost probe (r13 verdict #7).

The design claim under test (multimodal/shards.py media_dup_clusters):
the n_bits hyperplane bucketing turns the pair join into a bucket
equi-join, shrinking the quadratic candidate term by ~2**n_bits, while
byte-identical media keep recall 1.0 (identical vectors share every
bucket). This probe measures wall-clock and pair counts for the exact
face (n_bits=0, auto strategy: broadcast GEMM at these sizes) vs the
blocked face at growing store sizes, plus blocked recall vs exact on
the NEAR-dup (non-identical) pairs.

Store = sf0.1 documents' bytes replicated with per-replica perturbation
so a controlled fraction of rows are byte-identical dups (replica 0 ==
replica 2 content for every 4th id) and the rest near-miss.

Usage: python bench_media_dedup.py [store_sizes...]  (default 5000 20000)
Prints one JSON line per (size, face) cell; record the table in PERF.md.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from jsonify2ai_spark.session import get_spark, load_tables

THRESHOLD = 0.95
N_BITS = 5


def replicated_media(spark, n_rows: int):
    docs = load_tables(spark, "/root/testdata/sf0.1", ["documents"])["documents"]
    base = docs.count()
    n_rep = max(1, (n_rows + base - 1) // base)
    reps = spark.range(n_rep).withColumnRenamed("id", "rep")
    return (
        docs.select("doc_id", "text")
        .crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") * n_rep + F.col("rep")).alias("media_id"),
            # every 4th doc: replicas collapse to identical bytes (exact
            # dups); others perturb per-replica (near-miss fodder)
            F.encode(
                F.when(F.col("doc_id") % 4 == 0, F.col("text")).otherwise(
                    F.concat(
                        F.col("text"), F.lit(" r"), F.col("rep").cast("string")
                    )
                ),
                "UTF-8",
            ).alias("content"),
        )
        .limit(n_rows)
    )


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [5_000, 20_000]
    spark = get_spark("bench-media-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    from jsonify2ai_spark.multimodal.shards import (
        media_dup_clusters,
        media_to_feature_shards,
    )

    for n in sizes:
        tmp = tempfile.mkdtemp(prefix="bench_mdup_")
        try:
            t0 = time.time()
            media_to_feature_shards(
                replicated_media(spark, n), tmp, dim=16, n_groups=8
            )
            build_s = round(time.time() - t0, 2)
            cells = {}
            for face, n_bits, strat, n_bands in (
                ("exact", 0, "auto", 1),
                ("blocked", N_BITS, "auto", 1),
                ("block_gemm", N_BITS, "block_gemm", 1),
                # band-OR multiprobe (r15): B independent plane sets;
                # the recall lever the r14 verdict asked for (#5)
                ("banded2", N_BITS, "block_gemm", 2),
                ("banded4", N_BITS, "block_gemm", 4),
            ):
                t0 = time.time()
                cc = media_dup_clusters(
                    spark, tmp, threshold=THRESHOLD, n_bits=n_bits,
                    strategy=strat, center=0.5, n_bands=n_bands,
                )
                nodes = cc.count()
                dt = round(time.time() - t0, 2)
                # assignment set for the parity check (collected OUTSIDE
                # the timed window; count above already ran the plan)
                assign = frozenset(
                    (r["node"], r["cluster_rep"]) for r in cc.collect()
                )
                cells[face] = {"nodes": nodes, "s": dt, "assign": assign}
                print(
                    json.dumps(
                        {
                            "store_rows": n,
                            "face": face,
                            "n_bits": n_bits,
                            "n_bands": n_bands,
                            "threshold": THRESHOLD,
                            "build_s": build_s,
                            "cluster_nodes": nodes,
                            "wall_s": dt,
                        }
                    ),
                    flush=True,
                )
            ex, bl, bg = cells["exact"], cells["blocked"], cells["block_gemm"]
            b2, b4 = cells["banded2"], cells["banded4"]
            ex_nodes = {a for a, _ in ex["assign"]}
            print(
                json.dumps(
                    {
                        "store_rows": n,
                        "blocked_node_recall": round(
                            bl["nodes"] / ex["nodes"], 4
                        )
                        if ex["nodes"]
                        else None,
                        "banded2_node_recall": round(b2["nodes"] / ex["nodes"], 4)
                        if ex["nodes"]
                        else None,
                        "banded4_node_recall": round(b4["nodes"] / ex["nodes"], 4)
                        if ex["nodes"]
                        else None,
                        "blocked_speedup": round(ex["s"] / bl["s"], 2)
                        if bl["s"]
                        else None,
                        "block_gemm_speedup": round(ex["s"] / bg["s"], 2)
                        if bg["s"]
                        else None,
                        "banded4_vs_blocked_cost": round(b4["s"] / bg["s"], 2)
                        if bg["s"]
                        else None,
                        # node-for-node: the full (node, cluster_rep)
                        # assignment sets must be identical, not just
                        # their cardinality (r14 self-review)
                        "gemm_matches_blocked": bg["assign"] == bl["assign"],
                        # banded candidates are a superset per band-OR,
                        # but always a subset of exact (score parity)
                        "banded_subset_of_exact": {
                            a for a, _ in b4["assign"]
                        }.issubset(ex_nodes),
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
