#!/usr/bin/env python
"""Phase-level wall-clock profile of the store-build first-run costs
(q159/q160 NearDupStore, q136 IVFIndex, q137 ShardedBM25Index): the r15
optimization round's measure-first pass. Prints one line per phase.

Usage: python scripts/profile_store_builds.py [sf_dir] [which ...]
  which in {neardup, purge, ivf, bm25} (default: all)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from jsonify2ai_spark.session import get_spark, load_tables

_t0 = None


def tic():
    global _t0
    _t0 = time.time()


def toc(label):
    print(f"  {label:<46} {time.time() - _t0:7.2f}s", flush=True)
    tic()


def profile_neardup(spark, sf_dir, purge=False):
    from jsonify2ai_spark.operators.dedup import NearDupStore, _lsh_banded

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    d = tempfile.mkdtemp(prefix="prof_nd_")
    sc = spark.sparkContext
    try:
        tic()
        store = NearDupStore.create(spark, d, num_hashes=64, bands=16, n_buckets=16)
        toc("create (empty store, 4 commits)")
        for b in range(2):
            batch = docs.filter(F.col("doc_id") % 2 == b)
            sc.setJobDescription(f"nd: lsh_banded b{b}")
            banded = _lsh_banded(batch, "text", "doc_id", 64, 16, 3).localCheckpoint()
            n = banded.count()
            toc(f"b{b}: _lsh_banded+checkpoint ({n} rows)")
            sc.setJobDescription(f"nd: add_batch b{b}")
            store = store.add_batch(batch, f"b{b}")
            toc(f"b{b}: add_batch (bands write + merge)")
        sc.setJobDescription("nd: reps")
        n = store.reps().count()
        toc(f"reps count ({n})")
        if purge:
            purged = docs.filter(F.col("doc_id") % 7 == 2).select("doc_id")
            sc.setJobDescription("nd: delete_docs")
            store = store.delete_docs(purged, "purge-1")
            toc("delete_docs")
            n = store.reps().count()
            toc(f"reps after purge ({n})")
    finally:
        sc.setJobDescription(None)
        shutil.rmtree(d, ignore_errors=True)


def profile_ivf(spark, sf_dir):
    from jsonify2ai_spark.operators.ann import IVFIndex

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    cents = (
        emb.filter(F.col("vec_id") < 16).orderBy("vec_id").select("embedding").collect()
    )
    centroids = [[float(x) for x in r[0]] for r in cents]
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 7).select("embedding").collect()[0][0]
    ]
    d = tempfile.mkdtemp(prefix="prof_ivf_")
    try:
        tic()
        idx = IVFIndex.build(
            emb.filter(F.col("vec_id") % 7 != 3), d, centroids=centroids
        )
        toc("IVFIndex.build (cells+centroids+meta)")
        idx = idx.append(emb.filter(F.col("vec_id") % 7 == 3), "incr-1")
        toc("IVFIndex.append")
        idx.topk(qvec, k=10, n_probe=4).collect()
        toc("topk")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def profile_bm25(spark, sf_dir):
    from jsonify2ai_spark.operators.textsearch import ShardedBM25Index

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    d = tempfile.mkdtemp(prefix="prof_bm25_")
    try:
        tic()
        idx = ShardedBM25Index.build(docs, d, n_buckets=16, impact_ordered=False)
        toc("ShardedBM25Index.build")
        idx.topk("data pipeline quality", k=10).collect()
        toc("topk")
        idx.close()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    which = set(a for a in args if not os.path.isdir(a)) or {
        "neardup", "purge", "ivf", "bm25"
    }
    spark = get_spark("profile_store_builds")
    spark.sparkContext.setLogLevel("ERROR")
    t_all = time.time()
    if "neardup" in which and "purge" not in which:
        print("== NearDupStore (q159 shape) ==")
        profile_neardup(spark, sf_dir, purge=False)
    if "purge" in which:
        print("== NearDupStore + purge (q160 shape) ==")
        profile_neardup(spark, sf_dir, purge=True)
    if "ivf" in which:
        print("== IVFIndex (q136 shape) ==")
        profile_ivf(spark, sf_dir)
    if "bm25" in which:
        print("== ShardedBM25Index (q137-family base build) ==")
        profile_bm25(spark, sf_dir)
    print(f"total {time.time() - t_all:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
