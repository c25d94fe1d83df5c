#!/usr/bin/env python
"""Cluster-maintenance economics for ClusterStore.merge_delta (r15): the
claim to verify is that merging a delta's near-dup edges into the
persisted clustering costs O(delta) — bucket-pruned membership probe +
delta-sized contraction/CC/overlay — while the alternative the suite
used until now (q51/q62/q154's pattern) recomputes connected components
over the WHOLE corpus-sized edge set per append.

Synthetic graph, scaled: a base edge set of N_BASE edges over ~N_BASE
nodes (mixed chain/star components), and a 1% delta that bridges
components, adds new nodes, and makes some new nodes the merged rep
(forcing overlay writes — the expensive shape).

  build_base        full CC + store write over the base edges (sunk)
  recompute_full    CC over base+delta — the naive maintenance
  merge_delta       ClusterStore.merge_delta of the same delta
  probe_reps        bucket-pruned reps_of for the delta's endpoints
  parity            incremental reps == full recompute (hard assert)
  purge             delete a 0.025% victim set THROUGH the store: the
                    delete_docs repair math (touched membership ->
                    surviving edges -> component-local CC ->
                    delete_nodes), vs recompute_excl = full CC over
                    every edge not incident to a victim (the naive
                    purge); parity hard-asserted

Usage: python bench_cluster_store.py    # one JSON line last
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time

from pyspark.sql import functions as F


def main() -> int:
    import sys

    from jsonify2ai_spark.operators.dedup import ClusterStore, connected_components
    from jsonify2ai_spark.session import get_spark

    spark = get_spark("bench-cluster-store")
    spark.sparkContext.setLogLevel("ERROR")

    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
    # base: pair up consecutive ids into 4-node chains (id -> id+1 unless
    # id % 4 == 3) — many small components, the post-LSH shape
    ids = spark.range(n_base).select(F.col("id").alias("a"))
    base_edges = (
        ids.filter(F.col("a") % 4 != 3)
        .select("a", (F.col("a") + 1).alias("b"))
        .localCheckpoint()
    )
    # delta (~1%): new nodes n_base+i each attaching to a random existing
    # chain, plus bridges between adjacent chains every 400 ids — and the
    # new node id is LARGER, while bridge minima drop, so both overlay
    # and segment paths exercise
    n_delta = n_base // 100
    newbies = (
        spark.range(n_delta)
        .select(
            (F.col("id") + n_base).alias("a"),
            (F.pmod(F.col("id") * 37, F.lit(n_base))).alias("b"),
        )
    )
    bridges = (
        spark.range(n_base // 400)
        .select(
            (F.col("id") * 400).alias("a"),
            (F.col("id") * 400 + 4).alias("b"),
        )
    )
    delta_edges = newbies.unionByName(bridges).localCheckpoint()
    out = {
        "base_edges": base_edges.count(),
        "delta_edges": delta_edges.count(),
    }

    d = tempfile.mkdtemp()
    try:
        t0 = time.time()
        store = ClusterStore.build(base_edges, d, n_buckets=64)
        out["build_base_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        full = connected_components(
            base_edges.unionByName(delta_edges), driver_threshold=0
        )
        n_full = full.count()
        out["recompute_full_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        store = store.merge_delta(delta_edges, "d1")
        out["merge_delta_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        probe = store.reps_of(
            delta_edges.select(F.col("a").alias("node")).distinct()
        )
        probe.count()
        out["probe_reps_s"] = round(time.time() - t0, 2)

        got = {(r["node"], r["cluster_rep"]) for r in store.reps().collect()}
        want = {(r["node"], r["cluster_rep"]) for r in full.collect()}
        assert got == want and len(got) == n_full, (
            f"parity broke: {len(got)} vs {n_full}"
        )
        out["nodes"] = n_full
        out["merge_vs_recompute"] = round(
            out["merge_delta_s"] / out["recompute_full_s"], 3
        )

        # -- purge economics (r15 delete face) ---------------------------
        all_edges = base_edges.unionByName(delta_edges).localCheckpoint(
            eager=False
        )
        victims = (
            spark.range(max(1, n_base // 4000))
            .select((F.col("id") * 4000 + 1).alias("node"))
            .localCheckpoint()
        )
        out["victims"] = victims.count()

        # naive purge: full CC over every edge not incident to a victim
        t0 = time.time()
        va = victims.select(F.col("node").alias("a"))
        vb = victims.select(F.col("node").alias("b"))
        live_edges = (
            all_edges.join(F.broadcast(va), "a", "left_anti")
            .join(F.broadcast(vb), "b", "left_anti")
        )
        excl = connected_components(live_edges, driver_threshold=0)
        n_excl = excl.count()
        out["recompute_excl_s"] = round(time.time() - t0, 2)

        # store purge: the NearDupStore.delete_docs repair math with the
        # edge table standing in for the band table
        t0 = time.time()
        touched = (
            store.reps_of(victims)
            .select(F.col("cluster_rep").alias("_tr"))
            .distinct()
            .localCheckpoint()
        )
        reps_all = store.reps()
        members = (
            reps_all.join(
                F.broadcast(touched),
                reps_all["cluster_rep"] == F.col("_tr"),
                "left_semi",
            )
            .select("node")
            .localCheckpoint()
        )
        survivors = members.join(
            F.broadcast(victims), "node", "left_anti"
        ).localCheckpoint()
        surv_edges = (
            all_edges.join(
                F.broadcast(survivors.select(F.col("node").alias("a"))),
                "a", "left_semi",
            ).join(
                F.broadcast(survivors.select(F.col("node").alias("b"))),
                "b", "left_semi",
            )
        )
        repaired = connected_components(
            surv_edges, driver_threshold=0
        ).localCheckpoint()
        edgeless = survivors.join(
            repaired.select("node"), "node", "left_anti"
        )
        store = store.delete_nodes(
            victims.union(edgeless).distinct(), repaired, "p1"
        )
        out["purge_s"] = round(time.time() - t0, 2)

        got = {(r["node"], r["cluster_rep"]) for r in store.reps().collect()}
        want = {(r["node"], r["cluster_rep"]) for r in excl.collect()}
        assert got == want and len(got) == n_excl, (
            f"purge parity broke: {len(got)} vs {n_excl}"
        )
        out["purge_vs_recompute"] = round(
            out["purge_s"] / out["recompute_excl_s"], 3
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
