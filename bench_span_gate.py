#!/usr/bin/env python
"""SpanDedupGate hot-set guard probe (VERDICT r7 #5).

The gate's hot window-hash set is duplicated-content-sized; on a
worst-case corpus (every doc a member of a 4-doc duplicate cluster —
~95% of tokens span-covered, the q106 regime) it approaches
corpus-window-sized. This probe builds that corpus at increasing sizes
and pushes a FIXED 2k-doc batch through BOTH probe forms:

- broadcast (the default while hot_count <= broadcast_hot_max), and
- the guarded plain shuffle semi-join (forced via broadcast_hot_max=0),

recording hot-set size, per-batch wall for each form, and row parity.
The claim under test: the shuffle fallback stays batch-proportional and
correct where an unconditional broadcast would grow without bound (the
r7 finding: `F.broadcast(self._hot)` on a pathological corpus exceeds
executor memory — the guard makes the gate safe by construction).

Usage: python bench_span_gate.py [sizes...]   (default 100000 400000)
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from jsonify2ai_spark.session import get_spark, load_tables
from bench_pipeline_scale import bounded_cluster_docs


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 400_000]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from jsonify2ai_spark.streaming.windowed import SpanDedupGate

    batch = (
        load_tables(spark, "/root/testdata/sf0.1", ["documents"])["documents"]
        .select("doc_id", "text")
        .limit(2_000)
        .localCheckpoint(eager=True)
    )
    print("size hot_count build_s bcast_batch_s shuffle_batch_s parity")
    for n in sizes:
        docs = bounded_cluster_docs(spark, n)
        t0 = time.time()
        g_b = SpanDedupGate(docs, n=8, min_df=2)
        build_s = time.time() - t0
        g_s = SpanDedupGate(docs, n=8, min_df=2, broadcast_hot_max=0)
        walls = {}
        outs = {}
        for name, g in (("bcast", g_b), ("shuffle", g_s)):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                res = g.filter_batch(batch).agg(
                    F.count(F.lit(1)), F.sum("n_kept"), F.sum("n_tokens")
                ).first()
                best = min(best, time.time() - t0)
            walls[name] = best
            outs[name] = tuple(res)
        parity = outs["bcast"] == outs["shuffle"]
        print(
            f"{n} {g_b._hot_count} {build_s:.1f} "
            f"{walls['bcast']:.2f} {walls['shuffle']:.2f} {parity}",
            flush=True,
        )
        g_b.close()
        g_s.close()
        docs.unpersist()


if __name__ == "__main__":
    main()
