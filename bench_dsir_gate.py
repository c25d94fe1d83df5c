#!/usr/bin/env python
"""DSIRGate per-trigger cost grid (r11): what does standing DSIR
selection cost per micro-batch, and how does it scale with trigger
size? Fit once on sf0.1 documents (target = lang slice, B = 10k);
replay the corpus through annotate mode and thin mode at trigger sizes
{100, 500, 2000}. Per-trigger work is one batch-sized (id,bucket)
rollup + one broadcast join against the persisted <=B-row logratio
table, so the expectation is near-flat ms/trigger until the batch
dwarfs the fixed overhead — the number that sizes trigger intervals.

Prints ONE JSON line last. min-of-2 per cell.
"""

from __future__ import annotations

import json
import time


def main() -> int:
    from pyspark.sql import functions as F

    from jsonify2ai_spark.session import get_spark, load_tables
    from jsonify2ai_spark.streaming.windowed import DSIRGate

    spark = get_spark("bench-dsir-gate")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        load_tables(spark, "/root/testdata/sf0.1", ["documents"])["documents"]
        .select("doc_id", "text", "lang")
        .localCheckpoint()
    )
    n = docs.count()
    target = docs.filter("lang = 'en'")

    t0 = time.perf_counter()
    annotate = DSIRGate(docs, target, buckets=10_000)
    fit_s = time.perf_counter() - t0
    thin = DSIRGate(docs, target, buckets=10_000, key_cutoff=0.0)

    rows = docs.collect()
    out: dict = {"fit_s": round(fit_s, 2), "n_docs": n}
    for mode, gate in (("annotate", annotate), ("thin", thin)):
        grid = {}
        for trig in (100, 500, 2000):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                nb = 0
                for lo in range(0, n, trig):
                    batch = spark.createDataFrame(rows[lo : lo + trig], docs.schema)
                    gate.filter_batch(batch).count()
                    nb += 1
                wall = time.perf_counter() - t0
                best = wall if best is None else min(best, wall)
            grid[str(trig)] = {
                "triggers": nb,
                "ms_per_trigger": round(best * 1000 / nb, 1),
                "docs_per_s": round(n / best, 1),
            }
        out[mode] = grid
    annotate.close()
    thin.close()
    print(json.dumps({"dsir_gate": out}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
