#!/usr/bin/env python
"""remove_duplicate_spans scale probe, banded (VERDICT r7 #7).

The r7 curve ran single-shot at default driver heap and saw a 6.1x wall
on the last 4x step (1.6M -> 6.4M docs) with memory-pressure noted. Per
the repo's banding protocol this probe re-runs the worst-case-coverage
corpus (bounded 4-doc clusters, ~95% of tokens span-covered) min-of-3
per size — run it with SPARK_GRAFT_DRIVER_MEM=48g. It also runs the r8
`max_doc_starts` capped variant once per size: on THIS corpus docs are
short (~60 tokens) so per-doc start arrays were never the pressure (the
census + base checkpoint are), but the cell documents that the cap's
short-circuit changes neither the band nor the row totals' shape.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python bench_span_scale.py [sizes...]
       (default 100000 400000 1600000 6400000)
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from jsonify2ai_spark.session import get_spark
from bench_pipeline_scale import bounded_cluster_docs


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [
        100_000, 400_000, 1_600_000, 6_400_000,
    ]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from jsonify2ai_spark.operators.dedup import remove_duplicate_spans

    print("size min3_s runs capped_s capped_docs_emptied")
    for n in sizes:
        docs = bounded_cluster_docs(spark, n)
        runs = []
        for _ in range(3):
            t0 = time.time()
            remove_duplicate_spans(docs, n=8, min_df=2).agg(
                F.sum("n_kept"), F.sum("n_tokens")
            ).first()
            runs.append(time.time() - t0)
        t0 = time.time()
        capped = remove_duplicate_spans(
            docs, n=8, min_df=2, max_doc_starts=32
        ).agg(
            F.count(F.when(F.col("n_kept") == 0, 1)).alias("z"),
        ).first()
        capped_s = time.time() - t0
        print(
            f"{n} {min(runs):.1f} {['%.1f' % r for r in runs]} "
            f"{capped_s:.1f} {capped['z']}",
            flush=True,
        )
        docs.unpersist()


if __name__ == "__main__":
    main()
