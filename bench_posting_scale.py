#!/usr/bin/env python
"""Posting-family scale probe: novelty_scores / shingle_df_census /
containment_pairs(df_cap) wall-clock at replicated corpus sizes.

The claim under test is the PLANS.md scale story: these operators are
structurally linear in corpus size (posting joins + partial aggregates, no
pair materialization on hot keys). A super-linear curve here means a
hidden quadratic. Corpus = sf0.1 documents replicated with per-replica
token perturbation (coprime stride, same recipe as bench_ann_recall) so
replicas are near-dups of their base but not exact copies — the honest
regime for dedup operators.

Usage: python bench_posting_scale.py [sizes...]   (default: 100000 400000)
Prints one JSON line per (size, op).
"""
from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from jsonify2ai_spark.session import get_spark, load_tables


def replicated_docs(spark, n_target: int):
    base = load_tables(spark, "/root/testdata/sf0.1", ["documents"])["documents"]
    n_base = base.count()
    k = (n_target + n_base - 1) // n_base
    reps = spark.range(k).select(F.col("id").alias("rep"))
    # perturb: replica r of doc d gets token "r<r>d<d%17>" appended — keeps
    # replicas near-dup (high overlap) without exact-copy degeneracy
    docs = (
        base.select("doc_id", "text").crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" r"), F.col("rep"),
                F.lit("d"), (F.col("doc_id") % 17),
            ).alias("text"),
        )
        .limit(n_target)
    )
    return docs.repartition(64).localCheckpoint(eager=True)


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 400_000]
    spark = get_spark()
    from jsonify2ai_spark.operators.dedup import (
        containment_pairs,
        novelty_scores,
        shingle_df_census,
    )

    from jsonify2ai_spark.operators.dedup import line_dedup

    for n in sizes:
        docs = replicated_docs(spark, n)
        # line-structured view for line_dedup: ' row ' -> line break plus a
        # shared boilerplate line on a third of docs (same recipe as the
        # q97/q98 gate corpus) — hot lines exist at every size
        structured = docs.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit("subscribe to our newsletter\n"),
                    F.replace(F.col("text"), F.lit(" row "), F.lit(".\nrow ")),
                ),
            )
            .otherwise(F.replace(F.col("text"), F.lit(" row "), F.lit(".\nrow ")))
            .alias("text"),
        )
        ops = {
            "novelty_scores": lambda d: novelty_scores(d),
            "shingle_df_census": lambda d: shingle_df_census(d),
            "containment_capped": lambda d: containment_pairs(d, 0.9, df_cap=8),
            "line_dedup": lambda d: line_dedup(structured, max_line_df=4),
        }
        for name, fn in ops.items():
            t0 = time.time()
            rows = fn(docs).count()
            dt = round(time.time() - t0, 2)
            print(json.dumps({"op": name, "n_docs": n, "rows": rows, "sec": dt}),
                  flush=True)
        docs.unpersist()


if __name__ == "__main__":
    main()
