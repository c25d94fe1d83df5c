#!/usr/bin/env python
"""Composed-pipeline scale probe (VERDICT r6 next #5).

The components of prepare_training_corpus / prepare_incremental_batch are
individually proven sub-linear to 6.4M docs (bench_posting_scale), but the
COMPOSED chains — 7 stages with a lazy localCheckpoint at every self-join
boundary — had no corpus-growth curve. This probe runs:

- q100 shape: prepare_training_corpus (full chain) at each corpus size,
  plus CUMULATIVE stage configs so the marginal wall-clock of each stage
  is visible (quality -> +trim -> +repetition -> +dedup/near-dup -> +PII
  -> +pack);
- q101 shape: prepare_incremental_batch with a FIXED 4k-doc batch against
  each corpus size (the claim: per-batch cost ∝ batch, corpus enters only
  through the postings build);
- checkpoint footprint: total localCheckpoint RDD bytes after the full
  chain (the materialization the ~8x-subtree-recompute fix pays for).

Corpus regime matters here: bench_posting_scale.replicated_docs grows the
near-dup CLUSTER SIZE with the corpus (every replica of a base doc
near-dups every other), so LSH pair generation — quadratic in cluster
size by construction — would dominate and measure the duplication factor,
not the chain. A real 16x-bigger corpus has a roughly CONSTANT
duplication rate, so this probe builds bounded-cluster replicas: every
group of ``CLUSTER`` consecutive replicas shares a group token injected
between EVERY word (group g's shingles all contain g<g> — zero jaccard
across groups), while the members within a group differ by one appended
token (jaccard ~0.9, true near-dups). Cluster size stays 4 at every
corpus size; scale comes from MORE clusters. The unbounded regime is the
posting-scale probe's subject, with df_cap as the production mitigation.

Usage: python bench_pipeline_scale.py [sizes...] (default 100000 400000 1600000)
Prints one JSON line per cell; record the table in PERF.md.
"""
from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from jsonify2ai_spark.session import get_spark, load_tables

CLUSTER = 4  # near-dup cluster size, CONSTANT across corpus sizes


def bounded_cluster_docs(spark, n_target: int):
    """sf0.1 documents replicated so every near-dup cluster has exactly
    ``CLUSTER`` members regardless of corpus size (see module docstring)."""
    base = load_tables(spark, "/root/testdata/sf0.1", ["documents"])["documents"]
    n_base = base.count()
    k = (n_target + n_base - 1) // n_base
    reps = spark.range(k).select(F.col("id").alias("rep"))
    # group-within-doc: only replicas of the SAME base doc share text, so
    # the marker only needs to separate rep-groups of one doc (<= k/CLUSTER
    # values — 1-2 digits, so mean word length stays inside the Gopher
    # band and no single token dominates the counts)
    group = (F.col("rep") / CLUSTER).cast("bigint")
    variant = (F.col("rep") % CLUSTER).cast("int")
    return (
        base.select("doc_id", "text").crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            F.concat(
                # suffix EVERY word with the group id: every shingle
                # carries it, cross-group jaccard ~0, clusters stay at
                # CLUSTER members; word identities stay distinct so the
                # quality/repetition stages see normal text
                F.regexp_replace(
                    F.col("text"), r"(\S+)",
                    F.concat(F.lit("$1g"), group),
                ),
                F.lit(" v"), variant,
            ).alias("text"),
        )
        .limit(n_target)
        .repartition(64)
        .localCheckpoint(eager=True)
    )


def checkpoint_bytes(spark) -> int:
    """Total stored bytes of live localCheckpoint RDD blocks."""
    sc = spark.sparkContext._jsc.sc()
    return sum(
        info.memSize() + info.diskSize() for info in sc.getRDDStorageInfo()
    )


STAGES = [
    # (label, kwargs) — cumulative: each adds one stage to the previous
    ("quality", dict(filter_repetitive=False, near_dedup=False, redact=False, pack_budget=None)),
    ("+trim", dict(length_trim=(0.02, 0.98), filter_repetitive=False, near_dedup=False, redact=False, pack_budget=None)),
    ("+repetition", dict(length_trim=(0.02, 0.98), near_dedup=False, redact=False, pack_budget=None)),
    ("+near_dedup", dict(length_trim=(0.02, 0.98), redact=False, pack_budget=None)),
    ("+pii", dict(length_trim=(0.02, 0.98), pack_budget=None)),
    ("full(+pack)", dict(length_trim=(0.02, 0.98))),
]


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 400_000, 1_600_000]
    spark = get_spark("bench-pipeline-scale")
    spark.sparkContext.setLogLevel("ERROR")
    from jsonify2ai_spark.pipelines import (
        prepare_incremental_batch,
        prepare_training_corpus,
    )

    batch = (
        bounded_cluster_docs(spark, 4_000)
        .select(
            (F.col("doc_id") + 500_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" qb")).alias("text"),
        )
        .localCheckpoint(eager=True)
    )

    for n in sizes:
        docs = bounded_cluster_docs(spark, n)
        prev = None
        for label, kw in STAGES:
            t0 = time.time()
            kept = prepare_training_corpus(docs, **kw).count()
            dt = round(time.time() - t0, 2)
            marginal = None if prev is None else round(dt - prev, 2)
            prev = dt
            print(json.dumps({
                "probe": "training", "corpus": n, "stages": label,
                "sec": dt, "marginal_sec": marginal, "kept": kept,
            }), flush=True)
        ckpt = checkpoint_bytes(spark)
        print(json.dumps({
            "probe": "ckpt_bytes", "corpus": n, "bytes": ckpt,
            "mb": round(ckpt / 1e6, 1),
        }), flush=True)

        t0 = time.time()
        kept = prepare_incremental_batch(batch, docs).count()
        dt = round(time.time() - t0, 2)
        print(json.dumps({
            "probe": "incremental", "corpus": n, "batch": 4_000,
            "sec": dt, "kept": kept,
        }), flush=True)
        # drop this size's checkpoint blocks before the next size
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
