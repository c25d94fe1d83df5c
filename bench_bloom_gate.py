#!/usr/bin/env python
"""BloomDedupGate cost probe vs the exact fingerprint anti-join gate.

The design claim under test (streaming/windowed.py BloomDedupGate): with
the corpus collapsed to a broadcast bitmap, a micro-batch's novel rows are
decided MAP-SIDE (no shuffle), and only bloom-positive rows (true dups +
the predicted FP rate) touch the persisted fingerprint table. The exact
anti-join baseline probes that corpus-sized table with EVERY batch row.
Both arms return identical row sets (parity asserted per cell) — the
bloom is a cost lever only.

Batch pool = half exact copies of corpus rows (true dups), half novel
perturbations, so both the bitmap fast-path and the verification path do
real work.

Usage: python bench_bloom_gate.py [corpus_sizes...]  (default 100000 400000)
Prints one JSON line per (corpus, batch, arm) cell; record in PERF.md.
"""
from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from bench_posting_scale import replicated_docs
from jsonify2ai_spark.session import get_spark

BATCH_SIZES = [1_000, 4_000, 16_000]


class ExactJoinGate:
    """Baseline: the gate BloomDedupGate replaces — a persisted,
    fingerprint-clustered corpus table probed by every batch row."""

    def __init__(self, corpus):
        from jsonify2ai_spark.operators.dedup import _content_fingerprint

        self._fps = (
            corpus.select(_content_fingerprint(F.col("text")).alias("_fp"))
            .distinct()
            .repartition(F.col("_fp"))
            .persist()
        )
        self._fps.count()

    def filter_batch(self, batch):
        from jsonify2ai_spark.operators.dedup import _content_fingerprint

        dup = (
            batch.select(
                "doc_id", _content_fingerprint(F.col("text")).alias("_fp")
            )
            .join(self._fps, "_fp", "left_semi")
            .select("doc_id")
        )
        return batch.join(dup, "doc_id", "left_anti")

    def close(self):
        self._fps.unpersist()


def batch_pool(spark, corpus, n_rows: int):
    """Half verbatim corpus texts (dups), half perturbed (novel)."""
    half = corpus.limit(n_rows).select(
        (F.col("doc_id") + 700_000_000).alias("doc_id"),
        F.when(F.col("doc_id") % 2 == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" qnovel")))
        .alias("text"),
    )
    return half.repartition(32).localCheckpoint(eager=True)


def timed_min3(gate, batch):
    gate.filter_batch(batch).count()  # warm: plan compile + broadcast ship
    dt, kept = None, 0
    for _ in range(3):
        t0 = time.time()
        kept = gate.filter_batch(batch).count()
        d = time.time() - t0
        dt = d if dt is None else min(dt, d)
    return dt, kept


def main() -> None:
    corpus_sizes = [int(s) for s in sys.argv[1:]] or [100_000, 400_000]
    spark = get_spark("bench-bloom-gate")
    spark.sparkContext.setLogLevel("ERROR")
    from jsonify2ai_spark.streaming.windowed import BloomDedupGate

    for n_corpus in corpus_sizes:
        corpus = replicated_docs(spark, n_corpus)
        pool = batch_pool(spark, corpus, max(BATCH_SIZES))

        t0 = time.time()
        # 16 bits/doc -> fp ~0.14% at k=5; bitmap = n_corpus*2 bytes
        bloom = BloomDedupGate(corpus, m_bits=16 * n_corpus, n_hashes=5)
        bloom_build = round(time.time() - t0, 2)
        t0 = time.time()
        exact = ExactJoinGate(corpus)
        exact_build = round(time.time() - t0, 2)

        for n_batch in BATCH_SIZES:
            batch = pool.limit(n_batch).localCheckpoint(eager=True)
            rows = {}
            for arm, gate, build_s in (
                ("bloom", bloom, bloom_build),
                ("exact_join", exact, exact_build),
                # the 100 TB shape: a corpus fingerprint table too big to
                # broadcast — the anti-join becomes a shuffle join whose
                # corpus side reshuffles EVERY trigger (DataFrame hash
                # partitioning does not satisfy a join's distribution
                # requirement without bucketing); the bloom arm is
                # unaffected because its corpus state is the bitmap
                ("exact_join_nobroadcast", exact, exact_build),
            ):
                if arm == "exact_join_nobroadcast":
                    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
                    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
                    try:
                        dt, kept = timed_min3(gate, batch)
                    finally:
                        spark.conf.set(
                            "spark.sql.autoBroadcastJoinThreshold", prev
                        )
                else:
                    dt, kept = timed_min3(gate, batch)
                rows[arm] = kept
                print(
                    json.dumps(
                        {
                            "corpus": n_corpus,
                            "batch": n_batch,
                            "arm": arm,
                            "kept": kept,
                            "build_s": build_s,
                            "batch_s": round(dt, 3),
                            "rows_per_s": int(n_batch / dt),
                            **(
                                {"fp_est": round(bloom.fp_rate_estimate(), 5)}
                                if arm == "bloom"
                                else {}
                            ),
                        }
                    ),
                    flush=True,
                )
            assert (
                rows["bloom"] == rows["exact_join"] == rows["exact_join_nobroadcast"]
            ), f"parity violation at corpus={n_corpus} batch={n_batch}: {rows}"
        bloom.close()
        exact.close()


if __name__ == "__main__":
    main()
