#!/usr/bin/env python
"""SFT assembly scale probe (r12): the sft family's 100 TB claim is
that every step is conversation-bounded — per-turn Arrow encodes, a
window inside each conversation, one collect bounded by the
conversation's own turn count — so wall time is corpus-linear with no
driver- or conversation-count-proportional state. Measure it: the
documents table becomes a chat corpus (conv = doc_id % (n/8), ~8 turns
each), replicated x1/x4/x16 with distinct conv ids, through
sft_token_samples + tokens_to_ids end-to-end (collect count only).

Usage: python bench_sft_scale.py   # one JSON line last
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F


def main() -> int:
    from jsonify2ai_spark.operators.bpe import tokens_to_ids, train_bpe
    from jsonify2ai_spark.operators.sft import sft_token_samples
    from jsonify2ai_spark.operators.textstats import build_vocab
    from jsonify2ai_spark.session import get_spark, load_tables

    spark = get_spark("bench-sft-scale")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, "/root/testdata/sf0.1", ["documents"])
    base = t["documents"].select("doc_id", "text")
    n_base = base.count()
    n_convs = max(1, n_base // 8)

    def msgs_at(rep: int):
        parts = []
        for i in range(rep):
            parts.append(
                base.select(
                    (F.col("doc_id") % n_convs + i * n_convs).alias("conv_id"),
                    F.floor(F.col("doc_id") / n_convs).cast("int").alias("turn_idx"),
                    F.when(
                        F.floor(F.col("doc_id") / n_convs) % 2 == 0, "user"
                    ).otherwise("assistant").alias("role"),
                    F.col("text"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.localCheckpoint()

    merges = train_bpe(base, num_merges=50)
    results = {}
    for rep in (1, 4, 16):
        msgs = msgs_at(rep)
        n_turns = msgs.count()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            sample = sft_token_samples(msgs, merges)
            vocab = build_vocab(sample, token_array_col="bpe_tokens")
            n = tokens_to_ids(
                sample, vocab, tokens_col="bpe_tokens",
                out_col="token_ids", oov=0, id_col="conv_id",
            ).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[f"x{rep}"] = {
            "turns": n_turns,
            "convs": n,
            "wall_s": round(best, 1),
            "turns_per_s": round(n_turns / best),
        }
        print(f"x{rep}", results[f"x{rep}"], flush=True)

    print(json.dumps({"sft_scale": results}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
