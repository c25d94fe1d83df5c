#!/usr/bin/env python
"""Scale probe for the r9 token-id shard chain (corpus -> BPE ids ->
packed shards): train merges ONCE on the sf0.1 corpus (the serving
split — training is corpus-schedule work, encoding is per-document),
then measure tokenize_to_ids + write_token_shards wall at 5k and 80k
documents (sf0.1 replicated x16 with distinct ids, the repo's
replication-probe idiom). The chain is two Arrow projections + one
group-keyed pack shuffle + one partitioned write, so wall should grow
~linearly in the corpus — the number this probe pins for PERF.md.

Usage: python bench_token_shards.py [out_dir]   # prints one JSON line
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from pyspark.sql import functions as F


def main() -> int:
    from jsonify2ai_spark.operators.bpe import bpe_encode_fast, train_bpe
    from jsonify2ai_spark.operators.textstats import build_vocab
    from jsonify2ai_spark.session import get_spark, load_tables
    from jsonify2ai_spark.sinks import write_token_shards

    spark = get_spark("bench-token-shards")
    spark.sparkContext.setLogLevel("ERROR")
    base_out = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()

    docs = load_tables(spark, "/root/testdata/sf0.1", ["documents"])[
        "documents"
    ].select("doc_id", "text")

    t0 = time.perf_counter()
    merges = train_bpe(docs, num_merges=100, merge_batch=8, exact=False)
    t_train = time.perf_counter() - t0
    enc = bpe_encode_fast(docs, merges, out_col="_toks")
    t0 = time.perf_counter()
    vocab = build_vocab(enc, token_array_col="_toks").localCheckpoint()
    n_vocab = vocab.count()
    t_vocab = time.perf_counter() - t0

    def corpus_at(rep: int):
        if rep == 1:
            return docs.localCheckpoint()
        parts = [
            docs.select(
                (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"), "text"
            )
            for i in range(rep)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.localCheckpoint()

    results = {"merges": len(merges), "vocab": n_vocab,
               "train_s": round(t_train, 1), "vocab_s": round(t_vocab, 1)}
    for label, rep in (("5k", 1), ("80k", 16)):
        corpus = corpus_at(rep)
        n = corpus.count()
        t0 = time.perf_counter()
        m = write_token_shards(
            corpus, merges, vocab, f"{base_out}/shards_{label}",
            budget=2048, n_groups=32,
        )
        wall = time.perf_counter() - t0
        results[label] = {"docs": n, "rows": m["rows"], "groups": m["groups"],
                          "wall_s": round(wall, 1)}
        print(label, results[label], flush=True)

    print(json.dumps({"token_shards": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
