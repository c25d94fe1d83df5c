#!/usr/bin/env python
"""Deterministic generator for eval/qa.jsonl (run from the repo root).

Mirrors the reference's ask_eval QA-corpus shape ({question,
answer_contains}, scripts/dev/tools/ask_eval.py:41-131) over the sf0.001
synthetic documents, sized n=24 with three deliberate strata:

- 12 exact-text questions (question == document text): retrieval precision —
  the dev-mode hash embedding self-hits, so the vector arm should get these.
- 8 reordered-text questions (same words, reversed order): the bag-of-words
  BM25 arm still matches (identical term frequencies) while the
  order-sensitive dev-hash vector misses — the stratum that shows the
  hybrid-RRF uplift over pure-vector.
- 4 absent-topic questions: honest misses for every arm (the needle does not
  exist in the corpus).

Docs are picked by sorted doc_id at a fixed stride, so the file is stable
across runs and machines.
"""

from __future__ import annotations

import json
import os

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_QA_SF_DIR", "/root/testdata/sf0.001")
OUT = "eval/qa.jsonl"


def main() -> int:
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        "WHERE length(trim(text)) > 60 ORDER BY doc_id"
    ).fetchall()
    # scale the pick count to the corpus: a filtered/smaller table yields a
    # smaller QA file instead of an IndexError past the end of rows
    n_pick = min(20, len(rows))
    if n_pick == 0:
        raise SystemExit(f"no usable documents in {SF_DIR}")
    stride = max(1, len(rows) // n_pick)
    picked = [rows[min(i * stride, len(rows) - 1)] for i in range(n_pick)]
    n_exact = max(1, n_pick * 12 // 20)

    qa = []
    for doc_id, text in picked[:n_exact]:
        qa.append(
            {
                "question": text,
                "answer_contains": text[:40],
                "doc_hint": f"doc_id {doc_id}",
                "stratum": "exact",
            }
        )
    for doc_id, text in picked[n_exact:n_pick]:
        qa.append(
            {
                "question": " ".join(reversed(text.split())),
                "answer_contains": text[:40],
                "doc_hint": f"doc_id {doc_id}",
                "stratum": "reordered",
            }
        )
    for i in range(4):
        qa.append(
            {
                "question": f"completely absent topic number {i} quux syzygy",
                "answer_contains": f"zz-not-in-corpus-{i}",
                "doc_hint": "none",
                "stratum": "absent",
            }
        )

    with open(OUT, "w", encoding="utf-8") as f:
        for item in qa:
            f.write(json.dumps(item, ensure_ascii=False) + "\n")
    print(f"wrote {len(qa)} questions to {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
