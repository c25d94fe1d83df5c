"""BM25 hybrid text search tests: formula correctness + ranking sanity."""

from __future__ import annotations

import math

from jsonify2ai_spark.operators.textsearch import bm25_topk, build_postings


def test_postings_tf_and_dl(spark):
    df = spark.createDataFrame(
        [(1, "spark spark shuffle"), (2, "spark join")], ["doc_id", "text"]
    )
    rows = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"])
        for r in build_postings(df).collect()
    }
    assert rows[("spark", 1)] == (2, 3)
    assert rows[("spark", 2)] == (1, 2)
    assert rows[("shuffle", 1)] == (1, 3)


def test_bm25_matches_hand_computation(spark):
    df = spark.createDataFrame(
        [(1, "spark shuffle spark"), (2, "spark join"), (3, "pandas numpy")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["bm25"] for r in bm25_topk(df, "spark", k=3).collect()}
    # N=3, df(spark)=2, idf = ln(1 + (3-2+0.5)/(2+0.5)); avgdl = 7/3
    idf = math.log(1 + 1.5 / 2.5)
    k1, b = 1.2, 0.75
    avgdl = 7 / 3

    def w(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert out[1] == round(w(2, 3), 6)
    assert out[2] == round(w(1, 2), 6)
    assert 3 not in out  # no query term -> not in posting lists at all


def test_bm25_ranks_denser_match_first(spark):
    df = spark.createDataFrame(
        [
            (1, "spark merge join window functions in spark with merge"),
            (2, "spark is mentioned once here in a much longer document " + "pad " * 40),
            (3, "nothing relevant whatsoever"),
        ],
        ["doc_id", "text"],
    )
    rows = bm25_topk(df, "spark merge join window", k=3).collect()
    assert rows[0]["doc_id"] == 1
    assert [r["doc_id"] for r in rows] == [1, 2]
