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


def test_bm25_index_parity_and_reuse(spark):
    """The serving index must reproduce bm25_topk's (id, score) list
    exactly — including a corpus with an empty (zero-token) doc, which
    counts toward n_docs/avgdl — and serve multiple queries off the same
    built-once postings."""
    from jsonify2ai_spark.operators.textsearch import BM25Index, bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles data between stages"),
            (2, "spark broadcasts small tables"),
            (3, "postgres vacuums dead tuples"),
            (4, "the spark optimizer reorders joins and joins again"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    idx = BM25Index(docs)
    for q in ("spark joins", "dead tuples vacuum", "nothing matches zzz", "   "):
        want = [tuple(r) for r in bm25_topk(docs, q, k=4).collect()]
        got = [tuple(r) for r in idx.topk(q, k=4).collect()]
        assert got == want, (q, got, want)
    idx.close()


def test_bm25_search_index_refuses_filters(spark):
    """A filtered pool changes df_t/avgdl; the index path must refuse
    rather than silently mis-score."""
    import pytest

    from jsonify2ai_spark.api import bm25_search
    from jsonify2ai_spark.operators.textsearch import BM25Index

    chunks = spark.createDataFrame(
        [("c1", "d1", "p", "text", 0, "spark rocks", [0.1, 0.2])],
        "id string, document_id string, path string, kind string, idx int, "
        "text string, vector array<double>",
    )
    idx = BM25Index(chunks, id_col="id")
    with pytest.raises(ValueError, match="filters require per-query"):
        bm25_search(chunks, "spark", index=idx, kind="text")
    idx.close()


def test_bm25_index_query_plan_touches_cache_not_corpus(spark):
    """Serving-plan shape: a query against the index must read the
    PERSISTED postings (InMemoryTableScan) — never re-tokenize the corpus
    (no MapInPandas/regexp split of the text column in the plan) — and
    take its top-k via per-partition heaps (TakeOrderedAndProject), not a
    global sort."""
    from jsonify2ai_spark.operators.textsearch import BM25Index

    docs = spark.createDataFrame(
        [(i, f"term{i % 7} common words here") for i in range(200)],
        "doc_id long, text string",
    )
    idx = BM25Index(docs)
    q = idx.topk("term3 common", k=5)
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    assert "TakeOrderedAndProject" in plan
    # the EXECUTED portion (above the cached relation's stored build
    # lineage, which legitimately mentions the tokenize) must not
    # re-tokenize the corpus per query
    executed = plan.split("InMemoryRelation")[0]
    assert "split(" not in executed
    # the term filter is pushed INTO the cache scan, so only the query
    # terms' posting lists are read
    assert "InMemoryTableScan [term" in plan and " IN (" in plan
    idx.close()
