"""Live-embedding UDF (iterator batching, retries, dim gate) and bucketed
chunk-table layout (per-document rewrite locality)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from jsonify2ai_spark.functions.embed_live import embed_column
from jsonify2ai_spark.functions.vectors import dev_embedding
from jsonify2ai_spark.operators.upsert import bucket_expr, replace_documents, write_chunks


def test_live_udf_dev_mode_matches_sql_dev_embedding(spark, tables):
    """The UDF's dev fallback must be bit-identical to the pure-SQL
    dev_embedding (same oracle mode, two execution paths)."""
    docs = tables["documents"].limit(30)
    both = docs.select(
        "doc_id",
        embed_column("text", dim=32).alias("udf_vec"),
        dev_embedding(F.col("text"), dim=32).cast("array<double>").alias("sql_vec"),
    ).collect()
    for r in both:
        assert r["udf_vec"] == r["sql_vec"]


def test_live_udf_dim_gate_and_retries(spark):
    calls = {"n": 0}

    def flaky_wrong_dim(texts):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConnectionError("transient")
        # second row comes back wrong-dim -> must become NULL
        return [[0.1, 0.2] if i != 1 else [0.1] for i in range(len(texts))]

    df = spark.createDataFrame([("a",), ("b",), ("c",)], ["text"]).coalesce(1)
    rows = df.select(
        embed_column("text", dim=2, post_fn=flaky_wrong_dim).alias("v")
    ).collect()
    vals = [r["v"] for r in rows]
    # results exist at all only because the transient first call was retried
    # (calls["n"] mutates in the pickled worker copy — not assertable here)
    assert vals[0] == [0.1, 0.2] and vals[2] == [0.1, 0.2]
    assert vals[1] is None  # dim-gated


def test_bucketed_write_localizes_document_rewrites(spark, tmp_path, tables):
    """J5 at scale: a replace touches ONLY the buckets containing the
    affected documents (dynamic partition overwrite), not the whole table."""
    docs = tables["documents"].limit(64).select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("document_id"),
        F.lit(0).alias("idx"),
        F.col("text"),
    )
    path = str(tmp_path / "chunks")
    n_buckets = 8
    write_chunks(docs, path, n_buckets=n_buckets)

    buckets_on_disk = {d for d in os.listdir(path) if d.startswith("bucket=")}
    assert 1 < len(buckets_on_disk) <= n_buckets

    # the incoming batch lives in exactly the buckets its documents hash to
    incoming = docs.limit(3).withColumn("text", F.lit("v2"))
    target = {
        f"bucket={r['b']}"
        for r in incoming.select(bucket_expr("document_id", n_buckets).alias("b")).collect()
    }
    with_dynamic = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        before = {
            b: sorted(os.listdir(os.path.join(path, b))) for b in buckets_on_disk
        }
        merged = replace_documents(
            spark.read.parquet(path).drop("bucket"), incoming,
            dedup_keys=("document_id", "idx"),
        )
        # rewrite only the touched buckets' rows
        touched = merged.withColumn("b", bucket_expr("document_id", n_buckets)).filter(
            F.concat(F.lit("bucket="), F.col("b")).isin(list(target))
        )
        write_chunks(touched, path, n_buckets=n_buckets, mode="overwrite")
        after = {b: sorted(os.listdir(os.path.join(path, b))) for b in buckets_on_disk}
        unt = [b for b in buckets_on_disk if b not in target]
        assert unt and all(before[b] == after[b] for b in unt), "untouched buckets rewritten"
        # table state is the merged state
        final = spark.read.parquet(path)
        assert final.filter(F.col("text") == "v2").count() == 3
        assert final.count() == 64
    finally:
        if with_dynamic is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", with_dynamic)


def test_parse_embed_response_shapes():
    from jsonify2ai_spark.functions.embed_live import parse_embed_response

    modern = {"embeddings": [[1.0, 2.0], [3.0, 4.0]]}
    older_single = {"embedding": [1.0, 2.0]}
    older_batch = {"embeddings": [{"embedding": [1.0]}, {"embedding": [2.0]}]}
    assert parse_embed_response(modern) == [[1.0, 2.0], [3.0, 4.0]]
    assert parse_embed_response(older_single) == [[1.0, 2.0]]
    assert parse_embed_response(older_batch) == [[1.0], [2.0]]
    with pytest.raises(ValueError):
        parse_embed_response({"nope": 1})


def test_ollama_post_fn_request_contract(monkeypatch):
    """The transport must POST {model, input} to /api/embed and validate the
    response count — checked against a faked urlopen."""
    import io
    import json as _json
    import urllib.request

    from jsonify2ai_spark.functions.embed_live import ollama_post_fn

    seen = {}

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        seen["url"] = req.full_url
        seen["body"] = _json.loads(req.data.decode("utf-8"))
        seen["timeout"] = timeout
        n = len(seen["body"]["input"])
        return FakeResp(_json.dumps({"embeddings": [[0.1, 0.2]] * n}).encode())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    post = ollama_post_fn(base_url="http://m:11434/", model="m1", timeout=9.0)
    out = post(["a", "b"])
    assert out == [[0.1, 0.2], [0.1, 0.2]]
    assert seen["url"] == "http://m:11434/api/embed"
    assert seen["body"] == {"model": "m1", "input": ["a", "b"]}
    assert seen["timeout"] == 9.0

    # count mismatch must raise (the udf's retry loop depends on it)
    def bad_urlopen(req, timeout=None):
        return FakeResp(_json.dumps({"embeddings": [[0.1]]}).encode())

    monkeypatch.setattr(urllib.request, "urlopen", bad_urlopen)
    with pytest.raises(ValueError):
        ollama_post_fn()(["a", "b"])

    # ADVICE fix: a malformed MID-batch entry (None/[] after tolerant parse)
    # must raise here, not propagate into the UDF as a silent None
    def midbad_urlopen(req, timeout=None):
        return FakeResp(
            _json.dumps(
                {"embeddings": [{"embedding": [0.1]}, {"nope": 1}, {"embedding": [0.2]}]}
            ).encode()
        )

    monkeypatch.setattr(urllib.request, "urlopen", midbad_urlopen)
    with pytest.raises(ValueError, match="positions \\[1\\]"):
        ollama_post_fn()(["a", "b", "c"])


def test_ollama_generate_fn_contract(monkeypatch):
    """Generate transport: POSTs {model, prompt, stream:false, options} to
    /api/generate, strips the response; ANY failure -> '' (never raises) so
    ask_and_generate's retrieve-only fallback engages."""
    import io
    import json as _json
    import urllib.request

    from jsonify2ai_spark.functions.llm import DEFAULT_OPTIONS, ollama_generate_fn

    seen = {}

    class FakeResp(io.BytesIO):
        status = 200

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        seen["url"] = req.full_url
        seen["body"] = _json.loads(req.data.decode("utf-8"))
        return FakeResp(_json.dumps({"response": "  an answer \n"}).encode())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    gen = ollama_generate_fn(host="http://m:11434/", model="m1")
    assert gen("why?") == "an answer"
    assert seen["url"] == "http://m:11434/api/generate"
    assert seen["body"] == {
        "model": "m1",
        "prompt": "why?",
        "stream": False,
        "options": DEFAULT_OPTIONS,
    }

    # non-2xx -> "" (reference returns '' instead of raising)
    class Resp500(FakeResp):
        status = 500

    monkeypatch.setattr(
        urllib.request, "urlopen", lambda req, timeout=None: Resp500(b"{}")
    )
    assert ollama_generate_fn()("p") == ""

    # network error -> ""
    def boom(req, timeout=None):
        raise OSError("refused")

    monkeypatch.setattr(urllib.request, "urlopen", boom)
    assert ollama_generate_fn()("p") == ""
