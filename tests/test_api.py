"""API facade: the reference's route surface end-to-end on a real mini corpus."""

from __future__ import annotations

import json
import os

import pytest

from jsonify2ai_spark import api


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dropzone")
    (d / "golden.md").write_text(
        "The golden document mentions sparkly shuffle joins and window functions. " * 8
    )
    (d / "other.md").write_text("Entirely unrelated prose about gardening and soil. " * 8)
    (d / "table.csv").write_text("a,b\n1,2\n3,4\n")
    return api.ingest(spark, str(d), dim=64)


def test_ingest_builds_chunk_table(corpus):
    assert corpus.count() >= 3
    assert {"id", "document_id", "kind", "path", "idx", "text", "meta", "vector"} <= set(
        corpus.columns
    )


def test_search_hits_golden_doc(corpus):
    hits = api.search(corpus, "sparkly shuffle joins", k=3, dim=64).collect()
    assert hits and hits[0]["path"].endswith("golden.md")
    assert all(len(h["text"]) <= 601 for h in hits)  # 600 + ellipsis
    assert "vector" not in hits[0].asDict()


def test_search_filters_push(corpus):
    only_csv = api.search(corpus, "anything", k=5, dim=64, kind="csv").collect()
    assert only_csv and all(h["kind"] == "csv" for h in only_csv)


def test_ask_gates_and_snippets(corpus):
    out = api.ask(corpus, "sparkly shuffle joins", dim=64)
    assert out["sources"] and out["snippets"]
    assert out["top_score"] is not None
    assert isinstance(out["would_synth"], bool)
    # full-text question matching a chunk exactly -> the identical-embedding
    # chunk scores ~1.0 and must clear the synth gate
    exact = api.ask(corpus, corpus.select("text").first()[0], dim=64)
    assert exact["would_synth"] and exact["top_score"] >= 0.99


def test_ask_and_generate_modes(corpus):
    q = corpus.select("text").first()[0]  # exact-match question -> gate passes
    # no provider -> retrieve mode with reason
    out = api.ask_and_generate(corpus, q, dim=64)
    assert out["mode"] == "retrieve" and out["synth_skipped_reason"] == "no_llm_provider"
    # provider -> synthesized answer from a grounded prompt
    seen = {}
    def fake_llm(prompt):
        seen["prompt"] = prompt
        return "Grounded answer [T1]."
    out = api.ask_and_generate(corpus, q, generate=fake_llm, dim=64)
    assert out["mode"] == "synthesize" and out["answer"].startswith("Grounded")
    assert "ONLY the numbered context" in seen["prompt"] and "[T1]" in seen["prompt"]
    # provider failure -> graceful retrieve fallback
    def broken(prompt):
        raise TimeoutError
    out = api.ask_and_generate(corpus, q, generate=broken, dim=64)
    assert out["mode"] == "retrieve" and out["synth_skipped_reason"] == "generation_failed"
    # gate: nonsense question scores low -> synthesis skipped pre-provider
    low = api.ask_and_generate(corpus, "zzz qqq xxx", generate=fake_llm, dim=64,
                               min_synth_score=0.999)
    assert low["mode"] == "retrieve"


def test_documents_delete_upsert_stats(corpus, spark, tmp_path):
    inv = api.documents(corpus).collect()
    assert len(inv) == 3
    doc_id = inv[0]["document_id"]

    smaller = api.delete_document(corpus, doc_id)
    assert smaller.filter(smaller.document_id == doc_id).count() == 0
    assert api.documents(smaller).count() == 2

    restored = api.upsert_documents(
        smaller, corpus.filter(corpus.document_id == doc_id)
    )
    assert api.documents(restored).count() == 3

    s = {r["kind"]: r["n"] for r in api.stats(corpus).collect() if r["kind"]}
    assert s.get("csv", 0) >= 1 and s.get("text", 0) >= 2

    out = str(tmp_path / "exp")
    api.export_document(corpus, doc_id, out)
    lines = []
    for name in os.listdir(out):
        if name.startswith("part-"):
            lines += [json.loads(l) for l in open(os.path.join(out, name)) if l.strip()]
    assert lines and all(l["document_id"] == doc_id for l in lines)
