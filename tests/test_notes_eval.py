"""note2json parser (S15/S16) and eval harness (A8) tests."""

from __future__ import annotations

import pytest

from jsonify2ai_spark.operators.evalharness import batch_retrieve, eval_metrics
from jsonify2ai_spark.sources.notes import normalize_note_json, parse_note_text, parse_notes

NOTE = """# Morning thoughts

**Date:** 2026-03-01
**Tags:** #spark #notes
**Tone:** reflective

**Summary:**
A short summary line.
Continued on a second line.

**Core Reflections:**
- first reflection
- second reflection

Some free text at the end.
"""


def test_parse_note_text_fields():
    out = parse_note_text(NOTE)
    assert out["title"] == "Morning thoughts"
    assert out["date"] == "2026-03-01"
    assert out["tags"] == ["spark", "notes"]
    assert out["tone"] == "reflective"
    assert out["summary"] == "A short summary line. Continued on a second line."
    assert out["reflections"] == ["first reflection", "second reflection"]
    assert out["headers"] == ["Morning thoughts"]
    assert "Some free text at the end." in out["plain_text"]


def test_parse_note_date_formats_and_fixups():
    assert parse_note_text("**Date:** 01/03/2026\nx")["date"] == "2026-03-01"
    assert parse_note_text("**Date:** March 1, 2026\nx")["date"] == "2026-03-01"
    # no title -> first non-empty line; none -> hint; none -> 'untitled'
    assert parse_note_text("just a line")["title"] == "just a line"
    assert parse_note_text("", "note.md")["title"] == "note.md"
    assert parse_note_text("")["title"] == "untitled"
    # sanitization: NULs stripped, 10k truncate
    out = parse_note_text("\x00a" + "b" * 20_000)
    assert "\x00" not in out["raw_text"] and len(out["raw_text"]) == 10_000


def test_normalize_note_json_shapes():
    passthrough = normalize_note_json({"title": "T", "tags": ["#a", True]})
    assert passthrough["title"] == "T"
    assert passthrough["tags"] == ["a", "true"]
    assert normalize_note_json("plain words", filename_hint="f.md")["plain_text"] == "plain words"
    assert normalize_note_json(["a", "b"])["plain_text"] == "a\nb"


def test_parse_notes_dataframe(spark):
    df = spark.createDataFrame([(1, NOTE), (2, "# Other\nbody")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in parse_notes(df).collect()}
    assert rows[1]["title"] == "Morning thoughts" and rows[1]["tags"] == ["spark", "notes"]
    assert rows[2]["title"] == "Other" and rows[2]["summary"] is None


def test_eval_harness_hits_and_ranks(spark):
    corpus = spark.createDataFrame(
        [(i, f"document number {i} about topic {i % 3}") for i in range(30)],
        ["doc_id", "text"],
    )
    # question text == a corpus doc's text -> identical dev embedding -> rank 1
    questions = spark.createDataFrame(
        [(1, "document number 7 about topic 1"), (2, "completely absent phrase")],
        ["q_id", "question"],
    )
    expected = spark.createDataFrame(
        [(1, "number 7"), (2, "no such substring anywhere")],
        ["q_id", "answer_contains"],
    )
    hits = batch_retrieve(questions, corpus, k=5)
    per_q = {r["q_id"]: r for r in eval_metrics(hits, expected).collect()}
    assert per_q[1]["hit_at_1"] == 1 and per_q[1]["first_hit_rank"] == 1
    assert per_q[2]["hit_at_k"] == 0 and per_q[2]["first_hit_rank"] is None
    assert hits.groupBy("q_id").count().collect()[0]["count"] == 5


def test_run_qa_eval_end_to_end_artifact(spark, tmp_path):
    """The e2e /ask eval (retrieve -> gate -> snippets -> hit@1/p50/p95):
    self-text questions must hit deterministically, absent-substring
    questions must miss, and the artifact file mirrors the reference's
    eval/results/last.json shape (ask_eval.py:117-131)."""
    import json

    from jsonify2ai_spark.operators.evalharness import (
        eval_corpus_from_documents,
        run_qa_eval,
    )

    corpus = eval_corpus_from_documents(spark, "/root/testdata/sf0.001", dim=64)
    doc = corpus.orderBy("document_id").first()
    qa = [
        {"question": doc["text"], "answer_contains": doc["text"][:30]},
        {"question": "absent topic entirely", "answer_contains": "zz-not-in-corpus"},
    ]
    out_path = str(tmp_path / "results" / "last.json")
    out = run_qa_eval(corpus, qa, out_path=out_path, k=5, dim=64)

    assert out["n"] == 2 and out["hit@1"] == 1
    assert out["cases"][0]["hit"] is True and out["cases"][0]["ok"] is True
    assert out["cases"][1]["hit"] is False
    assert out["p50_ms"] <= out["p95_ms"]
    on_disk = json.load(open(out_path))
    assert set(on_disk) == {
        "ts", "engine", "n", "hit@1", "p50_ms", "p95_ms", "latencies_ms", "cases",
    }
    assert [c["i"] for c in on_disk["cases"]] == [1, 2]


def test_run_qa_eval_reads_committed_qa_file(spark):
    """The committed eval/qa.jsonl replays against the sf0.001 corpus with
    the exact hit pattern baked into eval/results/last.json: 3 self-text
    hits, 5 misses."""
    from jsonify2ai_spark.operators.evalharness import (
        eval_corpus_from_documents,
        run_qa_eval,
    )

    corpus = eval_corpus_from_documents(spark, "/root/testdata/sf0.001", dim=64)
    out = run_qa_eval(corpus, "eval/qa.jsonl", k=5, dim=64)
    assert out["n"] == 8 and out["hit@1"] == 3
    assert [c["hit"] for c in out["cases"]] == [True] * 3 + [False] * 5
