"""Parser-fleet contracts (S-series kernels) + end-to-end ingest golden."""

from __future__ import annotations

import json

import pytest

from jsonify2ai_spark.sources.chatgpt import is_chatgpt_export, parse_chatgpt_export
from jsonify2ai_spark.sources.csvsrc import csv_join_lines
from jsonify2ai_spark.sources.flatten import flatten_json_text, flatten_jsonl_text, flatten_obj
from jsonify2ai_spark.sources.router import (
    SkipFile,
    extract_text_auto,
    kind_for_ext,
    parse_html_text,
    should_ignore,
)
from jsonify2ai_spark.sources.transcript import detect_transcript, parse_transcript


def test_csv_join_golden():
    # FIXTURES §2.2 golden
    assert csv_join_lines("name,age\nalice,30\n") == ["name | age", "alice | 30"]


def test_csv_caps():
    row = ",".join(f"c{i}" for i in range(60))
    lines = csv_join_lines(row)
    assert lines[0].count("|") == 49  # 50-col cap
    long = ",".join(["x" * 100] * 30)
    assert len(csv_join_lines(long)[0]) <= 2000


def test_csv_sniffs_semicolon():
    assert csv_join_lines("a;b\n1;2\n") == ["a | b", "1 | 2"]


def test_json_flatten_golden():
    # FIXTURES §2.3 golden
    data = '[{"id": 1, "name": "Item 1", "value": 100}, {"id": 2, "name": "Item 2", "value": 200}]'
    lines = flatten_json_text(data).splitlines()
    assert lines[0] == "[0].id: 1"
    assert lines[1] == "[0].name: Item 1"
    assert "[1].value: 200" in lines
    assert flatten_obj({"a": {"b": [True, None]}}) == ["a.b[0]: true", "a.b[1]: null"]


def test_jsonl_flatten_prefix_and_bad_lines():
    text = '{"a": 1}\nnot json\n{"b": 2}'
    lines = flatten_jsonl_text(text).splitlines()
    assert lines == ["$[0].a: 1", "$[2].b: 2"]  # index = input line position


def test_html_visible_text():
    html = "<html><head><style>.x{}</style><script>var a=1;</script></head>" \
           "<body><h1>Title</h1><p>Hello <b>world</b></p><noscript>no</noscript></body></html>"
    out = parse_html_text(html)
    assert "Title" in out and "Hello" in out and "world" in out
    assert "var a=1" not in out and ".x{}" not in out and "no" not in out.splitlines()


def test_transcript_detect_positive_negative():
    # FIXTURES §2.5 shape
    pos = (
        "User: How do I create a Python virtual environment?\n\n"
        "Assistant: You can create one with python -m venv.\n\n"
        "User: Thanks! How do I deactivate it?\n"
    )
    ok, conf = detect_transcript(pos)
    assert ok and conf >= 0.85
    neg = "This is plain prose.\nIt talks about nothing.\nNo roles here at all."
    ok2, conf2 = detect_transcript(neg)
    assert not ok2 and conf2 < 0.85


def test_transcript_parse_deterministic_ids():
    text = "User: hello\n\nAssistant: hi there\n"
    docs = parse_transcript(text)
    assert len(docs) == 1
    doc_id, rendered, meta = docs[0]
    assert doc_id.startswith("transcript:")
    sig, tid = doc_id.split(":")[1], doc_id.split(":")[2]
    assert len(sig) == 16 and tid.endswith("_0")
    assert parse_transcript(text)[0][0] == doc_id  # deterministic
    assert rendered == "User: hello\n\nAssistant: hi there"
    assert meta["doc_type"] == "chat" and meta["message_count"] == "2"


def test_chatgpt_detect_and_parse():
    # FIXTURES §2.4 minimal shape
    export = [{
        "id": "conv-001", "title": "venvs", "create_time": 1704067200,
        "update_time": 1704067300,
        "mapping": {
            "node-2": {"message": {
                "author": {"role": "assistant"}, "create_time": 1704067260,
                "content": {"parts": ["Use python -m venv"]}}},
            "node-1": {"message": {
                "author": {"role": "user"}, "create_time": 1704067200,
                "content": {"parts": ["How do I venv?"]}}},
        },
    }]
    assert is_chatgpt_export(export)
    assert not is_chatgpt_export([{"no": "mapping"}])
    docs = parse_chatgpt_export(export, "conversations.json")
    assert len(docs) == 1
    doc_id, text, meta = docs[0]
    assert doc_id == "chatgpt:conv-001"
    blocks = text.split("\n\n")
    assert blocks[0].endswith("user: How do I venv?")  # create_time ordering
    assert "[2024-01-01 00:0" in blocks[0]  # rendered timestamp
    assert meta["logical_path"] == "chatgpt/conv-001"
    assert meta["title"] == "venvs"


def test_router_dispatch_and_skips():
    assert extract_text_auto("a.csv", b"x,y\n1,2\n") == "x | y\n1 | 2"
    assert extract_text_auto("a.json", b'{"k": 1}') == "k: 1"
    assert extract_text_auto("a.txt", b"plain") == "plain"
    assert extract_text_auto("a.wav", b"\x00\x01") == "[DEV] transcript of a.wav"
    assert extract_text_auto("a.png", b"\x00") == "[DEV] caption of a.png"
    with pytest.raises(SkipFile):
        extract_text_auto("a.wav", b"", dev_mode=False)
    with pytest.raises(SkipFile):
        extract_text_auto("a.pdf", b"%PDF")  # pypdf absent in this env
    assert kind_for_ext("pdf") == "pdf" and kind_for_ext("md") == "text"
    assert should_ignore("dir/temp_x.txt") and should_ignore("a.tmp")
    assert not should_ignore("notes/real.md")


def test_ingest_end_to_end_idempotent(spark, tmp_path):
    """Golden-path e2e (SURVEY §5.2): ingest tree -> chunks table; re-ingest
    converges; detector fan-out produces chat docs; search hits the token."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.search import cosine_topk
    from jsonify2ai_spark.functions.vectors import dev_embedding_py
    from jsonify2ai_spark.sources.ingest import ingest_files

    d = tmp_path / "dropzone"
    d.mkdir()
    (d / "golden.md").write_text("the golden sentence lives here " * 30)
    (d / "data.csv").write_text("name,age\nalice,30\n")
    (d / "chat.txt").write_text("User: hello golden\n\nAssistant: hi!\n")
    (d / "conversations.json").write_text(json.dumps([{
        "id": "c1", "mapping": {"n1": {"message": {
            "author": {"role": "user"}, "create_time": 1,
            "content": {"parts": ["ask me anything"]}}}},
    }]))
    (d / "temp_ignored.txt").write_text("must not appear")

    chunks = ingest_files(spark, str(d), dim=64).cache()
    rows = chunks.collect()
    paths = {r["path"].rsplit("/", 1)[-1] for r in rows}
    assert paths == {"golden.md", "data.csv", "chat.txt", "conversations.json"}
    kinds = {r["kind"] for r in rows}
    assert "chat" in kinds and "csv" in kinds and "text" in kinds
    assert all(len(r["vector"]) == 64 for r in rows)
    assert all(r["id"] and r["document_id"] for r in rows)

    # idempotency: re-ingest over the existing table converges
    again = ingest_files(spark, str(d), existing=chunks, dim=64)
    snap = lambda df: sorted((r["id"], r["text"]) for r in df.collect())
    assert snap(again) == snap(chunks)

    # search: dev-mode embeddings are pure functions of text, so querying with
    # an exact chunk text must be hit@1 with score 1.0 (reference golden path
    # under EMBED_DEV_MODE semantics)
    target = next(r for r in rows if r["kind"] == "chat" and "hello golden" in r["text"])
    hits = cosine_topk(
        chunks, dev_embedding_py(target["text"], 64), k=3, id_cols=("id",)
    ).collect()
    assert hits[0]["id"] == target["id"]
    assert abs(hits[0]["score"] - 1.0) < 1e-9


def test_decode_text_boms_utf16_and_legacy():
    """Encoding tolerance (reference note2json utils/encoding.py contract):
    UTF-8 BOM stripped, UTF-16 LE/BE with and without BOM, cp1252 legacy
    bytes, and a hard ValueError on NUL-ridden binary."""
    import pytest as _pytest

    from jsonify2ai_spark.sources.notes import decode_text

    s = "# Note\nhéllo wörld"
    assert decode_text(s.encode("utf-8")) == s
    assert decode_text(codecs_bom("utf-8-sig", s)) == s
    assert decode_text(s.encode("utf-16")) == s          # BOM'd (LE on x86)
    assert decode_text(s.encode("utf-16-le")) == s       # BOM-less LE
    assert decode_text(s.encode("utf-16-be")) == s       # BOM-less BE
    assert decode_text("café £10".encode("cp1252")) == "café £10"
    with _pytest.raises(ValueError, match="UTF-8"):
        decode_text(bytes(512))  # NUL-ridden under every decode -> binary


def codecs_bom(enc, s):
    return s.encode(enc)


def test_read_input_source_shapes_and_formats(tmp_path):
    """read_input parity (reference parser.py:357-394): file-like / bytes /
    path / raw text in, auto json-vs-text sniff, json errors carry the
    format hint, path supplies the filename hint."""
    import io

    import pytest as _pytest

    from jsonify2ai_spark.sources.notes import read_input

    md = "# Title here\n**Tags:** #a #b\nbody"
    # bytes (UTF-16 with BOM) -> markdown parse
    out = read_input(md.encode("utf-16"))
    assert out["title"] == "Title here" and out["tags"] == ["a", "b"]
    # file-like (stdin shape)
    assert read_input(io.BytesIO(md.encode("utf-8")))["title"] == "Title here"
    # auto-sniffed JSON
    out = read_input('{"title": "From JSON", "tags": ["#x"]}')
    assert out["title"] == "From JSON" and out["tags"] == ["x"]
    # existing path: decoded from UTF-16, first line becomes the title (F14)
    p = tmp_path / "daily-note.md"
    p.write_bytes("no title body only".encode("utf-16-le"))
    assert read_input(str(p))["title"] == "no title body only"
    # hint from the filename stem kicks in when the text yields no title
    p2 = tmp_path / "empty-note.md"
    p2.write_bytes(b"")
    assert read_input(str(p2))["title"] == "empty-note"
    # bad JSON when json was demanded -> the reference's hint
    with _pytest.raises(ValueError, match="Markdown or text"):
        read_input("not json", input_format="json")


def test_router_decodes_utf16_and_skips_binary():
    """S18 fallback upgrade: UTF-16 text files extract cleanly (the old
    utf-8+ignore decode left them NUL-riddled); binary junk now raises
    SkipFile instead of producing garbage text."""
    import pytest as _pytest

    from jsonify2ai_spark.sources.router import SkipFile, extract_text_auto

    text = extract_text_auto("x.txt", "plain utf16 content".encode("utf-16"))
    assert text == "plain utf16 content"
    with _pytest.raises(SkipFile, match="undecodable"):
        extract_text_auto("x.bin", bytes(512))
