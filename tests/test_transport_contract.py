"""Live-transport contract tests: recorded request/response fixtures (no
network) pinning the reference's Ollama HTTP shapes.

The transports are wired but fake-posted everywhere else in the suite; these
tests freeze the WIRE CONTRACT itself so a live deployment cannot drift:

- /api/embed  — request ``{"model", "input": [texts]}``, response in any of
  the three shapes the reference parser accepts
  (worker/app/services/embed_ollama.py:8-51, request at :86-100)
- /api/generate — request ``{"model", "prompt", "stream": false,
  "options": {temperature, top_p, repeat_penalty, num_ctx, num_predict}}``,
  response ``{"response": ...}``, empty-string-on-any-failure
  (worker/providers/llm/ollama.py:21-72)

urllib.request.urlopen is monkeypatched with a recorder: each test asserts
the exact bytes that would hit the wire and replays a canned response.
"""

from __future__ import annotations

import io
import json
import urllib.request

import pytest

from jsonify2ai_spark.functions.embed_live import ollama_post_fn, parse_embed_response
from jsonify2ai_spark.functions.llm import DEFAULT_OPTIONS, ollama_generate_fn


class _FakeResponse(io.BytesIO):
    """Minimal stand-in for urllib's addinfourl: read() + status + ctx-mgr."""

    def __init__(self, payload, status: int = 200):
        super().__init__(json.dumps(payload).encode("utf-8"))
        self.status = status

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _record(monkeypatch, response, status: int = 200):
    """Patch urlopen to capture the outgoing request and replay ``response``."""
    seen: dict = {}

    def fake_urlopen(req, timeout=None):
        seen["url"] = req.full_url
        seen["body"] = json.loads(req.data.decode("utf-8"))
        # urllib title-cases header keys internally
        seen["content_type"] = req.get_header("Content-type")
        seen["timeout"] = timeout
        if isinstance(response, Exception):
            raise response
        return _FakeResponse(response, status)

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    return seen


# --------------------------------------------------------------------------
# /api/embed (embed_ollama.py:86-100)
# --------------------------------------------------------------------------

EMBED_TEXTS = ["hello world", "second doc"]
# recorded modern /api/embed response (shape 1 of the reference parser)
EMBED_RESPONSE_MODERN = {"embeddings": [[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]]}
# recorded legacy single-shape /api/embeddings response (shape 2)
EMBED_RESPONSE_LEGACY_SINGLE = {"embedding": [0.7, 0.8, 0.9]}
# recorded legacy batch shape (shape 3)
EMBED_RESPONSE_LEGACY_BATCH = {
    "embeddings": [{"embedding": [0.1, 0.2]}, {"embedding": [0.3, 0.4]}]
}


def test_embed_request_shape(monkeypatch):
    seen = _record(monkeypatch, EMBED_RESPONSE_MODERN)
    post = ollama_post_fn(base_url="http://host:11434", model="nomic-embed-text")
    vectors = post(EMBED_TEXTS)
    assert seen["url"] == "http://host:11434/api/embed"
    assert seen["body"] == {"model": "nomic-embed-text", "input": EMBED_TEXTS}
    assert seen["content_type"] == "application/json"
    assert seen["timeout"] == 180.0  # reference's request timeout
    assert vectors == [[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]]


def test_embed_base_url_trailing_slash_and_model_override(monkeypatch):
    seen = _record(monkeypatch, EMBED_RESPONSE_MODERN)
    post = ollama_post_fn(base_url="http://host:11434/", model="mxbai-embed-large")
    post(EMBED_TEXTS)
    assert seen["url"] == "http://host:11434/api/embed"  # no double slash
    assert seen["body"]["model"] == "mxbai-embed-large"


def test_embed_legacy_single_shape(monkeypatch):
    _record(monkeypatch, EMBED_RESPONSE_LEGACY_SINGLE)
    post = ollama_post_fn()
    assert post(["only one"]) == [[0.7, 0.8, 0.9]]


def test_embed_legacy_batch_shape(monkeypatch):
    _record(monkeypatch, EMBED_RESPONSE_LEGACY_BATCH)
    post = ollama_post_fn()
    assert post(EMBED_TEXTS) == [[0.1, 0.2], [0.3, 0.4]]


def test_embed_count_mismatch_raises(monkeypatch):
    _record(monkeypatch, {"embeddings": [[0.1, 0.2]]})  # 1 vector for 2 texts
    post = ollama_post_fn()
    with pytest.raises(ValueError, match="count mismatch"):
        post(EMBED_TEXTS)


def test_embed_empty_vector_mid_batch_raises(monkeypatch):
    _record(monkeypatch, {"embeddings": [[0.1], [], [0.2]]})
    post = ollama_post_fn()
    with pytest.raises(ValueError, match="positions \\[1\\]"):
        post(["a", "b", "c"])


def test_embed_transport_error_propagates(monkeypatch):
    # raising (not returning empty) is load-bearing: live_embedding_udf's
    # retry loop keys off the exception
    _record(monkeypatch, OSError("connection refused"))
    post = ollama_post_fn()
    with pytest.raises(OSError):
        post(EMBED_TEXTS)


def test_parse_embed_response_rejects_unknown_shape():
    with pytest.raises(ValueError):
        parse_embed_response({"vectors": [[1.0]]})
    with pytest.raises(ValueError):
        parse_embed_response([])


# --------------------------------------------------------------------------
# /api/generate (providers/llm/ollama.py:21-72)
# --------------------------------------------------------------------------


def test_generate_request_shape(monkeypatch):
    seen = _record(monkeypatch, {"response": "  The answer.\n"})
    gen = ollama_generate_fn(host="http://host:11434", model="llama3.1:8b")
    out = gen("What is Spark?")
    assert seen["url"] == "http://host:11434/api/generate"
    assert seen["body"] == {
        "model": "llama3.1:8b",
        "prompt": "What is Spark?",
        "stream": False,
        "options": DEFAULT_OPTIONS,
    }
    # the reference's sampling defaults, exact keys and values
    assert DEFAULT_OPTIONS == {
        "temperature": 0.2,
        "top_p": 0.9,
        "repeat_penalty": 1.1,
        "num_ctx": 4096,
        "num_predict": 512,
    }
    assert out == "The answer."  # response stripped


def test_generate_options_override_merges(monkeypatch):
    seen = _record(monkeypatch, {"response": "ok"})
    gen = ollama_generate_fn(options={"temperature": 0.7})
    gen("p")
    assert seen["body"]["options"]["temperature"] == 0.7
    assert seen["body"]["options"]["num_ctx"] == 4096  # defaults preserved


def test_generate_failure_contract_empty_string(monkeypatch):
    """ANY failure -> '' (never raises): the caller's retrieve-only fallback
    (api.ask_and_generate synth_skipped_reason) depends on this."""
    # non-2xx
    _record(monkeypatch, {"response": "nope"}, status=500)
    assert ollama_generate_fn()("p") == ""
    # network error
    _record(monkeypatch, OSError("unreachable"))
    assert ollama_generate_fn()("p") == ""
    # missing response key
    _record(monkeypatch, {"done": True})
    assert ollama_generate_fn()("p") == ""


def test_generate_bad_json_empty_string(monkeypatch):
    def fake_urlopen(req, timeout=None):
        r = _FakeResponse({}, 200)
        r.seek(0)
        r.truncate()
        r.write(b"not json{")
        r.seek(0)
        return r

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    assert ollama_generate_fn()("p") == ""
