"""Chunker boundary goldens — the reference's own unit vectors
(worker/tests/test_process_unit.py:12-65 semantics, per SURVEY §5.1)."""

from __future__ import annotations

from jsonify2ai_spark.operators.chunker import chunk_chat_py, chunk_documents, chunk_text_py


def test_golden_200_chars():
    ch = chunk_text_py("a" * 200, size=100, overlap=20)
    assert [len(c) for c in ch] == [100, 100, 40]
    for i in range(len(ch) - 1):
        assert ch[i][-20:] == ch[i + 1][:20]


def test_golden_300_chars():
    ch = chunk_text_py("a" * 300, size=100, overlap=20)
    assert [len(c) for c in ch] == [100, 100, 100, 60]


def test_empty_and_invalid():
    assert chunk_text_py("", 100, 20) == []
    assert chunk_text_py("   \n\t ", 100, 20) == []
    assert chunk_text_py("abc", 0, 0) == []
    assert chunk_text_py("abc", -5, 0) == []


def test_whitespace_cut_preference():
    # 'word ' * N: cuts land on whitespace, chunks end at word boundaries
    text = ("word " * 50).strip()  # 249 chars
    ch = chunk_text_py(text, size=100, overlap=20)
    assert all(not c.startswith(" ") and not c.endswith(" ") for c in ch)
    assert all(len(c) <= 100 for c in ch)
    # no content lost: chunks reassemble to a superset of the token stream
    toks = " ".join(ch).split()
    assert set(toks) == {"word"}


def test_overlap_clamped():
    # overlap >= size must not stall: monotone progress guaranteed
    ch = chunk_text_py("a" * 150, size=50, overlap=50)
    assert ch, "must make progress"
    assert "".join(c[: 50 - 49] for c in ch)  # smoke: no infinite loop happened


def test_whitespace_normalization_applied():
    ch = chunk_text_py("a   b\n\nc\t\td", size=1000, overlap=0)
    assert ch == ["a b c d"]


def test_chat_chunker_blocks():
    msgs = "\n\n".join(f"user: message number {i}" for i in range(10))
    ch = chunk_chat_py(msgs, size=60)
    assert len(ch) > 1
    # blocks never split mid-message when they fit the budget
    for c in ch:
        for block in c.split("\n\n"):
            assert block.startswith("user: ")
    # oversize single block falls back to window split
    big = "user: " + "x" * 500
    ch2 = chunk_chat_py(big, size=100)
    assert len(ch2) >= 5


def test_chunk_documents_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "a" * 200), (2, ""), (3, "short")], ["doc_id", "text"]
    )
    out = chunk_documents(df, size=100, overlap=20).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["idx"], r["chunk"]))
    assert len(by_doc[1]) == 3
    assert [i for i, _ in sorted(by_doc[1])] == [0, 1, 2]
    assert 2 not in by_doc  # empty text -> no rows
    assert by_doc[3] == [(0, "short")]


def test_chunker_recursive_cte_parity_adversarial():
    """The q34 oracle's recursive CTE must equal chunk_text_py on boundary
    cases the corpus never hits: cuts exactly at/next to spaces, 1-char
    words, no-space runs longer than the window, whitespace-only text,
    pieces shorter than the overlap (monotone-progress fallback)."""
    import duckdb

    from __spark_entry__ import _dd_chunker_sql
    from jsonify2ai_spark.operators.chunker import chunk_text_py

    size, overlap = 10, 3
    cases = [
        "",
        "   ",
        "abcdefghijklmnopqrstuvwxyz",        # no spaces: hard cuts
        "a " * 30,                             # 1-char words
        "aaaa bbbb cccc dddd eeee",            # cut lands on boundaries
        "aaaaaaaaa b",                         # space at window edge
        "a" * 9 + " " + "b" * 9,
        "a" * 10 + " " + "b" * 10,
        "ab " + "c" * 25 + " de",              # oversize run mid-text
        "  lead   multi   space  tail  ",
        "x y z " * 12,
        "a" * 7 + "  " + "b" * 7,              # double space collapses
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(cases))
    )
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(_dd_chunker_sql(size, overlap)).fetchall()
    }
    expect = {}
    for i, text in enumerate(cases):
        cs = chunk_text_py(text, size=size, overlap=overlap)
        if cs:
            expect[i] = (len(cs), sum(len(c) for c in cs), len(cs) - 1)
    assert got == expect
