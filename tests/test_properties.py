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


def test_upsert_delete_model_convergence(spark):
    """Model-based J5/K4 check: any seeded sequence of replace/delete ops
    leaves the table equal to a plain dict model — and replaying any replace
    is a no-op (idempotency, the reference's core invariant)."""
    import random

    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.upsert import delete_documents, replace_documents

    rng = random.Random(7)
    docs = [f"d{i}" for i in range(6)]
    model: dict[tuple[str, int], str] = {}
    table = spark.createDataFrame([], "document_id string, idx int, text string")

    def snap(df):
        return {(r["document_id"], r["idx"]): r["text"] for r in df.collect()}

    last_replace = None
    for step in range(12):
        doc = rng.choice(docs)
        if rng.random() < 0.3 and any(k[0] == doc for k in model):
            table = delete_documents(table, [doc])
            model = {k: v for k, v in model.items() if k[0] != doc}
        else:
            n = rng.randint(1, 3)
            rows = [(doc, i, f"{doc}-v{step}-{i}") for i in range(n)]
            incoming = spark.createDataFrame(rows, "document_id string, idx int, text string")
            table = replace_documents(table, incoming)
            model = {k: v for k, v in model.items() if k[0] != doc}
            model.update({(doc, i): t for doc, i, t in rows})
            last_replace = incoming
        assert snap(table) == model, f"diverged at step {step}"

    # idempotency: replaying the last replace changes nothing
    if last_replace is not None:
        again = replace_documents(table, last_replace)
        assert snap(again) == model


@given(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00﻿"),
        min_size=1,
        max_size=300,
    ),
    st.sampled_from(["utf-8", "utf-8-sig", "utf-16"]),
)
@settings(max_examples=60, deadline=None)
def test_decode_text_round_trips_self_describing_encodings(s, enc):
    """decode_text(s.encode(enc)) == s for ANY clean unicode text when the
    encoding is self-describing (UTF-8, or UTF-16 with its BOM). NULs and
    bare BOMs are excluded — NULs mark binary by contract, and a leading
    BOM is a byte-order mark, not content."""
    from jsonify2ai_spark.sources.notes import decode_text

    assert decode_text(s.encode(enc)) == s


@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=1,
        max_size=300,
    ),
    st.sampled_from(["utf-16-le", "utf-16-be"]),
)
@settings(max_examples=60, deadline=None)
def test_decode_text_round_trips_bomless_utf16_ascii(s, enc):
    """BOM-less UTF-16 has no in-band encoding marker, so detection is only
    well-defined for ASCII-dominant text (the NUL-byte signature); there it
    must round-trip for BOTH endiannesses. (Fully non-ASCII BOM-less UTF-16
    is inherently ambiguous — 'a' in BE reads as a CJK char in LE — and
    decode_text documents the ASCII-preferring resolution.)"""
    from jsonify2ai_spark.sources.notes import decode_text

    assert decode_text(s.encode(enc)) == s


@given(st.text(max_size=400))
@settings(max_examples=60, deadline=None)
def test_pii_redaction_idempotent_driverside(s):
    """redact(redact(x)) == redact(x): no placeholder can seed a re-match —
    every pattern needs an '@' or a multi-digit run with separators, and the
    placeholders contain neither (note '[IPV4]' DOES contain the single
    digit 4, so extending PII_PATTERNS with anything that matches a short
    digit-adjacent token must re-check this property). Checked on the regex
    kernels driver-side (the Column expressions apply the same patterns)."""
    import re

    from jsonify2ai_spark.operators.pii import PII_PATTERNS

    def redact(text: str) -> str:
        for kind, pat in PII_PATTERNS.items():
            text = re.sub(pat, f"[{kind.upper()}]", text)
        return text

    once = redact(s)
    assert redact(once) == once


@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)),
        min_size=0,
        max_size=80,
    ),
    st.integers(0, 3),
)
@settings(max_examples=12, deadline=None)
def test_connected_components_matches_union_find(edge_list, propagate_rounds):
    """Differential fuzz: on random graphs (self-loops, duplicates, any
    shape) the distributed CC must produce exactly the union-find labels —
    min node id per component — regardless of how early the star-phase
    escalation kicks in (propagate_rounds 0-3 forces different code paths).
    """
    from jsonify2ai_spark.operators.dedup import connected_components

    spark = _spark_session()  # getOrCreate: reuses the suite's session

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edge_list:
        union(a, b)
    expected = {n: find(n) for n in parent}
    # canonicalize: representative = min of component
    comp: dict[int, list[int]] = {}
    for n, r in expected.items():
        comp.setdefault(find(r), []).append(n)
    expected = {n: min(ms) for r, ms in comp.items() for n in ms}

    if not edge_list:
        df = spark.createDataFrame([], "a bigint, b bigint")
    else:
        df = spark.createDataFrame(edge_list, "a bigint, b bigint")
    got = {
        r["node"]: r["cluster_rep"]
        for r in connected_components(
            df, max_iter=50, propagate_rounds=propagate_rounds,
            driver_threshold=0,  # force the distributed path under fuzz
        ).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=6),
        min_size=1,
        max_size=6,
    ),
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=6),
        min_size=1,
        max_size=6,
    ),
)
@settings(max_examples=8, deadline=None)
def test_dedup_against_matches_python_bipartite_jaccard(new_toks, old_toks):
    """Differential fuzz for incremental dedup: on random tiny corpora the
    exact bipartite path must reproduce a pure-Python jaccard over the SAME
    shingle kernel (_gram_hashes_py — whole-text fallback below n included),
    per new-doc dup counts and kept flags."""
    from jsonify2ai_spark.operators.dedup import _gram_hashes_py, dedup_against

    spark = _spark_session()
    threshold = 0.5
    new_rows = [(i, " ".join(t)) for i, t in enumerate(new_toks)]
    old_rows = [(1000 + i, " ".join(t)) for i, t in enumerate(old_toks)]

    def sets(rows):
        return {i: set(_gram_hashes_py(t.split() if t else [], 3)) for i, t in rows}

    sn, se = sets(new_rows), sets(old_rows)
    expected = {}
    for a, ha in sn.items():
        n_dups = 0
        for b, hb in se.items():
            union = len(ha | hb)
            if union and len(ha & hb) / union >= threshold:
                n_dups += 1
        expected[a] = (n_dups, n_dups == 0)

    new_df = spark.createDataFrame(new_rows, "doc_id long, text string")
    old_df = spark.createDataFrame(old_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_dups"], r["kept"])
        for r in dedup_against(new_df, old_df, threshold).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=10, deadline=None)
def test_tfidf_cosine_matches_dense_reference(token_lists):
    """Differential fuzz for the q64 operator: on random small corpora the
    sparse md5-bucket TF-IDF cosine (joins + aggregations) must equal a
    dense pure-Python computation of the same definition — same hash
    buckets, tf * ln((N+1)/(df+1)) with zero-idf buckets dropped, cosine
    vs the lowest-id doc, round 6, omit zero-norm and no-overlap docs."""
    import hashlib
    import math

    spark = _spark_session()
    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    dim = 32

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % dim

    n_docs = len(rows)
    vecs: dict[int, dict[int, float]] = {}
    for i, toks in enumerate(token_lists):
        tf: dict[int, int] = {}
        for t in toks:
            b = bucket(t)
            tf[b] = tf.get(b, 0) + 1
        vecs[i] = tf
    dfreq: dict[int, int] = {}
    for tf in vecs.values():
        for b in tf:
            dfreq[b] = dfreq.get(b, 0) + 1
    w = {
        i: {
            b: c * math.log((n_docs + 1.0) / (dfreq[b] + 1.0))
            for b, c in tf.items()
            if dfreq[b] < n_docs  # zero-idf buckets dropped
        }
        for i, tf in vecs.items()
    }
    probe = w[0]
    pnrm = math.sqrt(sum(x * x for x in probe.values()))
    expected = {}
    for i, wi in w.items():
        shared = set(wi) & set(probe)
        if not shared:
            continue  # sparse join: no overlapping bucket -> no row
        nrm = math.sqrt(sum(x * x for x in wi.values()))
        if nrm == 0 or pnrm == 0:
            continue
        dot = sum(wi[b] * probe[b] for b in shared)
        expected[i] = round(dot / (nrm * pnrm), 6)

    from jsonify2ai_spark.functions.embed_mllib import tfidf_cosine_topk

    got = {
        r["doc_id"]: r["tfidf_cosine"]
        for r in tfidf_cosine_topk(df, k=len(rows), dim=dim).collect()
    }
    assert set(got) == set(expected)
    for i, v in expected.items():
        assert math.isclose(got[i], v, abs_tol=2e-6), (i, got[i], v)


def _spark_session():
    from jsonify2ai_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    return s


@given(
    st.lists(
        st.lists(
            st.sampled_from(["nav bar", "footer", "body one", "body two", "x y z"]),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=7,
    ),
    st.integers(1, 3),
)
@settings(max_examples=8, deadline=None)
def test_line_dedup_matches_python_model(doc_lines, cap):
    """Differential fuzz for q98: on random tiny line-structured corpora
    the Spark line_dedup must reproduce a pure-Python model — hot set =
    trimmed lines in > cap DISTINCT docs, cleaned text = surviving lines
    in original order — for every doc, including all-boilerplate docs."""
    import hashlib

    from jsonify2ai_spark.operators.dedup import line_dedup

    spark = _spark_session()
    rows = [(i, "\n".join(lines)) for i, lines in enumerate(doc_lines)]

    df_by_line: dict[str, set] = {}
    for i, lines in enumerate(doc_lines):
        for ln in lines:
            df_by_line.setdefault(ln.strip(), set()).add(i)
    hot = {ln for ln, docs in df_by_line.items() if len(docs) > cap}
    expected = {}
    for i, lines in enumerate(doc_lines):
        kept = [ln for ln in lines if ln.strip() not in hot]
        expected[i] = (
            len(lines),
            len(kept),
            hashlib.md5("\n".join(kept).encode()).hexdigest(),
        )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["cleaned_md5"])
        for r in line_dedup(df, max_line_df=cap).collect()
    }
    assert got == expected


@given(
    st.lists(st.floats(0.0, 1.0, allow_nan=False).map(lambda x: round(x, 2)),
             min_size=1, max_size=40),
    st.integers(2, 10),
)
@settings(max_examples=8, deadline=None)
def test_curriculum_buckets_matches_python_model(scores, n_buckets):
    """Differential fuzz for q96: bucket = floor(frac_strictly_below * n),
    capped at n-1, ties sharing a bucket — against a pure-Python CDF model
    on random score multisets."""
    from jsonify2ai_spark.operators.sampling import curriculum_buckets

    spark = _spark_session()
    rows = [(i, s) for i, s in enumerate(scores)]
    n = len(scores)
    expected = {}
    for i, s in enumerate(scores):
        below = sum(1 for x in scores if x < s)
        expected[i] = min(n_buckets - 1, int((below / n) * n_buckets))

    df = spark.createDataFrame(rows, "doc_id long, s double")
    got = {
        r["doc_id"]: r["bucket"]
        for r in curriculum_buckets(df, n_buckets=n_buckets, score_col="s").collect()
    }
    assert got == expected


@given(
    st.lists(
        st.lists(
            st.tuples(
                st.sampled_from(["user", "assistant", "system", "tool"]),
                st.sampled_from(["hello there", "", "  ", "fine answer"]),
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=8, deadline=None)
def test_conversation_lint_matches_python_model(convs):
    """Differential fuzz for q102: on random conversations the Spark lint
    must reproduce a pure-Python model for every signal, including the
    single-turn and all-empty edges."""
    from jsonify2ai_spark.operators.textstats import conversation_lint

    spark = _spark_session()
    rows = [
        (c, t, role, text)
        for c, turns in enumerate(convs)
        for t, (role, text) in enumerate(turns)
    ]
    allowed = {"system", "user", "assistant"}
    expected = {}
    for c, turns in enumerate(convs):
        roles = [r for r, _ in turns]
        n = len(roles)
        viol = sum(1 for i in range(1, n) if roles[i] == roles[i - 1])
        n_empty = sum(1 for _, tx in turns if not tx.strip())
        n_bad = sum(1 for r in roles if r not in allowed)
        keep = (
            n >= 2
            and roles[0] == "user"
            and roles[-1] == "assistant"
            and viol == 0
            and n_empty == 0
            and n_bad == 0
        )
        expected[c] = (
            n,
            roles.count("user"),
            roles.count("assistant"),
            roles[0] == "user",
            roles[-1] == "assistant",
            viol,
            n_empty,
            n_bad,
            keep,
        )

    df = spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string"
    )
    got = {
        r["conv_id"]: (
            r["n_turns"], r["n_user"], r["n_assistant"], r["starts_with_user"],
            r["ends_with_assistant"], r["alternation_violations"],
            r["n_empty"], r["n_bad_role"], r["keep"],
        )
        for r in conversation_lint(df).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.lists(
            st.sampled_from(
                ["good clean line here today.", "short.", "no punct at all",
                 "{ code", "lorem ipsum", "five words ending right here!"]
            ),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=8, deadline=None)
def test_c4_filter_matches_python_model(doc_lines):
    """Differential fuzz for q97: on random line-structured docs the Spark
    C4 report must reproduce a pure-Python model of the §2.2 rules."""
    import re

    from jsonify2ai_spark.operators.textstats import c4_filter

    spark = _spark_session()
    rows = [(i, "\n".join(lines)) for i, lines in enumerate(doc_lines)]
    expected = {}
    for i, lines in enumerate(doc_lines):
        text = "\n".join(lines)
        is_policy = lambda ln: "javascript" in ln.lower() or "cookie" in ln.lower()
        kept = [
            ln for ln in lines
            if len(ln.strip().split()) >= 5
            and re.search(r"[.!?]$", ln.strip())
            and not is_policy(ln)
        ]
        n_policy = sum(1 for ln in lines if is_policy(ln))
        n_sent = len(re.split(r"[.!?]", "\n".join(kept))) - 1
        brace = "{" in text
        lorem = "lorem ipsum" in text.lower()
        keep = n_sent >= 3 and not brace and not lorem
        expected[i] = (len(lines), len(kept), n_policy, n_sent, brace, lorem, keep)

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_lines"], r["n_good_lines"], r["n_policy_lines"],
            r["n_sentences"], r["has_brace"], r["has_lorem"], r["keep"],
        )
        for r in c4_filter(df).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", " aa ", "cc dd"]), min_size=1, max_size=8),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=8, deadline=None)
def test_squeeze_repeated_lines_matches_python_model(doc_lines):
    """Differential fuzz for q103: trim-insensitive consecutive-run
    collapse against a pure-Python model (first spelling of each run
    kept), on random line multisets including whitespace-variant runs."""
    import hashlib

    from jsonify2ai_spark.operators.dedup import squeeze_repeated_lines

    spark = _spark_session()
    rows = [(i, "\n".join(lines)) for i, lines in enumerate(doc_lines)]
    expected = {}
    for i, lines in enumerate(doc_lines):
        kept = [
            ln for j, ln in enumerate(lines)
            if j == 0 or ln.strip() != lines[j - 1].strip()
        ]
        expected[i] = (
            len(lines),
            len(lines) - len(kept),
            hashlib.md5("\n".join(kept).encode()).hexdigest(),
        )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_squeezed"], r["cleaned_md5"])
        for r in squeeze_repeated_lines(df).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1", "s2"]),
            st.lists(
                st.sampled_from(["the", "und", "der", "les", "cat", "dog", "que"]),
                min_size=0,
                max_size=8,
            ),
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=8, deadline=None)
def test_language_mix_matches_python_model(docs):
    """Differential fuzz for q94: per-(source, lang) doc/token counts and
    within-source shares against a pure-Python replica of the marker
    heuristic (argmax with en>de>fr>es tie priority, 'und' on no hits)."""
    from jsonify2ai_spark.operators.textstats import _LANG_MARKERS, language_mix_report

    spark = _spark_session()
    rows = [(i, " ".join(toks), src) for i, (src, toks) in enumerate(docs)]

    def lang_of(toks):
        counts = {
            lang: sum(1 for t in toks if t.lower() in ms)
            for lang, ms in _LANG_MARKERS.items()
        }
        best = max(counts.values()) if counts else 0
        if best == 0:
            return "und"
        return next(l for l in _LANG_MARKERS if counts[l] == best)

    agg: dict = {}
    for i, (src, toks) in enumerate(docs):
        # tokens() on "" yields [], on "a b" yields the words
        ntok = len(toks)
        key = (src, lang_of(toks))
        d = agg.setdefault(key, [0, 0])
        d[0] += 1
        d[1] += ntok
    totals: dict = {}
    for (src, _), (_, nt) in agg.items():
        totals[src] = totals.get(src, 0) + nt
    expected = {
        k: (v[0], v[1],
            None if totals[k[0]] == 0 else round(v[1] / totals[k[0]], 6))
        for k, v in agg.items()
    }

    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["source"], r["lang"]): (r["n_docs"], r["n_tokens"], r["token_share"])
        for r in language_mix_report(df).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.sampled_from(["plain words here", "x=1+2;", "nums 123 456", ""]),
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=8, deadline=None)
def test_tokenizer_fertility_matches_python_model(docs):
    """Differential fuzz for q99: byte/ws-token/BPE-token sums and ratios
    against a pure-Python replica of the two tokenizers."""
    import re

    from jsonify2ai_spark.operators.textstats import tokenizer_fertility_report

    spark = _spark_session()
    rows = [(i, text, src) for i, (src, text) in enumerate(docs)]
    BPE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")

    agg: dict = {}
    for _, (src, text) in enumerate(docs):
        d = agg.setdefault(src, [0, 0, 0, 0])
        d[0] += 1
        d[1] += len(text.encode())
        d[2] += len(text.strip().split()) if text.strip() else 1 if text else 0
        d[3] += len(BPE.findall(text))
    # tokens('') yields [] (size 0); whitespace-only trims to '' likewise
    expected = {}
    for src, (nd, nb, nws, nbpe) in agg.items():
        expected[src] = (
            nd, nb, nws, nbpe,
            None if nbpe == 0 else round(nb / nbpe, 4),
            None if nws == 0 else round(nbpe / nws, 4),
        )

    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["source"]: (
            r["n_docs"], r["n_bytes"], r["n_ws_tokens"], r["n_bpe_tokens"],
            r["bytes_per_bpe_token"], r["fertility"],
        )
        for r in tokenizer_fertility_report(df).collect()
    }
    assert got == expected


@given(
    st.lists(  # documents as word lists over a small alphabet: collisions
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
            min_size=0,
            max_size=14,
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=4),  # window n
)
@settings(max_examples=8, deadline=None)
def test_remove_duplicate_spans_matches_python_model(doc_words, n):
    """Differential fuzz for q106: on random small-alphabet corpora (dense
    window collisions by construction) the Spark ExactSubstr rewrite must
    reproduce a pure-Python model of the rule: token kept iff no
    >=min_df-occurrence n-window covers it."""
    from collections import Counter

    from jsonify2ai_spark.operators.dedup import remove_duplicate_spans

    spark = _spark_session()
    min_df = 2
    wins = Counter()
    for words in doc_words:
        for i in range(len(words) - n + 1):
            wins[tuple(words[i : i + n])] += 1
    hot = {w for w, c in wins.items() if c >= min_df}
    expected = {}
    for di, words in enumerate(doc_words):
        starts = [
            i for i in range(len(words) - n + 1) if tuple(words[i : i + n]) in hot
        ]
        kept = [
            w
            for p, w in enumerate(words)
            if not any(s <= p <= s + n - 1 for s in starts)
        ]
        expected[di] = (len(words), len(kept), " ".join(kept))

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(doc_words)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["text_dedup"])
        for r in remove_duplicate_spans(df, n=n, min_df=min_df).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
            min_size=0,
            max_size=14,
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=4),
)
@settings(max_examples=8, deadline=None)
def test_remove_duplicate_spans_keep_one_matches_python_model(doc_words, n):
    """Differential fuzz for the r8 keep='one' policy (Lee et al. §4.1
    all-but-one): per hot window the minimum (doc_id, pos) occurrence is
    exempt; every other occurrence's coverage is cut. Dense small-alphabet
    corpora exercise overlapping-run and intra-doc-repeat cases the
    hand-written tests can't enumerate."""
    from collections import defaultdict

    from jsonify2ai_spark.operators.dedup import remove_duplicate_spans

    spark = _spark_session()
    min_df = 2
    occ = defaultdict(list)
    for di, words in enumerate(doc_words):
        for i in range(len(words) - n + 1):
            occ[tuple(words[i : i + n])].append((di, i))
    losers = defaultdict(set)  # doc -> non-winner hot starts
    for w, ps in occ.items():
        if len(ps) >= min_df:
            for di, i in sorted(ps)[1:]:
                losers[di].add(i)
    expected = {}
    for di, words in enumerate(doc_words):
        starts = sorted(losers.get(di, ()))
        kept = [
            w
            for p, w in enumerate(words)
            if not any(s <= p <= s + n - 1 for s in starts)
        ]
        expected[di] = (len(words), len(kept), " ".join(kept))

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(doc_words)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["text_dedup"])
        for r in remove_duplicate_spans(
            df, n=n, min_df=min_df, keep="one"
        ).collect()
    }
    assert got == expected


@given(
    st.lists(  # docs as (line-count, bad-word positions) over a tiny lexicon
        st.lists(
            st.lists(
                st.sampled_from(["alpha", "beta", "bad0001", "bad0042", "gamma"]),
                min_size=0,
                max_size=6,
            ),
            min_size=0,
            max_size=5,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=6, deadline=None)
def test_blocklist_line_join_form_matches_literal_on_random_corpora(doc_lines):
    """Differential fuzz for the r8 line-scope join form: on random
    line/token layouts (empty lines, all-bad docs, token-less lines) the
    broadcast-join membership path must equal the literal-array scan
    row-for-row — the hand-written parity test can't enumerate these."""
    import jsonify2ai_spark.operators.textstats as ts

    spark = _spark_session()
    docs = spark.createDataFrame(
        [(i, "\n".join(" ".join(ws) for ws in lines)) for i, lines in enumerate(doc_lines)],
        "doc_id long, text string",
    )
    words = [f"bad{i:04d}" for i in range(2100)]  # > join threshold
    joined = sorted(
        tuple(r) for r in ts.blocklist_filter(docs, words, scope="line").collect()
    )
    old = ts._BLOCKLIST_JOIN_THRESHOLD
    ts._BLOCKLIST_JOIN_THRESHOLD = 10**9
    try:
        literal = sorted(
            tuple(r)
            for r in ts.blocklist_filter(docs, words, scope="line").collect()
        )
    finally:
        ts._BLOCKLIST_JOIN_THRESHOLD = old
    assert joined == literal


@given(
    st.lists(
        st.sampled_from(
            [
                "plain",
                "x",
                "\u00e2\u20ac\u2122",  # smart-apostrophe mojibake
                "\u00c3\u00a9",          # e-acute mojibake
                "\u00e2\u20ac",          # bare prefix (cascade fuel)
                "\u00e2\u20ac\u0153",  # left-quote mojibake
                " ",
            ]
        ),
        min_size=0,
        max_size=10,
    )
)
@settings(max_examples=10, deadline=None)
def test_fix_mojibake_matches_python_model(pieces):
    """Differential fuzz for the r8 progressive repair counts: a pure-
    Python sequential replace model (count on the text each rule actually
    sees) must match the Spark expression on adversarial concatenations —
    including cascades where one rule's output completes a later rule's
    pattern."""
    from jsonify2ai_spark.operators.textstats import MOJIBAKE_RULES, fix_mojibake

    text = "".join(pieces)
    cur, n = text, 0
    for bad, good in MOJIBAKE_RULES:
        n += cur.count(bad)
        cur = cur.replace(bad, good)

    spark = _spark_session()
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    (row,) = fix_mojibake(df).collect()
    assert row["text_fixed"] == cur and row["n_fixed"] == n, (text, cur, n)


@given(
    st.lists(  # per-doc token arrays over a small shared alphabet
        st.lists(st.sampled_from(["a", "bb", "ccc", "d", "ee", "zz"]), max_size=12),
        min_size=1,
        max_size=8,
    ),
    st.lists(  # vocab subset of the alphabet (may miss tokens -> OOV)
        st.sampled_from(["a", "bb", "ccc", "d", "ee"]),
        unique=True,
        min_size=1,
        max_size=5,
    ),
    st.sampled_from(["drop", 0]),
)
@settings(max_examples=8, deadline=None)
def test_tokens_to_ids_matches_python_model(doc_toks, vocab_toks, policy):
    """Differential fuzz for q116: on random token arrays and a random
    partial vocab, both tokens_to_ids impls (broadcast-dict Arrow udf and
    broadcast-join + positional reassembly) must reproduce the pure-
    Python model for drop and <unk>-substitute policies — order
    preserved, OOV handled, empty arrays empty."""
    from jsonify2ai_spark.operators.bpe import tokens_to_ids

    spark = _spark_session()
    vocab_rows = [(t, i + 1) for i, t in enumerate(sorted(vocab_toks))]
    mapping = dict(vocab_rows)
    expected = {}
    for i, toks in enumerate(doc_toks):
        if policy == "drop":
            expected[i] = [mapping[t] for t in toks if t in mapping]
        else:
            expected[i] = [mapping.get(t, policy) for t in toks]

    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(doc_toks)],
        "doc_id long, toks array<string>",
    )
    vocab = spark.createDataFrame(vocab_rows, "token string, token_id long")
    for impl in ("udf", "join"):
        got = {
            r["doc_id"]: r["token_ids"]
            for r in tokens_to_ids(
                df, vocab, tokens_col="toks", oov=policy, impl=impl
            ).collect()
        }
        assert got == expected, (impl, policy)


@given(
    st.lists(  # (doc ids implicit by index) random id arrays + bin labels
        st.tuples(
            st.lists(st.integers(1, 9), max_size=5),
            st.integers(0, 2),  # pack_group
            st.integers(0, 2),  # bin_idx
        ),
        min_size=1,
        max_size=10,
    ),
    st.sampled_from([None, 0]),
    st.sampled_from([None, 12]),
)
@settings(max_examples=8, deadline=None)
def test_concat_token_bins_matches_python_model(rows, eos, pad_to):
    """Differential fuzz for q117's assembly: on random (ids, group, bin)
    rows the Spark bin concatenation must reproduce the pure-Python
    model — docs in id order, optional eos after each, optional right-pad
    (never truncating), n_ids excluding padding."""
    from jsonify2ai_spark.operators.packing import concat_token_bins

    spark = _spark_session()
    data = [(i, ids, g, b) for i, (ids, g, b) in enumerate(rows)]
    expected = {}
    for i, ids, g, b in sorted(data):
        seq, nd = expected.setdefault((g, b), ([], 0))
        seq += list(ids) + ([eos] if eos is not None else [])
        expected[(g, b)] = (seq, nd + 1)
    model = {}
    for key, (seq, nd) in expected.items():
        n_ids = len(seq)
        out = list(seq)
        if pad_to is not None and len(out) < pad_to:
            out += [0] * (pad_to - len(out))
        model[key] = (nd, n_ids, out)

    df = spark.createDataFrame(
        data, "doc_id long, token_ids array<bigint>, pack_group long, bin_idx long"
    )
    got = {
        (r["pack_group"], r["bin_idx"]): (r["n_docs"], r["n_ids"], r["input_ids"])
        for r in concat_token_bins(df, eos_id=eos, pad_to=pad_to).collect()
    }
    assert got == model, (eos, pad_to)


def test_neardup_store_random_interleaving_model_convergence(spark, tmp_path):
    """Model-convergence property for the near-dup store's full
    mutation surface (r15): a SEEDED random interleaving of add_batch /
    delete_docs / compact must leave reps() equal to connected
    components over minhash_lsh_pairs of exactly the LIVE documents
    after EVERY operation — the q160 oracle contract generalized from
    one purge to arbitrary histories (including delete-then-re-add of
    the same doc id, the generation-tombstone case, and deletes of
    never-ingested ids). Deterministic: fixed seed, fixed op count."""
    import random

    from jsonify2ai_spark.operators.dedup import (
        NearDupStore,
        connected_components,
        minhash_lsh_pairs,
    )

    rng = random.Random(41)
    # a small pool of near-dup families so collisions are dense enough
    # for deletes to hit reps, bridges, and whole components
    fams = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten",
        "red orange yellow green blue indigo violet colors of light",
    ]
    cfg = dict(num_hashes=32, bands=16, shingle_n=3)
    path = str(tmp_path / "nd_prop")
    store = NearDupStore.create(spark, path, **cfg)

    def text_for(i: int) -> str:
        t = fams[i % 3]
        if i % 5 == 1:
            t = t + " extra"
        if i % 7 == 3:
            t = "prefix " + t
        # the bridge id straddles two families
        if i == 17:
            t = fams[0] + " " + fams[1]
        return t

    live: dict[int, str] = {}
    next_id = 0
    for op in range(12):
        kind = rng.choice(["add", "add", "delete", "compact"])
        if kind == "add":
            n = rng.randint(1, 6)
            batch = {}
            # mix of new ids and RE-ADDS of previously deleted ids
            for _ in range(n):
                if rng.random() < 0.3 and next_id > 0:
                    i = rng.randrange(next_id)
                    if i in live:
                        continue  # already live: add_batch ids must be new
                else:
                    i = next_id
                    next_id += 1
                batch[i] = text_for(i)
            if not batch:
                continue
            live.update(batch)
            store = store.add_batch(
                spark.createDataFrame(
                    list(batch.items()), "doc_id long, text string"
                ),
                f"op{op}",
            )
        elif kind == "delete":
            # sample from live ids plus a never-ingested id (harmless)
            pool = sorted(live) + [99999]
            victims = rng.sample(pool, min(len(pool), rng.randint(1, 4)))
            for v in victims:
                live.pop(v, None)
            store = store.delete_docs(
                spark.createDataFrame(
                    [(v,) for v in victims], "doc_id long"
                ),
                f"op{op}",
            )
        else:
            store = store.compact()

        got = {(r["node"], r["cluster_rep"]) for r in store.reps().collect()}
        if live:
            docs = spark.createDataFrame(
                list(live.items()), "doc_id long, text string"
            )
            want = {
                (r["node"], r["cluster_rep"])
                for r in connected_components(
                    minhash_lsh_pairs(docs, **cfg)
                ).collect()
            }
        else:
            want = set()
        assert got == want, (op, kind, sorted(live))

    # a fresh load at the end serves the same mapping
    re = NearDupStore.load(spark, path)
    assert {(r["node"], r["cluster_rep"]) for r in re.reps().collect()} == want
