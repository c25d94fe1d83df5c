"""Operator semantics: search, dedup, upsert idempotency, snippets, inventory."""

from __future__ import annotations

from pyspark.sql import functions as F

from jsonify2ai_spark.operators.dedup import (
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
    winnowing_fingerprints,
)
from jsonify2ai_spark.operators.inventory import documents_inventory, stats_report
from jsonify2ai_spark.operators.search import knn_brute, similarity_self_join
from jsonify2ai_spark.operators.snippets import select_snippets
from jsonify2ai_spark.operators.upsert import replace_documents


def test_knn_self_hit(spark, tables):
    emb = tables["embeddings"]
    q = emb.filter(F.col("vec_id") == 7).select("embedding").first()[0]
    top = knn_brute(emb, [float(x) for x in q], k=3).collect()
    assert top[0]["vec_id"] == 7
    assert abs(top[0]["score"] - 1.0) < 1e-6
    assert top[0]["score"] >= top[1]["score"] >= top[2]["score"]


def test_similarity_join_symmetric_free(spark, tables):
    pairs = similarity_self_join(tables["embeddings"].limit(50), -1.0).collect()
    # a < b always: no self pairs, no mirrored duplicates
    assert all(r["a"] < r["b"] for r in pairs)
    assert len(pairs) == 50 * 49 // 2


def test_lsh_candidates_cover_high_jaccard(spark, tables):
    docs = tables["documents"]
    exact = {
        (r["a"], r["b"])
        for r in ngram_jaccard_pairs(docs, 0.8).collect()
    }
    cand = {(r["a"], r["b"]) for r in minhash_lsh_pairs(docs, num_hashes=64, bands=16).collect()}
    # banding at 64/16 (r=4): P(candidate) = 1-(1-s^4)^16 > 0.99 for s >= 0.8
    missed = exact - cand
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_simhash_near_dup_property(spark):
    base = "the quick brown fox jumps over the lazy dog " * 10
    variant = base.replace("lazy", "sleepy", 1)
    other = "completely different content about spark query engines and shuffles"
    df = spark.createDataFrame(
        [(1, base), (2, variant), (3, other)], ["doc_id", "text"]
    )
    fp = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(fp[1], fp[2]) < ham(fp[1], fp[3])
    assert ham(fp[1], fp[2]) <= 6


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "same  text"), (2, "same text"), (3, "unique")], ["doc_id", "text"]
    )
    groups = {r["keeper_id"]: r["n_docs"] for r in exact_dup_groups(df).collect()}
    # whitespace-normalized before hashing: 1 and 2 collapse
    assert groups == {1: 2, 3: 1}


def test_replace_documents_idempotent(spark):
    """The reference's flagship golden: ingest twice -> identical table
    (docs/invariants.md:12-18, smoke_golden.py re-ingest check)."""
    existing = spark.createDataFrame(
        [("d1", 0, "old0"), ("d1", 1, "old1"), ("d2", 0, "keep")],
        ["document_id", "idx", "text"],
    )
    incoming = spark.createDataFrame(
        [("d1", 0, "new0"), ("d1", 0, "dup-dropped"), ("d1", 1, "new1")],
        ["document_id", "idx", "text"],
    )
    once = replace_documents(existing, incoming)
    twice = replace_documents(once, incoming)
    snap = lambda df: sorted((r["document_id"], r["idx"], r["text"]) for r in df.collect())
    s1, s2 = snap(once), snap(twice)
    assert s1 == s2, "re-ingest must converge"
    d1 = [t for t in s1 if t[0] == "d1"]
    assert [t[2] for t in d1] == ["new0", "new1"]  # replaced, batch-dedup kept first
    assert ("d2", 0, "keep") in s1


def test_select_snippets_caps(spark):
    rows = [(i, 0.9 - i * 0.05, "x" * 3000) for i in range(12)]
    hits = spark.createDataFrame(rows, ["id", "score", "text"])
    out = select_snippets(hits).collect()
    # clip at 2000 chars, total 8000 -> 4 snippets max here, cap 5
    assert 0 < len(out) <= 5
    assert all(len(r["snippet"]) <= 2000 for r in out)
    assert max(r["cum_chars"] for r in out) <= 8000
    # low scores dropped
    low = spark.createDataFrame([(1, 0.1, "t")], ["id", "score", "text"])
    assert select_snippets(low).count() == 0


def test_documents_inventory(spark):
    chunks = spark.createDataFrame(
        [("d2", "text", "a.md"), ("d2", "pdf", "b.pdf"), ("d1", "text", "a.md")],
        ["document_id", "kind", "path"],
    )
    rows = documents_inventory(chunks).collect()
    assert [r["document_id"] for r in rows] == ["d2", "d1"]  # desc order
    d2 = rows[0]
    assert d2["kinds"] == "pdf,text" and d2["n_chunks"] == 2


def test_minhash_arrow_matches_expr(spark, tables):
    """The vectorized Arrow signature path must be bit-identical to the
    pure-Column implementation (same md5 -> permutation math)."""
    docs = tables["documents"].limit(40)
    a = {r["doc_id"]: r["signature"] for r in minhash_signatures(docs, impl="arrow").collect()}
    b = {r["doc_id"]: r["signature"] for r in minhash_signatures(docs, impl="expr").collect()}
    assert a == b


def test_similarity_blas_matches_expr(spark, tables):
    emb = tables["embeddings"].limit(60)
    blas = {(r["a"], r["b"]): r["score"] for r in similarity_self_join(emb, 0.4).collect()}
    expr = {
        (r["a"], r["b"]): r["score"]
        for r in similarity_self_join(emb, 0.4, strategy="expr").collect()
    }
    assert blas == expr


def test_similarity_unrolled_dot_matches_fold(spark, tables):
    """The r15 ``dim=`` unrolled per-pair dot (codegen'd F.get chain)
    must be BIT-identical to the interpreted zip_with+aggregate fold —
    same left-to-right fp addition order is the whole contract. Raw
    (unrounded) scores compared, blocked and unblocked, plus the
    ragged-row NULL-propagation edge (ONE vector shorter than dim: its
    pairs score NULL and drop, exactly like the fold zipping it against
    a full-length partner — the only ragged shape a validated store can
    present)."""
    from pyspark.sql import functions as F

    emb = tables["embeddings"].limit(60)
    d = len(emb.select("embedding").first()[0])
    for kw in ({}, {"block_col": "_blk"}):
        e = emb.withColumn("_blk", F.col("vec_id") % 3) if kw else emb
        fold = {
            (r["a"], r["b"]): r["score"]
            for r in similarity_self_join(
                e, 0.4, strategy="expr", round_to=None, **kw
            ).collect()
        }
        unrolled = {
            (r["a"], r["b"]): r["score"]
            for r in similarity_self_join(
                e, 0.4, strategy="expr", round_to=None, dim=d, **kw
            ).collect()
        }
        assert unrolled == fold and fold

    one_short = emb.agg(F.min("vec_id")).first()[0]
    ragged = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == one_short, F.slice("embedding", 1, d - 2))
        .otherwise(F.col("embedding")),
    )
    fold_r = {
        (r["a"], r["b"])
        for r in similarity_self_join(ragged, 0.0, strategy="expr").collect()
    }
    unr_r = {
        (r["a"], r["b"])
        for r in similarity_self_join(
            ragged, 0.0, strategy="expr", dim=d
        ).collect()
    }
    assert unr_r == fold_r


def test_jaccard_prefix_filter_exact(spark, tables):
    """Prefix filtering must be EXACT (candidate-completeness theorem) —
    identical pairs and scores to the full posting join at any threshold."""
    docs = tables["documents"]
    for t in (0.3, 0.5, 0.8):
        full = {
            (r["a"], r["b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, t).collect()
        }
        pf = {
            (r["a"], r["b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, t, prefix_filter=True).collect()
        }
        assert pf == full, f"t={t}: prefix={len(pf)} full={len(full)}"


def test_jaccard_df_cap_preserves_results(spark, tables):
    """At the q17 operating point (t=0.4), capping shingle document frequency
    must not change the result set: scores are verified against full sets, so
    only pairs sharing NOTHING but ubiquitous shingles could drop — and no
    such pair qualifies at near-dup thresholds on this corpus. Also checks a
    tight cap actually removes hot shingles from candidate generation."""
    docs = tables["documents"]
    full = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, 0.4).collect()
    }
    for cap in (20, 100):
        capped = {
            (r["a"], r["b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, 0.4, df_cap=cap).collect()
        }
        assert capped == full, f"cap={cap}: {len(capped)} vs {len(full)}"


def test_jaccard_df_cap_on_skewed_boilerplate(spark):
    """Constructed skew: many documents share one boilerplate sentence whose
    shingles would contribute O(d^2) join rows. A cap below that df must (a)
    actually drop those shingles from candidate generation and (b) still
    return the exact pair set, because near-dup pairs share non-boilerplate
    shingles that survive."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.dedup import shingle_hash_sets

    boiler = "this message is confidential please do not distribute "
    rows = [(f"d{i:03d}", boiler + f"unique body text number {i} with extra words {i * 7}")
            for i in range(40)]
    rows += [("dup_a", boiler + "the same body appears twice here exactly"),
             ("dup_b", boiler + "the same body appears twice here exactly")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    cap = 10
    ex = shingle_hash_sets(docs).select(F.explode("hs").alias("sh"))
    n_hot = ex.groupBy("sh").count().filter(F.col("count") > cap).count()
    assert n_hot > 0  # the boilerplate shingles really exceed the cap

    # 0.8: boilerplate-only overlap (~0.58 between distinct bodies) does not
    # qualify, so the exact result is reachable through cold shingles alone —
    # the regime the df-cap is designed for. (At thresholds low enough that
    # boilerplate alone qualifies a pair, the cap's documented loss case is
    # real and intended.)
    full = {(r["a"], r["b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, 0.8).collect()}
    capped = {(r["a"], r["b"]): r["jaccard"]
              for r in ngram_jaccard_pairs(docs, 0.8, df_cap=cap).collect()}
    assert ("dup_a", "dup_b") in capped
    assert capped == full


def test_simhash_arrow_matches_expr(spark, tables):
    docs = tables["documents"].limit(40)
    a = {r["doc_id"]: r["simhash"] for r in simhash(docs, impl="arrow").collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash(docs, impl="expr").collect()}
    assert a == b


def test_simhash_pairs_banding_exact(spark, tables):
    """Banded candidate generation must find EVERY pair within the hamming
    bound (pigeonhole guarantee) — compare against the quadratic truth."""
    docs = tables["documents"].limit(80)
    banded = {(r["a"], r["b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=3).collect()}
    fp = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ids = sorted(fp)
    truth = {
        (a, b): bin(fp[a] ^ fp[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fp[a] ^ fp[b]).count("1") <= 3
    }
    assert banded == truth


def test_winnowing_shared_run_guarantee(spark):
    """Winnowing (SIGMOD'03): documents sharing a run of window+n-1 tokens
    share at least one fingerprint; disjoint docs share none."""
    common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (1, f"intro words {common} closing remarks"),
            (2, f"other prefix {common} different suffix"),
            (3, "completely unrelated vocabulary everywhere nothing matches at all"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: set(r["fingerprints"]) for r in winnowing_fingerprints(df).collect()}
    assert rows[1] & rows[2], "shared 10-token run must share a fingerprint"
    assert not (rows[1] & rows[3])


def test_stats_report_rollup(spark, tables):
    ev = tables["events"]
    rows = stats_report(ev, kind_col="event_type", filtered=F.col("value") > 100).collect()
    total = [r for r in rows if r["event_type"] is None][0]
    assert total["n"] == ev.count()
    assert sum(r["n"] for r in rows if r["event_type"] is not None) == total["n"]
    assert total["n_filtered"] == ev.filter(F.col("value") > 100).count()


def test_connected_components_chains_cycles_islands(spark):
    """Min-label CC over an adversarial pair graph: a 4-chain (diameter > 1
    forces multiple propagation rounds), a triangle cycle, an isolated pair,
    and out-of-order ids (rep must be the MIN id, not the first seen)."""
    from jsonify2ai_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [
            (40, 30), (30, 20), (20, 10),   # chain: rep 10
            (7, 8), (8, 9), (9, 7),          # cycle: rep 7
            (100, 101),                      # island pair: rep 100
        ],
        "a bigint, b bigint",
    )
    got = {
        r["node"]: r["cluster_rep"]
        for r in connected_components(pairs).collect()
    }
    assert got == {
        40: 10, 30: 10, 20: 10, 10: 10,
        7: 7, 8: 7, 9: 7,
        100: 100, 101: 100,
    }


def test_overlap_pairs_detects_shared_spans(spark):
    """The winnowing guarantee, cross-doc: a planted verbatim run of
    >= window+gram_n-1 tokens inside otherwise-different documents yields
    shared fingerprints (the pair is reported with its containment score);
    token-disjoint documents share nothing. Jaccard at any useful threshold
    misses this pair — the span detector is the point."""
    from jsonify2ai_spark.operators.dedup import ngram_jaccard_pairs, overlap_pairs

    run = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    docs = spark.createDataFrame(
        [
            (1, "one two three four five six seven " + run + " eight nine ten"),
            (2, run + " cats dogs birds fish mice owls foxes bears wolves"),
            (3, "totally disjoint vocabulary here nothing shared at all today"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r["a"], r["b"]): r for r in overlap_pairs(docs, min_shared=2).collect()}
    assert (1, 2) in pairs
    assert 0 < pairs[(1, 2)]["overlap"] <= 1.0
    assert all(3 not in k for k in pairs)

    # contentless docs (NULL/empty) must NOT pair with each other at
    # overlap=1.0 via the whole-text "" fallback fingerprint (review-found)
    with_blanks = docs.union(
        spark.createDataFrame(
            [(10, None), (11, ""), (12, "   ")], "doc_id long, text string"
        )
    )
    blank_pairs = overlap_pairs(with_blanks, min_shared=1).collect()
    assert all(r["a"] not in (10, 11, 12) and r["b"] not in (10, 11, 12) for r in blank_pairs)
    # the same pair is invisible to bag-of-shingles jaccard at 0.5
    jac = ngram_jaccard_pairs(docs, 0.5).collect()
    assert jac == []


def test_overlap_pairs_max_df_bounds_hot_fingerprint_skew(spark):
    """The q68 scale hazard, reproduced and bounded: 1,000 docs sharing one
    boilerplate header would emit ~499,500 boilerplate-only pairs uncapped
    (the d^2/2 hot-posting blowup); with max_df wired, the hot fingerprints
    are dropped from candidate generation, so the capped run emits ZERO
    boilerplate-only pairs — while a genuine near-dup pair (shared UNIQUE
    span, df=2 postings) survives with scores identical to the uncapped
    run (full-array verification keeps emitted scores exact)."""
    from jsonify2ai_spark.operators.dedup import overlap_pairs

    header = "terms of service apply all rights reserved by the provider inc"
    rows = [
        (i, header + f" tail{i}a tail{i}b tail{i}c tail{i}d tail{i}e tail{i}f "
                     f"tail{i}g tail{i}h tail{i}i tail{i}j")
        for i in range(1000)
    ]
    span = "unique shared passage kilo lima mike november oscar papa quebec romeo"
    rows.append((9001, span + " one ending here with extra words alpha beta"))
    rows.append((9002, span + " another different ending entirely gamma delta"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = overlap_pairs(docs, min_shared=2, max_df=10).collect()
    got = {(r["a"], r["b"]): r for r in capped}
    # the planted near-dup survives the cap...
    assert (9001, 9002) in got
    # ...and nothing else does: every boilerplate-only pair is suppressed
    assert len(got) == 1

    # exactness: the surviving pair's score equals the uncapped score
    pair_docs = docs.filter(F.col("doc_id").isin(9001, 9002))
    uncapped = {
        (r["a"], r["b"]): r
        for r in overlap_pairs(pair_docs, min_shared=2).collect()
    }
    assert got[(9001, 9002)]["n_shared"] == uncapped[(9001, 9002)]["n_shared"]
    assert got[(9001, 9002)]["overlap"] == uncapped[(9001, 9002)]["overlap"]

    # contrast on a subset small enough to run uncapped: the hot header
    # really does explode quadratically without the cap (d=100 -> 4,950
    # boilerplate pairs), which is what max_df exists to prevent
    subset = docs.filter(F.col("doc_id") < 100)
    n_uncapped = overlap_pairs(subset, min_shared=2).count()
    assert n_uncapped == 100 * 99 // 2

    # capped == uncapped identically when no posting exceeds the cap
    assert {
        (r["a"], r["b"], r["n_shared"], r["overlap"])
        for r in overlap_pairs(pair_docs, min_shared=2, max_df=10).collect()
    } == {
        (r["a"], r["b"], r["n_shared"], r["overlap"])
        for r in uncapped.values()
    }


def test_dedup_against_exact_and_lsh(spark):
    """Incremental dedup (new batch vs existing corpus): a near-copy in the
    batch is flagged, novel docs are kept, and the LSH candidate path
    verifies to the same answer as the exact bipartite join (high-similarity
    pairs sit far up the banding S-curve at 64/16)."""
    from jsonify2ai_spark.operators.dedup import dedup_against

    base = "the quick brown fox jumps over the lazy dog again and again today"
    existing = spark.createDataFrame(
        [
            (100, base),
            (101, "completely different words about spark shuffle partitions"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, base + " extra"),  # near-copy of 100 -> flagged
            (2, "an entirely novel document with its own content here"),
            (3, base),  # exact copy of 100 -> flagged
            (4, None),  # NULL text: no shingles, kept, must NOT crash
        ],
        "doc_id long, text string",
    )
    expected = {1: (1, False), 2: (0, True), 3: (1, False), 4: (0, True)}
    for method in ("exact", "lsh"):
        got = {
            r["doc_id"]: (r["n_dups"], r["kept"])
            for r in dedup_against(new, existing, 0.5, method=method).collect()
        }
        assert got == expected, (method, got)

    # empty batch and empty corpus degenerate sanely
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert dedup_against(empty, existing, 0.5).count() == 0
    all_kept = dedup_against(new, empty, 0.5).collect()
    assert len(all_kept) == 4 and all(r["kept"] for r in all_kept)

    # NULL text on the EXISTING side must not crash either (review-found:
    # the shingle kernel raised TypeError on list(None))
    with_null = existing.union(
        spark.createDataFrame([(102, None)], "doc_id long, text string")
    )
    assert dedup_against(new, with_null, 0.5).count() == 4


def test_dedup_against_lsh_differential_parity(spark):
    """The q65 100 TB path pinned (VERDICT r4 #3): on a seeded corpus of 120
    existing + 60 new docs (20 planted near-copies at shingle-jaccard ~0.85+,
    40 novel), method='lsh' must return EXACTLY method='exact' — per-doc
    n_dups and kept. At 64 hashes / 16 bands the banding S-curve puts
    jaccard>=0.8 pairs at ~1-7e-6 recall, so parity here is deterministic in
    practice; a miss means the banding or verification broke, not luck."""
    from jsonify2ai_spark.operators.dedup import dedup_against

    words = [f"tok{i}" for i in range(40)]
    existing_rows = []
    for d in range(120):
        # mutually-distinct docs: stride through the vocab so no two
        # existing docs are near-dups of each other
        toks = [words[(d * 7 + j * 3) % 40] + str(d) for j in range(30)]
        existing_rows.append((1000 + d, " ".join(toks)))
    new_rows = []
    for d in range(20):  # near-copies: drop the last 2 tokens, append one
        base = existing_rows[d * 5][1].split()
        new_rows.append((d, " ".join(base[:-2] + ["novelend"])))
    for d in range(20, 60):  # novel docs, own vocabulary
        new_rows.append((d, " ".join(f"new{d}w{j}" for j in range(25))))
    existing = spark.createDataFrame(existing_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    got_exact = {
        r["doc_id"]: (r["n_dups"], r["kept"])
        for r in dedup_against(new, existing, 0.7, method="exact").collect()
    }
    got_lsh = {
        r["doc_id"]: (r["n_dups"], r["kept"])
        for r in dedup_against(new, existing, 0.7, method="lsh").collect()
    }
    assert got_lsh == got_exact
    # sanity on the seeding itself: all 20 planted copies flagged, rest kept
    assert sum(1 for v in got_exact.values() if not v[1]) == 20


def test_lsh_bipartite_skips_contentless_rows(spark):
    """Dirty-corpus guard (advice-found): NULL/empty-text rows all minhash
    to the sentinel signature, so without the pre-band filter n_new_null x
    n_existing_null candidates emerge, verify to NULL jaccard, and are
    discarded — pure quadratic waste. The banding must emit ZERO candidates
    for contentless rows."""
    from jsonify2ai_spark.operators.dedup import _lsh_bipartite_candidates, dedup_against

    blanks = [(i, None if i % 3 == 0 else ("" if i % 3 == 1 else "   "))
              for i in range(60)]
    real = [(900, "a genuinely real document with several words inside it")]
    new = spark.createDataFrame(blanks[:30] + real, "doc_id long, text string")
    existing = spark.createDataFrame(
        [(2000 + i, t) for i, t in blanks[30:]] + [(2900, real[0][1])],
        "doc_id long, text string",
    )
    cand = _lsh_bipartite_candidates(
        new, existing, "text", "doc_id", 64, 16, 3
    ).collect()
    # the only candidate is the real near-dup pair — no blank x blank rows
    assert {(r["a"], r["b"]) for r in cand} == {(900, 2900)}
    out = {r["doc_id"]: r["kept"] for r in dedup_against(new, existing, 0.5, method="lsh").collect()}
    assert out[900] is False
    assert all(v for k, v in out.items() if k != 900)


def test_connected_components_driver_gate_parity(spark):
    """The small-graph driver union-find gate (driver_threshold, default
    100k edges) must produce exactly the distributed path's labels — same
    rows, same (node, cluster_rep) pairs, same column types."""
    from jsonify2ai_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(40, 30), (30, 20), (20, 10), (7, 8), (8, 9), (9, 7), (100, 101)],
        "a bigint, b bigint",
    )
    via_driver = connected_components(pairs)  # 7 edges < default threshold
    via_dist = connected_components(pairs, driver_threshold=0)
    assert via_driver.schema == via_dist.schema
    as_map = lambda df: {r["node"]: r["cluster_rep"] for r in df.collect()}
    assert as_map(via_driver) == as_map(via_dist)


def test_connected_components_deep_chain_logarithmic(spark):
    """A 1000-link chain has diameter 1000: plain min-label propagation
    needs 1000 rounds, the alternating large-star/small-star implementation
    must collapse it to the single rep 0 within O(log n) rounds. The round
    count is observed by capping max_iter at 20 — convergence inside the cap
    (no RuntimeWarning, correct labels) IS the logarithmic-rounds assertion."""
    import warnings

    from jsonify2ai_spark.operators.dedup import connected_components

    n = 1000
    pairs = spark.range(n).selectExpr("id as a", "id + 1 as b")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # unconverged -> fail
        got = connected_components(
            pairs, max_iter=20, driver_threshold=0
        ).collect()
    assert len(got) == n + 1
    assert all(r["cluster_rep"] == 0 for r in got)


def test_connected_components_warns_unconverged(spark):
    """ADVICE fix: exiting via max_iter without reaching the fixpoint must
    warn, not silently return wrong labels."""
    import warnings

    from jsonify2ai_spark.operators.dedup import connected_components

    pairs = spark.range(200).selectExpr("id as a", "id + 1 as b")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components(pairs, max_iter=1, driver_threshold=0).collect()
    assert any(
        issubclass(w.category, RuntimeWarning) and "rounds" in str(w.message)
        for w in caught
    )


def test_sample_to_token_budget_mixture(spark, tables):
    """Token-budget mixture sampling: kept token mass per stratum tracks
    budget * w_s (within hash-sampling noise), an under-supplied stratum
    contributes everything (fraction 1), unweighted strata are excluded,
    and the keep-set is reproducible across partitionings."""
    from jsonify2ai_spark.operators.sampling import sample_to_token_budget

    docs = tables["documents"]
    budget = 20_000
    weights = {"en": 0.6, "de": 0.4}
    kept = sample_to_token_budget(docs, budget, "lang", weights, salt="t")
    rows = kept.collect()

    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) <= {"en", "de"}  # es/fr/zh unweighted -> excluded

    for lang, target_frac in weights.items():
        got = sum(r["n_tokens"] for r in by_lang.get(lang, []))
        frac = by_lang[lang][0]["keep_fraction"]
        total = sum(
            r["n_tokens"]
            for r in docs.filter(F.col("lang") == lang)
            .select(F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"))
            .collect()
        )
        target = budget * target_frac
        if frac == 1.0:
            assert got == total  # under-supplied: everything kept
        else:
            assert 0.5 * target <= got <= 1.7 * target, (lang, got, target)

    again = sample_to_token_budget(
        docs.repartition(7), budget, "lang", weights, salt="t"
    ).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in rows)


def test_deterministic_sampling_reproducible_and_stratified(spark, tables):
    """Hash-mod sampling: identical keep-set across runs/partitionings
    (rand() would differ), fraction lands near target, per-stratum quotas
    respected, salt changes the sample."""
    from jsonify2ai_spark.operators.sampling import deterministic_sample, stratified_sample

    docs = tables["documents"]
    a = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.3, salt="s1").collect()}
    b = {r["doc_id"] for r in deterministic_sample(docs.repartition(7), "doc_id", 0.3, salt="s1").collect()}
    assert a == b and a  # same rows regardless of partitioning
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n  # near the 30% target
    c = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.3, salt="s2").collect()}
    assert c != a  # salt isolates sampling stages

    strat = stratified_sample(
        docs, "doc_id", "lang", {"en": 1.0}, default_fraction=0.0
    )
    kept_langs = {r["lang"] for r in strat.select("lang").distinct().collect()}
    assert kept_langs == {"en"}  # full en, nothing else
    assert strat.count() == docs.filter("lang = 'en'").count()


def test_weighted_interleave_stride_ratios(spark):
    """Stride mixing: in any window of the order, weight-3 strata appear ~3x
    weight-1 strata; the default path returns a SORTED frame (no global
    row_number single-reducer pass)."""
    from jsonify2ai_spark.operators.sampling import weighted_interleave

    rows = [(f"a{i}", "heavy") for i in range(300)] + [
        (f"b{i}", "light") for i in range(300)
    ]
    df = spark.createDataFrame(rows, "k string, s string")
    mixed = weighted_interleave(
        df, stratum_col="s", weights={"heavy": 3.0}, order_col="k"
    )
    assert "mix_order" not in mixed.columns  # distributed default: no ordinal
    head = [r["s"] for r in mixed.limit(120) .collect()]
    # first 120 positions: heavy ~90, light ~30 (3:1 stride)
    n_heavy = sum(1 for s in head if s == "heavy")
    assert 80 <= n_heavy <= 100, n_heavy
    # ordinal variant is contiguous 1..N
    nums = [
        r["mix_order"]
        for r in weighted_interleave(
            df, "s", {"heavy": 3.0}, "k", materialize_order=True
        ).collect()
    ]
    assert sorted(nums) == list(range(1, 601))


def test_pack_sequences_next_fit_invariants(spark):
    """Packing invariants: no bin exceeds the budget unless it holds exactly
    one oversized doc; bins within a group are contiguous from 0; docs never
    split; determinism across partitionings."""
    from jsonify2ai_spark.operators.packing import pack_sequences

    rows = [(i, sz) for i, sz in enumerate([500, 900, 700, 2500, 100, 1900, 60, 1999, 2, 3000])]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = pack_sequences(df, budget=2000, n_groups=2).collect()
    assert len(out) == len(rows)

    sizes = dict(rows)
    bins = {}
    for r in out:
        bins.setdefault((r["pack_group"], r["bin_idx"]), []).append(r["doc_id"])
    for (_, _), members in bins.items():
        total = sum(sizes[d] for d in members)
        if total > 2000:
            assert len(members) == 1 and sizes[members[0]] > 2000  # oversize doc alone
    for g in {r["pack_group"] for r in out}:
        idxs = sorted({r["bin_idx"] for r in out if r["pack_group"] == g})
        assert idxs == list(range(len(idxs)))  # contiguous bins per group

    again = pack_sequences(df.repartition(5), budget=2000, n_groups=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))  # deterministic


def test_pack_sequences_string_ids_hash_grouped(spark):
    """ADVICE fix: a string id column must hash-group, not silently produce
    `id % n` = NULL for every row (which collapsed the corpus into ONE
    sequential group — the global-order barrier the design exists to avoid)."""
    from jsonify2ai_spark.operators.packing import pack_sequences

    rows = [(f"doc-{i}", 700) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, n_chars long")
    out = pack_sequences(df, budget=2000, n_groups=8).collect()
    assert len(out) == 200
    groups = {r["pack_group"] for r in out}
    assert None not in groups
    assert len(groups) > 1  # actually spread, not one sequential fold
    assert all(0 <= g < 8 for g in groups)
    # deterministic across partitionings (hash is content-based, not random)
    again = pack_sequences(df.repartition(7), budget=2000, n_groups=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_pii_counts_and_redaction(spark):
    """PII scrub: per-kind counts and in-place redaction on a crafted text;
    clean text stays untouched with zero counts."""
    from jsonify2ai_spark.operators.pii import redact_pii, with_pii_counts

    rows = [
        (1, "mail a.user+x@ex-co.org or b@c.io, call 555-123-4567, "
            "host 10.0.3.1, ssn 123-45-6789"),
        (2, "perfectly clean text with numbers 12345 and dots. end"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii(with_pii_counts(df)).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"], out[1]["n_ssn"]) == (2, 1, 1, 1)
    assert out[1]["pii_total"] == 5
    assert out[1]["text_redacted"] == (
        "mail [EMAIL] or [EMAIL], call [PHONE], host [IPV4], ssn [SSN]"
    )
    assert out[2]["pii_total"] == 0 and out[2]["text_redacted"] == rows[1][1]


def test_repetition_stats_gopher_signals(spark):
    """Repetition quality: a degenerate doc (one word repeated) maxes both
    fractions and flags; a all-distinct doc scores low and passes."""
    from jsonify2ai_spark.operators.textstats import repetition_stats

    rows = [
        (1, ("spam " * 25).strip()),
        (2, "alpha beta gamma delta epsilon zeta"),
        (3, ("one two " * 12).strip()),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["top_word_frac"] == 1.0 and out[1]["top_bigram_frac"] == 1.0
    assert out[1]["repetitive"] is True
    # short doc: a 6-word sentence has top_bigram_frac 0.2 by construction,
    # so the min_words gate must keep it from flagging
    assert out[2]["n_distinct_words"] == 6 and out[2]["repetitive"] is False
    # "one two" bigram dominates doc 3 even though unigrams split 50/50
    assert out[3]["top_word_frac"] == 0.5
    assert out[3]["top_bigram_frac"] > 0.5 and out[3]["repetitive"] is True


def test_decontaminate_flags_ngram_overlap(spark):
    """Decontamination: docs sharing an 8-gram with the benchmark flag with
    the exact shared count; disjoint docs pass clean."""
    from jsonify2ai_spark.operators.dedup import decontaminate

    leak = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (1, f"intro text then {leak} and more trailing words here"),
            (2, "completely unrelated content with no overlap at all in any window"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, leak)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=8).collect()}
    assert out[1]["contaminated"] is True and out[1]["n_shared_ngrams"] == 3
    assert out[2]["contaminated"] is False and out[2]["n_shared_ngrams"] == 0


def test_unigram_logprob_orders_by_typicality(spark):
    """LM quality signal: a document made of corpus-common words must score
    a higher (less negative) mean log-prob than one of corpus-rare words;
    perplexity orders the other way. Deterministic across partitionings."""
    from jsonify2ai_spark.operators.textstats import unigram_logprob

    common = "the data the data the data"
    rows = [(i, common) for i in range(1, 9)]
    rows += [(9, "zyx qwv unique rare tokens only once")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert out[1]["logprob_per_token"] > out[9]["logprob_per_token"]
    assert out[1]["ppl"] < out[9]["ppl"]
    assert out[9]["n_tokens"] == 7
    again = {r["doc_id"]: r for r in unigram_logprob(df.repartition(5)).collect()}
    assert {k: (v["logprob_per_token"], v["ppl"]) for k, v in out.items()} == {
        k: (v["logprob_per_token"], v["ppl"]) for k, v in again.items()
    }


def test_repetition_stats_arrow_matches_expr(spark, tables):
    """The zero-shuffle Arrow kernel must be value-identical to the
    pure-DataFrame explode implementation over the real corpus (same token
    contract, same HALF_UP rounding, same flag)."""
    from jsonify2ai_spark.operators.textstats import repetition_stats

    docs = tables["documents"]
    a = sorted(map(tuple, repetition_stats(docs, impl="arrow").collect()))
    b = sorted(map(tuple, repetition_stats(docs, impl="expr").collect()))
    assert a == b


def test_repetition_stats_null_text_parity(spark):
    """NULL text must be dropped by BOTH impls (review finding: the Arrow
    kernel crashed on the NULL token array the expr impl silently drops)."""
    from jsonify2ai_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [(1, None), (2, "real words here " * 8), (3, "")],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, repetition_stats(df, impl="arrow").collect()))
    b = sorted(map(tuple, repetition_stats(df, impl="expr").collect()))
    assert a == b
    assert [r[0] for r in a] == [2]  # null and empty rows dropped, not crashed


def test_per_source_cap_deterministic_and_capped(spark):
    """Per-domain cap: ranks are a 1..n permutation per source, kept counts
    are min(cap, |source|), and the output is PARTITIONING-INDEPENDENT —
    the same (doc, rank) pairs from any input layout (the hash order is a
    function of the data, not the shuffle)."""
    from jsonify2ai_spark.operators.sampling import per_source_cap

    rows = [(i, f"site{i % 3}") for i in range(60)] + [(100, "rare")]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r["doc_id"]: (r["source"], r["src_rank"], r["kept"])
           for r in per_source_cap(docs, cap=5).collect()}
    assert len(out) == 61
    for src, n in (("site0", 20), ("site1", 20), ("site2", 20), ("rare", 1)):
        ranks = sorted(rk for _, (s, rk, _) in out.items() if s == src)
        assert ranks == list(range(1, n + 1)), (src, ranks)
        kept = [k for _, (s, _, k) in out.items() if s == src and k]
        assert len(kept) == min(5, n)
    out2 = {r["doc_id"]: (r["source"], r["src_rank"], r["kept"])
            for r in per_source_cap(docs.repartition(7), cap=5).collect()}
    assert out2 == out


def test_gopher_filter_rules_fire_individually(spark):
    """Each Gopher rule must fire on its designed failure mode and only
    there; contentless docs are dropped (q59 parity)."""
    from jsonify2ai_spark.operators.textstats import gopher_filter

    good = " ".join(f"word{i % 7}x{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, good),                                     # passes all
            (2, "too short to keep"),                      # ok_length fails
            (3, " ".join("a" * 30 for _ in range(25))),    # mean word len 30
            (4, " ".join(["spam spam"] * 30)),             # repetitive
            (5, None),                                     # dropped
            (6, "   "),                                    # dropped
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_filter(docs).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["keep"] and got[1]["ok_length"] and got[1]["ok_word_len"] and got[1]["ok_repetition"]
    assert not got[2]["ok_length"] and got[2]["ok_word_len"]
    assert not got[3]["ok_word_len"] and got[3]["ok_length"]
    assert not got[4]["ok_repetition"] and not got[4]["keep"]
    assert all(not got[d]["keep"] for d in (2, 3, 4))


def test_clip_to_token_budget_whole_tokens(spark):
    """Token-budget clip: whole-token truncation (never mid-token), exact
    counts, unclipped docs unchanged up to whitespace normalization,
    contentless docs dropped; the plan is map-only (no Exchange)."""
    from jsonify2ai_spark.operators.packing import clip_to_token_budget

    docs = spark.createDataFrame(
        [
            (1, "one two three four five six"),
            (2, "short doc"),
            (3, None),
            (4, "   "),
        ],
        "doc_id long, text string",
    )
    out = clip_to_token_budget(docs, budget=4)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_tokens"] == 6 and got[1]["n_kept"] == 4 and got[1]["clipped"]
    assert got[1]["clipped_text"] == "one two three four"
    assert got[2]["n_tokens"] == 2 and not got[2]["clipped"]
    assert got[2]["clipped_text"] == "short doc"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bigram_logprob_penalizes_word_soup(spark):
    """The signal bigrams add over q61's unigram model: two docs with the
    IDENTICAL token multiset — one in the corpus's habitual order, one
    shuffled — tie under a unigram LM by construction, but the shuffled one
    must show higher bigram perplexity. Also: <2-token docs are dropped."""
    from jsonify2ai_spark.operators.textstats import bigram_logprob, unigram_logprob

    phrase = "the quick brown fox jumps over the lazy dog"
    soup = "dog the over fox quick jumps lazy the brown"  # same multiset
    rows = [(i, phrase) for i in range(10)]
    rows += [(100, phrase), (101, soup), (200, "single")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uni = {r["doc_id"]: r["ppl"] for r in unigram_logprob(docs).collect()}
    assert uni[100] == uni[101]  # unigram is blind to order
    bi = {r["doc_id"]: r["ppl"] for r in bigram_logprob(docs).collect()}
    assert bi[101] > bi[100] * 2, (bi[100], bi[101])
    assert 200 not in bi  # no bigram positions
    assert 200 in uni  # but the unigram model scores it


def test_embedding_stats_exposes_ragged_and_dead_dims(spark):
    """Embedding QA: a short vector shows up as n < corpus size on the
    missing dimensions, a NULL vector contributes nothing, and a dead
    (constant-zero) dimension reads mean=stddev=0."""
    from jsonify2ai_spark.operators.inventory import embedding_stats

    rows = [
        (1, [1.0, 0.0, 0.5]),
        (2, [3.0, 0.0, 0.7]),
        (3, [5.0, 0.0]),       # ragged: missing dim 2
        (4, None),             # contributes nothing
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["dim"]: r for r in embedding_stats(emb).collect()}
    assert [got[d]["n"] for d in (0, 1, 2)] == [3, 3, 2]
    assert got[0]["mean"] == 3.0 and got[0]["vmin"] == 1.0 and got[0]["vmax"] == 5.0
    assert got[1]["mean"] == 0.0 and got[1]["stddev"] == 0.0  # dead dim
    assert got[2]["mean"] == 0.6


def test_dedup_keep_best_prefers_quality_over_min_id(spark):
    """Representative selection: within a near-dup cluster the HIGHEST
    quality member is kept (ties -> min id), not the smallest id;
    unclustered docs keep themselves as singletons."""
    from jsonify2ai_spark.operators.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (4, 10), (9, 70)],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "a long, b long")
    got = {r["doc_id"]: (r["cluster"], r["kept"]) for r in
           dedup_keep_best(docs, pairs, quality_col="n_chars").collect()}
    # cluster {1,2,3,4}: best quality 90 held by 2 and 3 -> min id 2 kept
    assert got[1] == (1, False) and got[2] == (1, True)
    assert got[3] == (1, False) and got[4] == (1, False)
    assert got[9] == (9, True)  # singleton


def test_containment_catches_snippet_inside_page(spark):
    """The asymmetric case symmetric Jaccard misses: a 5-token snippet fully
    embedded in a 60-token page has containment(A in B) = 1.0 but jaccard
    far below any near-dup threshold. The capped path must agree exactly
    with the uncapped path (caps change candidates, never scores)."""
    from jsonify2ai_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs

    snippet = "alpha beta gamma delta epsilon"
    page = snippet + " " + " ".join(f"w{i}" for i in range(55))
    docs = spark.createDataFrame(
        [(1, snippet), (2, page), (3, "totally different words here now")],
        "doc_id long, text string",
    )
    got = {(r["a"], r["b"]): r for r in containment_pairs(docs, 0.9).collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)]["containment_ab"] == 1.0  # snippet fully inside page
    assert got[(1, 2)]["containment_ba"] < 0.1
    assert ngram_jaccard_pairs(docs, 0.4).count() == 0  # jaccard is blind to it
    capped = {(r["a"], r["b"]): (r["containment_ab"], r["containment_ba"])
              for r in containment_pairs(docs, 0.9, df_cap=8).collect()}
    assert capped == {(1, 2): (got[(1, 2)]["containment_ab"],
                               got[(1, 2)]["containment_ba"])}


def test_containment_df_cap_bounds_hot_shingles(spark):
    """1k docs sharing ONE boilerplate shingle but nothing else: the capped
    path must emit zero pairs (the hot posting list is dropped from
    candidate generation; no surviving candidate verifies)."""
    from jsonify2ai_spark.operators.dedup import containment_pairs

    boiler = "terms of service apply"
    docs = spark.createDataFrame(
        [(i, f"{boiler} u{i}a u{i}b u{i}c u{i}d") for i in range(1000)],
        "doc_id long, text string",
    )
    assert containment_pairs(docs, 0.5, df_cap=8).count() == 0


def test_shingle_df_census_histogram(spark):
    """df histogram: 3 identical docs (all shingles df=3) + 1 unique doc
    (all shingles df=1); n_shingles per bucket = the distinct shingle count
    of the respective text."""
    from jsonify2ai_spark.operators.dedup import shingle_df_census

    same = "a b c d e f"        # 4 distinct 3-gram shingles
    other = "p q r s"           # 2 distinct 3-gram shingles
    docs = spark.createDataFrame(
        [(1, same), (2, same), (3, same), (4, other)],
        "doc_id long, text string",
    )
    got = {r["df"]: r["n_shingles"] for r in shingle_df_census(docs).collect()}
    assert got == {3: 4, 1: 2}


def test_vocab_stats_single_row(spark):
    """8 tokens, 5 types, 3 hapaxes; top-10 covers everything -> mass 1.0."""
    from jsonify2ai_spark.operators.textstats import vocab_stats

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "d e"), (3, None)],
        "doc_id long, text string",
    )
    r = vocab_stats(docs).collect()[0]
    assert r["n_tokens"] == 8 and r["vocab_size"] == 5 and r["hapax_count"] == 3
    assert r["hapax_ratio"] == 0.6 and r["topk_mass"] == 1.0
    assert r["type_token_ratio"] == 0.625


def test_vocab_stats_topk_mass_partial(spark):
    """top_k smaller than the vocab: mass = top-k counts only, ties at the
    boundary broken by token string (deterministic cross-engine)."""
    from jsonify2ai_spark.operators.textstats import vocab_stats

    # counts: x=3, y=2, z=2, w=1 -> top2 = x(3) + y(2) (y < z lexically)
    docs = spark.createDataFrame(
        [(1, "x x x y y z z w")], "doc_id long, text string"
    )
    r = vocab_stats(docs, top_k=2).collect()[0]
    assert r["topk_mass"] == 0.625  # 5/8


def test_cross_source_dup_matrix(spark):
    """Two near-identical docs from different sources -> one cross-source
    row; two from the same source -> one intra-source (a==b) row."""
    from jsonify2ai_spark.operators.dedup import cross_source_dup_matrix

    t = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, t, "mirror-a"), (2, t + " eleven", "mirror-b"),
         (3, t, "self"), (4, t + " twelve", "self"),
         (5, "unrelated content entirely different words", "solo")],
        "doc_id long, text string, source string",
    )
    got = {(r["source_a"], r["source_b"]): r["n_pairs"]
           for r in cross_source_dup_matrix(docs, 0.4).collect()}
    assert got[("mirror-a", "mirror-b")] >= 1
    assert got[("self", "self")] >= 1
    assert all("solo" not in k for k in got)


def test_length_outlier_flags_rank_semantics(spark):
    """Value-level CDF must reproduce percent_rank semantics exactly:
    pct = (#strictly shorter) / (N - 1), ties share a rank; flags cut at
    the given quantiles. 1 short outlier + 8 mid + 1 long outlier."""
    from jsonify2ai_spark.operators.textstats import length_outlier_flags

    lengths = [1] + [100] * 8 + [10000]
    docs = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lengths)], "doc_id long, n_chars long"
    )
    out = length_outlier_flags(docs, lower=0.05, upper=0.95)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[0]["pct_rank"] == 0.0 and got[0]["flag"] == "trim_low"
    assert got[9]["pct_rank"] == 1.0 and got[9]["flag"] == "trim_high"
    for i in range(1, 9):  # ties: all mid docs share (1 shorter)/9
        assert got[i]["flag"] == "keep"
        assert abs(got[i]["pct_rank"] - 1 / 9) < 1e-6


def test_length_outlier_no_corpus_wide_sort(spark):
    """Plan shape: the corpus side must see NO global single-partition sort
    — the only rangepartitioning/window sort allowed is over the tiny
    value-level aggregate, and the join back must be a broadcast."""
    from jsonify2ai_spark.operators.textstats import length_outlier_flags

    docs = spark.createDataFrame(
        [(i, (i * 37) % 500) for i in range(2000)], "doc_id long, n_chars long"
    )
    out = length_outlier_flags(docs)
    assert out.count() == 2000
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    # the corpus scan feeds the broadcast join directly: no Exchange between
    # the doc-side scan and the join (window sort touches only the agg side)
    assert "SortMergeJoin" not in plan


def test_source_quality_report_rollup(spark):
    """Per-source Gopher rollup: a clean source keeps everything, a source
    of too-short docs fails ok_length wholesale; empty-token docs vanish
    before the rollup (same contract as gopher_filter/q59)."""
    from jsonify2ai_spark.operators.textstats import source_quality_report

    good = " ".join(f"word{i}" for i in range(30))
    rows = [(i, good, "clean") for i in range(4)]
    rows += [(10 + i, "too short", "stubs") for i in range(3)]
    rows += [(20, None, "stubs")]  # no tokens -> not counted
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in source_quality_report(docs).collect()}
    assert got["clean"]["n_docs"] == 4 and got["clean"]["keep_rate"] == 1.0
    assert got["stubs"]["n_docs"] == 3  # NULL-text doc dropped
    assert got["stubs"]["n_keep"] == 0 and got["stubs"]["n_fail_length"] == 3


def test_gopher_filter_carry_cols_passthrough(spark):
    """carry_cols threads extra columns through the Arrow pass without
    changing any signal value vs the no-carry call."""
    from jsonify2ai_spark.operators.textstats import gopher_filter

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20)), "a"), (2, "tiny", "b")],
        "doc_id long, text string, source string",
    )
    plain = {r["doc_id"]: r for r in gopher_filter(docs).collect()}
    carried = {r["doc_id"]: r for r in gopher_filter(docs, carry_cols=["source"]).collect()}
    assert {r["source"] for r in carried.values()} == {"a", "b"}
    for i in plain:
        assert plain[i]["keep"] == carried[i]["keep"]
        assert plain[i]["n_words"] == carried[i]["n_words"]


def test_mixture_weights_alpha_semantics(spark):
    """alpha=1 reproduces the corpus (all weights 1); alpha=0.5 up-weights
    the tail source and down-weights the head; shares sum to 1."""
    from jsonify2ai_spark.operators.sampling import mixture_weights

    rows = [(i, " ".join(["tok"] * 90), "big") for i in range(10)]
    rows += [(100, " ".join(["tok"] * 100), "small")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    w1 = {r["source"]: r for r in mixture_weights(docs, alpha=1.0).collect()}
    assert w1["big"]["weight"] == 1.0 and w1["small"]["weight"] == 1.0
    w5 = {r["source"]: r for r in mixture_weights(docs, alpha=0.5).collect()}
    assert w5["small"]["weight"] > 1.0 > w5["big"]["weight"]
    assert abs(w5["big"]["p_target"] + w5["small"]["p_target"] - 1.0) < 1e-4
    assert w5["big"]["n_tokens"] == 900 and w5["small"]["n_tokens"] == 100


def test_label_coherence_separates_tight_from_noise(spark):
    """A tight label (identical vectors) reads mean cosine 1.0; a label of
    orthogonal one-hot vectors reads far lower; NULL vectors are skipped."""
    from jsonify2ai_spark.operators.inventory import label_coherence

    tight = [(i, [1.0, 2.0, 3.0, 4.0], 0) for i in range(5)]
    noise = [(10 + d, [1.0 if j == d else 0.0 for j in range(4)], 1) for d in range(4)]
    rows = tight + noise + [(99, None, 1)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = {r["label"]: r for r in label_coherence(emb).collect()}
    assert got[0]["n"] == 5 and got[0]["mean_cos_to_centroid"] == 1.0
    assert got[1]["n"] == 4  # NULL skipped
    assert got[1]["mean_cos_to_centroid"] == 0.5  # one-hot vs uniform centroid
    assert got[1]["min_cos_to_centroid"] == 0.5


def test_novelty_scores_separate_unique_from_recombined(spark):
    """A unique doc scores novelty 1.0; an exact copy pair scores 0.0 (all
    shingles shared); a half-recombined doc sits strictly between."""
    from jsonify2ai_spark.operators.dedup import novelty_scores

    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, shared),
            (2, shared),                               # exact copy of 1
            (3, "fully original content nobody repeats"),
            (4, shared + " own private suffix tokens"),  # recombination
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in novelty_scores(docs).collect()}
    assert got[1]["novelty"] == 0.0 and got[2]["novelty"] == 0.0
    assert got[3]["novelty"] == 1.0
    assert 0.0 < got[4]["novelty"] < 1.0
    assert got[3]["n_shingles"] == got[3]["n_novel"]


def test_boilerplate_catalog_per_source_topk(spark):
    """The catalog surfaces each source's hottest shingle as a readable
    string, ranked by in-source df with gram-string tie-break; df=1 noise
    is dropped by min_df."""
    from jsonify2ai_spark.operators.dedup import boilerplate_catalog

    footer = "all rights reserved"
    rows = [(i, f"unique{i} content{i} {footer}", "siteA") for i in range(4)]
    rows += [(10 + i, f"fresh{i} words{i} only", "siteB") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = boilerplate_catalog(docs, top_k=3, min_df=2).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r)
    a_top = sorted(by_src["siteA"], key=lambda r: r["rank"])[0]
    assert a_top["gram"] == footer and a_top["df"] == 4
    assert "siteB" not in by_src  # no shingle repeats within siteB


def test_token_length_histogram_buckets(spark):
    """Docs of 1, 2, 3, 9 tokens land in [1,1], [2,3], [2,3], [8,15];
    counts and token mass add up; NULL text contributes nothing."""
    from jsonify2ai_spark.operators.textstats import token_length_histogram

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a b"), (3, "a b c"), (4, " ".join("x" * 1 for _ in range(9))),
         (5, None)],
        "doc_id long, text string",
    )
    got = {(r["bucket_lo"], r["bucket_hi"]): r for r in token_length_histogram(docs).collect()}
    assert got[(1, 1)]["n_docs"] == 1 and got[(1, 1)]["total_tokens"] == 1
    assert got[(2, 3)]["n_docs"] == 2 and got[(2, 3)]["total_tokens"] == 5
    assert got[(8, 15)]["n_docs"] == 1 and got[(8, 15)]["total_tokens"] == 9
    assert sum(r["n_docs"] for r in got.values()) == 4


def test_corpus_diff_statuses(spark):
    """added/removed/changed/unchanged per id; whitespace-only rewrites
    count as unchanged (content identity, not byte identity)."""
    from jsonify2ai_spark.operators.inventory import corpus_diff

    old = spark.createDataFrame(
        [(1, "stays the same"), (2, "will change"), (3, "will vanish"),
         (4, "spacing   here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "stays the same"), (2, "has changed"), (5, "brand new"),
         (4, "spacing here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   5: "added", 4: "unchanged"}


def test_syndication_matrix_direction(spark):
    """A snippet fully contained in another source's page yields exactly
    the (snippet_source -> container_source) edge, never the reverse;
    near-equal pairs emit both directions."""
    from jsonify2ai_spark.operators.dedup import syndication_matrix

    snippet = "alpha beta gamma delta epsilon"
    page = snippet + " " + " ".join(f"w{i}" for i in range(55))
    mirror_a = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, snippet, "feed"), (2, page, "aggregator"),
         (3, mirror_a, "m1"), (4, mirror_a, "m2")],
        "doc_id long, text string, source string",
    )
    got = {(r["source_contained"], r["source_container"]): r["n_pairs"]
           for r in syndication_matrix(docs, 0.9).collect()}
    assert got.get(("feed", "aggregator")) == 1
    assert ("aggregator", "feed") not in got  # page not contained in snippet
    assert got.get(("m1", "m2")) == 1 and got.get(("m2", "m1")) == 1  # mutual


def test_embedding_drift_detects_shift_and_churn(spark):
    """An unshifted label reads centroid_cos 1.0 and norm delta ~0; a
    uniformly shifted label reads cos < 1.0 with a positive norm delta;
    member churn shows in n_old vs n_new."""
    from jsonify2ai_spark.operators.inventory import embedding_drift

    old = spark.createDataFrame(
        [(i, [1.0, 0.0, 1.0], 0) for i in range(4)]
        + [(10 + i, [0.0, 1.0, 0.0], 1) for i in range(3)],
        "vec_id long, embedding array<double>, label int",
    )
    new = spark.createDataFrame(
        [(i, [1.0, 0.0, 1.0], 0) for i in range(3)]          # one member dropped
        + [(10 + i, [0.5, 1.5, 0.5], 1) for i in range(3)],  # +0.5 shift
        "vec_id long, embedding array<double>, label int",
    )
    got = {r["label"]: r for r in embedding_drift(old, new).collect()}
    assert got[0]["centroid_cos"] == 1.0 and got[0]["mean_norm_delta"] == 0.0
    assert got[0]["n_old"] == 4 and got[0]["n_new"] == 3
    assert got[1]["centroid_cos"] < 1.0 and got[1]["mean_norm_delta"] > 0


def test_dedup_impact_report_counts_dropped_not_kept(spark):
    """3-copy group + singleton: 2 docs dropped; dropped tokens/chars are
    the NON-keeper copies' (keeper = min id, which here is the short
    variant — so the report must subtract the keeper's size, not the
    min size or an average)."""
    from jsonify2ai_spark.operators.dedup import dedup_impact_report

    docs = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here"), (3, "same text here"),
         (9, "unique content")],
        "doc_id long, text string",
    )
    r = dedup_impact_report(docs).collect()[0]
    assert r["n_groups"] == 2 and r["n_dup_groups"] == 1
    assert r["n_docs"] == 4 and r["n_docs_dropped"] == 2
    assert r["n_tokens_dropped"] == 6  # 2 dropped copies x 3 tokens
    assert r["n_chars_dropped"] == 28  # 2 x 14 chars


def test_containment_matches_bruteforce_fuzz(spark):
    """Differential fuzz: containment_pairs (posting join) must equal the
    brute-force O(n^2) Python reference on randomized corpora — both the
    pair set and both direction scores (6dp)."""
    import random

    from jsonify2ai_spark.operators.dedup import containment_pairs

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(3):
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25))))
            for i in range(18)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r["a"], r["b"]): (r["containment_ab"], r["containment_ba"])
            for r in containment_pairs(df, 0.6).collect()
        }

        def sh(text):
            toks = text.split()
            if len(toks) < 3:
                return {" ".join(toks)}
            return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

        want = {}
        for i, (ida, ta) in enumerate(docs):
            for idb, tb in docs[i + 1:]:
                A, B = sh(ta), sh(tb)
                c = len(A & B)
                cab, cba = c / len(A), c / len(B)
                if cab >= 0.6 or cba >= 0.6:
                    want[(ida, idb)] = (round(cab, 6), round(cba, 6))
        assert got == want, (trial, got, want)


def test_corpus_divergence_semantics(spark):
    """Identical corpora read ~0 JS (smoothing-only residue); a fully
    disjoint-vocabulary v2 reads near the ln(2) ceiling; a mild rewrite
    sits strictly between; symmetric in its arguments."""
    import math

    from jsonify2ai_spark.operators.textstats import corpus_divergence

    # counts must dominate the Laplace alpha for the asymptotic readings,
    # so every token appears 50x
    def corpus(*toks):
        return spark.createDataFrame(
            [(i, " ".join([t] * 50)) for i, t in enumerate(toks)],
            "doc_id long, text string",
        )

    a = corpus("alpha", "beta", "gamma", "delta")
    same = corpus_divergence(a, a).collect()[0]
    assert same["js_divergence"] == 0.0
    assert same["n_tokens_old"] == same["n_tokens_new"] == 200

    disjoint = corpus("uno", "dos", "tres", "cuatro")
    far = corpus_divergence(a, disjoint).collect()[0]["js_divergence"]
    assert far > 0.5  # near the ln(2) ~ 0.693 ceiling

    mild = corpus("alpha", "beta", "gamma", "NEW")
    mid = corpus_divergence(a, mild).collect()[0]["js_divergence"]
    assert 0.0 < mid < far
    # symmetry
    assert corpus_divergence(mild, a).collect()[0]["js_divergence"] == mid


def test_length_outlier_and_vocab_stats_degenerate_corpora(spark):
    """ANSI-mode edge cases (crash-found): a one-document corpus must not
    divide by N-1==0 (singleton reads mid-rank 0.5, kept); an empty corpus
    must not divide by vocab_size==0 (ratios NULL, counts 0/NULL)."""
    from jsonify2ai_spark.operators.textstats import (
        length_outlier_flags,
        vocab_stats,
    )

    one = spark.createDataFrame([(1, 5)], "doc_id long, n_chars long")
    r = length_outlier_flags(one).collect()
    assert len(r) == 1 and r[0]["flag"] == "keep" and r[0]["pct_rank"] == 0.5

    empty = spark.createDataFrame([], "doc_id long, text string")
    v = vocab_stats(empty).collect()[0]
    assert v["vocab_size"] == 0 and v["hapax_ratio"] is None


def test_label_qa_zero_norm_vectors_null_not_crash(spark):
    """ANSI-mode edge (crash-found): an all-zero vector must read NULL
    cosine (the functions.vectors contract), not raise DIVIDE_BY_ZERO —
    in both label_coherence and embedding_drift."""
    from jsonify2ai_spark.operators.inventory import embedding_drift, label_coherence

    z = spark.createDataFrame(
        [(1, [0.0, 0.0], 0), (2, [1.0, 1.0], 1), (3, [1.0, 1.0], 1)],
        "vec_id long, embedding array<double>, label int",
    )
    coh = {r["label"]: r for r in label_coherence(z).collect()}
    assert coh[0]["mean_cos_to_centroid"] is None  # zero member AND centroid
    assert coh[1]["mean_cos_to_centroid"] == 1.0
    drift = {r["label"]: r for r in embedding_drift(z, z).collect()}
    assert drift[0]["centroid_cos"] is None and drift[1]["centroid_cos"] == 1.0


def test_stable_avg_is_partitioning_invariant_and_exact(spark):
    """The r5 q89 driver flake: F.avg sums doubles in partition-arrival
    order, so two runs can land on opposite sides of a round(x, 4)
    boundary. _stable_avg must (a) return the SAME bits under any
    partitioning/ordering and (b) equal the exact (arbitrary-precision)
    mean rounded once to double — on a magnitude mix (1e3 vs 1e-9) chosen
    so a float left-fold IS order-sensitive."""
    import decimal

    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.inventory import _stable_avg

    vals = [1000.0 + i for i in range(50)] + [1e-9 * (i + 1) for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    outs = set()
    for arranged in (
        df.repartition(1),
        df.repartition(32),
        df.sort(F.col("x").desc()).repartition(7),
        df.sort("x").coalesce(2),
    ):
        (got,) = arranged.agg(_stable_avg(F.col("x")).alias("m")).collect()
        outs.add(got["m"].hex())  # bit-exact, not approx, equality
    assert len(outs) == 1, f"mean moved with partitioning: {outs}"
    with decimal.localcontext() as ctx:
        ctx.prec = 60
        exact = sum(
            decimal.Decimal(v).quantize(decimal.Decimal(1).scaleb(-18))
            for v in vals
        ) / len(vals)
    (got,) = df.agg(_stable_avg(F.col("x")).alias("m")).collect()
    assert abs(got["m"] - float(exact)) <= abs(float(exact)) * 2**-50


def test_embedding_drift_output_is_partitioning_invariant(spark):
    """End-to-end q89 regression: the drift table (rounded at 4dp) must be
    IDENTICAL across shuffle layouts — pseudo-random O(1) embeddings,
    enough rows that avg-reassociation noise would be live."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.inventory import embedding_drift

    import math

    rows = [
        (i, [math.sin(i * 13 + d) * 0.7 for d in range(8)], i % 4)
        for i in range(400)
    ]
    base = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    new = base.filter(F.col("vec_id") % 9 != 0)
    results = set()
    for old_v, new_v in (
        (base.repartition(1), new.repartition(1)),
        (base.repartition(32), new.sort(F.col("vec_id").desc())),
        (base.sort(F.col("vec_id").desc()).coalesce(3), new.repartition(17)),
    ):
        got = tuple(
            sorted(tuple(r) for r in embedding_drift(old_v, new_v).collect())
        )
        results.add(got)
    assert len(results) == 1, "drift table moved with partitioning"


def test_rounded_zero_cells_are_positive_zero_on_both_engines(spark):
    """The r6 q89 driver red: a tiny-negative delta rounds to ZERO on both
    engines, but DuckDB's round() preserves the sign (-0.0) while Spark's
    (BigDecimal HALF_UP) drops it (+0.0). Python == cannot see the
    difference; the driver's byte-level hash can. Pin the canonicalization
    (round + 0.0) to emit POSITIVE zero on both engines, via the sign bit
    (math.copysign), at every rounded site that can straddle zero."""
    import math

    import duckdb
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.inventory import _round_z, embedding_drift

    # unit level: _round_z canonicalizes, plain round would not need to
    (row,) = (
        spark.range(1)
        .select(
            _round_z(F.lit(-1e-9), 4).alias("z"),
            _round_z(F.lit(-0.12344999), 4).alias("neg"),
            _round_z(F.lit(None).cast("double"), 4).alias("nul"),
        )
        .collect()
    )
    assert math.copysign(1.0, row["z"]) == 1.0 and repr(row["z"]) == "0.0"
    assert row["neg"] == -0.1234  # exact no-op on nonzero values
    assert row["nul"] is None  # NULL survives the + 0.0

    # oracle side: DuckDB's bare round keeps -0.0; + 0.0 canonicalizes it
    raw, canon = duckdb.sql(
        "SELECT round(-1e-9, 4), round(-1e-9, 4) + 0.0"
    ).fetchone()
    assert math.copysign(1.0, raw) == -1.0, "DuckDB round() stopped signing zeros"
    assert math.copysign(1.0, canon) == 1.0 and repr(canon) == "0.0"

    # end to end: drift over an UNCHANGED corpus — mean_norm_delta is the
    # exactly-cancelling case the driver hashed red in r5/r6
    base = spark.createDataFrame(
        [(i, [math.sin(i * 7 + d) for d in range(4)], i % 3) for i in range(60)],
        "vec_id long, embedding array<double>, label int",
    )
    for r in embedding_drift(base, base).collect():
        for c in ("centroid_cos", "mean_norm_delta"):
            if r[c] is not None and r[c] == 0.0:
                assert math.copysign(1.0, r[c]) == 1.0, f"{c} emitted -0.0"
        assert r["mean_norm_delta"] == 0.0


def test_mixture_weights_degenerate_sources_null_not_nan(spark):
    """An all-empty source must read NULL weight (0/0 is undefined), never
    NaN or an ANSI divide error; an all-empty CORPUS (N=0, Z=0) must be
    all-NULL rows. The NULL-not-NaN contract of the other operators."""
    from jsonify2ai_spark.operators.sampling import mixture_weights

    df = spark.createDataFrame(
        [(1, "alpha beta gamma", "a"), (2, "", "b"), (3, None, "b")],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in mixture_weights(df).collect()}
    assert got["a"]["weight"] is not None and got["a"]["weight"] > 0
    assert got["b"]["n_tokens"] == 0
    assert got["b"]["weight"] is None and got["b"]["p_target"] is not None
    empty = spark.createDataFrame([(1, "", "a")], "doc_id long, text string, source string")
    (r,) = mixture_weights(empty).collect()
    assert r["p_corpus"] is None and r["p_target"] is None and r["weight"] is None


def test_length_outlier_flags_total_over_null_lengths(spark):
    """NULL-length rows must SURVIVE (flag='no_length', NULL pct_rank) and
    must not shift the CDF of the measurable population."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.textstats import length_outlier_flags

    docs = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 100)] + [(1000, None), (1001, None)],
        "doc_id long, n_chars bigint",
    )
    out = length_outlier_flags(docs, lower=0.02, upper=0.98)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 101  # total over input
    assert rows[1000]["flag"] == "no_length" and rows[1000]["pct_rank"] is None
    # CDF unshifted by the NULLs: doc 1 is rank 0 of the 99 measured rows
    assert rows[1]["flag"] == "trim_low" and rows[1]["pct_rank"] == 0.0
    assert rows[99]["flag"] == "trim_high"
    assert rows[50]["flag"] == "keep"


def test_language_mix_report_shares(spark):
    """Per-source language mix: shares sum to 1 within a source, the
    dominant language wins the bigger share, and an all-empty source
    reads NULL share (never NaN)."""
    from jsonify2ai_spark.operators.textstats import language_mix_report

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house", "a"),
            (2, "the quick brown fox jumps to the tree", "a"),
            (3, "der hund und die katze ist hier", "a"),
            (4, "", "b"),
        ],
        "doc_id long, text string, source string",
    )
    rows = language_mix_report(df).collect()
    a = {r["lang"]: r for r in rows if r["source"] == "a"}
    assert set(a) == {"en", "de"}
    assert a["en"]["n_docs"] == 2 and a["de"]["n_docs"] == 1
    assert abs(a["en"]["token_share"] + a["de"]["token_share"] - 1.0) < 1e-9
    assert a["en"]["token_share"] > a["de"]["token_share"]
    (b,) = [r for r in rows if r["source"] == "b"]
    assert b["token_share"] is None  # 0-token source: NULL, not NaN


def test_decontaminate_normalized_catches_mangled_benchmark(spark):
    """A benchmark question that re-entered the corpus re-cased and
    re-punctuated: exact-surface 8-gram matching scores 0; the
    normalize=True rule must flag the leaked doc and leave clean docs
    alone."""
    from jsonify2ai_spark.operators.dedup import decontaminate

    leaked = "what is the capital city of france in europe exactly"
    docs = spark.createDataFrame(
        [(1, leaked), (2, "a completely unrelated document about spark plans here")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("WHAT... Is THE capital CITY, of FRANCE -- in EUROPE!! exactly",)],
        "text string",
    )
    raw = {r["doc_id"]: r["contaminated"] for r in decontaminate(docs, bench, n=8).collect()}
    norm = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(docs, bench, n=8, normalize=True).collect()
    }
    assert raw[1] is False  # surface mangling defeats the exact rule
    assert norm[1] is True and norm[2] is False


def test_decontaminate_empty_normalized_text_is_not_contamination(spark):
    """Advisor-found (r6): under normalize=True an entirely non-ASCII or
    punctuation-only text collapses to '' and shingles('') is [''] — so a
    single punctuation-only benchmark row used to flag EVERY non-ASCII
    training document as contaminated (mass false positives on
    multilingual corpora; invisible on the ASCII synthetic gate corpus).
    The '' shingle must never match; empty docs read n_shared=0."""
    from jsonify2ai_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "这是一个完全中文的训练文档，没有任何拉丁字母在里面。"),
            (2, "un document latin tout a fait ordinaire pour le test ici"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([("!!! ... ???",), ("...",)], "text string")
    out = {
        r["doc_id"]: r
        for r in decontaminate(docs, bench, n=8, normalize=True).collect()
    }
    assert len(out) == 3  # empty-normalized docs stay in the output
    for i in (1, 2, 3):
        assert out[i]["contaminated"] is False, f"doc {i} false-positived"
        assert out[i]["n_shared_ngrams"] == 0
    # and the exact-surface mode has the same guard for empty texts
    raw = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(
            docs, spark.createDataFrame([("",)], "text string"), n=8
        ).collect()
    }
    assert raw[3] is False


def test_curriculum_buckets_semantics(spark):
    """Bucket is monotone in score, ties share a bucket, NULL scores get a
    NULL bucket but stay in the output, and the shuffle key is the stable
    md5 of the id."""
    import hashlib

    from jsonify2ai_spark.operators.sampling import curriculum_buckets

    df = spark.createDataFrame(
        [(i, float(i // 10)) for i in range(100)] + [(1000, None)],
        "doc_id long, s double",
    )
    out = {r["doc_id"]: r for r in curriculum_buckets(df, score_col="s").collect()}
    assert len(out) == 101
    assert out[1000]["bucket"] is None
    # 10 distinct score values, 10 docs each -> exact deciles, ties together
    for i in range(100):
        assert out[i]["bucket"] == i // 10
    assert out[5]["shuffle_key"] == hashlib.md5(b"5").hexdigest()


def test_curriculum_buckets_no_corpus_wide_sort(spark):
    """Plan shape (same contract as length_outlier_flags): the corpus joins
    the tiny value-level CDF via broadcast — no SortMergeJoin, no
    single-partition sort of the corpus; the only window sort runs over
    the distinct-score aggregate."""
    from jsonify2ai_spark.operators.sampling import curriculum_buckets

    docs = spark.createDataFrame(
        [(i, float((i * 37) % 50) / 100.0) for i in range(2000)],
        "doc_id long, s double",
    )
    out = curriculum_buckets(docs, score_col="s")
    assert out.count() == 2000
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_language_mix_report_single_rollup_no_corpus_join(spark):
    """Plan shape: the source label and token count RIDE the Arrow lang-ID
    pass (map-only carry) — the only joins in the plan attach the
    |sources|-row totals, so no join input is corpus-sized and no
    SortMergeJoin appears."""
    from jsonify2ai_spark.operators.textstats import language_mix_report

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps", f"s{i % 4}") for i in range(2000)],
        "doc_id long, text string, source string",
    )
    out = language_mix_report(docs)
    assert out.count() == 4
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    # the corpus-sized Arrow pass must run ONCE: the totals branch reads
    # the checkpointed rollup, not a second copy of the whole subtree
    assert plan.count("MapInPandas") <= 1


def test_c4_filter_rules(spark):
    """C4 §2.2 semantics with the paper's rule scopes: the line rule needs
    >=5 words AND terminal punctuation AND no policy term (javascript /
    cookie lines are LINE removals, not page kills — advisor r6); the page
    kills (brace / lorem ipsum) and the 3-sentence floor over the CLEANED
    page each independently flip keep."""
    from jsonify2ai_spark.operators.textstats import c4_filter

    docs = spark.createDataFrame(
        [
            (1, "this is a good clean line.\nshort line.\nno punctuation here at all\nanother fine sentence right here! done."),
            (2, "curly { brace means code one two three."),
            (3, "Lorem Ipsum dolor sit amet filler page text here.\nand a second fine line right here.\nplus one more to clear the floor. done."),
            (4, "please enable JavaScript to view this.\nthis page needs more cookie consent.\nonly boilerplate lines lived here today."),
            (5, "only two sentences. here we are"),
            (6, "we use cookie banners on this site.\na real first sentence stands right here.\na real second sentence stands right here.\na real third sentence stands right here."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_filter(docs).collect()}
    assert out[1]["keep"] is True
    assert out[1]["n_lines"] == 4
    # line 1 (6 words + '.') and line 4 (>=5 words + '.') survive; the
    # 2-word line and the unpunctuated line fail
    assert out[1]["n_good_lines"] == 2 and out[1]["n_sentences"] == 3
    assert out[2]["keep"] is False and out[2]["has_brace"] is True
    assert out[3]["keep"] is False and out[3]["has_lorem"] is True
    # policy lines are dropped at LINE level: doc 4 loses its javascript
    # and cookie lines, the rest can't reach the sentence floor -> dropped
    # by the floor, not by a page kill
    assert out[4]["n_policy_lines"] == 2
    assert out[4]["n_good_lines"] == 1
    assert out[4]["keep"] is False and out[4]["n_sentences"] == 1
    # doc 5's only line has no terminal punctuation, so the CLEANED page
    # is empty: zero sentences, dropped by the floor
    assert out[5]["keep"] is False and out[5]["n_sentences"] == 0
    # a page with one cookie line and three clean sentences KEEPS the page
    # (the pre-fix document-kill wrongly dropped it)
    assert out[6]["n_policy_lines"] == 1
    assert out[6]["keep"] is True and out[6]["n_sentences"] == 3


def test_line_dedup_removes_corpus_boilerplate(spark):
    """A line repeated across > max_line_df documents vanishes from every
    doc; unique lines survive in original order; a doc that was ALL
    boilerplate keeps its row with n_kept=0."""
    import hashlib

    from jsonify2ai_spark.operators.dedup import line_dedup

    bp = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"{bp}\nunique one a\nunique one b"),
            (2, f"{bp}\nunique two"),
            (3, f"{bp}\nunique three"),
            (4, f"{bp}"),
            (5, "no boilerplate at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, max_line_df=2).collect()}
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 2
    assert out[1]["cleaned_md5"] == hashlib.md5(b"unique one a\nunique one b").hexdigest()
    assert out[4]["n_kept"] == 0
    assert out[4]["cleaned_md5"] == hashlib.md5(b"").hexdigest()
    assert out[5]["n_kept"] == 1
    assert out[5]["cleaned_md5"] == hashlib.md5(b"no boilerplate at all").hexdigest()


def test_tokenizer_fertility_report(spark):
    """Code/digit-heavy text tokenizes hotter (higher fertility = BPE
    tokens per whitespace word) than plain prose; an all-empty source
    reads NULL ratios, not NaN."""
    from jsonify2ai_spark.operators.textstats import tokenizer_fertility_report

    df = spark.createDataFrame(
        [
            (1, "plain english words here", "prose"),
            (2, "more simple clean prose text", "prose"),
            (3, "x=f(a,b)+g[17]*h{z}; y+=2", "code"),
            (4, "", "empty"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in tokenizer_fertility_report(df).collect()}
    assert out["prose"]["fertility"] == 1.0  # pure words: 1 BPE run per word
    assert out["code"]["fertility"] > 3.0  # operators split into many tokens
    assert out["code"]["bytes_per_bpe_token"] < out["prose"]["bytes_per_bpe_token"]
    assert out["empty"]["bytes_per_bpe_token"] is None
    assert out["empty"]["fertility"] is None


def test_conversation_lint_rules(spark):
    """SFT chat-structure lint: clean alternating user/assistant passes;
    doubled roles, empty turns, unknown roles, wrong endpoints, and
    single-turn conversations each independently fail keep — and a
    single-turn conversation must NOT fabricate an alternation violation
    (the Spark sequence(2, n) backwards-run edge)."""
    from jsonify2ai_spark.operators.textstats import conversation_lint

    rows = [
        # c1: clean 4-turn
        (1, 0, "user", "hi"), (1, 1, "assistant", "hello"),
        (1, 2, "user", "more"), (1, 3, "assistant", "sure"),
        # c2: doubled assistant
        (2, 0, "user", "q"), (2, 1, "assistant", "a"), (2, 2, "assistant", "a2"),
        # c3: empty turn
        (3, 0, "user", "q"), (3, 1, "assistant", "   "),
        # c4: unknown role
        (4, 0, "user", "q"), (4, 1, "tool", "result"), (4, 2, "assistant", "a"),
        # c5: ends with user
        (5, 0, "user", "q"), (5, 1, "assistant", "a"), (5, 2, "user", "again?"),
        # c6: single turn
        (6, 0, "user", "alone"),
    ]
    df = spark.createDataFrame(rows, "conv_id long, turn_idx int, role string, text string")
    out = {r["conv_id"]: r for r in conversation_lint(df).collect()}
    assert out[1]["keep"] is True and out[1]["n_user"] == 2 and out[1]["n_assistant"] == 2
    assert out[2]["keep"] is False and out[2]["alternation_violations"] == 1
    assert out[3]["keep"] is False and out[3]["n_empty"] == 1
    assert out[4]["keep"] is False and out[4]["n_bad_role"] == 1
    assert out[5]["keep"] is False and out[5]["ends_with_assistant"] is False
    assert out[6]["keep"] is False
    assert out[6]["alternation_violations"] == 0  # no fabricated violation


def test_round6_ops_total_over_null_text(spark):
    """Degenerate-input sweep for the round-6 operators: a NULL-text row
    must neither crash an Arrow kernel (lang-ID TypeError, crash-found)
    nor silently vanish (line_dedup's posexplode-of-NULL drop) — every
    operator stays total over its input with NULL/und/empty-line
    placeholders."""
    import hashlib

    from jsonify2ai_spark.operators.dedup import line_dedup
    from jsonify2ai_spark.operators.textstats import (
        c4_filter,
        language_mix_report,
        tokenizer_fertility_report,
    )

    nulls = spark.createDataFrame(
        [(1, None, "a"), (2, "the cat and the dog", "a")],
        "doc_id long, text string, source string",
    )
    mix = language_mix_report(nulls).collect()  # crashed before the fix
    got = {(r["source"], r["lang"]): r["n_docs"] for r in mix}
    assert got[("a", "und")] == 1 and got[("a", "en")] == 1

    ld = {r["doc_id"]: r for r in line_dedup(nulls).collect()}
    assert set(ld) == {1, 2}  # NULL-text doc kept, not dropped
    assert ld[1]["n_lines"] == 1
    assert ld[1]["cleaned_md5"] == hashlib.md5(b"").hexdigest()

    c4 = {r["doc_id"]: r for r in c4_filter(nulls).collect()}
    assert set(c4) == {1, 2} and c4[1]["keep"] is None  # unmeasurable, kept

    fert = tokenizer_fertility_report(nulls).collect()
    assert len(fert) == 1 and fert[0]["n_docs"] == 2


def test_squeeze_repeated_lines(spark):
    """Intra-doc consecutive-duplicate lines collapse to the first
    occurrence (trim-insensitive match, original spelling kept); alternating
    lines never squeeze; NULL text reads one empty line and stays total."""
    import hashlib

    from jsonify2ai_spark.operators.dedup import squeeze_repeated_lines

    docs = spark.createDataFrame(
        [
            (1, "menu\nmenu\nmenu\nbody text\nfooter"),
            (2, "a\nb\na\nb"),                 # alternating: nothing squeezes
            (3, "one\n  one  \ntwo"),          # trim-insensitive run
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in squeeze_repeated_lines(docs).collect()}
    assert out[1]["n_lines"] == 5 and out[1]["n_squeezed"] == 2
    assert out[1]["cleaned_md5"] == hashlib.md5(b"menu\nbody text\nfooter").hexdigest()
    assert out[2]["n_squeezed"] == 0
    assert out[3]["n_squeezed"] == 1
    assert out[3]["cleaned_md5"] == hashlib.md5(b"one\ntwo").hexdigest()
    assert out[4]["n_lines"] == 1 and out[4]["cleaned_md5"] == hashlib.md5(b"").hexdigest()


def test_build_vocab_rank_and_cut(spark):
    """Frequency-ranked ids with deterministic (count desc, token asc)
    ties, min_count cut, max_vocab cap."""
    from jsonify2ai_spark.operators.textstats import build_vocab

    docs = spark.createDataFrame(
        [(1, "b b b a a c z"), (2, "a b y")],
        "doc_id long, text string",
    )
    out = {r["token"]: r for r in build_vocab(docs, min_count=2).collect()}
    assert set(out) == {"a", "b"}  # c/z/y cut at min_count
    assert out["b"]["count"] == 4 and out["b"]["token_id"] == 1
    assert out["a"]["count"] == 3 and out["a"]["token_id"] == 2
    capped = build_vocab(docs, min_count=1, max_vocab=3).collect()
    assert len(capped) == 3
    # tie at count 1 breaks on token text: c < y < z -> c kept at id 3
    assert {r["token"] for r in capped} == {"a", "b", "c"}


def test_build_vocab_rank_is_parallel_and_layout_invariant(spark):
    """r7 rewrite of the r6-flagged single-partition rank window: ids come
    from a range-repartitioned per-partition row_number plus collected
    offsets. Must (a) assign the SAME ids under any input partitioning —
    the position in the total order is boundary-invariant — and (b) emit
    no globally-ordered (empty partitionBy) window in the plan."""
    import random

    from jsonify2ai_spark.operators.textstats import build_vocab

    random.seed(11)
    toks = [f"t{i:03d}" for i in range(40)]
    docs = spark.createDataFrame(
        [
            (i, " ".join(random.choice(toks) for _ in range(30)))
            for i in range(500)
        ],
        "doc_id long, text string",
    )
    layouts = [docs, docs.repartition(13), docs.coalesce(1)]
    results = {
        tuple(
            tuple(r) for r in build_vocab(d, min_count=1).orderBy("token_id").collect()
        )
        for d in layouts
    }
    assert len(results) == 1, "token ids moved with input partitioning"
    (rows,) = results
    assert [r[1] for r in rows] == list(range(1, len(rows) + 1))  # dense 1..V
    out = build_vocab(docs)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    for frag in plan.split("Window [")[1:]:
        spec = frag.split("windowspecdefinition(")[1]
        assert spec.startswith("_pid"), "global-sort window reappeared"


def test_extend_vocab_id_stability(spark):
    """Vocabulary evolution keeps every existing id VERBATIM while
    folding new occurrences into counts; novel tokens rank among
    themselves (count desc, token asc over the NEW corpus) and append
    strictly past max(token_id); min_count/max_new gate novel tokens
    only; rebuilding from scratch on the union corpus would scramble
    ids (pinned as the contrast that motivates the operator)."""
    from jsonify2ai_spark.operators.textstats import build_vocab, extend_vocab

    old = spark.createDataFrame(
        [(1, "b b b a a c c z")], "doc_id long, text string"
    )
    vocab = build_vocab(old, min_count=2)  # b=1(3), a=2(2), c=3(2)
    base = {r["token"]: (r["token_id"], r["count"]) for r in vocab.collect()}
    assert base == {"b": (1, 3), "a": (2, 2), "c": (3, 2)}

    new = spark.createDataFrame(
        # a surges past b globally; d and e are novel (e more frequent);
        # f appears once (cut by min_count=2 on novel tokens)
        [(2, "a a a a a d d e e e f")], "doc_id long, text string"
    )
    out = {r["token"]: (r["token_id"], r["count"])
           for r in extend_vocab(vocab, new, min_count=2).collect()}
    # frozen ids, folded counts — a outgrew b but keeps id 2
    assert out["b"] == (1, 3) and out["a"] == (2, 7) and out["c"] == (3, 2)
    # novel tokens appended past max id, ranked by new-corpus counts
    assert out["e"] == (4, 3) and out["d"] == (5, 2)
    assert "f" not in out  # novel min_count cut
    assert len(out) == 5

    # max_new caps the appended tail only
    capped = {r["token"] for r in
              extend_vocab(vocab, new, min_count=1, max_new=1).collect()}
    assert capped == {"a", "b", "c", "e"}  # e (count 3) wins the one slot

    # the contrast: a from-scratch rebuild re-ranks — a takes id 1
    rebuilt = {r["token"]: r["token_id"]
               for r in build_vocab(old.union(new), min_count=2).collect()}
    assert rebuilt["a"] == 1 and rebuilt["a"] != out["a"][0]

    # idempotent growth: extending again with an already-seen corpus
    # mints nothing new
    again = extend_vocab(
        spark.createDataFrame(
            [(t, i, c) for t, (i, c) in out.items()],
            "token string, token_id long, count long",
        ),
        new,
        min_count=2,
    )
    assert again.count() == 5
    assert {r["token_id"] for r in again.collect()} == {1, 2, 3, 4, 5}


def test_remove_duplicate_spans_exactsubstr_rule(spark):
    """Lee et al. ExactSubstr semantics: tokens covered by an n-token
    window occurring >= min_df times anywhere in the corpus are cut,
    unique content survives in order, short docs pass through untouched,
    and a doc that was ALL duplicate reads n_kept=0 with empty text (the
    row survives — total over input)."""
    from jsonify2ai_spark.operators.dedup import remove_duplicate_spans

    boiler = "all rights reserved contact us for terms of service details"
    docs = spark.createDataFrame(
        [
            (1, f"unique alpha words here {boiler} and more unique beta content"),
            (2, f"other gamma stuff {boiler} trailing delta text"),
            (3, "completely unrelated clean document content"),
            (4, "short doc"),
            (5, boiler),  # exactly the shared 10-token span, nothing else
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, n=10, min_df=2).collect()}
    assert len(out) == 5
    assert out[1]["text_dedup"] == "unique alpha words here and more unique beta content"
    assert out[2]["text_dedup"] == "other gamma stuff trailing delta text"
    assert out[3]["text_dedup"] == "completely unrelated clean document content"
    assert out[3]["n_kept"] == out[3]["n_tokens"] == 5
    assert out[4]["text_dedup"] == "short doc"  # < n tokens: no windows
    assert out[5]["n_kept"] == 0 and out[5]["text_dedup"] == ""
    # min_df above the occurrence count -> nothing is hot, all pass
    clean = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, n=10, min_df=4).collect()
    }
    assert all(clean[i]["n_kept"] == clean[i]["n_tokens"] for i in clean)


def test_train_bpe_matches_python_reference(spark):
    """Differential: the distributed BPE trainer must learn the SAME merge
    list, in the same order, as a pure-Python Sennrich-style reference
    with the identical (count desc, pair asc) tie-break — and bpe_encode
    must reproduce the reference encoding token-for-token."""
    import re
    from collections import Counter

    from jsonify2ai_spark.operators.bpe import EOW, bpe_encode, train_bpe

    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "a cat and a mat and a hat",
        "hats and mats and cats",
        "the the the hat",
    ]

    def py_train(num_merges):
        wf = Counter()
        for t in texts:
            for w in re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", t.lower()):
                wf[w] += 1
        vocab = {tuple(list(w) + [EOW]): c for w, c in wf.items()}
        merges = []
        for _ in range(num_merges):
            pc = Counter()
            for syms, c in vocab.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += c
            if not pc:
                break
            top = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if top[1] < 2:
                break
            (a, b), _ = top
            merges.append((a, b))
            new = {}
            for syms, c in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                new[tuple(out)] = new.get(tuple(out), 0) + c
            vocab = new
        return merges

    def py_encode(text, merges):
        out = []
        for w in re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", text.lower()):
            syms = list(w) + [EOW]
            for a, b in merges:
                res, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            out.extend(syms)
        return out

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    want = py_train(12)
    got = train_bpe(df, num_merges=12)
    assert got == want, (got, want)
    assert len(got) >= 8  # the corpus genuinely supports that many merges
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(df, got).select("doc_id", "bpe_tokens").collect()
    }
    for i, t in enumerate(texts):
        assert enc[i] == py_encode(t, got), (i, enc[i])
    # layout invariance: same merges from any partitioning
    assert train_bpe(df.repartition(7), num_merges=12) == want


def test_quality_classifier_separates_and_scores_maponly(spark):
    """The learned quality filter must (a) separate clearly-distinct seed
    distributions, (b) score deterministically, (c) stay map-only at
    scoring time (no Exchange in the plan), and (d) filter by threshold."""
    import random

    from jsonify2ai_spark.operators.quality_model import (
        quality_filter,
        score_quality,
        train_quality_classifier,
    )

    random.seed(5)
    goodw = ["analysis", "theorem", "method", "result", "evidence", "study"]
    badw = ["click", "buy", "cheap", "winner", "free", "subscribe"]
    mk = lambda ws: " ".join(random.choice(ws) for _ in range(30))
    good = spark.createDataFrame([(mk(goodw),) for _ in range(40)], "text string")
    bad = spark.createDataFrame([(mk(badw),) for _ in range(40)], "text string")
    model = train_quality_classifier(good, bad, dim=512)

    test = spark.createDataFrame(
        [
            (1, mk(goodw)),
            (2, mk(badw)),
            (3, None),  # NULL text must not crash the featurizer
        ],
        "doc_id long, text string",
    )
    scored = score_quality(test, model, dim=512)
    rows = {r["doc_id"]: r["quality_prob"] for r in scored.collect()}
    assert rows[1] > 0.9 and rows[2] < 0.1
    assert 0.0 <= rows[3] <= 1.0  # empty features -> intercept-only score
    # determinism
    rows2 = {r["doc_id"]: r["quality_prob"] for r in score_quality(test, model, dim=512).collect()}
    assert rows == rows2
    # scoring is map-only: no shuffle in the plan
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    kept = {r["doc_id"] for r in quality_filter(test, model, threshold=0.5, dim=512).collect()}
    assert 1 in kept and 2 not in kept


def test_unigram_logprob_reference_mode_oov_semantics(spark):
    """Cross-corpus LM scoring (CCNet): the model comes from the
    REFERENCE; target words outside the reference vocab score as count-0
    events under the reference's (N, V) instead of being dropped — a doc
    of pure OOV must score ln(alpha/(N+alpha*V)) per token, and an
    in-distribution doc must outscore an off-distribution one."""
    import math

    from jsonify2ai_spark.operators.textstats import unigram_logprob

    ref = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quiet brown bear naps under the tall tree")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [
            (10, "the brown fox naps"),          # fully in-vocab
            (11, "zzz qqq www xxx"),             # fully OOV
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_logprob(target, reference=ref).collect()}
    assert out[10]["logprob_per_token"] > out[11]["logprob_per_token"]
    # reference stats: 18 tokens, V distinct; OOV scores ln(1/(N+V))
    N = 18
    V = len({w for r in [
        "the quick brown fox jumps over the lazy dog",
        "the quiet brown bear naps under the tall tree",
    ] for w in r.split()})
    assert out[11]["logprob_per_token"] == round(math.log(1.0 / (N + V)), 4)
    assert out[11]["n_tokens"] == 4
    # self mode unchanged: every word is in its own vocab
    self_out = unigram_logprob(target).collect()
    assert all(r["logprob_per_token"] is not None for r in self_out)


def test_blocklist_filter_token_level_and_line_scope(spark):
    """C4 bad-words mechanism: whole-TOKEN matching only ('classic' must
    not trip a 'ass' entry), doc scope reports count+keep, line scope
    removes offending lines and keeps the page; NULL text stays total."""
    from jsonify2ai_spark.operators.textstats import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "a classic compass associates with glass"),  # substrings only
            (2, "this line is fine\nbuy cheap pills now\nanother clean line"),
            (3, "CHEAP shouting token here"),  # case-insensitive
            (4, None),
        ],
        "doc_id long, text string",
    )
    words = ["ass", "cheap", "pills"]
    doc = {r["doc_id"]: r for r in blocklist_filter(docs, words).collect()}
    assert doc[1]["keep"] is True and doc[1]["n_blocked_tokens"] == 0
    assert doc[2]["keep"] is False and doc[2]["n_blocked_tokens"] == 2
    assert doc[3]["keep"] is False
    assert doc[4]["keep"] is None  # NULL text: unmeasurable, kept for audit
    line = {
        r["doc_id"]: r
        for r in blocklist_filter(docs, words, scope="line").collect()
    }
    assert line[2]["text_clean"] == "this line is fine\nanother clean line"
    assert line[2]["n_lines"] == 3 and line[2]["n_kept"] == 2
    assert line[1]["text_clean"] == "a classic compass associates with glass"
    assert line[4]["text_clean"] is None and line[4]["n_lines"] is None


def test_blocklist_filter_join_form_parity(spark):
    """Above the word-count threshold the doc scope switches to the
    broadcast-join membership form — decisions and counts must match the
    literal-array form exactly, including the NULL-text and zero-hit
    contracts."""
    import jsonify2ai_spark.operators.textstats as ts

    docs = spark.createDataFrame(
        [
            (1, "clean words only in here"),
            (2, "bad0007 appears plus bad0007 again and bad0042 once"),
            (3, None),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    words = [f"bad{i:04d}" for i in range(3000)]  # > threshold
    assert len(words) > ts._BLOCKLIST_JOIN_THRESHOLD
    joined = {
        r["doc_id"]: tuple(r)[1:]
        for r in ts.blocklist_filter(docs, words).collect()
    }
    old = ts._BLOCKLIST_JOIN_THRESHOLD
    ts._BLOCKLIST_JOIN_THRESHOLD = 10**9  # force the literal-array form
    try:
        arr = {
            r["doc_id"]: tuple(r)[1:]
            for r in ts.blocklist_filter(docs, words).collect()
        }
    finally:
        ts._BLOCKLIST_JOIN_THRESHOLD = old
    assert joined == arr, (joined, arr)
    assert joined[2] == (3, False)
    assert joined[1] == (0, True) and joined[4] == (0, True)
    assert joined[3] == (None, None)


def test_remove_duplicate_spans_keep_one_policy(spark):
    """keep='one' is Lee et al. §4.1's actual rule: all-but-one occurrence
    of duplicated material is cut, the minimum (id, pos) occurrence
    survives — contiguously, because every window of one duplicated run
    elects the same earliest document. keep='none' (the default) stays
    the cut-everything rule the q106 oracle pins."""
    from jsonify2ai_spark.operators.dedup import remove_duplicate_spans

    boiler = "all rights reserved contact us for terms of service details"
    docs = spark.createDataFrame(
        [
            (1, f"unique alpha words here {boiler} and more unique beta content"),
            (2, f"other gamma stuff {boiler} trailing delta text"),
            (5, boiler),
            # intra-doc repeat: both copies lose to doc 1's earlier claim
            (6, f"{boiler} mid filler {boiler}"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, n=10, min_df=2, keep="one").collect()
    }
    # the earliest (id, pos) occurrence survives IN FULL, in place
    assert out[1]["text_dedup"] == (
        f"unique alpha words here {boiler} and more unique beta content"
    )
    assert out[1]["n_kept"] == out[1]["n_tokens"]
    # every other occurrence is cut exactly as under keep='none'
    assert out[2]["text_dedup"] == "other gamma stuff trailing delta text"
    assert out[5]["text_dedup"] == "" and out[5]["n_kept"] == 0
    assert "rights" not in out[6]["text_dedup"]
    assert "mid filler" in out[6]["text_dedup"]
    # layout invariance: winners must not move with partitioning
    for ddf in (docs.repartition(7), docs.sort(F.col("doc_id").desc())):
        again = {
            r["doc_id"]: r["text_dedup"]
            for r in remove_duplicate_spans(
                ddf, n=10, min_df=2, keep="one"
            ).collect()
        }
        assert again == {k: v["text_dedup"] for k, v in out.items()}
    # intra-doc only: first occurrence survives, second is cut
    solo = spark.createDataFrame(
        [(9, f"{boiler} bridge words join {boiler}")], "doc_id long, text string"
    )
    (r9,) = remove_duplicate_spans(solo, n=10, min_df=2, keep="one").collect()
    assert r9["text_dedup"] == f"{boiler} bridge words join"
    import pytest

    with pytest.raises(ValueError, match="keep"):
        remove_duplicate_spans(docs, keep="two")


def test_remove_duplicate_spans_max_doc_starts_cap(spark):
    """max_doc_starts bounds per-row fold state: a doc whose hot-start
    count exceeds the cap short-circuits to empty (it is near-wholly
    duplicated material), others are untouched; with keep='one' the cap
    counts POST-exemption starts so a surviving unique copy is never
    clipped."""
    from jsonify2ai_spark.operators.dedup import remove_duplicate_spans

    run = " ".join(f"w{i}" for i in range(40))  # 40-token duplicated run
    docs = spark.createDataFrame(
        [
            (1, f"keep this prefix {run}"),
            (2, f"{run} keep this suffix"),
            (3, "an unrelated clean document body entirely its own"),
        ],
        "doc_id long, text string",
    )
    # uncapped: both runs cut, unique material survives
    base = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, n=10, min_df=2).collect()
    }
    assert base[1]["text_dedup"] == "keep this prefix"
    assert base[2]["text_dedup"] == "keep this suffix"
    # cap below the ~31 hot starts per run: over-cap docs go empty,
    # the clean doc is untouched
    capped = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            docs, n=10, min_df=2, max_doc_starts=10
        ).collect()
    }
    assert capped[1]["text_dedup"] == "" and capped[1]["n_kept"] == 0
    assert capped[1]["n_tokens"] == base[1]["n_tokens"]  # true length kept
    assert capped[3]["text_dedup"] == base[3]["text_dedup"]
    # keep='one' + cap: doc 1 (winner) has ZERO post-exemption starts —
    # the cap must not clip the surviving copy
    keep1 = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            docs, n=10, min_df=2, keep="one", max_doc_starts=10
        ).collect()
    }
    assert keep1[1]["text_dedup"] == f"keep this prefix {run}"
    assert keep1[2]["text_dedup"] == "keep this suffix" or keep1[2]["text_dedup"] == ""


def test_train_bpe_merge_batching_is_exact(spark):
    """r8 (r7 verdict #3): merge_batch > 1 must learn the IDENTICAL merge
    list, in the identical order, as sequential training — the batch is
    only a round-count optimization. Includes an adversarial tie corpus
    where a naive 'top-B disjoint pairs' batch WOULD diverge (merging
    (a,z) creates (az,</w>)-style offspring that outrank an equal-count
    disjoint pair lexicographically); the boundary trim must catch it."""
    from jsonify2ai_spark.operators.bpe import train_bpe

    corpora = {
        "natural": [
            "the cat sat on the mat",
            "the cats sat on the mats",
            "a cat and a mat and a hat",
            "hats and mats and cats",
            "the the the hat",
            "lower lowest newer newest wider widest",
            "new newer newest low lower lowest",
        ],
        # the constructed divergence trap: (a,z) then offspring (az, y)/
        # (az, </w>) tie at 5 with the disjoint pair (c,w)
        "tie-trap": ["azy"] * 5 + ["az"] * 5 + ["cw"] * 5,
        # heavy ties everywhere: every word same frequency
        "uniform": ["abcd", "bcda", "cdab", "dabc", "abdc", "dcba"] * 3,
    }
    for name, texts in corpora.items():
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        seq = train_bpe(df, num_merges=12, merge_batch=1)
        for bsz in (4, 100):
            got = train_bpe(df, num_merges=12, merge_batch=bsz)
            assert got == seq, (name, bsz, got, seq)


def test_batch_safe_prefix_boundary_trim():
    """Unit-pin the selection rule on the constructed offspring case: with
    ranked rows [(a,z):10, (c,w):5, (w,</w>):5], (c,w) ties the first
    blocked row's count so only the argmax survives the trim; with a
    strict count gap the disjoint runner-up IS batched."""
    from jsonify2ai_spark.operators.bpe import _batch_safe_prefix

    def row(a, b, c):
        return {"p": {"a": a, "b": b}, "c": c}

    rows = [row("a", "z", 10), row("c", "w", 5), row("w", "</w>", 5)]
    assert _batch_safe_prefix(rows, 3, 2) == [("a", "z")]
    rows = [row("a", "z", 10), row("c", "w", 7), row("w", "</w>", 5)]
    assert _batch_safe_prefix(rows, 3, 2) == [("a", "z"), ("c", "w")]
    # output collision: (x, y) -> "xy" equal to a later member's symbol
    rows = [row("x", "y", 10), row("xy", "q", 4), row("m", "n", 3)]
    assert _batch_safe_prefix(rows, 3, 2) == [("x", "y")]
    # horizon seeding: a full b+1 window means unseen pairs tie row b+1
    rows = [row("a", "b", 9), row("c", "d", 5), row("e", "f", 5)]
    assert _batch_safe_prefix(rows, 2, 2) == [("a", "b")]
    # min_pair_count floors acceptance
    rows = [row("a", "b", 9), row("c", "d", 1)]
    assert _batch_safe_prefix(rows, 2, 2) == [("a", "b")]


def test_train_bpe_fast_mode_quality_parity(spark):
    """exact=False (skip-not-stop batching) may reorder merges but must
    stay a QUALITY twin of sequential Sennrich: high merge-set overlap,
    and encoding compression within a few percent on the training corpus.
    Also pin that its batch really is bigger than the exact-safe one on a
    tie-heavy corpus (the whole point of the mode)."""
    from jsonify2ai_spark.operators.bpe import bpe_encode, train_bpe

    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "a cat and a mat and a hat",
        "hats and mats and cats",
        "lower lowest newer newest wider widest",
        "new newer newest low lower lowest",
        "the newest cats on the lowest mat",
    ] * 3
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    seq_stats, fast_stats = {}, {}
    seq = train_bpe(df, num_merges=30, merge_batch=1, _stats=seq_stats)
    fast = train_bpe(
        df, num_merges=30, merge_batch=8, exact=False, _stats=fast_stats
    )
    assert len(fast) == len(seq)
    # merge PAIRS legitimately differ (different merge trees can build the
    # same token, e.g. a+nd vs an+d) — the comparable artifact is the
    # produced token vocabulary
    vocab_seq = {a + b for a, b in seq}
    vocab_fast = {a + b for a, b in fast}
    overlap = len(vocab_seq & vocab_fast) / len(vocab_seq)
    assert overlap >= 0.7, (overlap, vocab_seq ^ vocab_fast)
    assert fast_stats["rounds"] < seq_stats["rounds"] / 2, (
        fast_stats,
        seq_stats,
    )

    def total_tokens(merges):
        out = bpe_encode(df, merges)
        return out.select(F.sum(F.size("bpe_tokens"))).first()[0]

    t_seq, t_fast = total_tokens(seq), total_tokens(fast)
    assert abs(t_fast - t_seq) / t_seq < 0.05, (t_seq, t_fast)


def test_blocklist_filter_line_scope_join_form_parity(spark):
    """r8 (r7 verdict #6): above the word-count threshold scope='line'
    switches to the broadcast-join membership form — counters, kept-line
    reassembly (order included), empty-line, all-bad-line, and NULL-text
    contracts must match the literal-array scan exactly."""
    import jsonify2ai_spark.operators.textstats as ts

    docs = spark.createDataFrame(
        [
            (1, "clean opening line\nbad0007 poisons this line\nclean closing"),
            (2, "bad0001 a\nbad0002 b"),  # every line bad -> text_clean ''
            (3, None),  # NULL text -> NULL row values
            (4, ""),  # one empty line, kept
            (5, "solitary clean line"),
            (6, "x\n\ny bad0042 z\n"),  # blank + trailing-newline lines
        ],
        "doc_id long, text string",
    )
    words = [f"bad{i:04d}" for i in range(3000)]
    assert len(words) > ts._BLOCKLIST_JOIN_THRESHOLD
    joined = {
        r["doc_id"]: tuple(r)[1:]
        for r in ts.blocklist_filter(docs, words, scope="line").collect()
    }
    old = ts._BLOCKLIST_JOIN_THRESHOLD
    ts._BLOCKLIST_JOIN_THRESHOLD = 10**9
    try:
        arr = {
            r["doc_id"]: tuple(r)[1:]
            for r in ts.blocklist_filter(docs, words, scope="line").collect()
        }
    finally:
        ts._BLOCKLIST_JOIN_THRESHOLD = old
    assert joined == arr, (joined, arr)
    assert joined[1] == (3, 2, "clean opening line\nclean closing")
    assert joined[2] == (2, 0, "")
    assert joined[3] == (None, None, None)
    assert joined[4] == (1, 1, "")
    assert joined[6] == (4, 3, "x\n\n")


def test_bpe_encode_fast_matches_expression_form_and_long_lists(spark):
    """bpe_encode_fast (Arrow rank-loop, cost independent of merge-list
    length) must reproduce bpe_encode token-for-token on a trained list —
    and must handle a merge list LONGER than the expression form's
    analyzer ceiling (~100 chained folds), which is its reason to exist."""
    from jsonify2ai_spark.operators.bpe import (
        bpe_encode,
        bpe_encode_fast,
        train_bpe,
    )

    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "lower lowest newer newest wider widest",
        "new newer newest low lower lowest",
        "",
        None,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = train_bpe(df.filter(F.col("text").isNotNull()), num_merges=25)
    assert merges
    slow = [r["bpe_tokens"] for r in bpe_encode(df, merges).collect()]
    fast = [r["bpe_tokens"] for r in bpe_encode_fast(df, merges).collect()]
    assert fast == slow

    # long-list path: pad the trained list with merges of its own outputs
    # (well-founded: later entries reference earlier outputs only) — the
    # expression form cannot even ANALYZE a chain this long
    long_merges = list(merges)
    seen = {a + b for a, b in merges}
    base = sorted(seen)
    i = 0
    while len(long_merges) < 220 and i + 1 < len(base):
        cand = (base[i], base[i + 1])
        if cand not in long_merges:
            long_merges.append(cand)
        i += 1
    # fill the remainder with inert merges over fresh symbols
    j = 0
    while len(long_merges) < 220:
        long_merges.append((f"zz{j}", f"qq{j}"))
        j += 1
    out = bpe_encode_fast(df, long_merges).collect()
    got = {r["text"]: r["bpe_tokens"] for r in out}
    assert got[""] == [] and got[None] is None
    # padding with inert/derived merges must not change words the original
    # list already fully merges
    for t, s in zip(texts, slow):
        if t:
            # every token of the original encoding either survives or was
            # further merged into a longer one — total text reassembles
            assert "".join(got[t]) == "".join(s)


def test_fix_mojibake_repairs_and_counts(spark):
    """Encoding repair (r8): UTF-8-as-Latin-1 artifact sequences repair to
    their true characters, counts come from the ORIGINAL text per rule
    (longest-first ordering so smart-quote triples win over bare prefix
    bytes), clean text passes through untouched, NULL stays NULL."""
    from jsonify2ai_spark.operators.textstats import fix_mojibake

    smart = "\u00e2\u20ac\u2122"      # mojibake of right single quote
    eacute = "\u00c3\u00a9"            # mojibake of e-acute
    docs = spark.createDataFrame(
        [
            (1, f"it{smart}s a r{eacute}sum{eacute} test"),
            (2, "perfectly clean ascii text"),
            (3, None),
            (4, f"{smart}{smart}{eacute}"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in fix_mojibake(docs).collect()}
    assert out[1]["text_fixed"] == "it\u2019s a r\u00e9sum\u00e9 test"
    assert out[1]["n_fixed"] == 3
    assert out[2]["text_fixed"] == "perfectly clean ascii text"
    assert out[2]["n_fixed"] == 0
    assert out[3]["text_fixed"] is None and out[3]["n_fixed"] is None
    assert out[4]["n_fixed"] == 3
    assert out[4]["text_fixed"] == "\u2019\u2019\u00e9"
    # cascade counting (r8 review): a repair whose output completes a
    # LATER rule's pattern counts both replacements — '\u00e2\u20ac' +
    # '\u00e2\u20ac\u0153' repairs via the left-quote rule into
    # '\u00e2\u20ac\u201c', which IS the en-dash mojibake, repaired next
    from jsonify2ai_spark.operators.textstats import fix_mojibake as _fm

    casc = spark.createDataFrame(
        [(9, "\u00e2\u20ac" + "\u00e2\u20ac\u0153")], "doc_id long, text string"
    )
    (r9,) = _fm(casc).collect()
    assert r9["text_fixed"] == "\u2013" and r9["n_fixed"] == 2


def test_assign_splits_contract(spark):
    """Deterministic splits (r8, q113): fractions land within tolerance,
    assignments are a pure function of the key (corpus growth never moves
    a document; duplicate keys co-locate), remainder falls to the first
    split, and bad fractions raise."""
    import pytest

    from jsonify2ai_spark.operators.sampling import assign_splits

    df = spark.range(50_000).select(F.col("id").alias("doc_id"))
    out = assign_splits(df, "doc_id")
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 50_000 - 0.98) < 0.005
    assert abs(counts["val"] / 50_000 - 0.01) < 0.005
    # stability: the first 2k docs keep their split when the corpus grows
    small = {
        r["doc_id"]: r["split"]
        for r in assign_splits(df.filter(F.col("doc_id") < 2000), "doc_id").collect()
    }
    big = {
        r["doc_id"]: r["split"]
        for r in out.filter(F.col("doc_id") < 2000).collect()
    }
    assert small == big
    # duplicate keys co-locate (leakage control is key dedup, not luck)
    dup = spark.createDataFrame([(7,), (7,), (7,)], "doc_id long")
    assert assign_splits(dup, "doc_id").select("split").distinct().count() == 1
    # remainder -> first split; under-1 fractions are legal
    part = {r["split"] for r in assign_splits(df, "doc_id", splits={"a": 0.5, "b": 0.1}).collect()}
    assert part == {"a", "b"}
    counts2 = {
        r["split"]: r["count"]
        for r in assign_splits(df, "doc_id", splits={"a": 0.5, "b": 0.1})
        .groupBy("split").count().collect()
    }
    assert abs(counts2["a"] / 50_000 - 0.9) < 0.01  # 0.5 + 0.4 remainder
    with pytest.raises(ValueError):
        assign_splits(df, "doc_id", splits={"a": 0.9, "b": 0.2})
    # salt versions the layout
    v2 = {
        r["doc_id"]: r["split"]
        for r in assign_splits(df.limit(2000), "doc_id", salt="v2").collect()
    }
    assert v2 != small


def test_assign_splits_null_key_policy(spark):
    """r9 (r8 advisor): a NULL key has no identity — default on_null
    fails the job instead of silently landing the row in train; a named
    on_null routes NULLs to that split explicitly; a non-split name is
    rejected up front."""
    import pytest

    from jsonify2ai_spark.operators.sampling import assign_splits

    df = spark.createDataFrame(
        [("a",), (None,), ("b",)], "k string"
    )
    with pytest.raises(Exception, match="NULL in key column"):
        assign_splits(df, "k").collect()
    routed = {
        r["k"]: r["split"]
        for r in assign_splits(df, "k", on_null="test").collect()
    }
    assert routed[None] == "test"
    assert routed["a"] in {"train", "val", "test"}
    with pytest.raises(ValueError, match="not a split name"):
        assign_splits(df, "k", on_null="holdout")


def test_split_leakage_report_flags_cross_split_ngrams(spark):
    """r8 (q114): a held-out document sharing a word 8-gram with any TRAIN
    document must flag leaked with the shared-shingle count; clean held
    docs read 0/False; train docs don't appear; normalize=True catches a
    re-cased leak the surface form misses."""
    from jsonify2ai_spark.operators.dedup import split_leakage_report

    phrase = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (1, f"train filler one {phrase} more train words", "train"),
            (2, "train filler two entirely its own material here", "train"),
            (10, f"held doc quoting {phrase} verbatim", "val"),
            (11, "held doc with completely original content inside it", "test"),
            (12, f"held doc quoting {phrase.upper()} recased", "test"),
        ],
        "doc_id long, text string, split string",
    )
    out = {r["doc_id"]: r for r in split_leakage_report(docs, n=8).collect()}
    assert set(out) == {10, 11, 12}
    assert out[10]["leaked"] is True and out[10]["n_shared_ngrams"] >= 3
    assert out[11] ["leaked"] is False and out[11]["n_shared_ngrams"] == 0
    assert out[12]["leaked"] is False  # surface form misses the re-case
    norm = {
        r["doc_id"]: r
        for r in split_leakage_report(docs, n=8, normalize=True).collect()
    }
    assert norm[12]["leaked"] is True  # normalized form catches it
    assert norm[11]["leaked"] is False


def test_split_leakage_broadcast_guard_parity(spark):
    """r9 (VERDICT r8 #2): the held-out pair broadcast is guarded by the
    materialized pair count — above ``broadcast_held_max`` the probe is a
    plain shuffled join (no forced-broadcast OOM at 100 TB) with
    IDENTICAL output. Parity both sides of the threshold, and the plan
    check: the forced-broadcast hint is present only under it."""
    from jsonify2ai_spark.operators.dedup import split_leakage_report

    phrase = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (1, f"train filler one {phrase} more train words", "train"),
            (2, "train filler two entirely its own material here", "train"),
            (10, f"held doc quoting {phrase} verbatim", "val"),
            (11, "held doc with completely original content inside it", "test"),
        ],
        "doc_id long, text string, split string",
    )
    wide = split_leakage_report(docs, n=8)  # pairs << 2M -> broadcast
    narrow = split_leakage_report(docs, n=8, broadcast_held_max=0)  # force fallback
    key = lambda r: (r["doc_id"], r["split"], r["n_shared_ngrams"], r["leaked"])
    assert sorted(map(key, wide.collect())) == sorted(map(key, narrow.collect()))
    # the analyzed plans: hint present under the threshold, absent above
    # (AQE may still CHOOSE broadcast for a small fallback side — the
    # guard's point is that nothing FORCES it at scale)
    assert "ResolvedHint" in wide._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in narrow._jdf.queryExecution().analyzed().toString()


def test_diversity_sample_caps_dense_modes(spark):
    """r8 (q115): a dense embedding mode (60 near-identical vectors) trims
    to the cap while a thin mode (5 vectors) survives whole; ranks are
    hash-ordered and layout-invariant; every input row is reported."""
    from jsonify2ai_spark.operators.sampling import diversity_sample

    rows = [(i, [1.0, 0.001 * i, 0.0]) for i in range(60)]  # dense mode
    rows += [(100 + j, [0.0, 1.0, 0.002 * j]) for j in range(5)]  # thin
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    out = diversity_sample(emb, cents, cap=10, impl="expr")
    rws = out.collect()
    assert len(rws) == 65  # audit covers every row
    by_c = {}
    for r in rws:
        by_c.setdefault(r["cluster"], []).append(r)
    assert sum(r["kept"] for r in by_c[0]) == 10  # dense mode capped
    assert sum(r["kept"] for r in by_c[1]) == 5  # thin mode whole
    ranks0 = sorted(r["cluster_rank"] for r in by_c[0])
    assert ranks0 == list(range(1, 61))  # contiguous global hash ranks
    # layout invariance
    again = {
        r["vec_id"]: (r["cluster"], r["cluster_rank"], r["kept"])
        for r in diversity_sample(
            emb.repartition(7), cents, cap=10, impl="expr"
        ).collect()
    }
    assert again == {
        r["vec_id"]: (r["cluster"], r["cluster_rank"], r["kept"]) for r in rws
    }


def test_tokens_to_ids_policies_and_impl_parity(spark):
    """r9 (VERDICT r8 'What's missing #2'): token-array -> id-array lookup
    through a minted vocab. OOV policies (drop / <unk> id / error), NULL
    and empty arrays -> [], and the udf (broadcast dict, map-only) and
    join (broadcast hash join + reassembly) impls agree row-for-row."""
    import pytest

    from jsonify2ai_spark.operators.bpe import tokens_to_ids

    vocab = spark.createDataFrame(
        [("the", 1), ("cat", 2), ("sat", 3)], "token string, token_id long"
    )
    df = spark.createDataFrame(
        [
            (1, ["the", "cat", "sat"]),
            (2, ["the", "dog", "sat"]),  # 'dog' is OOV
            (3, []),
            (4, None),
        ],
        "doc_id long, toks array<string>",
    )
    drop = {
        r["doc_id"]: r["token_ids"]
        for r in tokens_to_ids(df, vocab, tokens_col="toks").collect()
    }
    assert drop == {1: [1, 2, 3], 2: [1, 3], 3: [], 4: []}
    unk = {
        r["doc_id"]: r["token_ids"]
        for r in tokens_to_ids(df, vocab, tokens_col="toks", oov=0).collect()
    }
    assert unk[2] == [1, 0, 3]
    with pytest.raises(Exception, match="OOV token"):
        tokens_to_ids(df, vocab, tokens_col="toks", oov="error").collect()
    with pytest.raises(ValueError, match="oov must be"):
        tokens_to_ids(df, vocab, tokens_col="toks", oov=True)
    # impl parity (drop + unk), including the empty/NULL rows
    for policy in ("drop", 0):
        a = {
            r["doc_id"]: r["token_ids"]
            for r in tokens_to_ids(
                df, vocab, tokens_col="toks", oov=policy, impl="udf"
            ).collect()
        }
        b = {
            r["doc_id"]: r["token_ids"]
            for r in tokens_to_ids(
                df, vocab, tokens_col="toks", oov=policy, impl="join"
            ).collect()
        }
        assert a == b, policy
    # re-mapping a frame that ALREADY carries out_col (refreshed vocab):
    # both impls overwrite instead of duplicating the column
    # (review-found r9: the join impl used to hit AMBIGUOUS_REFERENCE)
    pre = df.withColumn("token_ids", F.array(F.lit(7).cast("bigint")))
    for impl in ("udf", "join"):
        re = {
            r["doc_id"]: r["token_ids"]
            for r in tokens_to_ids(
                pre, vocab, tokens_col="toks", impl=impl
            ).collect()
        }
        assert re == drop, impl
        assert tokens_to_ids(
            pre, vocab, tokens_col="toks", impl=impl
        ).columns.count("token_ids") == 1, impl


def test_tokens_to_ids_plan_shapes(spark):
    """The udf impl is a pure projection (zero Exchange at any corpus
    size); the join impl broadcast-hash-joins the vocab so the corpus
    never shuffles FOR THE LOOKUP (the one Exchange is the per-doc
    reassembly groupBy)."""
    from jsonify2ai_spark.operators.bpe import tokens_to_ids
    from jsonify2ai_spark.plans import plan_string

    vocab = spark.createDataFrame(
        [("a", 1), ("b", 2)], "token string, token_id long"
    )
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["b"])], "doc_id long, toks array<string>"
    )
    p_udf = plan_string(tokens_to_ids(df, vocab, tokens_col="toks"), "simple")
    assert p_udf.count("Exchange") == 0, p_udf[:1200]
    p_join = plan_string(
        tokens_to_ids(df, vocab, tokens_col="toks", impl="join"), "simple"
    )
    assert "BroadcastHashJoin" in p_join or "BroadcastNestedLoop" not in p_join


def test_tokenize_to_ids_roundtrip_decodes_to_encoder_tokens(spark):
    """Ids must decode back (reversed vocab) to exactly what the serving
    encoder produced — corpus -> ids loses nothing when the vocab is
    minted over the same encoder's output (token_array_col form)."""
    from jsonify2ai_spark.operators.bpe import (
        bpe_encode_fast,
        tokenize_to_ids,
        train_bpe,
    )
    from jsonify2ai_spark.operators.textstats import build_vocab

    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "new newer newest low lower lowest",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges = train_bpe(df, num_merges=20)
    enc = bpe_encode_fast(df, merges, out_col="_toks")
    vocab = build_vocab(enc, token_array_col="_toks")
    got = {
        r["doc_id"]: r["token_ids"]
        for r in tokenize_to_ids(df, merges, vocab, oov="error").collect()
    }
    rev = {r["token_id"]: r["token"] for r in vocab.collect()}
    want = {r["doc_id"]: r["_toks"] for r in enc.collect()}
    for d, ids in got.items():
        assert [rev[i] for i in ids] == want[d], d


def test_concat_token_bins_assembles_trainer_sequences(spark):
    """r9: per (group, bin) the member docs' id arrays concatenate in
    doc-id order with eos after EVERY doc; pad_to right-pads but never
    truncates; n_ids counts real ids+eos excluding padding; empty-id
    docs contribute just their eos."""
    from jsonify2ai_spark.operators.packing import concat_token_bins

    packed = spark.createDataFrame(
        [
            (1, [10, 11], 0, 0),
            (3, [12], 0, 0),       # same bin, higher id -> appended after
            (2, [], 0, 1),         # empty ids -> eos only
            (5, [13, 14, 15], 1, 0),
        ],
        "doc_id long, token_ids array<bigint>, pack_group long, bin_idx long",
    )
    out = {
        (r["pack_group"], r["bin_idx"]): r
        for r in concat_token_bins(packed, eos_id=99, pad_to=8, pad_id=0).collect()
    }
    b00 = out[(0, 0)]
    assert b00["input_ids"] == [10, 11, 99, 12, 99] + [0, 0, 0]
    assert b00["n_docs"] == 2 and b00["n_ids"] == 5
    b01 = out[(0, 1)]
    assert b01["input_ids"] == [99] + [0] * 7 and b01["n_ids"] == 1
    b10 = out[(1, 0)]
    assert b10["input_ids"] == [13, 14, 15, 99] + [0] * 4

    # no eos, no pad: raw concatenation at true length
    raw = {
        (r["pack_group"], r["bin_idx"]): r["input_ids"]
        for r in concat_token_bins(packed).collect()
    }
    assert raw[(0, 0)] == [10, 11, 12] and raw[(0, 1)] == []
    # over-long bin vs pad_to: returned at true length, never truncated
    over = {
        r["bin_idx"]: r["input_ids"]
        for r in concat_token_bins(packed, pad_to=2).collect()
        if (r["pack_group"], r["bin_idx"]) == (1, 0)
    }
    assert over[0] == [13, 14, 15]
    # a NULL id array reads as empty (review-found r9: concat/flatten
    # used to NULL-propagate and silently drop the whole bin)
    with_null = spark.createDataFrame(
        [(1, [10], 0, 0), (2, None, 0, 0)],
        "doc_id long, token_ids array<bigint>, pack_group long, bin_idx long",
    )
    nrow = concat_token_bins(with_null, eos_id=99, pad_to=6).collect()[0]
    assert nrow["input_ids"] == [10, 99, 99] + [0, 0, 0]
    assert nrow["n_docs"] == 2 and nrow["n_ids"] == 3


def test_semantic_decontaminate_flags_and_impl_parity(spark):
    """r9: embedding-space contamination — max cosine vs the benchmark
    vectors flags near-identical (paraphrase-shaped) docs the n-gram
    rule can't see; expr and arrow (GEMM) impls agree on every flag and
    on the max cosine to float tolerance; zero vectors are unflagged
    with NULL cosine; empty benchmark raises."""
    import math

    import pytest

    from jsonify2ai_spark.operators.dedup import semantic_decontaminate

    bench = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    rows = [
        (1, [1.0, 0.01, 0.0]),   # ~bench[0] -> contaminated
        (2, [0.0, 2.0, 0.1]),    # ~bench[1] (scale-invariant) -> contaminated
        (3, [0.0, 0.1, 1.0]),    # orthogonal-ish -> clean
        (4, [0.0, 0.0, 0.0]),    # zero vector -> no cosine, clean
        (5, None),               # NULL embedding -> NULL cosine, clean
        (6, [1.0, 0.0]),         # wrong dim -> NULL cosine, clean
    ]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    outs = {}
    for impl in ("expr", "arrow"):
        outs[impl] = {
            r["doc_id"]: r
            for r in semantic_decontaminate(
                df, bench, threshold=0.95, impl=impl
            ).collect()
        }
    for impl, out in outs.items():
        assert out[1]["contaminated"] and out[2]["contaminated"], impl
        assert not out[3]["contaminated"] and not out[4]["contaminated"], impl
        for d in (4, 5, 6):  # no-evidence rows: NULL cosine, unflagged
            assert out[d]["max_bench_cos"] is None, (impl, d)
            assert not out[d]["contaminated"], (impl, d)
    for d in (1, 2, 3):
        assert math.isclose(
            outs["expr"][d]["max_bench_cos"],
            outs["arrow"][d]["max_bench_cos"],
            abs_tol=1e-9,
        )
    with pytest.raises(ValueError, match="empty"):
        semantic_decontaminate(df, [])
    # map-only contract: zero Exchange in either impl
    from jsonify2ai_spark.plans import plan_string

    for impl in ("expr", "arrow"):
        p = plan_string(semantic_decontaminate(df, bench, impl=impl), "simple")
        assert p.count("Exchange") == 0, (impl, p[:800])


def test_concat_token_bins_boundaries(spark):
    """r9: with_boundaries=True emits doc_ids (sequence order) and
    doc_lens (per-doc id count incl. eos, excl. padding) — doc_lens sums
    to n_ids and zips against doc_ids positionally, so a trainer can
    derive block-diagonal masks / position resets without re-splitting
    input_ids."""
    from jsonify2ai_spark.operators.packing import concat_token_bins

    packed = spark.createDataFrame(
        [
            (1, [10, 11], 0, 0),
            (3, [12], 0, 0),
            (2, [], 0, 1),
            (5, [13, 14, 15], 1, 0),
        ],
        "doc_id long, token_ids array<bigint>, pack_group long, bin_idx long",
    )
    out = {
        (r["pack_group"], r["bin_idx"]): r
        for r in concat_token_bins(
            packed, eos_id=99, pad_to=8, with_boundaries=True
        ).collect()
    }
    b00 = out[(0, 0)]
    assert b00["doc_ids"] == [1, 3] and b00["doc_lens"] == [3, 2]
    assert sum(b00["doc_lens"]) == b00["n_ids"]
    # boundary reconstruction matches the unpadded prefix of input_ids
    offs, spans = 0, []
    for ln in b00["doc_lens"]:
        spans.append(b00["input_ids"][offs : offs + ln])
        offs += ln
    assert spans == [[10, 11, 99], [12, 99]]
    assert out[(0, 1)]["doc_ids"] == [2] and out[(0, 1)]["doc_lens"] == [1]
    # no eos: lens are raw id counts (empty doc -> 0)
    raw = {
        (r["pack_group"], r["bin_idx"]): r
        for r in concat_token_bins(packed, with_boundaries=True).collect()
    }
    assert raw[(0, 0)]["doc_lens"] == [2, 1] and raw[(0, 1)]["doc_lens"] == [0]


def test_tokens_to_ids_join_rejects_null_ids(spark):
    """r9 review: impl='join' reassembles by equi-join on id_col, and a
    NULL key never matches itself — the plan raises instead of silently
    returning [] for the NULL-id row (udf-form parity would break)."""
    import pytest as _pytest

    from jsonify2ai_spark.operators.bpe import tokens_to_ids

    vocab = spark.createDataFrame(
        [("a", 0), ("b", 1)], "token string, token_id long"
    )
    df = spark.createDataFrame(
        [(1, ["a"]), (None, ["b"])],
        "doc_id long, bpe_tokens array<string>",
    )
    with _pytest.raises(Exception, match="NULL in id column"):
        tokens_to_ids(df, vocab, impl="join").collect()
    # udf form still maps the NULL-id row's tokens
    got = {
        r["doc_id"]: r["token_ids"]
        for r in tokens_to_ids(df, vocab, impl="udf").collect()
    }
    assert got[1] == [0] and got[None] == [1]


def test_tokens_to_ids_join_rejects_duplicate_ids(spark):
    """r10 (r9 advisor): impl='join' fans out through the reassembly
    equi-join when id_col is not unique — every copy silently receives
    ALL copies' rows, corrupting the documented udf-form parity. The
    default check_unique=True guard raises instead (plan-embedded r11:
    the raise fires at action time, inside the same job, via a
    count-over-window that reuses the join's own hash shuffle — no
    separate pass, no upstream recomputation, and it checks exactly the
    rows the join consumes); check_unique=False is the documented
    opt-out for by-construction-unique callers."""
    import pytest as _pytest

    from jsonify2ai_spark.operators.bpe import tokens_to_ids

    vocab = spark.createDataFrame(
        [("a", 0), ("b", 1)], "token string, token_id long"
    )
    dup = spark.createDataFrame(
        [(1, ["a"]), (1, ["b"]), (2, ["a", "b"])],
        "doc_id long, bpe_tokens array<string>",
    )
    with _pytest.raises(Exception, match="duplicate key"):
        tokens_to_ids(dup, vocab, impl="join").collect()
    # opt-out still works (caller takes responsibility); the corruption
    # the guard protects against: both copies of id 1 receive the MERGED
    # array of both copies' tokens (positions collide in the groupBy)
    fanned = tokens_to_ids(dup, vocab, impl="join", check_unique=False)
    merged = [
        r["token_ids"] for r in fanned.filter("doc_id = 1").collect()
    ]
    assert merged == [[0, 1], [0, 1]]

    # unique ids: guard passes and parity with the udf form holds
    uniq = spark.createDataFrame(
        [(1, ["a"]), (2, ["a", "b"])],
        "doc_id long, bpe_tokens array<string>",
    )
    j = {
        r["doc_id"]: r["token_ids"]
        for r in tokens_to_ids(uniq, vocab, impl="join").collect()
    }
    u = {
        r["doc_id"]: r["token_ids"]
        for r in tokens_to_ids(uniq, vocab, impl="udf").collect()
    }
    assert j == u == {1: [0], 2: [0, 1]}


def test_dsir_weights_shift_toward_target(spark, tables):
    """DSIR importance weights: target-language documents score higher
    (per-feature) than off-target ones on average; n_feats is the exact
    unigram+bigram count; empty docs drop; the weight frame is stable
    across partitionings (no RNG, no row-order dependence)."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.sampling import dsir_weights

    docs = tables["documents"]
    target = docs.filter("lang = 'en'")
    w = dsir_weights(docs, target, buckets=5_000)
    joined = w.join(docs.select("doc_id", "lang"), "doc_id").collect()
    assert len(joined) == docs.filter(F.length(F.trim("text")) > 0).count()

    en = [r["logw_per_feat"] for r in joined if r["lang"] == "en"]
    rest = [r["logw_per_feat"] for r in joined if r["lang"] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)  # the point of DSIR

    one = docs.filter("doc_id = 1").collect()[0]
    ntok = len(one["text"].split())
    got = [r["n_feats"] for r in joined if r["doc_id"] == 1][0]
    assert got == ntok + max(ntok - 1, 0)  # unigrams + bigrams

    again = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(docs.repartition(7), target, buckets=5_000).collect()
    }
    assert again == {r["doc_id"]: r["log_weight"] for r in joined}


def test_dsir_resample_gumbel_without_replacement(spark, tables):
    """DSIR resampling: k distinct rows, reproducible across runs,
    temperature→0 degenerates to top-k by weight, and the drawn subset is
    target-shifted (mean selected weight > corpus mean). NULL weights get
    no ticket."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.sampling import dsir_resample, dsir_weights

    docs = tables["documents"]
    w = dsir_weights(docs, docs.filter("lang = 'en'"), buckets=5_000)
    w = w.localCheckpoint()

    sel = dsir_resample(w, 60).collect()
    assert len(sel) == 60
    assert len({r["doc_id"] for r in sel}) == 60  # without replacement
    again = dsir_resample(w.repartition(5), 60).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in sel)

    pop_mean = w.agg(F.avg("log_weight")).collect()[0][0]
    sel_ids = [r["doc_id"] for r in sel]
    sel_mean = (
        w.filter(F.col("doc_id").isin(sel_ids)).agg(F.avg("log_weight")).collect()[0][0]
    )
    assert sel_mean > pop_mean  # importance resampling shifts the mix

    cold = dsir_resample(w, 20, temperature=1e-9)
    top = w.orderBy(F.col("log_weight").desc(), "doc_id").limit(20)
    assert {r["doc_id"] for r in cold.collect()} == {
        r["doc_id"] for r in top.collect()
    }

    with_null = w.withColumn(
        "log_weight",
        F.when(F.col("doc_id") % 2 == 0, F.col("log_weight")),
    )
    odd = dsir_resample(with_null, with_null.count()).collect()
    assert all(r["doc_id"] % 2 == 0 for r in odd)


def test_pack_report_card(spark, tables):
    """pack_report: conservation (n_docs/total_units == input), waste
    identity 1 - total/(n_bins*budget), overfull bins == oversized docs
    (next-fit never co-locates a doc that would overflow a non-empty
    bin), and every fill stat is budget-normalized."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.packing import pack_report, pack_sequences

    docs = tables["documents"].select("doc_id", "n_chars")
    budget = 512
    packed = pack_sequences(docs, budget=budget, size_col="n_chars", n_groups=8)
    card = pack_report(packed, budget=budget, size_col="n_chars").collect()[0]

    assert card["n_docs"] == docs.count()
    assert card["total_units"] == docs.agg(F.sum("n_chars")).collect()[0][0]
    assert card["waste_frac"] == round(
        1.0 - card["total_units"] / (card["n_bins"] * budget), 4
    )
    oversized = docs.filter(F.col("n_chars") > budget).count()
    assert card["n_overfull"] == oversized and oversized > 0
    assert card["min_fill"] <= card["p50_fill"] <= card["p95_fill"] <= card["max_fill"]
    assert card["max_fill"] > 1.0  # the oversized doc's lone bin
    assert 0.0 < card["mean_fill"] <= card["max_fill"]


def test_oov_count_kernel_null_element_is_oov(spark):
    """r11 advisor (low): the vectorized OOV kernel's NaN mask conflated
    two cases — the phantom NaN an empty/NULL ARRAY explodes to (0
    tokens, must count 0) and a NULL ELEMENT inside a non-empty array (a
    corrupt token the old per-token loop counted as OOV via
    ``t not in m``). Pin the split: NULL-in-array counts, empty doesn't."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.bpe import _oov_count_udf

    bc = spark.sparkContext.broadcast({"a": 0, "b": 1})
    cnt = _oov_count_udf(bc)
    df = spark.createDataFrame(
        [
            (1, ["a", "b", "zz"]),          # one true OOV
            (2, ["a", None, "b"]),          # NULL element: corrupt -> OOV
            (3, [None, None]),              # all-NULL non-empty: 2 OOV
            (4, []),                        # empty array: 0, no phantom
            (5, None),                      # NULL array: 0, no phantom
            (6, ["a", "b"]),                # clean: 0
        ],
        "doc_id long, toks array<string>",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", cnt(F.col("toks")).alias("n")).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 0, 5: 0, 6: 0}


def test_calibrate_dsir_cutoff_contract(spark, tables):
    """r11 verdict #4: the thin-mode cutoff is DERIVED — the gate's one
    free parameter comes from keep_frac. keep_frac=1.0 keeps every
    weighted row; a mid fraction keeps >= ceil(frac*n) (ties are a
    floor); invalid fractions and empty calibration frames raise."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.sampling import (
        calibrate_dsir_cutoff,
        dsir_weights,
    )

    docs = tables["documents"].select("doc_id", "text", "lang").limit(200)
    target = docs.filter("lang = 'en'")
    w = dsir_weights(docs, target, buckets=5_000).localCheckpoint(eager=False)
    n = w.count()

    from jsonify2ai_spark.operators.sampling import _BUCKETS, sample_hash

    u = (sample_hash(F.col("doc_id"), "dsir-v1") + F.lit(0.5)) / F.lit(
        float(_BUCKETS)
    )
    key = F.round(F.col("log_weight") - F.log(-F.log(u)), 4) + F.lit(0.0)
    keyed = w.select("doc_id", key.alias("k"))

    for frac in (0.25, 0.5, 1.0):
        cutoff = calibrate_dsir_cutoff(w, frac)
        kept = keyed.filter(F.col("k") >= cutoff).count()
        want = math.ceil(frac * n)
        assert want <= kept <= want + 5  # ties at the 4dp boundary only

    with pytest.raises(ValueError, match="keep_frac"):
        calibrate_dsir_cutoff(w, 0.0)
    with pytest.raises(ValueError, match="keep_frac"):
        calibrate_dsir_cutoff(w, 1.5)
    with pytest.raises(ValueError, match="no weighted rows"):
        calibrate_dsir_cutoff(
            w.withColumn("log_weight", F.lit(None).cast("double")), 0.5
        )


def test_pack_sequences_bfd_strategy(spark, tables):
    """BFD packing: conservation (every doc exactly one bin), no bin
    overfull except a lone oversized doc, order-independence by
    construction, and fill NEVER worse than next-fit on the same group
    split (the reason to pay the offline sort)."""
    import pytest
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.packing import pack_report, pack_sequences

    docs = tables["documents"].select("doc_id", "n_chars").limit(400)
    kw = dict(budget=512, size_col="n_chars", id_col="doc_id", n_groups=8)
    nf = pack_sequences(docs, **kw)
    bfd = pack_sequences(docs, strategy="bfd", **kw)

    # conservation + per-bin budget (oversized docs sit alone)
    assert bfd.count() == docs.count()
    fills = bfd.groupBy("pack_group", "bin_idx").agg(
        F.sum("n_chars").alias("fill"), F.count(F.lit(1)).alias("n")
    )
    bad = fills.filter((F.col("fill") > 512) & (F.col("n") > 1)).count()
    assert bad == 0

    r_nf = pack_report(nf, budget=512, size_col="n_chars").collect()[0]
    r_bfd = pack_report(bfd, budget=512, size_col="n_chars").collect()[0]
    assert r_bfd["n_docs"] == r_nf["n_docs"]
    assert r_bfd["total_units"] == r_nf["total_units"]
    assert r_bfd["n_bins"] <= r_nf["n_bins"]
    assert r_bfd["waste_frac"] <= r_nf["waste_frac"]

    # arrival-order independence: a shuffled input packs identically
    shuffled = docs.orderBy(F.md5(F.col("doc_id").cast("string")))
    again = {
        (r["doc_id"]): (r["pack_group"], r["bin_idx"])
        for r in pack_sequences(shuffled, strategy="bfd", **kw).collect()
    }
    first = {
        (r["doc_id"]): (r["pack_group"], r["bin_idx"])
        for r in bfd.collect()
    }
    assert again == first

    with pytest.raises(ValueError, match="strategy"):
        pack_sequences(docs, strategy="firstfit", **kw)


def test_compression_ratio_signal(spark):
    """zlib redundancy signal: templated text compresses far below
    random-ish text, ratio is in (0, ~1.1], empty/NULL docs drop, and
    the ranking (templated < natural < random) is stable — the bounds
    the flag thresholds rely on, since compressed size itself is not
    engine-portable."""
    import random

    from jsonify2ai_spark.operators.textstats import compression_ratio

    rng = random.Random(7)
    rand_text = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(8))
        for _ in range(200)
    )
    docs = spark.createDataFrame(
        [
            (1, "buy now limited offer " * 100),          # templated
            (2, ("the quarterly report discusses revenue growth across "
                 "regions with notable seasonal variation in demand ") * 4),
            (3, rand_text),                               # incompressible-ish
            (4, ""),                                      # drops
            (5, None),                                    # drops
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert r["n_bytes"] > 0 and 0.0 < r["ratio"] <= 1.1
        assert r["n_compressed"] > 0
    assert rows[1]["ratio"] < 0.1            # template collapses
    assert rows[1]["ratio"] < rows[2]["ratio"] < rows[3]["ratio"]
    assert rows[3]["ratio"] > 0.5            # random stays large


def test_render_sft_samples_spans_slice_exactly(spark):
    """SFT rendering: the text is the ordered concat of
    '<|role|>\\n{content}\\n' segments; every mask span, sliced out of
    the rendered text, is byte-identical to that assistant turn's
    content; empty turns render empty spans; counters reconcile."""
    from jsonify2ai_spark.operators.sft import render_sft_samples

    msgs = spark.createDataFrame(
        [
            (1, 0, "user", "what is spark"),
            (1, 1, "assistant", "a distributed engine"),
            (1, 2, "user", "and catalyst"),
            (1, 3, "assistant", "its optimizer"),
            (2, 0, "user", "hi"),
            (2, 1, "assistant", ""),          # empty turn -> empty span
            (2, 2, "tool", "lookup(...)"),    # non-mask role: context only
            (2, 3, "assistant", "hello"),
        ],
        "conv_id long, turn_idx int, role string, text string",
    )
    out = {r["conv_id"]: r for r in render_sft_samples(msgs).collect()}

    r1 = out[1]
    assert r1["text"] == (
        "<|user|>\nwhat is spark\n<|assistant|>\na distributed engine\n"
        "<|user|>\nand catalyst\n<|assistant|>\nits optimizer\n"
    )
    assert r1["n_turns"] == 4 and r1["n_mask_turns"] == 2
    assert r1["n_chars"] == len(r1["text"])
    spans = [tuple(map(int, s.split(":"))) for s in r1["mask_spans"].split(";")]
    assert [r1["text"][a:b] for a, b in spans] == [
        "a distributed engine", "its optimizer",
    ]
    assert r1["mask_chars"] == sum(b - a for a, b in spans)

    r2 = out[2]
    spans2 = [tuple(map(int, s.split(":"))) for s in r2["mask_spans"].split(";")]
    assert [r2["text"][a:b] for a, b in spans2] == ["", "hello"]
    assert "<|tool|>\nlookup(...)\n" in r2["text"]
    assert r2["n_mask_turns"] == 2 and r2["mask_chars"] == 5


def test_sft_token_samples_mask_alignment(spark):
    """Token-space SFT masks: flattened tokens == the ordered concat of
    per-turn encodes, the mask-1 positions are exactly the assistant
    CONTENT subwords (headers and other roles all 0), and the
    tokens_to_ids policies behave as documented — unk substitution
    preserves alignment, drop breaks it (pinned so nobody ships it)."""
    from jsonify2ai_spark.operators.bpe import (
        bpe_encode_fast,
        tokens_to_ids,
        train_bpe,
    )
    from jsonify2ai_spark.operators.sft import sft_token_samples
    from jsonify2ai_spark.operators.textstats import build_vocab

    msgs = spark.createDataFrame(
        [
            (1, 0, "user", "the cat sat"),
            (1, 1, "assistant", "on the mat"),
            (1, 2, "user", "again"),
            (1, 3, "assistant", "the cats sat"),
            (2, 0, "user", "hello"),
            (2, 1, "assistant", ""),
        ],
        "conv_id long, turn_idx int, role string, text string",
    )
    corpus = msgs.selectExpr("conv_id as doc_id", "text")
    merges = train_bpe(corpus, num_merges=10)

    out = {r["conv_id"]: r for r in sft_token_samples(msgs, merges).collect()}
    r1 = out[1]
    assert r1["n_tokens"] == len(r1["bpe_tokens"]) == len(r1["loss_mask"])
    assert r1["n_mask_tokens"] == sum(r1["loss_mask"])

    # mask-1 positions reproduce the assistant contents' own encodes
    enc = {
        r["doc_id"]: r["_t"]
        for r in bpe_encode_fast(
            spark.createDataFrame(
                [(1, "on the mat"), (2, "the cats sat")], "doc_id long, text string"
            ),
            merges,
            out_col="_t",
        ).collect()
    }
    masked_toks = [
        t for t, m in zip(r1["bpe_tokens"], r1["loss_mask"]) if m == 1
    ]
    assert masked_toks == enc[1] + enc[2]
    # headers are never masked
    hdr_positions = [
        i for i, t in enumerate(r1["bpe_tokens"]) if "<|" in t or "|>" in t
    ]
    assert all(r1["loss_mask"][i] == 0 for i in hdr_positions)

    r2 = out[2]
    assert r2["n_mask_tokens"] == 0  # empty assistant turn: header only

    # id mapping: unk substitution preserves 1:1; drop would shift
    sample = sft_token_samples(msgs, merges)
    vocab = build_vocab(
        bpe_encode_fast(corpus, merges, out_col="bpe_tokens"),
        token_array_col="bpe_tokens",
    )
    ids = tokens_to_ids(
        sample, vocab, tokens_col="bpe_tokens", out_col="token_ids",
        oov=0, id_col="conv_id",
    )
    for r in ids.collect():
        assert len(r["token_ids"]) == len(r["loss_mask"])
    dropped = tokens_to_ids(
        sample, vocab, tokens_col="bpe_tokens", out_col="token_ids",
        oov="drop", id_col="conv_id",
    )
    # the headers are OOV to the content-trained vocab: drop shrinks
    assert any(
        len(r["token_ids"]) != len(r["loss_mask"]) for r in dropped.collect()
    )


def test_sft_token_samples_null_role_raises(spark):
    """A NULL role must fail LOUDLY, not vanish: the header join is an
    equi-join, so a NULL-role turn would silently drop from its
    conversation's sample and shift every later token relative to
    render_sft_samples' char-space output — the same misalignment class
    as oov='drop' (r12 advisor)."""
    import pytest

    from jsonify2ai_spark.operators.bpe import train_bpe
    from jsonify2ai_spark.operators.sft import sft_token_samples

    msgs = spark.createDataFrame(
        [
            (1, 0, "user", "the cat sat"),
            (1, 1, None, "orphan turn"),
            (1, 2, "assistant", "on the mat"),
        ],
        "conv_id long, turn_idx int, role string, text string",
    )
    merges = train_bpe(
        msgs.selectExpr("conv_id as doc_id", "text"), num_merges=5
    )
    with pytest.raises(ValueError, match="NULL in role column"):
        sft_token_samples(msgs, merges)


def test_concat_token_bins_loss_mask_assembly(spark):
    """Mask-aware assembly: the assembled loss_mask aligns with
    input_ids position-for-position — per-doc masks in doc order, 0 at
    every eos, 0 over padding — and a misaligned per-doc mask RAISES
    instead of training the wrong positions."""
    import pytest
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.packing import concat_token_bins

    packed = spark.createDataFrame(
        [
            (0, 0, 1, [11, 12, 13], [0, 1, 1]),
            (0, 0, 2, [21, 22], [1, 0]),
            (0, 1, 3, [31], [1]),
        ],
        "pack_group int, bin_idx int, doc_id long, "
        "token_ids array<bigint>, loss_mask array<int>",
    )
    out = {
        (r["pack_group"], r["bin_idx"]): r
        for r in concat_token_bins(
            packed, eos_id=0, pad_to=8, mask_col="loss_mask"
        ).collect()
    }
    b0 = out[(0, 0)]
    assert b0["input_ids"] == [11, 12, 13, 0, 21, 22, 0] + [0]
    assert b0["loss_mask"] == [0, 1, 1, 0, 1, 0, 0] + [0]
    assert len(b0["loss_mask"]) == len(b0["input_ids"]) == 8
    b1 = out[(0, 1)]
    assert b1["input_ids"][:2] == [31, 0] and b1["loss_mask"][:2] == [1, 0]
    assert sum(b1["loss_mask"]) == 1  # padding contributes no loss

    # misaligned mask raises at action time
    bad = spark.createDataFrame(
        [(0, 0, 9, [1, 2, 3], [1])],
        "pack_group int, bin_idx int, doc_id long, "
        "token_ids array<bigint>, loss_mask array<int>",
    )
    with pytest.raises(Exception, match="disagrees"):
        concat_token_bins(bad, eos_id=0, mask_col="loss_mask").collect()

    # mask_col=None: output unchanged from the pre-r12 contract
    plain = concat_token_bins(packed, eos_id=0).columns
    assert "loss_mask" not in plain


def test_preference_pairs_all_pairings(spark):
    """DPO pair assembly: deterministic (score desc, response asc)
    ranking; best_worst = one max-margin pair per prompt; best_rest =
    top vs each other; adjacent = consecutive ranks; min_margin and
    single-response prompts drop; NULL score raises in-plan."""
    import pytest

    from jsonify2ai_spark.operators.sft import preference_pairs

    rows = [
        # prompt 1: clear ranking a(3) > b(2) > c(1)
        (1, "p one", "resp a", 3.0),
        (1, "p one", "resp b", 2.0),
        (1, "p one", "resp c", 1.0),
        # prompt 2: score tie broken by response text asc -> "x" chosen
        (2, "p two", "resp y", 5.0),
        (2, "p two", "resp x", 5.0),
        (2, "p two", "resp z", 4.0),
        # prompt 3: single response -> nothing
        (3, "p three", "only", 9.0),
    ]
    df = spark.createDataFrame(
        rows, "prompt_id long, prompt string, response string, score double"
    )

    bw = {r["prompt_id"]: r for r in preference_pairs(df).collect()}
    assert set(bw) == {1, 2}
    assert (bw[1]["chosen"], bw[1]["rejected"]) == ("resp a", "resp c")
    assert bw[1]["margin"] == 2.0
    # tie at the top: "resp x" < "resp y" -> x is rank 1
    assert (bw[2]["chosen"], bw[2]["rejected"]) == ("resp x", "resp z")
    assert bw[2]["margin"] == 1.0

    br = preference_pairs(df, pairing="best_rest").collect()
    got = {(r["prompt_id"], r["rejected"]) for r in br}
    # prompt 2: x-vs-y has margin 0 -> dropped at the default min_margin
    assert got == {(1, "resp b"), (1, "resp c"), (2, "resp z")}
    assert all(r["chosen"] in ("resp a", "resp x") for r in br)

    adj = preference_pairs(df, pairing="adjacent").collect()
    got = {(r["prompt_id"], r["chosen"], r["rejected"]) for r in adj}
    # prompt 2's adjacent pairs: (x,y) margin 0 -> dropped, (y,z) kept
    assert got == {
        (1, "resp a", "resp b"),
        (1, "resp b", "resp c"),
        (2, "resp y", "resp z"),
    }

    # min_margin raises the bar: only the margin-2 pair survives
    hi = preference_pairs(df, min_margin=1.5).collect()
    assert [(r["prompt_id"], r["margin"]) for r in hi] == [(1, 2.0)]

    with pytest.raises(ValueError, match="unknown pairing"):
        preference_pairs(df, pairing="zzz")

    bad = spark.createDataFrame(
        [(1, "p", "a", 1.0), (1, "p", "b", None)],
        "prompt_id long, prompt string, response string, score double",
    )
    with pytest.raises(Exception, match="NULL in score column"):
        preference_pairs(bad).collect()


def test_dpo_token_samples_paired_alignment(spark):
    """DPO token pairs ride sft_token_samples' contract: both sides
    tokenize under one tokenizer, each mask is 1 exactly over the
    response content subwords (prompt + headers are context), sides
    pivot onto one row keyed by the original pair id, and a pair id
    containing the '#' separator still splits on the LAST segment."""
    from jsonify2ai_spark.operators.bpe import bpe_encode_fast, train_bpe
    from jsonify2ai_spark.operators.sft import dpo_token_samples, preference_pairs

    cand = spark.createDataFrame(
        [
            (1, "the cat question", "on the mat answer", 3.0),
            (1, "the cat question", "bad reply", 1.0),
            (2, "hello there", "general kenobi", 2.0),
            (2, "hello there", "general grievous", 1.0),
        ],
        "prompt_id long, prompt string, response string, score double",
    )
    pairs = preference_pairs(cand)
    merges = train_bpe(
        cand.selectExpr("prompt_id as doc_id", "response as text"),
        num_merges=8,
    )
    out = {r["prompt_id"]: r for r in dpo_token_samples(pairs, merges).collect()}
    assert set(out) == {"1", "2"}  # pair key round-trips (as string)

    # masks align position-for-position and cover exactly the response
    enc = {
        r["doc_id"]: r["_t"]
        for r in bpe_encode_fast(
            spark.createDataFrame(
                [(1, "on the mat answer"), (2, "bad reply")],
                "doc_id long, text string",
            ),
            merges,
            out_col="_t",
        ).collect()
    }
    r1 = out["1"]
    assert len(r1["chosen_tokens"]) == len(r1["chosen_mask"]) == r1["n_chosen_tokens"]
    assert len(r1["rejected_tokens"]) == len(r1["rejected_mask"])
    chosen_masked = [
        t for t, m in zip(r1["chosen_tokens"], r1["chosen_mask"]) if m == 1
    ]
    rejected_masked = [
        t for t, m in zip(r1["rejected_tokens"], r1["rejected_mask"]) if m == 1
    ]
    assert chosen_masked == enc[1]   # exactly the chosen response's encode
    assert rejected_masked == enc[2]  # exactly the rejected response's
    # both sides share the prompt prefix (same tokenizer, same template)
    np = r1["n_chosen_tokens"] - len(enc[1])
    assert r1["chosen_tokens"][:np - 2] == r1["rejected_tokens"][:np - 2]

    # '#' inside the pair key: side still splits on the LAST segment
    weird = pairs.withColumn(
        "prompt_id", F.concat(F.lit("a#b-"), F.col("prompt_id").cast("string"))
    )
    wout = {r["prompt_id"] for r in dpo_token_samples(weird, merges).collect()}
    assert wout == {"a#b-1", "a#b-2"}


def test_purge_packed_bins_reslices_affected_bins_only(spark):
    """Boundary-based document removal from assembled sequences: affected
    bins rebuild from surviving members' own slices (eos rides along via
    doc_lens), masks re-slice in lockstep, tensor shapes are stable,
    untouched bins pass through byte-identical, fully-purged bins drop."""
    from jsonify2ai_spark.operators.packing import (
        concat_token_bins,
        pack_sequences,
        purge_packed_bins,
    )

    rows = [
        (i, list(range(i * 10, i * 10 + 3 + i % 3)), [1] * (3 + i % 3))
        for i in range(1, 9)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, token_ids array<bigint>, m array<int>"
    ).withColumn("_w", F.size("token_ids") + 1)
    packed = pack_sequences(df, budget=12, size_col="_w", id_col="doc_id", n_groups=2)
    bins = concat_token_bins(
        packed, eos_id=0, pad_to=12, with_boundaries=True, mask_col="m"
    )
    before = {(r["pack_group"], r["bin_idx"]): r.asDict() for r in bins.collect()}

    out = purge_packed_bins(bins, [4, 5], pad_to=12)
    after = {(r["pack_group"], r["bin_idx"]): r.asDict() for r in out.collect()}

    toks = {i: t for i, t, _m in rows}
    assert set(after) == set(before)  # no bin lost every member here
    for k, a in after.items():
        b = before[k]
        assert not ({4, 5} & set(a["doc_ids"]))
        assert len(a["input_ids"]) == len(b["input_ids"]) == 12
        assert len(a["loss_mask"]) == len(a["input_ids"])
        assert a["n_ids"] == sum(a["doc_lens"])
        assert a["n_docs"] == len(a["doc_ids"])
        # surviving members' runs are their ORIGINAL encodes + eos
        want = []
        for i in a["doc_ids"]:
            want += toks[i] + [0]
        assert a["input_ids"][: len(want)] == want
        assert all(t == 0 for t in a["input_ids"][len(want):])  # pad
        assert all(mk == 0 for mk in a["loss_mask"][a["n_ids"]:])
        if not ({4, 5} & set(b["doc_ids"])):
            assert a == b  # untouched bins byte-identical

    # a bin whose every member is purged disappears entirely
    some = next(iter(before.values()))
    gone = purge_packed_bins(bins, some["doc_ids"], pad_to=12)
    keys = {(r["pack_group"], r["bin_idx"]) for r in gone.collect()}
    assert (some["pack_group"], some["bin_idx"]) not in keys
    assert len(keys) == len(before) - 1

    # empty purge set: pass-through
    assert sorted(map(repr, purge_packed_bins(bins, []).collect())) == sorted(
        map(repr, bins.collect())
    )

    # branch parity (r16): the literal-InSet path (small sets) and the
    # broadcast-hash-set Arrow probe (large sets) are the same function —
    # force the UDF branch on the same tiny purge and pin row identity
    from jsonify2ai_spark.operators import packing as _packing

    _saved = _packing._PURGE_INSET_MAX
    try:
        _packing._PURGE_INSET_MAX = 0
        udf_out = purge_packed_bins(bins, [4, 5], pad_to=12)
        assert sorted(map(repr, udf_out.collect())) == sorted(
            map(repr, out.collect())
        )
    finally:
        _packing._PURGE_INSET_MAX = _saved

    # membership is string-typed: int inputs purge string-keyed stores
    sbins = bins.withColumn(
        "doc_ids", F.transform("doc_ids", lambda d: d.cast("string"))
    )
    sout = purge_packed_bins(sbins, [4, 5], pad_to=12)
    assert not any(
        {"4", "5"} & set(r["doc_ids"]) for r in sout.collect()
    )

    # boundaries are mandatory — locating members needs them
    import pytest

    with pytest.raises(ValueError, match="doc_ids"):
        purge_packed_bins(bins.drop("doc_ids", "doc_lens"), [4])


def test_semantic_pack_groups_locality_and_determinism(spark):
    """The md5-hyperplane bucket is deterministic (cluster-shape-free
    arithmetic), identical vectors always share a bucket, near-identical
    vectors almost always do while far vectors split, and
    pack_sequences(group_col=) fills bins from one bucket only."""
    import random

    import pytest

    from jsonify2ai_spark.operators.packing import (
        pack_sequences,
        semantic_pack_groups,
    )

    rng = random.Random(11)
    base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(6)]
    rows = []
    vid = 0
    for b in base:
        for _ in range(4):  # tight cluster around each base vector
            rows.append((vid, [x + rng.uniform(-0.01, 0.01) for x in b]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = semantic_pack_groups(df, n_bits=3, dim=16)
    got = {r["vec_id"]: r["pack_group"] for r in out.collect()}
    assert all(0 <= g < 8 for g in got.values())
    # determinism under repartition
    again = {
        r["vec_id"]: r["pack_group"]
        for r in semantic_pack_groups(df.repartition(5), n_bits=3, dim=16).collect()
    }
    assert again == got
    # locality: members of a tight cluster mostly collide (a boundary
    # can split a cluster, but not most of them)
    whole_clusters = sum(
        1 for c in range(6)
        if len({got[c * 4 + k] for k in range(4)}) == 1
    )
    assert whole_clusters >= 4
    # an exact duplicate vector ALWAYS collides
    dup = spark.createDataFrame(
        [(100, base[0]), (101, base[0])], "vec_id long, embedding array<double>"
    )
    d = {r["vec_id"]: r["pack_group"] for r in semantic_pack_groups(dup, n_bits=3, dim=16).collect()}
    assert d[100] == d[101]

    # group_col packing: every bin's members come from one bucket
    sized = out.withColumn("_w", F.lit(3).cast("bigint"))
    packed = pack_sequences(
        sized, budget=7, size_col="_w", id_col="vec_id", group_col="pack_group"
    )
    for r in packed.collect():
        assert r["pack_group"] == got[r["vec_id"]]

    with pytest.raises(ValueError, match="n_bits"):
        semantic_pack_groups(df, n_bits=0)


def test_ppl_buckets_ccnet_split(spark):
    """CCNet head/middle/tail: equal-mass bands up to tie granularity,
    head holds the most reference-like documents (lower ppl than tail by
    construction), cutoffs derive from the exact rounded-ppl CDF (no
    global sort), assignment is deterministic under repartition, and the
    bucket column composes with a plain filter as the CCNet keep rule."""
    import pytest

    from jsonify2ai_spark.operators.textstats import ppl_buckets

    # a GRADIENT of reference-likeness: doc i swaps i%12 of its 12 words
    # for novel soup, so ppl spreads over many distinct values; the last
    # 15 docs are pure novel-word soup (count-0 smoothing -> max ppl)
    ref_words = "the quick brown fox jumps over a lazy dog daily".split()
    rows = []
    for i in range(30):
        novel = i % 12
        words = [f"zz{i}x{j}" for j in range(novel)] + [
            ref_words[(i + j) % 10] for j in range(12 - novel)
        ]
        rows.append((i, " ".join(words)))
    for i in range(30, 45):
        rows.append((i, " ".join(f"zz{i}x{j}" for j in range(12))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ref = docs.filter(F.col("doc_id") < 10)

    out = ppl_buckets(docs, ref, n_buckets=3)
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == 45
    masses = [sum(1 for r in got.values() if r["bucket"] == b) for b in (0, 1, 2)]
    assert sum(masses) == 45
    assert all(m >= 9 for m in masses)  # equal thirds up to ties
    # band ordering: every head ppl <= every tail ppl
    assert max(
        r["ppl"] for r in got.values() if r["bucket"] == 0
    ) <= min(r["ppl"] for r in got.values() if r["bucket"] == 2)
    # the novel-soup docs are all tail
    assert all(got[i]["bucket"] == 2 for i in range(30, 45))
    assert {r["bucket_label"] for r in got.values()} == {"head", "middle", "tail"}

    again = {
        r["doc_id"]: (r["bucket"], r["ppl"])
        for r in ppl_buckets(docs.repartition(7), ref, n_buckets=3).collect()
    }
    assert again == {k: (v["bucket"], v["ppl"]) for k, v in got.items()}

    # the CCNet policy is a filter over the column
    kept = ppl_buckets(docs, ref, n_buckets=3).filter(F.col("bucket") < 2)
    assert kept.count() == 45 - masses[2]

    with pytest.raises(ValueError, match="n_buckets"):
        ppl_buckets(docs, ref, n_buckets=1)


def test_memorization_probe(spark):
    """Verbatim k-gram audit: a planted verbatim extract reads rate 1.0
    with its full length as the span; novel text reads 0; a candidate
    below gram resolution reports zero grams; a half-memorized candidate
    localizes the span; determinism under repartition."""
    import pytest

    from jsonify2ai_spark.operators.dedup import memorization_probe

    corpus = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(30))) for i in range(10)],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [
            (1, " ".join(f"w{(3 * 7 + j) % 40}" for j in range(12))),
            (2, " ".join(f"nv{j}" for j in range(12))),
            (3, "short text"),
            (4, " ".join(f"w{(5 * 7 + j) % 40}" for j in range(8))
             + " " + " ".join(f"nv{j}" for j in range(8))),
        ],
        "cand_id long, text string",
    )
    out = {r["cand_id"]: r.asDict() for r in memorization_probe(cands, corpus, n=8).collect()}
    assert out[1]["hit_rate"] == 1.0 and out[1]["longest_span_tokens"] == 12
    assert out[2]["n_hits"] == 0 and out[2]["longest_span_tokens"] == 0
    assert out[3]["n_grams"] == 0 and out[3]["hit_rate"] == 0.0
    # exactly the first 8 words are verbatim: one hit gram, span == n
    assert out[4]["n_hits"] == 1 and out[4]["longest_span_tokens"] == 8
    assert out[4]["hit_rate"] == round(1 / 9, 4)

    again = {
        r["cand_id"]: r.asDict()
        for r in memorization_probe(
            cands.repartition(3), corpus.repartition(5), n=8
        ).collect()
    }
    assert again == out

    with pytest.raises(ValueError, match="n must be"):
        memorization_probe(cands, corpus, n=1)


def test_pack_sequences_order_col_semantic_adjacency(spark):
    """order_col walks the next-fit fold in (order, id) order so similar
    documents sit ADJACENT inside a bin (the within-sequence half of the
    ICP layout); semantic_pack_groups(order_out=) supplies the 1-D
    projection; default behavior (no order_col) is unchanged."""
    import random

    from jsonify2ai_spark.operators.packing import (
        pack_sequences,
        semantic_pack_groups,
    )

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    g = semantic_pack_groups(df, n_bits=2, dim=16, order_out="sem_order")
    sized = g.withColumn("_w", F.lit(4).cast("bigint"))
    packed = pack_sequences(
        sized, budget=12, size_col="_w", id_col="doc_id",
        group_col="pack_group", order_col="sem_order",
    )
    got = packed.collect()
    # within (group, bin): walking rows in fold order means bins are
    # CONTIGUOUS runs of the (order, id) sort — verify bin boundaries
    # respect the projection order inside every group
    by_group = {}
    for r in got:
        by_group.setdefault(r["pack_group"], []).append(r)
    assert len(by_group) >= 2
    for grp, rows_g in by_group.items():
        rows_g.sort(key=lambda r: (r["sem_order"], r["doc_id"]))
        bins_seen = [r["bin_idx"] for r in rows_g]
        # bin indexes are non-decreasing along the projection order
        assert bins_seen == sorted(bins_seen), (grp, bins_seen)

    # default path unchanged: no order_col == id-order fold
    a = pack_sequences(sized, budget=12, size_col="_w", id_col="doc_id",
                       group_col="pack_group")
    b = pack_sequences(sized.drop("sem_order"), budget=12, size_col="_w",
                       id_col="doc_id", group_col="pack_group")
    assert sorted((r["doc_id"], r["bin_idx"]) for r in a.collect()) == \
           sorted((r["doc_id"], r["bin_idx"]) for r in b.collect())


def test_semantic_pack_groups_dim_mismatch_raises(spark):
    """Review finding, pinned: a dim mismatch raises plan-embedded
    instead of NULL-propagating every bucket into one sequential NULL
    group."""
    import pytest

    from jsonify2ai_spark.operators.packing import semantic_pack_groups

    df = spark.createDataFrame(
        [(1, [0.1] * 32)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="embedding length 32 != dim=64"):
        semantic_pack_groups(df, n_bits=2).collect()


def test_doremi_mixture_weights(spark):
    """DoReMi with unigram proxies: a domain carrying vocabulary the
    reference lacks (high excess log-likelihood) up-weights past its
    token share; a reference-like domain shrinks; weights sum to 1;
    a huge temperature collapses to corpus proportions; τ<=0 raises."""
    import pytest

    from jsonify2ai_spark.operators.sampling import doremi_mixture_weights

    common = "the quick brown fox jumps over a lazy dog daily".split()
    rows = []
    for i in range(20):  # reference-like domain: pure common vocabulary
        rows.append((i, "web", " ".join(common[(i + j) % 10] for j in range(10))))
    for i in range(20, 40):  # specialized domain: FREQUENT in-domain jargon
        # (repeated across the domain's docs — a unigram proxy reads
        # singletons as surprising under the domain's OWN model too)
        rows.append((i, "code", " ".join(f"fn{j}" for j in range(8)) + " the a"))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    ref = docs.filter(F.col("source") == "web").limit(10)

    out = {r["source"]: r.asDict() for r in
           doremi_mixture_weights(docs, ref, domain_col="source").collect()}
    assert set(out) == {"web", "code"}
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-4
    assert out["code"]["excess_logprob"] > out["web"]["excess_logprob"]
    assert out["code"]["weight"] > out["code"]["token_share"]  # upweighted
    assert out["web"]["weight"] < out["web"]["token_share"]

    # τ -> ∞ forgets excess: weights == token shares
    flat = {r["source"]: r for r in doremi_mixture_weights(
        docs, ref, domain_col="source", temperature=1e9).collect()}
    for s in flat:
        assert abs(flat[s]["weight"] - flat[s]["token_share"]) < 1e-3

    again = {r["source"]: r.asDict() for r in doremi_mixture_weights(
        docs.repartition(7), ref, domain_col="source").collect()}
    assert again == out

    with pytest.raises(ValueError, match="temperature"):
        doremi_mixture_weights(docs, ref, temperature=0)


# ---------------------------------------------------------------------------
# corpus_diff (snapshot lineage)
# ---------------------------------------------------------------------------


def test_corpus_diff_statuses(spark):
    from jsonify2ai_spark.operators.inventory import (
        corpus_diff,
        corpus_diff_summary,
    )

    old = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "kept  as-is"), (4, "gone")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "alpha beta CHANGED"),
            (2, "gamma   delta"),  # whitespace-only reflow -> unchanged
            (3, "kept as-is"),
            (5, "brand new"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict()
           for r in corpus_diff(old, new, include_fingerprints=True).collect()}
    assert out[1]["status"] == "changed"
    assert out[2]["status"] == "unchanged"  # fingerprint normalizes ws
    assert out[3]["status"] == "unchanged"
    assert out[4]["status"] == "removed" and out[4]["new_fingerprint"] is None
    assert out[5]["status"] == "added" and out[5]["old_fingerprint"] is None
    assert len(out) == 5

    summary = {r["status"]: r["n_docs"] for r in
               corpus_diff_summary(old, new).collect()}
    assert summary == {
        "added": 1, "removed": 1, "changed": 1, "unchanged": 2, "total": 5,
    }

    # determinism under repartition — join is keyed, statuses stable
    again = {r["doc_id"]: r.asDict() for r in
             corpus_diff(old.repartition(5), new.repartition(3),
                         include_fingerprints=True).collect()}
    assert again == out

    # default output keeps the q87 contract: (id, status) only
    assert corpus_diff(old, new).columns == ["doc_id", "status"]


# ---------------------------------------------------------------------------
# excess_loss_select (RHO-style document selection)
# ---------------------------------------------------------------------------


def test_excess_loss_select(spark):
    from jsonify2ai_spark.operators.sampling import excess_loss_select

    # target domain speaks "code" jargon; general reference is plain prose
    rows = []
    for i in range(10):
        rows.append((i, "fn struct impl trait " + f"tok{i % 3}"))
    for i in range(10, 20):
        rows.append((i, "the quick brown fox jumps " + f"tok{i % 3}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter("doc_id < 10")
    general = docs.filter("doc_id >= 10")

    out = {r["doc_id"]: r.asDict() for r in
           excess_loss_select(docs, target, general, keep_frac=0.5).collect()}
    assert len(out) == 20
    # every code doc scores higher excess than every prose doc, and the
    # top half selected == exactly the code docs
    code_excess = [out[i]["excess_logprob"] for i in range(10)]
    prose_excess = [out[i]["excess_logprob"] for i in range(10, 20)]
    assert min(code_excess) > max(prose_excess)
    assert all(out[i]["selected"] for i in range(10))
    assert not any(out[i]["selected"] for i in range(10, 20))

    # floor convention: keep_frac below one distinct value's mass still
    # keeps the whole tie group (all 10 code docs share scores by %3 class)
    tiny = {r["doc_id"]: r["selected"] for r in
            excess_loss_select(docs, target, general, keep_frac=0.05).collect()}
    assert sum(tiny.values()) >= 1
    assert all(not tiny[i] for i in range(10, 20))

    # determinism under repartition
    again = {r["doc_id"]: r.asDict() for r in
             excess_loss_select(docs.repartition(7), target, general,
                                keep_frac=0.5).collect()}
    assert again == out

    import pytest as _pytest
    with _pytest.raises(ValueError, match="keep_frac"):
        excess_loss_select(docs, target, general, keep_frac=0.0)


# ---------------------------------------------------------------------------
# decontaminate_multi + distinct_ngram_report
# ---------------------------------------------------------------------------


def test_decontaminate_multi_matches_per_benchmark(spark):
    from jsonify2ai_spark.operators.dedup import (
        decontaminate,
        decontaminate_multi,
        decontamination_report,
    )

    leak_a = "alpha beta gamma delta epsilon zeta eta theta"
    leak_b = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, f"prefix {leak_a} suffix words here"),
            (2, f"{leak_a} and also {leak_b} in one doc"),
            (3, "totally clean document with no overlap at all whatsoever ok"),
            (4, f"tail mention {leak_b} only"),
        ],
        "doc_id long, text string",
    )
    benches = {
        "suiteA": spark.createDataFrame([(0, leak_a)], "qid long, text string"),
        "suiteB": spark.createDataFrame([(0, leak_b)], "qid long, text string"),
    }
    hits = {(r["doc_id"], r["benchmark"]): r["n_shared_ngrams"]
            for r in decontaminate_multi(docs, benches, n=8).collect()}
    assert set(hits) == {(1, "suiteA"), (2, "suiteA"), (2, "suiteB"), (4, "suiteB")}

    # parity with the single-benchmark operator, per suite
    for name, bench in benches.items():
        solo = {r["doc_id"]: r["n_shared_ngrams"]
                for r in decontaminate(docs, bench, n=8).collect()
                if r["contaminated"]}
        multi = {d: c for (d, b), c in hits.items() if b == name}
        assert multi == solo

    # a CLEAN suite must still get its zero row (review-found)
    benches_plus = dict(
        benches,
        clean=spark.createDataFrame(
            [(0, "completely disjoint benchmark content nine words long total")],
            "qid long, text string",
        ),
    )
    rep = {r["benchmark"]: r.asDict()
           for r in decontamination_report(docs, benches_plus, n=8).collect()}
    assert set(rep) == {"suiteA", "suiteB", "clean"}
    assert rep["suiteA"]["n_contaminated"] == 2
    assert rep["suiteB"]["n_contaminated"] == 2
    assert rep["suiteA"]["pct_contaminated"] == 0.5
    assert rep["clean"]["n_contaminated"] == 0
    assert rep["clean"]["pct_contaminated"] == 0.0

    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-empty"):
        decontaminate_multi(docs, {}, n=8)


def test_distinct_ngram_report_detects_mode_collapse(spark):
    from jsonify2ai_spark.operators.textstats import distinct_ngram_report

    rows = (
        # collapsed generator: same sentence over and over
        [(i, "gen", "the same old phrase again") for i in range(10)]
        # diverse source: all-different sentences
        + [(i + 100, "human", f"fresh sentence number {i} varies a lot {i * 7}")
           for i in range(10)]
        + [(200, "gen", "xy")]  # 1 token: no bigrams/trigrams contributed
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {(r["source"], r["n"]): r.asDict()
           for r in distinct_ngram_report(docs, ns=(1, 2, 3), by="source").collect()}
    assert len(out) == 6
    # collapsed source: 10 copies of 5 tokens + 1 single-token doc
    assert out[("gen", 1)]["total_ngrams"] == 51
    assert out[("gen", 1)]["distinct_ngrams"] == 6
    assert out[("gen", 2)]["total_ngrams"] == 40  # the xy doc adds none
    assert out[("gen", 2)]["distinct_ngrams"] == 4
    # diversity separates the sources at every n
    for n in (1, 2, 3):
        assert (out[("human", n)]["distinct_ratio"]
                > out[("gen", n)]["distinct_ratio"])

    # global card (by=None): one row per n
    glob = {r["n"]: r for r in distinct_ngram_report(docs, ns=(2,)).collect()}
    assert set(glob) == {2}
    assert glob[2]["total_ngrams"] == out[("gen", 2)]["total_ngrams"] + out[("human", 2)]["total_ngrams"]


def test_filter_agreement_contingency(spark):
    from jsonify2ai_spark.operators.textstats import filter_agreement

    # hand-built flags: a and b agree on everything; c is independent
    flags = spark.createDataFrame(
        [
            (1, True, True, True),
            (2, True, True, False),
            (3, False, False, True),
            (4, False, False, False),
            (5, True, True, True),
            (6, False, None, True),  # NULL counts as drop
        ],
        "doc_id long, a boolean, b boolean, c boolean",
    )
    out = {(r["gate_a"], r["gate_b"]): r.asDict()
           for r in filter_agreement(flags, ["a", "b", "c"]).collect()}
    assert len(out) == 6  # 3 diagonal + 3 pairs

    ab = out[("a", "b")]
    assert ab["n_both_keep"] == 3 and ab["n_both_drop"] == 3
    assert ab["n_drop_a_only"] == 0 and ab["n_drop_b_only"] == 0
    assert ab["drop_jaccard"] == 1.0  # redundant gates

    ac = out[("a", "c")]
    assert ac["n_both_keep"] == 2 and ac["n_both_drop"] == 1
    assert ac["n_drop_a_only"] == 2 and ac["n_drop_b_only"] == 1
    assert ac["drop_jaccard"] == 0.25

    aa = out[("a", "a")]
    assert aa["n_both_keep"] == 3 and aa["n_both_drop"] == 3
    assert aa["n_drop_a_only"] == aa["n_drop_b_only"] == 0

    # all-keep gate pair: no drops anywhere -> NULL jaccard
    allkeep = spark.createDataFrame(
        [(1, True, True), (2, True, True)], "doc_id long, x boolean, y boolean"
    )
    xy = {(r["gate_a"], r["gate_b"]): r
          for r in filter_agreement(allkeep, ["x", "y"]).collect()}
    assert xy[("x", "y")]["drop_jaccard"] is None

    # separator-hostile flag names must not collide (index-keyed aggs)
    hostile = flags.selectExpr(
        "doc_id", "a AS `a__b`", "b AS `b__c`", "c AS `a`", "a AS `c`"
    )
    h = {(r["gate_a"], r["gate_b"]): r["n_both_keep"]
         for r in filter_agreement(hostile, ["a", "a__b", "b__c", "c"]).collect()}
    assert len(h) == 10
    assert h[("a", "a__b")] == 2   # c-column (aliased 'a') vs a-column
    assert h[("a__b", "b__c")] == 3  # original a vs original b

    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-empty"):
        filter_agreement(flags, [])


def test_best_of_n_selection(spark):
    import pytest as _pytest

    from jsonify2ai_spark.operators.sft import best_of_n

    cands = spark.createDataFrame(
        [
            (1, "p1", "mediocre answer", 0.5),
            (1, "p1", "great answer", 0.9),
            (1, "p1", "bad answer", 0.1),
            (2, "p2", "only answer", 0.4),
            (3, "p3", "tie b", 0.7),
            (3, "p3", "tie a", 0.7),
        ],
        "prompt_id long, prompt string, response string, score double",
    )
    out = {r["prompt_id"]: r.asDict() for r in best_of_n(cands).collect()}
    assert out[1]["response"] == "great answer"
    assert out[1]["n_candidates"] == 3
    assert abs(out[1]["margin"] - 0.4) < 1e-9
    assert out[2]["response"] == "only answer" and out[2]["margin"] is None
    # tie: response asc wins deterministically, margin 0
    assert out[3]["response"] == "tie a" and out[3]["margin"] == 0.0

    # min_score floors the winner; min_margin drops ties AND singletons
    floored = {r["prompt_id"] for r in best_of_n(cands, min_score=0.45).collect()}
    assert floored == {1, 3}
    separated = {r["prompt_id"] for r in best_of_n(cands, min_margin=0.1).collect()}
    assert separated == {1}

    # NULL score raises in-plan
    bad = spark.createDataFrame(
        [(9, "p", "x", None)], "prompt_id long, prompt string, response string, score double"
    )
    with _pytest.raises(Exception, match="NULL in score"):
        best_of_n(bad).collect()


def test_soft_dedup_weights(spark):
    from jsonify2ai_spark.operators.dedup import soft_dedup_weights

    base = "the quick brown fox jumps over the lazy dog tonight"
    rows = [(i, base) for i in range(10)]  # 10 exact copies: common content
    rows += [(100 + i, f"unique document alpha{i} beta{i} gamma{i} delta{i} epsilon{i}")
             for i in range(5)]
    rows.append((999, ""))  # no shingles
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in soft_dedup_weights(docs).collect()}
    assert len(out) == 16
    # copies share commonness 10; uniques have commonness 1
    for i in range(10):
        assert out[i]["commonness"] == 10.0
    for i in range(5):
        assert out[100 + i]["commonness"] == 1.0
        assert out[100 + i]["weight"] > out[0]["weight"]
    # copies weigh 1/10th of uniques under beta=1
    assert abs(out[0]["weight"] * 10 - out[100]["weight"]) < 1e-4
    # normalization: mean weight over weighted docs = 1
    ws = [r["weight"] for r in out.values() if r["weight"] is not None]
    assert abs(sum(ws) / len(ws) - 1.0) < 1e-4
    # empty doc: no content to weigh
    assert out[999]["n_shingles"] == 0 and out[999]["weight"] is None

    # beta=0: everything weighs exactly 1
    flat = soft_dedup_weights(docs.filter("doc_id < 999"), beta=0.0)
    assert {r["weight"] for r in flat.collect()} == {1.0}


def test_mine_vector_negatives_parity_and_exclusion(spark):
    from jsonify2ai_spark.operators.search import knn_brute, mine_vector_negatives

    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # closest to 1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.7, 0.3, 0.0]),
        (5, [0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    pairs = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0], 1), (1, [1.0, 0.0, 0.0], 2)],  # two positives
        "query_id long, query_vec array<double>, positive_id long",
    )
    out = [r.asDict() for r in
           mine_vector_negatives(pairs, emb, k=2).orderBy("rank").collect()]
    ids = [r["vec_id"] for r in out]
    assert 1 not in ids and 2 not in ids  # both positives excluded
    assert ids == [4, 3]  # cosine order among the rest
    assert [r["rank"] for r in out] == [1, 2]

    # score parity with the brute-force baseline
    ref = {r["vec_id"]: r["score"] for r in
           knn_brute(emb, [1.0, 0.0, 0.0], k=5).collect()}
    for r in out:
        assert r["score"] == ref[r["vec_id"]]


def test_mixture_epoch_plan_flags(spark):
    from jsonify2ai_spark.operators.sampling import mixture_epoch_plan

    rows = [(i, "big", "tok " * 100) for i in range(50)]       # 5000+ tokens
    rows += [(100 + i, "tiny", "tok " * 10) for i in range(2)]  # 20 tokens
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r.asDict()
           for r in mixture_epoch_plan(docs, token_budget=10_000, alpha=0.5).collect()}
    # alpha-smoothing hands the tiny source far more than its share:
    # it must cycle many epochs and be flagged; the big source is not
    assert out["tiny"]["over_repeated"] and out["tiny"]["epochs"] > 4.0
    assert not out["big"]["over_repeated"]
    # plan arithmetic: planned = budget * p_target, epochs = planned/n
    for s in out:
        r = out[s]
        assert abs(r["planned_tokens"] - 10_000 * r["p_target"]) <= 0.5
        assert abs(r["epochs"] - (10_000 * r["p_target"] / r["n_tokens"])) < 1e-3


def test_signal_correlation(spark):
    import pytest as _pytest

    from jsonify2ai_spark.operators.textstats import signal_correlation

    rows = [(float(i), float(2 * i + 3), float(-i), 1.0, None if i % 2 else float(i))
            for i in range(20)]
    df = spark.createDataFrame(
        rows, "x double, linear double, anti double, const double, holey double"
    )
    out = {(r["signal_a"], r["signal_b"]): r.asDict()
           for r in signal_correlation(df, ["x", "linear", "anti", "const"]).collect()}
    assert len(out) == 10
    assert out[("linear", "x")]["r"] == 1.0      # exact linear
    assert out[("anti", "x")]["r"] == -1.0       # exact inverse
    assert out[("x", "x")]["r"] == 1.0           # diagonal
    assert out[("const", "x")]["r"] is None      # zero variance -> NULL
    assert out[("linear", "x")]["n"] == 20

    # pairwise deletion: NULLs shrink n for that pair only
    holey = {(r["signal_a"], r["signal_b"]): r
             for r in signal_correlation(df, ["holey", "x"]).collect()}
    assert holey[("holey", "x")]["n"] == 10
    assert holey[("holey", "x")]["r"] == 1.0     # non-null part is y=x
    assert holey[("x", "x")]["n"] == 20

    # determinism under repartition (the decimal-sum discipline)
    again = {(r["signal_a"], r["signal_b"]): r.asDict()
             for r in signal_correlation(
                 df.repartition(7), ["x", "linear", "anti", "const"]).collect()}
    assert again == out

    with _pytest.raises(ValueError, match="non-empty"):
        signal_correlation(df, [])


def test_best_of_n_feeds_sft_render_chain(spark):
    """Composition pin: best_of_n winners become 2-turn conversations
    (user prompt, assistant winner) that render_sft_samples consumes
    directly — the rejection-sampling -> SFT assembly path is one
    select away, and the loss-mask spans cover exactly the winner."""
    from jsonify2ai_spark.operators.sft import best_of_n, render_sft_samples

    cands = spark.createDataFrame(
        [
            (1, "what is spark?", "a distributed engine", 0.9),
            (1, "what is spark?", "no idea", 0.1),
            (2, "what is duckdb?", "an in-process olap db", 0.8),
        ],
        "prompt_id long, prompt string, response string, score double",
    )
    winners = best_of_n(cands)
    turns = winners.selectExpr(
        "prompt_id AS conv_id", "0 AS turn_idx", "'user' AS role",
        "prompt AS text",
    ).union(
        winners.selectExpr(
            "prompt_id AS conv_id", "1 AS turn_idx", "'assistant' AS role",
            "response AS text",
        )
    )
    rendered = {r["conv_id"]: r.asDict()
                for r in render_sft_samples(turns).collect()}
    assert len(rendered) == 2
    for cid, resp in ((1, "a distributed engine"), (2, "an in-process olap db")):
        r = rendered[cid]
        assert resp in r["text"] and "no idea" not in r["text"]
        assert r["n_turns"] == 2 and r["n_mask_turns"] == 1
        # the single mask span ("start:end" CSV) slices out the winner
        spans = [tuple(map(int, s.split(":")))
                 for s in r["mask_spans"].split(",")]
        assert len(spans) == 1
        start, end = spans[0]
        assert r["text"][start:end] == resp


def test_cluster_safe_splits_leakage_free(spark):
    from jsonify2ai_spark.operators.sampling import (
        assign_splits,
        cluster_safe_splits,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(30)], "doc_id long, text string"
    )
    # pair graph: {1,2,3} chain transitively; {10,11}; rest singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a long, b long"
    )
    out = {r["doc_id"]: r.asDict()
           for r in cluster_safe_splits(docs, pairs, salt="t").collect()}
    assert len(out) == 30
    # every cluster member shares the rep AND the split
    assert out[1]["cluster_rep"] == out[2]["cluster_rep"] == out[3]["cluster_rep"] == 1
    assert out[1]["split"] == out[2]["split"] == out[3]["split"]
    assert out[10]["cluster_rep"] == out[11]["cluster_rep"] == 10
    assert out[10]["split"] == out[11]["split"]
    # singletons are their own cluster and match plain assign_splits
    plain = {r["doc_id"]: r["split"] for r in assign_splits(
        docs.select("doc_id"), "doc_id", salt="t").collect()}
    for i in range(30):
        if i not in (2, 3, 11):
            assert out[i]["cluster_rep"] == i
            assert out[i]["split"] == plain[i]
    # a near-dup member may MOVE relative to doc-keyed assignment (it
    # follows its rep) — that movement is exactly the leakage fix
    assert out[2]["split"] == plain[1] and out[3]["split"] == plain[1]


def test_semantic_domain_mixture(spark):
    from jsonify2ai_spark.operators.sampling import (
        mixture_weights,
        semantic_domain_mixture,
    )

    # two well-separated embedding clusters; cluster B has far fewer tokens
    rows, vecs = [], []
    for i in range(12):
        rows.append((i, "alpha " * 50))            # big domain
        vecs.append((i, [1.0] * 8 + [0.0] * 56))
    for i in range(12, 16):
        rows.append((i, "beta " * 5))              # tail domain
        vecs.append((i, [-1.0] * 8 + [0.0] * 56))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")

    out = semantic_domain_mixture(docs, emb, alpha=0.5, n_bits=2)
    got = {r["domain"]: r.asDict() for r in out.collect()}
    # opposite vectors cannot share a bucket (every plane flips sign
    # unless its dot rounds to exactly 0), so >= 2 discovered domains
    assert len(got) >= 2
    # total token mass conserved across discovered domains
    assert sum(r["n_tokens"] for r in got.values()) == 12 * 50 + 4 * 5
    # alpha-smoothing up-weights the tail domain (weight > 1), shrinks
    # the dominant one — same invariant as labeled mixture_weights
    tail = min(got.values(), key=lambda r: r["n_tokens"])
    big = max(got.values(), key=lambda r: r["n_tokens"])
    assert tail["weight"] > 1.0 > big["weight"]

    # label-parity: with the buckets as labels, mixture_weights agrees
    from jsonify2ai_spark.operators.packing import semantic_pack_groups

    lab = docs.join(
        semantic_pack_groups(emb, n_bits=2, out_col="domain", seed="domains-v1")
        .selectExpr("vec_id AS doc_id", "domain"),
        "doc_id",
    )
    ref = {r["domain"]: r.asDict()
           for r in mixture_weights(lab, 0.5, "text", "domain").collect()}
    assert ref == got


def test_corpus_diff_null_text_statuses(spark):
    """Presence decides added/removed; NULL fingerprints compare
    null-safely (review-found: a deleted NULL-text doc read 'added')."""
    from jsonify2ai_spark.operators.inventory import corpus_diff

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "real text")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, None), (3, None), (4, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert out == {
        1: "removed",    # NULL-text doc present only in old
        2: "unchanged",  # NULL == NULL, null-safe
        3: "changed",    # real -> NULL
        4: "added",      # NULL-text doc present only in new
    }


def test_similarity_block_gemm_matches_expr_blocked(spark, tables):
    """strategy='block_gemm' (r14): the per-block GEMM emits the SAME
    pair set with the SAME 6dp scores as the expr-blocked form — the
    contract that lets a bucketed near-dup pass swap the interpreted
    per-pair fold for one matmul per block. NULL vectors and NULL ids
    drop exactly as the expr path's NULL-propagation drops them, and
    the strategy refuses to run without a block key."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    emb = (
        tables["embeddings"]
        .select("vec_id", "embedding")
        .limit(60)
        .withColumn("_blk", (F.col("vec_id") % 4).cast("long"))
    )
    # null fodder: one NULL vector, one NULL id (type-matched)
    nulls = spark.createDataFrame(
        [(9001, None, 1), (None, [0.5] * 64, 1)],
        "vec_id long, embedding array<double>, _blk long",
    )
    emb = emb.unionByName(nulls)
    expr = {
        (r["a"], r["b"]): r["score"]
        for r in similarity_self_join(
            emb, 0.2, block_col="_blk", strategy="expr"
        ).collect()
    }
    gemm = {
        (r["a"], r["b"]): r["score"]
        for r in similarity_self_join(
            emb, 0.2, block_col="_blk", strategy="block_gemm"
        ).collect()
    }
    assert gemm == expr and len(gemm) > 0

    with _pytest.raises(ValueError, match="block_gemm"):
        similarity_self_join(emb, 0.2, strategy="block_gemm")


def test_cluster_store_incremental_equals_full_recompute(spark, tmp_path):
    """ClusterStore (r15): persisted rep mapping with O(delta) merges —
    incremental reps after a sequence of merge_delta calls must equal a
    single connected_components run over the UNION of every edge set
    (the q136/q152 split-invariance shape, applied to clustering). The
    edge split is adversarial by construction: deltas bridge existing
    components, introduce new nodes that BECOME the merged rep (forcing
    overlay entries on old reps), chain two merges so the overlay must
    compose, and carry a self-loop-only node."""
    import random

    from jsonify2ai_spark.operators.dedup import ClusterStore, connected_components

    rng = random.Random(29)
    # a pool of edges over ~120 nodes with several multi-edge components
    nodes = list(range(10, 130))
    all_edges = set()
    for _ in range(140):
        a, b = rng.sample(nodes, 2)
        all_edges.add((min(a, b), max(a, b)))
    all_edges = sorted(all_edges)
    base_e = all_edges[: len(all_edges) // 2]
    delta1 = all_edges[len(all_edges) // 2 : 3 * len(all_edges) // 4]
    delta2 = all_edges[3 * len(all_edges) // 4 :]
    # force the interesting shapes: a NEW node with the smallest id in
    # its component (must become the rep and supersede an old one), a
    # bridge between two base components, and a self-loop-only node
    delta1 = delta1 + [(1, base_e[0][0]), (base_e[0][1], base_e[-1][0])]
    delta2 = delta2 + [(2, 1), (999, 999)]

    def df_of(edges):
        return spark.createDataFrame(edges, "a long, b long")

    path = str(tmp_path / "cstore")
    store = ClusterStore.build(df_of(base_e), path)
    store = store.merge_delta(df_of(delta1), "d1")
    store = store.merge_delta(df_of(delta2), "d2")

    got = {(r["node"], r["cluster_rep"]) for r in store.reps().collect()}
    want = {
        (r["node"], r["cluster_rep"])
        for r in connected_components(
            df_of(base_e + delta1 + delta2)
        ).collect()
    }
    assert got == want and len(got) > 100

    # redelivery contract: committed run_id raises; replace=True with the
    # same delta is idempotent
    import pytest

    with pytest.raises(ValueError, match="already committed"):
        store.merge_delta(df_of(delta2), "d2")
    store = store.merge_delta(df_of(delta2), "d2", replace=True)
    assert {(r["node"], r["cluster_rep"]) for r in store.reps().collect()} == want

    # empty delta is a no-op (no segment committed)
    assert store.merge_delta(df_of([]).limit(0), "d3") is store

    # compact folds segments + overlay, results unchanged, dirs swapped
    import os

    store = store.compact()
    assert os.path.isdir(os.path.join(path, "nodes_v1"))
    assert not os.path.isdir(os.path.join(path, "nodes"))
    assert store._remap is None and store._segments == []
    assert {(r["node"], r["cluster_rep"]) for r in store.reps().collect()} == want

    # a fresh load serves identically
    re = ClusterStore.load(spark, path)
    assert {(r["node"], r["cluster_rep"]) for r in re.reps().collect()} == want

    # merge after compact still works (fresh overlay lineage)
    re = re.merge_delta(df_of([(3, 10)]), "d4")
    want2 = {
        (r["node"], r["cluster_rep"])
        for r in connected_components(
            df_of(base_e + delta1 + delta2 + [(3, 10)])
        ).collect()
    }
    assert {(r["node"], r["cluster_rep"]) for r in re.reps().collect()} == want2


def test_cluster_store_driver_merge_equals_distributed(spark, tmp_path, monkeypatch):
    """r16: merge_delta's driver-sized fast path (delta collected,
    contraction + min-label union-find + overlay/segment derivation in
    Python) must produce the SAME mapping as the distributed path —
    same reps, same segment membership, same overlay behavior — on the
    adversarial delta shapes (bridge, new-min rep, overlay composition,
    self-loop). SPARK_GRAFT_CLUSTER_DRIVER_MERGE=0 forces the
    distributed path for the twin build."""
    import random

    from jsonify2ai_spark.operators.dedup import ClusterStore

    rng = random.Random(31)
    nodes = list(range(10, 110))
    all_edges = set()
    for _ in range(120):
        a, b = rng.sample(nodes, 2)
        all_edges.add((min(a, b), max(a, b)))
    all_edges = sorted(all_edges)
    base_e = all_edges[: len(all_edges) // 2]
    delta1 = all_edges[len(all_edges) // 2 : 3 * len(all_edges) // 4] + [
        (1, base_e[0][0]), (base_e[0][1], base_e[-1][0]),
    ]
    delta2 = all_edges[3 * len(all_edges) // 4 :] + [(2, 1), (888, 888)]

    def df_of(edges):
        return spark.createDataFrame(edges, "a long, b long")

    def build(path):
        store = ClusterStore.build(df_of(base_e), path)
        store = store.merge_delta(df_of(delta1), "d1")
        return store.merge_delta(df_of(delta2), "d2")

    monkeypatch.delenv("SPARK_GRAFT_CLUSTER_DRIVER_MERGE", raising=False)
    drv = build(str(tmp_path / "cs_drv"))
    monkeypatch.setenv("SPARK_GRAFT_CLUSTER_DRIVER_MERGE", "0")
    dist = build(str(tmp_path / "cs_dist"))

    got_drv = {(r["node"], r["cluster_rep"]) for r in drv.reps().collect()}
    got_dist = {(r["node"], r["cluster_rep"]) for r in dist.reps().collect()}
    assert got_drv == got_dist and len(got_drv) > 80
    # same commit structure, not just the same read face: identical
    # segment membership and overlay entries
    assert drv._segments == dist._segments
    seg_drv = {
        (r["node"], r["rep0"], r["bucket"])
        for p in drv._parts[1:]
        for r in p.collect()
    }
    seg_dist = {
        (r["node"], r["rep0"], r["bucket"])
        for p in dist._parts[1:]
        for r in p.collect()
    }
    assert seg_drv == seg_dist
    rm_drv = (
        {(r["src_rep"], r["dst_rep"]) for r in drv._remap.collect()}
        if drv._remap is not None else set()
    )
    rm_dist = (
        {(r["src_rep"], r["dst_rep"]) for r in dist._remap.collect()}
        if dist._remap is not None else set()
    )
    assert rm_drv == rm_dist


def test_cluster_store_probe_prunes_buckets(spark, tmp_path, monkeypatch):
    """The membership probe must reach the mapping as a bucket partition
    prune — never a full-corpus scan (the store's O(delta) claim).
    Forces the at-scale directory layout: below the
    SPARK_GRAFT_STORE_PART_ROWS threshold, small writes land flat and
    the probe predicate pushes down to row groups instead (pinned by
    test_store_small_write_layout)."""
    import re as _re

    from jsonify2ai_spark.operators.dedup import ClusterStore

    monkeypatch.setenv("SPARK_GRAFT_STORE_PART_ROWS", "0")
    edges = [(i, i + 1) for i in range(0, 400, 2)]
    store = ClusterStore.build(
        spark.createDataFrame(edges, "a long, b long"), str(tmp_path / "cs")
    )
    probe = store.reps_of(spark.createDataFrame([(4,), (5,)], "node long"))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pruned = [
        f
        for f in _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        if "bucket" in f
    ]
    assert pruned, plan[:3000]
    got = {(r["node"], r["cluster_rep"]) for r in probe.collect()}
    assert got == {(4, 4), (5, 4)}


def test_store_small_write_layout(spark, tmp_path, monkeypatch):
    """The r15 layout-adaptive store write: below the
    SPARK_GRAFT_STORE_PART_ROWS threshold a partitioned store table
    lands FLAT (no partition directories — each dir costs ~15 ms of
    writer+commit overhead regardless of size, ~7 s per 256-cell band
    write at bench scale), with the partition keys as leading sort
    columns so probe predicates push down to parquet row groups. The
    pins: (a) no key=value dirs on disk, (b) the probe's key predicate
    reaches the scan as a PushedFilter, (c) results are IDENTICAL to
    the directory layout — including a MIXED store whose base is
    directory-partitioned and whose segment is flat."""
    import os as _os
    import re as _re

    from jsonify2ai_spark.operators.dedup import ClusterStore, NearDupStore

    edges = [(i, i + 1) for i in range(0, 400, 2)]
    edf = spark.createDataFrame(edges, "a long, b long")

    # directory layout (forced) = the reference answer
    monkeypatch.setenv("SPARK_GRAFT_STORE_PART_ROWS", "0")
    big = ClusterStore.build(edf, str(tmp_path / "cs_dir"))
    want = {(r["node"], r["cluster_rep"]) for r in big.reps().collect()}

    # small/flat layout
    monkeypatch.setenv("SPARK_GRAFT_STORE_PART_ROWS", "2000000")
    flat = ClusterStore.build(edf, str(tmp_path / "cs_flat"))
    nodes_dir = str(tmp_path / "cs_flat" / "nodes")
    assert not any(
        e.startswith("bucket=") for e in _os.listdir(nodes_dir)
    ), _os.listdir(nodes_dir)
    assert {(r["node"], r["cluster_rep"]) for r in flat.reps().collect()} == want

    # probe predicate pushes down to the flat scan
    probe = flat.reps_of(spark.createDataFrame([(4,), (5,)], "node long"))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pushed = [
        f
        for f in _re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        if "bucket" in f
    ]
    assert pushed, plan[:3000]
    assert {(r["node"], r["cluster_rep"]) for r in probe.collect()} == {
        (4, 4), (5, 4),
    }

    # mixed layouts in ONE store: dir-partitioned base + flat segment
    monkeypatch.setenv("SPARK_GRAFT_STORE_PART_ROWS", "0")
    mixed = ClusterStore.build(edf, str(tmp_path / "cs_mixed"))
    monkeypatch.setenv("SPARK_GRAFT_STORE_PART_ROWS", "2000000")
    mixed = mixed.merge_delta(
        spark.createDataFrame([(1, 2), (1000, 1001)], "a long, b long"), "d1"
    )
    from jsonify2ai_spark.operators.dedup import connected_components

    want2 = {
        (r["node"], r["cluster_rep"])
        for r in connected_components(
            spark.createDataFrame(
                edges + [(1, 2), (1000, 1001)], "a long, b long"
            )
        ).collect()
    }
    assert {
        (r["node"], r["cluster_rep"]) for r in mixed.reps().collect()
    } == want2

    # NearDupStore: flat band segment == the same clustering as the
    # dir layout, and no band=*/ dirs under the segment
    docs = spark.createDataFrame(
        [(i, f"some shared sentence body {i % 5} tail") for i in range(40)],
        "doc_id long, text string",
    )
    monkeypatch.setenv("SPARK_GRAFT_STORE_PART_ROWS", "0")
    nd_dir = NearDupStore.create(
        spark, str(tmp_path / "nd_dir"), num_hashes=32, bands=8
    ).add_batch(docs, "b0")
    want_nd = {(r["node"], r["cluster_rep"]) for r in nd_dir.reps().collect()}

    monkeypatch.setenv("SPARK_GRAFT_STORE_PART_ROWS", "2000000")
    nd_flat = NearDupStore.create(
        spark, str(tmp_path / "nd_flat"), num_hashes=32, bands=8
    ).add_batch(docs, "b0")
    seg_dir = str(tmp_path / "nd_flat" / "bands_incr" / "b0")
    assert not any(
        e.startswith("band=") for e in _os.listdir(seg_dir)
    ), _os.listdir(seg_dir)
    assert {
        (r["node"], r["cluster_rep"]) for r in nd_flat.reps().collect()
    } == want_nd


def test_neardup_store_batches_equal_all_at_once(spark, tmp_path):
    """NearDupStore (r15): three document batches ingested through
    add_batch must yield EXACTLY the clustering of minhash_lsh_pairs +
    connected_components over the whole corpus — LSH banding is
    per-document, so (within-batch collisions) ∪ (batch-vs-store
    probes) over time IS the all-at-once pair set. Also pinned:
    redelivery of a committed batch is a no-op, the probe join prunes
    to the batch's (band, prefix) partitions, and compact preserves
    the clustering."""
    from jsonify2ai_spark.operators.dedup import (
        NearDupStore,
        connected_components,
        minhash_lsh_pairs,
    )

    # overlapping near-dup texts across batches: shared sentences with
    # small edits so bucket collisions straddle the batch boundaries
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "spark shuffles partitions across the cluster during wide joins",
        "minhash signatures approximate jaccard similarity of shingle sets",
        "completely unrelated text about cooking pasta with fresh basil",
    ]
    rows = []
    for i in range(48):
        t = base[i % 4]
        if i % 3 == 1:
            t = t + " extra"
        if i % 7 == 2:
            t = "prefix " + t
        rows.append((i, t))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = dict(num_hashes=32, bands=8, shingle_n=3)

    path = str(tmp_path / "ndstore")
    store = NearDupStore.create(spark, path, **cfg)
    for b in range(3):
        store = store.add_batch(docs.filter(F.col("doc_id") % 3 == b), f"b{b}")

    got = {(r["node"], r["cluster_rep"]) for r in store.reps().collect()}
    want = {
        (r["node"], r["cluster_rep"])
        for r in connected_components(
            minhash_lsh_pairs(docs, **cfg)
        ).collect()
    }
    assert got == want and len(got) > 30

    # redelivery: re-adding a committed batch changes nothing
    store = store.add_batch(docs.filter(F.col("doc_id") % 3 == 1), "b1")
    assert {(r["node"], r["cluster_rep"]) for r in store.reps().collect()} == want

    # compact folds the band segments + cluster overlay; reps unchanged
    store = store.compact()
    assert store._segments == []
    assert {(r["node"], r["cluster_rep"]) for r in store.reps().collect()} == want

    # a fresh load serves identically and accepts the next batch
    re = NearDupStore.load(spark, path)
    more = spark.createDataFrame(
        [(100, base[0]), (101, base[0] + " extra")], "doc_id long, text string"
    )
    re = re.add_batch(more, "b3")
    want2 = {
        (r["node"], r["cluster_rep"])
        for r in connected_components(
            minhash_lsh_pairs(docs.unionByName(more), **cfg)
        ).collect()
    }
    assert {(r["node"], r["cluster_rep"]) for r in re.reps().collect()} == want2


def test_neardup_store_probe_prunes_partitions(spark, tmp_path, monkeypatch):
    """The batch-vs-store candidate probe must reach the band table as
    a (band, bpfx) partition prune — the O(batch) claim's plan half
    (the value half is the parity test above). Forces the at-scale
    directory layout (see test_store_small_write_layout for the
    below-threshold flat layout)."""
    import re as _re

    from jsonify2ai_spark.operators.dedup import NearDupStore, _lsh_banded

    monkeypatch.setenv("SPARK_GRAFT_STORE_PART_ROWS", "0")
    docs = spark.createDataFrame(
        [(i, f"some shared sentence body {i % 5} tail") for i in range(40)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "ndplan")
    store = NearDupStore.create(spark, path, num_hashes=32, bands=8)
    store = store.add_batch(docs, "b0")

    batch = _lsh_banded(
        spark.createDataFrame([(99, "some shared sentence body 1 tail")],
                              "doc_id long, text string"),
        "text", "doc_id", 32, 8, 3,
    )
    cells = batch.select(
        "band", F.substring("bucket", 1, 1).alias("p")
    ).distinct().collect()
    tbl = store._band_table().filter(
        F.col("band").isin(sorted({r["band"] for r in cells}))
        & F.col("bpfx").isin(sorted({r["p"] for r in cells}))
    )
    plan = tbl._jdf.queryExecution().executedPlan().toString()
    pruned = [
        f
        for f in _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        if "band" in f and "bpfx" in f
    ]
    assert pruned, plan[:3000]


def test_cluster_store_delete_nodes_with_repair(spark, tmp_path):
    """ClusterStore.delete_nodes (r15, RTBF/K4): generation-tagged
    tombstones + caller-supplied repair labels. The adversarial shapes:
    (a) deleting a node an OVERLAY entry points at — the entry must be
    dropped or the repaired survivors would remap to the purged label;
    (b) a bridge delete whose survivors all go edge-less (the component
    vanishes from the mapping); (c) re-admission of a purged node by a
    later merge (the generation tag's whole point); (d) compact folds
    tombs away with reps unchanged."""
    from jsonify2ai_spark.operators.dedup import ClusterStore

    def df_of(rows, schema):
        return spark.createDataFrame(rows, schema)

    path = str(tmp_path / "cs_del")
    # base {5,9} (rep 5) and {20,21} (rep 20)
    store = ClusterStore.build(df_of([(5, 9), (20, 21)], "a long, b long"), path)
    # merge 3 in: component {3,5,9}, rep 3, overlay entry (5 -> 3)
    store = store.merge_delta(df_of([(3, 5)], "a long, b long"), "d1")
    assert {(r["node"], r["cluster_rep"]) for r in store.reps().collect()} == {
        (3, 3), (5, 3), (9, 3), (20, 20), (21, 20),
    }
    # (a) delete 3; survivors 5,9 still share their edge -> repair (5,5),(9,5).
    # Without the overlay drop, rep0=5 would remap through (5 -> 3) to the
    # purged label.
    store = store.delete_nodes(
        df_of([(3,)], "node long"),
        repaired=df_of([(5, 5), (9, 5)], "node long, cluster_rep long"),
        run_id="del1",
    )
    want = {(5, 5), (9, 5), (20, 20), (21, 20)}
    assert {(r["node"], r["cluster_rep"]) for r in store.reps().collect()} == want
    # redelivery of a committed delete run_id is a no-op
    assert store.delete_nodes(
        df_of([(3,)], "node long"), repaired=None, run_id="del1"
    ) is store
    # bucket-pruned probe face agrees post-delete
    got = {
        (r["node"], r["cluster_rep"])
        for r in store.reps_of(df_of([(5,), (3,), (21,)], "node long")).collect()
    }
    assert got == {(5, 5), (21, 20)}
    # (b) delete 20: survivor 21 is edge-less -> the caller passes it as
    # neither deleted nor repaired... the contract is repaired covers
    # every surviving member that kept an edge; 21 kept none, so the
    # caller deletes it too (NearDupStore.delete_docs does exactly this)
    store = store.delete_nodes(
        df_of([(20,), (21,)], "node long"), repaired=None, run_id="del2"
    )
    assert {(r["node"], r["cluster_rep"]) for r in store.reps().collect()} == {
        (5, 5), (9, 5),
    }
    # (c) re-admission: a later merge re-adds purged node 3 — the tomb
    # is generation-tagged, so the NEW segment row stays visible
    store = store.merge_delta(df_of([(3, 9)], "a long, b long"), "d2")
    want3 = {(3, 3), (5, 3), (9, 3)}
    assert {(r["node"], r["cluster_rep"]) for r in store.reps().collect()} == want3
    # (d) compact folds tombs/overlay/segments; reps + a fresh load agree
    store = store.compact()
    assert store._tombs is None and store._segments == [] and store._remap is None
    assert {(r["node"], r["cluster_rep"]) for r in store.reps().collect()} == want3
    re = ClusterStore.load(spark, path)
    assert {(r["node"], r["cluster_rep"]) for r in re.reps().collect()} == want3


def test_neardup_store_delete_docs_equals_recompute(spark, tmp_path):
    """NearDupStore.delete_docs (r15, RTBF/K4): purge then reps must
    equal a FRESH closure over minhash_lsh_pairs of the surviving
    documents — the exact contract, splits included (the band table
    persists the edges, so component-local repair is exact where a
    rep-relabel shortcut would silently keep a split component merged).
    Also pinned: purged docs stop generating candidates for future
    batches, re-ingest after purge is a clean re-admission, and compact
    preserves the clustering."""
    from jsonify2ai_spark.operators.dedup import (
        NearDupStore,
        connected_components,
        minhash_lsh_pairs,
    )

    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t2 = "one two three four five six seven eight nine ten"
    t3 = "solo unique text about nothing shared with any other document"
    rows = (
        [(i, t1) for i in range(0, 4)]            # component A
        + [(10 + i, t2) for i in range(0, 4)]     # component B
        + [(50, t1 + " " + t2)]                   # bridge A<->B
        + [(60, t3)]                              # never clustered
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = dict(num_hashes=32, bands=16, shingle_n=3)

    def recompute(ds):
        return {
            (r["node"], r["cluster_rep"])
            for r in connected_components(minhash_lsh_pairs(ds, **cfg)).collect()
        }

    path = str(tmp_path / "nd_del")
    store = NearDupStore.create(spark, path, **cfg)
    for b in range(2):
        store = store.add_batch(docs.filter(F.col("doc_id") % 2 == b), f"b{b}")
    pre = {(r["node"], r["cluster_rep"]) for r in store.reps().collect()}
    assert pre == recompute(docs)
    # the bridge really bridges (one merged component pre-delete)
    assert len({rep for _, rep in pre}) == 1

    # purge the bridge + one member of A + the unclustered doc: the
    # merged component must SPLIT into A' and B'
    purged = [50, 0, 60]
    survivors_df = docs.filter(~F.col("doc_id").isin(purged))
    store = store.delete_docs(
        spark.createDataFrame([(p,) for p in purged], "doc_id long"), "purge1"
    )
    post = {(r["node"], r["cluster_rep"]) for r in store.reps().collect()}
    want = recompute(survivors_df)
    assert post == want
    assert len({rep for _, rep in post}) == 2  # the split actually happened
    assert all(n not in purged for n, _ in post)

    # purged docs generate no candidates for future batches: a new exact
    # copy of t1 clusters with the surviving A' docs only
    more = spark.createDataFrame([(70, t1)], "doc_id long, text string")
    store = store.add_batch(more, "b2")
    want2 = recompute(survivors_df.unionByName(more))
    assert {(r["node"], r["cluster_rep"]) for r in store.reps().collect()} == want2

    # re-ingest a purged doc id: clean re-admission (generation tombs)
    readd = docs.filter(F.col("doc_id") == 50)
    store = store.add_batch(readd, "b3")
    want3 = recompute(survivors_df.unionByName(more).unionByName(readd))
    assert {(r["node"], r["cluster_rep"]) for r in store.reps().collect()} == want3
    assert len({rep for _, rep in want3}) == 1  # re-added bridge re-merges

    # redelivery of a committed purge is a no-op; empty purge too
    store = store.delete_docs(
        spark.createDataFrame([(0,)], "doc_id long"), "purge1x"
    )
    # 0 was already purged: its mapping/bands are gone, so this must
    # change nothing
    assert {(r["node"], r["cluster_rep"]) for r in store.reps().collect()} == want3

    # compact folds band tombs + node tombs; reps unchanged; fresh load
    store = store.compact()
    assert store._btombs is None and store._clusters._tombs is None
    assert {(r["node"], r["cluster_rep"]) for r in store.reps().collect()} == want3
    re = NearDupStore.load(spark, path)
    assert {(r["node"], r["cluster_rep"]) for r in re.reps().collect()} == want3


def test_neardup_store_delete_keeps_plans_pruned(spark, tmp_path, monkeypatch):
    """With tombstones PRESENT, the scale contracts must survive: the
    batch probe still reaches the band table as a (band, bpfx)
    partition prune, and both tombstone masks stay broadcast anti-joins
    (map-side) — never a SortMergeJoin over the corpus. Forces the
    at-scale directory layout (SPARK_GRAFT_STORE_PART_ROWS=0)."""
    import re as _re

    from jsonify2ai_spark.operators.dedup import NearDupStore, _lsh_banded

    monkeypatch.setenv("SPARK_GRAFT_STORE_PART_ROWS", "0")
    docs = spark.createDataFrame(
        [(i, f"some shared sentence body {i % 5} tail") for i in range(40)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "nd_delplan")
    store = NearDupStore.create(spark, path, num_hashes=32, bands=8)
    store = store.add_batch(docs, "b0")
    store = store.delete_docs(
        spark.createDataFrame([(1,), (2,)], "doc_id long"), "p1"
    )
    assert store._btombs is not None

    # band-table mask: broadcast anti-join, and a probe filter still
    # prunes the (band, bpfx) partitions beneath it
    batch = _lsh_banded(
        spark.createDataFrame(
            [(99, "some shared sentence body 1 tail")], "doc_id long, text string"
        ),
        "text", "doc_id", 32, 8, 3,
    )
    cells = batch.select(
        "band", F.substring("bucket", 1, 1).alias("p")
    ).distinct().collect()
    tbl = store._band_table().filter(
        F.col("band").isin(sorted({r["band"] for r in cells}))
        & F.col("bpfx").isin(sorted({r["p"] for r in cells}))
    )
    plan = tbl._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:3000]
    pruned = [
        f
        for f in _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        if "band" in f and "bpfx" in f
    ]
    assert pruned, plan[:3000]

    # mapping mask: same contract on the cluster store's read face
    plan2 = (
        store._clusters._stored()._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan2, plan2[:3000]
    assert "BroadcastHashJoin" in plan2 and "LeftAnti" in plan2, plan2[:3000]


def test_neardup_stream_sink_reconciles_changes(spark, tmp_path):
    """NearDupStreamSink (r15): the watcher reconciliation loop —
    adds, deletes, and CHANGED docs (delete + re-add in one trigger)
    arriving as a change stream must leave the store's clustering equal
    to a fresh closure over the CURRENT corpus after every trigger;
    a replayed batch changes nothing."""
    import json

    from jsonify2ai_spark.operators.dedup import (
        NearDupStore,
        NearDupStreamSink,
        connected_components,
        minhash_lsh_pairs,
    )

    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t2 = "one two three four five six seven eight nine ten"
    cfg = dict(num_hashes=32, bands=16, shingle_n=3)
    path = str(tmp_path / "ndsink")
    NearDupStore.create(spark, path, **cfg)

    def recompute(rows):
        ds = spark.createDataFrame(
            [(i, t) for i, t in rows.items()], "doc_id long, text string"
        )
        return {
            (r["node"], r["cluster_rep"])
            for r in connected_components(minhash_lsh_pairs(ds, **cfg)).collect()
        }

    src = tmp_path / "src"
    src.mkdir()

    def write_batch(name, ops):
        (src / name).write_text(
            "\n".join(
                json.dumps({"doc_id": i, "text": t, "op": op})
                for i, t, op in ops
            )
        )

    # trigger 1: initial adds — two components bridged by doc 50
    live = {i: t1 for i in range(4)}
    live.update({10 + i: t2 for i in range(4)})
    live[50] = t1 + " " + t2
    write_batch("b1.json", [(i, t, "upsert") for i, t in live.items()])

    sink = NearDupStreamSink(path, op_col="op")
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING, op STRING")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    query = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        store = NearDupStore.load(spark, path)
        got = {(r["node"], r["cluster_rep"]) for r in store.reps().collect()}
        assert got == recompute(live)
        assert len({rep for _, rep in got}) == 1  # bridged

        # trigger 2: delete the bridge (split!), CHANGE doc 1 from the
        # t1 family to the t2 family (delete + re-add), add a new doc
        ops = [
            (50, None, "delete"),
            (1, None, "delete"),
            (1, t2 + " extra", "upsert"),
            (70, t1, "upsert"),
        ]
        del live[50]
        live[1] = t2 + " extra"
        live[70] = t1
        write_batch("b2.json", ops)
        query.processAllAvailable()
    finally:
        query.stop()

    store = NearDupStore.load(spark, path)
    got = {(r["node"], r["cluster_rep"]) for r in store.reps().collect()}
    want = recompute(live)
    assert got == want
    assert len({rep for _, rep in want}) == 2  # the bridge delete split
    # the changed doc now clusters with its NEW family
    rep_of = dict(want)
    assert rep_of[1] == rep_of[10] and rep_of[1] != rep_of[0]

    # redelivery: re-invoking the sink with a committed batch id and the
    # same content changes nothing
    replay = spark.createDataFrame(
        [(i, t, op) for i, t, op in ops], "doc_id long, text string, op string"
    )
    sink(replay, 1)
    store = NearDupStore.load(spark, path)
    assert {(r["node"], r["cluster_rep"]) for r in store.reps().collect()} == want

    # compact folds segments + both tombstone tables; clustering survives
    store = store.compact()
    assert {(r["node"], r["cluster_rep"]) for r in store.reps().collect()} == want


def test_neardup_store_purge_all_then_compact_then_readd(spark, tmp_path):
    """Purge-to-empty is the delete face's degenerate corner: deleting
    EVERY doc leaves both the band table and the mapping empty, compact
    must fold that to readable empty bases (an empty partitionBy write
    leaves a schema-less dir — the create() lesson, now reachable at
    runtime), and the store must accept a fresh corpus afterwards."""
    from jsonify2ai_spark.operators.dedup import (
        NearDupStore,
        connected_components,
        minhash_lsh_pairs,
    )

    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    cfg = dict(num_hashes=32, bands=16, shingle_n=3)
    path = str(tmp_path / "nd_empty")
    store = NearDupStore.create(spark, path, **cfg)
    docs = spark.createDataFrame(
        [(i, t1) for i in range(6)], "doc_id long, text string"
    )
    store = store.add_batch(docs, "b0")
    assert store.reps().count() == 6

    store = store.delete_docs(docs.select("doc_id"), "purge-all")
    assert store.reps().count() == 0
    assert store._band_table().count() == 0

    # compact folds tombs into EMPTY bases; both must stay loadable
    store = store.compact()
    assert store._btombs is None and store._clusters._tombs is None
    assert store.reps().count() == 0
    re = NearDupStore.load(spark, path)
    assert re.reps().count() == 0 and re._band_table().count() == 0

    # and the store lives on: re-ingest (same ids! they were purged and
    # compacted away) clusters exactly as a fresh corpus would
    re = re.add_batch(docs, "b1")
    want = {
        (r["node"], r["cluster_rep"])
        for r in connected_components(minhash_lsh_pairs(docs, **cfg)).collect()
    }
    assert {(r["node"], r["cluster_rep"]) for r in re.reps().collect()} == want


def test_unigram_lm_train_and_encode(spark):
    """Unigram-LM tokenizer (r15 — Kudo 2018, the SentencePiece model;
    completes the tokenizer-training family next to train_bpe). Pinned:
    (1) EM monotonicity — within a prune round, each re-estimation's
    corpus log-likelihood is non-decreasing (the EM guarantee, on the
    _stats probe); (2) coverage — every seen single char survives
    training, so Viterbi encode round-trips every word exactly;
    (3) the learned vocab actually spends slots on the corpus's
    recurring multi-char units and encode USES them; (4) training is
    deterministic end-to-end (no RNG, rounded prune ranking)."""
    from jsonify2ai_spark.operators.unigram import train_unigram, unigram_encode

    stems = ["walk", "talk", "jump", "read", "play", "work", "learn"]
    rows = []
    for i in range(30):
        s = stems[i % len(stems)]
        rows.append(
            (
                i,
                f"{s}ing {s}ed {s}s preprocessing tokenization "
                f"{stems[(i + 1) % len(stems)]}ing",
            )
        )
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    stats: dict = {}
    kw = dict(
        vocab_size=80, seed_size=300, em_iters=2, max_piece_len=6,
        text_col="text",
    )
    logp = train_unigram(docs, _stats=stats, **kw)

    # (1) EM monotone within each 2-iteration block
    lls = stats["ll"]
    assert len(lls) >= 2
    for k in range(0, len(lls) - 1, 2):
        if k + 1 < len(lls):
            assert lls[k + 1] >= lls[k] - abs(lls[k]) * 1e-9, (k, lls)

    # (2) coverage + sane size + normalized
    import math

    corpus_chars = {
        c for _, t in rows for w in t.lower().split() for c in w
    }
    assert corpus_chars <= set(logp)
    assert len(logp) <= 3 * 80 and len(logp) >= len(corpus_chars)
    assert abs(sum(math.exp(v) for v in logp.values()) - 1.0) < 1e-6

    enc = unigram_encode(docs, logp, max_piece_len=6)
    got = {r["doc_id"]: r["unigram_tokens"] for r in enc.collect()}
    for i, t in rows:
        words = t.lower().split()
        assert "".join(got[i]) == "".join(words), (i, got[i])

    # (3) recurring units earn multi-char pieces that encode then uses
    multi_used = {tok for toks in got.values() for tok in toks if len(tok) > 1}
    assert multi_used, "no multi-char piece survived training"

    # (4) determinism
    logp2 = train_unigram(docs, **kw)
    assert logp2 == logp
