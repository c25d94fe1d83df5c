"""Driver-contract smoke: entry() produces rows, every query runs at sf0.001,
oracle keys line up with query keys."""

from __future__ import annotations

import __spark_entry__ as entry_mod

from tests.conftest import SF_DIR


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 5
    assert df.columns == ["doc_id", "idx", "text", "score"]
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_oracle_keys_subset_of_queries():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_).issubset(set(qs))
    # EVERY contract query is oracle-backed since r7: the one exception
    # (q63, the MLlib IDF fit — murmur3 buckets have no engine-portable
    # SQL twin) was retired after six rounds without a possible value row;
    # q64_tfidf_sql is the family's contract query and the MLlib member
    # stays pytest-pinned in tests/test_functions.py. A new oracle-less
    # query would be a permanent staleness hole — don't add one.
    assert set(qs) == set(os_), set(qs) ^ set(os_)
    assert "q64_tfidf_sql" in os_, "q64 carries the TF-IDF family's value gate"


def test_every_query_runs_small(spark):
    from pyspark.sql.types import ArrayType, MapType

    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
        # the driver's value-hash canonicalizer cannot hash array/map
        # columns — a query sneaking one in would silently weaken its gate
        # row (this was a round-1 failure mode; now a pre-commit guard)
        for f in df.schema.fields:
            assert not isinstance(f.dataType, (ArrayType, MapType)), (
                f"{name}.{f.name} is {f.dataType.simpleString()} — "
                "stringify or drop it before returning"
            )


def test_gate_window_hygiene():
    """The driver's correctness gate checks the FIRST 50 entries of
    queries(). The r2-r9 pin holding q51-q62 permanently in-window is
    RETIRED (r9): its rationale — they were the newest, most-likely-wrong
    code (the round-2 verdict's #1 finding) — expired after seven straight
    driver-green rounds, and the 12 permanently-occupied slots were the
    direct cause of the rotation schedule's zero-slack crunch (r8 verdict
    #1's arithmetic). q51-q62 now rotate under the same staleness policy
    as every other query (`scripts/gate_staleness.py`: nothing goes >2
    rounds without a driver row). What stays pinned is the hygiene that
    keeps ANY gate row meaningful: unique keys, and a window that is
    actually full (a short queries() list silently shrinks the gate)."""
    qs = list(entry_mod.queries())
    assert len(qs) >= 50  # the driver window must be saturated
    assert len(qs) == len(set(qs))  # no duplicate keys silently dropped


def test_gate_rotation_not_stale():
    """r10 verdict #2: the rotation policy lived only in comments and
    memory, and r10 proved that is not enough — the round shipped the r9
    gate verbatim and the 32-query r7 cohort went a third round without a
    driver row. Mechanize it: `gate_staleness.py --check` fails when the
    committed first-50 ordering wastes a slot on a fresher query while a
    strictly staler oracle-backed query waits outside (never-green counts
    as stalest, so a NEW query must take its first driver row; names in
    __spark_entry__.GATE_FRESH_EXEMPT are policy-(b) changed-this-round
    exemptions). This test fails on the r10 layout and passes on the r11
    rotation."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [_sys.executable, str(repo / "scripts" / "gate_staleness.py"), "--check"],
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_q97_oracle_all_bad_lines_doc_matches_spark(spark, tmp_path):
    """r7 advisor (medium): a doc whose lines ALL fail the C4 line rule has
    kept=[], and DuckDB's array_to_string([], sep) is NULL (not ''), which
    un-coalesced poisons ns/n_sentences/keep with NULLs while Spark's
    concat_ws path yields n_sentences=0, keep=false. The sf corpora happen
    to contain no such doc, so verify_local could not see the latent red —
    pin it on a crafted corpus where every line of doc 1 carries a policy
    term (doc_id=1 dodges the %3/%5/%7 structure-injection strata)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = {
        "doc_id": [1, 2],
        "text": [
            "javascript one two row cookie three four",  # every line fails
            "alpha beta gamma delta epsilon row zeta eta theta iota kappa",
        ],
        "lang": ["en", "en"],
        "source": ["web", "web"],
        "n_chars": [40, 60],
    }
    pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))

    sdf = entry_mod.queries()["q97_c4_filter"](spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    osql = entry_mod.oracle_sql()["q97_c4_filter"]
    ocols = [d[0] for d in con.execute(osql).description]
    orows = con.execute(osql).fetchall()

    from verify_local import norm_rows

    assert norm_rows(sdf.columns, sdf.collect()) == norm_rows(ocols, orows)
    bad = {r[0]: r for r in orows}[1]
    row = dict(zip(ocols, bad))
    assert row["n_good_lines"] == 0
    assert row["n_sentences"] == 0 and row["n_sentences"] is not None
    assert row["keep"] is False  # NOT NULL — the coalesce guard


def test_scratch_memo_contract(monkeypatch, tmp_path):
    """The bench-only store memo (r13 verdict #3): inert without the env
    flag (correctness rows keep isolated builds), build-once per key with
    the flag on, and distinct keys get distinct scratch dirs."""
    import __spark_entry__ as em

    calls = []

    def build(d):
        calls.append(d)
        return ("store", d)

    monkeypatch.delenv("SPARK_GRAFT_SCRATCH_MEMO", raising=False)
    assert em._scratch_memo(("t1", "sf"), build) is None
    assert calls == []  # flag off: never builds, caller goes isolated

    monkeypatch.setenv("SPARK_GRAFT_SCRATCH_MEMO", "1")
    try:
        v1 = em._scratch_memo(("t1", "sf"), build)
        v2 = em._scratch_memo(("t1", "sf"), build)
        assert v1 is v2 and len(calls) == 1  # build-once
        v3 = em._scratch_memo(("t2", "sf"), build)
        assert v3 is not v1 and len(calls) == 2
        assert calls[0] != calls[1]  # distinct scratch dirs per key
    finally:
        for k in [("t1", "sf"), ("t2", "sf")]:
            em._SCRATCH_MEMO.pop(k, None)
