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
    missing_oracle = set(qs) - set(os_)
    # non-SQL-expressible ops may omit oracles; everything else must have one.
    # q63: the MLlib IDF fit has no SQL twin (rows-only check) — but its
    # family IS value-checked: q64_tfidf_sql replays the same hashed-TF-IDF
    # semantics with the portable md5 bucket hash under a full value oracle,
    # and the gate below pins that q64 stays oracle-backed.
    assert missing_oracle <= {"q63_tfidf_search"}, missing_oracle
    assert "q64_tfidf_sql" in os_, "q64 is q63's value twin — must keep its oracle"
    # rotation invariant: the driver gates the FIRST 50 entries; every
    # oracle-less query must sit in the tail so it never displaces a
    # value-checked row from the gate window
    first50 = list(qs)[:50]
    assert all(name in os_ for name in first50), [
        n for n in first50 if n not in os_
    ]


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


def test_flagship_queries_inside_gate_window():
    """The driver's correctness gate checks the FIRST 50 entries of
    queries(); every oracle-backed custom operator (q51-q62) must sit inside
    that window — a careless append/reorder silently un-gates the newest,
    most-likely-wrong code (the round-2 verdict's #1 finding)."""
    qs = list(entry_mod.queries())
    window = set(qs[:50])
    flagship = {q for q in qs if 51 <= int(q[1:3]) <= 62}
    assert flagship <= window, sorted(flagship - window)
    assert len(qs) == len(set(qs))  # no duplicate keys silently dropped
