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
