"""Temporal operator semantics: sessionization gaps, as-of join edges."""

from __future__ import annotations

from datetime import datetime

from jsonify2ai_spark.operators.temporal import asof_join, sessionize


def _ts(s):
    return datetime.fromisoformat(s)


def test_sessionize_gap_boundaries(spark):
    rows = [
        (1, 1, _ts("2026-01-01T10:00:00")),
        (2, 1, _ts("2026-01-01T10:20:00")),  # 20 min -> same session
        (3, 1, _ts("2026-01-01T11:00:00")),  # 40 min -> new session
        (4, 1, _ts("2026-01-01T11:30:00.000001")),  # 1800.000001s -> new
        (5, 2, _ts("2026-01-01T10:00:00")),  # other user -> own session 1
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r["event_id"]: r["session_id"] for r in sessionize(df).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 3, 5: 1}


def test_sessionize_exact_gap_is_same_session(spark):
    rows = [
        (1, 1, _ts("2026-01-01T10:00:00")),
        (2, 1, _ts("2026-01-01T10:30:00")),  # exactly 1800s -> NOT a boundary
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r["event_id"]: r["session_id"] for r in sessionize(df).collect()}
    assert out == {1: 1, 2: 1}


def test_asof_join_interleaved(spark):
    left = spark.createDataFrame(
        [
            (100, 1, _ts("2026-01-05T00:00:00")),
            (101, 1, _ts("2026-01-15T00:00:00")),
            (102, 1, _ts("2026-01-01T00:00:00")),  # before any right row -> NULL
            (103, 2, _ts("2026-01-10T00:00:00")),  # key without right rows -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, 1, _ts("2026-01-03T00:00:00"), 30.0),
            (11, 1, _ts("2026-01-10T00:00:00"), 40.0),
            (12, 1, _ts("2026-01-10T00:00:00"), 50.0),  # same ts: higher id wins
            (13, 1, _ts("2026-01-20T00:00:00"), 60.0),
        ],
        "o_id long, custkey long, odate timestamp, amount double",
    )
    out = {
        r["event_id"]: (r["o_id"], r["amount"])
        for r in asof_join(
            left, right,
            left_key="user_id", right_key="custkey",
            left_ts="ts", right_ts="odate",
            right_vals=["o_id", "amount"],
            left_id="event_id", right_id="o_id",
        ).collect()
    }
    assert out[100] == (10, 30.0)
    assert out[101] == (12, 50.0)  # ts tie -> highest right id
    assert out[102] == (None, None)
    assert out[103] == (None, None)


def test_asof_join_equal_timestamp_included(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2026-01-03T00:00:00"))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(9, 1, _ts("2026-01-03T00:00:00"), 5.0)],
        "o_id long, custkey long, odate timestamp, amount double",
    )
    out = asof_join(
        left, right, "user_id", "custkey", "ts", "odate", ["o_id", "amount"],
        "event_id", "o_id",
    ).collect()[0]
    assert out["o_id"] == 9  # <= semantics: same-instant right row matches


def test_asof_join_payload_is_atomic(spark):
    """A matched right row with NULL in one payload column must surface that
    NULL — not back-fill the column from an older right row (the carried
    payload is one struct, not per-column last(ignorenulls))."""
    left = spark.createDataFrame(
        [(1, 1, _ts("2026-01-10T00:00:00"))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, 1, _ts("2026-01-01T00:00:00"), 30.0),
            (11, 1, _ts("2026-01-05T00:00:00"), None),  # latest match, NULL amount
        ],
        "o_id long, custkey long, odate timestamp, amount double",
    )
    out = asof_join(
        left, right, "user_id", "custkey", "ts", "odate", ["o_id", "amount"],
        "event_id", "o_id",
    ).collect()[0]
    assert out["o_id"] == 11
    assert out["amount"] is None  # NOT 30.0 from the older row
