"""Temporal operators: sessionization and as-of join (north-star extensions).

Not in the reference (its only time semantics are range filters, SURVEY
§2.2 P2) — but every event/training-data pipeline needs them, and Spark has
no built-in for either:

- sessionize: gap-based session ids — lag + cumulative-sum-of-boundaries,
  two window passes over ONE shuffle on the entity key.
- as-of join: "latest right-side row at or before each left timestamp" —
  implemented as the union-window trick: tag both sides, sort within key by
  (time, tag), carry the last non-null right payload forward. ONE shuffle of
  left+right on the key — no per-row range probe, no skew-prone
  inequality join. This is the scalable form at 100 TB (the naive
  correlated form is the oracle).

Determinism: every ordering carries an id tiebreak; ties at the same
timestamp resolve to the highest right-side id (orders before events at the
same instant — `<=` as-of semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    ts_col: str = "ts",
    key_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Append 1-based `session_id` per key: a new session starts when the gap
    since the previous event exceeds ``gap_seconds``.

    Timestamps compare at full microsecond precision (cast to double
    seconds), not unix_timestamp's whole-second truncation.
    """
    w_order = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts_s = F.col(ts_col).cast("double")
    prev = F.lag(ts_s).over(w_order)
    boundary = F.when(prev.isNull() | (ts_s - prev > gap_seconds), 1).otherwise(0)
    return events.withColumn("session_id", F.sum(boundary).over(w_cum))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    left_id: str,
    right_id: str,
) -> DataFrame:
    """For each left row: the right row with the greatest
    (right_ts, right_id) such that right_ts <= left_ts and keys match
    (NULL payload when none). Union-window implementation: one shuffle on the
    key, a sequential in-partition scan — the inequality never becomes a join
    predicate.

    The payload columns travel as ONE struct so the carried row is atomic: a
    right row with NULL in one payload column stays NULL there, instead of
    that column back-filling from an older right row (which would produce a
    merged row that never existed)."""
    payload_type = right.select(
        F.struct(*[F.col(v) for v in right_vals]).alias("_payload")
    ).schema["_payload"].dataType
    lt = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.col(left_id).alias(left_id),
        F.lit(None).cast(payload_type).alias("_payload"),
        F.lit(None).cast(dict(right.dtypes)[right_id]).alias("_rid"),
    )
    rt = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(dict(left.dtypes)[left_id]).alias(left_id),
        F.struct(*[F.col(v) for v in right_vals]).alias("_payload"),
        F.col(right_id).alias("_rid"),
    )
    # right rows sort BEFORE left rows at the same timestamp (`<=` as-of);
    # among same-time right rows the highest right_id wins (seen last)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc(), F.col("_rid").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "_k", "_is_left", left_id,
        F.last("_payload", ignorenulls=True).over(w).alias("_payload"),
    )
    return carried.filter(F.col("_is_left") == 1).select(
        F.col("_k").alias(left_key),
        left_id,
        *[F.col(f"_payload.{v}").alias(v) for v in right_vals],
    )
