"""PII detection and redaction — a standard pre-training scrub pass.

Not in the reference (its corpus is personal notes; a cluster-scale
training-data pipeline cannot ship raw emails/phones/SSNs into a model), so
this is a north-star operator alongside dedup/quality/sampling. Everything is
built-in ``regexp_extract_all`` / ``regexp_replace`` expressions — JVM-side,
whole-stage-codegen, zero shuffle at any scale — and every pattern is written
in the common subset of Java regex and RE2 (no backrefs, no lookaround) so
the DuckDB oracle computes identical counts.

Pattern scope is deliberately the well-known high-precision core (emails,
NANP-style phones, IPv4, US SSN). Real deployments extend PII_PATTERNS or
plug an NER model via mapInPandas; the operator shape — count columns +
in-place redaction — is the engine contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


# Ordered: redaction applies top-to-bottom (emails first so their local parts
# can never be re-matched as phone-ish digit runs).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def with_pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_<kind>`` match-count columns plus ``pii_total``.

    Counts are independent non-overlapping scans per kind (left-to-right,
    the semantics both Java regex and RE2 share), so a pathological string
    could be counted under two kinds — acceptable for a scrub gate, where
    any nonzero count routes the document to redaction anyway.
    """
    t = _c(text_col)
    out = df
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).cast("bigint"),
        )
    total = None
    for kind in PII_PATTERNS:
        c = F.col(f"n_{kind}")
        total = c if total is None else total + c
    return out.withColumn("pii_total", total)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Replace every PII match with its ``[KIND]`` placeholder, in
    PII_PATTERNS order. Pure nested ``regexp_replace`` — the document text
    is rewritten in one projection, no UDF."""
    expr = _c(text_col)
    for kind, pat in PII_PATTERNS.items():
        expr = F.regexp_replace(expr, pat, f"[{kind.upper()}]")
    return df.withColumn(out_col, expr)
