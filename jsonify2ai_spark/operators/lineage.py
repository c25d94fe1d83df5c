"""Corpus snapshot lineage — what changed between two versions of a corpus.

A standing training-data pipeline re-ingests its sources continuously (the
reference's watcher loop re-processes files as they change,
worker/app/watcher.py + the delete reconciliation in
worker/app/services/qdrant_io.py); between any two published corpus
snapshots a data owner needs the classic lineage questions answered:
which documents were added, which were removed, which changed content,
and how big the churn is. Git answers this for code; this module answers
it for a parquet corpus, by content fingerprint rather than byte
identity, so whitespace-only re-serializations do not read as churn.

Scale shape: one full-outer shuffle join keyed on the (unique) document
id — no skew by construction, fingerprints computed map-side, AQE free
to pick the join strategy. At 100 TB, snapshot both versions bucketed by
the id column and the join is shuffle-free; the diff never materializes
text, only the 128-bit fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonify2ai_spark.operators.dedup import _content_fingerprint


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per document id present in EITHER snapshot:
    ``(id, old_fingerprint, new_fingerprint, status)`` with status in
    ``added`` (only in new), ``removed`` (only in old), ``changed``
    (both, different normalized content), ``unchanged``.

    Content equality is the repo's canonical fingerprint
    (md5 of whitespace-normalized text, dedup.py `_content_fingerprint`),
    so a re-serialization that only reflows whitespace is ``unchanged`` —
    the same normalization every dedup pass already applies.
    """
    o = old.select(
        F.col(id_col),
        _content_fingerprint(F.col(text_col)).alias("old_fingerprint"),
    )
    n = new.select(
        F.col(id_col),
        _content_fingerprint(F.col(text_col)).alias("new_fingerprint"),
    )
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("old_fingerprint").isNull(), F.lit("added"))
        .when(F.col("new_fingerprint").isNull(), F.lit("removed"))
        .when(
            F.col("old_fingerprint") != F.col("new_fingerprint"),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.col(id_col), "old_fingerprint", "new_fingerprint", status.alias("status")
    )


def corpus_diff_summary(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The churn card: ``(status, n_docs)`` over :func:`corpus_diff` plus
    a ``total`` row — the numbers a snapshot publication note carries.
    Output is 5-row bounded; the single wide shuffle is the diff's own."""
    diff = corpus_diff(old, new, text_col, id_col)
    per = diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))
    total = diff.agg(
        F.lit("total").alias("status"), F.count(F.lit(1)).alias("n_docs")
    )
    return per.unionByName(total)
