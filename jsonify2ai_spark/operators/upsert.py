"""Idempotent upsert / delete on immutable Parquet (SURVEY §2.3 J5, §2.7 K4).

Reference semantics: re-ingesting a document deletes all its points first,
then inserts — deterministic ids make re-delivery converge
(worker/app/routers/process.py:577-584, worker/app/services/
qdrant_client.py:410-433, docs/invariants.md:12-18).

On Parquet the pattern is anti-join + union. At 100 TB the key is to touch few
files: partition the chunks table by a stable hash bucket of document_id
(``bucket_expr``) so a replace rewrites only the buckets containing the
affected documents (dynamic partition overwrite), not the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS_DEFAULT = 256


def bucket_expr(doc_col: str = "document_id", n_buckets: int = N_BUCKETS_DEFAULT):
    """Stable content-derived bucket id (not Spark-internal hash) so the
    partition layout survives engine upgrades and is reproducible anywhere."""
    return (F.conv(F.substring(F.md5(F.col(doc_col)), 1, 8), 16, 10) % n_buckets).cast("int")


def replace_documents(
    existing: DataFrame,
    incoming: DataFrame,
    doc_col: str = "document_id",
    dedup_keys: tuple[str, ...] = ("document_id", "idx"),
) -> DataFrame:
    """J5 delete-before-insert as a plan: rows of ``existing`` whose document
    is being re-ingested are dropped (left-anti join on the small distinct doc
    id set — broadcast), then the deduped incoming rows are unioned in.

    ``dedup_keys`` replicates J4 batch-internal dedup
    (ingest_dropzone.py:475-479): first occurrence wins on (document_id, idx).
    """
    incoming = incoming.dropDuplicates(list(dedup_keys))
    doc_ids = incoming.select(doc_col).distinct()
    kept = existing.join(F.broadcast(doc_ids), on=doc_col, how="left_anti")
    return kept.unionByName(incoming)


def delete_documents(existing: DataFrame, doc_ids: list[str], doc_col: str = "document_id") -> DataFrame:
    """K4 delete-by-document_id as an anti-filter plan; writing it back with
    partition overwrite on the affected buckets completes the delete."""
    return existing.filter(~F.col(doc_col).isin(doc_ids))


def write_chunks(
    df: DataFrame,
    path: str,
    doc_col: str = "document_id",
    n_buckets: int = N_BUCKETS_DEFAULT,
    mode: str = "overwrite",
) -> None:
    """Write the chunks table partitioned by the stable bucket (+ kind when
    present) so per-document rewrites and kind-filtered scans prune files.

    With ``spark.sql.sources.partitionOverwriteMode=dynamic`` only buckets
    present in ``df`` are replaced — the J5 rewrite cost is O(touched docs),
    not O(table).
    """
    cols = ["bucket"] + (["kind"] if "kind" in df.columns else [])
    (
        df.withColumn("bucket", bucket_expr(doc_col, n_buckets))
        .write.mode(mode)
        .partitionBy(*cols)
        .parquet(path)
    )
