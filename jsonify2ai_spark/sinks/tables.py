"""Table lifecycle: ensure / validate / repair (SURVEY §2.7 K2).

Reference: collection ensure-or-create with dimension/metric validation,
schema-mismatch detection, and optional drop-recreate behind a flag
(worker/app/services/qdrant_client.py:75-203, qdrant_init.py:22-52). The
Parquet analog: a table directory either exists with a compatible schema, is
created empty with the expected schema, or — only when explicitly allowed —
is dropped and recreated. Readers never see a half-state (create writes a
complete empty parquet footer before any data lands).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from jsonify2ai_spark.session import local_rows_df


class SchemaMismatch(Exception):
    """Existing table schema is incompatible with the expected one."""


def table_exists(spark: SparkSession, path: str) -> bool:
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:
        return False


def _compatible(existing: StructType, expected: StructType) -> bool:
    """Expected fields must exist with identical types (extra existing
    columns are tolerated — additive evolution is fine, type drift is not)."""
    have = {f.name: f.dataType for f in existing.fields}
    return all(f.name in have and have[f.name] == f.dataType for f in expected.fields)


def ensure_table(
    spark: SparkSession,
    path: str,
    schema: StructType,
    recreate_bad: bool = False,
) -> DataFrame:
    """K2: return a reader for ``path``, creating an empty table with
    ``schema`` if missing. Incompatible existing schema raises
    SchemaMismatch unless ``recreate_bad`` (the reference's
    QDRANT_RECREATE_BAD flag) — then the table is dropped and recreated.
    """
    if table_exists(spark, path):
        existing = spark.read.parquet(path)
        if _compatible(existing.schema, schema):
            return existing
        if not recreate_bad:
            raise SchemaMismatch(
                f"{path}: has {existing.schema.simpleString()}, "
                f"expected {schema.simpleString()}"
            )
        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    local_rows_df(spark, [], schema).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def swap_dir(src: str, dst: str) -> None:
    """Crash-safe directory swap: rename ``dst`` aside to ``dst__old``, move
    ``src`` in, then delete the ``__old`` copy.

    The naive ``rmtree(dst); os.replace(src, dst)`` has a crash window where
    the old data is deleted and the new not yet moved — rows recoverable from
    nowhere (streaming replay only re-delivers the current batch's files, not
    the old documents that lived in the bucket). Here a crash at any point
    leaves either the old or the new COMPLETE directory on disk, and
    :func:`recover_table` finishes or rolls back the swap on startup.
    """
    old = f"{dst}__old"
    shutil.rmtree(old, ignore_errors=True)  # stale leftover of a finished swap
    if os.path.exists(dst):
        os.replace(dst, old)
    os.replace(src, dst)
    shutil.rmtree(old, ignore_errors=True)


def recover_table(table_path: str, destructive: bool = True) -> list[str]:
    """Startup recovery for interrupted swaps (streaming merge, compaction,
    or the CLI's whole-table rewrite). For each ``X__old``: ``X`` present
    means the new data landed — drop the leftover; ``X`` missing means the
    crash hit between rename-aside and move-in — restore the old directory
    (streaming replay then re-applies the interrupted batch idempotently).
    ``__staging`` / ``__compacting`` directories are partial writes —
    dropped. Returns the actions taken, for telemetry and tests.

    ``destructive=False`` restores ONLY (a missing base dir from its
    ``__old`` copy) and never deletes anything — the mode for READ paths,
    which must not race a live writer by rm-ing its in-flight staging dirs.
    Full (destructive) recovery is a WRITER-STARTUP operation: exactly one
    writer per table is the layout's concurrency model (as with any
    file-swap sink; use Delta/Iceberg when multiple writers are real).
    """
    actions: list[str] = []
    staging = f"{table_path}__staging"
    if destructive and os.path.isdir(staging):
        shutil.rmtree(staging, ignore_errors=True)
        actions.append(f"removed {os.path.basename(staging)}")
    # whole-table swap interrupted (CLI ingest/delete path): same protocol
    # as per-bucket __old dirs, at the table level
    top_old = f"{table_path}__old"
    if os.path.isdir(top_old):
        if not os.path.exists(table_path):
            os.replace(top_old, table_path)
            actions.append(f"restored {os.path.basename(table_path)}")
        elif destructive:
            shutil.rmtree(top_old, ignore_errors=True)
            actions.append(f"removed {os.path.basename(top_old)}")
    if not os.path.isdir(table_path):
        return actions
    for entry in sorted(os.listdir(table_path)):
        full = os.path.join(table_path, entry)
        if entry.endswith("__compacting"):
            if destructive:
                shutil.rmtree(full, ignore_errors=True)
                actions.append(f"removed {entry}")
        elif entry.endswith("__old"):
            base = full[: -len("__old")]
            if not os.path.exists(base):
                os.replace(full, base)
                actions.append(f"restored {os.path.basename(base)}")
            elif destructive:
                shutil.rmtree(full, ignore_errors=True)
                actions.append(f"removed {entry}")
    return actions


def compact_buckets(
    spark: SparkSession,
    table_path: str,
    target_file_mb: int = 128,
    min_files_to_compact: int = 2,
) -> dict:
    """Small-file compaction for a `bucket=N/`-partitioned table.

    Streaming micro-batches (streaming/watcher.py) leave a few files per
    touched bucket per trigger; after days of drops a bucket holds hundreds
    of kilobyte-files and every scan pays per-file open + footer-read +
    task-schedule cost. Compaction is the standard maintenance pass (Delta
    OPTIMIZE / Iceberg rewrite_data_files): per bucket, if it has >=
    ``min_files_to_compact`` parquet files, read JUST that bucket, coalesce
    to ceil(bytes / target_file_mb) files, write to staging, atomically swap
    the bucket dir. Cost is O(buckets needing work), never O(table); buckets
    already compact are not read, not rewritten, byte-identical after.

    Returns {"compacted": [bucket...], "skipped": n, "files_before": n,
    "files_after": n} for telemetry.
    """
    import math

    # finish/roll back any interrupted swap first — a leftover
    # `bucket=N__old` dir would otherwise pass the bucket filter below and
    # get compacted as if it were data (and poison partition inference)
    recover_table(table_path)
    compacted, skipped = [], 0
    files_before = files_after = 0
    for entry in sorted(os.listdir(table_path)):
        if not entry.startswith("bucket=") or "__" in entry:
            continue
        bdir = os.path.join(table_path, entry)
        parts = [
            os.path.join(bdir, f)
            for f in os.listdir(bdir)
            if f.endswith(".parquet")
        ]
        files_before += len(parts)
        if len(parts) < min_files_to_compact:
            skipped += 1
            files_after += len(parts)
            continue
        n_bytes = sum(os.path.getsize(p) for p in parts)
        n_out = max(1, math.ceil(n_bytes / (target_file_mb * 1024 * 1024)))
        staging = f"{bdir}__compacting"
        # reading the bucket dir directly drops the partition column, which
        # is exactly right: the swapped-in files live under the same
        # bucket=N/ dir and the reader re-derives the column from the path
        spark.read.parquet(bdir).coalesce(n_out).write.mode("overwrite").parquet(staging)
        # parquet writes _SUCCESS etc.; keep the data files only
        for f in os.listdir(staging):
            if not (f.endswith(".parquet") or f == "_SUCCESS"):
                os.remove(os.path.join(staging, f))
        swap_dir(staging, bdir)
        files_after += sum(1 for f in os.listdir(bdir) if f.endswith(".parquet"))
        compacted.append(entry)
    return {
        "compacted": compacted,
        "skipped": skipped,
        "files_before": files_before,
        "files_after": files_after,
    }


def snapshot_table(
    spark: SparkSession, table_path: str, snap_dir: str, label: str | None = None
) -> dict:
    """Reference backup tool analog (scripts/dev/tools/backup_snapshot.py:
    tar the data dir + a manifest with counts): tar.gz the table directory
    plus a manifest recording row count and per-file sha256/bytes, returned
    and embedded in the archive for restore-time verification.

    Dev/ops-scale tooling — at warehouse scale backup is a storage-layer
    concern (object-store versioning, Delta/Iceberg time travel); this
    covers the reference's workflow 1:1 for filesystem tables. Runs
    writer-side: full recovery first, so a snapshot never captures a
    half-swapped table.
    """
    import hashlib
    import json
    import tarfile
    import time

    recover_table(table_path)
    rows = spark.read.parquet(table_path).count()
    files = {}
    for root, _dirs, names in os.walk(table_path):
        for name in sorted(names):
            full = os.path.join(root, name)
            rel = os.path.relpath(full, table_path)
            h = hashlib.sha256()
            with open(full, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            files[rel] = {"bytes": os.path.getsize(full), "sha256": h.hexdigest()}
    manifest = {
        "ts": time.time(),
        "table": os.path.basename(table_path),
        "rows": rows,
        "n_files": len(files),
        "files": files,
    }
    os.makedirs(snap_dir, exist_ok=True)
    name = label or time.strftime("snapshot-%Y%m%dT%H%M%SZ", time.gmtime())
    snap_path = os.path.join(snap_dir, f"{name}.tar.gz")
    import io as iolib

    with tarfile.open(snap_path, "w:gz") as tar:
        tar.add(table_path, arcname="table")
        raw = json.dumps(manifest, indent=2).encode("utf-8")
        info = tarfile.TarInfo("manifest.json")
        info.size = len(raw)
        tar.addfile(info, iolib.BytesIO(raw))
    return {"snapshot": snap_path, "rows": rows, "n_files": len(files)}


def restore_snapshot(snap_path: str, table_path: str) -> dict:
    """Restore a :func:`snapshot_table` archive into ``table_path`` via the
    crash-safe stage-and-swap, verifying every file's sha256 against the
    embedded manifest BEFORE the swap — a corrupted or truncated archive
    never replaces a good table."""
    import hashlib
    import json
    import tarfile

    staging = f"{table_path}__staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    with tarfile.open(snap_path, "r:gz") as tar:
        manifest = json.loads(tar.extractfile("manifest.json").read().decode("utf-8"))
        members = [m for m in tar.getmembers() if m.name.startswith("table/")]
        tar.extractall(staging, members=members, filter="data")
    extracted = os.path.join(staging, "table")
    for rel, meta in manifest["files"].items():
        full = os.path.join(extracted, rel)
        h = hashlib.sha256()
        with open(full, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        if h.hexdigest() != meta["sha256"]:
            shutil.rmtree(staging, ignore_errors=True)
            raise ValueError(f"snapshot corrupt: sha mismatch for {rel}")
    swap_dir(extracted, table_path)
    shutil.rmtree(staging, ignore_errors=True)
    return {"restored": table_path, "rows": manifest["rows"], "n_files": manifest["n_files"]}
