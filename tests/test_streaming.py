"""Structured Streaming watcher: incremental ingest + idempotent merge +
delete reconciliation (T1-T8)."""

from __future__ import annotations

import time

from jsonify2ai_spark.streaming.watcher import reconcile_deletes, watch_dropzone


def test_watcher_incremental_ingest(spark, tmp_path):
    dz = tmp_path / "dropzone"
    dz.mkdir()
    table = str(tmp_path / "chunks_table")
    ckpt = str(tmp_path / "ckpt")

    (dz / "one.md").write_text("first document body " * 20)

    q = watch_dropzone(spark, str(dz), table, ckpt, trigger_seconds=1, dim=32)
    try:
        q.processAllAvailable()
        t1 = spark.read.parquet(table)
        docs1 = {r["path"].rsplit("/", 1)[-1] for r in t1.select("path").distinct().collect()}
        assert docs1 == {"one.md"}
        # snapshot BEFORE the next batch swaps the table (readers hold a
        # version; stale handles must not be reused across swaps)
        one_rows_before = sorted(
            r["id"] for r in t1.filter(t1.path.endswith("one.md")).collect()
        )

        # new file arrives -> only it is processed, table grows
        (dz / "two.csv").write_text("a,b\n1,2\n")
        time.sleep(1.1)
        q.processAllAvailable()
        t2 = spark.read.parquet(table)
        docs2 = {r["path"].rsplit("/", 1)[-1] for r in t2.select("path").distinct().collect()}
        assert docs2 == {"one.md", "two.csv"}
        # one.md rows unchanged (idempotent: same deterministic ids)
        one_rows_after = sorted(
            r["id"] for r in t2.filter(t2.path.endswith("one.md")).collect()
        )
        assert one_rows_before == one_rows_after
    finally:
        q.stop()

    # T4 delete propagation: drop a file, reconcile
    (dz / "one.md").unlink()
    t = spark.read.parquet(table)
    survivors = reconcile_deletes(spark, str(dz), t)
    left = {r["path"].rsplit("/", 1)[-1] for r in survivors.select("path").distinct().collect()}
    assert left == {"two.csv"}
