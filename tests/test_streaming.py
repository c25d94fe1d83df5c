"""Structured Streaming watcher: incremental ingest + idempotent merge +
delete reconciliation (T1-T8)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from jsonify2ai_spark.streaming.watcher import reconcile_deletes, watch_dropzone
from jsonify2ai_spark.streaming.windowed import (
    debounced_paths,
    hourly_rollup,
    running_counters,
    stream_events_json,
)


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


def test_reconcile_deletes_at_listing_scale(spark, tmp_path):
    """T4 at listing scale (VERDICT r4 #7): a 100k-path reconciliation via
    the manifest-DataFrame form (the 100 TB shape — object-store inventory,
    no live LIST) is one broadcast semi-join with no shuffle of the table
    side; the non-broadcast fallback returns the identical survivor set.
    Also pins that the manifest form and the directory form agree on a
    physical dropzone."""
    n = 100_000
    path_of = F.concat(F.lit("dz/f"), F.col("id"), F.lit(".txt"))
    # every 20th file was deleted from the dropzone
    listing = spark.range(n).filter((F.col("id") % 20) != 0).select(
        path_of.alias("path"))
    table = spark.range(n).select(path_of.alias("path"), F.col("id").alias("payload"))
    surv = reconcile_deletes(spark, listing, table)
    assert surv.count() == n - n // 20
    plan = surv._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # past-broadcast-scale fallback: no forced hint — same survivors. (At
    # THIS size AQE still picks broadcast from runtime stats, which is the
    # point of dropping the hint: the planner decides from the listing's
    # actual size instead of a promise that breaks at 100M paths.)
    surv2 = reconcile_deletes(spark, listing, table, broadcast_listing=False)
    assert surv2.count() == n - n // 20
    assert "broadcast" not in surv2._jdf.queryExecution().logical().toString().lower()

    # directory form == manifest form on a real dropzone
    dz = tmp_path / "dz"
    dz.mkdir()
    for i in range(50):
        (dz / f"f{i}.txt").write_text("x")
    t = spark.createDataFrame(
        [(str(dz / f"f{i}.txt").lstrip("/"), i) for i in range(60)],
        "path string, payload long",
    )
    by_dir = {r["path"] for r in reconcile_deletes(spark, str(dz), t).collect()}
    manifest = spark.createDataFrame(
        [(f"file:{dz}/f{i}.txt",) for i in range(50)], "path string"
    )
    by_manifest = {r["path"] for r in reconcile_deletes(spark, manifest, t).collect()}
    assert by_dir == by_manifest and len(by_dir) == 50


def test_watcher_rewrites_only_touched_buckets(spark, tmp_path):
    """A micro-batch must leave every bucket it doesn't touch byte-identical
    on disk — the O(delta) rewrite claim, checked at the file level."""
    import hashlib
    import os

    def bucket_files(table):
        out = {}
        for bdir in os.listdir(table):
            if not bdir.startswith("bucket="):
                continue
            files = {}
            for f in sorted(os.listdir(os.path.join(table, bdir))):
                with open(os.path.join(table, bdir, f), "rb") as fh:
                    files[f] = hashlib.sha256(fh.read()).hexdigest()
            out[bdir] = files
        return out

    dz = tmp_path / "dropzone"
    dz.mkdir()
    table = str(tmp_path / "chunks_table")
    ckpt = str(tmp_path / "ckpt")
    (dz / "one.md").write_text("first document body " * 20)

    q = watch_dropzone(spark, str(dz), table, ckpt, trigger_seconds=1, dim=32)
    try:
        q.processAllAvailable()
        before = bucket_files(table)
        assert before  # bucket-partitioned layout exists

        (dz / "two.csv").write_text("a,b\n1,2\n")
        time.sleep(1.1)
        q.processAllAvailable()
        after = bucket_files(table)
    finally:
        q.stop()

    new_buckets = set(after) - set(before)
    assert new_buckets, "second file landed in an existing bucket — pick other names"
    for bdir in before:
        assert after[bdir] == before[bdir], f"{bdir} was rewritten without being touched"
    # and the merge result is still complete/correct
    t = spark.read.parquet(table)
    names = {r["path"].rsplit("/", 1)[-1] for r in t.select("path").distinct().collect()}
    assert names == {"one.md", "two.csv"}


def _write_events(path, rows):
    import json

    lines = [
        json.dumps(
            {
                "event_id": i,
                "ts": ts,
                "user_id": 1,
                "event_type": et,
                "value": v,
                "props": "{}",
            }
        )
        for i, (ts, et, v) in enumerate(rows)
    ]
    path.write_text("\n".join(lines) + "\n")


def test_windowed_rollup_with_watermark_drops_late(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "wm_ckpt")

    _write_events(
        src / "b1.json",
        [
            ("2026-01-01T10:05:00", "click", 1.0),
            ("2026-01-01T10:45:00", "click", 2.0),
            ("2026-01-01T11:10:00", "view", 5.0),
            ("2026-01-01T15:00:00", "click", 1.0),  # advances watermark to 13:00
        ],
    )
    stream = stream_events_json(spark, str(src), max_files_per_trigger=1)
    q = (
        hourly_rollup(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("wm_rollup")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # late event: 10:30 is older than watermark (15:00 - 2h = 13:00) -> dropped
        _write_events(src / "b2.json", [("2026-01-01T10:30:00", "click", 100.0)])
        q.processAllAvailable()
        rows = {
            (r["window_start"].isoformat(), r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.sql("select * from wm_rollup").collect()
        }
        assert rows[("2026-01-01T10:00:00", "click")] == (2, 3.0)  # late 100.0 NOT added
        assert rows[("2026-01-01T11:00:00", "view")] == (1, 5.0)
        assert q.lastProgress["stateOperators"][0]["numRowsDroppedByWatermark"] >= 1
    finally:
        q.stop()


def test_running_counters_update_mode(spark, tmp_path):
    src = tmp_path / "events2"
    src.mkdir()
    ckpt = str(tmp_path / "cnt_ckpt")
    _write_events(
        src / "b1.json",
        [("2026-01-01T10:00:00", "click", 1.0), ("2026-01-01T10:01:00", "click", 2.0)],
    )
    stream = stream_events_json(spark, str(src))
    q = (
        running_counters(stream)
        .writeStream.format("memory")
        .queryName("counters")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        _write_events(src / "b2.json", [("2026-01-01T10:02:00", "click", 3.0)])
        q.processAllAvailable()
        rows = {r["event_type"]: (r["n_events"], r["total_value"]) for r in spark.sql("select * from counters").collect()}
        assert rows["click"] == (3, 6.0)
    finally:
        q.stop()


def test_debounced_paths_emits_after_stability(spark, tmp_path):
    """T2 stability gate: a path emits only after stable_seconds with no new
    modification events (processing-time timeout on keyed state)."""
    src = tmp_path / "files"
    src.mkdir()
    ckpt = str(tmp_path / "db_ckpt")
    import json

    (src / "f1.json").write_text(
        json.dumps({"path": "a.md", "modificationTime": "2026-01-01T10:00:00", "length": 10})
        + "\n"
        + json.dumps({"path": "a.md", "modificationTime": "2026-01-01T10:00:01", "length": 20})
    )
    files = (
        spark.readStream.schema("path STRING, modificationTime TIMESTAMP, length BIGINT")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        debounced_paths(files, stable_seconds=1)
        .writeStream.format("memory")
        .queryName("debounced")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        # NOTE: processAllAvailable() never returns under ProcessingTimeTimeout
        # (timeout evaluation keeps scheduling batches) — poll with a deadline.
        deadline = time.time() + 60
        rows = {}
        while time.time() < deadline and not rows:
            if q.exception():
                raise AssertionError(q.exception())
            rows = {
                r["path"]: (r["n_events"], r["last_len"])
                for r in spark.sql("select * from debounced").collect()
            }
            time.sleep(0.5)
        # both modification events consumed into state, emitted once stable
        assert rows.get("a.md") == (2, 20), rows
    finally:
        q.stop()


def test_watcher_checkpoint_restart_recovery(spark, tmp_path):
    """T3 soak: the checkpoint IS the state store. Run several waves of file
    drops, stop the query, drop more files while it is down, restart from the
    SAME checkpoint — the new query must (a) not re-emit already-committed
    files (no duplicate rows; deterministic ids would mask dupes, so count
    rows not distinct ids) and (b) catch up on everything dropped while down."""
    dz = tmp_path / "dropzone"
    dz.mkdir()
    table = str(tmp_path / "chunks_table")
    ckpt = str(tmp_path / "ckpt")

    def table_state():
        t = spark.read.parquet(table)
        per_doc = {
            r["path"].rsplit("/", 1)[-1]: r["n"]
            for r in t.groupBy("path").count().withColumnRenamed("count", "n")
            .select(F.col("path"), F.col("n")).collect()
        }
        return per_doc

    q = watch_dropzone(spark, str(dz), table, ckpt, trigger_seconds=1, dim=32)
    try:
        for wave in range(3):
            for i in range(2):
                (dz / f"w{wave}_{i}.md").write_text(f"wave {wave} file {i} body " * 30)
            time.sleep(1.1)
            q.processAllAvailable()
        state1 = table_state()
        assert set(state1) == {f"w{w}_{i}.md" for w in range(3) for i in range(2)}
    finally:
        q.stop()

    # files land while the watcher is DOWN
    (dz / "down_a.md").write_text("dropped while offline " * 30)
    (dz / "down_b.md").write_text("also offline " * 30)

    q2 = watch_dropzone(spark, str(dz), table, ckpt, trigger_seconds=1, dim=32)
    try:
        time.sleep(1.1)
        q2.processAllAvailable()
        state2 = table_state()
        # catch-up: offline drops ingested
        assert "down_a.md" in state2 and "down_b.md" in state2
        # no re-emission: pre-restart docs keep their exact row counts
        for doc, n in state1.items():
            assert state2[doc] == n, f"{doc} rows changed across restart"
    finally:
        q2.stop()


def test_stream_dedup_emits_first_occurrence_only(spark, tmp_path):
    """Exact dedup across micro-batches: a fingerprint emits once for the
    stream lifetime — dups inside one batch AND re-drops in later batches
    are both suppressed."""
    import json

    from jsonify2ai_spark.streaming.windowed import stream_dedup

    src = tmp_path / "src"
    src.mkdir()
    schema = "fingerprint STRING, doc STRING"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    deduped = stream_dedup(stream, key_col="fingerprint")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # batch 1: k1 twice (in-batch dup) + k2
        (src / "b1.json").write_text(
            "\n".join(
                json.dumps(r)
                for r in [
                    {"fingerprint": "k1", "doc": "first"},
                    {"fingerprint": "k1", "doc": "dup-in-batch"},
                    {"fingerprint": "k2", "doc": "second"},
                ]
            )
        )
        q.processAllAvailable()
        # batch 2: k1 again (cross-batch dup) + new k3
        (src / "b2.json").write_text(
            "\n".join(
                json.dumps(r)
                for r in [
                    {"fingerprint": "k1", "doc": "re-drop"},
                    {"fingerprint": "k3", "doc": "third"},
                ]
            )
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM dedup_sink").collect()
        by_key = {}
        for r in rows:
            by_key.setdefault(r["fingerprint"], []).append(r["doc"])
        assert sorted(by_key) == ["k1", "k2", "k3"]
        assert all(len(v) == 1 for v in by_key.values()), by_key
        assert by_key["k1"] != ["re-drop"]  # the FIRST occurrence won
    finally:
        q.stop()


def test_rollup_stream_equals_batch_backfill(spark, tmp_path):
    """T6/A6 parity soak: 6 micro-batches through the watermarked hourly
    rollup must end at EXACTLY the aggregates the same definition computes
    as one batch over the full event set — the backfill/live-parity claim,
    executed. (No late events here: nothing may be dropped.)"""
    src = tmp_path / "soak"
    src.mkdir()
    ckpt = str(tmp_path / "soak_ckpt")

    all_rows = []
    stream = stream_events_json(spark, str(src), max_files_per_trigger=1)
    q = (
        hourly_rollup(stream, watermark="24 hours")
        .writeStream.format("memory")
        .queryName("soak_rollup")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        for b in range(6):
            rows = [
                (f"2026-01-01T{8 + (b % 3):02d}:{5 * i:02d}:00", et, float(b + i))
                for i, et in enumerate(["click", "view", "click"])
            ]
            all_rows.extend(rows)
            _write_events(src / f"b{b}.json", rows)
            q.processAllAvailable()
        # update-mode sink: last emission per (window, key) wins
        streamed = {}
        for r in spark.sql("select * from soak_rollup").collect():
            streamed[(r["window_start"], r["event_type"])] = (
                r["n_events"],
                r["total_value"],
            )
    finally:
        q.stop()

    batch_df = spark.createDataFrame(
        [
            {
                "event_id": i, "ts": ts, "user_id": 1,
                "event_type": et, "value": v, "props": "{}",
            }
            for i, (ts, et, v) in enumerate(all_rows)
        ]
    ).withColumn("ts", F.to_timestamp("ts"))
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in hourly_rollup(batch_df).collect()
    }
    assert streamed == batch


def test_streaming_merge_throughput_soak(spark):
    """T5 throughput soak (small config of bench_streaming.py): the
    foreachBatch merge sustains multiple micro-batches at two bucket counts,
    every document lands exactly once, and the chunk-row total is
    bucket-count-invariant (bucketing changes layout, never content)."""
    from bench_streaming import run_once

    results = [
        run_once(spark, n_buckets, n_files=30, chars_per_file=1500,
                 max_files_per_trigger=8, timeout_s=120)
        for n_buckets in (4, 16)
    ]
    assert all(r["files"] == 30 for r in results)
    assert results[0]["chunk_rows"] == results[1]["chunk_rows"] > 0
    assert all(r["rows_per_sec"] > 0 for r in results)


def test_scrub_operators_run_unchanged_in_streaming(spark, tmp_path):
    """Batch/stream operator unification: the PII scrub (counts + redaction)
    is a pure projection, so the SAME operator calls apply to a readStream
    source with no code changes — the pattern that lets one scrub
    implementation serve both the backfill and the live ingest path."""
    import json as _json

    from jsonify2ai_spark.operators.pii import redact_pii, with_pii_counts

    src = tmp_path / "scrub_src"
    src.mkdir()
    (src / "a.json").write_text(
        _json.dumps({"doc_id": 1, "text": "mail a@b.co or call 555-123-4567"})
        + "\n"
        + _json.dumps({"doc_id": 2, "text": "clean line"})
    )
    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    out = redact_pii(with_pii_counts(stream))
    q = (
        out.writeStream.format("memory")
        .queryName("scrubbed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "scrub_ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = {}
        while time.time() < deadline and len(rows) < 2:
            if q.exception():
                raise AssertionError(q.exception())
            q.processAllAvailable()
            rows = {
                r["doc_id"]: r for r in spark.sql("select * from scrubbed").collect()
            }
            time.sleep(0.25)
        assert rows[1]["n_email"] == 1 and rows[1]["n_phone"] == 1
        assert rows[1]["text_redacted"] == "mail [EMAIL] or call [PHONE]"
        assert rows[2]["pii_total"] == 0 and rows[2]["text_redacted"] == "clean line"
    finally:
        q.stop()


def test_quality_monitor_windows_and_flags_pii(spark, tmp_path):
    """Windowed corpus-quality telemetry: scores stream through the same
    verified batch expressions; a PII-laden window shows a nonzero pii_rate
    and windows aggregate by event time."""
    import json as _json

    from jsonify2ai_spark.streaming.windowed import quality_monitor

    src = tmp_path / "qm_src"
    src.mkdir()
    good = "perfectly ordinary prose with enough words to pass the gate " * 3
    (src / "a.json").write_text(
        "\n".join(
            [
                _json.dumps({"ts": "2026-01-01T10:01:00", "text": good}),
                _json.dumps({"ts": "2026-01-01T10:02:00", "text": good + " mail x@y.io"}),
                _json.dumps({"ts": "2026-01-01T11:31:00", "text": good}),
            ]
        )
    )
    stream = spark.readStream.schema("ts timestamp, text string").json(str(src))
    q = (
        quality_monitor(stream, window="10 minutes", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("qmon")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "qm_ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = {}
        while time.time() < deadline and len(rows) < 2:
            if q.exception():
                raise AssertionError(q.exception())
            q.processAllAvailable()
            rows = {
                str(r["window_start"]): r
                for r in spark.sql("select * from qmon").collect()
            }
            time.sleep(0.25)
        w1 = rows["2026-01-01 10:00:00"]
        w2 = rows["2026-01-01 11:30:00"]
        assert w1["n_docs"] == 2 and w2["n_docs"] == 1
        assert w1["pii_rate"] == 0.5 and w2["pii_rate"] == 0.0  # 1 of 2 docs had PII
        assert w1["avg_quality"] > 0.5 and w1["avg_tokens"] > 20
    finally:
        q.stop()


def test_corpus_near_dup_gate_streaming(spark, tmp_path):
    """Streaming face of q65: micro-batches are filtered against a STATIC
    corpus whose artifacts were built once — near-dups of corpus docs are
    dropped across multiple batches, fresh docs pass, and the gate's
    verdicts match batch dedup_against(method='exact') on the same data."""
    import json as _json

    from jsonify2ai_spark.operators.dedup import dedup_against
    from jsonify2ai_spark.streaming.windowed import CorpusNearDupGate

    base = " ".join(f"tok{i} word{i % 9}" for i in range(30))
    corpus = spark.createDataFrame(
        [(1000 + i, base.replace("tok0", f"var{i}")) for i in range(3)],
        "doc_id long, text string",
    )
    gate = CorpusNearDupGate(corpus, threshold=0.8)

    fresh1 = " ".join(f"other{i} thing{i % 5}" for i in range(25))
    fresh2 = " ".join(f"novel{i} items{i % 4}" for i in range(25))
    batches = [
        [  # batch 0: one corpus near-dup, one fresh
            {"doc_id": 1, "text": base.replace("tok0", "var0") + " pad"},
            {"doc_id": 2, "text": fresh1},
        ],
        [  # batch 1: reuses the SAME gate artifacts
            {"doc_id": 3, "text": base.replace("tok0", "var2") + " pad"},
            {"doc_id": 4, "text": fresh2},
        ],
    ]
    src = tmp_path / "gate_src"
    src.mkdir()
    (src / "b0.json").write_text("\n".join(_json.dumps(r) for r in batches[0]))

    got = []
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    q = (
        stream.writeStream.foreachBatch(
            gate.foreach_batch(lambda df, bid: got.extend(
                r["doc_id"] for r in df.collect()))
        )
        .option("checkpointLocation", str(tmp_path / "gate_ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline and 2 not in got:
            if q.exception():
                raise AssertionError(q.exception())
            q.processAllAvailable()
            time.sleep(0.25)
        (src / "b1.json").write_text("\n".join(_json.dumps(r) for r in batches[1]))
        while time.time() < deadline and 4 not in got:
            if q.exception():
                raise AssertionError(q.exception())
            q.processAllAvailable()
            time.sleep(0.25)
    finally:
        q.stop()

    assert sorted(got) == [2, 4], got  # near-dups 1 and 3 were gated out

    # parity: the batch operator agrees row-for-row
    allrows = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for b in batches for r in b],
        "doc_id long, text string",
    )
    verdict = {
        r["doc_id"]: r["kept"]
        for r in dedup_against(allrows, corpus, 0.8, method="exact").collect()
    }
    assert verdict == {1: False, 2: True, 3: False, 4: True}
    gate.close()


def test_corpus_near_dup_gate_df_cap_keeps_scores_exact(spark):
    """df_cap drops hot corpus shingles from CANDIDATES only: a batch doc
    sharing only boilerplate with the corpus is not gated, while a true
    near-dup still is (verification runs on full sets)."""
    from jsonify2ai_spark.streaming.windowed import CorpusNearDupGate

    boiler = "all rights reserved terms apply"
    corpus = spark.createDataFrame(
        [(100 + i, f"{boiler} c{i}x c{i}y c{i}z c{i}w") for i in range(50)]
        + [(999, "entirely unique corpus document body here today")],
        "doc_id long, text string",
    )
    gate = CorpusNearDupGate(corpus, threshold=0.5, df_cap=8)
    batch = spark.createDataFrame(
        [(1, f"{boiler} mine alone completely new"),
         (2, "entirely unique corpus document body here today")],
        "doc_id long, text string",
    )
    kept = {r["doc_id"] for r in gate.filter_batch(batch).collect()}
    assert kept == {1}, kept  # boilerplate-only overlap passes; true dup gated
    gate.close()


def test_mixture_monitor_flags_drifting_mix(spark, tmp_path):
    """Windowed mixture telemetry: window 1 intake matches the 2:1 target
    (tokens_per_target equal across sources); window 2 over-samples the
    minor source (its tokens_per_target reads ~4x the major's)."""
    import json as _json

    from jsonify2ai_spark.streaming.windowed import mixture_monitor

    weights = spark.createDataFrame(
        [("big", 2 / 3), ("small", 1 / 3)], "source string, p_target double"
    )
    six = "a b c d e f"
    rows = [
        # window 10:00 — balanced vs target: big 12 tokens, small 6
        {"ts": "2026-01-01T10:01:00", "source": "big", "text": six},
        {"ts": "2026-01-01T10:02:00", "source": "big", "text": six},
        {"ts": "2026-01-01T10:03:00", "source": "small", "text": six},
        # window 11:00 — drifted: small over-sampled 2:1
        {"ts": "2026-01-01T11:01:00", "source": "big", "text": six},
        {"ts": "2026-01-01T11:02:00", "source": "small", "text": six},
        {"ts": "2026-01-01T11:03:00", "source": "small", "text": six},
    ]
    src = tmp_path / "mix_src"
    src.mkdir()
    (src / "a.json").write_text("\n".join(_json.dumps(r) for r in rows))
    stream = spark.readStream.schema(
        "ts timestamp, source string, text string"
    ).json(str(src))
    q = (
        mixture_monitor(stream, weights, window="10 minutes", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("mixmon")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "mix_ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        rows_out = {}
        while time.time() < deadline and len(rows_out) < 4:
            if q.exception():
                raise AssertionError(q.exception())
            q.processAllAvailable()
            rows_out = {
                (str(r["window_start"]), r["source"]): r
                for r in spark.sql("select * from mixmon").collect()
            }
            time.sleep(0.25)
        w1b = rows_out[("2026-01-01 10:00:00", "big")]
        w1s = rows_out[("2026-01-01 10:00:00", "small")]
        assert w1b["n_tokens"] == 12 and w1s["n_tokens"] == 6
        assert w1b["tokens_per_target"] == w1s["tokens_per_target"] == 18.0
        w2b = rows_out[("2026-01-01 11:00:00", "big")]
        w2s = rows_out[("2026-01-01 11:00:00", "small")]
        assert w2s["tokens_per_target"] == 4 * w2b["tokens_per_target"]
    finally:
        q.stop()


def test_boilerplate_line_gate_parity_and_streaming(spark):
    """Streaming face of q98: (a) PARITY — running the gate over its own
    corpus reproduces line_dedup's cleaned text md5 for every doc; (b) a
    NEW batch has corpus-boilerplate lines stripped while its unique lines
    survive in order, across two filter_batch calls on the same built-once
    artifacts."""
    import hashlib

    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.dedup import line_dedup
    from jsonify2ai_spark.streaming.windowed import BoilerplateLineGate

    bp = "subscribe to our newsletter"
    corpus = spark.createDataFrame(
        [(i, f"{bp}\nunique corpus line {i}") for i in range(5)],
        "doc_id long, text string",
    )
    gate = BoilerplateLineGate(corpus, max_line_df=2)

    # (a) parity with the batch operator over the same corpus
    batch_out = {
        r["doc_id"]: r for r in line_dedup(corpus, max_line_df=2).collect()
    }
    gate_out = {r["doc_id"]: r for r in gate.filter_batch(corpus).collect()}
    for i in range(5):
        assert (
            hashlib.md5(gate_out[i]["text"].encode()).hexdigest()
            == batch_out[i]["cleaned_md5"]
        )
        assert gate_out[i]["n_kept"] == batch_out[i]["n_kept"]

    # (b) two fresh batches against the SAME artifacts
    b1 = spark.createDataFrame(
        [(100, f"{bp}\nbrand new content a\nbrand new content b")],
        "doc_id long, text string",
    )
    (r1,) = gate.filter_batch(b1).collect()
    assert r1["text"] == "brand new content a\nbrand new content b"
    assert r1["n_lines"] == 3 and r1["n_kept"] == 2
    b2 = spark.createDataFrame(
        [(200, bp)], "doc_id long, text string"  # all boilerplate
    )
    (r2,) = gate.filter_batch(b2).collect()
    assert r2["text"] == "" and r2["n_kept"] == 0
    gate.close()


def test_decontamination_gate_parity_and_reuse(spark):
    """DecontaminationGate must (a) keep exactly the rows the batch
    decontaminate operator scores contaminated=False, in both surface and
    normalized modes, (b) serve multiple batches off the one persisted
    benchmark shingle set, and (c) never false-positive a non-ASCII batch
    doc against a punctuation-only benchmark row (the r7 empty-shingle
    guard, inherited)."""
    from jsonify2ai_spark.operators.dedup import decontaminate
    from jsonify2ai_spark.streaming.windowed import DecontaminationGate

    leaked = "what is the capital city of france in europe exactly"
    bench = spark.createDataFrame(
        [("WHAT... Is THE capital CITY, of FRANCE -- in EUROPE!! exactly",),
         ("!!! ... ???",)],
        "text string",
    )
    batch = spark.createDataFrame(
        [
            (1, leaked),
            (2, "a completely unrelated document about spark plans here"),
            (3, "这是一个完全中文的训练文档，没有任何拉丁字母在里面。"),
        ],
        "doc_id long, text string",
    )
    for normalize in (False, True):
        gate = DecontaminationGate(bench, n=8, normalize=normalize)
        want = {
            r["doc_id"]
            for r in decontaminate(batch, bench, n=8, normalize=normalize)
            .filter(~F.col("contaminated"))
            .collect()
        }
        got = {r["doc_id"] for r in gate.filter_batch(batch).collect()}
        assert got == want, (normalize, got, want)
        if normalize:
            assert 1 not in got  # mangled benchmark caught
        else:
            assert 1 in got  # surface mode misses the re-cased leak
        assert 3 in got  # non-ASCII doc never false-positived
        # second batch against the same persisted artifacts
        b2 = spark.createDataFrame(
            [(10, leaked + " padded out"), (11, "clean row")],
            "doc_id long, text string",
        )
        got2 = {r["doc_id"] for r in gate.filter_batch(b2).collect()}
        assert (10 in got2) == (not normalize) and 11 in got2
        gate.close()


def test_span_dedup_gate_cuts_corpus_spans_only(spark):
    """SpanDedupGate: a batch doc quoting a span duplicated IN THE CORPUS
    loses exactly that span; batch-internal duplication alone does not
    fire (static-artifact contract); unique docs pass through; the hot
    set serves multiple batches."""
    from jsonify2ai_spark.streaming.windowed import SpanDedupGate

    boiler = "all rights reserved contact us for terms of service details"
    corpus = spark.createDataFrame(
        [
            (1, f"first corpus doc body {boiler} more text here"),
            (2, f"second corpus doc {boiler} trailing words"),
            (3, "unique corpus content nothing shared anywhere"),
        ],
        "doc_id long, text string",
    )
    gate = SpanDedupGate(corpus, n=10, min_df=2)
    batch = spark.createDataFrame(
        [
            (100, f"incoming doc quoting {boiler} plus novel material"),
            (101, "entirely novel incoming document content here"),
            # batch-internal duplicate span, absent from the corpus:
            (102, "repeat me repeat me special sequence one two three four five six"),
            (103, "repeat me repeat me special sequence one two three four five six"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gate.filter_batch(batch).collect()}
    assert out[100]["text_dedup"] == "incoming doc quoting plus novel material"
    assert out[100]["n_tokens"] - out[100]["n_kept"] == 10
    assert out[101]["n_kept"] == out[101]["n_tokens"]
    # corpus-static contract: batch-internal dup spans are NOT corpus-hot
    assert out[102]["n_kept"] == out[102]["n_tokens"]
    assert out[103]["n_kept"] == out[103]["n_tokens"]
    # second batch, same artifacts
    b2 = spark.createDataFrame(
        [(200, f"{boiler} standalone")], "doc_id long, text string"
    )
    (r2,) = gate.filter_batch(b2).collect()
    assert r2["text_dedup"] == "standalone"
    gate.close()


def test_streaming_prep_chain_composes_all_four_gates(spark):
    """The composed chain must apply near-dup drop -> boilerplate-line
    strip -> span rewrite -> decontamination drop in order, preserving
    carry columns through the rewrite gates."""
    from jsonify2ai_spark.streaming.windowed import (
        BoilerplateLineGate,
        CorpusNearDupGate,
        DecontaminationGate,
        SpanDedupGate,
        StreamingPrepChain,
    )

    bp_line = "subscribe to our newsletter"
    span = "all rights reserved contact us for terms of service details"
    corpus = spark.createDataFrame(
        [
            (1, f"corpus doc one body text {span} end portion here\n{bp_line}"),
            (2, f"corpus doc two other words {span} closing bits now\n{bp_line}"),
            (3, f"corpus doc three unique material entirely\n{bp_line}"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("never use this benchmark question sentence in training data ever",)],
        "text string",
    )
    # line gate BEFORE the span gate: the span rewrite is token-level and
    # flattens newlines, so line-level stages must see the text first
    chain = StreamingPrepChain(
        [
            CorpusNearDupGate(corpus, threshold=0.8),
            BoilerplateLineGate(corpus, max_line_df=2),
            SpanDedupGate(corpus, n=10, min_df=2),
            DecontaminationGate(bench, n=8),
        ]
    )
    batch = spark.createDataFrame(
        [
            # near-dups corpus doc 1 -> dropped at stage 1
            (100, f"corpus doc one body text {span} end portion here\n{bp_line}", "s1"),
            # quotes the corpus span + a boilerplate line -> rewritten twice
            (101, f"novel opening {span} novel middle\n{bp_line}\nnovel closing line", "s2"),
            # leaks the benchmark -> dropped at stage 4
            (102, "never use this benchmark question sentence in training data ever", "s3"),
            # clean -> untouched
            (103, "completely clean incoming document body", "s4"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["doc_id"]: r for r in chain.filter_batch(batch).collect()}
    assert set(out) == {101, 103}
    assert out[101]["source"] == "s2"  # carry column survived the rewrites
    txt = out[101]["text"]
    assert "rights reserved" not in txt and "subscribe" not in txt
    assert "novel opening" in txt and "novel closing line" in txt
    assert out[103]["text"] == "completely clean incoming document body"
    chain.close()


def test_streaming_prep_chain_dispatches_on_explicit_kind(spark):
    """r7 advisor: the chain used to classify gates by duck-typing output
    columns — a batch already CARRYING a text_dedup column (e.g. re-running
    a partially-cleaned table through the chain) made a filter gate's
    passthrough look like a SpanDedupGate rewrite and scrambled the rows.
    Gates now declare kind='filter'|'rewrite' and the chain must (a) route
    a text_dedup-carrying batch through a filter gate untouched, and (b)
    refuse an undeclared gate loudly instead of guessing."""
    import pytest

    from jsonify2ai_spark.streaming.windowed import (
        DecontaminationGate,
        StreamingPrepChain,
    )

    bench = spark.createDataFrame(
        [("leak phrase alpha beta gamma delta epsilon zeta eta theta",)],
        "text string",
    )
    chain = StreamingPrepChain([DecontaminationGate(bench, n=8)])
    batch = spark.createDataFrame(
        [
            (1, "clean body one", "prior rewrite artifact"),
            (2, "leak phrase alpha beta gamma delta epsilon zeta eta theta", "x"),
        ],
        "doc_id long, text string, text_dedup string",
    )
    out = {r["doc_id"]: r for r in chain.filter_batch(batch).collect()}
    assert set(out) == {1}
    # filter passthrough: ALL columns intact, including the decoy
    assert out[1]["text"] == "clean body one"
    assert out[1]["text_dedup"] == "prior rewrite artifact"

    class UndeclaredGate:
        def filter_batch(self, b):
            return b

    with pytest.raises(TypeError, match="kind"):
        StreamingPrepChain([UndeclaredGate()]).filter_batch(batch)
    chain.close()


def test_span_dedup_gate_hot_set_broadcast_guard(spark):
    """r7 verdict #5: the gate's hot window-hash set can approach corpus
    size on a worst-case (near-wholly-duplicated) corpus; above
    broadcast_hot_max the per-batch probe must fall back to a plain
    shuffle semi-join — identical rows, and genuinely no broadcast of the
    hot side in the plan."""
    from jsonify2ai_spark.streaming.windowed import SpanDedupGate

    run = " ".join(f"tok{i}" for i in range(30))
    corpus = spark.createDataFrame(
        [
            (1, f"{run} trailer one"),
            (2, f"{run} trailer two"),
            (3, "an unrelated corpus document body entirely"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, f"prefix words {run} suffix words"),
            (101, "a clean incoming document"),
        ],
        "doc_id long, text string",
    )
    small = SpanDedupGate(corpus, n=10, min_df=2)  # default: broadcast
    forced = SpanDedupGate(corpus, n=10, min_df=2, broadcast_hot_max=0)
    assert forced._hot_count > 0  # the guard is actually engaged
    rows_b = sorted(tuple(r) for r in small.filter_batch(batch).collect())
    rows_s = sorted(tuple(r) for r in forced.filter_batch(batch).collect())
    assert rows_b == rows_s and rows_b  # parity both sides of the guard

    def n_broadcast_joins(gate):
        plan = gate.filter_batch(batch)._jdf.queryExecution().executedPlan().toString()
        return plan.count("BroadcastHashJoin")

    # the guard's semantic is hint-vs-defer: F.broadcast FORCES a
    # broadcast regardless of size (the OOM risk); the guarded form
    # defers to Catalyst, which on an oversized side will not broadcast.
    # Model 'oversized' by disabling auto-broadcast: the hinted gate must
    # still broadcast, the guarded one must not.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert n_broadcast_joins(small) >= 1  # hint still forces it
        assert n_broadcast_joins(forced) == 0  # guard defers, no broadcast
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    small.close()
    forced.close()


def test_gate_save_load_round_trip_parity(spark, tmp_path):
    """r8: every streaming gate's build-once corpus artifact persists and
    warm-loads (BM25Index.save's contract) — a stream restart resumes
    offsets from its checkpoint and gate state from here, without
    re-shingling the corpus. filter_batch output must be identical across
    the round-trip for all four gates, composed as a chain both ways."""
    from jsonify2ai_spark.streaming.windowed import (
        BoilerplateLineGate,
        CorpusNearDupGate,
        DecontaminationGate,
        SpanDedupGate,
        StreamingPrepChain,
    )

    bp = "subscribe to our newsletter"
    span = "all rights reserved contact us for terms of service details"
    corpus = spark.createDataFrame(
        [
            (1, f"corpus doc one body text {span} end portion here\n{bp}"),
            (2, f"corpus doc two other words {span} closing bits now\n{bp}"),
            (3, f"corpus doc three unique material entirely\n{bp}"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("never use this benchmark question sentence in training data ever",)],
        "text string",
    )
    built = [
        CorpusNearDupGate(corpus, threshold=0.8),
        BoilerplateLineGate(corpus, max_line_df=2),
        SpanDedupGate(corpus, n=10, min_df=2),
        DecontaminationGate(bench, n=8),
    ]
    for i, g in enumerate(built):
        g.save(str(tmp_path / f"g{i}"))
    loaded = [
        CorpusNearDupGate.load(spark, str(tmp_path / "g0")),
        BoilerplateLineGate.load(spark, str(tmp_path / "g1")),
        SpanDedupGate.load(spark, str(tmp_path / "g2")),
        DecontaminationGate.load(spark, str(tmp_path / "g3")),
    ]
    batch = spark.createDataFrame(
        [
            (100, f"corpus doc one body text {span} end portion here\n{bp}", "s1"),
            (101, f"novel opening {span} novel middle\n{bp}\nnovel closing", "s2"),
            (102, "never use this benchmark question sentence in training data ever", "s3"),
            (103, "completely clean incoming document body", "s4"),
        ],
        "doc_id long, text string, source string",
    )
    want = sorted(tuple(r) for r in StreamingPrepChain(built).filter_batch(batch).collect())
    got = sorted(tuple(r) for r in StreamingPrepChain(loaded).filter_batch(batch).collect())
    assert got == want and want
    # kind/rewritten_col dispatch attributes survive the load
    assert loaded[1].kind == "rewrite" and loaded[1].rewritten_col == "text"
    assert loaded[2].kind == "rewrite" and loaded[2].rewritten_col == "text_dedup"
    # the span gate's broadcast guard state survives too
    assert loaded[2]._hot_count == built[2]._hot_count > 0
    for g in built + loaded:
        g.close()


def test_diversity_cap_gate_budgets_across_batches(spark, tmp_path):
    """r8: the streaming diversity gate admits per-embedding-mode rows
    only while budget remains — across batches (arrival order), with
    within-batch hash-order ties, save/load resuming the same budgets,
    and chain composability as a filter gate."""
    from jsonify2ai_spark.streaming.windowed import (
        DiversityCapGate,
        StreamingPrepChain,
    )

    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    gate = DiversityCapGate(cents, cap=3, impl="expr")

    def batch(rows):
        return spark.createDataFrame(rows, "doc_id long, embedding array<double>")

    # batch 1: 2 dense-mode rows + 1 thin-mode row -> all admitted
    b1 = batch([(1, [1.0, 0.1, 0.0]), (2, [1.0, 0.2, 0.0]), (3, [0.0, 1.0, 0.1])])
    out1 = {r["doc_id"] for r in gate.filter_batch(b1).collect()}
    assert out1 == {1, 2, 3}
    assert gate._admitted == {0: 2, 1: 1}
    # batch 2: 3 more dense rows but only 1 budget left -> exactly one in
    b2 = batch([(4, [1.0, 0.3, 0.0]), (5, [1.0, 0.4, 0.0]), (6, [1.0, 0.5, 0.0])])
    out2 = [r for r in gate.filter_batch(b2).collect()]
    assert len(out2) == 1 and gate._admitted[0] == 3
    # schema is the INPUT schema (filter-gate contract for the chain)
    assert set(out2[0].asDict()) == {"doc_id", "embedding"}
    # batch 3: dense mode exhausted, thin mode still open
    b3 = batch([(7, [1.0, 0.6, 0.0]), (8, [0.0, 1.0, 0.2])])
    out3 = {r["doc_id"] for r in gate.filter_batch(b3).collect()}
    assert out3 == {8}

    # save/load resumes budgets exactly
    gate.save(str(tmp_path / "dg"))
    g2 = DiversityCapGate.load(spark, str(tmp_path / "dg"))
    assert g2._admitted == gate._admitted
    assert g2.filter_batch(batch([(9, [1.0, 0.7, 0.0])])).count() == 0
    assert g2.filter_batch(batch([(10, [0.0, 1.0, 0.3])])).count() == 1

    # chain dispatch: declared filter kind, composes without rewrites
    chain = StreamingPrepChain([DiversityCapGate(cents, cap=1, impl="expr")])
    got = chain.filter_batch(
        batch([(11, [1.0, 0.0, 0.0]), (12, [1.0, 0.1, 0.0])])
    ).count()
    assert got == 1
    gate.close()


def test_diversity_cap_gate_replay_idempotent(spark, tmp_path):
    """r9 (r8 advisor): foreachBatch is at-least-once — replaying the
    last batch_id must return the SAME admitted rows without debiting
    the budgets twice (re-derived from the pre-debit snapshot); an
    older batch_id raises; the snapshot survives save/load so a
    post-restart replay is still exact."""
    import pytest

    from jsonify2ai_spark.streaming.windowed import DiversityCapGate

    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    gate = DiversityCapGate(cents, cap=3, impl="expr")

    def batch(rows):
        return spark.createDataFrame(rows, "doc_id long, embedding array<double>")

    b1 = batch([(1, [1.0, 0.1, 0.0]), (2, [1.0, 0.2, 0.0])])
    first = {r["doc_id"] for r in gate.filter_batch(b1, batch_id=0).collect()}
    assert first == {1, 2} and gate._admitted == {0: 2, 1: 0}
    # replay of batch 0 (sink write failed): same rows, no double debit
    again = {r["doc_id"] for r in gate.filter_batch(b1, batch_id=0).collect()}
    assert again == first and gate._admitted == {0: 2, 1: 0}
    # state diverged-sink case: replay after save/load is still exact
    gate.save(str(tmp_path / "dg"))
    g2 = DiversityCapGate.load(spark, str(tmp_path / "dg"))
    replay = {r["doc_id"] for r in g2.filter_batch(b1, batch_id=0).collect()}
    assert replay == first and g2._admitted == {0: 2, 1: 0}
    # progress then attempt a two-deep rewind: refused
    g2.filter_batch(batch([(3, [1.0, 0.3, 0.0])]), batch_id=1)
    assert g2._admitted == {0: 3, 1: 0}
    with pytest.raises(ValueError, match="precedes last processed"):
        g2.filter_batch(b1, batch_id=0)
    # batch_id-less calls keep the one-shot always-debit semantics —
    # and INVALIDATE the replay snapshot: it captured pre-state the
    # budgets have since moved past, so a later replay of the last
    # batch_id must raise instead of silently re-deriving from stale
    # budgets (review-found r9)
    assert gate.filter_batch(batch([(4, [1.0, 0.4, 0.0])])).count() == 1
    assert gate._admitted == {0: 3, 1: 0}
    with pytest.raises(ValueError, match="one-shot debit"):
        gate.filter_batch(b1, batch_id=0)
    # the NEXT streaming batch re-arms the snapshot and replay works again
    b5 = batch([(5, [0.0, 1.0, 0.1])])
    once = {r["doc_id"] for r in gate.filter_batch(b5, batch_id=1).collect()}
    twice = {r["doc_id"] for r in gate.filter_batch(b5, batch_id=1).collect()}
    assert once == twice == {5} and gate._admitted == {0: 3, 1: 1}
    # the chain threads batch_id to stateful member gates: a chained
    # replay is idempotent too
    from jsonify2ai_spark.streaming.windowed import StreamingPrepChain

    cg = DiversityCapGate(cents, cap=2, impl="expr")
    chain = StreamingPrepChain([cg])
    cb = batch([(21, [1.0, 0.1, 0.0]), (22, [1.0, 0.2, 0.0]), (23, [1.0, 0.3, 0.0])])
    out_a = {r["doc_id"] for r in chain.filter_batch(cb, batch_id=0).collect()}
    out_b = {r["doc_id"] for r in chain.filter_batch(cb, batch_id=0).collect()}
    assert out_a == out_b and len(out_a) == 2 and cg._admitted == {0: 2, 1: 0}


def test_diversity_cap_gate_k2048_planning_flat(spark):
    """r9 (VERDICT r8 #3): the per-cluster budget is a K-row broadcast-
    joined frame, not a K-deep chained when() — at K=2048 (a production
    quantizer's scale, where linear expression depth hits the analyzer
    wall) one small batch must still plan and run promptly."""
    import time

    from jsonify2ai_spark.streaming.windowed import DiversityCapGate

    # 2048 deterministic unit-ish centroids in 8-d (no randomness APIs)
    cents = [
        [float((i * 7 + d * 3) % 17 + 1) for d in range(8)] for i in range(2048)
    ]
    gate = DiversityCapGate(cents, cap=1, impl="arrow")
    rows = [(i, [float((i * 5 + d) % 13 + 1) for d in range(8)]) for i in range(64)]
    b = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    t0 = time.monotonic()
    out = gate.filter_batch(b, batch_id=0)
    n = out.count()
    elapsed = time.monotonic() - t0
    assert 0 < n <= 64
    # cap respected per cluster
    assert all(v <= 1 for v in gate._admitted.values())
    # generous wall bound: the chained-when form at K=2048 does not get
    # anywhere near this; the join form plans in milliseconds
    assert elapsed < 60, elapsed


def test_leakage_gate_stream_equals_batch(spark, tmp_path):
    """r9 (VERDICT r8 #7): LeakageGate probes each micro-batch's held-out
    rows against the build-once train-shingle artifact — the union of
    per-batch reports over a replayed corpus equals split_leakage_report
    on the whole corpus; filter_batch drops exactly the leaked held rows;
    save/load warm-restarts the artifact."""
    from jsonify2ai_spark.operators.dedup import split_leakage_report
    from jsonify2ai_spark.streaming.windowed import LeakageGate

    phrase = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, f"train filler one {phrase} more train words", "train"),
        (2, "train filler two entirely its own material here", "train"),
        (3, "train third body with more filler text inside of it", "train"),
        (10, f"held doc quoting {phrase} verbatim", "val"),
        (11, "held doc with completely original content inside it", "test"),
        (12, f"another held row also quoting {phrase} outright", "val"),
    ]
    schema = "doc_id long, text string, split string"
    corpus = spark.createDataFrame(rows, schema)
    want = sorted(
        tuple(r) for r in split_leakage_report(corpus, n=8).collect()
    )

    gate = LeakageGate(corpus, n=8)
    # replay the same corpus as three micro-batches (train rows mixed in)
    batches = [rows[0:2], rows[2:4], rows[4:6]]
    got = []
    for b in batches:
        got += [
            tuple(r)
            for r in gate.report_batch(spark.createDataFrame(b, schema)).collect()
        ]
    assert sorted(got) == want

    # chain face: leaked held rows drop, clean held + train rows pass
    full = spark.createDataFrame(rows, schema)
    kept = {r["doc_id"] for r in gate.filter_batch(full).collect()}
    assert kept == {1, 2, 3, 11}

    # save/load: warm-restarted artifact gives identical reports
    gate.save(str(tmp_path / "lg"))
    g2 = LeakageGate.load(spark, str(tmp_path / "lg"))
    re_got = sorted(
        tuple(r) for r in g2.report_batch(full).collect()
    )
    assert re_got == want
    gate.close()
    g2.close()


def test_tokenize_gate_stream_batch_parity(spark, tmp_path):
    """r9: TokenizeGate encodes micro-batches with a FROZEN tokenizer —
    the union of per-batch ids over a replayed corpus equals
    tokenize_to_ids on the whole corpus; the append-shaped chain join
    carries the full input schema + token_ids; save/load and
    from_artifacts warm-restart the same inventory."""
    from jsonify2ai_spark.operators.bpe import (
        bpe_encode_fast,
        tokenize_to_ids,
        train_bpe,
    )
    from jsonify2ai_spark.operators.textstats import build_vocab
    from jsonify2ai_spark.streaming.windowed import StreamingPrepChain, TokenizeGate

    rows = [
        (1, "the cat sat on the mat", "a"),
        (2, "the cats sat on the mats", "a"),
        (3, "new newer newest low lower lowest", "b"),
        (4, "one tiny doc", "b"),
    ]
    schema = "doc_id long, text string, source string"
    corpus = spark.createDataFrame(rows, schema)
    merges = train_bpe(corpus, num_merges=12)
    enc = bpe_encode_fast(corpus, merges, out_col="_toks")
    vocab = build_vocab(enc, token_array_col="_toks")
    want = {
        r["doc_id"]: r["token_ids"]
        for r in tokenize_to_ids(corpus, merges, vocab).collect()
    }

    gate = TokenizeGate(merges, vocab)
    got = {}
    for b in (rows[:2], rows[2:]):
        for r in gate.filter_batch(spark.createDataFrame(b, schema)).collect():
            got[r["doc_id"]] = r["token_ids"]
            assert r["n_tokens"] == len(r["token_ids"])
    assert got == want

    # chain face: append shape — full input schema survives + token_ids
    out = StreamingPrepChain([gate]).filter_batch(corpus)
    assert set(out.columns) == {"doc_id", "text", "source", "token_ids"}
    assert {r["doc_id"]: r["token_ids"] for r in out.collect()} == want

    # save/load round-trip
    gate.save(str(tmp_path / "tg"))
    g2 = TokenizeGate.load(spark, str(tmp_path / "tg"))
    re_got = {
        r["doc_id"]: r["token_ids"] for r in g2.filter_batch(corpus).collect()
    }
    assert re_got == want

    # from_artifacts: the corpus_to_token_shards handoff
    from jsonify2ai_spark.pipelines import corpus_to_token_shards

    root = str(tmp_path / "full")
    corpus_to_token_shards(
        corpus.select("doc_id", "text"), root, num_merges=12, budget=16
    )
    g3 = TokenizeGate.from_artifacts(spark, root)
    a3 = {r["doc_id"]: r["token_ids"] for r in g3.filter_batch(corpus).collect()}
    assert a3 == want  # same corpus, same merges/vocab -> same ids
    gate.close()
    g2.close()
    g3.close()


def test_diversity_cap_gate_modeless_rows_admit(spark):
    """r9 review: batch rows with NULL/wrong-dim embeddings have no mode
    — they admit uncapped and never debit a budget."""
    from jsonify2ai_spark.streaming.windowed import DiversityCapGate

    gate = DiversityCapGate([[1.0, 0.0], [0.0, 1.0]], cap=1)
    batch = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),       # same mode as 1 -> one admitted
            (3, None),             # modeless -> admits
            (4, [1.0, 0.0, 0.0]),  # wrong dim -> admits
        ],
        "doc_id long, embedding array<double>",
    )
    kept = {r["doc_id"] for r in gate.filter_batch(batch).collect()}
    assert {3, 4} <= kept and len(kept & {1, 2}) == 1
    # budgets: only the valid admission debited
    assert sum(gate._admitted.values()) == 1
    gate.close()


def test_leakage_gate_broadcast_guard_parity(spark):
    """r9 review: above broadcast_held_max the probe joins shuffled
    instead of force-broadcast — identical report either side of the
    threshold."""
    from jsonify2ai_spark.streaming.windowed import LeakageGate

    phrase = "one two three four five six seven eight nine ten"
    rows = [
        (1, f"train body {phrase} filler", "train"),
        (10, f"held doc {phrase} quoted", "val"),
        (11, "held doc with its own words entirely here", "test"),
    ]
    schema = "doc_id long, text string, split string"
    corpus = spark.createDataFrame(rows, schema)
    big = LeakageGate(corpus, n=8)                         # broadcast arm
    small = LeakageGate(corpus, n=8, broadcast_held_max=0)  # forced fallback
    a = sorted(tuple(r) for r in big.report_batch(corpus).collect())
    b = sorted(tuple(r) for r in small.report_batch(corpus).collect())
    assert a == b and any(r[3] for r in a)  # same report; leak detected
    # guard setting survives save/load
    big.close()
    small.close()


def test_tokenize_gate_rejects_bad_oov(spark):
    """r9 review: an invalid oov policy fails at CONSTRUCTION, not as a
    mid-stream per-batch crash (or a corrupted save round-trip)."""
    import pytest as _pytest

    from jsonify2ai_spark.streaming.windowed import TokenizeGate

    vocab = spark.createDataFrame([("a", 0)], "token string, token_id long")
    with _pytest.raises(ValueError, match="oov"):
        TokenizeGate([], vocab, oov="unk")
    with _pytest.raises(ValueError, match="oov"):
        TokenizeGate([], vocab, oov=True)
    with _pytest.raises(ValueError, match="oov_alert"):
        TokenizeGate([], vocab, oov_alert=1.5)


def test_leakage_gate_rebuild_covers_streamed_train(spark):
    """r10 (r9 advisor): the train artifact is a STATIC snapshot — a held
    doc colliding only with post-construction train arrivals reads clean
    until rebuild() re-snapshots the grown corpus (the explicit offline
    refresh, mirroring refresh_quantizer)."""
    from jsonify2ai_spark.streaming.windowed import LeakageGate

    phrase = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    schema = "doc_id long, text string, split string"
    corpus0 = spark.createDataFrame(
        [(1, "original train body with its own words only here", "train")],
        schema,
    )
    gate = LeakageGate(corpus0, n=8)

    # a NEW train doc streams in carrying the phrase; a held doc quotes it
    new_train = (2, f"late train arrival {phrase} appended", "train")
    held = (10, f"held doc quoting {phrase} verbatim", "val")
    batch = spark.createDataFrame([new_train, held], schema)

    # static snapshot: the held doc reads CLEAN (documented limitation)
    rep = {r["doc_id"]: r["leaked"] for r in gate.report_batch(batch).collect()}
    assert rep == {10: False}

    # offline refresh with the grown corpus -> the leak is now visible
    gate.rebuild(corpus0.unionByName(spark.createDataFrame([new_train], schema)))
    rep2 = {r["doc_id"]: r["leaked"] for r in gate.report_batch(batch).collect()}
    assert rep2 == {10: True}
    gate.close()


def test_tokenize_gate_oov_monitor(spark, tmp_path):
    """r10 (r9 verdict #6): oov_alert= measures each batch's OOV token
    rate against the frozen vocab — no breach on the training corpus
    itself, breach flagged on a drifted stream; the metric is counted
    against the mapping so it works identically under an <unk>
    substitution policy; the threshold survives save/load."""
    from jsonify2ai_spark.operators.bpe import (
        bpe_encode_fast,
        train_bpe,
    )
    from jsonify2ai_spark.operators.textstats import build_vocab
    from jsonify2ai_spark.streaming.windowed import TokenizeGate

    rows = [
        (1, "the cat sat on the mat", "a"),
        (2, "the cats sat on the mats", "a"),
    ]
    schema = "doc_id long, text string, source string"
    corpus = spark.createDataFrame(rows, schema)
    merges = train_bpe(corpus, num_merges=12)
    enc = bpe_encode_fast(corpus, merges, out_col="_toks")
    vocab = build_vocab(enc, token_array_col="_toks")

    gate = TokenizeGate(merges, vocab, oov_alert=0.3)
    # the training corpus through its own tokenizer: zero OOV, no breach
    gate.filter_batch(corpus).collect()
    assert gate.oov_history[-1]["n_oov"] == 0
    assert not gate.oov_breached

    # drifted stream: vocabulary the tokenizer never saw
    drift = spark.createDataFrame(
        [(7, "zygomorphic quasar xylophone jurisprudence", "z")], schema
    )
    gate.filter_batch(drift).collect()
    assert gate.oov_history[-1]["oov_rate"] > 0.3
    assert gate.oov_breached
    assert len(gate.oov_history) == 2

    # same metric under the <unk> substitution policy (id-array length
    # would hide substitutions — the count is against the mapping)
    unk = TokenizeGate(merges, vocab, oov=0, oov_alert=0.3)
    unk.filter_batch(drift).collect()
    assert unk.oov_breached
    assert (
        unk.oov_history[-1]["n_oov"] == gate.oov_history[-1]["n_oov"]
    )

    # threshold round-trips; history is fresh telemetry after restart
    gate.save(str(tmp_path / "tg"))
    g2 = TokenizeGate.load(spark, str(tmp_path / "tg"))
    assert g2._oov_alert == 0.3 and g2.oov_history == []
    g2.filter_batch(drift).collect()
    assert g2.oov_breached
    gate.close()
    unk.close()
    g2.close()


# ---------------------------------------------------------------------------
# PackGate (r10 operator; r10 verdict #3 — the test suite it shipped without)
# ---------------------------------------------------------------------------


def _pack_batch_oracle(df, budget, eos_id, n_groups, boundaries=False):
    """The batch path PackGate claims parity with: pack_sequences over
    size = n_ids (+1 per doc when eos), then concat_token_bins."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.packing import (
        concat_token_bins,
        pack_sequences,
    )

    sized = df.withColumn(
        "_sz", F.size("token_ids") + (1 if eos_id is not None else 0)
    )
    packed = pack_sequences(
        sized, budget, size_col="_sz", id_col="doc_id", n_groups=n_groups
    )
    return concat_token_bins(
        packed,
        eos_id=eos_id,
        pad_to=budget,
        with_boundaries=boundaries,
    )


def _bins_key(rows):
    return sorted(
        (r["pack_group"], r["bin_idx"], r["n_docs"], r["n_ids"], tuple(r["input_ids"]))
        for r in rows
    )


def test_pack_gate_stream_equals_batch(spark):
    """The docstring's parity claim, pinned: replaying a corpus in
    id-ordered batches and unioning every trigger's closed bins + the
    flush reproduces pack_sequences + concat_token_bins row-for-row
    (same eos-inclusive weight rule as _pack_and_write_ids)."""
    from jsonify2ai_spark.streaming.windowed import PackGate

    docs = [(i, [100 + i] * (1 + (i * 7) % 6)) for i in range(60)]
    schema = "doc_id long, token_ids array<bigint>"
    corpus = spark.createDataFrame(docs, schema)
    batch_bins = _pack_batch_oracle(corpus, budget=16, eos_id=2, n_groups=4)

    gate = PackGate(budget=16, n_groups=4, eos_id=2)
    got = []
    for b, lo in enumerate(range(0, 60, 20)):
        part = spark.createDataFrame(docs[lo : lo + 20], schema)
        got.extend(gate.filter_batch(part, batch_id=b).collect())
    fl = gate.flush()
    assert fl is not None
    got.extend(fl.collect())

    assert _bins_key(got) == _bins_key(batch_bins.collect())
    # flush cleared the buffers: a second flush has nothing to say
    assert gate.flush() is None


def test_pack_gate_boundaries_parity(spark):
    """with_boundaries threads through: doc_ids/doc_lens per emitted
    sequence match the batch operator's (lens include each doc's eos
    and sum to n_ids)."""
    from jsonify2ai_spark.streaming.windowed import PackGate

    docs = [(i, [7] * (1 + i % 5)) for i in range(24)]
    schema = "doc_id long, token_ids array<bigint>"
    corpus = spark.createDataFrame(docs, schema)
    want = {
        (r["pack_group"], r["bin_idx"]): (list(r["doc_ids"]), list(r["doc_lens"]))
        for r in _pack_batch_oracle(
            corpus, budget=12, eos_id=9, n_groups=3, boundaries=True
        ).collect()
    }

    gate = PackGate(budget=12, n_groups=3, eos_id=9, boundaries=True)
    rows = gate.filter_batch(corpus.filter("doc_id < 12"), batch_id=0).collect()
    rows += gate.filter_batch(corpus.filter("doc_id >= 12"), batch_id=1).collect()
    fl = gate.flush()
    rows += fl.collect() if fl is not None else []
    got = {
        (r["pack_group"], r["bin_idx"]): (list(r["doc_ids"]), list(r["doc_lens"]))
        for r in rows
    }
    assert got == want
    for (_, _), (ids, lens) in got.items():
        assert len(ids) == len(lens)


def test_pack_gate_replay_idempotent(spark):
    """DiversityCapGate's one-deep replay contract, applied verbatim:
    re-delivering the last batch_id re-derives the SAME closed bins from
    the pre-batch snapshot without advancing state; the stream then
    continues correctly; an older batch_id raises."""
    import pytest

    from jsonify2ai_spark.streaming.windowed import PackGate

    schema = "doc_id long, token_ids array<bigint>"
    docs = [(i, [5] * (2 + i % 4)) for i in range(30)]
    b1 = spark.createDataFrame(docs[:10], schema)
    b2 = spark.createDataFrame(docs[10:20], schema)
    b3 = spark.createDataFrame(docs[20:], schema)

    gate = PackGate(budget=10, n_groups=2, eos_id=None)
    gate.filter_batch(b1, batch_id=0).collect()
    first = _bins_key(gate.filter_batch(b2, batch_id=1).collect())
    state_after = (dict(gate._next_bin), {g: list(d) for g, d in gate._open.items()})

    # at-least-once redelivery of batch 1
    replay = _bins_key(gate.filter_batch(b2, batch_id=1).collect())
    assert replay == first
    assert (gate._next_bin, gate._open) == state_after  # state NOT advanced

    # continuation after the replay matches a never-replayed twin
    twin = PackGate(budget=10, n_groups=2, eos_id=None)
    twin.filter_batch(b1, batch_id=0).collect()
    twin.filter_batch(b2, batch_id=1).collect()
    assert _bins_key(gate.filter_batch(b3, batch_id=2).collect()) == _bins_key(
        twin.filter_batch(b3, batch_id=2).collect()
    )

    with pytest.raises(ValueError, match="precedes"):
        gate.filter_batch(b1, batch_id=0)


def test_pack_gate_batchidless_poisons_snapshot(spark):
    """A batch_id-less one-shot call moves state past the replay
    snapshot; a subsequent same-batch_id redelivery must refuse rather
    than replay against the wrong baseline."""
    import pytest

    from jsonify2ai_spark.streaming.windowed import PackGate

    schema = "doc_id long, token_ids array<bigint>"
    b1 = spark.createDataFrame([(i, [1, 2, 3]) for i in range(6)], schema)
    gate = PackGate(budget=8, n_groups=2)
    gate.filter_batch(b1, batch_id=0).collect()
    gate.filter_batch(b1).collect()  # one-shot, no batch_id
    with pytest.raises(ValueError, match="one-shot"):
        gate.filter_batch(b1, batch_id=0)


def test_pack_gate_save_load_mid_stream(spark, tmp_path):
    """Restart mid-stream: save/load round-trips open-bin buffers,
    next-bin counters, and the replay snapshot; the resumed gate emits
    the same bins an uninterrupted gate would."""
    from jsonify2ai_spark.streaming.windowed import PackGate

    schema = "doc_id long, token_ids array<bigint>"
    docs = [(i, [3] * (1 + i % 3)) for i in range(40)]
    b1 = spark.createDataFrame(docs[:20], schema)
    b2 = spark.createDataFrame(docs[20:], schema)

    gate = PackGate(budget=7, n_groups=4, eos_id=1)
    out1 = gate.filter_batch(b1, batch_id=0).collect()
    gate.save(str(tmp_path / "pg"))
    g2 = PackGate.load(spark, str(tmp_path / "pg"))
    assert g2._next_bin == gate._next_bin
    assert g2._open == gate._open
    assert g2._last_batch_id == gate._last_batch_id

    cont = PackGate(budget=7, n_groups=4, eos_id=1)
    cont.filter_batch(b1, batch_id=0).collect()
    want = _bins_key(cont.filter_batch(b2, batch_id=1).collect())
    assert _bins_key(g2.filter_batch(b2, batch_id=1).collect()) == want
    fl_a, fl_b = g2.flush(), cont.flush()
    assert _bins_key(fl_a.collect()) == _bins_key(fl_b.collect())
    assert len(out1) > 0


def test_pack_gate_edges(spark):
    """Oversized document (single-doc bin at true length > budget, never
    truncated), exactly-full bin (closes without spill), empty/NULL id
    arrays, and non-numeric + negative ids grouping consistently with
    the batch packer."""
    from jsonify2ai_spark.streaming.windowed import PackGate

    schema = "doc_id long, token_ids array<bigint>"

    # oversized: doc of 9 ids vs budget 4 — its own bin, length 9, and
    # the successor opens a fresh bin (next-fit buffers at most one bin)
    gate = PackGate(budget=4, n_groups=1)
    b = spark.createDataFrame([(0, [1] * 9), (1, [2, 2]), (2, [3, 3])], schema)
    closed = gate.filter_batch(b, batch_id=0).collect()
    over = [r for r in closed if r["n_ids"] == 9]
    assert len(over) == 1 and len(over[0]["input_ids"]) == 9  # not padded down
    fl = gate.flush().collect()
    assert {tuple(r["input_ids"][: r["n_ids"]]) for r in closed + fl} == {
        (1,) * 9,
        (2, 2, 3, 3),
    }

    # exactly-full bin closes cleanly: 2+2 into budget 4, successor spills
    gate2 = PackGate(budget=4, n_groups=1)
    b2 = spark.createDataFrame([(0, [1, 1]), (1, [2, 2]), (2, [3])], schema)
    closed2 = gate2.filter_batch(b2, batch_id=0).collect()
    assert len(closed2) == 1 and closed2[0]["n_ids"] == 4
    assert list(closed2[0]["input_ids"]) == [1, 1, 2, 2]

    # empty + NULL arrays: zero weight (no eos), never close a bin alone
    gate3 = PackGate(budget=3, n_groups=1)
    b3 = spark.createDataFrame([(0, []), (1, None), (2, [4, 4, 4])], schema)
    assert gate3.filter_batch(b3, batch_id=0).count() == 0
    assert gate3.flush().count() == 1

    # string + negative ids: same parity as the batch oracle
    sschema = "doc_id string, token_ids array<bigint>"
    sdocs = [(f"d{i}", [6] * (1 + i % 3)) for i in range(12)]
    scorpus = spark.createDataFrame(sdocs, sschema)
    want = _bins_key(
        _pack_batch_oracle(scorpus, budget=5, eos_id=None, n_groups=2).collect()
    )
    sgate = PackGate(budget=5, n_groups=2)
    rows = sgate.filter_batch(scorpus, batch_id=0).collect()
    rows += sgate.flush().collect()
    assert _bins_key(rows) == want

    ndocs = [(-3, [1, 1]), (-2, [2, 2]), (5, [3, 3]), (6, [4, 4])]
    ncorpus = spark.createDataFrame(ndocs, schema)
    want_n = _bins_key(
        _pack_batch_oracle(ncorpus, budget=4, eos_id=None, n_groups=4).collect()
    )
    ngate = PackGate(budget=4, n_groups=4)
    rows_n = ngate.filter_batch(ncorpus, batch_id=0).collect()
    rows_n += ngate.flush().collect()
    assert _bins_key(rows_n) == want_n


def test_tokenize_gate_oov_history_replay_safe(spark):
    """r10 advisor: the OOV monitor mutates driver state (oov_history)
    per trigger — an at-least-once replay of the same batch_id must
    overwrite its own entry, not append a duplicate (which skews
    indices/rates and can flip oov_breached on stale data)."""
    from jsonify2ai_spark.operators.bpe import bpe_encode_fast, train_bpe
    from jsonify2ai_spark.operators.textstats import build_vocab
    from jsonify2ai_spark.streaming.windowed import TokenizeGate

    schema = "doc_id long, text string, lang string"
    corpus = spark.createDataFrame(
        [(1, "the cat sat on the mat", "x"), (2, "the cats sat", "x")], schema
    )
    merges = train_bpe(corpus, num_merges=8)
    vocab = build_vocab(
        bpe_encode_fast(corpus, merges, out_col="_toks"), token_array_col="_toks"
    )
    gate = TokenizeGate(merges, vocab, oov_alert=0.3)

    b1 = corpus.filter("doc_id = 1")
    b2 = spark.createDataFrame(
        [(7, "zygomorphic quasar xylophone jurisprudence", "z")], schema
    )
    gate.filter_batch(b1, batch_id=0).collect()
    gate.filter_batch(b2, batch_id=1).collect()
    assert len(gate.oov_history) == 2 and gate.oov_breached

    # replay of batch_id=1: same history length, same entry, same signal
    snap = dict(gate.oov_history[-1])
    gate.filter_batch(b2, batch_id=1).collect()
    assert len(gate.oov_history) == 2
    assert gate.oov_history[-1] == snap

    # batch_id-less one-shot calls still append every time (the batch API)
    gate.filter_batch(b1).collect()
    gate.filter_batch(b1).collect()
    assert len(gate.oov_history) == 4
    assert not gate.oov_breached  # clean batches reset the signal


def test_pack_gate_shard_sink_live_stream(spark, tmp_path):
    """r11: the REAL Structured Streaming wiring — a parquet file source
    of token-id rows drives foreachBatch(StreamShardSink); a restarted
    query (same checkpoint, fresh sink from_artifacts) resumes without
    duplicating or losing ids; flush lands the tail; read_token_shards
    loads everything. Complements the trigger-simulation test in
    test_pipelines.py with the genuine query lifecycle."""
    import os

    from jsonify2ai_spark.pipelines import (
        StreamShardSink,
        corpus_to_token_shards,
        read_token_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"base doc {i} alpha beta gamma") for i in range(3)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "run")
    base = corpus_to_token_shards(
        docs,
        out,
        num_merges=5,
        budget=12,
        n_groups=2,
        assemble=True,
        eos_id=0,
        boundaries=True,
    )

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, token_ids array<bigint>"
    batch1 = [(100 + i, [7] * (2 + i % 4)) for i in range(8)]
    batch2 = [(200 + i, [9] * (1 + i % 3)) for i in range(8)]
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        str(src / "b1")
    )

    def run_stream(sink):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        return (
            stream.writeStream.foreachBatch(
                lambda b, bid: sink(b, bid) and None
            )
            .option("checkpointLocation", ckpt)
            .start()
        )

    sink = StreamShardSink.from_artifacts(out)
    q = run_stream(sink)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # restart: new file lands while the query is down; a fresh sink
    # resumes the persisted gate state, same checkpoint dedups triggers
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
        str(src / "b2")
    )
    sink2 = StreamShardSink.from_artifacts(out)
    q2 = run_stream(sink2)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    sink2.flush()

    rows = read_token_shards(spark, out, validate=True).collect()
    stream_rows = [r for r in rows if r["_source_run"] != "base"]
    assert sum(r["n_ids"] for r in stream_rows) == sum(
        len(t) + 1 for _, t in batch1 + batch2
    )
    streamed_ids = sorted(
        i for r in stream_rows for i in r["doc_ids"]
    )
    assert streamed_ids == sorted(i for i, _ in batch1 + batch2)
    assert len(rows) - len(stream_rows) == base["rows"]
    assert os.path.isdir(os.path.join(out, "pack_gate_state"))


def test_dsir_gate_stream_equals_batch_and_annotate(spark, tables):
    """DSIRGate (r11): per-batch scoring under the frozen bucket models
    reproduces dsir_weights row-for-row over a replayed corpus; the
    annotate face (kind='rewrite') is TOTAL — every input id gets a row,
    featureless docs annotate NULL — and composes through
    StreamingPrepChain as an append-shaped rewrite."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.sampling import dsir_weights
    from jsonify2ai_spark.streaming.windowed import DSIRGate, StreamingPrepChain

    docs = tables["documents"].select("doc_id", "text", "lang")
    target = docs.filter("lang = 'en'")
    gate = DSIRGate(docs, target, buckets=5_000)
    assert gate.kind == "rewrite"

    batch = dsir_weights(docs, target, buckets=5_000)
    want = {r["doc_id"]: repr((r["n_feats"], r["log_weight"], r["logw_per_feat"]))
            for r in batch.collect()}
    got = {}
    for part in range(3):
        b = docs.filter(F.col("doc_id") % 3 == part)
        for r in gate.score_batch(b).collect():
            got[r["doc_id"]] = repr((r["n_feats"], r["log_weight"], r["logw_per_feat"]))
    assert got == want  # stream == batch, repr-strict

    with_empty = docs.limit(5).union(
        spark.createDataFrame([(999999, "   ", "xx")], docs.schema)
    )
    ann = {r["doc_id"]: r["dsir_log_weight"]
           for r in gate.filter_batch(with_empty).collect()}
    assert set(ann) == {r["doc_id"] for r in with_empty.collect()}
    assert ann[999999] is None  # featureless -> NULL, row kept

    chained = StreamingPrepChain([gate]).filter_batch(with_empty)
    crow = {r["doc_id"]: r["dsir_log_weight"] for r in chained.collect()}
    assert crow == ann and "text" in chained.columns
    gate.close()


def test_dsir_gate_cutoff_replay_and_save_load(spark, tables, tmp_path):
    """DSIRGate thin mode: the deterministic Gumbel-key cutoff keeps the
    same rows as the batch-side key computation, a replayed batch keeps
    exactly the same rows (no cross-batch state), featureless docs drop,
    and save/load round-trips models, mode, and scores."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.sampling import (
        calibrate_dsir_cutoff,
        dsir_resample,
        dsir_weights,
    )
    from jsonify2ai_spark.streaming.windowed import DSIRGate

    docs = tables["documents"].select("doc_id", "text", "lang")
    target = docs.filter("lang = 'en'")
    w = dsir_weights(docs, target, buckets=5_000).localCheckpoint(eager=False)
    # calibrate (r11 verdict #4: derived, not hand-computed): the cutoff
    # that keeps ~100/n of the calibration corpus — must equal the
    # 100th resample key the hand recipe used
    n = w.count()
    cutoff = calibrate_dsir_cutoff(w, 100 / n)
    hand = dsir_resample(w, 100).agg(F.min("resample_key")).collect()[0][0]
    assert cutoff == hand

    gate = DSIRGate(docs, target, buckets=5_000, key_cutoff=cutoff)
    assert gate.kind == "filter"
    kept = gate.filter_batch(docs)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    expect = {r["doc_id"] for r in dsir_resample(w, w.count()).filter(
        F.col("resample_key") >= cutoff).collect()}
    assert kept_ids == expect and len(kept_ids) >= 100
    assert kept.columns == docs.columns  # input schema survives

    replay = {r["doc_id"] for r in gate.filter_batch(docs).collect()}
    assert replay == kept_ids  # idempotent under at-least-once delivery

    empty = spark.createDataFrame([(777777, "", "xx")], docs.schema)
    assert gate.filter_batch(empty).count() == 0  # no weight, no ticket

    path = str(tmp_path / "dsir_gate")
    gate.save(path)
    loaded = DSIRGate.load(spark, path)
    assert loaded.kind == "filter"
    assert {r["doc_id"] for r in loaded.filter_batch(docs).collect()} == kept_ids
    gate.close()
    loaded.close()


def test_dsir_gate_unseen_buckets_fold_to_constant(spark):
    """Drifted text hashing into buckets NEITHER fit-time model saw folds
    to the constant count-0 smoothing logratio ln(Nr+aB)-ln(Nt+aB) — no
    NULL scores, and an all-novel document scores exactly
    round(n_feats * const, 4)."""
    import pytest

    from jsonify2ai_spark.streaming.windowed import DSIRGate

    fit = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta delta")], "doc_id long, text string"
    )
    # B >> distinct fit grams: a novel gram is almost surely an unseen bucket
    gate = DSIRGate(fit, fit.filter("doc_id = 1"), buckets=1_000_000)
    novel = spark.createDataFrame(
        [(9, "zzqx wwvk yyrt")], "doc_id long, text string"
    )
    row = gate.score_batch(novel).collect()[0]
    assert row["log_weight"] is not None
    assert row["n_feats"] == 5  # 3 unigrams + 2 bigrams
    assert row["log_weight"] == pytest.approx(5 * gate._unseen, abs=1e-4)
    gate.close()


def test_dsir_gate_live_readstream_chain(spark, tmp_path):
    """DSIRGate on a LIVE file-source readStream through foreachBatch:
    the thin-mode gate drops off-target documents as triggers fire, and
    the surviving set equals the batch-side key filter over the same
    rows — the standing-curation wiring, not a trigger simulation."""
    import json as _json

    from jsonify2ai_spark.operators.sampling import dsir_resample, dsir_weights
    from jsonify2ai_spark.streaming.windowed import DSIRGate

    fit_rows = [
        (i, f"the cat number {i} sat on a mat" if i % 2 == 0
         else f"zz{i} qq{i} ww{i} vv{i} kk{i}")
        for i in range(16)
    ]
    schema = "doc_id long, text string"
    fit = spark.createDataFrame(fit_rows, schema)
    target = fit.filter(F.col("doc_id") % 2 == 0)
    w = dsir_weights(fit, target, buckets=5_000).localCheckpoint()
    cutoff = float(
        w.agg(F.expr("percentile(log_weight, 0.5)")).collect()[0][0]
    )
    expect = {
        r["doc_id"]
        for r in dsir_resample(w, w.count())
        .filter(F.col("resample_key") >= cutoff)
        .collect()
    }

    gate = DSIRGate(fit, target, buckets=5_000, key_cutoff=cutoff)
    src = tmp_path / "dsir_src"
    src.mkdir()
    for part in range(2):
        (src / f"{part}.json").write_text(
            "\n".join(
                _json.dumps({"doc_id": i, "text": t})
                for i, t in fit_rows[part * 8 : part * 8 + 8]
            )
        )
    got = []
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    q = (
        stream.writeStream.foreachBatch(
            gate.foreach_batch(
                lambda df, bid: got.extend(
                    r["doc_id"] for r in df.select("doc_id").collect()
                )
            )
        )
        .option("checkpointLocation", str(tmp_path / "dsir_ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline and len(set(got)) < len(expect):
            if q.exception():
                raise AssertionError(q.exception())
            q.processAllAvailable()
            time.sleep(0.25)
        assert set(got) == expect and 0 < len(expect) < 16
    finally:
        q.stop()
    gate.close()


def test_dsir_gate_drift_monitor(spark, tables, tmp_path):
    """drift_alert: each batch's UNSEEN-feature rate (gram mass in
    buckets neither fit-time model saw — the OOV analog; mean log-weight
    is useless here, the Laplace floor makes novel text look
    target-like) lands in drift_history; fit-corpus batches stay quiet,
    a novel batch breaches; a replayed batch_id OVERWRITES its own entry
    (at-least-once hygiene); the threshold survives save/load and a
    fresh-loaded gate starts a fresh window."""
    from jsonify2ai_spark.streaming.windowed import DSIRGate

    docs = tables["documents"].select("doc_id", "text", "lang")
    target = docs.filter("lang = 'en'")
    gate = DSIRGate(docs, target, buckets=1_000_000, drift_alert=0.3)

    on_target = target.limit(20)
    gate.filter_batch(on_target, batch_id=0)
    assert len(gate.drift_history) == 1
    assert gate.drift_history[0]["unseen_rate"] == 0.0  # fit corpus
    assert not gate.drift_breached

    drifted = spark.createDataFrame(
        [(10_000 + i, f"zzq{i} wvk{i} yrt{i} pqm{i}", "xx") for i in range(20)],
        docs.schema,
    )
    gate.filter_batch(drifted, batch_id=1)
    assert gate.drift_history[-1]["unseen_rate"] > 0.9  # novel grams
    assert gate.drift_breached

    before = dict(gate.drift_history[-1])
    gate.filter_batch(drifted, batch_id=1)  # replay
    assert len(gate.drift_history) == 2  # overwrote, didn't append
    assert gate.drift_history[-1]["batch"] == before["batch"]

    path = str(tmp_path / "dg")
    gate.save(path)
    loaded = DSIRGate.load(spark, path)
    assert loaded._drift_alert == 0.3 and loaded.drift_history == []
    loaded.filter_batch(drifted, batch_id=0)
    assert loaded.drift_breached
    gate.close()
    loaded.close()


def test_dsir_gate_shuffled_join_fallback_parity(spark, tables):
    """r11 verdict #2: above broadcast_model_max the per-batch score
    join must fall back to a plain shuffled join — identical annotate
    AND thin output, and genuinely no broadcast of the model frame in
    the executed plan (the SpanDedupGate hint-vs-defer contract,
    test_span_dedup_gate_hot_set_broadcast_guard)."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.sampling import dsir_resample, dsir_weights
    from jsonify2ai_spark.streaming.windowed import DSIRGate

    docs = tables["documents"].select("doc_id", "text", "lang").limit(60)
    target = docs.filter("lang = 'en'")
    hinted = DSIRGate(docs, target, buckets=5_000)
    forced = DSIRGate(docs, target, buckets=5_000, broadcast_model_max=0)

    ann_h = sorted(tuple(r) for r in hinted.filter_batch(docs).collect())
    ann_f = sorted(tuple(r) for r in forced.filter_batch(docs).collect())
    assert ann_h == ann_f and ann_h  # annotate parity, repr-equal rows

    w = dsir_weights(docs, target, buckets=5_000)
    cutoff = (
        dsir_resample(w, 20).agg(F.min("resample_key")).collect()[0][0]
    )
    thin_h = DSIRGate(docs, target, buckets=5_000, key_cutoff=cutoff)
    thin_f = DSIRGate(
        docs, target, buckets=5_000, key_cutoff=cutoff, broadcast_model_max=0
    )
    ids_h = {r["doc_id"] for r in thin_h.filter_batch(docs).collect()}
    ids_f = {r["doc_id"] for r in thin_f.filter_batch(docs).collect()}
    assert ids_h == ids_f and ids_h  # thin parity

    def n_broadcast_joins(gate):
        plan = (
            gate.score_batch(docs)._jdf.queryExecution().executedPlan().toString()
        )
        return plan.count("BroadcastHashJoin")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert n_broadcast_joins(hinted) >= 1  # F.broadcast still forces it
        assert n_broadcast_joins(forced) == 0  # guard defers, no broadcast
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    for g in (hinted, forced, thin_h, thin_f):
        g.close()


def test_dsir_gate_foreach_batch_threads_batch_id(spark, tables):
    """r11 advisor (medium): the standalone foreachBatch wrapper must
    thread batch_id into filter_batch so the drift monitor's
    replay-overwrite hygiene holds — an at-least-once redelivery of the
    same trigger OVERWRITES its drift_history entry instead of
    appending a duplicate (and cannot flip drift_breached on stale
    data)."""
    from jsonify2ai_spark.streaming.windowed import DSIRGate

    docs = tables["documents"].select("doc_id", "text", "lang")
    target = docs.filter("lang = 'en'")
    gate = DSIRGate(docs, target, buckets=1_000_000, drift_alert=0.3)

    sunk = []
    fn = gate.foreach_batch(lambda df, bid: sunk.append((bid, df.count())))

    on_target = target.limit(10)
    drifted = spark.createDataFrame(
        [(90_000 + i, f"qqz{i} xxv{i} wwy{i}", "xx") for i in range(10)],
        docs.schema,
    )
    fn(on_target, 0)
    fn(drifted, 1)
    assert len(gate.drift_history) == 2 and gate.drift_breached

    snap = dict(gate.drift_history[-1])
    fn(drifted, 1)  # at-least-once redelivery of trigger 1
    assert len(gate.drift_history) == 2  # overwrote, didn't append
    assert gate.drift_history[-1] == snap
    # quiet batch after the redelivery: history advances, breach clears
    fn(on_target, 2)
    assert len(gate.drift_history) == 3 and not gate.drift_breached
    assert [b for b, _ in sunk] == [0, 1, 1, 2]
    gate.close()


def test_streaming_prep_chain_audit(spark, tables):
    """StreamingPrepChain(audit=True): one stage_history entry per
    trigger with per-gate rows in/out (filter AND rewrite shapes); a
    replayed batch_id overwrites its entry; audit=False (default) keeps
    the history empty and the output identical."""
    from jsonify2ai_spark.streaming.windowed import (
        CorpusNearDupGate,
        SpanDedupGate,
        StreamingPrepChain,
    )

    docs = tables["documents"].select("doc_id", "text").limit(40)
    run = " ".join(f"tok{i}" for i in range(30))
    corpus = spark.createDataFrame(
        [(900, f"{run} one"), (901, f"{run} two")], "doc_id long, text string"
    )
    gates = lambda: [  # noqa: E731
        CorpusNearDupGate(corpus, threshold=0.8),
        SpanDedupGate(corpus, n=10, min_df=2),
    ]
    batch = docs.union(
        spark.createDataFrame(
            [(800, f"prefix {run} suffix")], "doc_id long, text string"
        )
    )

    plain = StreamingPrepChain(gates())
    audited = StreamingPrepChain(gates(), audit=True)
    want = sorted(tuple(r) for r in plain.filter_batch(batch, batch_id=0).collect())
    got = sorted(tuple(r) for r in audited.filter_batch(batch, batch_id=0).collect())
    assert got == want  # auditing never changes the data
    assert plain.stage_history == []
    assert len(audited.stage_history) == 1
    stages = audited.stage_history[0]["stages"]
    assert [s["gate"] for s in stages] == ["CorpusNearDupGate", "SpanDedupGate"]
    assert stages[0]["rows_in"] == 41
    assert stages[0]["rows_out"] <= 41  # near-dup may drop
    assert stages[1]["rows_in"] == stages[0]["rows_out"]  # telescopes
    assert stages[1]["kind"] == "rewrite"
    assert stages[1]["rows_out"] == stages[1]["rows_in"]  # rewrite keeps rows

    snap = dict(audited.stage_history[-1])
    audited.filter_batch(batch, batch_id=0)  # replay
    assert len(audited.stage_history) == 1
    assert audited.stage_history[-1] == snap
    audited.filter_batch(batch, batch_id=1)
    assert len(audited.stage_history) == 2
    plain.close()
    audited.close()


def test_perplexity_gate_stream_equals_batch(spark, tables):
    """PerplexityGate (r12): per-batch scoring under the frozen reference
    model reproduces unigram_logprob(reference=...) row-for-row
    (repr-strict) over a partitioned replay; annotate mode is total
    (tokenless -> NULL); thin mode == the batch-side ppl filter and is
    replay-idempotent; save/load round-trips; chain composition adds
    ref_ppl."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.textstats import unigram_logprob
    from jsonify2ai_spark.streaming.windowed import PerplexityGate, StreamingPrepChain

    docs = tables["documents"].select("doc_id", "text", "lang")
    ref = docs.filter("lang = 'en'").select("doc_id", "text")
    gate = PerplexityGate(ref, id_col="doc_id")
    assert gate.kind == "rewrite"

    batch = unigram_logprob(docs, reference=ref)
    want = {r["doc_id"]: repr((r["n_tokens"], r["logprob_per_token"], r["ppl"]))
            for r in batch.collect()}
    got = {}
    for part in range(3):
        b = docs.filter(F.col("doc_id") % 3 == part)
        for r in gate.score_batch(b).collect():
            got[r["doc_id"]] = repr((r["n_tokens"], r["logprob_per_token"], r["ppl"]))
    assert got == want  # stream == batch, repr-strict

    with_empty = docs.limit(5).union(
        spark.createDataFrame([(888888, "   ", "xx")], docs.schema)
    )
    ann = {r["doc_id"]: r["ref_ppl"]
           for r in gate.filter_batch(with_empty).collect()}
    assert set(ann) == {r["doc_id"] for r in with_empty.collect()}
    assert ann[888888] is None  # tokenless -> NULL, row kept

    chained = StreamingPrepChain([gate]).filter_batch(with_empty)
    assert "ref_ppl" in chained.columns and "text" in chained.columns
    gate.close()


def test_perplexity_gate_thin_save_load_and_fallback(spark, tables, tmp_path):
    """Thin mode keeps exactly the batch filter's rows and replays
    identically; save/load round-trips model + cutoff; the shuffled-join
    fallback arm (broadcast_vocab_max=0) is output-identical and
    genuinely unbroadcast (the DSIRGate r11-verdict lesson, pinned at
    birth)."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.textstats import unigram_logprob
    from jsonify2ai_spark.streaming.windowed import PerplexityGate

    docs = tables["documents"].select("doc_id", "text", "lang").limit(200)
    ref = docs.filter("lang = 'en'").select("doc_id", "text")
    cutoff = float(
        unigram_logprob(docs, reference=ref)
        .agg(F.expr("percentile(ppl, 0.5)"))
        .collect()[0][0]
    )
    gate = PerplexityGate(ref, max_ppl=cutoff)
    assert gate.kind == "filter"
    kept = {r["doc_id"] for r in gate.filter_batch(docs).collect()}
    expect = {
        r["doc_id"]
        for r in unigram_logprob(docs, reference=ref)
        .filter(F.col("ppl") <= cutoff)
        .collect()
    }
    assert kept == expect and 0 < len(kept) < 200
    assert {r["doc_id"] for r in gate.filter_batch(docs).collect()} == kept

    path = str(tmp_path / "pplgate")
    gate.save(path)
    loaded = PerplexityGate.load(spark, path)
    assert loaded.kind == "filter"
    assert {r["doc_id"] for r in loaded.filter_batch(docs).collect()} == kept

    forced = PerplexityGate(ref, max_ppl=cutoff, broadcast_vocab_max=0)
    assert {r["doc_id"] for r in forced.filter_batch(docs).collect()} == kept

    def n_broadcast_joins(g):
        plan = g.score_batch(docs)._jdf.queryExecution().executedPlan().toString()
        return plan.count("BroadcastHashJoin")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert n_broadcast_joins(gate) >= 1   # hint forces it
        assert n_broadcast_joins(forced) == 0  # guard defers
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    for g in (gate, loaded, forced):
        g.close()


def test_perplexity_gate_unseen_rate_monitor(spark, tables, tmp_path):
    """drift_alert (r12 verdict #7 — DSIRGate's drift lesson applied to
    the PPL gate): the Laplace floor bounds every novel word's score, so
    mean perplexity drifts smoothly while the frozen reference has
    stopped describing the stream; the honest signal is the UNSEEN-WORD
    rate. Reference-drawn batches stay quiet; a novel-vocabulary batch
    breaches; a replayed batch_id OVERWRITES its own history entry; the
    threshold survives save/load (sidecar — pre-r13 artifacts without it
    still load) and a fresh-loaded gate starts a fresh window."""
    from jsonify2ai_spark.streaming.windowed import PerplexityGate

    docs = tables["documents"].select("doc_id", "text", "lang")
    ref = docs.filter("lang = 'en'").select("doc_id", "text")
    gate = PerplexityGate(ref, id_col="doc_id", drift_alert=0.3)

    gate.filter_batch(ref.limit(20), batch_id=0)
    assert len(gate.drift_history) == 1
    assert gate.drift_history[0]["unseen_rate"] == 0.0  # fit corpus
    assert not gate.drift_breached

    drifted = spark.createDataFrame(
        [(10_000 + i, f"zzq{i} wvk{i} yrt{i} pqm{i}", "xx") for i in range(20)],
        docs.schema,
    )
    gate.filter_batch(drifted, batch_id=1)
    assert gate.drift_history[-1]["unseen_rate"] > 0.9
    assert gate.drift_breached

    before = dict(gate.drift_history[-1])
    gate.filter_batch(drifted, batch_id=1)  # at-least-once replay
    assert len(gate.drift_history) == 2  # overwrote, didn't append
    assert gate.drift_history[-1]["batch"] == before["batch"]

    # a monitor-less gate records nothing (no checkpoint/agg overhead)
    quiet = PerplexityGate(ref, id_col="doc_id")
    quiet.filter_batch(drifted, batch_id=0)
    assert quiet.drift_history == []

    path = str(tmp_path / "pplmon")
    gate.save(path)
    loaded = PerplexityGate.load(spark, path)
    assert loaded._drift_alert == 0.3 and loaded.drift_history == []
    loaded.filter_batch(drifted, batch_id=0)
    assert loaded.drift_breached
    for g in (gate, quiet, loaded):
        g.close()


def test_full_curation_chain_with_quality_and_selection(spark, tables, tmp_path):
    """The complete standing-curation composition, one chain: perplexity
    quality gate (thin) -> DSIR selection (thin) -> frozen-tokenizer
    encode -> StreamShardSink increments -> loader. Survivors equal the
    batch-side composition of the same stages in the same order; ids
    conserve through the shard store."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.sampling import (
        calibrate_dsir_cutoff,
        dsir_weights,
    )
    from jsonify2ai_spark.operators.textstats import unigram_logprob
    from jsonify2ai_spark.pipelines import (
        StreamShardSink,
        corpus_to_token_shards,
        read_token_shards,
    )
    from jsonify2ai_spark.streaming.windowed import (
        DSIRGate,
        PerplexityGate,
        StreamingPrepChain,
        TokenizeGate,
    )

    docs = tables["documents"].select("doc_id", "text", "lang").limit(240)
    target = docs.filter("lang = 'en'").select("doc_id", "text")

    # batch-side ground truth, same stage order
    ppl_cut = float(
        unigram_logprob(docs, reference=target)
        .agg(F.expr("percentile(ppl, 0.7)"))
        .collect()[0][0]
    )
    q_pass = docs.join(
        unigram_logprob(docs, reference=target)
        .filter(F.col("ppl") <= ppl_cut)
        .select("doc_id"),
        "doc_id",
        "left_semi",
    ).localCheckpoint(eager=False)
    w = dsir_weights(q_pass, target, buckets=5_000).localCheckpoint(eager=False)
    dsir_cut = calibrate_dsir_cutoff(w, 0.5)

    out = str(tmp_path / "run")
    corpus_to_token_shards(
        docs.select("doc_id", "text"), out, num_merges=12, budget=64,
        n_groups=2, assemble=True, eos_id=0,
    )
    base_rows = read_token_shards(spark, out).count()

    chain = StreamingPrepChain(
        [
            PerplexityGate(target, max_ppl=ppl_cut),
            DSIRGate(q_pass, target, buckets=5_000, key_cutoff=dsir_cut),
            TokenizeGate.from_artifacts(spark, out),
        ]
    )
    sink = StreamShardSink.from_artifacts(out)
    survivors = []
    for part in range(3):
        b = docs.filter(F.col("doc_id") % 3 == part)
        cleaned = chain.filter_batch(b, batch_id=part)
        survivors.extend(r["doc_id"] for r in cleaned.select("doc_id").collect())
        sink(cleaned.select("doc_id", "token_ids"), part)
    sink.flush()

    # batch-side composition: ppl filter then DSIR key filter
    from jsonify2ai_spark.operators.sampling import _BUCKETS, sample_hash

    u = (sample_hash(F.col("doc_id"), "dsir-v1") + F.lit(0.5)) / F.lit(
        float(_BUCKETS)
    )
    key = F.round(F.col("log_weight") - F.log(-F.log(u)), 4) + F.lit(0.0)
    want = {r["doc_id"] for r in w.filter(key >= F.lit(dsir_cut)).collect()}
    assert set(survivors) == want and 0 < len(want) < 240

    # the shard store accounts for every survivor's ids exactly once
    loaded = read_token_shards(spark, out, validate=True)
    assert loaded.count() > base_rows
    chain.close()


def test_calibrate_ppl_cutoff_feeds_gate(spark, tables):
    """The CCNet gate's knob is DERIVED, not hand-set (the
    calibrate_dsir_cutoff pattern): a PerplexityGate thinned at
    calibrate_ppl_cutoff(keep_frac=2/3) keeps exactly ppl_buckets'
    head+middle bands — and at least the asked fraction (ties share the
    keep side, the floor convention)."""
    import pytest

    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.textstats import (
        calibrate_ppl_cutoff,
        ppl_buckets,
    )
    from jsonify2ai_spark.streaming.windowed import PerplexityGate

    docs = tables["documents"].select("doc_id", "text", "lang")
    ref = docs.filter("lang = 'en'").select("doc_id", "text")

    cutoff = calibrate_ppl_cutoff(docs, ref, keep_frac=2 / 3)
    gate = PerplexityGate(ref, max_ppl=cutoff)
    kept = set()
    for part in range(3):  # partitioned replay = the stream's view
        b = docs.filter(F.col("doc_id") % 3 == part)
        kept |= {r["doc_id"] for r in gate.filter_batch(b).collect()}

    bands = ppl_buckets(docs, ref, n_buckets=3)
    want = {r["doc_id"] for r in bands.filter(F.col("bucket") < 2).collect()}
    assert kept == want
    total = docs.count()
    assert len(kept) >= (2 / 3) * total * 0.999  # at least the fraction

    with pytest.raises(ValueError, match="keep_frac"):
        calibrate_ppl_cutoff(docs, ref, keep_frac=0.0)


# ---------------------------------------------------------------------------
# BloomDedupGate (broadcast-bitmap exact dedup prefilter)
# ---------------------------------------------------------------------------


def _bloom_exact_reference(corpus, batch):
    """FINGERPRINT anti-join — the answer the gate must reproduce. Keyed
    on the fingerprint itself (r13 advisor: an id-keyed reference would
    itself diverge on NULL or repeated batch ids)."""
    from jsonify2ai_spark.operators.dedup import _content_fingerprint

    cfp = corpus.select(_content_fingerprint(F.col("text")).alias("_fp")).distinct()
    return (
        batch.withColumn("_fp", _content_fingerprint(F.col("text")))
        .join(cfp, "_fp", "left_anti")
        .drop("_fp")
    )


def test_bloom_dedup_gate_exact_parity(spark):
    from jsonify2ai_spark.streaming.windowed import BloomDedupGate

    corpus = spark.createDataFrame(
        [(i, f"corpus document number {i} about topic {i % 7}") for i in range(40)],
        "doc_id long, text string",
    )
    corpus = corpus.union(
        spark.createDataFrame([(777, None)], "doc_id long, text string")
    )  # NULL text in the corpus must not break the bitmap build
    batch_rows = (
        # 5 verbatim dups + 3 whitespace-reflowed dups (normalize -> dup)
        [(100 + i, f"corpus document number {i} about topic {i % 7}") for i in range(5)]
        + [(200 + i, f"corpus  document   number {i} about topic {i % 7}\n") for i in range(3)]
        + [(300 + i, f"a genuinely novel doc {i}") for i in range(8)]
        + [(400, None)]  # NULL text: never a dup (NULL never equi-joins)
    )
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")

    gate = BloomDedupGate(corpus, m_bits=1 << 14, n_hashes=5)
    try:
        kept = sorted(r["doc_id"] for r in gate.filter_batch(batch).collect())
        ref = sorted(r["doc_id"] for r in _bloom_exact_reference(corpus, batch).collect())
        assert kept == ref == sorted([300 + i for i in range(8)] + [400])

        probe = {r["doc_id"]: r.asDict() for r in gate.probe_batch(batch).collect()}
        assert len(probe) == len(batch_rows)
        # no false negatives: every true dup bloom-hits and confirms
        for i in range(5):
            assert probe[100 + i]["bloom_hit"] and probe[100 + i]["is_dup"]
        for i in range(3):
            assert probe[200 + i]["bloom_hit"] and probe[200 + i]["is_dup"]
        # is_dup implies bloom_hit everywhere
        assert all((not r["is_dup"]) or r["bloom_hit"] for r in probe.values())
        assert 0.0 < gate.fp_rate_estimate() < 0.01
    finally:
        gate.close()


def test_bloom_dedup_gate_null_and_repeated_ids(spark):
    """r13 advisor: the filter path keys on the fingerprint, never the
    batch's id column — a NULL-id duplicate row must be dropped (the old
    id-keyed anti-join could never match it), rows SHARING an id are
    judged independently by content, and probe_batch emits exactly one
    row per batch ROW (the old id-equality re-join fanned out)."""
    from jsonify2ai_spark.streaming.windowed import BloomDedupGate

    corpus = spark.createDataFrame(
        [(i, f"known doc {i}") for i in range(10)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (None, "known doc 3"),    # NULL-id duplicate: must drop
            (None, "new thing one"),  # NULL-id novel: must survive
            (7, "known doc 7"),       # repeated id, duplicate: drops
            (7, "new thing two"),     # repeated id, novel: survives
            (8, "new thing three"),
        ],
        "doc_id long, text string",
    )
    gate = BloomDedupGate(corpus, m_bits=1 << 12, n_hashes=4)
    try:
        kept = sorted(r["text"] for r in gate.filter_batch(batch).collect())
        ref = sorted(
            r["text"] for r in _bloom_exact_reference(corpus, batch).collect()
        )
        assert kept == ref == ["new thing one", "new thing three", "new thing two"]

        probe = gate.probe_batch(batch).collect()
        assert len(probe) == 5  # one row per batch ROW, no id fanout
        assert sum(1 for r in probe if r["is_dup"]) == 2
        assert all((not r["is_dup"]) or r["bloom_hit"] for r in probe)
    finally:
        gate.close()


def test_bloom_dedup_gate_fp_saturated_still_exact(spark):
    """m_bits tiny enough that nearly every probe bloom-hits: the exact
    verification must still produce the anti-join answer (the bloom is a
    cost lever, never a semantics lever)."""
    from jsonify2ai_spark.streaming.windowed import BloomDedupGate

    corpus = spark.createDataFrame(
        [(i, f"doc {i} alpha beta") for i in range(30)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(100, "doc 3 alpha beta"), (101, "never seen before text"),
         (102, "doc 29 alpha beta"), (103, "also new material here")],
        "doc_id long, text string",
    )
    gate = BloomDedupGate(corpus, m_bits=32, n_hashes=2)
    try:
        assert gate.fp_rate_estimate() > 0.5  # saturated on purpose
        kept = sorted(r["doc_id"] for r in gate.filter_batch(batch).collect())
        assert kept == [101, 103]
    finally:
        gate.close()


def test_bloom_dedup_gate_save_load_and_foreach(spark, tmp_path):
    from jsonify2ai_spark.streaming.windowed import BloomDedupGate

    corpus = spark.createDataFrame(
        [(i, f"stable doc {i}") for i in range(25)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(900, "stable doc 7"), (901, "fresh content"), (902, "stable doc 24")],
        "doc_id long, text string",
    )
    gate = BloomDedupGate(corpus, m_bits=1 << 12, n_hashes=4)
    p = str(tmp_path / "bloomgate")
    try:
        want = sorted(r["doc_id"] for r in gate.filter_batch(batch).collect())
        gate.save(p)
    finally:
        gate.close()

    loaded = BloomDedupGate.load(spark, p)
    try:
        got = sorted(r["doc_id"] for r in loaded.filter_batch(batch).collect())
        assert got == want == [901]
        assert (loaded._bitmap == loaded._bitmap).all()  # intact buffer

        # foreachBatch contract: append receives the filtered frame + id
        seen = {}
        loaded.foreach_batch(
            lambda df, bid: seen.setdefault(bid, sorted(r["doc_id"] for r in df.collect()))
        )(batch, 17)
        assert seen == {17: [901]}
    finally:
        loaded.close()


# ---------------------------------------------------------------------------
# CommonnessGate (streaming SoftDeDup reweighting)
# ---------------------------------------------------------------------------


def test_commonness_gate_annotate_and_thin(spark, tmp_path):
    from jsonify2ai_spark.streaming.windowed import CommonnessGate

    common = "the quick brown fox jumps over the lazy dog tonight"
    corpus = spark.createDataFrame(
        [(i, common) for i in range(4)]
        + [(100 + i, f"unique corpus doc alpha{i} beta{i} gamma{i} delta{i} eps{i}")
           for i in range(8)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(900, common),                      # exact copy of the 4x doc
         (901, "completely novel material never seen here before at all"),
         (902, "")],                         # shingle-less
        "doc_id long, text string",
    )

    gate = CommonnessGate(corpus, beta=1.0)
    try:
        assert gate.kind == "rewrite" and gate.rewritten_col == "dup_weight"
        out = {r["doc_id"]: r.asDict()
               for r in gate.annotate_batch(batch).collect()}
        assert len(out) == 3
        # a copy of the 4x corpus doc reads commonness 4+1 (the +1 is
        # the doc itself — what the batch operator would assign appended)
        assert out[900]["commonness"] == 5.0
        # fully novel: every shingle df 0 -> +1 -> geometric mean 1
        assert out[901]["commonness"] == 1.0
        assert out[901]["dup_weight"] > out[900]["dup_weight"] > 0
        assert out[902]["commonness"] is None and out[902]["dup_weight"] is None

        # thin mode drops the common doc, keeps the novel one; the
        # shingle-less doc has no score and KEEPS (no score is no
        # evidence of duplication — review-found)
        floor = (out[900]["dup_weight"] + out[901]["dup_weight"]) / 2
        p = str(tmp_path / "cgate")
        gate.save(p)
    finally:
        gate.close()

    thin = CommonnessGate.load(spark, p)
    try:
        # loaded gate scores identically
        again = {r["doc_id"]: r["dup_weight"]
                 for r in thin.annotate_batch(batch).collect()}
        assert again[900] == out[900]["dup_weight"]
        assert again[901] == out[901]["dup_weight"]
    finally:
        thin.close()

    gate2 = CommonnessGate(corpus, beta=1.0, min_weight=floor)
    try:
        assert gate2.kind == "filter"
        kept = sorted(r["doc_id"] for r in gate2.filter_batch(batch).collect())
        assert kept == [901, 902]
        # replay determinism (at-least-once hygiene)
        again2 = sorted(r["doc_id"] for r in gate2.filter_batch(batch).collect())
        assert again2 == kept
    finally:
        gate2.close()

    # a shingle-less fit corpus cannot score anything: loud, not silent
    import pytest as _pytest
    empty = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
    with _pytest.raises(ValueError, match="no shingles"):
        CommonnessGate(empty)


def test_commonness_gate_annotate_mode_in_chain_appends(spark):
    """Annotate mode in a StreamingPrepChain must APPEND dup_weight and
    leave document text intact (the DSIRGate _text_col=append-dest
    convention — review-found: the old wiring replaced text with the
    weight, feeding stringified doubles to downstream gates)."""
    from jsonify2ai_spark.streaming.windowed import (
        CommonnessGate,
        DecontaminationGate,
        StreamingPrepChain,
    )

    common = "repeated corpus sentence appearing many times over again verbatim"
    corpus = spark.createDataFrame(
        [(i, common) for i in range(5)]
        + [(50 + i, f"plain doc {i} with its own words in here also") for i in range(5)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("benchmark leak sentence must never appear in the training data",)],
        "text string",
    )
    gate = CommonnessGate(corpus)  # annotate mode
    chain = StreamingPrepChain([gate, DecontaminationGate(bench, n=8)])
    batch = spark.createDataFrame(
        [(900, common),
         (901, "benchmark leak sentence must never appear in the training data"),
         (902, "a fresh document with plainly novel running text inside")],
        "doc_id long, text string",
    )
    try:
        out = {r["doc_id"]: r.asDict() for r in chain.filter_batch(batch).collect()}
        # decontamination still sees REAL text: the leak row drops
        assert sorted(out) == [900, 902]
        # text survived verbatim; the weight rode along as a new column
        assert out[900]["text"] == common
        assert out[902]["text"].startswith("a fresh document")
        assert out[900]["dup_weight"] is not None
        assert out[902]["dup_weight"] > out[900]["dup_weight"]
    finally:
        gate.close()


def test_commonness_gate_joins_prep_chain(spark):
    """CommonnessGate's filter mode slots into StreamingPrepChain like
    any other filter gate — duplicated-content rows drop in-chain, and
    downstream gates see only survivors."""
    from jsonify2ai_spark.streaming.windowed import (
        CommonnessGate,
        DecontaminationGate,
        StreamingPrepChain,
    )

    common = "repeated corpus sentence appearing many times over again verbatim"
    corpus = spark.createDataFrame(
        [(i, common) for i in range(6)]
        + [(50 + i, f"singular doc number {i} content words here now then") for i in range(6)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("benchmark leak sentence must never appear in the training data",)],
        "text string",
    )
    gate = CommonnessGate(corpus, min_weight=1.0)
    chain = StreamingPrepChain([gate, DecontaminationGate(bench, n=8)])
    batch = spark.createDataFrame(
        [
            (900, common),  # too common -> dropped by the commonness gate
            (901, "benchmark leak sentence must never appear in the training data"),
            (902, "a fresh document with plainly novel running text inside"),
        ],
        "doc_id long, text string",
    )
    try:
        kept = sorted(r["doc_id"] for r in chain.filter_batch(batch).collect())
        assert kept == [902]
    finally:
        gate.close()


def test_streaming_best_of_n_count_triggered(spark, tmp_path):
    """Candidates accumulate across triggers; the crossing trigger emits
    ONE winner (max over everything seen), later candidates for a done
    prompt are ignored, and sub-n prompts emit nothing."""
    import json

    from jsonify2ai_spark.streaming.windowed import streaming_best_of_n

    src = tmp_path / "cands"
    src.mkdir()
    schema = "prompt_id LONG, prompt STRING, response STRING, score DOUBLE"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    winners = streaming_best_of_n(stream, n=3)
    q = (
        winners.writeStream.format("memory")
        .queryName("bon_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # trigger 1: p1 gets 2 candidates (below n), p2 gets 1
        (src / "b1.json").write_text("\n".join(json.dumps(r) for r in [
            {"prompt_id": 1, "prompt": "q1", "response": "meh", "score": 0.3},
            {"prompt_id": 1, "prompt": "q1", "response": "good", "score": 0.8},
            {"prompt_id": 2, "prompt": "q2", "response": "only", "score": 0.5},
        ]))
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM bon_sink").count() == 0  # nobody crossed

        # trigger 2: p1 crosses n=3 (winner = max over ALL THREE);
        # p2 stays at 2
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in [
            {"prompt_id": 1, "prompt": "q1", "response": "best", "score": 0.9},
            {"prompt_id": 2, "prompt": "q2", "response": "later", "score": 0.1},
        ]))
        q.processAllAvailable()
        rows = {r["prompt_id"]: r.asDict()
                for r in spark.sql("SELECT * FROM bon_sink").collect()}
        assert list(rows) == [1]
        assert rows[1]["response"] == "best" and rows[1]["score"] == 0.9
        assert rows[1]["n_candidates"] == 3 and rows[1]["prompt"] == "q1"

        # trigger 3: a 4th candidate for the DONE p1 is ignored even
        # with a higher score; p2 finally crosses — in-batch overflow
        # counts everything seen (4 candidates, one emission)
        (src / "b3.json").write_text("\n".join(json.dumps(r) for r in [
            {"prompt_id": 1, "prompt": "q1", "response": "too-late", "score": 99.0},
            {"prompt_id": 2, "prompt": "q2", "response": "tie a", "score": 0.5},
            {"prompt_id": 2, "prompt": "q2", "response": "winner", "score": 0.7},
        ]))
        q.processAllAvailable()
        rows = {r["prompt_id"]: r.asDict()
                for r in spark.sql("SELECT * FROM bon_sink").collect()}
        assert sorted(rows) == [1, 2]
        assert rows[1]["response"] == "best"          # done stays done
        assert rows[2]["response"] == "winner"
        assert rows[2]["n_candidates"] == 4           # overflow counted
    finally:
        q.stop()


def test_streaming_best_of_n_tie_rule_and_guards(spark, tmp_path):
    import json

    import pytest as _pytest

    from jsonify2ai_spark.streaming.windowed import streaming_best_of_n

    with _pytest.raises(ValueError, match="n must be"):
        streaming_best_of_n(
            spark.readStream.schema(
                "prompt_id LONG, prompt STRING, response STRING, score DOUBLE"
            ).json(str(tmp_path)),
            n=0,
        )

    src = tmp_path / "cands2"
    src.mkdir()
    schema = "prompt_id LONG, prompt STRING, response STRING, score DOUBLE"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        streaming_best_of_n(stream, n=2)
        .writeStream.format("memory")
        .queryName("bon_tie_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        (src / "b1.json").write_text("\n".join(json.dumps(r) for r in [
            {"prompt_id": 7, "prompt": "q", "response": "zz tie", "score": 0.5},
            {"prompt_id": 7, "prompt": "q", "response": "aa tie", "score": 0.5},
        ]))
        q.processAllAvailable()
        (one,) = spark.sql("SELECT * FROM bon_tie_sink").collect()
        assert one["response"] == "aa tie"  # score desc, response asc
    finally:
        q.stop()


def test_streaming_best_of_n_null_score_raises_and_null_response_parity(
    spark, tmp_path
):
    """A NULL score fails the trigger loudly (the batch contract); a
    NULL response stays NULL and wins ties NULLS-FIRST — the batch
    operator's exact total order, never the string 'None'."""
    import json

    from jsonify2ai_spark.streaming.windowed import streaming_best_of_n

    schema = "prompt_id LONG, prompt STRING, response STRING, score DOUBLE"

    # NULL score: the query fails with the contract message
    src1 = tmp_path / "nullscore"
    src1.mkdir()
    stream1 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src1))
    )
    q1 = (
        streaming_best_of_n(stream1, n=1)
        .writeStream.format("memory")
        .queryName("bon_nullscore")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    try:
        (src1 / "b.json").write_text(json.dumps(
            {"prompt_id": 1, "prompt": "q", "response": "x", "score": None}
        ))
        import pytest as _pytest
        with _pytest.raises(Exception, match="NULL in score"):
            q1.processAllAvailable()
    finally:
        q1.stop()

    # NULL response: ties break NULLS FIRST, and the emitted value is
    # a real NULL (not 'None')
    src2 = tmp_path / "nullresp"
    src2.mkdir()
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src2))
    )
    q2 = (
        streaming_best_of_n(stream2, n=2)
        .writeStream.format("memory")
        .queryName("bon_nullresp")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        (src2 / "b.json").write_text("\n".join(json.dumps(r) for r in [
            {"prompt_id": 9, "prompt": "q", "response": "aa", "score": 0.5},
            {"prompt_id": 9, "prompt": "q", "response": None, "score": 0.5},
        ]))
        q2.processAllAvailable()
        (one,) = spark.sql("SELECT * FROM bon_nullresp").collect()
        assert one["response"] is None  # NULLS FIRST on the tie, real NULL
    finally:
        q2.stop()


def test_streaming_sft_assembly_e2e(spark, tmp_path):
    """r13 verdict #6: the full live-candidates -> trainer-ready SFT
    store wiring in one test — a file stream of scored candidates feeds
    streaming_best_of_n, each trigger's winners land idempotently in a
    parquet staging area (batch_id-keyed overwrite: a replayed trigger
    rewrites its own part, the MediaShardSink convention), the query
    survives a STOP + RESTART from its checkpoint without re-emitting
    or losing winners, and the staged winners assemble into an SFT
    token-shard store whose shards are ROW-IDENTICAL to a pure-batch
    build (best_of_n over all candidates -> sft_to_token_shards).
    Reference anchor: the watcher->ingest->index loop
    (scripts/dev/tools/watch_dropzone.py:249-307) generalized to
    training-data assembly."""
    import json

    from jsonify2ai_spark.operators.sft import best_of_n
    from jsonify2ai_spark.pipelines import read_token_shards, sft_to_token_shards
    from jsonify2ai_spark.streaming.windowed import streaming_best_of_n

    # every prompt gets EXACTLY n=2 candidates in total, so the streaming
    # winner (max over candidates seen at the crossing trigger) provably
    # equals the batch winner (max over all candidates)
    all_cands = [
        {"prompt_id": p, "prompt": f"question {p}",
         "response": f"answer {p} v{k} " + "tok " * (3 + (p + k) % 4),
         "score": float((p * 7 + k * 3) % 10)}
        for p in range(6)
        for k in range(2)
    ]
    batch1 = all_cands[:7]   # prompts 0-2 complete, prompt 3 half done
    batch2 = all_cands[7:]   # the rest (delivered after the restart)

    src = tmp_path / "cands"
    src.mkdir()
    staging = tmp_path / "staging"
    schema = "prompt_id LONG, prompt STRING, response STRING, score DOUBLE"

    def winners_sink(df, batch_id):
        # idempotent landing: a replayed batch_id overwrites its own part
        if df.count():
            df.write.mode("overwrite").parquet(str(staging / f"b{batch_id}"))

    def start_query():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        return (
            streaming_best_of_n(stream, n=2)
            .writeStream.foreachBatch(winners_sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    q = start_query()
    try:
        (src / "f1.json").write_text(
            "\n".join(json.dumps(r) for r in batch1)
        )
        q.processAllAvailable()
    finally:
        q.stop()

    staged_mid = spark.read.parquet(str(staging / "*"))
    assert {r["prompt_id"] for r in staged_mid.collect()} == {0, 1, 2}

    # restart from the checkpoint: pre-stop winners are NOT re-emitted,
    # the half-done prompt completes, the rest arrive fresh
    q = start_query()
    try:
        (src / "f2.json").write_text(
            "\n".join(json.dumps(r) for r in batch2)
        )
        q.processAllAvailable()
    finally:
        q.stop()

    staged = spark.read.parquet(str(staging / "*"))
    winners_stream = {
        r["prompt_id"]: (r["prompt"], r["response"], r["score"])
        for r in staged.collect()
    }
    assert len(winners_stream) == 6  # exactly-once: one winner per prompt
    assert staged.count() == 6       # ... and no duplicate rows at all

    # batch parity on the winners themselves
    cands_df = spark.createDataFrame(
        [(r["prompt_id"], r["prompt"], r["response"], r["score"])
         for r in all_cands],
        schema,
    )
    winners_batch = {
        r["prompt_id"]: (r["prompt"], r["response"], r["score"])
        for r in best_of_n(cands_df).collect()
    }
    assert winners_stream == winners_batch

    # trainer-ready assembly: winners -> (user, assistant) turns -> SFT
    # token shards; the stream-fed store is row-identical to the batch one
    def to_msgs(df):
        user = df.select(
            F.col("prompt_id").alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            F.lit("user").alias("role"),
            F.col("prompt").alias("text"),
        )
        asst = df.select(
            F.col("prompt_id").alias("conv_id"),
            F.lit(1).alias("turn_idx"),
            F.lit("assistant").alias("role"),
            F.col("response").alias("text"),
        )
        return user.unionByName(asst)

    kw = dict(num_merges=5, budget=64, n_groups=4)
    store_s = str(tmp_path / "sft_stream")
    store_b = str(tmp_path / "sft_batch")
    sft_to_token_shards(
        to_msgs(staged.select("prompt_id", "prompt", "response")),
        store_s, **kw,
    )
    sft_to_token_shards(
        to_msgs(
            best_of_n(cands_df).select("prompt_id", "prompt", "response")
        ),
        store_b, **kw,
    )

    def rows_of(path):
        df = read_token_shards(spark, path)
        return sorted(
            (tuple(r["input_ids"]), tuple(r["loss_mask"]))
            for r in df.select("input_ids", "loss_mask").collect()
        )

    got, want = rows_of(store_s), rows_of(store_b)
    assert got == want and len(got) > 0
    # the loss mask is live somewhere (assistant turns train)
    assert any(any(m) for _, m in got)

    # idempotent-redelivery face of the sink: the engine's unclean-stop
    # replay redelivers the SAME winner rows under the SAME batch_id —
    # re-landing a part's own content must change nothing at all
    import os

    before = sorted(tuple(r) for r in staged.collect())
    part = sorted(d for d in os.listdir(staging) if d.startswith("b"))[0]
    replay_rows = spark.read.parquet(str(staging / part)).collect()
    winners_sink(  # materialized first: overwrite would read-under-write
        spark.createDataFrame(replay_rows), int(part[1:])
    )
    after = spark.read.parquet(str(staging / "*"))
    assert sorted(tuple(r) for r in after.collect()) == before
