"""Export sink tests (K5-K7): JSONL field order, ZIP manifest, mirror."""

from __future__ import annotations

import hashlib
import json
import os
import zipfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def chunks(spark):
    rows = [
        ("c1", "d1", "a.md", "text", 0, "first chunk", {"ext": "md"}, [0.1, 0.2]),
        ("c2", "d1", "a.md", "text", 1, "second chunk", {"ext": "md"}, [0.3, 0.4]),
        ("c3", "d2", "b.pdf", "pdf", 0, "other doc", {"ext": "pdf"}, [0.5, 0.6]),
    ]
    return spark.createDataFrame(
        rows,
        "id string, document_id string, path string, kind string, idx int, "
        "text string, meta map<string,string>, vector array<double>",
    )


def _read_lines(out_dir):
    lines = []
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("part-"):
            with open(os.path.join(out_dir, name)) as f:
                lines += [l for l in f.read().splitlines() if l]
    return lines


def test_export_jsonl_stable_field_order(chunks, tmp_path):
    from jsonify2ai_spark.sinks import export_jsonl

    out = str(tmp_path / "d1")
    export_jsonl(chunks, out, document_id="d1")
    lines = _read_lines(out)
    assert len(lines) == 2
    for line in lines:
        # stable key order is part of the contract (reference export.py:101-109)
        assert list(json.loads(line).keys()) == [
            "id", "document_id", "path", "kind", "idx", "text", "meta",
        ]
    assert {json.loads(l)["id"] for l in lines} == {"c1", "c2"}


def test_zip_export_manifest(chunks, tmp_path):
    from jsonify2ai_spark.sinks import zip_export

    out_zip = str(tmp_path / "d1.zip")
    manifest = zip_export(
        chunks.drop("vector"),
        "d1",
        out_zip,
        str(tmp_path / "work"),
        request_id="req-1",
        extra_files={"orig.md": b"# source\n"},
    )
    assert manifest["counts"]["chunks"] == 2
    with zipfile.ZipFile(out_zip) as zf:
        names = set(zf.namelist())
        assert {"chunks.jsonl", "manifest.json", "README.txt", "source/orig.md"} <= names
        data = zf.read("chunks.jsonl")
        m = json.loads(zf.read("manifest.json"))
        assert m["files"]["chunks.jsonl"]["sha256"] == hashlib.sha256(data).hexdigest()
        assert m["files"]["chunks.jsonl"]["bytes"] == len(data)


def test_zip_export_rejects_traversal(chunks, tmp_path):
    from jsonify2ai_spark.sinks import zip_export

    with pytest.raises(ValueError):
        zip_export(
            chunks.drop("vector"), "d1", str(tmp_path / "x.zip"), str(tmp_path / "w2"),
            extra_files={"../evil": b""},
        )


def test_ingest_mirror_appends_vec_len(chunks, tmp_path):
    from jsonify2ai_spark.sinks import ingest_mirror

    out = str(tmp_path / "mirror")
    ingest_mirror(chunks, out)
    ingest_mirror(chunks.filter(F.col("document_id") == "d2"), out)  # append mode
    lines = [json.loads(l) for l in _read_lines(out)]
    assert len(lines) == 4
    assert all(l["vec_len"] == 2 for l in lines)


def test_upload_to_dropzone_sanitizes_and_writes(tmp_path):
    from jsonify2ai_spark.sinks.export import upload_to_dropzone

    dz = str(tmp_path / "dz")
    r = upload_to_dropzone(b"hello", "../../etc/passwd", dz)
    assert r["filename"] == "passwd"  # traversal stripped to basename
    assert os.path.dirname(r["path"]) == dz
    with open(r["path"], "rb") as f:
        assert f.read() == b"hello"
    # empty name -> generated uuid name
    r2 = upload_to_dropzone(b"x", "", dz)
    assert r2["filename"].startswith("file-") and os.path.exists(r2["path"])


def test_telemetry_rotation_and_ring(tmp_path):
    from jsonify2ai_spark.sinks.telemetry import TelemetryLog

    t = TelemetryLog(str(tmp_path / "logs"), max_log_mb=0)  # rotate every write
    for i in range(130):
        t.record_activity(n=i)
    # ring keeps the last 100, most-recent-first view
    recent = t.recent_activity(limit=5)
    assert [r["n"] for r in recent] == [129, 128, 127, 126, 125]
    assert len(t.recent_activity(limit=1000)) == 100
    # rotation depth 2: worker.jsonl (fresh) + .1 + .2, nothing deeper
    names = sorted(os.listdir(tmp_path / "logs"))
    assert names == ["worker.jsonl", "worker.jsonl.1", "worker.jsonl.2"]
    t.increment("ingest_total")
    t.increment("ingest_total")
    t.set_error("boom")
    assert t.stats() == {"ingest_total": 2, "last_error": "boom"}


def test_compact_buckets_merges_small_files(spark, tmp_path):
    """Compaction: multi-file buckets collapse to one file with identical
    rows; already-compact buckets are not rewritten (byte-identical)."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from jsonify2ai_spark.sinks.tables import compact_buckets

    table = str(tmp_path / "t")
    # bucket=0: three separate writes -> three files. bucket=1: one write.
    for i in range(3):
        spark.createDataFrame([(i, "a" * 50)], "k int, v string").coalesce(1).write.mode(
            "append"
        ).parquet(table + "/bucket=0")
    spark.createDataFrame([(99, "z")], "k int, v string").coalesce(1).write.mode(
        "append"
    ).parquet(table + "/bucket=1")

    before = spark.read.parquet(table)
    rows_before = sorted((r["bucket"], r["k"], r["v"]) for r in before.collect())
    b1_files = {
        f: os.path.getmtime(os.path.join(table, "bucket=1", f))
        for f in os.listdir(os.path.join(table, "bucket=1"))
        if f.endswith(".parquet")
    }

    report = compact_buckets(spark, table, target_file_mb=128)
    assert report["compacted"] == ["bucket=0"]
    assert report["skipped"] == 1
    assert report["files_before"] >= 4 and report["files_after"] == 2

    after = spark.read.parquet(table)
    rows_after = sorted((r["bucket"], r["k"], r["v"]) for r in after.collect())
    assert rows_after == rows_before
    # untouched bucket: same files, same mtimes
    b1_after = {
        f: os.path.getmtime(os.path.join(table, "bucket=1", f))
        for f in os.listdir(os.path.join(table, "bucket=1"))
        if f.endswith(".parquet")
    }
    assert b1_after == b1_files
    n_b0 = sum(
        1 for f in os.listdir(os.path.join(table, "bucket=0")) if f.endswith(".parquet")
    )
    assert n_b0 == 1


def test_chunks_table_format_round_trips(spark, chunks, tmp_path):
    """Source/sink breadth: the chunks table round-trips through ORC and
    JSON losslessly (vector arrays included), so the engine is not
    parquet-bound for interchange."""
    base = chunks.select("id", "document_id", "idx", "text", "vector")
    rows = sorted((r["id"], r["idx"], tuple(r["vector"] or ())) for r in base.collect())

    for fmt in ("orc", "json"):
        path = str(tmp_path / f"t_{fmt}")
        base.write.format(fmt).mode("overwrite").save(path)
        reader = spark.read.format(fmt)
        if fmt == "json":  # json needs the schema to keep array<float> typed
            reader = reader.schema(base.schema)
        back = reader.load(path)
        assert back.schema == base.schema, fmt
        got = sorted((r["id"], r["idx"], tuple(r["vector"] or ())) for r in back.collect())
        assert got == rows, f"{fmt} round-trip mismatch"


def test_swap_dir_and_recover_table_crash_windows(tmp_path):
    """ADVICE fix: the bucket swap must never have a window where the old
    data is deleted and the new not yet in place. swap_dir renames aside,
    moves in, then deletes; recover_table finishes or rolls back whichever
    state a crash left behind."""
    import os

    from jsonify2ai_spark.sinks.tables import recover_table, swap_dir

    def mkdir_with(path, name):
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, name), "w") as f:
            f.write(name)

    table = tmp_path / "t"

    # normal swap: new content in, old gone, no leftovers
    old_b = table / "bucket=0"
    new_b = table / "incoming"
    mkdir_with(str(old_b), "old.parquet")
    mkdir_with(str(new_b), "new.parquet")
    swap_dir(str(new_b), str(old_b))
    assert os.listdir(old_b) == ["new.parquet"]
    assert not os.path.exists(str(old_b) + "__old")

    # crash AFTER rename-aside, BEFORE move-in: bucket=1 missing, __old holds
    # the only copy -> recovery must restore it
    mkdir_with(str(table / "bucket=1__old"), "survivor.parquet")
    # crash AFTER move-in, BEFORE delete: both present -> drop the __old
    mkdir_with(str(table / "bucket=2"), "current.parquet")
    mkdir_with(str(table / "bucket=2__old"), "stale.parquet")
    # partial writes are always dropped
    mkdir_with(str(table / "bucket=3__compacting"), "partial.parquet")
    mkdir_with(str(tmp_path / "t__staging"), "partial.parquet")

    actions = recover_table(str(table))
    assert os.listdir(table / "bucket=1") == ["survivor.parquet"]
    assert os.listdir(table / "bucket=2") == ["current.parquet"]
    assert not os.path.exists(table / "bucket=2__old")
    assert not os.path.exists(table / "bucket=3__compacting")
    assert not os.path.exists(tmp_path / "t__staging")
    assert len(actions) == 4


def test_recover_table_top_level_swap_and_compact_ignores_leftovers(spark, tmp_path):
    """Review findings: (a) a crash between rename-aside and move-in of a
    WHOLE-table swap (CLI ingest/delete) leaves only `t__old` — recovery
    must restore it; (b) compact_buckets must never treat `bucket=N__old` /
    `__compacting` leftovers as data buckets."""
    import os

    from jsonify2ai_spark.sinks.tables import compact_buckets, recover_table

    # (a) table-level: t missing, t__old holds the only copy
    t = tmp_path / "t"
    os.makedirs(str(t) + "__old")
    with open(str(t) + "__old/data.parquet", "w") as f:
        f.write("x")
    actions = recover_table(str(t))
    assert os.listdir(t) == ["data.parquet"]
    assert not os.path.exists(str(t) + "__old")
    assert any("restored" in a for a in actions)

    # (b) compaction skips (and recovery first cleans) swap leftovers
    table = tmp_path / "c"
    spark.createDataFrame([(1, "a")], "k int, v string").coalesce(1).write.parquet(
        str(table / "bucket=0")
    )
    os.makedirs(table / "bucket=1__old")  # bucket=1 exists too -> stale
    os.makedirs(table / "bucket=1")
    with open(table / "bucket=1__old" / "stale.txt", "w") as f:
        f.write("stale")
    report = compact_buckets(spark, str(table))
    assert "bucket=1__old" not in report["compacted"]
    assert not os.path.exists(table / "bucket=1__old")  # recovery removed it
    rows = spark.read.parquet(str(table / "bucket=0")).collect()
    assert [(r["k"], r["v"]) for r in rows] == [(1, "a")]


def test_recover_table_restore_only_mode(tmp_path):
    """Review finding: READ-path recovery must restore missing dirs but
    never delete a (possibly live) writer's staging/leftovers."""
    import os

    from jsonify2ai_spark.sinks.tables import recover_table

    table = tmp_path / "t"
    os.makedirs(table / "bucket=0__old")       # base missing -> restore
    with open(table / "bucket=0__old" / "d.parquet", "w") as f:
        f.write("x")
    os.makedirs(table / "bucket=1")            # stale __old next to live base
    os.makedirs(table / "bucket=1__old")
    os.makedirs(table / "bucket=2__compacting")
    os.makedirs(str(table) + "__staging")      # in-flight writer staging

    recover_table(str(table), destructive=False)
    assert os.listdir(table / "bucket=0") == ["d.parquet"]  # restored
    assert os.path.exists(table / "bucket=1__old")          # NOT deleted
    assert os.path.exists(table / "bucket=2__compacting")   # NOT deleted
    assert os.path.exists(str(table) + "__staging")         # NOT deleted

    recover_table(str(table))  # writer-startup mode cleans the rest
    assert not os.path.exists(table / "bucket=1__old")
    assert not os.path.exists(table / "bucket=2__compacting")
    assert not os.path.exists(str(table) + "__staging")


def test_snapshot_restore_round_trip_and_corruption_guard(spark, tmp_path):
    """Backup-tool parity: snapshot embeds an integrity manifest, restore
    sha-verifies every file BEFORE swapping, a corrupted archive never
    replaces a good table, and the round trip is row-identical."""
    import tarfile

    import pytest as _pytest

    from jsonify2ai_spark.sinks.tables import restore_snapshot, snapshot_table

    table = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], "k int, v string"
    ).write.parquet(table)
    rows_before = sorted((r["k"], r["v"]) for r in spark.read.parquet(table).collect())

    snap = snapshot_table(spark, table, str(tmp_path / "snaps"), label="s1")
    assert snap["rows"] == 50 and snap["n_files"] >= 1

    # mutate, then restore -> original rows back
    spark.createDataFrame([(999, "z")], "k int, v string").write.mode(
        "overwrite"
    ).parquet(table)
    out = restore_snapshot(snap["snapshot"], table)
    assert out["rows"] == 50
    rows_after = sorted((r["k"], r["v"]) for r in spark.read.parquet(table).collect())
    assert rows_after == rows_before

    # corrupt one data byte inside the archive -> restore must refuse and
    # leave the (restored) table untouched
    bad = str(tmp_path / "snaps" / "bad.tar.gz")
    with tarfile.open(snap["snapshot"], "r:gz") as src, tarfile.open(bad, "w:gz") as dst:
        for m in src.getmembers():
            data = src.extractfile(m).read() if m.isfile() else None
            if m.isfile() and m.name.endswith(".parquet"):
                data = data[:-1] + bytes([data[-1] ^ 0xFF])
            if data is not None:
                import io as _io
                dst.addfile(m, _io.BytesIO(data))
            else:
                dst.addfile(m)
    with _pytest.raises(ValueError, match="sha mismatch"):
        restore_snapshot(bad, table)
    still = sorted((r["k"], r["v"]) for r in spark.read.parquet(table).collect())
    assert still == rows_before


def test_write_training_shards_shuffle_seed(spark, tmp_path):
    """r9: shuffle_seed permutes whole-BIN order inside each shard —
    deterministic (same seed => byte-identical layout on any input
    partitioning), bins stay contiguous in-file (the bin-streaming
    contract), the multiset of rows is unchanged, and the seeded order
    actually differs from the default bin-ascending layout."""
    import os

    import pyarrow.parquet as pq

    from jsonify2ai_spark.sinks import write_training_shards

    rows = [(d, d % 2, d // 2) for d in range(40)]  # 2 groups, 10 bins each
    packed = spark.createDataFrame(
        rows, "doc_id long, pack_group long, bin_idx long"
    )

    def layout(path):
        out = {}
        for gdir in sorted(os.listdir(path)):
            if not gdir.startswith("pack_group="):
                continue
            seq = []
            full = os.path.join(path, gdir)
            for part in sorted(os.listdir(full)):
                if part.endswith(".parquet"):
                    t = pq.read_table(os.path.join(full, part)).to_pydict()
                    seq += list(zip(t["bin_idx"], t["doc_id"]))
            out[gdir] = seq
        return out

    plain = str(tmp_path / "plain")
    write_training_shards(packed, plain)
    s1 = str(tmp_path / "s1")
    write_training_shards(packed, s1, shuffle_seed=7)
    s2 = str(tmp_path / "s2")
    write_training_shards(packed.repartition(13), s2, shuffle_seed=7)
    s3 = str(tmp_path / "s3")
    write_training_shards(packed, s3, shuffle_seed=8)

    lp, l1, l2, l3 = layout(plain), layout(s1), layout(s2), layout(s3)
    assert l1 == l2  # same seed, any partitioning -> identical layout
    assert l1 != lp  # the permutation is real
    assert l1 != l3  # and seed-dependent
    for g, seq in l1.items():
        assert sorted(seq) == sorted(lp[g])  # same rows per shard
        # bins contiguous: each bin_idx appears as ONE run
        bins = [b for b, _ in seq]
        runs = [b for i, b in enumerate(bins) if i == 0 or bins[i - 1] != b]
        assert len(runs) == len(set(bins))
        # within a bin, id order is preserved
        for b in set(bins):
            ids = [d for bb, d in seq if bb == b]
            assert ids == sorted(ids)


def test_write_token_shards_boundaries_and_shuffle(spark, tmp_path):
    """r9: assemble=True threads boundaries (doc_ids/doc_lens land in the
    shard files) and shuffle_seed (deterministic bin permutation) through
    the writer."""
    from jsonify2ai_spark.operators.bpe import bpe_encode_fast, train_bpe
    from jsonify2ai_spark.operators.textstats import build_vocab
    from jsonify2ai_spark.sinks import write_token_shards

    docs = spark.createDataFrame(
        [(i, f"doc number {i} words alpha beta gamma") for i in range(12)],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, num_merges=8)
    enc = bpe_encode_fast(docs, merges, out_col="_t")
    vocab = build_vocab(enc, token_array_col="_t")

    out = str(tmp_path / "b")
    write_token_shards(
        docs, merges, vocab, out, budget=24, n_groups=2,
        assemble=True, eos_id=0, boundaries=True, shuffle_seed=5,
    )
    rows = spark.read.parquet(out).collect()
    assert rows and {"doc_ids", "doc_lens"} <= set(rows[0].asDict())
    got_docs = set()
    for r in rows:
        assert len(r["doc_ids"]) == len(r["doc_lens"]) == r["n_docs"]
        assert sum(r["doc_lens"]) == r["n_ids"]
        got_docs.update(r["doc_ids"])
    assert got_docs == set(range(12))  # every doc lands exactly once

    # same seed reproduces byte-identical layout
    out2 = str(tmp_path / "b2")
    write_token_shards(
        docs.repartition(7), merges, vocab, out2, budget=24, n_groups=2,
        assemble=True, eos_id=0, boundaries=True, shuffle_seed=5,
    )
    a = sorted(map(tuple, rows))
    b = sorted(map(tuple, spark.read.parquet(out2).collect()))
    assert a == b
