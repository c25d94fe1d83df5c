"""Multimodal binary-column plumbing tests (dev-mode deterministic stubs).

The decode libraries are absent by design; these tests pin the Spark-side
contract — schemas, batch shapes, fan-out, determinism — which is the part
that must survive a 1000-executor run.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from jsonify2ai_spark.multimodal import (
    attach_media_meta,
    decode_image_meta,
    extract_media_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", "image", b"\x89PNG fake bytes one"),
        ("m2", "image", b"\x89PNG fake bytes two"),
        ("m3", "video", b"\x00\x00ftyp fake mp4"),
    ]
    return spark.createDataFrame(rows, "media_id string, kind string, content binary")


def test_attach_media_meta_matches_hashlib(media):
    out = attach_media_meta(media).orderBy("media_id").collect()
    assert out[0]["n_bytes"] == len(b"\x89PNG fake bytes one")
    assert out[0]["sha256"] == hashlib.sha256(b"\x89PNG fake bytes one").hexdigest()


def test_decode_image_meta_dev_mode_deterministic(media):
    a = decode_image_meta(media).orderBy("media_id").collect()
    b = decode_image_meta(media).orderBy("media_id").collect()
    assert [(r["width"], r["height"], r["mode"]) for r in a] == [
        (r["width"], r["height"], r["mode"]) for r in b
    ]
    assert all(16 <= r["width"] < 4096 and 16 <= r["height"] < 4096 for r in a)


def test_extract_media_features_dim_and_join(media):
    out = extract_media_features(media, dim=16)
    rows = out.collect()
    assert all(len(r["features"]) == 16 for r in rows)
    assert all(0.0 <= x < 1.0 for r in rows for x in r["features"])


def test_sample_frames_fanout_deterministic(media):
    frames = sample_frames(media, every_n=10)
    rows = frames.orderBy("media_id", "frame_idx").collect()
    # every media row fans out to >= 3 frames (n_frames >= 30 in dev mode)
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] >= 3 for r in per)
    # frame bytes are content-derived, not random
    raw = b"\x89PNG fake bytes one"
    expect = hashlib.sha256(raw + (0).to_bytes(4, "big")).digest()
    first = [r for r in rows if r["media_id"] == "m1" and r["frame_idx"] == 0][0]
    assert bytes(first["frame"]) == expect


def test_real_mode_raises_not_implemented(media):
    with pytest.raises(Exception):
        decode_image_meta(media, dev_mode=False).collect()


def test_multimodal_pipeline_end_to_end(spark):
    """Composability: binary media -> typed meta -> resize -> feature vector
    -> cosine top-k, all dev-mode deterministic. This is the full multimodal
    column pipeline a training ingest would run, as ONE lazy plan."""
    import hashlib

    from jsonify2ai_spark.multimodal.columns import (
        attach_media_meta,
        extract_media_features,
        resize_images,
    )
    from jsonify2ai_spark.operators.search import cosine_topk

    rows = [(f"m{i}", ("img-%03d" % i).encode() * (i + 1)) for i in range(12)]
    media = spark.createDataFrame(rows, "media_id string, content binary")

    staged = extract_media_features(
        resize_images(attach_media_meta(media), max_side=128), dim=16
    )
    # query with m3's own feature vector: it must rank itself first at 1.0
    q = [hashlib.sha256(rows[3][1]).digest()[i % 32] / 256.0 for i in range(16)]
    hits = cosine_topk(
        staged.select("media_id", F.col("features").alias("vector")),
        q, k=3, id_cols=("media_id",),
    ).collect()
    assert hits[0]["media_id"] == "m3"
    assert abs(hits[0]["score"] - 1.0) < 1e-9
    # schema survived the whole chain
    out_cols = set(staged.columns)
    assert {"media_id", "content", "n_bytes", "sha256", "resized", "width",
            "height", "features"} <= out_cols


def test_media_feature_shards_e2e(spark, tmp_path):
    """r11 verdict #5 (multimodal trainer path): media bytes -> CLIP-dev
    features -> group-partitioned shards under the token-shard manifest
    discipline -> append increment -> loader. Conservation: every media
    id appears exactly once with an intact dim-length feature vector and
    its interleaved payload column; _source_run tags parts; validate
    counts; an increment missing the frozen payload column raises."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from jsonify2ai_spark.multimodal.shards import (
        append_media_shards,
        media_to_feature_shards,
        read_media_shards,
    )

    base = spark.createDataFrame(
        [(i, bytes([i % 251]) * (40 + i), [1, 2, i]) for i in range(30)],
        "media_id long, content binary, token_ids array<bigint>",
    )
    out = str(tmp_path / "media")
    m = media_to_feature_shards(
        base, out, dim=16, n_groups=4, payload_cols=("token_ids",)
    )
    assert m["rows"] == 30 and m["dropped_undecodable"] == 0
    assert m["config"]["payload_cols"] == ["token_ids"]
    # base layout: group-partitioned parquet
    groups = {
        d for d in os.listdir(os.path.join(out, "shards"))
        if d.startswith("media_group=")
    }
    assert 1 < len(groups) <= 4

    incr = spark.createDataFrame(
        [(100 + i, bytes([7]) * (25 + i), [9, i]) for i in range(8)],
        "media_id long, content binary, token_ids array<bigint>",
    )
    a = append_media_shards(incr, out, "r1")
    assert a["rows"] == 8
    # idempotent re-ingest: same run_id overwrites, no duplication
    append_media_shards(incr, out, "r1")

    loaded = read_media_shards(spark, out, validate=True)
    rows = loaded.collect()
    assert len(rows) == 38
    ids = sorted(r["media_id"] for r in rows)
    assert ids == sorted(list(range(30)) + list(range(100, 108)))
    assert {r["_source_run"] for r in rows} == {"base", "r1"}
    for r in rows:
        assert len(r["features"]) == 16
        assert all(0.0 <= v < 1.0 for v in r["features"])
        assert r["token_ids"]  # interleaved payload survived
    # features are the dev hash-embedding contract: deterministic per bytes
    again = {
        r["media_id"]: r["features"]
        for r in read_media_shards(spark, out).collect()
    }
    assert again[0] == rows[[r["media_id"] for r in rows].index(0)]["features"]

    # frozen payload shape: an increment without token_ids raises
    with pytest.raises(ValueError, match="payload"):
        append_media_shards(
            spark.createDataFrame(
                [(200, b"xx" * 30)], "media_id long, content binary"
            ),
            out,
            "r2",
        )

    # similarity-search consumers join directly against the dev text
    # embeddings (same hash contract): spot-check the loader output is
    # a well-formed (id, vector) frame for the ANN/brute operators
    vecs = loaded.select("media_id", F.col("features").alias("embedding"))
    assert vecs.filter(F.size("embedding") != 16).count() == 0


def test_media_shards_dropped_ledger(spark, tmp_path, monkeypatch):
    """Drop accounting survives replays and the rows==0 path (r12
    advisor): per-run drop counts are keyed by run_id and OVERWRITTEN on
    an idempotent same-run_id replay (never re-summed), an
    all-undecodable batch's drops still land in the manifest despite
    writing no increment, and compaction folds folded runs' drops into
    the base figure. Dev-mode featurization never yields NULL features,
    so the kept/dropped split is injected via _featurize."""
    import json
    import os

    from jsonify2ai_spark.multimodal import shards as shards_mod
    from jsonify2ai_spark.multimodal.shards import (
        append_media_shards,
        media_to_feature_shards,
    )
    from jsonify2ai_spark.pipelines import compact_media_shards

    base = spark.createDataFrame(
        [(i, bytes([i % 251]) * 40) for i in range(10)],
        "media_id long, content binary",
    )
    out = str(tmp_path / "media")
    m = media_to_feature_shards(base, out, dim=8, n_groups=2)
    assert m["dropped_undecodable"] == 0

    schema = "media_id long, features array<double>"
    feat = [0.5] * 8

    def fake_featurize(kept_rows, dropped_rows):
        kept = spark.createDataFrame(
            [(i, feat) for i in kept_rows], schema
        )
        dropped = spark.createDataFrame(
            [(i, None) for i in dropped_rows], schema
        )
        return lambda *a, **k: (kept, dropped)

    man = lambda: json.load(  # noqa: E731
        open(os.path.join(out, "manifest.json"), encoding="utf-8")
    )

    monkeypatch.setattr(shards_mod, "_featurize", fake_featurize([100, 101, 102], [1000, 1001]))
    a = append_media_shards(base, out, "d1")
    assert a["rows"] == 3 and a["dropped_undecodable"] == 2
    assert man()["dropped_by_run"] == {"d1": 2}
    assert man()["dropped_undecodable"] == 0  # base figure untouched

    # idempotent replay: overwrite, not re-sum
    append_media_shards(base, out, "d1")
    assert man()["dropped_by_run"] == {"d1": 2}

    # all-undecodable batch: rows==0, no increment directory, but the
    # drops are ledgered ("counted, never silently")
    monkeypatch.setattr(shards_mod, "_featurize", fake_featurize([], [1, 2, 3, 4]))
    z = append_media_shards(base, out, "d2")
    assert z["rows"] == 0 and z["dropped_undecodable"] == 4
    assert not os.path.exists(os.path.join(out, "shards_incr", "d2"))
    assert man()["dropped_by_run"] == {"d1": 2, "d2": 4}
    assert "d2" not in man().get("increments", {})

    # compaction folds d1 (it has an increment) into the base figure;
    # d2 (no increment) stays keyed by run
    compact_media_shards(spark, out, defer_delete=False)
    assert man()["dropped_undecodable"] == 2
    assert man()["dropped_by_run"] == {"d2": 4}


def test_media_shards_compact_and_sink(spark, tmp_path):
    """compact_media_shards folds increments with the token-store
    protocol (loader before == after row-for-row including _source_run;
    stale_dirs grace; folded run_id re-use raises) and MediaShardSink
    is the foreachBatch face — replay-idempotent by construction, idle
    triggers write nothing."""
    import os

    import pytest

    from jsonify2ai_spark.multimodal.shards import (
        MediaShardSink,
        append_media_shards,
        media_to_feature_shards,
        read_media_shards,
    )
    from jsonify2ai_spark.pipelines import compact_media_shards

    schema = "media_id long, content binary"
    base = spark.createDataFrame(
        [(i, bytes([i % 251]) * 30) for i in range(12)], schema
    )
    out = str(tmp_path / "media")
    media_to_feature_shards(base, out, dim=8, n_groups=3)

    sink = MediaShardSink(out, run_prefix="s")
    sink(spark.createDataFrame([(100, b"a" * 20), (101, b"b" * 25)], schema), 0)
    sink(spark.createDataFrame([(102, b"c" * 22)], schema), 1)
    # replay of trigger 1: overwrite, no duplication
    sink(spark.createDataFrame([(102, b"c" * 22)], schema), 1)
    # idle trigger: no increment litter
    sink(spark.createDataFrame([], schema), 2)
    assert not os.path.isdir(os.path.join(out, "shards_incr", "s2"))

    before = sorted(
        (r["media_id"], r["_source_run"], tuple(r["features"]))
        for r in read_media_shards(spark, out, validate=True).collect()
    )
    assert {t[1] for t in before} == {"base", "s0", "s1"}

    m = compact_media_shards(spark, out)
    assert sorted(m["folded_runs"]) == ["s0", "s1"]
    after = sorted(
        (r["media_id"], r["_source_run"], tuple(r["features"]))
        for r in read_media_shards(spark, out, validate=True).collect()
    )
    assert after == before  # provenance survives the fold

    # folded run_ids are burned
    with pytest.raises(ValueError, match="folded"):
        append_media_shards(
            spark.createDataFrame([(200, b"z" * 20)], schema), out, "s0"
        )
    # fresh appends continue after compaction; next compact reclaims
    append_media_shards(
        spark.createDataFrame([(201, b"y" * 21)], schema), out, "s5"
    )
    import json

    man = json.load(open(os.path.join(out, "manifest.json")))
    assert man["stale_dirs"]  # grace ledger from the first fold
    compact_media_shards(spark, out)
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert read_media_shards(spark, out, validate=True).count() == 16


def test_media_shard_sink_live_readstream(spark, tmp_path):
    """MediaShardSink on a LIVE file-source readStream: parquet media
    files arrive, triggers featurize and append increments, the loader
    accounts for every media id exactly once."""
    import time as _time

    from jsonify2ai_spark.multimodal.shards import (
        MediaShardSink,
        media_to_feature_shards,
        read_media_shards,
    )

    schema = "media_id long, content binary"
    media_to_feature_shards(
        spark.createDataFrame([(0, b"seed" * 10)], schema),
        str(tmp_path / "store"),
        dim=8,
        n_groups=2,
    )
    src = tmp_path / "src"
    src.mkdir()
    for part in range(2):
        spark.createDataFrame(
            [(10 + part * 4 + i, bytes([part + 1]) * (15 + i)) for i in range(4)],
            schema,
        ).coalesce(1).write.mode("append").parquet(str(src))

    sink = MediaShardSink(str(tmp_path / "store"), run_prefix="live")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = _time.time() + 90
        want = {0} | set(range(10, 18))
        got = set()
        while _time.time() < deadline and got != want:
            if q.exception():
                raise AssertionError(q.exception())
            q.processAllAvailable()
            got = {
                r["media_id"]
                for r in read_media_shards(spark, str(tmp_path / "store"))
                .select("media_id")
                .collect()
            }
            _time.sleep(0.25)
        assert got == want
    finally:
        q.stop()
    df = read_media_shards(spark, str(tmp_path / "store"), validate=True)
    assert df.count() == 9  # exactly once each


def test_media_shards_feed_ann_index(spark, tmp_path):
    """The similarity-search story closes over the media store: features
    loaded from shards build a quantized IVF index and brute top-k over
    the loader output matches direct top-k over the in-memory features
    (the shard round-trip preserves vectors bit-for-bit)."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.multimodal.shards import (
        media_to_feature_shards,
        read_media_shards,
    )
    from jsonify2ai_spark.operators.search import knn_brute

    schema = "media_id long, content binary"
    media = spark.createDataFrame(
        [(i, bytes([i % 251, (i * 7) % 251]) * 20) for i in range(40)], schema
    )
    out = str(tmp_path / "m")
    media_to_feature_shards(media, out, dim=16, n_groups=4)
    loaded = read_media_shards(spark, out).select(
        "media_id", F.col("features").alias("embedding")
    )

    from jsonify2ai_spark.multimodal.columns import extract_media_features

    direct = extract_media_features(media, dim=16).select(
        "media_id", F.col("features").alias("embedding")
    )
    qvec = direct.filter("media_id = 3").collect()[0]["embedding"]
    want = [
        (r["media_id"], r["score"])
        for r in knn_brute(direct, qvec, k=5, id_col="media_id").collect()
    ]
    got = [
        (r["media_id"], r["score"])
        for r in knn_brute(loaded, qvec, k=5, id_col="media_id").collect()
    ]
    assert got == want and got[0][0] == 3  # self is its own nearest


def test_shard_store_report_on_media_store(spark, tmp_path):
    """The ops audit is layout-agnostic: a media store (manifest +
    _increment.json discipline shared with token shards) reports the
    same statuses — ok increments, post-compaction stale ledger, totals
    matching the loader."""
    from jsonify2ai_spark.multimodal.shards import (
        append_media_shards,
        media_to_feature_shards,
        read_media_shards,
    )
    from jsonify2ai_spark.pipelines import compact_media_shards, shard_store_report

    schema = "media_id long, content binary"
    out = str(tmp_path / "m")
    media_to_feature_shards(
        spark.createDataFrame([(i, bytes([i]) * 20) for i in range(6)], schema),
        out, dim=8, n_groups=2,
    )
    append_media_shards(
        spark.createDataFrame([(10, b"x" * 25)], schema), out, "a1"
    )
    rep = shard_store_report(out)
    assert {p["run_id"]: p["status"] for p in rep["increments"]} == {"a1": "ok"}
    assert rep["total_rows"] == read_media_shards(spark, out).count()

    compact_media_shards(spark, out)
    rep2 = shard_store_report(out)
    assert rep2["base"]["rows"] == 7
    assert rep2["stale_dirs"]["count"] > 0  # deferred reclaim ledger visible
    # leftover folded directory (deletion deferred) reads as garbage
    statuses = {p["status"] for p in rep2["increments"]}
    assert statuses <= {"garbage"}
    assert rep2["n_live_increments"] == 0


def test_read_media_shards_mixture(spark, tmp_path):
    """Media blend: per-store row mass tracks budget*w_s, deterministic
    keep rule, under-supply under-delivers, mismatched layouts raise."""
    import pytest

    from jsonify2ai_spark.multimodal.shards import (
        media_to_feature_shards,
        read_media_shards_mixture,
    )

    schema = "media_id long, content binary"

    def store(name, n, dim=8):
        out = str(tmp_path / name)
        media_to_feature_shards(
            spark.createDataFrame(
                [(i, bytes([i % 251, len(name)]) * 15) for i in range(n)], schema
            ),
            out, dim=dim, n_groups=2,
        )
        return out

    a, b = store("a", 200), store("b", 200)
    mix = read_media_shards_mixture(
        spark, {"a": a, "b": b}, {"a": 3.0, "b": 1.0}, budget_rows=100
    )
    by = {r["_store"]: r["n"] for r in mix.groupBy("_store").count()
          .withColumnRenamed("count", "n").collect()}
    assert 60 <= by["a"] <= 90 and 15 <= by["b"] <= 35  # ~75/25 split
    # deterministic: same call, same rows
    again = sorted(r["media_id"] for r in read_media_shards_mixture(
        spark, {"a": a, "b": b}, {"a": 3.0, "b": 1.0}, budget_rows=100
    ).collect())
    assert again == sorted(r["media_id"] for r in mix.collect())

    # under-supply: a tiny store gives everything, no silent re-weight
    c = store("c", 5)
    mix2 = read_media_shards_mixture(
        spark, {"a": a, "c": c}, {"a": 1.0, "c": 1.0}, budget_rows=400
    )
    by2 = {r["_store"]: r["n"] for r in mix2.groupBy("_store").count()
           .withColumnRenamed("count", "n").collect()}
    assert by2["c"] == 5 and by2["a"] == 200  # both capped by supply

    # layout mismatch: a store with an extra payload column can't blend
    dpath = str(tmp_path / "d")
    media_to_feature_shards(
        spark.createDataFrame(
            [(1, b"x" * 20, [1, 2])],
            "media_id long, content binary, token_ids array<bigint>",
        ),
        dpath, dim=8, n_groups=1, payload_cols=("token_ids",),
    )
    with pytest.raises(ValueError, match="mismatched"):
        read_media_shards_mixture(
            spark, {"a": a, "d": dpath}, {"a": 1.0, "d": 1.0}, budget_rows=10
        )


def test_media_dup_clusters_exact_and_blocked(spark, tmp_path):
    """Near-dup over a media store's own vectors (r13 verdict #7): exact
    byte-duplicates cluster together at ANY n_bits (identical vectors
    share every bucket — recall 1.0 by construction), the blocked face's
    pairs are a subset of the exact face's, tombstoned media leave the
    clustering, and the blocked pair join is an equi-join on the bucket
    key (never a cartesian pair explosion)."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.multimodal.shards import (
        append_media_shards,
        media_dup_clusters,
        media_to_feature_shards,
    )
    from jsonify2ai_spark.pipelines import purge_shard_store

    # 3 exact-dup groups of 3 (same bytes => same sha feature) + 21 singles
    rows = []
    for g in range(3):
        for k in range(3):
            rows.append((g * 10 + k, f"duplicate payload {g}".encode()))
    rows += [(100 + i, f"unique payload {i} x{i * 3}".encode()) for i in range(21)]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    out = str(tmp_path / "mdup")
    media_to_feature_shards(
        media.filter(F.col("media_id") < 100), out, dim=16, n_groups=4
    )
    append_media_shards(media.filter(F.col("media_id") >= 100), out, "i1")

    # threshold 1.0-epsilon: only the planted byte-dups pair
    for n_bits in (0, 2, 4):
        cc = {
            r["node"]: r["cluster_rep"]
            for r in media_dup_clusters(
                spark, out, threshold=0.999999, n_bits=n_bits
            ).collect()
        }
        assert cc == {
            g * 10 + k: g * 10 for g in range(3) for k in range(3)
        }, (n_bits, cc)

    # blocked pairs ⊆ exact pairs at a loose threshold
    exact = media_dup_clusters(spark, out, threshold=0.95, n_bits=0)
    blocked = media_dup_clusters(spark, out, threshold=0.95, n_bits=2)
    exact_nodes = {r["node"] for r in exact.collect()}
    blocked_nodes = {r["node"] for r in blocked.collect()}
    assert blocked_nodes.issubset(exact_nodes)

    # a purged media row vanishes from the clustering (loader tombstones)
    purge_shard_store(out, [10])
    cc2 = {
        r["node"]: r["cluster_rep"]
        for r in media_dup_clusters(
            spark, out, threshold=0.999999, n_bits=2
        ).collect()
    }
    assert 10 not in cc2 and cc2[11] == 11 and cc2[12] == 11

    # plan pin: the blocked pair join carries the bucket equi-key — no
    # cartesian/nested-loop pair explosion anywhere in the plan
    from jsonify2ai_spark.multimodal.shards import read_media_shards
    from jsonify2ai_spark.operators.packing import semantic_pack_groups
    from jsonify2ai_spark.operators.search import similarity_self_join
    from jsonify2ai_spark.plans.inspect import plan_string

    emb = semantic_pack_groups(
        read_media_shards(spark, out).select("media_id", "features"),
        vector_col="features", n_bits=2, dim=16,
        seed="media-dup-v1", out_col="_blk",
    )
    p = plan_string(
        similarity_self_join(
            emb, 0.95, vector_col="features", id_col="media_id",
            block_col="_blk",
        ),
        "simple",
    )
    assert "CartesianProduct" not in p, p[:1500]
    assert "BroadcastNestedLoopJoin" not in p, p[:1500]


def test_media_dedup_to_purge_composition(spark, tmp_path):
    """The maintenance loop composed end-to-end: media_dup_clusters
    DECIDES (keep the cluster representative), purge_shard_store
    EXECUTES (tombstone the other members), and the loader immediately
    serves the thinned store — every byte-dup group collapses to its
    representative, singletons untouched, and compaction makes the
    erasure physical with the ledger cleared."""
    import json
    import os

    from pyspark.sql import functions as F

    from jsonify2ai_spark.multimodal.shards import (
        media_dup_clusters,
        media_to_feature_shards,
        read_media_shards,
    )
    from jsonify2ai_spark.pipelines import compact_media_shards, purge_shard_store

    rows = [(g * 10 + k, f"payload {g}".encode()) for g in range(4) for k in range(3)]
    rows += [(200 + i, f"one-off {i} {'x' * i}".encode()) for i in range(10)]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    out = str(tmp_path / "store")
    media_to_feature_shards(media, out, dim=16, n_groups=4)

    cc = media_dup_clusters(spark, out, threshold=0.999999, n_bits=2)
    victims = [r["node"] for r in cc.filter(F.col("node") != F.col("cluster_rep")).collect()]
    assert len(victims) == 8  # 4 groups x (3 - 1 rep)

    res = purge_shard_store(out, victims)
    assert res["pending_purge_ids"] == 8
    kept = {r["media_id"] for r in read_media_shards(spark, out).collect()}
    assert kept == {g * 10 for g in range(4)} | {200 + i for i in range(10)}
    # the thinned store is duplicate-free at the same threshold
    assert media_dup_clusters(spark, out, threshold=0.999999).count() == 0

    compact_media_shards(spark, out)
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert man["tombstones"] is None and man["purged_rows_total"] == 8
    raw = spark.read.parquet(os.path.join(out, man["shards_dir"]))
    assert {r["media_id"] for r in raw.collect()} == kept


def test_media_dup_clusters_band_or_recall(spark, tmp_path):
    """Band-OR multiprobe (r15 — the r14 verdict's #5): B independent
    plane sets union their within-bucket candidates, so near-dup pairs
    a single band's planes split get B-1 more collision chances.
    Pinned: (1) banded ⊆ exact at any B (scores are band-independent);
    (2) banded recall is monotonically ≥ the single-band face on a
    corpus built to SPLIT under one band (near-dup pairs straddling
    hyperplanes); (3) byte-dups still cluster at any B; (4) bucketing
    stays deterministic (two runs agree — the q154 replayability
    contract)."""
    import random

    from pyspark.sql import functions as F

    from jsonify2ai_spark.multimodal.shards import media_dup_clusters
    from jsonify2ai_spark.multimodal.shards import (
        append_media_shards,
        media_to_feature_shards,
    )

    # byte-dup groups + many unique rows (sha features ~uniform in
    # [0,1)^16, so near-dup pairs at 0.95 exist only via byte-dups; the
    # 0.95-threshold near-dup RECALL test instead uses the loose 0.8
    # threshold where uniform vectors DO pair and bands must find them)
    rows = [(g * 10 + k, f"dup {g}".encode()) for g in range(2) for k in range(2)]
    rows += [(200 + i, f"payload {i} v{i * 7}".encode()) for i in range(60)]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    out = str(tmp_path / "mbands")
    media_to_feature_shards(
        media.filter(F.col("media_id") < 100), out, dim=16, n_groups=4
    )
    append_media_shards(media.filter(F.col("media_id") >= 100), out, "i1")

    def nodes(n_bits, n_bands, threshold=0.8):
        return {
            r["node"]
            for r in media_dup_clusters(
                spark, out, threshold=threshold, n_bits=n_bits,
                center=0.5, n_bands=n_bands,
            ).collect()
        }

    exact = nodes(0, 1)
    assert len(exact) > 10  # the loose threshold really pairs things
    one_band = nodes(4, 1)
    four_band = nodes(4, 4)
    # (1) subset of exact at any B; (2) band-OR recall ≥ single-band
    assert one_band <= exact and four_band <= exact
    assert one_band <= four_band
    assert len(four_band) > len(one_band), (
        len(exact), len(one_band), len(four_band),
    )

    # (3) byte-dups cluster at ANY banding (identical vectors collide
    # in every band of every plane set)
    strict = {
        r["node"]: r["cluster_rep"]
        for r in media_dup_clusters(
            spark, out, threshold=0.999999, n_bits=4, center=0.5, n_bands=3
        ).collect()
    }
    assert strict == {0: 0, 1: 0, 10: 10, 11: 10}

    # (4) deterministic replay
    assert nodes(4, 4) == four_band
