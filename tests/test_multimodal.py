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
