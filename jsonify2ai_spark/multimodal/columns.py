"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference treats media as files routed to captioner/STT models
(worker/app/services/images.py:13-31, worker/app/services/parse_audio.py:11-64
— S9/S10 in SURVEY §2.1), with a dev-mode deterministic stub so the pipeline
is testable without models (worker/tests/conftest.py:20-26). The Spark-native
shape is a **binary column** plus promoted typed metadata:

- media rows: (media_id, kind, content: binary, promoted meta columns) — the
  `binaryFile` source yields exactly this; Parquet stores the bytes inline.
- decode / feature-extract / resize / frame-sample are `mapInPandas` stages:
  Arrow moves the bytes to Python in batches, the decode library (PIL /
  torchaudio / pyav — NOT in this container) runs per batch, and the output
  schema is fixed and typed.

Every UDF here has two modes, mirroring the reference's AUDIO_DEV_MODE /
EMBED_DEV_MODE contract:
- ``dev_mode=True`` (default): deterministic fake derived from sha256 of the
  bytes — schema/partitioning/batch plumbing is fully real and testable.
- ``dev_mode=False``: imports the real library; raises NotImplementedError
  with a clear message when it is absent. STUB: wire the real decode here
  when the image/audio libs are available.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("source_path", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("sha256", StringType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)


def attach_media_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Promote byte-derived metadata to typed columns (pure expressions —
    no Python): size + content signature, the pushdown-able identity columns
    every downstream dedup/inventory query filters on."""
    c = F.col(content_col)
    return df.withColumn("n_bytes", F.length(c).cast("bigint")).withColumn(
        "sha256", F.lower(F.sha2(c, 256))
    )


def _fake_ints(data: bytes, n: int, lo: int, hi: int) -> list[int]:
    """Deterministic pseudo-values from the content hash (dev-mode oracle)."""
    h = hashlib.sha256(data or b"").digest()
    span = hi - lo
    return [lo + (h[i % 32] * 256 + h[(i + 1) % 32]) % span for i in range(n)]


def decode_image_meta(
    df: DataFrame, content_col: str = "content", dev_mode: bool = True
) -> DataFrame:
    """Image decode -> (width, height, mode) metadata via mapInPandas.

    Arrow batches keep the bytes off the driver; one Python worker per task
    decodes its partition's batches. Output schema is the input plus three
    typed columns.
    """
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("mode", StringType(), True),
        ]
    )

    def decode(batches: Iterator) -> Iterator:
        Image = None
        if not dev_mode:
            try:
                from PIL import Image  # one import per worker, all batches
            except ImportError as e:
                raise NotImplementedError(
                    "real image decode needs Pillow; run with dev_mode=True"
                ) from e
        import io

        for pdf in batches:
            widths, heights, modes = [], [], []
            for data in pdf[content_col]:
                if dev_mode:
                    w, h = _fake_ints(bytes(data or b""), 2, 16, 4096)
                    widths.append(w)
                    heights.append(h)
                    modes.append("RGB")
                    continue
                try:
                    with Image.open(io.BytesIO(bytes(data or b""))) as img:
                        widths.append(int(img.size[0]))
                        heights.append(int(img.size[1]))
                        modes.append(str(img.mode))
                except Exception:
                    # undecodable bytes -> NULL metadata, row kept (the
                    # inventory/skip queries filter on it downstream)
                    widths.append(None)
                    heights.append(None)
                    modes.append(None)
            pdf = pdf.copy()
            pdf["width"], pdf["height"], pdf["mode"] = widths, heights, modes
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


def extract_media_features(
    df: DataFrame,
    content_col: str = "content",
    dim: int = 64,
    dev_mode: bool = True,
    model_name: str = "openai/clip-vit-base-patch32",
) -> DataFrame:
    """binary -> fixed-dim float feature vector (the embedding column for
    similarity search / near-dup over media). Dev mode replicates the
    hash-embedding oracle (byte i%32 of sha256 / 256.0) so results join
    directly against the text dev embeddings; real mode runs the CLIP image
    tower (models.embed_image_real — import-gated per executor worker, dim
    is then model-determined: 512 for ViT-B/32). Undecodable bytes yield a
    NULL feature row in real mode, mirroring decode_image_meta."""
    from pyspark.sql.types import ArrayType, DoubleType

    out_schema = StructType(
        df.schema.fields + [StructField("features", ArrayType(DoubleType()), True)]
    )

    def extract(batches: Iterator) -> Iterator:
        if not dev_mode:
            # load the model once per worker BEFORE touching rows: a missing
            # dependency fails the task immediately with the install hint
            # instead of per-row deep in a batch
            from jsonify2ai_spark.multimodal.models import _load_clip, embed_image_real

            _load_clip(model_name)

        for pdf in batches:
            feats = []
            for data in pdf[content_col]:
                raw = bytes(data or b"")
                if not dev_mode:
                    feats.append(embed_image_real(raw, model_name=model_name))
                    continue
                h = hashlib.sha256(raw).digest()
                feats.append([h[i % 32] / 256.0 for i in range(dim)])
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(extract, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    content_col: str = "content",
    id_col: str = "media_id",
    dev_mode: bool = True,
) -> DataFrame:
    """Video frame sampling — the UDTF shape: one media row fans out to
    ceil(n_frames / every_n) frame rows. Dev mode derives a fake frame count
    from the content hash; the real path would demux with pyav.

    Output: (id, frame_idx, frame: binary) — frame bytes in dev mode are the
    sha256 of (content || frame_idx), so downstream stages are testable.
    """
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        if not dev_mode:
            # fail the task at import time, not per-row
            from jsonify2ai_spark.multimodal.models import demux_frames_real

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, data in zip(pdf[id_col], pdf[content_col]):
                raw = bytes(data or b"")
                if not dev_mode:
                    for fi, blob in demux_frames_real(raw, every_n=every_n):
                        ids.append(mid)
                        idxs.append(fi)
                        frames.append(blob)
                    continue
                (n_frames,) = _fake_ints(raw, 1, 30, 300)
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(hashlib.sha256(raw + fi.to_bytes(4, "big")).digest())
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, content_col).mapInPandas(sample, schema=out_schema)


def _resize_bytes_py(data: bytes, max_side: int) -> tuple[bytes, int, int]:
    """Real resize kernel (PIL): aspect-preserving downscale so the longer
    side == max_side (never upscale), re-encoded as JPEG. Returns
    (bytes, width, height). Driver-testable; the executor wrapper below maps
    it per Arrow batch."""
    import io as _io

    from PIL import Image

    with Image.open(_io.BytesIO(data)) as img:
        img = img.convert("RGB")
        w, h = img.size
        scale = max_side / max(w, h)
        if scale < 1.0:
            img = img.resize(
                (max(1, round(w * scale)), max(1, round(h * scale))),
                Image.Resampling.LANCZOS,
            )
        out = _io.BytesIO()
        img.save(out, format="JPEG")
        return out.getvalue(), img.size[0], img.size[1]


def resize_images(
    df: DataFrame,
    max_side: int = 512,
    content_col: str = "content",
    dev_mode: bool = True,
) -> DataFrame:
    """binary -> resized binary + (width, height): the thumbnail/normalize
    stage of a multimodal training pipeline, as mapInPandas (bytes never
    touch the driver; one PIL import per executor worker).

    Dev mode is a deterministic fake with REAL resize arithmetic: fake
    source dims from the content hash, aspect-preserving scale to
    ``max_side``, output bytes = sha256(content || max_side) — so schema,
    partitioning, and the scale math are all testable without PIL.
    """
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("resized", BinaryType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        if not dev_mode:
            try:
                from PIL import Image  # noqa: F401  (fail the task early)
            except ImportError as e:
                raise NotImplementedError(
                    "real resize needs Pillow; run with dev_mode=True"
                ) from e
        for pdf in batches:
            blobs, ws, hs = [], [], []
            for data in pdf[content_col]:
                raw = bytes(data or b"")
                if dev_mode:
                    w, h = _fake_ints(raw, 2, 16, 4096)
                    scale = max_side / max(w, h)
                    if scale < 1.0:
                        w, h = max(1, round(w * scale)), max(1, round(h * scale))
                    blobs.append(
                        hashlib.sha256(raw + max_side.to_bytes(4, "big")).digest()
                    )
                    ws.append(w)
                    hs.append(h)
                    continue
                try:
                    b, w, h = _resize_bytes_py(raw, max_side)
                    blobs.append(b)
                    ws.append(w)
                    hs.append(h)
                except Exception:
                    blobs.append(None)
                    ws.append(None)
                    hs.append(None)
            pdf = pdf.copy()
            pdf["resized"], pdf["width"], pdf["height"] = blobs, ws, hs
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
