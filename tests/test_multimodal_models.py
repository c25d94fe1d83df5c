"""S9/S10 real-model wiring, tested via fake modules injected into sys.modules.

The heavy deps (faster-whisper, transformers, Pillow) are absent in this
sandbox, so these tests verify everything AROUND the model call — lazy import
gate, per-process cache, segment joining, resize gate, soft-failure contract,
router skip-with-reason conversion — against faithful fakes of the reference's
interfaces (parse_audio.py:34-64, images.py:13-31).
"""

from __future__ import annotations

import sys
import types

import pytest

from jsonify2ai_spark.multimodal import models


@pytest.fixture(autouse=True)
def _clear_caches():
    models._WHISPER_CACHE.clear()
    models._BLIP_CACHE.clear()
    models._CLIP_CACHE.clear()
    yield
    models._WHISPER_CACHE.clear()
    models._BLIP_CACHE.clear()
    models._CLIP_CACHE.clear()


def test_model_unavailable_without_deps():
    with pytest.raises(models.ModelUnavailable, match="faster-whisper"):
        models.transcribe_audio_real("/tmp/a.mp3")
    with pytest.raises(models.ModelUnavailable, match="transformers"):
        models.caption_image_real("/tmp/a.png")


def test_router_converts_unavailable_to_skipfile():
    from jsonify2ai_spark.sources.router import SkipFile, extract_text_auto

    with pytest.raises(SkipFile, match="audio model not available"):
        extract_text_auto("x.mp3", b"", dev_mode=False)
    with pytest.raises(SkipFile, match="image model not available"):
        extract_text_auto("x.png", b"", dev_mode=False)
    # dev mode unchanged: deterministic stubs
    assert extract_text_auto("x.mp3", b"", dev_mode=True) == "[DEV] transcript of x.mp3"
    assert extract_text_auto("x.png", b"", dev_mode=True) == "[DEV] caption of x.png"


class _Seg:
    def __init__(self, text):
        self.text = text


def _fake_whisper(constructed, transcribed):
    mod = types.ModuleType("faster_whisper")

    class WhisperModel:
        def __init__(self, size, device=None, compute_type=None):
            constructed.append((size, device, compute_type))

        def transcribe(self, path, vad_filter=None, beam_size=None, language=None):
            transcribed.append((path, vad_filter, beam_size, language))
            return [_Seg(" hello "), _Seg(""), _Seg(None), _Seg("world")], {"lang": "en"}

    mod.WhisperModel = WhisperModel
    return mod


def test_transcribe_joins_segments_and_caches_model(monkeypatch):
    constructed, transcribed = [], []
    monkeypatch.setitem(sys.modules, "faster_whisper", _fake_whisper(constructed, transcribed))

    out = models.transcribe_audio_real("/tmp/a.mp3")
    assert out == "hello world"  # stripped, empties dropped, space-joined
    assert constructed == [("tiny", "cpu", "int8")]  # reference CPU config
    assert transcribed == [("/tmp/a.mp3", True, 1, None)]

    # second call on the same worker: cached model, no reconstruction
    models.transcribe_audio_real("/tmp/b.mp3")
    assert len(constructed) == 1 and len(transcribed) == 2


def _fake_blip(monkeypatch, gen_raises=False):
    seen = {"opened": [], "resized": [], "decoded": []}

    class _Img:
        def __init__(self, size):
            self.size = size

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def resize(self, wh, resample=None):
            seen["resized"].append(wh)
            return _Img(wh)

    class _Image:
        class Resampling:
            LANCZOS = "lanczos"

        @staticmethod
        def open(src):
            seen["opened"].append(type(src).__name__)
            return _Img((100, 400))  # below 224 on one side -> must upscale

    pil = types.ModuleType("PIL")
    pil.Image = _Image
    monkeypatch.setitem(sys.modules, "PIL", pil)

    tf = types.ModuleType("transformers")

    class _Proc:
        @staticmethod
        def from_pretrained(name):
            seen["model_name"] = name
            return _Proc()

        def __call__(self, images=None, return_tensors=None):
            return {"pixel_values": images}

        def decode(self, ids, skip_special_tokens=None):
            seen["decoded"].append(skip_special_tokens)
            return "  a tidy desk  "

    class _Model:
        @staticmethod
        def from_pretrained(name):
            return _Model()

        def generate(self, pixel_values=None, max_length=None):
            if gen_raises:
                raise RuntimeError("OOM")
            return ["ids"]

    tf.BlipProcessor = _Proc
    tf.BlipForConditionalGeneration = _Model
    monkeypatch.setitem(sys.modules, "transformers", tf)
    return seen


def test_caption_resizes_and_strips(monkeypatch):
    seen = _fake_blip(monkeypatch)
    out = models.caption_image_real(content=b"png-bytes")
    assert out == "a tidy desk"
    assert seen["opened"] == ["BytesIO"]  # bytes path: no filesystem re-read
    assert seen["resized"] == [(224, 224)]  # BLIP minimum-size gate
    assert seen["decoded"] == [True]
    assert seen["model_name"] == "Salesforce/blip-image-captioning-base"


def test_caption_soft_fallback_on_inference_failure(monkeypatch):
    _fake_blip(monkeypatch, gen_raises=True)
    assert models.caption_image_real(content=b"x") == ""  # images.py:27-31 contract


def test_resize_kernel_aspect_and_no_upscale(monkeypatch):
    """_resize_bytes_py: aspect-preserving downscale to max_side, no
    upscaling of small images, JPEG re-encode — against a fake PIL."""
    from jsonify2ai_spark.multimodal import columns as mmc

    class _Img:
        def __init__(self, size):
            self.size = size

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def resize(self, wh, resample=None):
            return _Img(wh)

        def save(self, out, format=None):
            assert format == "JPEG"
            out.write(b"jpeg:%dx%d" % self.size)

    class _Image:
        class Resampling:
            LANCZOS = "lanczos"

        @staticmethod
        def open(src):
            return _Img((1000, 400))

    pil = types.ModuleType("PIL")
    pil.Image = _Image
    monkeypatch.setitem(sys.modules, "PIL", pil)

    b, w, h = mmc._resize_bytes_py(b"data", max_side=512)
    assert (w, h) == (512, 205)  # 1000x400 scaled by 512/1000, rounded
    assert b == b"jpeg:512x205"

    # no upscale: already within budget
    _Image.open = staticmethod(lambda src: _Img((100, 50)))
    b, w, h = mmc._resize_bytes_py(b"data", max_side=512)
    assert (w, h) == (100, 50)


def test_resize_images_dev_mode_spark(spark):
    """Dev-mode resize: deterministic dims scaled with the REAL arithmetic,
    output bytes deterministic, schema typed."""
    import hashlib

    from jsonify2ai_spark.multimodal.columns import _fake_ints, resize_images

    rows = [("m1", b"\x01" * 40), ("m2", b"\x02" * 9000)]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    out = {r["media_id"]: r for r in resize_images(df, max_side=256).collect()}
    assert set(out) == {"m1", "m2"}
    for mid, raw in rows:
        w0, h0 = _fake_ints(raw, 2, 16, 4096)
        scale = 256 / max(w0, h0)
        if scale < 1.0:
            w0, h0 = max(1, round(w0 * scale)), max(1, round(h0 * scale))
        r = out[mid]
        assert (r["width"], r["height"]) == (w0, h0)
        assert max(r["width"], r["height"]) <= 256
        assert bytes(r["resized"]) == hashlib.sha256(raw + (256).to_bytes(4, "big")).digest()


def _fake_clip(monkeypatch, feats=(3.0, 4.0), feats_raises=False):
    seen = {"constructed": [], "embedded": 0}

    class _Img:
        def convert(self, mode):
            assert mode == "RGB"
            return self

    class _Image:
        @staticmethod
        def open(src):
            assert type(src).__name__ == "BytesIO"  # bytes path, no fs
            return _Img()

    pil = types.ModuleType("PIL")
    pil.Image = _Image
    monkeypatch.setitem(sys.modules, "PIL", pil)

    tf = types.ModuleType("transformers")

    class _Proc:
        @staticmethod
        def from_pretrained(name):
            seen["constructed"].append(name)
            return _Proc()

        def __call__(self, images=None, return_tensors=None):
            assert return_tensors == "pt"
            return {"pixel_values": images}

    class _Model:
        @staticmethod
        def from_pretrained(name):
            return _Model()

        def get_image_features(self, pixel_values=None):
            seen["embedded"] += 1
            if feats_raises:
                raise RuntimeError("OOM")
            return [list(feats)]

    tf.CLIPProcessor = _Proc
    tf.CLIPModel = _Model
    monkeypatch.setitem(sys.modules, "transformers", tf)
    return seen


def test_embed_image_unavailable_without_deps():
    with pytest.raises(models.ModelUnavailable, match="transformers"):
        models.embed_image_real(b"png")


def test_embed_image_normalized_and_cached(monkeypatch):
    seen = _fake_clip(monkeypatch, feats=(3.0, 4.0))
    out = models.embed_image_real(b"png-bytes")
    assert out == [0.6, 0.8]  # L2-normalized (3,4)/5
    assert seen["constructed"] == ["openai/clip-vit-base-patch32"]

    models.embed_image_real(b"other")  # cached: model built once per worker
    assert len(seen["constructed"]) == 1 and seen["embedded"] == 2


def test_embed_image_soft_fallback_on_inference_failure(monkeypatch):
    _fake_clip(monkeypatch, feats_raises=True)
    # inference failure -> None (row kept, NULL feature), same contract as
    # caption_image_real's "" — but missing deps still raise (test above)
    assert models.embed_image_real(b"x") is None


def test_demux_frames_real_contract(monkeypatch):
    """pyav kernel against a fake av module: every_n-th frame kept with its
    original index, JPEG re-encode, no video stream -> []."""

    class _Frame:
        def __init__(self, i):
            self.i = i

        def to_image(self):
            frame = self

            class _Im:
                def save(self, buf, format=None):
                    assert format == "JPEG"
                    buf.write(b"f%d" % frame.i)

            return _Im()

    class _Stream:
        type = "video"

    class _Container:
        def __init__(self, streams):
            self.streams = streams

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def decode(self, stream):
            return iter(_Frame(i) for i in range(25))

    av = types.ModuleType("av")
    av.open = lambda src: _Container([_Stream()])
    monkeypatch.setitem(sys.modules, "av", av)

    out = models.demux_frames_real(b"vid", every_n=10)
    assert out == [(0, b"f0"), (10, b"f10"), (20, b"f20")]

    av.open = lambda src: _Container([])  # audio-only container
    assert models.demux_frames_real(b"vid", every_n=10) == []


def test_demux_unavailable_without_av():
    with pytest.raises(models.ModelUnavailable, match="pyav"):
        models.demux_frames_real(b"x")
