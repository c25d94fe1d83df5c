#!/usr/bin/env python
"""One-shot REAL-MODEL smoke for the multimodal path (VERDICT r5 #8).

The repo's CI runs the multimodal kernels in dev mode (deterministic fakes;
the heavy model deps don't ship in the build sandbox) and tests the real
code paths via injected fake modules. This script is the missing last mile:
on a machine WITH the extras installed, it runs real files end-to-end
through the same Spark plumbing — router ingest (S9 STT / S10 caption),
binary-column decode, resize, CLIP features — and prints what each stage
produced, so a user can validate the real path in minutes.

Install (any subset; each stage skips cleanly when its dep is absent):

    pip install Pillow                     # image decode + resize
    pip install faster-whisper             # S9 audio STT (ffmpeg on PATH)
    pip install transformers torch         # S10 BLIP caption + CLIP features
    pip install av                         # video frame demux

Usage:
    python scripts/real_smoke.py file1.jpg file2.mp3 file3.mp4 ...
    python scripts/real_smoke.py            # no files: synthesizes a PNG
                                            # (needs only Pillow)

Exit code 0 = every runnable stage behaved; stages without their dep are
reported as SKIP (that is the router's skip-with-reason contract, not a
failure).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEPS = {
    "PIL": "Pillow (image decode/resize)",
    "faster_whisper": "faster-whisper (S9 audio STT)",
    "transformers": "transformers (S10 BLIP caption, CLIP features)",
    "torch": "torch (model runtime for BLIP/CLIP)",
    "av": "pyav (video frame demux)",
}


def dep_report() -> dict[str, bool]:
    have = {}
    for mod, desc in DEPS.items():
        ok = importlib.util.find_spec(mod) is not None
        have[mod] = ok
        print(f"  {'ok  ' if ok else 'MISS'} {mod:<16} {desc}")
    return have


def synth_png(path: str) -> None:
    from PIL import Image

    img = Image.new("RGB", (640, 480))
    img.putdata(
        [((x * 7) % 256, (y * 5) % 256, (x * y) % 256)
         for y in range(480) for x in range(640)]
    )
    img.save(path, format="PNG")


def main() -> int:
    print("== dependency report ==")
    have = dep_report()

    files = sys.argv[1:]
    tmp = None
    if not files:
        if not have["PIL"]:
            print("no files given and Pillow absent — nothing to smoke; "
                  "pass media files or `pip install Pillow`")
            return 1
        tmp = tempfile.mkdtemp(prefix="real_smoke_")
        p = os.path.join(tmp, "synth.png")
        synth_png(p)
        files = [p]
        print(f"\nno files given — synthesized {p}")

    from jsonify2ai_spark.session import get_spark

    spark = get_spark("real-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    # --- stage 1: router ingest in REAL mode (S6-S10, S18) --------------
    # dev_mode=False sends audio to faster-whisper and images to BLIP; a
    # missing model surfaces as the skip-with-reason row, exactly as a
    # cluster run would record it.
    print("\n== router ingest (dev_mode=False) ==")
    from jsonify2ai_spark.sources.ingest import parse_files, read_binary_files

    for f in files:
        d = os.path.dirname(os.path.abspath(f))
        binf = read_binary_files(spark, d).filter(
            f"path like '%{os.path.basename(f)}'"
        )
        for row in parse_files(binf, dev_mode=False).collect():
            blob = {k: (v[:80] + "..." if isinstance(v, str) and len(v) > 80 else v)
                    for k, v in row.asDict().items() if k != "content"}
            print(f"  {os.path.basename(f)}: {json.dumps(blob, default=str)}")

    # --- stage 2: image binary-column pipeline (real decode) ------------
    imgs = [f for f in files if f.rsplit(".", 1)[-1].lower()
            in ("png", "jpg", "jpeg", "gif", "webp", "bmp")]
    if imgs and have["PIL"]:
        print("\n== image columns: decode -> resize (real Pillow) ==")
        from jsonify2ai_spark.multimodal.columns import (
            decode_image_meta,
            extract_media_features,
            resize_images,
        )

        rows = [(f, open(f, "rb").read()) for f in imgs]
        bdf = spark.createDataFrame(rows, "path string, content binary")
        meta = decode_image_meta(bdf, dev_mode=False).select("path", "width", "height", "mode")
        for r in meta.collect():
            print(f"  decode {os.path.basename(r['path'])}: "
                  f"{r['width']}x{r['height']} {r['mode']}")
        rs = resize_images(bdf, max_side=128, dev_mode=False).select("path", "width", "height")
        for r in rs.collect():
            print(f"  resize->128 {os.path.basename(r['path'])}: {r['width']}x{r['height']}")
        if have["transformers"] and have["torch"]:
            print("  CLIP features (first 4 dims):")
            fdf = extract_media_features(bdf, dev_mode=False)
            for r in fdf.select("path", "features").collect():
                head = [round(x, 4) for x in (r["features"] or [])[:4]]
                print(f"    {os.path.basename(r['path'])}: {head}... "
                      f"dim={len(r['features'] or [])}")
        else:
            print("  SKIP CLIP features (transformers/torch absent)")
    elif imgs:
        print("\nSKIP image column stage (Pillow absent)")

    # --- stage 3: video frame sampling (real pyav) ----------------------
    vids = [f for f in files if f.rsplit(".", 1)[-1].lower() in ("mp4", "mkv", "mov", "webm")]
    if vids and have["av"]:
        print("\n== video frame demux (real pyav) ==")
        from jsonify2ai_spark.multimodal.columns import sample_frames

        rows = [(f, open(f, "rb").read()) for f in vids]
        bdf = spark.createDataFrame(rows, "media_id string, content binary")
        for r in sample_frames(bdf, every_n=30, dev_mode=False).collect():
            print(f"  {os.path.basename(r['media_id'])}: frame_idx={r['frame_idx']}")
    elif vids:
        print("\nSKIP video stage (pyav absent)")

    print("\nreal smoke complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
