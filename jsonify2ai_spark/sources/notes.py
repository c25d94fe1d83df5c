"""note2json: structured note extraction (SURVEY §2.1 S15/S16).

Reference semantics (jsonify2ai/modules/note2json/note_to_json/parser.py):
- S15 markdown parse (:157-307): `# h1` -> title + headers, `**Date:**`,
  `**Tags:** #x`, `**Tone:**`, `**Summary:**` block (lines until the next
  `**`-led marker), `**Core Reflections:**` bullet list; sanitization strips
  NUL chars and truncates raw text at 10 000 chars; dates parse from several
  formats; missing fields are auto-fixed with defaults (schema validation).
- S16 JSON normalizer (:57-110): pass-through if already schema-shaped, else
  wrap primitives/arrays/dicts; tags normalize (strip `#`, bool -> str).

Spark shape: one mapInPandas over (id, text) — the parse is per-line
sequential (block accumulation for summary/reflections), the same grain as
the other format parsers in sources/. Determinism deviation from the
reference: missing timestamps default to the fixed epoch instead of now()
(documented; reproducible runs beat wall-clock provenance in a batch engine).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from datetime import datetime
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

NOTE_SCHEMA = StructType(
    [
        StructField("title", StringType(), True),
        StructField("date", StringType(), True),  # ISO yyyy-mm-dd
        StructField("tone", StringType(), True),
        StructField("summary", StringType(), True),
        StructField("tags", ArrayType(StringType()), True),
        StructField("headers", ArrayType(StringType()), True),
        StructField("reflections", ArrayType(StringType()), True),
        StructField("plain_text", StringType(), True),
        StructField("raw_text", StringType(), True),
    ]
)

MAX_RAW_CHARS = 10_000
_DATE_FORMATS = ("%Y-%m-%d", "%d/%m/%Y", "%m/%d/%Y", "%B %d, %Y", "%d %B %Y")
_MARKER = re.compile(r"^\*\*([A-Za-z ]+):\*\*\s*(.*)$")
_HEADER = re.compile(r"^(#{1,6})\s+(.*)$")
_BULLET = re.compile(r"^\s*[-*]\s+(.*)$")


def _parse_date(raw: str) -> str | None:
    raw = raw.strip()
    for fmt in _DATE_FORMATS:
        try:
            return datetime.strptime(raw, fmt).date().isoformat()
        except ValueError:
            continue
    return None


def parse_note_text(text: str, filename_hint: str = "") -> dict[str, Any]:
    """S15: pure function, one note in -> one schema-shaped dict out."""
    raw = (text or "").replace("\x00", "")[:MAX_RAW_CHARS]
    lines = raw.replace("\r\n", "\n").replace("\r", "\n").split("\n")

    title: str | None = None
    date: str | None = None
    tone: str | None = None
    tags: list[str] = []
    headers: list[str] = []
    summary_lines: list[str] = []
    reflections: list[str] = []
    plain_lines: list[str] = []
    block: str | None = None  # 'summary' | 'reflections' | None

    for line in lines:
        h = _HEADER.match(line)
        if h:
            block = None
            headers.append(h.group(2).strip())
            # `or None` keeps the contract total: an H1 whose text is only
            # (Unicode) whitespace must not claim the title slot, or the
            # never-empty-title auto-fix below would be bypassed.
            if title is None and len(h.group(1)) == 1:
                title = h.group(2).strip() or None
            plain_lines.append(h.group(2).strip())
            continue
        m = _MARKER.match(line)
        if m:
            key, val = m.group(1).strip().lower(), m.group(2).strip()
            block = None
            if key == "date":
                date = _parse_date(val) or date
            elif key == "tags":
                tags = [t.lstrip("#") for t in re.findall(r"#?[\w-]+", val)]
            elif key == "tone":
                tone = val or None
            elif key == "summary":
                block = "summary"
                if val:
                    summary_lines.append(val)
            elif key == "core reflections":
                block = "reflections"
            continue
        if block == "summary":
            if line.strip():
                summary_lines.append(line.strip())
            else:
                block = None
            continue
        if block == "reflections":
            b = _BULLET.match(line)
            if b:
                reflections.append(b.group(1).strip())
                continue
            if line.strip():
                block = None
        if line.strip():
            plain_lines.append(re.sub(r"\*\*([^*]+)\*\*", r"\1", line).strip())

    # auto-fix pass (the reference's jsonschema-validate + fix, :113-154)
    if not title:
        non_empty = next((ln.strip() for ln in lines if ln.strip()), None)
        title = non_empty or filename_hint or "untitled"
    return {
        "title": title[:200],
        "date": date,
        "tone": tone,
        "summary": " ".join(summary_lines) or None,
        "tags": tags,
        "headers": headers,
        "reflections": reflections,
        "plain_text": "\n".join(plain_lines),
        "raw_text": raw,
    }


def normalize_note_json(obj: Any, raw_text: str = "", filename_hint: str = "") -> dict[str, Any]:
    """S16: already-JSON input -> schema shape (pass-through / wrap)."""
    base = parse_note_text("", filename_hint)
    base["raw_text"] = raw_text
    if isinstance(obj, dict):
        for k in base:
            if k in obj and obj[k] is not None:
                base[k] = obj[k]
        if "tags" in obj and obj["tags"] is not None:
            base["tags"] = [
                str(t).lstrip("#") if not isinstance(t, bool) else str(t).lower()
                for t in (obj["tags"] if isinstance(obj["tags"], list) else [obj["tags"]])
            ]
    elif isinstance(obj, list):
        base["plain_text"] = "\n".join(str(x) for x in obj)
    elif obj is not None:
        base["plain_text"] = str(obj)
    if not base.get("title"):
        base["title"] = filename_hint or "untitled"
    return base


def decode_text(data: bytes) -> str:
    """Encoding-tolerant bytes -> str (note2json parity: reference
    utils/encoding.py decode_bytes + parser.py read_input:357-394 — UTF-8,
    UTF-8 BOM, UTF-16 LE/BE with or without BOM, cp1252/latin-1 legacy).

    Structurally different from the reference's try-every-encoding ladder:
    an explicit BOM decides immediately; BOM-less UTF-16 is detected from
    the NUL-byte signature of ASCII-ish text (NULs concentrated in even vs
    odd byte positions reveal the endianness) instead of decode-and-score;
    the legacy fallbacks reject any result with embedded NULs (binary, or
    a mis-detected multibyte encoding). The returned text never carries a
    BOM. Raises ValueError for bytes that are not text in any supported
    encoding — callers map that to their skip-with-reason contract.
    """
    import codecs

    if data.startswith(codecs.BOM_UTF8):
        return data.decode("utf-8-sig")
    if data.startswith(codecs.BOM_UTF16_LE) or data.startswith(codecs.BOM_UTF16_BE):
        return data.decode("utf-16")  # honors and strips the BOM
    sample = data[:4096]
    if sample and sample.count(0) / len(sample) > 0.2:
        # BOM-less UTF-16: decode BOTH endiannesses and score — control-char
        # ratio first (the wrong endianness of Latin-range text yields
        # control codes), ASCII-printable share as the tiebreak (both
        # decodes can be "clean" — 'a' in BE is a CJK char in LE — and
        # preferring the ASCII reading is the standard resolution; BOM-less
        # detection of fully non-ASCII text is inherently ambiguous).
        def _scores(text: str) -> tuple[float, float]:
            n = max(len(text), 1)
            bad = sum(
                1 for ch in text if ord(ch) < 32 and ch not in "\t\n\r"
            ) + text.count("\x00")
            ascii_printable = sum(1 for ch in text if 32 <= ord(ch) < 127)
            return (bad / n, -ascii_printable / n)

        best: tuple[tuple[float, float], str] | None = None
        for enc in ("utf-16-le", "utf-16-be"):
            try:
                cand = data.decode(enc)
            except UnicodeDecodeError:
                continue
            sc = _scores(cand)
            if best is None or sc < best[0]:
                best = (sc, cand)
        if best is not None and best[0][0] <= 0.1:
            return best[1]
    for enc in ("utf-8", "cp1252", "latin-1"):
        try:
            text = data.decode(enc)
        except UnicodeDecodeError:
            continue
        if text and text.count("\x00") / len(text) > 0.1:
            continue  # NUL-ridden: binary, or wrong single-byte guess
        return text
    raise ValueError("input is not valid UTF/legacy text (try saving as UTF-8)")


def read_input(source, input_format: str = "auto", filename_hint: str = "") -> dict[str, Any]:
    """The note2json entry point over any source shape (reference
    parser.py read_input:357-394): file-like (stdin), bytes, an existing
    path, or already-text. Bytes decode through :func:`decode_text`;
    ``auto`` format sniffs JSON by the first non-space character; json
    parse errors raise ValueError with the reference's format hint.
    """
    import json
    import os

    if hasattr(source, "read"):
        raw = source.read()
        text = raw if isinstance(raw, str) else decode_text(bytes(raw))
    elif isinstance(source, (bytes, bytearray)):
        text = decode_text(bytes(source))
    elif isinstance(source, str) and os.path.exists(source):
        with open(source, "rb") as f:
            text = decode_text(f.read())
        filename_hint = filename_hint or os.path.splitext(os.path.basename(source))[0]
    else:
        text = str(source)

    effective = input_format
    if effective == "auto":
        s = text.lstrip()
        effective = "json" if s.startswith(("{", "[")) else "txt"
    if effective in ("md", "txt"):
        return parse_note_text(text, filename_hint=filename_hint)
    if effective == "json":
        try:
            obj = json.loads(text)
        except json.JSONDecodeError as e:
            raise ValueError(
                "Invalid JSON input. If this is Markdown or text, use "
                "input_format='md'|'txt'."
            ) from e
        return normalize_note_json(obj, raw_text=text, filename_hint=filename_hint)
    raise ValueError(f"Unsupported input format: {input_format}")


def parse_notes(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """DataFrame form: (id, text) -> (id, <NOTE_SCHEMA fields>) via one
    Arrow-batched pass — same per-document grain as every other parser."""
    out_schema = StructType(
        [StructField(id_col, df.schema[id_col].dataType, True)] + list(NOTE_SCHEMA.fields)
    )

    def gen(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [parse_note_text(t or "") for t in pdf[text_col]]
            out = pd.DataFrame(rows)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, text_col).mapInPandas(gen, out_schema)
