"""Extension router + binary-format extractors (S6-S10, S17, S18).

Semantics contract:
- router (reference: worker/app/services/file_router.py:23-103; registry
  variant scripts/dev/tools/ingest_dropzone.py:195-236): ext -> parser with
  lazy optional deps; unknown text-ish ext falls back to raw UTF-8; missing
  dep or unsupported binary -> skip-with-reason (SkipFile), never a crash.
- kind inference (worker/app/services/discovery.py:36-152): extension ->
  image/audio/pdf/text buckets; ignore prefixes (smoke_/test_/temp_/~$),
  suffixes (.tmp/.part/.crdownload), dotfiles.
- HTML (S8, parsers_html.py:6-25): drop script/style/noscript, visible text
  only, blank lines removed — implemented on stdlib html.parser (bs4 absent
  in this env; same observable contract).
- PDF/DOCX (S6/S7): pypdf / python-docx when importable, else SkipFile —
  mirroring the reference's optional-dep behavior.
- Audio/image (S9/S10): real model calls are pluggable; dev mode returns the
  reference's deterministic stub text ("[DEV] transcript of {name}",
  parse_audio.py:11-64) so pipelines are testable without models.
"""

from __future__ import annotations

from html.parser import HTMLParser

TEXT_EXTS = {"txt", "md", "markdown", "rst", "log"}
CSV_EXTS = {"csv", "tsv"}
JSON_EXTS = {"json"}
JSONL_EXTS = {"jsonl", "ndjson"}
HTML_EXTS = {"html", "htm"}
PDF_EXTS = {"pdf"}
DOCX_EXTS = {"docx"}
AUDIO_EXTS = {"wav", "mp3", "m4a", "flac", "ogg"}
IMAGE_EXTS = {"png", "jpg", "jpeg", "gif", "webp", "bmp"}

IGNORE_NAME_PREFIXES = ("smoke_", "test_", "temp_", "~$", ".")
IGNORE_NAME_SUFFIXES = (".tmp", ".part", ".crdownload")


class SkipFile(Exception):
    """Parse skipped with a reason (never fails the batch)."""


def ext_of(path: str) -> str:
    name = path.rsplit("/", 1)[-1]
    return name.rsplit(".", 1)[-1].lower() if "." in name else ""


def kind_for_ext(ext: str) -> str:
    """Kind bucket for the chunk schema's ``kind`` column."""
    if ext in IMAGE_EXTS:
        return "image"
    if ext in AUDIO_EXTS:
        return "audio"
    if ext in PDF_EXTS:
        return "pdf"
    if ext in CSV_EXTS:
        return "csv"
    if ext in HTML_EXTS:
        return "html"
    if ext in DOCX_EXTS:
        return "doc"
    if ext in JSON_EXTS or ext in JSONL_EXTS:
        return "json"
    return "text"


def should_ignore(path: str) -> bool:
    """P5 ignore predicates (discovery.py:58-67, watch_dropzone.py:38-43)."""
    name = path.rsplit("/", 1)[-1]
    return name.startswith(IGNORE_NAME_PREFIXES) or name.endswith(IGNORE_NAME_SUFFIXES)


class _VisibleText(HTMLParser):
    _SKIP = {"script", "style", "noscript"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._depth = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._depth += 1

    def handle_endtag(self, tag):
        if tag in self._SKIP and self._depth:
            self._depth -= 1

    def handle_data(self, data):
        if not self._depth and data.strip():
            self.parts.append(data.strip())


def parse_html_text(text: str) -> str:
    """S8: visible text, one block, blank lines removed."""
    p = _VisibleText()
    p.feed(text)
    return "\n".join(p.parts)


def parse_pdf_bytes(content: bytes) -> str:
    """S6: pypdf page-by-page extract, non-empty pages joined by newline."""
    try:
        from pypdf import PdfReader  # optional dep, lazy per executor
    except ImportError as e:
        raise SkipFile("pypdf not installed") from e
    import io

    reader = PdfReader(io.BytesIO(content))
    pages = [(p.extract_text() or "").strip() for p in reader.pages]
    return "\n".join(p for p in pages if p)


def parse_docx_bytes(content: bytes) -> str:
    """S7: python-docx paragraphs, empties skipped."""
    try:
        import docx  # optional dep
    except ImportError as e:
        raise SkipFile("python-docx not installed") from e
    import io

    d = docx.Document(io.BytesIO(content))
    return "\n".join(p.text for p in d.paragraphs if p.text and p.text.strip())


def transcribe_audio_stub(path: str) -> str:
    """S9 dev mode: deterministic stub (reference parse_audio.py dev path)."""
    return f"[DEV] transcript of {path.rsplit('/', 1)[-1]}"


def caption_image_stub(path: str) -> str:
    """S10 dev mode: deterministic caption stub."""
    return f"[DEV] caption of {path.rsplit('/', 1)[-1]}"


def extract_text_auto(path: str, content: bytes, dev_mode: bool = True) -> str:
    """S18: ext-dispatched extraction over file bytes.

    Raises SkipFile for unsupported/undecodable inputs; callers record the
    reason and continue (the reference's skip-with-reason contract).
    """
    from jsonify2ai_spark.sources.csvsrc import csv_join_lines
    from jsonify2ai_spark.sources.flatten import flatten_json_text, flatten_jsonl_text

    ext = ext_of(path)
    if ext in PDF_EXTS:
        return parse_pdf_bytes(content)
    if ext in DOCX_EXTS:
        return parse_docx_bytes(content)
    if ext in AUDIO_EXTS:
        if dev_mode:
            return transcribe_audio_stub(path)
        from jsonify2ai_spark.multimodal.models import ModelUnavailable, transcribe_audio_real

        try:
            return transcribe_audio_real(path)
        except ModelUnavailable as e:
            raise SkipFile(f"audio model not available: {e}") from e
    if ext in IMAGE_EXTS:
        if dev_mode:
            return caption_image_stub(path)
        from jsonify2ai_spark.multimodal.models import ModelUnavailable, caption_image_real

        try:
            return caption_image_real(path, content=content)
        except ModelUnavailable as e:
            raise SkipFile(f"image model not available: {e}") from e

    # tolerant decode (BOM / UTF-16 / legacy single-byte): a UTF-16 file
    # under the old utf-8+ignore decode came out riddled with NULs
    from jsonify2ai_spark.sources.notes import decode_text

    try:
        text = decode_text(content)
    except ValueError as e:
        raise SkipFile(f"undecodable: {e}") from e

    if ext in CSV_EXTS:
        delim = "\t" if ext == "tsv" else None
        return "\n".join(csv_join_lines(text, delimiter=delim))
    if ext in JSON_EXTS:
        return flatten_json_text(text)
    if ext in JSONL_EXTS:
        return flatten_jsonl_text(text)
    if ext in HTML_EXTS:
        return parse_html_text(text)
    # S1 fallback: raw text (txt/md/unknown)
    return text
