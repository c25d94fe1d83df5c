"""File-format sources (SURVEY §2.1 S-series): everything that turns raw
files/bytes/strings into the unified (document_id, text, meta) frame.

Design: per-format *kernels* are pure Python functions (testable without
Spark); Spark plumbing wraps them as Arrow-batched pandas UDFs over a
``binaryFile`` scan, dispatched by extension (S18 router). Heavy optional
deps (pypdf, python-docx, PIL, whisper) are import-gated per executor with
deterministic dev-mode stubs, mirroring the reference's lazy parser registry
(worker/app/services/file_router.py:10-13,59-99) and dev modes
(worker/tests/conftest.py:20-26).
"""

from jsonify2ai_spark.sources.flatten import flatten_json_text, flatten_obj, flatten_json_col
from jsonify2ai_spark.sources.csvsrc import csv_join_lines, read_csv_joined
from jsonify2ai_spark.sources.transcript import detect_transcript, parse_transcript
from jsonify2ai_spark.sources.chatgpt import is_chatgpt_export, parse_chatgpt_export
from jsonify2ai_spark.sources.router import extract_text_auto, kind_for_ext, SkipFile
from jsonify2ai_spark.sources.ingest import ingest_files, ingest_summary, read_binary_files
from jsonify2ai_spark.sources.notes import parse_note_text, parse_notes

__all__ = [
    "flatten_json_text", "flatten_obj", "flatten_json_col",
    "csv_join_lines", "read_csv_joined",
    "detect_transcript", "parse_transcript",
    "is_chatgpt_export", "parse_chatgpt_export",
    "extract_text_auto", "kind_for_ext", "SkipFile",
    "ingest_files", "ingest_summary", "read_binary_files",
    "parse_note_text", "parse_notes",
]
