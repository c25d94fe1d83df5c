"""Chunkers (SURVEY §2.5 W1/W2): sliding-window and chat-aware text chunking.

Semantics contract (reference: worker/app/services/chunker.py:17-131 for W1,
:134-253 for W2; defaults size=800 overlap=100 from worker/app/config.py:49-50;
golden vectors in worker/tests/test_process_unit.py:12-65 — 'a'*200 at
size=100/overlap=20 -> exactly [100,100,40] chars with 20-char overlaps):

W1: whitespace-normalize; window of ``size`` chars; prefer cutting at the last
whitespace inside the window (hard cut when none); next window starts
``overlap`` chars before the cut; progress is strictly monotone; empty pieces
dropped.

Chunking is sequential *within* a document but embarrassingly parallel across
documents, so the Spark shape is a pandas UDF (Arrow-batched) producing
``array<string>`` + ``posexplode`` for (idx, chunk) — documents are the unit
of parallelism, which is exactly right at 100 TB (billions of docs, none big
enough to need intra-doc parallelism).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

DEFAULT_SIZE = 800
DEFAULT_OVERLAP = 100


def chunk_text_py(text: str, size: int = DEFAULT_SIZE, overlap: int = DEFAULT_OVERLAP) -> list[str]:
    """Pure-Python W1 chunker (the per-document kernel the UDF maps).

    Matches the reference's documented boundary behavior: exact window/overlap
    arithmetic on whitespace-free text, whitespace-preferred cuts otherwise.
    """
    if not text or size <= 0:
        return []
    text = re.sub(r"\s+", " ", text).strip()
    if not text:
        return []
    overlap = max(0, min(overlap, size - 1))
    step_default = size - overlap
    chunks: list[str] = []
    start, n = 0, len(text)
    while start < n:
        end = min(start + size, n)
        cut = end
        if end < n:
            ws = text.rfind(" ", start, end)
            if ws > start:
                cut = ws
        piece = text[start:cut].strip()
        if piece:
            chunks.append(piece)
        if cut >= n:
            break
        nxt = cut - overlap
        if nxt <= start:  # monotone progress even when overlap >= produced piece
            nxt = start + step_default
        start = nxt
    return chunks


def chunk_chat_py(text: str, size: int = DEFAULT_SIZE) -> list[str]:
    """W2 chat-aware chunker: accumulate '\\n\\n'-separated message blocks
    under the char budget; oversize blocks fall back to W1 splitting
    (reference: chunker.py:134-253 — header-repeat refinement tracked there).
    """
    if not text or size <= 0:
        return []
    blocks = [b.strip() for b in text.split("\n\n") if b.strip()]
    chunks: list[str] = []
    acc = ""
    for b in blocks:
        if len(b) > size:
            if acc:
                chunks.append(acc)
                acc = ""
            chunks.extend(chunk_text_py(b, size=size, overlap=0))
            continue
        joined = f"{acc}\n\n{b}" if acc else b
        if len(joined) <= size:
            acc = joined
        else:
            chunks.append(acc)
            acc = b
    if acc:
        chunks.append(acc)
    return chunks


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = DEFAULT_SIZE,
    overlap: int = DEFAULT_OVERLAP,
    chat: bool = False,
) -> DataFrame:
    """(id, idx, chunk) — one output row per chunk, Arrow-batched.

    ``posexplode`` preserves the positional idx that chunk ids are derived
    from (uuid5(document_id, 'chunk:{idx}')).
    """

    @F.pandas_udf(ArrayType(StringType()))
    def _chunk(s: pd.Series) -> pd.Series:
        kern = chunk_chat_py if chat else chunk_text_py
        if chat:
            return s.map(lambda t: kern(t or "", size))
        return s.map(lambda t: kern(t or "", size, overlap))

    return df.select(
        F.col(id_col),
        F.posexplode(_chunk(F.col(text_col))).alias("idx", "chunk"),
    )
