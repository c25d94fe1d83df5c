"""Text scalar functions (SURVEY §2.6 F-series), all built-in expressions.

Each mirrors a reference behavior:
- normalize_ws       — re.sub(r"\\s+", " ").strip()   (worker/app/services/chunker.py:14-29)
- normalize_newlines — \\r\\n|\\r -> \\n                 (worker/app/schema/chunk_schema.py:20-24)
- truncate_ellipsis  — 600-char excerpt + "…"          (worker/app/routers/search.py:34-36)
- tokens/token_count — whitespace tokenization used by chunk/stats paths
- shingles           — word n-grams for dedup fingerprints (north-star op)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def normalize_ws(text: Column | str) -> Column:
    return F.trim(F.regexp_replace(_c(text), r"\s+", " "))


def normalize_newlines(text: Column | str) -> Column:
    return F.regexp_replace(_c(text), r"\r\n?", "\n")


def truncate_ellipsis(text: Column | str, limit: int = 600) -> Column:
    t = _c(text)
    return F.when(F.length(t) > limit, F.concat(F.substring(t, 1, limit), F.lit("…"))).otherwise(t)


def shorten_preview(text: Column | str, width: int = 160, placeholder: str = "...") -> Column:
    """F9: word-boundary preview with ``textwrap.shorten`` semantics
    (reference scripts/dev/tools/ingest_dropzone.py:594-596 — width=160,
    placeholder="..."): collapse whitespace, return whole text if it fits,
    else the longest whole-word prefix such that prefix + placeholder fits;
    if not even one word fits, the placeholder alone.

    Pure-Column: normalize -> length gate -> cut at the last word boundary
    within (width - len(placeholder) + 1) chars -> append placeholder.
    """
    t = F.trim(F.regexp_replace(_c(text), r"\s+", " "))
    budget = width - len(placeholder)
    # one char beyond the budget: if it is a space the prefix is whole words
    # already; the trailing ' \S*$' strip removes either that space or the
    # partially-included word
    probe = F.substring(t, 1, budget + 1)
    prefix = F.rtrim(F.regexp_replace(probe, r" \S*$", ""))
    # a single overlong first word leaves prefix == probe (no space to cut):
    # textwrap returns the placeholder alone in that case
    fits_none = F.length(prefix) > budget
    shortened = F.when(fits_none, F.lit(placeholder)).otherwise(
        F.concat(prefix, F.lit(placeholder))
    )
    return F.when(F.length(t) <= width, t).otherwise(shortened)


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of the trimmed text; empty text -> empty array."""
    t = F.trim(_c(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation —
# the GPT-2-style split that precedes byte-pair merging. Token COUNT over this
# split is the standard cheap proxy for LLM token budgets at corpus scale.
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens(text: Column | str) -> Column:
    """Array of BPE-ish pre-tokens (regexp_extract_all — stays JVM-side)."""
    return F.regexp_extract_all(_c(text), F.lit(BPE_SPLIT_RE), 0)


def bpe_token_count(text: Column | str) -> Column:
    return F.size(bpe_tokens(text))


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles, joined with single spaces.

    The unit of MinHash/Jaccard dedup. Expressed with transform over an index
    sequence so it stays JVM-side; documents shorter than n words produce a
    single whole-text shingle so they still participate in dedup.

    The token array is let-bound by an outer single-element ``transform`` so
    the regex split runs ONCE per row: Catalyst does no CSE across lambda
    bodies, so referencing ``tokens(text)`` directly inside the per-gram
    lambda would re-split the text once per gram — O(tokens^2) regex work per
    document (measured ~15x slower on 300-char docs).
    """

    def _grams(tk: Column) -> Column:
        cnt = F.size(tk)
        idx = F.sequence(F.lit(1), cnt - F.lit(n - 1))
        grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tk, i, n)))
        whole = F.array(F.concat_ws(" ", tk))
        return F.array_distinct(F.when(cnt >= n, grams).otherwise(whole))

    return F.element_at(F.transform(F.array(tokens(text)), _grams), 1)
