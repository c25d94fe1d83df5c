"""Snippet selection for RAG synthesis (SURVEY §2.5 W5).

Reference: pool = top-10 hits; drop score < 0.2; cap 5 snippets, 2000 chars
each, 8000 chars total via running sum; tag provenance
(worker/app/routers/ask.py:375-422; gate constants worker/app/config.py:86).

The running-total cutoff is a window cumulative sum — a single in-partition
window after a 10-row TakeOrdered, so cost is trivial regardless of corpus
size (the expensive part was the top-k that produced the pool).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MIN_SNIPPET_SCORE = 0.2
MAX_SNIPPETS = 5
MAX_SNIPPET_CHARS = 2000
MAX_TOTAL_CHARS = 8000
POOL_SIZE = 10


def select_snippets(
    hits: DataFrame,
    score_col: str = "score",
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("id",),
    pool_size: int = POOL_SIZE,
    min_score: float = MIN_SNIPPET_SCORE,
    max_snippets: int = MAX_SNIPPETS,
    max_chars: int = MAX_SNIPPET_CHARS,
    max_total: int = MAX_TOTAL_CHARS,
) -> DataFrame:
    """Reference W5 pipeline, deterministic (id tiebreaks everywhere)."""
    order = [F.col(score_col).desc()] + [F.col(c).asc() for c in id_cols]
    pool = hits.orderBy(*order).limit(pool_size)
    pool = pool.filter(F.col(score_col) >= min_score)
    clipped = pool.withColumn("snippet", F.substring(F.col(text_col), 1, max_chars))
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        clipped.withColumn("cum_chars", F.sum(F.length("snippet")).over(w))
        .filter(F.col("cum_chars") <= max_total)
        .orderBy(*order)
        .limit(max_snippets)
    )
