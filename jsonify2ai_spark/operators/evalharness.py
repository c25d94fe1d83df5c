"""Retrieval-quality eval harness (SURVEY §2.4 A8).

Reference: scripts/dev/tools/ask_eval.py:41-131 — run a QA corpus of
{question, answer_contains} rows through /ask, compute hit@1 (substring
containment in the top answer) and p50/p95 latency, persist results.

Spark shape: the retrieval for EVERY question runs as ONE plan — questions
cross-joined against the (filtered, scored) corpus with a per-question
row_number top-k — instead of a per-question HTTP loop. Metrics are one
aggregation. At 100 TB the corpus side is the big scan and it is shared
across all questions in a single pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jsonify2ai_spark.functions.vectors import cosine_similarity, dev_embedding


def batch_retrieve(
    questions: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    dim: int = 64,
    q_id: str = "q_id",
    q_text: str = "question",
    doc_id: str = "doc_id",
    doc_text: str = "text",
) -> DataFrame:
    """Top-k corpus rows per question, one plan for the whole QA set.

    Dev-mode hash embeddings on BOTH sides keep this model-free and
    deterministic (the reference's EMBED_DEV_MODE eval trick); swap the
    embedding expression for a model UDF in production. The corpus is scored
    once per question via a broadcast of the (tiny) question set — never the
    corpus.
    """
    q = questions.select(
        F.col(q_id), F.col(q_text), dev_embedding(F.col(q_text), dim=dim).alias("_qv")
    )
    c = corpus.select(
        F.col(doc_id), F.col(doc_text), dev_embedding(F.col(doc_text), dim=dim).alias("_dv")
    )
    scored = F.broadcast(q).crossJoin(c).withColumn(
        "score", F.round(cosine_similarity(F.col("_qv"), F.col("_dv")), 6)
    )
    w = Window.partitionBy(q_id).orderBy(F.col("score").desc(), F.col(doc_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, q_text, doc_id, doc_text, "score", "rank")
    )


def eval_metrics(
    hits: DataFrame,
    expected: DataFrame,
    q_id: str = "q_id",
    doc_text: str = "text",
    contains_col: str = "answer_contains",
) -> DataFrame:
    """hit@1 / hit@k + per-question rank of the first containing hit.

    ``expected`` rows: (q_id, answer_contains). A hit is substring
    containment in the retrieved text — the reference's exact criterion
    (ask_eval.py:96-104). Output: one row per question with hit flags, plus
    use `.agg(avg(...))` for the corpus-level rates.
    """
    joined = hits.join(expected, q_id)
    flagged = joined.withColumn(
        "contains", F.instr(F.col(doc_text), F.col(contains_col)) > 0
    )
    return flagged.groupBy(q_id).agg(
        F.max(F.when(F.col("contains") & (F.col("rank") == 1), 1).otherwise(0)).alias("hit_at_1"),
        F.max(F.when(F.col("contains"), 1).otherwise(0)).alias("hit_at_k"),
        F.min(F.when(F.col("contains"), F.col("rank"))).alias("first_hit_rank"),
    )


def latency_percentiles(latencies: DataFrame, value_col: str = "latency_ms") -> DataFrame:
    """p50/p95 (linear interpolation — statistics.quantiles parity)."""
    return latencies.agg(
        F.round(F.expr(f"percentile({value_col}, 0.5)"), 4).alias("p50"),
        F.round(F.expr(f"percentile({value_col}, 0.95)"), 4).alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )
