"""User-facing API facade — the reference's HTTP surface as Python functions.

Route -> function map (reference: worker/app/routers/*):
- POST /process/* + CLI ingest  -> :func:`ingest`        (process.py:370-1600)
- GET|POST /search              -> :func:`search`        (search.py:144-220)
- POST /ask (data plane)        -> :func:`ask`           (ask.py:253-462)
- GET /documents                -> :func:`documents`     (documents.py:19-168)
- DELETE /documents/{id}        -> :func:`delete_document` (documents.py:171-203)
- GET /status (counts)          -> :func:`stats`         (status.py:112-162)
- GET /export/{id}.jsonl|.zip   -> :func:`export_document` (export.py:62-419)

Each function is a thin composition of the operator modules — the operators
stay independently usable; this module is the "switch from the reference"
entry point. The corpus is a chunks DataFrame (see sinks.tables.ensure_table
+ sources.ingest for building one); queries never mutate it — mutation
functions RETURN the new table state for the caller to write (immutable
Parquet discipline, snapshot isolation for readers).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonify2ai_spark.session import local_rows_df

from jsonify2ai_spark.functions.vectors import dev_embedding_py
from jsonify2ai_spark.operators.inventory import documents_inventory, stats_report
from jsonify2ai_spark.operators.search import cosine_topk
from jsonify2ai_spark.operators.snippets import select_snippets
from jsonify2ai_spark.operators.upsert import delete_documents, replace_documents
from jsonify2ai_spark.sources.ingest import ingest_files

MIN_SYNTH_SCORE = 0.55  # reference config.py:86

# filter kwarg -> chunk column it predicates on (the BM25Index needs the
# column among its attr_cols to serve the filter from its doc table)
_FILTER_COLS = {
    "document_id": "document_id",
    "kind": "kind",
    "path": "path",
    "ts_after": "ingested_at_ts",
    "ts_before": "ingested_at_ts",
}


def _index_serves(index: Any, flt: Column | None, **filters: Any) -> bool:
    """True when a prebuilt BM25Index can answer this query: always for
    unfiltered, and for filtered when the index carries every column the
    filter touches. Shared by bm25_search and hybrid_search so the two
    entry points have ONE index-vs-fallback contract."""
    if flt is None:
        return True
    need = {
        _FILTER_COLS[k] for k, v in filters.items() if v is not None and k in _FILTER_COLS
    }
    return need <= set(getattr(index, "attr_cols", ()))


def ingest(
    spark: SparkSession,
    root: str,
    existing: DataFrame | None = None,
    **kw: Any,
) -> DataFrame:
    """§3.1 pipeline: files under ``root`` -> new chunks-table state
    (idempotent replace when ``existing`` is given)."""
    return ingest_files(spark, root, existing=existing, **kw)


def _build_filter(
    document_id: str | None = None,
    kind: str | None = None,
    path: str | None = None,
    ts_after: int | None = None,
    ts_before: int | None = None,
) -> Column | None:
    """P1/P2 filter builder (search.py:74-105): equality + time range."""
    preds = []
    if document_id is not None:
        preds.append(F.col("document_id") == document_id)
    if kind is not None:
        preds.append(F.col("kind") == kind)
    if path is not None:
        preds.append(F.col("path") == path)
    if ts_after is not None:
        preds.append(F.col("ingested_at_ts") >= ts_after)
    if ts_before is not None:
        preds.append(F.col("ingested_at_ts") < ts_before)
    if not preds:
        return None
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def _project_sources(hits: DataFrame, k: int | None = None) -> DataFrame:
    """The shared Source projection (reference search.py:144-220 response
    shape): provenance columns + 600-char excerpt, never the vector. One
    definition for all three retrievers — the shape must not drift between
    arms. ``k`` additionally orders by (score desc, id) and caps."""
    from jsonify2ai_spark.functions.text import truncate_ellipsis

    out = hits.select(
        "id",
        "document_id",
        "kind",
        "path",
        "idx",
        truncate_ellipsis(F.coalesce(F.col("text"), F.lit("")), 600).alias("text"),
        "score",
    )
    if k is not None:
        out = out.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)
    return out


def search(
    chunks: DataFrame,
    query: str,
    k: int = 5,
    dim: int = 768,
    embed=None,
    **filters: Any,
) -> DataFrame:
    """§3.2: embed query -> filter -> cosine top-k -> Source projection
    (600-char excerpt, no vectors). ``embed`` is query-text -> vector;
    defaults to the deterministic dev-mode embedding."""
    qvec = (embed or (lambda t: dev_embedding_py(t, dim=dim)))(query)
    hits = cosine_topk(
        chunks,
        qvec,
        k=k,
        vector_col="vector",
        id_cols=("document_id", "idx"),
        filters=_build_filter(**filters),
    )
    return _project_sources(hits.withColumn("score", F.round("score", 6)))


def bm25_search(
    chunks: DataFrame,
    query: str,
    k: int = 5,
    dim: int = 768,
    embed=None,
    index=None,
    **filters: Any,
) -> DataFrame:
    """Lexical-only retrieval arm: BM25 over the chunk text with the same
    Source projection as :func:`search`. ``dim``/``embed`` are accepted (and
    ignored) so the three retrievers are signature-interchangeable in
    :func:`ask`. ``score`` is BM25-scale (unbounded, >0 for any term match)
    — gate thresholds must be chosen per arm.

    Pass a prebuilt :class:`~jsonify2ai_spark.operators.textsearch.BM25Index`
    as ``index`` for serving loops: the per-query corpus tokenize is then a
    posting-list lookup. Filters change the scoring pool (df_t/avgdl); the
    index serves them too — recomputing the pool scalars from its narrow
    per-doc table — PROVIDED it was built with ``attr_cols`` covering the
    filter's columns. Otherwise this falls back to per-query scoring over
    the filtered pool (identical scores, corpus-tokenize cost) — the same
    documented fallback :func:`hybrid_search` applies."""
    from jsonify2ai_spark.operators.textsearch import bm25_topk

    flt = _build_filter(**filters)
    pool = chunks.filter(flt) if flt is not None else chunks
    if index is not None and _index_serves(index, flt, **filters):
        scored = index.topk(query, k=k, filter=flt).withColumnRenamed("bm25", "score")
    else:
        scored = bm25_topk(pool, query, k=k, id_col="id").withColumnRenamed("bm25", "score")
    out = pool.drop("score").join(F.broadcast(scored), "id")
    return _project_sources(out, k=k)


def hybrid_search(
    chunks: DataFrame,
    query: str,
    k: int = 5,
    dim: int = 768,
    embed=None,
    rrf_k: int = 60,
    bm25_index=None,
    **filters: Any,
) -> DataFrame:
    """Hybrid retrieval: BM25 and vector rankings fused with reciprocal-rank
    fusion (the q44 plan as a serving call, completing the reference's
    hybrid-search roadmap item README.md:153). Same Source projection as
    :func:`search`; ``score`` is the fused rrf = Σ 1/(rrf_k + rank) — note
    the scale (max 2/(rrf_k+1)), so synthesis gates need an rrf-scale
    threshold, not the cosine one.

    ``bm25_index`` serves the lexical arm, filtered or not, when its
    ``attr_cols`` cover the filter's columns; otherwise the arm falls back
    to per-query ``bm25_topk`` over the filtered pool — the identical
    contract :func:`bm25_search` applies (shared :func:`_index_serves`)."""
    from pyspark.sql import Window

    from jsonify2ai_spark.operators.textsearch import bm25_topk

    flt = _build_filter(**filters)
    pool = chunks.filter(flt) if flt is not None else chunks

    if bm25_index is not None and _index_serves(bm25_index, flt, **filters):
        bm25 = bm25_index.topk(query, k=max(k, 20), filter=flt)
    else:
        bm25 = bm25_topk(pool, query, k=max(k, 20), id_col="id")
    w_b = Window.orderBy(F.col("bm25").desc(), F.col("id").asc())
    bm25_r = bm25.select("id", F.row_number().over(w_b).alias("rank_bm25"))

    qvec = (embed or (lambda t: dev_embedding_py(t, dim=dim)))(query)
    vec = cosine_topk(
        pool, qvec, k=max(k, 20), vector_col="vector", id_cols=("id",)
    )
    w_v = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    vec_r = vec.select("id", F.row_number().over(w_v).alias("rank_vec"))

    fused = bm25_r.join(vec_r, "id", "full_outer").select(
        "id",
        F.round(
            F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rank_bm25")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rank_vec")), F.lit(0.0)),
            6,
        ).alias("score"),
    )
    # both rank lists are <= max(k,20) rows: broadcast the fused ranking and
    # join back to the chunk table for the projection — the corpus-side scan
    # happens once per retrieval system, never for the fusion
    out = pool.drop("score").join(F.broadcast(fused), "id")
    return _project_sources(out, k=k)


def hybrid_topk_batch(
    chunks: DataFrame,
    queries: list[str],
    bm25_index,
    k: int = 5,
    dim: int = 768,
    embed=None,
    rrf_k: int = 60,
    ann: tuple | None = None,
) -> DataFrame:
    """BATCHED hybrid retrieval: (query_id, id, score) — the per-query
    rrf fusion of :func:`hybrid_search`, but ONE Spark job per retrieval
    SYSTEM for the whole query set (query_id = position in ``queries``).
    Completes the batched serving family (BM25Index.topk_batch,
    quantized_ivf_topk_batch): the lexical arm is one topk_batch over the
    persisted postings, the vector arm one broadcast of the embedded
    query set into the corpus with per-query WindowGroupLimit top-k, and
    the fusion a (query_id, id)-keyed outer join of two rank lists.
    Row-for-row parity with per-query ``hybrid_search`` on an unfiltered
    pool is test-pinned (filtered batches don't share one pool — filter
    per query via ``hybrid_search``).

    Cost note: the DEFAULT vector arm is the EXACT brute scan, so compute
    is |corpus| x |batch| by construction — identical total flops to
    running the per-query arm per query, minus the scheduler floor.

    ``ann=(ivf_index, centroids[, n_probe=2])`` swaps the vector arm for
    the batched quantized-IVF path
    (:func:`~jsonify2ai_spark.operators.ann.quantized_ivf_topk_batch`) —
    THE 100 TB form (r7 verdict #4): the scan partition-prunes to the
    union of each query's probed cells instead of touching the corpus,
    and scoring is int8. The ivf_index must be built over the SAME ids as
    ``chunks.id`` (``build_quantized_ivf(..., id_col="id")``) and the
    same embedding space as ``embed``. Ranks fuse identically; top-1
    recall vs the brute arm is pinned by test + the eval artifact arm."""
    from pyspark.sql import Window

    from jsonify2ai_spark.functions.vectors import cosine_similarity

    spark = chunks.sparkSession
    kk = max(k, 20)
    embed_fn = embed or (lambda t: dev_embedding_py(t, dim=dim))

    bm25 = bm25_index.topk_batch(queries, k=kk)
    w_b = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("id").asc()
    )
    bm25_r = bm25.select(
        "query_id", "id", F.row_number().over(w_b).alias("rank_bm25")
    )

    qvecs = [[float(x) for x in embed_fn(q)] for q in queries]
    if ann is not None:
        from jsonify2ai_spark.operators.ann import quantized_ivf_topk_batch

        ivf_index, centroids = ann[0], ann[1]
        n_probe = ann[2] if len(ann) > 2 else 2
        w_v = Window.partitionBy("query_id").orderBy(
            F.col("qcos").desc(), F.col("id").asc()
        )
        vec_r = (
            quantized_ivf_topk_batch(
                ivf_index,
                qvecs,
                centroids,
                k=kk,
                n_probe=n_probe,
                id_col="id",
                # rank on UNROUNDED scores: the batch call's top-k cut uses
                # them, and re-ranking display-rounded qcos here could swap
                # near-ties relative to that cut (review-found r8); the
                # brute arm ranks unrounded cosines for the same reason
                round_to=None,
            )
            .withColumn("_rn", F.row_number().over(w_v))
            .select("query_id", "id", F.col("_rn").alias("rank_vec"))
        )
    else:
        qdf = local_rows_df(
            spark, [(i, qv) for i, qv in enumerate(qvecs)],
            "query_id int, _qv array<double>",
        )
        w_v = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("id").asc()
        )
        vec_r = (
            F.broadcast(qdf)
            .crossJoin(chunks.select("id", "vector"))
            .withColumn("score", cosine_similarity(F.col("vector"), F.col("_qv")))
            .withColumn("_rn", F.row_number().over(w_v))
            .filter(F.col("_rn") <= kk)
            .select("query_id", "id", F.col("_rn").alias("rank_vec"))
        )

    fused = bm25_r.join(vec_r, ["query_id", "id"], "full_outer").select(
        "query_id",
        "id",
        F.round(
            F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rank_bm25")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rank_vec")), F.lit(0.0)),
            6,
        ).alias("score"),
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return (
        fused.withColumn("_rn", F.row_number().over(w_f))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def ask(
    chunks: DataFrame,
    question: str,
    k: int = 5,
    dim: int = 768,
    embed=None,
    min_synth_score: float = MIN_SYNTH_SCORE,
    retriever=None,
    min_snippet_score: float | None = None,
    **filters: Any,
) -> dict[str, Any]:
    """§3.3 data plane: retrieve -> synthesis gate -> snippet selection.
    Returns {sources, snippets, would_synth, top_score}; prompt assembly and
    the LLM call are the caller's (control-plane) concern — exactly the
    reference's split, with generate() pluggable. ``retriever`` swaps the
    retrieval system (default :func:`search`; pass :func:`hybrid_search`
    with rrf-scale ``min_synth_score``/``min_snippet_score`` — the defaults
    are COSINE-scale gates (reference config.py:86) and would drop every
    rrf-scored row)."""
    from jsonify2ai_spark.operators.snippets import MIN_SNIPPET_SCORE

    retrieve = retriever or search
    pool = retrieve(chunks, question, k=max(k, 10), dim=dim, embed=embed, **filters)
    rows = select_snippets(
        pool,
        score_col="score",
        text_col="text",
        id_cols=("document_id", "idx"),
        min_score=MIN_SNIPPET_SCORE if min_snippet_score is None else min_snippet_score,
    ).collect()
    top = max((r["score"] for r in rows), default=None)
    return {
        "sources": [
            {k2: r[k2] for k2 in ("document_id", "path", "kind", "idx", "score")}
            for r in rows
        ],
        "snippets": [r["snippet"] for r in rows],
        "top_score": top,
        "would_synth": bool(rows) and top is not None and top >= min_synth_score,
    }


def render_prompt(question: str, snippets: list[str], tags: list[str] | None = None) -> str:
    """F19 prompt renderer (reference ask.py:212-227,359-372): numbered,
    source-tagged snippets + grounded-only instructions, 3-6 sentence cap.
    Driver-side string work — the data plane ends at the snippet set."""
    tags = tags or [f"[T{i + 1}]" for i in range(len(snippets))]
    numbered = "\n\n".join(
        f"{i + 1}. {tag} {s[:700]}" for i, (tag, s) in enumerate(zip(tags, snippets))
    )
    return (
        "Answer the question using ONLY the numbered context snippets below. "
        "If the context is insufficient, say so. Keep the answer to 3-6 "
        "sentences and cite snippet tags.\n\n"
        f"Context:\n{numbered}\n\nQuestion: {question}\nAnswer:"
    )


def ask_and_generate(
    chunks: DataFrame,
    question: str,
    generate=None,
    **kw: Any,
) -> dict[str, Any]:
    """§3.3 complete: data plane via :func:`ask`, then the gated LLM call.
    ``generate(prompt) -> str`` is the model transport (reference
    providers/llm/ollama.py:21-72); generation failure falls back to
    retrieve-only, exactly like ask.py:333-341. No transport configured ->
    retrieve mode with a skip reason (the reference's synth_skipped_reason)."""
    out = ask(chunks, question, **kw)
    out["mode"] = "retrieve"
    if not out["would_synth"]:
        out["synth_skipped_reason"] = "below_min_score_or_no_sources"
        return out
    if generate is None:
        out["synth_skipped_reason"] = "no_llm_provider"
        return out
    prompt = render_prompt(question, out["snippets"])
    try:
        answer = generate(prompt)
    except Exception:
        out["synth_skipped_reason"] = "generation_failed"
        return out
    if answer:
        out["mode"] = "synthesize"
        out["answer"] = answer
    else:
        out["synth_skipped_reason"] = "empty_generation"
    return out


def documents(chunks: DataFrame, limit: int = 200) -> DataFrame:
    """A1 inventory: per-document kinds/paths/chunk counts, newest-id first."""
    return documents_inventory(chunks, limit=limit)


def delete_document(chunks: DataFrame, document_id: str) -> DataFrame:
    """K4: new table state without the document (write-back is the caller's)."""
    return delete_documents(chunks, [document_id])


def upsert_documents(chunks: DataFrame, incoming: DataFrame) -> DataFrame:
    """J5: idempotent replace-by-document_id merge."""
    return replace_documents(chunks, incoming)


def stats(chunks: DataFrame) -> DataFrame:
    """A2-A4: total + per-kind counts in one pass (GROUPING SETS rollup)."""
    return stats_report(chunks)


def export_document(chunks: DataFrame, document_id: str, out_dir: str) -> None:
    """K5: JSONL export with the stable field order."""
    from jsonify2ai_spark.sinks.export import export_jsonl

    export_jsonl(chunks, out_dir, document_id=document_id)
