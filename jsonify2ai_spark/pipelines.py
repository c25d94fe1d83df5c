"""The end-to-end training-corpus preparation recipe, composed from the
operator modules: scrub -> quality-filter -> dedup -> pack, one call.

This is the "switch from the reference" deliverable for the corpus-prep use
case: every stage is an operator that is independently oracle- or
test-verified (PII q58, repetition q59, exact dedup q15, LSH q18, CC q51,
packing q57), and the composition only wires them — no new semantics hide
here. Every stage is also individually optional, because real pipelines
always need to toggle stages per corpus.

Scale shape of the whole chain: PII + repetition are map-only; the quality
filter is a projection; exact dedup is one shuffle on the content hash; the
near-dup path is banded candidate generation + CC (rounds bounded by
large-star escalation); packing is per-group sequential by design. Nothing
in the chain is quadratic or driver-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jsonify2ai_spark.session import local_rows_df


def prepare_training_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.2,
    filter_repetitive: bool = True,
    length_trim: tuple[float, float] | None = None,
    near_dedup: bool = True,
    keep_best: bool = False,
    compression_trim: "tuple[float, float] | None" = None,
    redact: bool = True,
    pack_budget: int | None = 2000,
    pack_groups: int = 32,
    fix_encoding: bool = False,
    span_dedup_n: int | None = None,
    span_dedup_keep: str = "one",
    diversity: tuple[list[list[float]], int] | None = None,
    vector_col: str = "embedding",
    dsir: "tuple[DataFrame, float] | None" = None,
    dsir_buckets: int = 10_000,
    audit: list | None = None,
) -> DataFrame:
    """Return the prepared corpus: one row per KEPT document with the
    (optionally redacted) text plus quality/packing columns.

    Stages, in order (each skippable):
    0. encoding repair — ``fix_encoding=True`` runs fix_mojibake FIRST
                        (q112): mojibake fragments tokens, so every
                        downstream stat/dedup stage must see repaired text
    1. quality gate   — ``quality_score`` >= ``min_quality``
    2. length trim    — ``length_trim=(lo, hi)`` drops documents whose
                        length percent-rank falls outside [lo, hi]
                        (value-level CDF, q80 — no corpus-wide sort)
    3. repetition gate — drop Gopher-repetitive documents
    3b. compression trim — ``compression_trim=(lo, hi)`` drops documents
                        whose zlib ratio falls outside [lo, hi]: below
                        lo = templated/boilerplate redundancy the n-gram
                        gate can miss (character-level repeats), above
                        hi = binary junk/already-compressed noise that
                        leaked through extraction
    4. exact dedup    — one survivor per normalized-content hash
    5. near dedup     — MinHash-LSH candidates -> connected components ->
                        one survivor per cluster; ``keep_best=True``
                        selects the HIGHEST-quality cluster member (q75)
                        instead of the min-id one
    5b. span dedup    — ``span_dedup_n=N`` rewrites surviving docs with
                        the ExactSubstr rule (q106/q110): verbatim runs
                        duplicated across DIFFERENT surviving documents
                        are cut — all-but-one occurrence by default
                        (``span_dedup_keep``, Lee et al. §4.1). Runs
                        after doc-level dedup (whole dups are already
                        gone; this repairs partial syndication) and
                        before PII/packing (which must see final text)
    5c. diversity cap — ``diversity=(centroids, cap)`` runs
                        diversity_sample (q115's SemDeDup/D4-style mode
                        pruning) over the SURVIVORS' ``vector_col``
                        embeddings (read from the input frame, semi-join
                        restricted): at most ``cap`` docs per embedding
                        mode continue. The D4 recipe's placement —
                        after dedup (so caps count unique content),
                        before packing (r9, VERDICT r8 missing #1)
    5d. DSIR selection — ``dsir=(target_docs, keep_frac)`` keeps the
                        survivors whose deterministic Gumbel resample
                        key clears :func:`~jsonify2ai_spark.operators.
                        sampling.calibrate_dsir_cutoff` (weights,
                        keep_frac) — importance selection toward the
                        target distribution (Xie et al. 2023), fitted
                        on THIS chain's survivors so dedup has already
                        removed the weight-distorting copies; placed
                        before PII/packing like every selection stage
    6. PII redaction  — text rewritten in place (adds ``pii_total``)
    7. packing        — (pack_group, bin_idx) next-fit assignments

    ``audit``: pass a list and every ENABLED stage appends its
    ``(stage_name, boundary_frame)`` — the hook :func:`prep_report`
    builds the per-stage run-report card from (rows/chars/tokens
    surviving each gate). The frames are the chain's own lazily
    checkpointed boundaries, so counting them re-uses the single
    materialization the chain already pays; with ``fix_encoding=True``
    the ``input`` row reflects REPAIRED text (the repair runs before
    every stat the stages read). The packing stage is not audited —
    it is row-preserving layout, and :func:`~jsonify2ai_spark.
    operators.packing.pack_report` (q121) is its QA card.
    """
    from jsonify2ai_spark.operators.dedup import (
        connected_components,
        keep_representatives,
        minhash_lsh_pairs,
    )
    from jsonify2ai_spark.functions.text import normalize_ws
    from jsonify2ai_spark.operators.packing import pack_sequences
    from jsonify2ai_spark.operators.pii import redact_pii, with_pii_counts
    from jsonify2ai_spark.operators.textstats import quality_score, repetition_stats

    # keep a handle on the caller's frame BEFORE any stage narrows it: the
    # diversity stage reads the embedding column from the INPUT frame, and
    # fix_encoding below rebinds `docs` to (id, text) only (review-found
    # r9: fix_encoding=True + diversity= used to always raise)
    source = docs

    if fix_encoding:
        from jsonify2ai_spark.operators.textstats import fix_mojibake

        docs = fix_mojibake(
            docs.select(id_col, text_col), text_col=text_col, id_col=id_col
        ).select(id_col, F.col("text_fixed").alias(text_col))

    def _note(stage: str, frame: DataFrame) -> None:
        if audit is not None:
            audit.append((stage, frame))

    _note("input", docs.select(id_col, text_col))

    # every stage below references `out` from BOTH sides of a self-join
    # (stats + join, dedup-keys + semi-join, pairs + anti-join); a lazy
    # localCheckpoint at each boundary materializes the stage once instead
    # of recomputing the whole upstream subtree per side — without these,
    # the corpus scan would execute up to ~8x in one action (the repo's
    # documented subtree-recompute pitfall)
    out = (
        docs.select(id_col, text_col)
        .withColumn("quality", quality_score(text_col))
        .filter(F.col("quality") >= min_quality)
        .localCheckpoint(eager=False)
    )
    _note("quality", out)

    if length_trim is not None:
        lo, hi = length_trim
        sized = out.withColumn("_len", F.length(text_col).cast("bigint"))
        # the keep decision depends only on the LENGTH VALUE, so key it on
        # _len instead of the document id (r16, VERDICT r15 item 3): the
        # value-level CDF (length_outlier_flags' exact arithmetic — one
        # partial-aggregated shuffle whose output is |distinct lengths|
        # rows) yields the surviving length VALUES, broadcast back onto
        # the corpus map-side. The old shape computed per-id flags and
        # re-attached them with a corpus×corpus semi-join on the id — two
        # full exchanges for a decision the tiny value table already
        # carries. Same rows: flag='keep' ⟺ lower <= pct_rank <= upper
        # for the row's length; rows with no length (flag='no_length',
        # possible only for NULL text, which the quality gate above
        # already removed) still pass through rather than vanishing.
        # the cumulative sum over the value table runs on the DRIVER
        # (build_vocab's partition-offset idiom): one partial-aggregated
        # collect bounded by |distinct lengths|, then the surviving
        # values gate the corpus as a map-side predicate — no window
        # exchange, no broadcast-build job. pct arithmetic is the
        # operator's verbatim: (#docs strictly shorter) / (N - 1) in
        # double, mid-rank 0.5 for a one-document corpus.
        val_rows = sorted(
            (r["_len"], r["cnt"])
            for r in sized.filter(F.col("_len").isNotNull())
            .groupBy("_len")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        n_total = sum(c for _, c in val_rows)
        keep_vals, cum = [], 0
        for ln, c in val_rows:
            pct = cum / (n_total - 1) if n_total > 1 else 0.5
            if lo <= pct <= hi:
                keep_vals.append(ln)
            cum += c
        if len(keep_vals) <= 10_000:
            # plan-safe literal set: the predicate compiles to an InSet
            keep_cond = F.col("_len").isNull() | F.col("_len").isin(keep_vals)
            out = (
                sized.filter(keep_cond)
                .drop("_len")
                .localCheckpoint(eager=False)
            )
        else:
            # a corpus whose distinct-length set outgrows a plan literal
            # gates through a one-slice local frame instead (map-side
            # broadcast semi-join; same rows)
            kv = local_rows_df(
                sized.sparkSession, [(v,) for v in keep_vals], "_len bigint"
            )
            out = (
                sized.join(F.broadcast(kv), "_len", "left_semi")
                .unionByName(sized.filter(F.col("_len").isNull()))
                .drop("_len")
                .localCheckpoint(eager=False)
            )
        _note("length_trim", out)

    if filter_repetitive:
        rep = repetition_stats(out, text_col=text_col, id_col=id_col).select(
            id_col, "repetitive"
        )
        out = (
            out.join(rep, id_col, "left")
            .filter(~F.coalesce(F.col("repetitive"), F.lit(False)))
            .drop("repetitive")
            .localCheckpoint(eager=False)
        )
        _note("repetition", out)

    if compression_trim is not None:
        from jsonify2ai_spark.operators.textstats import compression_ratio

        lo_c, hi_c = compression_trim
        keep_c = (
            compression_ratio(out, text_col=text_col, id_col=id_col)
            .filter(F.col("ratio").between(lo_c, hi_c))
            .select(id_col)
        )
        out = out.join(keep_c, id_col, "left_semi").localCheckpoint(eager=False)
        _note("compression_trim", out)

    # exact dedup as ONE window over the content hash (r16, VERDICT r15
    # item 3): min(id) over the fingerprint partition, keep the row that
    # IS the minimum — one exchange on the hash key, where the old
    # keep-set + semi-join shape paid the same groupBy exchange PLUS a
    # corpus×corpus join on the id. Same survivors as exact_dedup's
    # min-id keeper by definition (q15's oracle contract).
    _fp = F.md5(normalize_ws(F.col(text_col)))
    w_fp = Window.partitionBy("_fp")
    out = (
        out.withColumn("_fp", _fp)
        .withColumn("_keep_id", F.min(id_col).over(w_fp))
        .filter(F.col(id_col) == F.col("_keep_id"))
        .drop("_fp", "_keep_id")
        .localCheckpoint(eager=False)
    )
    _note("exact_dedup", out)

    if near_dedup:
        pairs = minhash_lsh_pairs(out, text_col=text_col, id_col=id_col)
        if keep_best:
            from jsonify2ai_spark.operators.dedup import dedup_keep_best

            kept = (
                dedup_keep_best(out, pairs, quality_col="quality", id_col=id_col)
                .filter(F.col("kept"))
                .select(id_col)
            )
            out = out.join(kept, id_col, "left_semi")
        else:
            labels = connected_components(pairs)
            out = keep_representatives(out, labels, id_col=id_col)
        _note("near_dedup", out)

    if span_dedup_n is not None:
        from jsonify2ai_spark.operators.dedup import remove_duplicate_spans

        # boundary checkpoint: the span stage reads `out` from BOTH sides
        # (the census/rewrite inside remove_duplicate_spans AND the carry
        # join below) — without it the near-dedup subtree above recomputes
        # twice in one action (review-found r8; the function's own rule)
        out = out.localCheckpoint(eager=False)
        spans = remove_duplicate_spans(
            out,
            n=span_dedup_n,
            min_df=2,
            text_col=text_col,
            id_col=id_col,
            keep=span_dedup_keep,
        )
        out = (
            out.drop(text_col)
            .join(
                spans.select(id_col, F.col("text_dedup").alias(text_col)),
                id_col,
            )
            .localCheckpoint(eager=False)
        )
        _note("span_dedup", out)

    if diversity is not None:
        from jsonify2ai_spark.operators.sampling import diversity_sample

        centroids, cap = diversity
        if vector_col not in source.columns:
            raise ValueError(
                f"diversity= needs an embedding column {vector_col!r} on the "
                "input frame (pass vector_col= to rename)"
            )
        # embeddings come from the INPUT frame, restricted to survivors —
        # the cap counts unique post-dedup content, the D4 placement
        surv_emb = source.select(id_col, vector_col).join(
            out.select(id_col), id_col, "left_semi"
        )
        # a NULL or wrong-dim embedding has no mode: it cannot be capped,
        # and fed onward it either crashes the arrow assign or pools into
        # one fake NULL-cluster mode that silently over-drops (review-
        # found r9) — such docs PASS the stage uncapped, like every other
        # stage's row-preserving NULL contract
        dim = len(centroids[0])
        modeless = surv_emb.filter(
            F.col(vector_col).isNull() | (F.size(vector_col) != dim)
        ).select(id_col)
        kept_div = (
            diversity_sample(
                surv_emb.filter(
                    F.col(vector_col).isNotNull()
                    & (F.size(vector_col) == dim)
                ),
                centroids,
                cap,
                vector_col=vector_col,
                id_col=id_col,
            )
            .filter(F.col("kept"))
            .select(id_col)
            .unionByName(modeless)
        )
        out = out.join(kept_div, id_col, "left_semi").localCheckpoint(eager=False)
        _note("diversity", out)

    if dsir is not None:
        from jsonify2ai_spark.operators.sampling import (
            _BUCKETS,
            calibrate_dsir_cutoff,
            dsir_weights,
            sample_hash,
        )

        target, keep_frac = dsir
        # weights read the survivors; the semi-join below reads them
        # again — the boundary-checkpoint rule
        out = out.localCheckpoint(eager=False)
        w = dsir_weights(
            out, target, buckets=dsir_buckets,
            text_col=text_col, id_col=id_col,
        ).localCheckpoint(eager=False)
        cutoff = calibrate_dsir_cutoff(w, keep_frac, id_col=id_col)
        # the resample key verbatim (dsir_resample's arithmetic): md5
        # uniform, 4dp-rounded — deterministic selection, ties keep all
        u = (sample_hash(F.col(id_col), "dsir-v1") + F.lit(0.5)) / F.lit(
            float(_BUCKETS)
        )
        key = F.round(
            F.col("log_weight") - F.log(-F.log(u)), 4
        ) + F.lit(0.0)
        keep_ids = w.filter(key >= F.lit(cutoff)).select(id_col)
        out = out.join(keep_ids, id_col, "left_semi").localCheckpoint(
            eager=False
        )
        _note("dsir", out)

    if redact:
        out = redact_pii(with_pii_counts(out, text_col=text_col), text_col=text_col)
        out = out.drop(text_col).withColumnRenamed("text_redacted", text_col)
        _note("redact", out)

    if pack_budget:
        sized = out.withColumn("n_chars", F.length(text_col).cast("bigint"))
        out = pack_sequences(
            sized, budget=pack_budget, size_col="n_chars",
            id_col=id_col, n_groups=pack_groups,
        )
    return out


def prep_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **prep_kwargs,
) -> DataFrame:
    """The prep run's REPORT CARD (r11 verdict #3): one row per enabled
    :func:`prepare_training_corpus` stage with the survival counters a
    100 TB run is explained by after the fact — ``rows_out`` /
    ``chars_out`` / ``tokens_out`` surviving the stage and
    ``rows_dropped`` vs the previous stage. The reference's analog is
    the ingest summary card (worker/app/routers/status.py:50-91:
    counts-by-kind after a run); this is that idea applied to the
    training-prep chain, whose numbers every stage already computes.

    Scale shape: the audited frames are the chain's own lazily
    checkpointed stage boundaries, so ONE action over the unioned
    aggregates materializes each boundary once (the chain's normal
    cost) plus a per-stage partial-aggregated count — no collect, no
    second pipeline run. The report itself is stage-count-sized; the
    ordered window that derives ``rows_dropped`` runs on that ~9-row
    frame, never on data.
    """
    audit: list = []
    prepare_training_corpus(
        docs, id_col=id_col, text_col=text_col, audit=audit, **prep_kwargs
    )
    return _stage_counters(audit, text_col)


def _stage_counters(audit: list, text_col: str) -> DataFrame:
    """(stage, frame) audit pairs -> the per-stage counter frame: one
    partial-aggregated count per boundary, unioned, with the lag-window
    rows_dropped derived on the stage-count-sized result."""
    from jsonify2ai_spark.functions.text import tokens

    parts = []
    for i, (stage, frame) in enumerate(audit):
        parts.append(
            frame.agg(
                F.count(F.lit(1)).cast("bigint").alias("rows_out"),
                F.coalesce(F.sum(F.length(text_col)), F.lit(0))
                .cast("bigint")
                .alias("chars_out"),
                F.coalesce(F.sum(F.size(tokens(text_col))), F.lit(0))
                .cast("bigint")
                .alias("tokens_out"),
            ).select(
                F.lit(i).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                "rows_out",
                "chars_out",
                "tokens_out",
            )
        )
    rep = parts[0]
    for p_ in parts[1:]:
        rep = rep.unionByName(p_)
    w = Window.orderBy("stage_idx")
    return rep.withColumn(
        "rows_dropped",
        F.coalesce(F.lag("rows_out").over(w) - F.col("rows_out"), F.lit(0))
        .cast("bigint"),
    )


def prepare_incremental_batch(
    batch: DataFrame,
    corpus: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    method: str = "lsh",
    gate=None,
    **prep_kwargs,
) -> DataFrame:
    """The append-only variant: prepare an incoming BATCH for appending to
    an already-prepared corpus.

    1. :func:`prepare_training_corpus` runs on the batch alone (quality /
       repetition / batch-internal dedup / PII — everything that needs no
       corpus context; packing is disabled, the corpus's packer owns bins).
    2. The corpus-side near-dup check drops batch docs with a jaccard >=
       threshold near-duplicate already in the corpus — the step neither
       full-corpus pass covers. Two forms:

       - ``corpus=``: per-call ``dedup_against`` — rebuilds the corpus's
         shingle artifacts EVERY call, so cost is corpus-linear
         (bench_pipeline_scale measured 43 s -> 165 s for 4k-batch calls
         as the corpus grew 400k -> 1.6M). Right for one-shot jobs and
         the oracle twin (``method="exact"`` is the oracle-grade join).
       - ``gate=``: a prebuilt :class:`~jsonify2ai_spark.streaming.
         windowed.CorpusNearDupGate` — the corpus postings are built ONCE
         at gate construction and every batch pays batch-proportional
         cost (the measured-flat grid in PERF.md). The deployment shape
         for a standing ingest loop; candidates are the exact posting
         join, so decisions match ``method="exact"`` (test-pinned; an
         un-df_capped gate — a df_cap trades candidate recall for
         boilerplate safety exactly as in the batch operators).

    Returns the prepared, corpus-deduped batch rows — append them and run
    packing on the combined corpus's schedule.

    Note on ``diversity=`` in ``prep_kwargs``: it flows to
    :func:`prepare_training_corpus` and caps modes WITHIN THIS BATCH
    only — each call starts a fresh budget. For a cross-batch budget
    (the standing-ingest semantics) use :class:`~jsonify2ai_spark.
    streaming.windowed.DiversityCapGate`, whose driver-side state
    carries admitted counts across batches.
    """
    from jsonify2ai_spark.operators.dedup import dedup_against

    if (corpus is None) == (gate is None):
        raise ValueError("pass exactly one of corpus= or gate=")
    prep_kwargs.setdefault("pack_budget", None)
    prepped = prepare_training_corpus(
        batch, id_col=id_col, text_col=text_col, **prep_kwargs
    ).localCheckpoint(eager=False)
    audit = prep_kwargs.get("audit")
    if gate is not None:
        kept = gate.filter_batch(prepped)
        if audit is not None:
            audit.append(("corpus_dedup", kept))
        return kept
    verdict = dedup_against(
        prepped, corpus, threshold,
        text_col=text_col, id_col=id_col, method=method,
    )
    kept = prepped.join(
        verdict.filter(F.col("kept")).select(id_col), id_col, "left_semi"
    )
    if audit is not None:
        audit.append(("corpus_dedup", kept))
    return kept


def corpus_to_token_shards(
    docs: DataFrame,
    out_dir: str,
    num_merges: int = 200,
    merge_batch: int = 1,
    exact: bool = True,
    vocab_min_count: int = 1,
    max_vocab: int | None = None,
    budget: int = 2048,
    n_groups: int = 32,
    assemble: bool = False,
    eos_id: int | None = None,
    pad_id: int = 0,
    oov: str | int = "drop",
    lowercase: bool = True,
    prep: dict | None = None,
    shuffle_seed: int | None = None,
    boundaries: bool = False,
    report: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Raw corpus -> trainer-loadable packed token-ID shards, one call —
    the full pretraining data path (r9). No reference anchor: the
    reference's pipeline stops at JSONL export
    (worker/app/routers/export.py:62-160); this is the north-star
    generalization's final step. Composition: optional
    :func:`prepare_training_corpus` cleanup, :func:`~jsonify2ai_spark.
    operators.bpe.train_bpe` on the prepared text, :func:`~jsonify2ai_spark.
    operators.textstats.build_vocab` over the trained encoder's own output
    (so every subword has an id and ``oov`` only ever sees drift), then the
    packed-shard write. The tokenizer artifacts (merges + vocab) persist
    under ``<out_dir>/tokenizer/`` and the shards under
    ``<out_dir>/shards/`` so the output directory is self-describing —
    :func:`load_tokenizer` reads them back for encoding NEW text with the
    same inventory (the serving path).

    ``prep`` = kwargs forwarded to :func:`prepare_training_corpus`
    (``None`` skips cleanup entirely; ``{}`` runs the defaults). The prep
    stage's own text packing is disabled by default here — packing happens
    on TOKEN counts downstream, the budget a trainer actually means.

    Scale shape: the prepared (id, text) frame is lazily checkpointed
    because two consumers read it (BPE pair counting and encoding) —
    without it the whole dedup chain would re-run per consumer. The ENCODED frame is also lazily checkpointed so the corpus
    is rank-loop encoded exactly ONCE (vocab count + id lookup + shard
    rows all read the same materialization — a naive
    ``write_token_shards(prepared, ...)`` chain pays the encode twice,
    which at 100 TB is the dominant cost). Everything after the encode is
    the q116/q117 shape: broadcast-vocab Arrow lookup (zero shuffles),
    one group-keyed pack shuffle, one bin-keyed assembly aggregate, one
    repartitioned write.
    """
    import os

    from jsonify2ai_spark.operators.bpe import (
        bpe_encode_fast,
        tokens_to_ids,
        train_bpe,
    )
    from jsonify2ai_spark.operators.textstats import build_vocab
    from jsonify2ai_spark.sinks.export import _pack_and_write_ids

    spark = docs.sparkSession
    prepared = docs
    prep_audit: list = []
    if prep is not None:
        kw = dict(prep)
        kw.setdefault("pack_budget", None)
        if report:
            kw["audit"] = prep_audit
        prepared = prepare_training_corpus(
            docs, id_col=id_col, text_col=text_col, **kw
        )
    prepared = prepared.select(id_col, text_col).localCheckpoint(eager=False)

    merges = train_bpe(
        prepared,
        num_merges=num_merges,
        text_col=text_col,
        lowercase=lowercase,
        merge_batch=merge_batch,
        exact=exact,
    )
    enc = bpe_encode_fast(
        prepared, merges, text_col=text_col, out_col="_bpe_toks",
        lowercase=lowercase,
    ).localCheckpoint(eager=False)
    vocab = build_vocab(
        enc,
        min_count=vocab_min_count,
        max_vocab=max_vocab,
        token_array_col="_bpe_toks",
    )

    tok_dir = os.path.join(out_dir, "tokenizer")
    local_rows_df(
        spark,
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    ).write.mode("overwrite").parquet(
        os.path.join(tok_dir, "merges.parquet")
    )
    vocab.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tok_dir, "vocab.parquet")
    )
    # read the persisted vocab back so the id lookup and the artifact are
    # the same rows by construction (vocab is tokenizer-sized, the reread
    # is negligible; the alternative — two evaluations of the rank plan —
    # is also fine but leaves nothing pinning artifact == lookup)
    vocab_saved = spark.read.parquet(os.path.join(tok_dir, "vocab.parquet"))

    ids = tokens_to_ids(
        enc, vocab_saved, tokens_col="_bpe_toks", out_col="token_ids",
        oov=oov, id_col=id_col,
    )
    if report:
        # the id frame gets two consumers (the shard write and the token
        # counter) — same one-materialization rule as the encode above
        ids = ids.localCheckpoint(eager=False)

    # the packing weight (+eos when assembling) derives inside the shared
    # helper — the one home of the weight rule
    manifest = _pack_and_write_ids(
        ids,
        os.path.join(out_dir, "shards"),
        budget=budget,
        id_col=id_col,
        n_groups=n_groups,
        assemble=assemble,
        eos_id=eos_id,
        pad_id=pad_id,
        shuffle_seed=shuffle_seed,
        boundaries=boundaries,
    )
    result = {
        **manifest,
        "tokenizer_dir": tok_dir,
        "num_merges": len(merges),
        "vocab_size": vocab_saved.count(),
        "config": {
            "budget": budget,
            "n_groups": n_groups,
            "assemble": assemble,
            "id_col": id_col,
            "eos_id": eos_id,
            "pad_id": pad_id,
            "oov": oov,
            "lowercase": lowercase,
            "shuffle_seed": shuffle_seed,
            "boundaries": boundaries,
            "vocab_min_count": vocab_min_count,
            "max_vocab": max_vocab,
            "prep": prep is not None,
        },
    }
    if report:
        # the run-report card (r11 verdict #3): token-level conservation
        # for the encode->id->shard leg, plus the prep chain's per-stage
        # survival counters when prep ran. All counts read the already-
        # checkpointed frames; the collect is stage-count-sized.
        tokens_encoded = int(
            enc.agg(
                F.coalesce(F.sum(F.size("_bpe_toks")), F.lit(0))
            ).collect()[0][0]
        )
        token_ids_out = int(
            ids.agg(
                F.coalesce(F.sum(F.size("token_ids")), F.lit(0))
            ).collect()[0][0]
        )
        result["report"] = {
            "docs_in": docs.count(),
            "docs_prepared": prepared.count(),
            "tokens_encoded": tokens_encoded,
            "token_ids_out": token_ids_out,
            # with oov='drop' this is exactly the ids the vocab cap cut;
            # under an <unk> policy substitution keeps the counts equal
            "oov_dropped": tokens_encoded - token_ids_out,
            "prep_stages": [
                row.asDict()
                for row in _stage_counters(prep_audit, text_col)
                .orderBy("stage_idx")
                .collect()
            ]
            if prep_audit
            else [],
        }
    # persist the run manifest so the output directory is fully
    # self-describing (the export sinks' manifest convention): a trainer
    # or a later load_tokenizer caller can read counts + config without
    # the driver that produced them. Atomic (tmp + os.replace, r10): a
    # reader never sees a half-written manifest. NOTE the manifest and
    # increment sidecars go through driver-local open() while the parquet
    # goes through Spark writers — ``out_dir`` must therefore be a path
    # the DRIVER can write with ordinary file IO (local disk, NFS, a
    # fuse-mounted bucket); a raw hdfs:// or s3a:// out_dir would land
    # the shards but fail the manifest (r9 advisor).
    os.makedirs(out_dir, exist_ok=True)
    _write_json_atomic(os.path.join(out_dir, "manifest.json"), result)
    return result


def sft_to_token_shards(
    msgs: DataFrame,
    out_dir: str,
    num_merges: int = 200,
    merge_batch: int = 1,
    exact: bool = True,
    vocab_min_count: int = 1,
    max_vocab: "int | None" = None,
    budget: int = 2048,
    n_groups: int = 32,
    pad_id: int = 0,
    lowercase: bool = True,
    shuffle_seed: "int | None" = None,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "text",
    mask_role: str = "assistant",
) -> dict:
    """Chat conversations -> trainer-loadable SFT shards, one call — the
    :func:`corpus_to_token_shards` recipe for instruction data: train
    the tokenizer on the RENDERED turn texts (headers become in-
    inventory tokens), build conversation-level samples with
    position-aligned loss masks (:func:`~jsonify2ai_spark.operators.
    sft.sft_token_samples`), map to ids under the UNK policy (never
    'drop' — it would shift the mask, the sft module's pinned
    contract), pack whole conversations, and assemble bins whose
    ``loss_mask`` rides ``input_ids`` with 0 at eos/padding. The output
    directory carries the same tokenizer artifacts + manifest.json the
    token-shard family uses — :func:`read_token_shards` loads it.

    Reserved ids are MINTED past the vocabulary: ``unk_id =
    vocab_size + 1``, ``eos_id = vocab_size + 2`` (recorded in the
    manifest config) — :func:`~jsonify2ai_spark.operators.textstats.
    build_vocab` assigns 1-BASED ids spanning ``[1, vocab_size]``, so
    ``vocab_size`` itself IS a real token's id (the least-frequent
    in-vocab token; an earlier ``unk_id = vocab_size`` silently aliased
    every novel subword to it in trainer shards — r12 advisor, high).
    A caller-supplied eos of 0 would likewise collide under a 0-based
    scheme, the trap the explicit past-the-inventory mint avoids.
    Pre-fix stores keep working: :func:`append_sft_shards` reads these
    ids from the store manifest, never re-derives them. The base run has
    zero UNKs by construction (the vocab is built from the samples'
    own tokens) unless ``max_vocab`` caps it; UNK substitution then
    preserves alignment where a drop could not.
    """
    import os

    from jsonify2ai_spark.operators.bpe import tokens_to_ids, train_bpe
    from jsonify2ai_spark.operators.sft import sft_token_samples
    from jsonify2ai_spark.operators.textstats import build_vocab
    from jsonify2ai_spark.sinks.export import _pack_and_write_ids

    spark = msgs.sparkSession
    turn_frame = msgs.select(
        F.col(conv_col).alias("doc_id"),
        F.concat(
            F.lit("<|"), F.col(role_col), F.lit("|> "),
            F.coalesce(F.col(content_col), F.lit("")),
        ).alias("text"),
    )
    merges = train_bpe(
        turn_frame, num_merges=num_merges, lowercase=lowercase,
        merge_batch=merge_batch, exact=exact,
    )
    sample = sft_token_samples(
        msgs, merges,
        conv_col=conv_col, turn_col=turn_col, role_col=role_col,
        content_col=content_col, mask_role=mask_role, lowercase=lowercase,
    ).localCheckpoint(eager=False)
    vocab = build_vocab(
        sample, min_count=vocab_min_count, max_vocab=max_vocab,
        token_array_col="bpe_tokens",
    )

    tok_dir = os.path.join(out_dir, "tokenizer")
    local_rows_df(
        spark,
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    ).write.mode("overwrite").parquet(
        os.path.join(tok_dir, "merges.parquet")
    )
    vocab.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tok_dir, "vocab.parquet")
    )
    vocab_saved = spark.read.parquet(os.path.join(tok_dir, "vocab.parquet"))
    vocab_size = vocab_saved.count()
    # ids are 1-based [1, vocab_size] (build_vocab's row_number), so the
    # first free id is vocab_size + 1 — NOT vocab_size, which is the
    # least-frequent real token's id (r12 advisor, high severity)
    unk_id, eos_id = vocab_size + 1, vocab_size + 2

    ids = tokens_to_ids(
        sample, vocab_saved, tokens_col="bpe_tokens", out_col="token_ids",
        oov=unk_id, id_col=conv_col,
    )
    manifest = _pack_and_write_ids(
        ids,
        os.path.join(out_dir, "shards"),
        budget=budget,
        id_col=conv_col,
        n_groups=n_groups,
        assemble=True,
        eos_id=eos_id,
        pad_id=pad_id,
        shuffle_seed=shuffle_seed,
        boundaries=True,
        mask_col="loss_mask",
    )
    result = {
        **manifest,
        "tokenizer_dir": tok_dir,
        "num_merges": len(merges),
        "vocab_size": vocab_size,
        "config": {
            "budget": budget,
            "n_groups": n_groups,
            "assemble": True,
            "eos_id": eos_id,
            "unk_id": unk_id,
            "pad_id": pad_id,
            "oov": unk_id,
            "lowercase": lowercase,
            "shuffle_seed": shuffle_seed,
            "boundaries": True,
            "vocab_min_count": vocab_min_count,
            "max_vocab": max_vocab,
            "sft": True,
            "mask_role": mask_role,
            "prep": False,
        },
    }
    os.makedirs(out_dir, exist_ok=True)
    _write_json_atomic(os.path.join(out_dir, "manifest.json"), result)
    return result


def append_sft_shards(
    msgs: DataFrame,
    out_dir: str,
    run_id: str,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "text",
) -> dict:
    """Incremental counterpart of :func:`sft_to_token_shards`: NEW
    conversations encode under the run's FROZEN tokenizer and mask
    config and land as a masked increment at
    ``shards_incr/<run_id>/`` — :func:`append_token_shards`' exact
    durability discipline (sidecar-then-manifest, idempotent re-run,
    compacted-run_id guard), with the SFT additions frozen from the
    manifest: mask_role, minted unk/eos ids, budget/groups/pad. UNK
    drift surfaces the same way the token store's does (novel subwords
    substitute, never drop — alignment is the contract)."""
    import json
    import os

    from jsonify2ai_spark.operators.bpe import tokens_to_ids
    from jsonify2ai_spark.operators.sft import sft_token_samples
    from jsonify2ai_spark.sinks.export import _pack_and_write_ids

    man_path = os.path.join(out_dir, "manifest.json")
    with open(man_path, encoding="utf-8") as fh:
        manifest = json.load(fh)
    cfg = manifest["config"]
    if not cfg.get("sft"):
        raise ValueError(
            "append_sft_shards: not an SFT store (manifest config lacks "
            "sft=True) — use append_token_shards for text stores"
            + (" (this one is a DPO store)" if cfg.get("dpo") else "")
        )
    if str(run_id) in manifest.get("compacted_runs", []):
        raise ValueError(
            f"append_sft_shards: run_id {run_id!r} was already folded "
            "into the base by compact_token_shards — increments need "
            "fresh run_ids after a compaction"
        )
    spark = msgs.sparkSession
    merges, vocab = load_tokenizer(spark, out_dir)
    sample = sft_token_samples(
        msgs, merges,
        conv_col=conv_col, turn_col=turn_col, role_col=role_col,
        content_col=content_col, mask_role=cfg["mask_role"],
        lowercase=bool(cfg["lowercase"]),
    )
    ids = tokens_to_ids(
        sample, vocab, tokens_col="bpe_tokens", out_col="token_ids",
        oov=int(cfg["unk_id"]), id_col=conv_col,
    )
    sub = os.path.join(out_dir, "shards_incr", str(run_id))
    m = _pack_and_write_ids(
        ids,
        sub,
        budget=int(cfg["budget"]),
        id_col=conv_col,
        n_groups=int(cfg["n_groups"]),
        assemble=True,
        eos_id=int(cfg["eos_id"]),
        pad_id=int(cfg["pad_id"]),
        shuffle_seed=cfg.get("shuffle_seed"),
        boundaries=True,
        mask_col="loss_mask",
    )
    _write_json_atomic(
        os.path.join(sub, "_increment.json"),
        {"run_id": str(run_id), "rows": m["rows"]},
    )
    with open(man_path, encoding="utf-8") as fh:
        manifest = json.load(fh)
    manifest.setdefault("increments", {})[str(run_id)] = m["rows"]
    _write_json_atomic(man_path, manifest)
    return {**m, "run_id": str(run_id)}


def dpo_to_token_shards(
    pairs: DataFrame,
    out_dir: str,
    num_merges: int = 200,
    merge_batch: int = 1,
    exact: bool = True,
    vocab_min_count: int = 1,
    max_vocab: "int | None" = None,
    n_groups: int = 32,
    lowercase: bool = True,
    pair_col: str = "prompt_id",
    prompt_text_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
) -> dict:
    """Preference pairs -> trainer-loadable DPO shards, one call — the
    :func:`sft_to_token_shards` recipe for preference data: train the
    tokenizer on the pairs' own rendered turn texts (prompt + BOTH
    responses — the policy and reference models see both sides), build
    paired token samples with position-aligned per-side loss masks
    (:func:`~jsonify2ai_spark.operators.sft.dpo_token_samples`), mint a
    vocabulary over the union of both sides' tokens, map each side to
    ids under the UNK-substitution policy (never 'drop' — the sft
    module's pinned alignment contract), and land one ROW PER PAIR —
    DPO's loss is pairwise, so rows stay unpacked (no eos/packing
    machinery; a trainer batches whole pairs). The output directory
    carries the token-shard family's tokenizer artifacts + manifest.json
    and loads through :func:`read_token_shards`.

    Reserved id: ``unk_id = vocab_size + 1`` — build_vocab ids are
    1-based [1, V], so V itself is a real token's id (the r12-advisor
    collision, minted correctly here from birth).

    Scale shape: one BPE train over 3 rows/pair, dpo_token_samples' two
    Arrow passes + pivot (lazily checkpointed — the vocab count and two
    id lookups all read one materialization), two broadcast-vocab Arrow
    id lookups (zero shuffles), one group-keyed write."""
    import os

    from jsonify2ai_spark.multimodal.shards import _media_group
    from jsonify2ai_spark.operators.bpe import tokens_to_ids, train_bpe
    from jsonify2ai_spark.operators.sft import dpo_token_samples
    from jsonify2ai_spark.operators.textstats import build_vocab

    spark = pairs.sparkSession
    turn_frame = pairs.select(
        F.col(pair_col).cast("string").alias("doc_id"),
        F.explode(
            F.array(
                F.concat(F.lit("<|user|> "), F.coalesce(F.col(prompt_text_col), F.lit(""))),
                F.concat(F.lit("<|assistant|> "), F.coalesce(F.col(chosen_col), F.lit(""))),
                F.concat(F.lit("<|assistant|> "), F.coalesce(F.col(rejected_col), F.lit(""))),
            )
        ).alias("text"),
    )
    merges = train_bpe(
        turn_frame, num_merges=num_merges, lowercase=lowercase,
        merge_batch=merge_batch, exact=exact,
    )
    sample = dpo_token_samples(
        pairs, merges,
        pair_col=pair_col, prompt_text_col=prompt_text_col,
        chosen_col=chosen_col, rejected_col=rejected_col,
        lowercase=lowercase,
    ).localCheckpoint(eager=False)
    vocab = build_vocab(
        sample.select(
            F.concat("chosen_tokens", "rejected_tokens").alias("_all")
        ),
        min_count=vocab_min_count, max_vocab=max_vocab,
        token_array_col="_all",
    )

    tok_dir = os.path.join(out_dir, "tokenizer")
    local_rows_df(
        spark,
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    ).write.mode("overwrite").parquet(
        os.path.join(tok_dir, "merges.parquet")
    )
    vocab.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tok_dir, "vocab.parquet")
    )
    vocab_saved = spark.read.parquet(os.path.join(tok_dir, "vocab.parquet"))
    vocab_size = vocab_saved.count()
    unk_id = vocab_size + 1

    ids = tokens_to_ids(
        sample, vocab_saved, tokens_col="chosen_tokens",
        out_col="chosen_ids", oov=unk_id, id_col=pair_col,
    )
    ids = tokens_to_ids(
        ids, vocab_saved, tokens_col="rejected_tokens",
        out_col="rejected_ids", oov=unk_id, id_col=pair_col,
    )
    rows_df = ids.select(
        F.col(pair_col),
        "chosen_ids",
        "chosen_mask",
        "rejected_ids",
        "rejected_mask",
        "n_chosen_tokens",
        "n_rejected_tokens",
        _media_group(F.col(pair_col), n_groups).alias("pack_group"),
    ).localCheckpoint(eager=False)
    (
        rows_df.repartition(F.col("pack_group"))
        .sortWithinPartitions("pack_group", pair_col)
        .write.mode("overwrite")
        .partitionBy("pack_group")
        .parquet(os.path.join(out_dir, "shards"))
    )
    n_rows = rows_df.count()
    result = {
        "out_dir": out_dir,
        "rows": n_rows,
        "groups": n_groups,
        "tokenizer_dir": tok_dir,
        "num_merges": len(merges),
        "vocab_size": vocab_size,
        "config": {
            "dpo": True,
            "n_groups": n_groups,
            "unk_id": unk_id,
            "oov": unk_id,
            "lowercase": lowercase,
            "vocab_min_count": vocab_min_count,
            "max_vocab": max_vocab,
            "pair_col": pair_col,
            "prep": False,
        },
    }
    os.makedirs(out_dir, exist_ok=True)
    _write_json_atomic(os.path.join(out_dir, "manifest.json"), result)
    return result


def _write_json_atomic(path: str, obj: dict) -> None:
    """Write ``obj`` as JSON via a same-directory temp file + fsync +
    ``os.replace`` (atomic on POSIX): a crash mid-write can never leave a
    torn file at ``path``, and the last replace wins whole under
    concurrent writers (r9 verdict 'What's wrong #1'). The fsync pair —
    data before the replace, directory after (r10 advisor) — extends the
    guarantee from process crashes to power loss/OS crash: without it
    some filesystems may persist the rename before the data, leaving an
    empty or torn file at ``path``. Concurrency contract for the shard
    manifest specifically: last-writer-wins means a racing append can
    still LOSE its ``increments`` entry — which is why increments are
    additionally self-describing on disk (``_increment.json`` sidecars)
    and :func:`read_token_shards` derives the increment list from the
    LISTING with the manifest as a cross-checked cache, so a lost
    manifest entry degrades to nothing (the loader still sees the run)."""
    import json
    import os
    import tempfile

    d = os.path.dirname(path) or "."
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".manifest-", suffix=".tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            json.dump(obj, fh, indent=2, sort_keys=True)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)
        # make the rename itself durable (the directory entry)
        dfd = os.open(d, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def load_tokenizer(spark, out_dir: str):
    """Read back the (merges, vocab) artifacts written by
    :func:`corpus_to_token_shards` — feed them to :func:`~jsonify2ai_spark.
    operators.bpe.tokenize_to_ids` to encode NEW text with the SAME
    inventory (the serving/incremental path; ``oov`` then handles genuine
    drift). ``out_dir`` is the composition's output root or the
    ``tokenizer/`` directory itself."""
    import os

    tok_dir = out_dir
    if not os.path.basename(os.path.normpath(out_dir)) == "tokenizer":
        tok_dir = os.path.join(out_dir, "tokenizer")
    merges_df = spark.read.parquet(os.path.join(tok_dir, "merges.parquet"))
    merges = [
        (r["left"], r["right"])
        for r in merges_df.orderBy("rank").collect()
    ]
    vocab = spark.read.parquet(os.path.join(tok_dir, "vocab.parquet"))
    return merges, vocab


def append_token_shards(
    new_docs: DataFrame,
    out_dir: str,
    run_id: str,
    prep: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Incremental counterpart of :func:`corpus_to_token_shards` (r9; no
    reference anchor — the reference's incremental path is the watcher
    re-upsert loop, worker/app/routers/export.py stops at JSONL):
    encode NEW documents under the run's FROZEN tokenizer and append
    them as a self-contained increment at
    ``<out_dir>/shards_incr/<run_id>/`` — the standing-ingest batch face
    (the streaming face is :class:`~jsonify2ai_spark.streaming.windowed.
    TokenizeGate`). The tokenizer is NOT retrained (ids must stay stable
    under the trained model; drift surfaces through the run's recorded
    ``oov`` policy) and packing config (budget / groups / assemble /
    eos / boundaries / oov) is read from the run's ``manifest.json`` so
    an increment can never silently diverge from the base run's shard
    shape. ``prep`` forwards to :func:`prepare_training_corpus` for the
    batch's own cleanup (corpus-context dedup against the BASE corpus is
    the caller's step — :func:`prepare_incremental_batch`).

    Each increment is keyed by ``run_id`` (re-running the same id
    overwrites it — idempotent re-ingest); the manifest gains an
    ``increments`` map of run_id -> rows. Scale shape: identical to the
    base run's post-encode path (frozen-vocab Arrow lookup, one pack
    shuffle, partitioned write), over the increment only.

    Durability contract (r10, r9 verdict 'What's wrong #1'): the
    increment directory is made self-describing by an
    ``_increment.json`` sidecar ({run_id, rows}) written AFTER the
    shard parquet lands, and the manifest update is atomic
    (tmp + ``os.replace``). Crash windows, in order: before the sidecar
    -> the directory has no sidecar, so :func:`read_token_shards`
    ignores it and an idempotent re-run of the same ``run_id`` heals it;
    between sidecar and manifest -> the loader still sees the increment
    (it derives the list from the directory LISTING, the manifest is a
    cross-checked cache); mid-manifest-write -> impossible to observe
    (atomic replace). Two CONCURRENT appends with distinct run_ids both
    survive for the same reason — the loser of the manifest
    read-modify-write race loses only the cache entry, never the data.
    Concurrent appends with the SAME run_id are undefined (two writers
    overwriting one directory) — that is the single-writer-per-run_id
    contract, the natural keying of an ingest scheduler.
    """
    import json
    import os

    from jsonify2ai_spark.operators.bpe import tokenize_to_ids
    from jsonify2ai_spark.sinks.export import _pack_and_write_ids

    man_path = os.path.join(out_dir, "manifest.json")
    with open(man_path, encoding="utf-8") as fh:
        manifest = json.load(fh)
    cfg = manifest["config"]
    if cfg.get("sft"):
        raise ValueError(
            "append_token_shards: this store holds SFT samples (loss "
            "masks ride every bin) — a text-shaped append would land "
            "maskless rows the loader cannot union; use "
            "append_sft_shards(msgs, ...) instead"
        )
    if cfg.get("dpo"):
        raise ValueError(
            "append_token_shards: this store holds DPO pair rows "
            "(paired per-side ids + masks) — a text-shaped append "
            "would land rows the loader cannot union"
        )
    if str(run_id) in manifest.get("compacted_runs", []):
        # the run's rows were folded into the compacted base and its
        # directory may still exist as post-crash garbage the loader
        # ignores — re-using the id would write rows the loader then
        # (correctly) refuses to see
        raise ValueError(
            f"append_token_shards: run_id {run_id!r} was already folded "
            "into the base by compact_token_shards — increments need "
            "fresh run_ids after a compaction"
        )

    spark = new_docs.sparkSession
    merges, vocab = load_tokenizer(spark, out_dir)

    prepared = new_docs
    if prep is not None:
        kw = dict(prep)
        kw.setdefault("pack_budget", None)
        prepared = prepare_training_corpus(
            new_docs, id_col=id_col, text_col=text_col, **kw
        )
    prepared = prepared.select(id_col, text_col)

    oov = cfg["oov"]
    sub = os.path.join(out_dir, "shards_incr", str(run_id))
    m = _pack_and_write_ids(
        tokenize_to_ids(
            prepared,
            merges,
            vocab,
            text_col=text_col,
            id_col=id_col,
            oov=int(oov) if isinstance(oov, int) else oov,
            lowercase=bool(cfg["lowercase"]),
        ),
        sub,
        budget=int(cfg["budget"]),
        id_col=id_col,
        n_groups=int(cfg["n_groups"]),
        assemble=bool(cfg["assemble"]),
        eos_id=cfg["eos_id"],
        pad_id=int(cfg["pad_id"]),
        shuffle_seed=cfg.get("shuffle_seed"),
        boundaries=bool(cfg.get("boundaries", False)),
    )
    # sidecar FIRST (the increment becomes self-describing the moment its
    # parquet is complete), manifest cache second, atomically — see the
    # docstring's crash-window walk
    _write_json_atomic(
        os.path.join(sub, "_increment.json"),
        {"run_id": str(run_id), "rows": m["rows"]},
    )
    # re-read the manifest AFTER the shard write so a concurrent append
    # that committed meanwhile is less likely to be overwritten (the
    # listing-derived loader makes even a lost entry harmless)
    with open(man_path, encoding="utf-8") as fh:
        manifest = json.load(fh)
    manifest.setdefault("increments", {})[str(run_id)] = m["rows"]
    _write_json_atomic(man_path, manifest)
    return {**m, "run_id": str(run_id)}


def _discover_increments(out_dir: str, manifest: dict) -> list:
    """The increment list a loader should trust: derived from the
    ``shards_incr/*/_increment.json`` LISTING (each complete increment is
    self-describing — the sidecar lands only after its parquet), with the
    manifest's ``increments`` map as a cross-checked cache (r10, r9
    verdict 'What's wrong #1'). Sorted (run_id) union of both sources:

    - listed + cached          -> normal; sidecar rows are authoritative
    - listed, NOT cached       -> a crash between sidecar and manifest
                                  write, or a lost concurrent-append race
                                  entry — the data is whole, load it
    - cached, NOT listed       -> the directory (or its sidecar) is GONE
                                  while the manifest claims rows: real
                                  data loss, raise — never silently skip
    - directory, no sidecar    -> torn shard write (crashed before the
                                  sidecar): invisible here; re-running
                                  the same run_id heals it
    - run_id in compacted_runs -> its rows already live in the compacted
                                  base; a leftover directory is
                                  post-crash garbage cleanup — skip it
    """
    import json
    import os

    folded = set(manifest.get("compacted_runs", []))
    cached = {
        str(k): int(v) for k, v in manifest.get("increments", {}).items()
    }
    incr_root = os.path.join(out_dir, "shards_incr")
    listed: dict[str, int] = {}
    if os.path.isdir(incr_root):
        for rid in os.listdir(incr_root):
            side = os.path.join(incr_root, rid, "_increment.json")
            if not os.path.isfile(side):
                continue
            with open(side, encoding="utf-8") as fh:
                listed[rid] = int(json.load(fh)["rows"])
    missing = set(cached) - set(listed) - folded
    if missing:
        raise ValueError(
            "read_token_shards: manifest records increments "
            f"{sorted(missing)} but their directories/sidecars are gone — "
            "data loss, not a stale cache (a compaction would have moved "
            "them to compacted_runs)"
        )
    return [
        (rid, os.path.join(incr_root, rid), rows)
        for rid, rows in sorted(listed.items())
        if rid not in folded
    ]


def _balanced_union(dfs: list) -> DataFrame:
    """Pairwise-balanced unionByName: plan depth O(log n) in the part
    count instead of the linear chain's O(n) (r9 verdict 'What's wrong
    #2' — at hundreds of increments the linear chain's analysis cost
    dominates load planning)."""
    while len(dfs) > 1:
        dfs = [
            dfs[i].unionByName(dfs[i + 1]) if i + 1 < len(dfs) else dfs[i]
            for i in range(0, len(dfs), 2)
        ]
    return dfs[0]


def read_token_shards(
    spark,
    out_dir: str,
    include_increments: bool = True,
    validate: bool = False,
) -> DataFrame:
    """Load a :func:`corpus_to_token_shards` run for training: the base
    shards unioned with every :func:`append_token_shards` increment,
    each row tagged ``_source_run`` (``'base'`` or the increment's
    run_id) so a trainer can weight, exclude, or ablate increments
    without path games. The increment list is derived from the on-disk
    sidecar LISTING with the manifest as a cross-checked cache (see
    :func:`_discover_increments` — a crash or a lost concurrent-append
    manifest entry can therefore never make training data silently
    invisible), and the union is pairwise-balanced (plan depth
    O(log parts)). A base compacted by :func:`compact_token_shards`
    already carries ``_source_run`` as a real column and keeps it.

    Lazy by default; ``validate=True`` counts each part against its
    recorded rows (sidecar for increments, manifest for the base) and
    raises on drift (a torn write or a hand-edited manifest) — one
    count job per part, so leave it off in the hot path and run it in
    the ingest audit."""
    return _read_sharded_store(
        spark, out_dir, include_increments, validate, "read_token_shards"
    )


def _read_sharded_store(
    spark,
    out_dir: str,
    include_increments: bool,
    validate: bool,
    label: str,
) -> DataFrame:
    """The manifest-disciplined loader shared by every shard store in
    this family (token shards, media feature shards): base + sidecar-
    listed increments, ``_source_run`` tags, optional per-part row-count
    validation, pairwise-balanced union."""
    import json
    import os

    with open(os.path.join(out_dir, "manifest.json"), encoding="utf-8") as fh:
        manifest = json.load(fh)

    base_dir = manifest.get("shards_dir", "shards")
    parts = [("base", os.path.join(out_dir, base_dir), manifest["rows"])]
    if include_increments:
        parts += _discover_increments(out_dir, manifest)

    dfs = []
    for rid, path, rows in parts:
        df = spark.read.parquet(path)
        if "_source_run" not in df.columns:
            df = df.withColumn("_source_run", F.lit(rid))
        if validate:
            got = df.count()
            if got != rows:
                raise ValueError(
                    f"{label}: part {rid!r} has {got} rows, "
                    f"recorded {rows} — torn write or stale manifest"
                )
        dfs.append(df)
    # logical purge (r13): pending tombstones apply AFTER the per-part
    # validation counts (the recorded rows are pre-purge by design) and
    # across ALL parts uniformly — a purged document is invisible no
    # matter which part (base, increment, post-purge append) carries it
    return _apply_tombstones(_balanced_union(dfs), manifest)


def compact_token_shards(
    spark, out_dir: str, defer_delete: bool = True
) -> dict:
    """Fold every :func:`append_token_shards` increment into the base
    layout (r10, r9 verdict 'What's missing #2'): after many appends the
    loader unions N parts forever — manifest grows, plan depth grows,
    small files accumulate. Compaction rewrites base + increments as ONE
    group-partitioned layout with ``_source_run`` preserved as a real
    column (provenance survives — :func:`read_token_shards` before ==
    after, row-for-row including the tag) and resets the increment list,
    so load cost returns to a single multi-file scan and the next
    appends start from one.

    Write protocol (stage-and-swap through the manifest, never
    in-place): the folded rows land at a fresh versioned directory
    ``shards_v<k>/`` (overwriting the live ``shards/`` while reading
    from it would be read-under-write corruption), the manifest is then
    atomically replaced to point ``shards_dir`` at it — with
    ``increments`` cleared and the folded run_ids appended to
    ``compacted_runs`` so a half-cleaned ``shards_incr/`` directory can
    never double-count. Crash before the manifest swap: the new
    directory is unreferenced garbage, the old state is intact, a
    re-run redoes the fold. Idempotent: no increments -> no-op.

    Concurrent-reader window (r10 advisor): :func:`read_token_shards`
    is LAZY — a trainer holding a DataFrame built from the pre-swap
    manifest still scans the OLD directories, so deleting them at swap
    time would fail that trainer mid-epoch with FileNotFoundException.
    Default ``defer_delete=True`` therefore only RECORDS the replaced
    directories in the manifest's ``stale_dirs`` ledger; they are
    reclaimed at the START of the NEXT compaction (by which point any
    loader that predates the previous one is assumed done — one full
    compaction cadence of grace, the Iceberg/Delta vacuum convention
    scaled down). ``defer_delete=False`` restores immediate deletion
    for the case the operator KNOWS no loader is active (single-writer
    maintenance window). Either way the loader never lists these
    directories — staleness costs disk, never correctness.

    Scale shape: one balanced-union scan of all parts, one repartition
    on the group key, one partitioned write — no aggregation, no
    driver-side rows. Row totals are cross-checked against the recorded
    counts before the swap (a torn part fails the compaction instead of
    shrinking the corpus).
    """
    return _compact_store(
        spark, out_dir, defer_delete, group_col="pack_group",
        extra_sort=("bin_idx", "doc_id"), label="compact_token_shards",
    )


def compact_media_shards(
    spark, out_dir: str, defer_delete: bool = True
) -> dict:
    """Fold :func:`~jsonify2ai_spark.multimodal.shards.
    append_media_shards` increments into the base media-shard layout —
    the exact :func:`compact_token_shards` protocol (stage-and-swap
    through the manifest, ``compacted_runs`` double-count guard,
    ``defer_delete`` loader grace) over the media layout
    (``media_group`` partitions, id-sorted rows)."""
    return _compact_store(
        spark, out_dir, defer_delete, group_col="media_group",
        extra_sort=("media_id",), label="compact_media_shards",
    )


def purge_shard_store(
    out_dir: str, purged_ids: list, id_col: str | None = None
) -> dict:
    """Right-to-be-forgotten deletion over a shard store (r13) — the
    deletion-vector protocol (the Delta/Iceberg DV idea applied to this
    family's manifest discipline): purging writes a TOMBSTONE ledger
    into the manifest (O(request) driver-side work, no Spark job, no
    data rewrite), every loader applies it immediately (the documents
    vanish from :func:`read_token_shards` / media loads at the next
    action), and PHYSICAL erasure happens at the next compaction —
    which the operator runs on the GDPR deadline's schedule rather
    than per request, so a 100 TB store never rewrites itself once per
    deletion request.

    Works on every store in the family; the manifest config picks the
    application shape:

    - per-document stores (token ``assemble=False``, media feature
      shards): a broadcast anti-join on the id column;
    - assembled stores (packed bins, SFT): the
      :func:`~jsonify2ai_spark.operators.packing.purge_packed_bins`
      boundary re-slice — which REQUIRES ``boundaries=True`` in the
      store config (an assembled store without boundaries cannot
      locate member documents; this raises at purge time, fail-fast,
      rather than at some later read).

    Ids are ledgered AS STRINGS (external deletion requests do not
    know the store's id dtype); repeat purges merge; ``purged_ids`` is
    request-sized by contract. Semantics are store-wide and
    time-forward: the tombstone suppresses the id in EVERY part
    including appends made after the purge, until a compaction
    physically erases and clears the ledger — re-ingesting a purged
    document therefore requires an explicit post-compaction append
    (the conservative reading of a deletion request).
    """
    import json
    import os

    man_path = os.path.join(out_dir, "manifest.json")
    with open(man_path, encoding="utf-8") as fh:
        manifest = json.load(fh)
    cfg = manifest.get("config", {})
    if cfg.get("assemble") and not cfg.get("boundaries"):
        raise ValueError(
            "purge_shard_store: this store holds ASSEMBLED sequences "
            "without boundaries (config boundaries=False) — member "
            "documents cannot be located inside the packed rows; "
            "rebuild the store with boundaries=True to make it purgeable"
        )
    ledger = manifest.get("tombstones") or {}
    want_id = (
        id_col
        or ledger.get("id_col")
        or cfg.get("id_col")      # media stores record it
        or cfg.get("pair_col")    # DPO stores key rows by the pair key
        or "doc_id"
    )
    if ledger and ledger.get("id_col") != want_id:
        raise ValueError(
            f"purge_shard_store: pending tombstones use id_col="
            f"{ledger.get('id_col')!r}, this purge asked for {want_id!r} "
            "— compact the store to apply the pending set first, or "
            "clear_tombstones() to abandon a mis-keyed ledger"
        )
    ids = sorted(set(ledger.get("ids", [])) | {str(x) for x in purged_ids})
    manifest["tombstones"] = {"id_col": want_id, "ids": ids}
    _write_json_atomic(man_path, manifest)
    return {
        "out_dir": out_dir,
        "pending_purge_ids": len(ids),
        "physically_erased": False,
    }


def clear_tombstones(out_dir: str) -> dict:
    """Abandon a store's PENDING tombstone ledger without applying it —
    the recovery path for a purge issued with the wrong ``id_col`` (the
    loader fails fast on a key the rows don't carry, and compaction
    refuses for the same reason, so a mis-keyed ledger would otherwise
    wedge the store). Deliberately NOT part of the normal flow: a
    correct pending purge should be erased by compaction, never
    cleared."""
    import json
    import os

    man_path = os.path.join(out_dir, "manifest.json")
    with open(man_path, encoding="utf-8") as fh:
        manifest = json.load(fh)
    dropped = len((manifest.get("tombstones") or {}).get("ids", []))
    manifest["tombstones"] = None
    _write_json_atomic(man_path, manifest)
    return {"out_dir": out_dir, "cleared_ids": dropped}


def _apply_tombstones(df: DataFrame, manifest: dict) -> DataFrame:
    """Apply a store's pending tombstone ledger to loaded rows — the
    shared logical-purge step of :func:`_read_sharded_store` (read
    path) and :func:`_compact_store` (physical erasure). Per-document
    stores anti-join on the ledger's id column (broadcast — the set is
    request-sized by contract); assembled stores re-slice affected
    bins via :func:`~jsonify2ai_spark.operators.packing.
    purge_packed_bins` under the store's own pad config. No-op when
    the ledger is empty."""
    ledger = manifest.get("tombstones") or {}
    ids = ledger.get("ids", [])
    if not ids:
        return df
    cfg = manifest.get("config", {})
    if cfg.get("assemble"):
        from jsonify2ai_spark.operators.packing import purge_packed_bins

        return purge_packed_bins(
            df,
            ids,
            pad_to=cfg.get("budget"),
            pad_id=int(cfg.get("pad_id", 0)),
        )
    id_col = ledger["id_col"]
    if id_col not in df.columns:
        raise ValueError(
            f"tombstones target id column {id_col!r} which this store's "
            f"rows do not carry (columns: {df.columns}) — re-purge with "
            "the store's real key via purge_shard_store(id_col=...)"
        )
    spark = df.sparkSession
    tomb = local_rows_df(spark, [(i,) for i in ids], "_tomb_id string")
    return df.join(
        F.broadcast(tomb),
        F.col(id_col).cast("string") == F.col("_tomb_id"),
        "left_anti",
    )


def _compact_store(
    spark,
    out_dir: str,
    defer_delete: bool,
    group_col: str,
    extra_sort: tuple,
    label: str,
) -> dict:
    import json
    import os
    import shutil

    man_path = os.path.join(out_dir, "manifest.json")
    with open(man_path, encoding="utf-8") as fh:
        manifest = json.load(fh)

    # reclaim the PREVIOUS compaction's deferred directories first: the
    # grace period a pre-swap loader needed has elapsed (one compaction
    # cadence) — see the docstring's concurrent-reader window
    reclaimed = manifest.get("stale_dirs", [])
    for rel in reclaimed:
        shutil.rmtree(os.path.join(out_dir, rel), ignore_errors=True)
    manifest["stale_dirs"] = []

    incr = _discover_increments(out_dir, manifest)
    tomb_ids = (manifest.get("tombstones") or {}).get("ids", [])
    # pending tombstones make compaction non-optional even with zero
    # increments: this is the step that turns the logical purge into
    # PHYSICAL erasure (the GDPR deadline's job)
    if not incr and not tomb_ids:
        if reclaimed:  # persist the cleared ledger even on the no-op path
            _write_json_atomic(man_path, manifest)
        return {
            "out_dir": out_dir,
            "rows": manifest["rows"],
            "folded_runs": [],
            "shards_dir": manifest.get("shards_dir", "shards"),
        }

    base_dir = manifest.get("shards_dir", "shards")
    parts = [("base", os.path.join(out_dir, base_dir), manifest["rows"])]
    parts += incr
    dfs = []
    for rid, path, _rows in parts:
        df = spark.read.parquet(path)
        if "_source_run" not in df.columns:
            df = df.withColumn("_source_run", F.lit(rid))
        dfs.append(df)
    merged = _balanced_union(dfs).localCheckpoint(eager=False)
    # physical erasure of pending tombstones rides the fold (r13): the
    # written layout never contains the purged documents, and the
    # cleared ledger below makes the erasure durable
    final = _apply_tombstones(merged, manifest) if tomb_ids else merged

    version = int(manifest.get("compaction", 0)) + 1
    new_rel = f"shards_v{version}"
    new_dir = os.path.join(out_dir, new_rel)
    # keep the shard writer's layout contract: group-partitioned files,
    # runs contiguous within a group (the extra sort keys cover each
    # store's row shape — token doc rows carry doc_id, assembled rows
    # don't, media rows sort by media_id)
    sort_cols = [group_col, "_source_run"] + [
        c for c in extra_sort if c in merged.columns
    ]
    (
        final.repartition(F.col(group_col))
        .sortWithinPartitions(*[F.col(c) for c in sort_cols])
        .write.mode("overwrite")
        .partitionBy(group_col)
        .parquet(new_dir)
    )
    expected = int(manifest["rows"]) + sum(r for _, _, r in incr)
    # the torn-part cross-check runs on the PRE-purge union (recorded
    # counts are pre-purge); the post-purge count becomes the new truth
    pre = merged.count()
    if pre != expected:
        raise ValueError(
            f"{label}: folded {pre} rows, parts record "
            f"{expected} — a torn part; compaction aborted (the manifest "
            "still points at the old layout)"
        )
    got = final.count() if tomb_ids else pre

    folded = [rid for rid, _, _ in incr]
    manifest["rows"] = got
    manifest["shards_dir"] = new_rel
    manifest["compaction"] = version
    manifest["increments"] = {}
    if tomb_ids:
        # erasure is durable past this write: the purged rows are gone
        # from the new layout AND the ledger clears, so later appends
        # may legitimately re-introduce an id (explicit re-ingest)
        manifest["tombstones"] = None
        manifest["purged_ids_applied"] = (
            int(manifest.get("purged_ids_applied", 0)) + len(tomb_ids)
        )
        manifest["purged_rows_total"] = (
            int(manifest.get("purged_rows_total", 0)) + (pre - got)
        )
    # media stores ledger per-run drop counts next to the increments map
    # (append_media_shards); folding a run folds its drops into the base
    # figure so "total = dropped_undecodable + sum(dropped_by_run)"
    # survives compaction. Unfolded entries (rows==0 all-undecodable
    # batches have drops but no increment directory) stay keyed by run.
    by_run = manifest.get("dropped_by_run")
    if by_run:
        folded_drops = sum(int(by_run.pop(rid, 0)) for rid in folded)
        if folded_drops:
            manifest["dropped_undecodable"] = (
                int(manifest.get("dropped_undecodable", 0)) + folded_drops
            )
        manifest["dropped_by_run"] = by_run
    manifest["compacted_runs"] = sorted(
        set(manifest.get("compacted_runs", [])) | set(folded)
    )
    if defer_delete:
        # leave the replaced directories for one compaction cadence so
        # lazy loaders built pre-swap finish their scans; the ledger is
        # reclaimed at the start of the NEXT compaction
        manifest["stale_dirs"] = [
            os.path.relpath(path, out_dir) for _rid, path, _rows in parts
        ]
    _write_json_atomic(man_path, manifest)

    if not defer_delete:
        # past the swap: immediate garbage collection (single-writer
        # maintenance window — caller asserts no loader is active)
        for _rid, path, _rows in parts:
            shutil.rmtree(path, ignore_errors=True)
    return {
        "out_dir": out_dir,
        "rows": got,
        "folded_runs": folded,
        "shards_dir": new_rel,
    }


class StreamShardSink:
    """PackGate -> token-shard-layout adapter (r11, r10 verdict 'What's
    missing #1' / #5): the foreachBatch target that closes the last seam
    between "stream arrives" and "trainer loads". Each trigger's CLOSED
    bins (from :class:`~jsonify2ai_spark.streaming.windowed.PackGate`)
    land as a self-contained increment at
    ``<out_dir>/shards_incr/<run_prefix><batch_id>/`` under the exact
    durability discipline :func:`append_token_shards` documents —
    ``_increment.json`` sidecar AFTER the parquet, atomic manifest-cache
    update, listing-derived discovery — so a standing ingest feeds
    :func:`read_token_shards` directly instead of hand-rolling the
    append or falling back to periodic batch jobs. No reference anchor:
    the reference stops at JSONL export
    (worker/app/routers/export.py:62-160).

    Idempotency is run_id = ``run_prefix + batch_id``: Structured
    Streaming's at-least-once replay of an uncommitted trigger becomes
    an idempotent re-run of the SAME run_id (PackGate's one-deep replay
    snapshot re-derives the identical closed bins without advancing
    state, and the overwrite rewrites the same directory — the
    single-writer-per-run_id contract holds because one query owns the
    prefix). Restart durability: the gate's open-bin state is persisted
    to ``<out_dir>/pack_gate_state/`` AFTER each increment commits, so
    the two crash windows both resolve to the same bins — crash before
    the state save replays the batch against the pre-batch state
    (normal processing, same bins, same dir overwritten); crash after
    it replays against the snapshot (re-derivation, no state advance).

    Config comes from the run's ``manifest.json`` (the
    :func:`append_token_shards` rule — an increment can never silently
    diverge from the base shard shape), and the base run must be
    ``assemble=True``: stream bins ARE assembled sequences; unioning
    them under a per-doc base layout would be a schema lie. Note the
    documented stream/batch boundary: bins pack in ARRIVAL order across
    triggers, so a stream-built increment can legitimately differ from
    what one batch re-pack of the same documents would produce — parity
    holds exactly for id-ordered delivery
    (tests/test_streaming.py::test_pack_gate_stream_equals_batch).

    Scale shape per trigger: PackGate's one batch-keyed applyInPandas
    fold + K-row broadcasts, then one group-partitioned write of the
    closed bins and two tiny driver-local JSON writes. Nothing is
    corpus-proportional; an idle trigger (no closed bins) writes only
    the gate state.
    """

    def __init__(
        self,
        gate,
        out_dir: str,
        run_prefix: str = "stream-",
        persist_state: bool = True,
        auto_compact_over: "int | None" = None,
    ) -> None:
        import os

        self._gate = gate
        self._out_dir = out_dir
        self._prefix = str(run_prefix)
        self._persist = bool(persist_state)
        self._auto_compact_over = (
            None if auto_compact_over is None else int(auto_compact_over)
        )
        self._state_dir = os.path.join(out_dir, "pack_gate_state")
        self._man_path = os.path.join(out_dir, "manifest.json")

    @classmethod
    def from_artifacts(
        cls,
        out_dir: str,
        run_prefix: str = "stream-",
        id_col: str = "doc_id",
        ids_col: str = "token_ids",
        auto_compact_over: "int | None" = None,
    ) -> "StreamShardSink":
        """Build the PackGate FROM the run's manifest config (budget /
        groups / eos / pad / boundaries / shuffle-free layout) and
        resume its state from ``pack_gate_state/`` when a prior run of
        this sink left one — the restart path. Raises on a
        per-doc-layout base (assemble=False)."""
        import json
        import os

        from jsonify2ai_spark.streaming.windowed import PackGate

        with open(
            os.path.join(out_dir, "manifest.json"), encoding="utf-8"
        ) as fh:
            cfg = json.load(fh)["config"]
        if not cfg.get("assemble", False):
            raise ValueError(
                "StreamShardSink: the base run is assemble=False (per-doc "
                "shard rows) but stream bins are assembled sequences — "
                "rebuild the base with assemble=True or pack doc rows "
                "with append_token_shards instead"
            )
        state_dir = os.path.join(out_dir, "pack_gate_state")
        if os.path.isfile(os.path.join(state_dir, "state.json")):
            gate = PackGate.load(None, state_dir)
        else:
            gate = PackGate(
                budget=int(cfg["budget"]),
                n_groups=int(cfg["n_groups"]),
                eos_id=cfg["eos_id"],
                pad_id=int(cfg["pad_id"]),
                boundaries=bool(cfg.get("boundaries", False)),
                ids_col=ids_col,
                id_col=id_col,
            )
        return cls(
            gate,
            out_dir,
            run_prefix=run_prefix,
            auto_compact_over=auto_compact_over,
        )

    @property
    def gate(self):
        return self._gate

    def _write_increment(
        self, bins, run_id: str, replay: bool = False
    ) -> "dict | None":
        import json
        import os

        from jsonify2ai_spark.sinks.export import write_training_shards

        with open(self._man_path, encoding="utf-8") as fh:
            manifest = json.load(fh)
        if run_id in manifest.get("compacted_runs", []):
            if replay:
                # a TRUE replay of the last committed trigger whose
                # increment a (possibly auto-) compaction already folded
                # into the base: the rows are durably in the store, so
                # re-writing them would double-count — the replay is an
                # idempotent no-op. Only the one-deep window qualifies
                # (batch_id == the gate's persisted _last_batch_id, the
                # same window PackGate's replay snapshot covers).
                return None
            raise ValueError(
                f"StreamShardSink: run_id {run_id!r} was already folded "
                "into the base by compact_token_shards, and this is not "
                "a replay of the last committed trigger — a fresh "
                "checkpoint is reusing batch_ids against an old store. "
                "Restart the stream with a fresh run_prefix (or compact "
                "only between streams)"
            )
        bins = bins.localCheckpoint(eager=False)
        n = bins.count()
        if n == 0:
            return None  # idle trigger: no increment directory litter
        sub = os.path.join(self._out_dir, "shards_incr", run_id)
        m = write_training_shards(
            bins,
            sub,
            id_col="bin_idx",
            shuffle_seed=manifest["config"].get("shuffle_seed"),
        )
        # sidecar AFTER the parquet (the increment self-describes the
        # moment it is complete), manifest cache second, atomically —
        # append_token_shards' crash-window walk applies verbatim
        _write_json_atomic(
            os.path.join(sub, "_increment.json"),
            {"run_id": run_id, "rows": m["rows"]},
        )
        with open(self._man_path, encoding="utf-8") as fh:
            manifest = json.load(fh)
        manifest.setdefault("increments", {})[run_id] = m["rows"]
        _write_json_atomic(self._man_path, manifest)
        return {**m, "run_id": run_id}

    def __call__(self, batch, batch_id: int) -> "dict | None":
        """The foreachBatch body: fold the batch through the gate, write
        this trigger's closed bins as increment ``<prefix><batch_id>``,
        persist gate state (commit point — see the class docstring's
        crash-window walk), then run the maintenance hook.

        ``auto_compact_over=N``: once MORE THAN N live increments exist
        after a commit, fold them into the base with
        :func:`compact_token_shards` (defer_delete grace applies) — the
        standing ingest keeps its own store trainer-optimal instead of
        relying on an operator cron. Replay interaction: compaction can
        fold the increment of a trigger whose checkpoint never
        committed; the subsequent replay is detected (batch_id == the
        gate's persisted ``_last_batch_id``, the same one-deep window
        PackGate's snapshot covers) and skipped as already-durable,
        while a FRESH checkpoint colliding with a compacted run_id
        still raises — silently skipping that one would drop new data.
        Cost note: the compaction runs INSIDE the trigger (one scan +
        rewrite of base+increments), so that trigger stretches by the
        store-rewrite time — size N so it fires rarely relative to the
        trigger interval, or leave it None and compact between streams.
        """
        import json

        was_replay = (
            getattr(self._gate, "_last_batch_id", None) == batch_id
        )
        closed = self._gate.filter_batch(batch, batch_id=batch_id)
        out = self._write_increment(
            closed, f"{self._prefix}{batch_id}", replay=was_replay
        )
        if self._persist:
            self._gate.save(self._state_dir)
        if self._auto_compact_over is not None and out is not None:
            with open(self._man_path, encoding="utf-8") as fh:
                live = len(json.load(fh).get("increments", {}))
            if live > self._auto_compact_over:
                compact_token_shards(batch.sparkSession, self._out_dir)
        return out

    def flush(self) -> "dict | None":
        """Graceful end-of-stream: emit the per-group trailing open bins
        as the final (partial-sequence) increment ``<prefix>final``.

        Crash window: :meth:`PackGate.flush` clears the in-memory
        buffers BEFORE this method's increment write, so if the write
        raises (e.g. the compacted-run_id guard), the bins are gone
        from THIS process — but the on-disk gate state is still
        pre-flush (it persists only after the write commits), so a
        restarted ``from_artifacts`` sink re-derives and re-flushes the
        identical bins. Same-process recovery is intentionally not
        offered: restart is the documented recovery path for every
        sink in this family. A repeated flush after a SUCCESSFUL one
        returns None without touching disk — and a flush that follows
        MORE TRIGGERS after a successful one gets a fresh run_id
        (``<prefix>final_b<last_batch_id>``) rather than silently
        overwriting the earlier final increment's directory and
        manifest row (which would lose its rows)."""
        import json

        bins = self._gate.flush()
        if bins is None:
            return None
        run_id = f"{self._prefix}final"
        with open(self._man_path, encoding="utf-8") as fh:
            manifest = json.load(fh)
        if run_id in manifest.get("increments", {}):
            # flush -> more triggers -> flush again: the first final
            # increment is live on disk; mint a unique id for this one.
            # Unreachable with the same _last_batch_id (the gate's
            # buffers were cleared by the first flush, so a second
            # flush with no intervening trigger returns None above).
            run_id = f"{self._prefix}final_b{self._gate._last_batch_id}"
        out = self._write_increment(bins, run_id)
        if self._persist:
            self._gate.save(self._state_dir)
        return out


def shard_store_report(out_dir: str) -> dict:
    """Ops audit of a token-shard store (the produce/append/stream/LOAD
    lifecycle's health card): reconcile the manifest against the disk
    LISTING — the same dual-source rule :func:`_discover_increments`
    loads by — and report every part's rows/bytes/files plus the
    conditions an operator acts on. Driver-side os.walk only (a store
    has tens-to-thousands of parts, never corpus-many); no Spark job,
    so it is safe to run against a store that loaders are reading.

    Per-part ``status``:

    - ``ok``            listed sidecar + manifest entry agree
    - ``unmanifested``  sidecar exists, manifest entry missing (crash
                        window / lost concurrent-append race) — data is
                        whole, the loader already heals it; the next
                        append or compaction re-caches it
    - ``torn``          increment directory WITHOUT a sidecar: a write
                        crashed before commit — re-run the same run_id
    - ``garbage``       directory for a run_id in ``compacted_runs``:
                        its rows live in the compacted base; deletion
                        was deferred or crashed — reclaimable
    - ``lost``          manifest claims an increment with no directory/
                        sidecar: the loader RAISES on this; surfaced
                        here instead of raising so the audit can list
                        every casualty at once

    Top level: base dir/rows/bytes/files + compaction generation,
    ``stale_dirs`` pending reclaim (with on-disk bytes), totals, and
    ``compaction_recommended`` once live increments exceed
    ``compact_over`` (default 8 — small-file pressure is the loader's
    enemy at scale; each increment is its own parquet footer set).
    """
    import json
    import os

    def du(path: str) -> tuple[int, int]:
        nbytes = nfiles = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    nbytes += os.path.getsize(os.path.join(root, f))
                    nfiles += 1
                except OSError:
                    pass
        return nbytes, nfiles

    compact_over = 8
    with open(os.path.join(out_dir, "manifest.json"), encoding="utf-8") as fh:
        manifest = json.load(fh)

    base_dir = manifest.get("shards_dir", "shards")
    base_bytes, base_files = du(os.path.join(out_dir, base_dir))
    folded = set(manifest.get("compacted_runs", []))
    cached = {str(k): int(v) for k, v in manifest.get("increments", {}).items()}

    parts = []
    incr_root = os.path.join(out_dir, "shards_incr")
    listed = set()
    if os.path.isdir(incr_root):
        for rid in sorted(os.listdir(incr_root)):
            d = os.path.join(incr_root, rid)
            if not os.path.isdir(d):
                continue
            listed.add(rid)
            nbytes, nfiles = du(d)
            side = os.path.join(d, "_increment.json")
            if rid in folded:
                status, rows = "garbage", None
            elif not os.path.isfile(side):
                status, rows = "torn", None
            else:
                with open(side, encoding="utf-8") as fh:
                    rows = int(json.load(fh)["rows"])
                status = "ok" if rid in cached else "unmanifested"
            parts.append(
                {
                    "run_id": rid,
                    "status": status,
                    "rows": rows,
                    "bytes": nbytes,
                    "files": nfiles,
                }
            )
    for rid in sorted(set(cached) - listed - folded):
        parts.append(
            {"run_id": rid, "status": "lost", "rows": cached[rid],
             "bytes": 0, "files": 0}
        )

    stale = manifest.get("stale_dirs", [])
    stale_bytes = sum(du(os.path.join(out_dir, d))[0] for d in stale)
    live = [p for p in parts if p["status"] in ("ok", "unmanifested")]
    return {
        "base": {
            "dir": base_dir,
            "rows": int(manifest["rows"]),
            "bytes": base_bytes,
            "files": base_files,
            "compaction_generation": (
                int(base_dir.rsplit("_v", 1)[1]) if "_v" in base_dir else 0
            ),
        },
        "increments": parts,
        "n_live_increments": len(live),
        "total_rows": int(manifest["rows"]) + sum(p["rows"] for p in live),
        "total_bytes": base_bytes + sum(p["bytes"] for p in parts) + stale_bytes,
        "stale_dirs": {"count": len(stale), "bytes": stale_bytes},
        "n_lost": sum(1 for p in parts if p["status"] == "lost"),
        "n_torn": sum(1 for p in parts if p["status"] == "torn"),
        # pending deletion requests (logical-only until a compaction
        # erases them) — a nonzero count with an old manifest mtime is
        # the "GDPR deadline approaching" signal an operator pages on
        "pending_purge_ids": len(
            (manifest.get("tombstones") or {}).get("ids", [])
        ),
        "purged_ids_applied": int(manifest.get("purged_ids_applied", 0)),
        "compaction_recommended": len(live) > compact_over
        or bool((manifest.get("tombstones") or {}).get("ids")),
    }


def read_token_shards_mixture(
    spark,
    stores: "dict[str, str]",
    weights: "dict[str, float]",
    budget_tokens: int,
    salt: str = "mix-v1",
    include_increments: bool = True,
    validate: bool = False,
) -> DataFrame:
    """Weighted multi-store trainer load: union several token-shard
    stores (:func:`corpus_to_token_shards` runs — the code store, the
    web store, the books store) into ONE training frame whose per-store
    token mass approximates ``budget_tokens * w_s / Σw`` — the "blend
    domains to a token budget" step a multi-corpus pretraining run
    starts with, applied at the SHARD level so nothing re-tokenizes or
    re-packs.

    Per store s: keep fraction f_s = min(1, target_s / available_s),
    where available_s is one sum over the store's size column (``n_ids``
    for assembled stores, ``size(token_ids)`` otherwise — mixing the two
    layouts is fine; sequence lengths just differ). Rows are kept by the
    engine-portable md5 rule of :func:`~jsonify2ai_spark.operators.
    sampling.deterministic_sample` on the row's stable identity
    (store alias + pack_group/bin_idx, or store + doc id), so the blend
    is reproducible across engines/retries/cluster shapes and composes
    with pushdown — the whole mixture is metadata joins plus ONE
    map-side filter; the only extra jobs are the per-store size sums
    (one partial-aggregated scalar each, unavoidable: manifests record
    row counts, not token mass). An under-supplied store contributes
    everything it has and the mix under-delivers rather than silently
    re-weighting (:func:`~jsonify2ai_spark.operators.sampling.
    sample_to_token_budget`'s contract). Stores absent from ``weights``
    get weight 0 (excluded).

    Output: every store column plus ``_store`` (the alias) and the
    store's ``_source_run`` tags intact — a trainer can still weight or
    ablate increments within a store. Whole-bin keep/drop: sampling
    never splits a packed sequence, so attention masks and boundary
    metadata stay valid.
    """
    from jsonify2ai_spark.operators.sampling import _BUCKETS, sample_hash

    total_w = sum(weights.get(a, 0.0) for a in stores)
    if total_w <= 0:
        raise ValueError("read_token_shards_mixture: no positive weights")

    frames = []
    for alias, out_dir in stores.items():
        w = weights.get(alias, 0.0)
        if w <= 0:
            continue
        df = read_token_shards(
            spark, out_dir,
            include_increments=include_increments, validate=validate,
        )
        size_col = (
            F.col("n_ids").cast("double")
            if "n_ids" in df.columns
            else F.size("token_ids").cast("double")
        )
        available = df.agg(F.sum(size_col)).collect()[0][0] or 0.0
        target = budget_tokens * w / total_w
        frac = 1.0 if available <= target else target / available
        key = (
            F.concat_ws(
                "|",
                F.lit(alias),
                F.col("pack_group").cast("string"),
                F.col("bin_idx").cast("string"),
            )
            if "bin_idx" in df.columns
            else F.concat_ws("|", F.lit(alias), F.col("doc_id").cast("string"))
        )
        frames.append(
            df.filter(sample_hash(key, salt) < int(frac * _BUCKETS))
            .withColumn("_store", F.lit(alias))
        )
    if not frames:
        raise ValueError("read_token_shards_mixture: every store has weight 0")
    cols = {tuple(sorted(f.columns)) for f in frames}
    if len(cols) > 1:
        raise ValueError(
            "read_token_shards_mixture: stores have mismatched columns "
            f"{sorted(cols)} — mixing assembled with per-doc layouts (or "
            "boundary-tagged with plain) produces rows a trainer cannot "
            "consume uniformly; re-run the odd store with matching config"
        )
    return _balanced_union(frames)
