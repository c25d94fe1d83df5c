"""Event-time windowed streaming aggregation (the generalization of T6/A6).

The reference's streaming is file-arrival incremental processing with no
event-time semantics (SURVEY §2.8) — its telemetry counters (worker/app/
telemetry.py:27-79, A6) are wall-clock monotonic counts. A corpus-scale
engine needs the real thing:

- tumbling/sliding event-time windows over the event stream,
- watermarks so state is BOUNDED: a window's state is dropped once the
  watermark (max observed event time - delay) passes its end; events older
  than the watermark are discarded instead of resurrecting dead state. At
  1000 executors the state store is the scaling hazard — watermark delay x
  input rate bounds it, independent of stream lifetime.
- `update` output for live dashboards, `append` for exactly-once sinks
  (emits a window only when it can no longer change).

The batch twin of `hourly_rollup` is q09_events_hourly — same groupBy, same
aggregates, so batch backfill and the live stream share one definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from jsonify2ai_spark.session import local_rows_df
from pyspark.sql import functions as F

EVENTS_SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"


def stream_events_json(spark: SparkSession, path: str, max_files_per_trigger: int = 16) -> DataFrame:
    """File-source event stream (JSONL drops, schema fixed up front —
    streaming sources cannot infer)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(path)
    )


def windowed_rollup(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling (or sliding) window aggregation:
    (window_start, window_end, *keys, n_events, total_value).

    One shuffle on (window, keys); partial aggregation is map-side. State per
    group lives until watermark > window end, then is evicted — bounded by
    (watermark delay / window) x |keys| groups.
    """
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), *[F.col(k) for k in keys])
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """The streaming twin of q09_events_hourly (batch backfill and live
    stream share this shape)."""
    return windowed_rollup(events, window="1 hour", watermark=watermark)


def running_counters(events: DataFrame, keys: tuple[str, ...] = ("event_type",)) -> DataFrame:
    """A6 telemetry counters: monotonic per-key totals for `update`-mode
    dashboards. Unbounded-lifetime state but bounded CARDINALITY (|keys|
    groups) — safe where the key space is an enum, unlike per-entity counts
    which need a watermark or TTL."""
    return events.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def quality_monitor(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Windowed corpus-quality telemetry over an ingest stream: per event-time
    window, the document count, mean quality score, mean token count, and the
    PII hit rate. This is the data-quality dashboard feed a training-data
    pipeline runs NEXT TO ingestion — a quality-score collapse or PII spike in
    a window flags a bad source before it pollutes the corpus.

    Composition only: the scoring expressions are the verified batch
    operators (quality_score, with_pii_counts — pure projections, so they
    stream unchanged); the window/watermark machinery is the same as the
    event rollups. State is bounded by the watermark.
    """
    from jsonify2ai_spark.operators.pii import with_pii_counts
    from jsonify2ai_spark.operators.textstats import quality_score
    from jsonify2ai_spark.functions.text import token_count

    scored = with_pii_counts(docs, text_col=text_col).select(
        F.col(ts_col),
        quality_score(text_col).alias("_q"),
        token_count(F.col(text_col)).alias("_ntok"),
        (F.col("pii_total") > 0).cast("int").alias("_pii"),
    )
    return (
        scored.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("_q"), 4).alias("avg_quality"),
            F.round(F.avg("_ntok"), 2).alias("avg_tokens"),
            F.round(F.avg("_pii"), 4).alias("pii_rate"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_docs", "avg_quality", "avg_tokens", "pii_rate",
        )
    )


def debounced_paths(
    files: DataFrame,
    stable_seconds: int = 1,
    path_col: str = "path",
    ts_col: str = "modificationTime",
    timeout_seconds: int = 30,
) -> DataFrame:
    """T2's debounce/stability gate as a REAL stateful streaming operator
    (applyInPandasWithState): a path is emitted only once no new modification
    for it has arrived for ``stable_seconds`` of event time.

    The reference polls file size 3x300 ms in-process
    (scripts/dev/tools/watch_dropzone.py:165-183,213-229); distributed, the
    equivalent is keyed state per path holding (last_mtime, last_len) with a
    processing-time timeout — when the timeout fires with no newer event, the
    file is declared stable and emitted downstream. State is per in-flight
    path only; emitted keys drop their state.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{path_col} STRING, n_events INT, last_len BIGINT"
    state_schema = "last_ts DOUBLE, n_events INT, last_len BIGINT"

    def gate(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            (last_ts, n_events, last_len) = state.get
            state.remove()
            yield pd.DataFrame(
                {path_col: [key[0]], "n_events": [n_events], "last_len": [last_len]}
            )
            return
        n_events, last_len, last_ts = 0, 0, 0.0
        if state.exists:
            last_ts, n_events, last_len = state.get
        for pdf in pdfs:
            n_events += len(pdf)
            if len(pdf):
                row = pdf.sort_values(ts_col).iloc[-1]
                last_ts = row[ts_col].timestamp()
                last_len = int(row["length"])
        state.update((last_ts, n_events, last_len))
        state.setTimeoutDuration(stable_seconds * 1000)
        yield from ()

    return files.groupBy(path_col).applyInPandasWithState(
        gate,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def stream_dedup(
    records: DataFrame,
    key_col: str = "fingerprint",
    ttl_seconds: int | None = None,
) -> DataFrame:
    """Cross-micro-batch exact dedup: emit only the FIRST record seen for
    each ``key_col`` value, for the whole stream lifetime (or per TTL).

    The streaming face of the batch exact-dedup family (operators/dedup.py):
    in a live ingest pipeline this sits between parse and embed so a
    re-dropped or duplicated document never reaches the expensive stages.
    Keyed state is one boolean per distinct key — with ``ttl_seconds`` set,
    state is evicted on a processing-time timeout and the bound becomes
    TTL x distinct-key rate instead of stream-lifetime cardinality (the
    100 TB-safe configuration; a key re-arriving after its TTL re-emits,
    i.e. at-most-once-per-TTL semantics).

    Any representative of a duplicate group is a correct emission (the key
    IS the content identity), so the first row delivered wins.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = records.schema
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_seconds
        else GroupStateTimeout.NoTimeout
    )

    def dedup(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        first = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.iloc[[0]]
        already = state.exists
        if not already:
            state.update((True,))
        if ttl_seconds:
            state.setTimeoutDuration(ttl_seconds * 1000)
        if not already and first is not None:
            yield first

    return records.groupBy(key_col).applyInPandasWithState(
        dedup, out_schema, "seen BOOLEAN", "append", timeout
    )


class CorpusNearDupGate:
    """Streaming face of q65's incremental near-dup dedup: drop every
    micro-batch row that has a jaccard >= threshold near-duplicate in a
    STATIC reference corpus, reusing corpus-side artifacts across batches.

    The per-batch cost contract (the reason this is a class and not a
    per-batch ``dedup_against`` call): the corpus's shingle sets and its
    exploded posting frame are built ONCE at construction, persisted, and
    — critically — the posting frame is pre-partitioned on the shingle
    hash, so every micro-batch join reuses that layout and only the BATCH
    side shuffles. Per-batch work is proportional to the batch, never the
    corpus; a 100 TB corpus amortizes to a one-time build.

    ``df_cap`` drops corpus shingles whose document frequency exceeds the
    cap from the posting frame at BUILD time (boilerplate, the
    d_new x d_existing join hazard); batch-side candidates still verify
    against FULL corpus shingle sets, so emitted jaccard decisions stay
    exact (same candidates-vs-verification split as the batch operators).

    Use: ``gate = CorpusNearDupGate(spark_corpus_df)``, then either
    ``gate.filter_batch(batch_df)`` inside an existing foreachBatch, or
    ``stream.writeStream.foreachBatch(gate.foreach_batch(append_fn))``.
    Call ``close()`` to release the persisted corpus artifacts.
    """

    # StreamingPrepChain dispatch contract: "filter" gates return surviving
    # rows with the INPUT schema; "rewrite" gates return (id, rewritten
    # text, counters) and name the rewritten column in ``rewritten_col``.
    kind = "filter"

    def __init__(
        self,
        corpus: DataFrame,
        threshold: float = 0.8,
        text_col: str = "text",
        id_col: str = "doc_id",
        shingle_n: int = 3,
        df_cap: int | None = None,
    ) -> None:
        from jsonify2ai_spark.operators.dedup import shingle_hash_sets

        self._threshold = threshold
        self._text_col = text_col
        self._id_col = id_col
        self._shingle_n = shingle_n
        # corpus shingle sets: verification side (full sets, never capped)
        self._sets = (
            shingle_hash_sets(corpus, text_col, id_col, shingle_n)
            .select(F.col(id_col).alias("b"), F.col("hs").alias("_hb"))
            .persist()
        )
        # posting frame: candidate side, pre-partitioned on the shingle
        # hash so batch joins reuse the layout (only the batch shuffles)
        posts = self._sets.select(
            "b", F.size("_hb").alias("szb"), F.explode("_hb").alias("sh")
        )
        if df_cap is not None:
            hot = (
                posts.groupBy("sh")
                .agg(F.count(F.lit(1)).alias("df"))
                .filter(F.col("df") > df_cap)
                .select("sh")
            )
            posts = posts.join(F.broadcast(hot), "sh", "left_anti")
        self._posts = posts.repartition(F.col("sh")).persist()
        self._posts.count()  # materialize both artifacts up front
        self._n_corpus = self._sets.count()

    def save(self, path: str) -> None:
        """Persist the build-once corpus artifacts (shingle sets + the
        sh-clustered posting frame + params) so a stream RESTART warm-
        loads in seconds instead of re-shingling the corpus — the same
        contract as BM25Index.save: at 100 TB the build is a batch job,
        the load is a cache warm. Pair with the stream's checkpointLocation
        (offsets resume there; the gate's corpus state resumes here)."""
        spark = self._sets.sparkSession
        self._sets.write.mode("overwrite").parquet(f"{path}/sets")
        self._posts.write.mode("overwrite").parquet(f"{path}/posts")
        local_rows_df(spark, 
            [
                (
                    self._threshold,
                    self._text_col,
                    self._id_col,
                    self._shingle_n,
                    self._n_corpus,
                )
            ],
            "threshold double, text_col string, id_col string, "
            "shingle_n int, n_corpus long",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "CorpusNearDupGate":
        """Rebuild from :meth:`save` output without touching the corpus
        text; filter_batch parity across the round-trip is test-pinned
        (df_cap, if any, was already applied to the saved postings)."""
        meta = spark.read.parquet(f"{path}/meta").first()
        obj = cls.__new__(cls)
        obj._threshold = float(meta["threshold"])
        obj._text_col = meta["text_col"]
        obj._id_col = meta["id_col"]
        obj._shingle_n = int(meta["shingle_n"])
        obj._n_corpus = int(meta["n_corpus"])
        obj._sets = spark.read.parquet(f"{path}/sets").persist()
        obj._posts = (
            spark.read.parquet(f"{path}/posts")
            .repartition(F.col("sh"))
            .persist()
        )
        obj._posts.count()
        return obj

    def filter_batch(self, batch: DataFrame) -> DataFrame:
        """Rows of ``batch`` with NO near-duplicate in the corpus (plus
        batch rows with no shingles, which cannot near-dup anything)."""
        from jsonify2ai_spark.operators.dedup import shingle_hash_sets

        sn = shingle_hash_sets(
            batch, self._text_col, self._id_col, self._shingle_n
        ).localCheckpoint(eager=False)  # feeds candidates AND verification
        exn = sn.select(
            F.col(self._id_col).alias("a"),
            F.size("hs").alias("sza"),
            F.explode("hs").alias("sh"),
        )
        # candidates: batch postings vs cached corpus postings. The BATCH's
        # distinct shingle set broadcasts into a semi-join FIRST (r6
        # verdict #8): the corpus-postings side entering the candidate
        # join is then batch-shingle-sized — the persisted frame stays
        # corpus-sized only in STORAGE, its per-batch contribution is one
        # memory-speed scan behind a broadcast hash probe, and the join +
        # distinct downstream see batch-proportional rows. Verify against
        # the FULL corpus sets so df_cap never changes a score.
        batch_sh = exn.select("sh").distinct()
        touched = self._posts.join(F.broadcast(batch_sh), "sh", "left_semi")
        cand = exn.join(touched, "sh").select("a", "b").distinct()
        verified = (
            cand.join(sn.select(F.col(self._id_col).alias("a"), "hs"), "a")
            .join(self._sets, "b")
            .select(
                "a",
                F.size("hs").alias("sza"),
                F.size("_hb").alias("szb"),
                F.size(F.array_intersect("hs", "_hb")).alias("common"),
            )
        )
        dup_ids = (
            verified.filter(
                F.col("common")
                / (F.col("sza") + F.col("szb") - F.col("common"))
                >= self._threshold
            )
            .select(F.col("a").alias(self._id_col))
            .distinct()
        )
        return batch.join(dup_ids, self._id_col, "left_anti")

    def foreach_batch(self, append):
        """Wrap ``append(clean_df, batch_id)`` as a foreachBatch callable."""

        def _fn(batch: DataFrame, batch_id: int) -> None:
            append(self.filter_batch(batch), batch_id)

        return _fn

    def close(self) -> None:
        self._sets.unpersist()
        self._posts.unpersist()


def mixture_monitor(
    docs: DataFrame,
    weights: DataFrame,
    window: str = "10 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Live mixture telemetry: per (event-time window, source), document
    and token counts joined against the TARGET share table (q82's
    ``mixture_weights`` output or any (source, p_target) frame) — the
    dashboard that catches a drifting ingest mix while it drifts, instead
    of at the next corpus audit.

    The emitted ``tokens_per_target`` = n_tokens / p_target is the
    mix-balance statistic: when the window's intake matches the target
    mixture it is CONSTANT across sources, and an over-sampled source
    reads proportionally high — comparable row-local, so no second
    streaming aggregation (which append mode would reject) is needed.

    Plan: token counts are map-side size(split); the weights table
    broadcasts onto the stream BEFORE aggregation (p_target rides the
    groupBy key — functionally dependent on source, so it is free); one
    watermarked windowed aggregate whose state is |windows x sources|-
    bounded. Same batch expressions as q82 — stream and audit share one
    definition.
    """
    from jsonify2ai_spark.functions.text import token_count

    w = weights.select(F.col(source_col), F.col("p_target"))
    base = (
        docs.withWatermark(ts_col, watermark)
        .join(F.broadcast(w), source_col, "left")
        .select(
            F.col(ts_col),
            F.col(source_col),
            F.coalesce(F.col("p_target"), F.lit(0.0)).alias("p_target"),
            F.coalesce(token_count(F.col(text_col)), F.lit(0)).alias("_tok"),
        )
    )
    return (
        base.groupBy(F.window(ts_col, window), F.col(source_col), F.col("p_target"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_tok").cast("bigint").alias("n_tokens"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            source_col,
            "n_docs",
            "n_tokens",
            F.round("p_target", 6).alias("p_target"),
            F.round(
                F.when(F.col("p_target") > 0, F.col("n_tokens") / F.col("p_target")),
                2,
            ).alias("tokens_per_target"),
        )
    )


class BoilerplateLineGate:
    """Streaming face of :func:`~jsonify2ai_spark.operators.dedup.line_dedup`
    (the CCNet/RefinedWeb duplicated-line strip): REWRITE every micro-batch
    document by removing lines whose trimmed hash is corpus-level
    boilerplate (present in > ``max_line_df`` distinct corpus documents).
    CorpusNearDupGate drops whole near-dup documents; this gate cleans the
    survivors' chrome — pipelines run both, in that order.

    Per-batch cost contract: the HOT-LINE set is built once from the static
    corpus and persisted — it is boilerplate-catalog-sized (distinct
    repeated lines), orders of magnitude smaller than the corpus, and
    broadcast onto each batch. Per-batch work = one posexplode of the
    batch's lines + the broadcast anti-mark + one batch-id-keyed sorted
    reassembly — proportional to the batch, never the corpus.

    Use: ``gate = BoilerplateLineGate(corpus_df)``, then
    ``gate.filter_batch(batch_df)`` inside foreachBatch (or
    ``stream.writeStream.foreachBatch(gate.foreach_batch(append_fn))``).
    Output: the batch's id column, ``text`` rewritten to the surviving
    lines (original order), and (n_lines, n_kept) counters. ``close()``
    releases the persisted hot set.
    """

    kind = "rewrite"  # StreamingPrepChain dispatch (see CorpusNearDupGate)

    def __init__(
        self,
        corpus: DataFrame,
        max_line_df: int = 2,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        self._text_col = text_col
        self._id_col = id_col
        self.rewritten_col = text_col  # rewrites in place, input column name
        lines = corpus.select(
            F.col(id_col),
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
            ).alias("ln"),
        ).select(F.col(id_col), F.md5(F.trim("ln")).alias("h"))
        self._hot = (
            lines.groupBy("h")
            .agg(F.count_distinct(F.col(id_col)).alias("ldf"))
            .filter(F.col("ldf") > max_line_df)
            .select("h", F.lit(True).alias("_hot"))
            .persist()
        )
        self._hot.count()  # materialize once, before the first trigger

    def save(self, path: str) -> None:
        """Persist the hot-line set + params for restart warm-load (see
        CorpusNearDupGate.save — same contract, one artifact)."""
        spark = self._hot.sparkSession
        self._hot.write.mode("overwrite").parquet(f"{path}/hot")
        local_rows_df(spark, 
            [(self._text_col, self._id_col)], "text_col string, id_col string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "BoilerplateLineGate":
        meta = spark.read.parquet(f"{path}/meta").first()
        obj = cls.__new__(cls)
        obj._text_col = meta["text_col"]
        obj._id_col = meta["id_col"]
        obj.rewritten_col = meta["text_col"]
        obj._hot = spark.read.parquet(f"{path}/hot").persist()
        obj._hot.count()
        return obj

    def filter_batch(self, batch: DataFrame) -> DataFrame:
        """Rewrite ``batch``: corpus-boilerplate lines removed, order kept."""
        idc, txt = self._id_col, self._text_col
        lx = batch.select(
            F.col(idc),
            # NULL text -> one empty line, so the batch row survives the
            # rewrite (same total-over-input guard as line_dedup)
            F.posexplode(
                F.split(F.coalesce(F.col(txt), F.lit("")), "\n")
            ).alias("idx", "ln"),
        ).withColumn("h", F.md5(F.trim("ln")))
        marked = lx.join(F.broadcast(self._hot), "h", "left")
        kept = F.array_sort(
            F.collect_list(F.when(F.col("_hot").isNull(), F.struct("idx", "ln")))
        )
        return (
            marked.groupBy(F.col(idc))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_lines"),
                F.count(F.when(F.col("_hot").isNull(), 1))
                .cast("bigint")
                .alias("n_kept"),
                kept.alias("_ks"),
            )
            .select(
                F.col(idc),
                F.concat_ws("\n", F.transform("_ks", lambda s: s["ln"])).alias(txt),
                "n_lines",
                "n_kept",
            )
        )

    def foreach_batch(self, append):
        """Wrap ``append(clean_df, batch_id)`` as a foreachBatch callable."""

        def _fn(batch: DataFrame, batch_id: int) -> None:
            append(self.filter_batch(batch), batch_id)

        return _fn

    def close(self) -> None:
        self._hot.unpersist()


class DecontaminationGate:
    """Streaming face of :func:`~jsonify2ai_spark.operators.dedup.
    decontaminate` (the GPT-3/PaLM benchmark n-gram rule, q60/q95): drop
    every micro-batch document sharing any word ``n``-gram with a static
    benchmark/eval corpus — the gate an ingestion stream runs so leaked
    eval data never reaches a training table. Sits naturally between
    CorpusNearDupGate (whole-doc near-dups) and BoilerplateLineGate
    (line chrome) in a streaming prep chain.

    Per-batch cost contract: the benchmark shingle set is built ONCE
    (eval sets are tiny next to an ingest stream), distinct-ed, persisted,
    and broadcast into every batch — per-batch work is one shingle
    explode of the BATCH plus a broadcast semi-probe, map-only except the
    per-doc any-match aggregate. ``normalize=True`` applies the ASCII
    lowercase/collapse form on BOTH sides (the batch side inherits the
    operator's empty-shingle guard, so non-ASCII batch docs are never
    false-positived — the r7 decontaminate fix).

    Use: ``gate = DecontaminationGate(bench_df)``, then
    ``gate.filter_batch(batch_df)`` inside foreachBatch (or
    ``stream.writeStream.foreachBatch(gate.foreach_batch(append_fn))``).
    ``close()`` releases the persisted shingle set.
    """

    kind = "filter"  # StreamingPrepChain dispatch (see CorpusNearDupGate)

    def __init__(
        self,
        benchmark: DataFrame,
        n: int = 8,
        text_col: str = "text",
        id_col: str = "doc_id",
        bench_text_col: str = "text",
        normalize: bool = False,
    ) -> None:
        from jsonify2ai_spark.functions.text import shingles

        self._n = n
        self._text_col = text_col
        self._id_col = id_col
        self._normalize = normalize
        self._bsh = (
            benchmark.select(
                F.explode(
                    shingles(self._prep(F.col(bench_text_col)), n)
                ).alias("sh")
            )
            .filter(F.col("sh") != "")
            .distinct()
            .persist()
        )
        self._bsh.count()  # materialize before the first trigger

    def save(self, path: str) -> None:
        """Persist the benchmark shingle set + params for restart
        warm-load (see CorpusNearDupGate.save — same contract)."""
        spark = self._bsh.sparkSession
        self._bsh.write.mode("overwrite").parquet(f"{path}/bsh")
        local_rows_df(spark, 
            [(self._n, self._text_col, self._id_col, self._normalize)],
            "n int, text_col string, id_col string, normalize boolean",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "DecontaminationGate":
        meta = spark.read.parquet(f"{path}/meta").first()
        obj = cls.__new__(cls)
        obj._n = int(meta["n"])
        obj._text_col = meta["text_col"]
        obj._id_col = meta["id_col"]
        obj._normalize = bool(meta["normalize"])
        obj._bsh = spark.read.parquet(f"{path}/bsh").persist()
        obj._bsh.count()
        return obj

    def _prep(self, c):
        if not self._normalize:
            return c
        return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))

    def filter_batch(self, batch: DataFrame) -> DataFrame:
        """Rows of ``batch`` sharing NO n-gram with the benchmark set
        (docs too short to shingle, or empty under normalization, pass —
        no n-gram evidence exists against them)."""
        from jsonify2ai_spark.functions.text import shingles

        idc = self._id_col
        ex = batch.select(
            F.col(idc),
            F.explode(
                shingles(self._prep(F.col(self._text_col)), self._n)
            ).alias("sh"),
        ).filter(F.col("sh") != "")
        dirty = (
            ex.join(F.broadcast(self._bsh), "sh", "left_semi")
            .select(idc)
            .distinct()
        )
        return batch.join(dirty, idc, "left_anti")

    def foreach_batch(self, append):
        """Wrap ``append(clean_df, batch_id)`` as a foreachBatch callable."""

        def _fn(batch: DataFrame, batch_id: int) -> None:
            append(self.filter_batch(batch), batch_id)

        return _fn

    def close(self) -> None:
        self._bsh.unpersist()


class SpanDedupGate:
    """Streaming face of :func:`~jsonify2ai_spark.operators.dedup.
    remove_duplicate_spans` (the Lee et al. ExactSubstr rewrite): REWRITE
    every micro-batch document by cutting tokens covered by an ``n``-token
    window whose exact content occurs >= ``min_df`` times in a STATIC
    reference corpus — so verbatim corpus material (syndicated bodies,
    license blocks, quoted boilerplate) never re-enters through the
    ingest stream. Completes the streaming clean chain:
    CorpusNearDupGate (whole docs) -> SpanDedupGate (verbatim spans) ->
    BoilerplateLineGate (line chrome) -> DecontaminationGate (eval leaks).

    Per-batch cost contract: the corpus's HOT window-hash set (occurrence
    count >= min_df — duplicated-content-sized, far smaller than the
    corpus postings) is built once, persisted, and broadcast into each
    batch's window probe WHILE it fits (``broadcast_hot_max`` hashes,
    checked against the materialized build count); a pathological
    near-wholly-duplicated corpus whose hot set approaches corpus size
    falls back to a plain shuffle semi-join instead of an executor-OOM
    broadcast. Either way per-batch work is one positional window-hash
    pass over the BATCH, the semi-probe, and a per-document array fold —
    proportional to the batch, never the corpus.

    Note the semantics: hotness is judged against the CORPUS alone (the
    gate family's static-artifact contract); batch-internal duplicate
    spans are the batch operator's job before appending. The gate's
    cut-everything rule is ALSO Lee et al.'s keep-one globally: every
    corpus-hot span already has >= min_df copies IN the corpus, so
    cutting the incoming occurrence leaves the content surviving there —
    the batch operator's ``keep="one"`` exists for the one-shot case
    where no copy would otherwise survive.
    """

    kind = "rewrite"  # StreamingPrepChain dispatch (see CorpusNearDupGate)
    rewritten_col = "text_dedup"

    def __init__(
        self,
        corpus: DataFrame,
        n: int = 50,
        min_df: int = 2,
        text_col: str = "text",
        id_col: str = "doc_id",
        broadcast_hot_max: int = 2_000_000,
    ) -> None:
        self._n = n
        self._text_col = text_col
        self._id_col = id_col
        self._broadcast_hot_max = broadcast_hot_max
        self._hot = (
            self._windows(corpus)
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= min_df)
            .select("h")
            .persist()
        )
        # materialize before the first trigger; the count doubles as the
        # broadcast-size guard (r7 verdict #5): the hot set is
        # duplicated-content-sized, which a pathological corpus (q106's
        # worst case is ~95% token coverage) can grow toward corpus-sized
        # — broadcasting that would OOM an executor. Above the threshold
        # the per-batch probe falls back to a plain shuffle semi-join,
        # exactly CorpusNearDupGate's r7 treatment of its posting probe.
        self._hot_count = self._hot.count()

    def save(self, path: str) -> None:
        """Persist the hot window-hash set + params for restart warm-load
        (see CorpusNearDupGate.save — same contract)."""
        spark = self._hot.sparkSession
        self._hot.write.mode("overwrite").parquet(f"{path}/hot")
        local_rows_df(spark, 
            [
                (
                    self._n,
                    self._text_col,
                    self._id_col,
                    self._broadcast_hot_max,
                    self._hot_count,
                )
            ],
            "n int, text_col string, id_col string, "
            "broadcast_hot_max long, hot_count long",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "SpanDedupGate":
        meta = spark.read.parquet(f"{path}/meta").first()
        obj = cls.__new__(cls)
        obj._n = int(meta["n"])
        obj._text_col = meta["text_col"]
        obj._id_col = meta["id_col"]
        obj._broadcast_hot_max = int(meta["broadcast_hot_max"])
        obj._hot_count = int(meta["hot_count"])
        obj._hot = spark.read.parquet(f"{path}/hot").persist()
        obj._hot.count()
        return obj

    def _windows(self, df: DataFrame) -> DataFrame:
        """(id, pos, h): positional n-token window hashes, the exact
        construction of the batch operator (md5 let-bound once)."""
        from jsonify2ai_spark.functions.text import tokens

        n = self._n

        def _wins(tk):
            n_w = F.size(tk) - F.lit(n - 1)
            grams = F.transform(
                F.sequence(F.lit(1), n_w),
                lambda i: F.md5(F.concat_ws(" ", F.slice(tk, i, n))),
            )
            return F.when(n_w >= 1, grams).otherwise(
                F.array().cast("array<string>")
            )

        toks = tokens(F.col(self._text_col))
        return df.select(
            F.col(self._id_col),
            F.posexplode(
                F.element_at(F.transform(F.array(toks), _wins), 1)
            ).alias("pos", "h"),
        )

    def filter_batch(self, batch: DataFrame) -> DataFrame:
        """Rewrite ``batch``: corpus-duplicated spans removed, order kept.
        Output: (id, n_tokens, n_kept, text_dedup) — the batch operator's
        schema."""
        from jsonify2ai_spark.functions.text import tokens

        idc, n = self._id_col, self._n
        hot = (
            F.broadcast(self._hot)
            if self._hot_count <= self._broadcast_hot_max
            else self._hot  # oversized hot set: shuffle semi-join instead
        )
        starts = (
            self._windows(batch)
            .join(hot, "h", "left_semi")
            .groupBy(idc)
            .agg(F.array_sort(F.collect_list("pos")).alias("_ss"))
        )
        base = batch.select(
            F.col(idc), tokens(F.col(self._text_col)).alias("_tk")
        )
        joined = base.join(starts, idc, "left").select(
            F.col(idc),
            F.col("_tk"),
            F.coalesce("_ss", F.array().cast("array<int>")).alias("_ss"),
        )
        kept = F.filter(
            F.col("_tk"),
            lambda x, i: ~F.exists(
                F.col("_ss"), lambda s: (s <= i) & (i <= s + F.lit(n - 1))
            ),
        )
        return joined.select(
            F.col(idc),
            F.size("_tk").cast("bigint").alias("n_tokens"),
            F.size(kept).cast("bigint").alias("n_kept"),
            F.concat_ws(" ", kept).alias("text_dedup"),
        )

    def foreach_batch(self, append):
        """Wrap ``append(clean_df, batch_id)`` as a foreachBatch callable."""

        def _fn(batch: DataFrame, batch_id: int) -> None:
            append(self.filter_batch(batch), batch_id)

        return _fn

    def close(self) -> None:
        self._hot.unpersist()


class StreamingPrepChain:
    """Compose the streaming clean gates into ONE foreachBatch stage:
    ``StreamingPrepChain([near_dup_gate, span_gate, line_gate,
    decontamination_gate]).filter_batch(batch)`` applies each gate in
    order — the streaming twin of pipelines.prepare_training_corpus's
    corpus-context stages, with every gate keeping its own build-once
    artifacts and per-batch cost contract.

    The chain reconciles the two gate shapes: FILTER gates (near-dup,
    decontamination) return surviving rows with the input schema and pass
    straight through; REWRITE gates (span dedup, boilerplate lines)
    return (id, rewritten text, counters) only — the chain joins the
    rewritten text back onto the surviving rows' carry columns (a
    broadcast-sized batch-keyed join), so downstream stages and the sink
    see the full input schema with ``text`` updated. Order matters and is
    the caller's choice — with one structural constraint: the span gate
    is TOKEN-level and reassembles text with single spaces (newlines do
    not survive), so LINE-level stages must run before it. Conventional
    order: whole-doc near-dups -> boilerplate lines (line-level) ->
    verbatim spans (token-level) -> eval-leak n-grams (token-level,
    whitespace-insensitive).
    """

    def __init__(self, gates: list, audit: bool = False) -> None:
        self._gates = list(gates)
        # opt-in per-trigger stage card (the streaming face of
        # pipelines.prep_report): ``stage_history`` gains one entry per
        # trigger with rows in/out per gate. Counting is an ACTION per
        # gate boundary (each boundary is lazily checkpointed first so
        # the chain still evaluates once) — leave it off in the hot path
        # and turn it on when a 100 TB stream needs its drops explained.
        self._audit = bool(audit)
        self.stage_history: list[dict] = []

    def filter_batch(
        self, batch: DataFrame, batch_id: int | None = None
    ) -> DataFrame:
        import inspect

        out = batch
        stages = []
        rows_in = batch.count() if self._audit else None
        for gate in self._gates:
            # explicit kind dispatch (r7 advisor): the old column-set
            # heuristic misclassified a batch already carrying a
            # text_dedup column, or a rewrite whose columns coincide with
            # the input's — gate classes now declare their shape.
            kind = getattr(gate, "kind", None)
            if kind not in ("filter", "rewrite"):
                raise TypeError(
                    f"{type(gate).__name__} must declare kind='filter' or "
                    "'rewrite' (+ rewritten_col) to join a StreamingPrepChain"
                )
            # STATEFUL gates (DiversityCapGate) take the batch_id for the
            # at-least-once replay contract; stateless ones don't declare it
            if "batch_id" in inspect.signature(gate.filter_batch).parameters:
                res = gate.filter_batch(out, batch_id=batch_id)
            else:
                res = gate.filter_batch(out)
            if kind == "filter":  # surviving rows, input schema
                out = res
            else:
                idc = gate._id_col
                rewritten = res.select(
                    F.col(idc), F.col(gate.rewritten_col).alias(gate._text_col)
                )
                out = out.drop(gate._text_col).join(rewritten, idc)
            if self._audit:
                out = out.localCheckpoint(eager=False)
                rows_out = out.count()
                stages.append(
                    {
                        "gate": type(gate).__name__,
                        "kind": kind,
                        "rows_in": rows_in,
                        "rows_out": rows_out,
                    }
                )
                rows_in = rows_out
        if self._audit:
            entry = {"batch_id": batch_id, "stages": stages}
            replayed = (
                batch_id is not None
                and self.stage_history
                and self.stage_history[-1]["batch_id"] == batch_id
            )
            if replayed:  # at-least-once hygiene (the monitor contract)
                self.stage_history[-1] = entry
            else:
                self.stage_history.append(entry)
        return out

    def foreach_batch(self, append):
        """Wrap ``append(clean_df, batch_id)`` as a foreachBatch callable
        (batch_id threads through to stateful member gates)."""

        def _fn(batch: DataFrame, batch_id: int) -> None:
            append(self.filter_batch(batch, batch_id=batch_id), batch_id)

        return _fn

    def close(self) -> None:
        for gate in self._gates:
            gate.close()


class DiversityCapGate:
    """Streaming face of :func:`~jsonify2ai_spark.operators.sampling.
    diversity_sample` (q115's SemDeDup/D4-style mode pruning): admit each
    micro-batch row only while its embedding MODE (nearest coarse
    centroid) still has budget — the curation gate a standing ingest runs
    so over-represented shapes (boilerplate templates, spam clusters)
    stop accumulating once their cap is hit, while thin modes keep
    flowing. Completes the gate family's coverage: near-dup (verbatim
    docs), span (verbatim runs), line (chrome), decontamination (eval
    leaks), mixture_monitor (source mix) — and now embedding-space
    density.

    Admission semantics: ARRIVAL ORDER across batches (first come, first
    admitted — the only causal option in a stream; ties inside one batch
    break by hash order, so a single batch is layout-invariant), vs the
    batch operator's global hash-order rank. The K-row admitted-count
    state lives on the driver (K = |centroids|, bounded and tiny), is
    updated per batch, and save/load round-trips it with the centroids —
    a restart resumes the same budgets.

    Per-batch cost contract: assignment is one map-only
    :func:`~jsonify2ai_spark.operators.ann.ivf_assign` pass over the
    BATCH; ranking is one batch-sized window per touched cluster; the
    per-cluster remaining-budget table is a K-row broadcast-joined
    frame (NOT a K-deep chained ``when()`` — expression depth linear in
    |centroids| hits the analyzer/codegen wall at a production
    quantizer's K, r8 verdict #3; the join keeps per-batch planning
    time flat in K, smoke-tested at K=2048); the admitted-count update
    is a K-row collect. Nothing corpus-sized exists anywhere.

    Retry/idempotency contract (this is the family's first STATEFUL
    gate — r8 advisor): ``foreachBatch`` delivers at-least-once, so a
    failed sink write replays the same ``batch_id``. ``filter_batch``
    therefore takes the batch_id; when it equals the last processed id
    the gate re-derives admission from the PRE-debit budget snapshot
    and does NOT debit again — the replay returns byte-identical
    admitted rows without double-charging any cluster. Structured
    Streaming replays at most the one uncommitted batch, so a one-deep
    snapshot is exact; an older batch_id raises (state cannot be
    rewound further). ``save()`` must be coordinated with sink commits:
    call it AFTER the sink's epoch commit (e.g. at the end of the
    foreachBatch body), never between filter and write, or a crash in
    the gap persists a debit the sink never saw — the snapshot makes
    even that recoverable on the next replay.
    """

    kind = "filter"  # StreamingPrepChain dispatch (see CorpusNearDupGate)

    def __init__(
        self,
        centroids: list[list[float]],
        cap: int,
        vector_col: str = "embedding",
        id_col: str = "doc_id",
        impl: str = "auto",
    ) -> None:
        self._centroids = [[float(x) for x in c] for c in centroids]
        self._cap = int(cap)
        self._vector_col = vector_col
        self._id_col = id_col
        self._impl = impl
        self._admitted = {i: 0 for i in range(len(centroids))}
        # pre-debit snapshot of the LAST processed batch: an at-least-once
        # replay of that batch_id re-derives identical admission from this
        # instead of double-debiting (see the class retry contract)
        self._last_batch_id: int | None = None
        self._prev_admitted: dict[int, int] = dict(self._admitted)
        # a batch_id-less (one-shot API) debit interleaved into a stream
        # moves the budgets past the snapshot; replaying the last
        # batch_id then must raise, not re-derive from stale pre-state
        self._snapshot_valid = True

    def filter_batch(
        self, batch: DataFrame, batch_id: int | None = None
    ) -> DataFrame:
        """Rows of ``batch`` admitted under the per-mode budget (input
        schema; the batch's own hash order breaks within-batch ties).
        Pass ``batch_id`` from foreachBatch for replay idempotency: the
        last processed id re-derives from the pre-debit snapshot without
        debiting again; older ids raise (state rewinds one batch only).
        Without a batch_id every call debits (the one-shot batch API)."""
        from jsonify2ai_spark.operators.ann import ivf_assign

        replay = False
        budgets = self._admitted
        if batch_id is not None and self._last_batch_id is not None:
            if batch_id == self._last_batch_id:
                if not self._snapshot_valid:
                    raise ValueError(
                        f"batch_id {batch_id} precedes last processed "
                        "state: a batch_id-less one-shot debit moved the "
                        "budgets past the replay snapshot (review-found "
                        "r9) — don't interleave the one-shot API into a "
                        "live stream"
                    )
                replay = True
                budgets = self._prev_admitted
            elif batch_id < self._last_batch_id:
                raise ValueError(
                    f"batch_id {batch_id} precedes last processed "
                    f"{self._last_batch_id}: the gate keeps a one-deep "
                    "replay snapshot (Structured Streaming replays at "
                    "most the one uncommitted batch)"
                )

        idc = self._id_col
        # a NULL or wrong-dim embedding has no mode: it cannot be capped
        # (fed onward it would crash the arrow assign or pool into one
        # fake NULL-cluster mode that over-drops; review-found r9) — such
        # rows ADMIT uncapped, mirroring prepare_training_corpus's
        # diversity stage, and never debit any budget
        _dim = len(self._centroids[0])
        _valid = F.col(self._vector_col).isNotNull() & (
            F.size(self._vector_col) == _dim
        )
        modeless = batch.filter(~_valid)
        assigned = ivf_assign(
            batch.filter(_valid), self._centroids, self._vector_col,
            impl=self._impl,
        )
        h = F.md5(
            F.concat_ws(
                "|", F.col("cluster").cast("string"), F.col(idc).cast("string")
            )
        )
        from pyspark.sql import Window

        rk = F.row_number().over(
            Window.partitionBy("cluster").orderBy(h.asc(), F.col(idc).asc())
        )
        # K-row (cluster, remaining) frame, broadcast-joined on cluster —
        # planning cost flat in |centroids| (r8 verdict #3; the previous
        # K-deep chained when() grew expression depth linearly in K)
        rem = local_rows_df(batch.sparkSession, 
            [(cid, max(self._cap - used, 0)) for cid, used in budgets.items()],
            "cluster int, _remaining int",
        )
        admitted = (
            assigned.withColumn("_rk", rk)
            .join(F.broadcast(rem), "cluster", "left")
            .filter(F.col("_rk") <= F.coalesce("_remaining", F.lit(0)))
            # one materialization: the budget collect below AND the
            # caller's sink both read this (batch-sized)
            .localCheckpoint(eager=False)
        )
        if not replay:
            # update driver-side budgets (K-row collect, |centroids|-bounded)
            # against the pre-debit snapshot kept for replay
            self._prev_admitted = dict(budgets)
            for r in (
                admitted.groupBy("cluster")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            ):
                self._admitted[int(r["cluster"])] += int(r["n"])
            if batch_id is not None:
                self._last_batch_id = batch_id
                self._snapshot_valid = True
            else:
                # one-shot debit interleaved into a stream: the budgets
                # moved past the snapshot, so mark it unusable — a later
                # replay of _last_batch_id raises instead of re-deriving
                # from stale pre-state (review-found r9)
                self._snapshot_valid = False
        return admitted.drop("cluster", "_rk", "_remaining").unionByName(
            modeless
        )

    def foreach_batch(self, append):
        """Wrap ``append(clean_df, batch_id)`` as a foreachBatch callable
        (batch_id threads through for the replay-idempotency contract)."""

        def _fn(batch: DataFrame, batch_id: int) -> None:
            append(self.filter_batch(batch, batch_id=batch_id), batch_id)

        return _fn

    def save(self, path: str) -> None:
        """Persist centroids + admitted budgets (see CorpusNearDupGate.save
        — same restart contract; the state here is K rows, not corpus
        artifacts)."""
        import json
        import os

        os.makedirs(path, exist_ok=True)
        with open(f"{path}/state.json", "w", encoding="utf-8") as f:
            json.dump(
                {
                    "centroids": self._centroids,
                    "cap": self._cap,
                    "vector_col": self._vector_col,
                    "id_col": self._id_col,
                    "impl": self._impl,
                    "admitted": {str(k): v for k, v in self._admitted.items()},
                    "last_batch_id": self._last_batch_id,
                    "prev_admitted": {
                        str(k): v for k, v in self._prev_admitted.items()
                    },
                    "snapshot_valid": self._snapshot_valid,
                },
                f,
            )

    @classmethod
    def load(cls, spark, path: str) -> "DiversityCapGate":
        import json

        with open(f"{path}/state.json", encoding="utf-8") as f:
            st = json.load(f)
        obj = cls(
            st["centroids"],
            st["cap"],
            vector_col=st["vector_col"],
            id_col=st["id_col"],
            impl=st["impl"],
        )
        obj._admitted = {int(k): int(v) for k, v in st["admitted"].items()}
        obj._last_batch_id = st.get("last_batch_id")
        obj._prev_admitted = {
            int(k): int(v)
            for k, v in st.get("prev_admitted", st["admitted"]).items()
        }
        obj._snapshot_valid = bool(st.get("snapshot_valid", True))
        return obj

    def close(self) -> None:  # no persisted frames; symmetry with the family
        pass


class LeakageGate:
    """Streaming face of :func:`~jsonify2ai_spark.operators.dedup.
    split_leakage_report` (q114's cross-split contamination audit, r9 —
    VERDICT r8 #7): probe each micro-batch's HELD-OUT rows against a
    build-once TRAIN-shingle artifact, so the split audit runs
    continuously as documents arrive instead of as a one-shot corpus
    pass. ``assign_splits`` itself streams unchanged (a pure map); this
    gate is the audit half of the pair.

    Build-once artifact: the train split's distinct word ``n``-grams,
    shingled ONCE at construction and persisted — the DecontaminationGate
    chassis with the benchmark replaced by the pipeline's own train
    split. Per-batch work: explode the batch's held rows into distinct
    (id, shingle) pairs (batch-sized), broadcast THEM into one pass over
    the persisted train set, one per-held-doc count — guarded by
    ``broadcast_held_max`` (a giant backfill batch falls back to a
    shuffled join, same bound as the batch operator's). The train
    artifact is corpus-proportional — it is the SCANNED side, never
    broadcast (the q114 broadcast-guard lesson applies doubly), so
    per-trigger cost is one train-artifact scan: size triggers
    accordingly (batch the probes; a per-document trigger would pay the
    scan per document).

    Two faces: :meth:`report_batch` returns the audit rows
    (id, split, n_shared_ngrams, leaked) for the batch's held docs —
    union over batches equals the batch operator on the replayed corpus
    (parity-pinned); :meth:`filter_batch` is the chain face (kind
    ``filter``): leaked held rows drop, everything else passes with the
    input schema.

    STATIC-TRAIN-SNAPSHOT contract (r10, r9 advisor): the train-shingle
    artifact is a snapshot of the corpus given AT CONSTRUCTION. Held-out
    rows in later micro-batches are audited against that snapshot only —
    train-split rows arriving IN THE STREAM are passed through (they are
    not held-out) but are NOT added to the artifact, so a held document
    that collides only with post-construction train arrivals will read
    clean. The stream==batch parity claim above therefore holds exactly
    when the train side is static. This is the same frozen-artifact
    stance as ``TokenizeGate``'s tokenizer and the IVF centroids:
    growing the train side is an explicit offline event — call
    :meth:`rebuild` with the grown corpus (e.g. on the
    ``refresh_quantizer`` cadence, or whenever the appended train mass
    crosses a few percent), not a silent per-batch mutation (per-batch
    re-shingling of a 100 TB train split would put a corpus-sized job
    inside every trigger).
    """

    kind = "filter"  # StreamingPrepChain dispatch (see CorpusNearDupGate)

    def __init__(
        self,
        corpus: DataFrame,
        split_col: str = "split",
        text_col: str = "text",
        id_col: str = "doc_id",
        n: int = 8,
        train_split: str = "train",
        normalize: bool = False,
        broadcast_held_max: int = 2_000_000,
    ) -> None:
        self._split_col = split_col
        self._text_col = text_col
        self._id_col = id_col
        self._n = n
        self._train_split = train_split
        self._normalize = normalize
        self._broadcast_held_max = broadcast_held_max
        self.rebuild(corpus)  # materializes before the first trigger

    def _prep(self, c):
        if not self._normalize:
            return c
        return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))

    def rebuild(self, corpus: DataFrame) -> None:
        """Re-snapshot the train-shingle artifact from ``corpus`` (the
        grown corpus INCLUDING streamed-in train rows) — the explicit
        offline refresh of the static-train contract, mirroring
        refresh_quantizer: one corpus-proportional job the operator
        schedules, never a per-trigger cost. Subsequent batches audit
        against the new snapshot; the old artifact is unpersisted."""
        from jsonify2ai_spark.functions.text import shingles

        old = getattr(self, "_tsh", None)  # None on first (__init__) build
        self._tsh = (
            corpus.filter(F.col(self._split_col) == self._train_split)
            .select(
                F.explode(
                    shingles(self._prep(F.col(self._text_col)), self._n)
                ).alias("sh")
            )
            .filter(F.col("sh") != "")
            .distinct()
            .persist()
        )
        self._tsh.count()
        if old is not None:
            old.unpersist()

    def report_batch(self, batch: DataFrame) -> DataFrame:
        """Audit rows (id, split, n_shared_ngrams, leaked) for the
        batch's NON-train documents — the batch operator's exact output
        shape, computed against the build-once train artifact."""
        from jsonify2ai_spark.functions.text import shingles

        idc, spc = self._id_col, self._split_col
        held = batch.filter(F.col(spc) != F.lit(self._train_split))
        d = (
            held.select(
                F.col(idc),
                F.explode(
                    shingles(self._prep(F.col(self._text_col)), self._n)
                ).alias("sh"),
            )
            .filter(F.col("sh") != "")
            .distinct()
            # the count below materializes this; the join then reads the
            # checkpoint instead of re-shingling (split_leakage_report's
            # guard pattern)
            .localCheckpoint(eager=False)
        )
        # a normal micro-batch's pairs broadcast; a giant backfill batch
        # (availableNow restart) must NOT force-broadcast a corpus-sized
        # side (review-found r9 — the same unguarded-F.broadcast OOM the
        # batch operator's broadcast_held_max fixed), so fall back to a
        # plain shuffled join above the threshold
        probe = (
            F.broadcast(d) if d.count() <= self._broadcast_held_max else d
        )
        shared = (
            self._tsh.join(probe, "sh")
            .groupBy(idc)
            .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
        )
        return held.select(idc, spc).join(shared, idc, "left").select(
            F.col(idc),
            F.col(spc),
            F.coalesce("n_shared_ngrams", F.lit(0))
            .cast("bigint")
            .alias("n_shared_ngrams"),
            (F.coalesce("n_shared_ngrams", F.lit(0)) > 0).alias("leaked"),
        )

    def filter_batch(self, batch: DataFrame) -> DataFrame:
        """Chain face: LEAKED held rows drop; clean held rows and train
        rows pass through with the input schema."""
        leaked = (
            self.report_batch(batch)
            .filter(F.col("leaked"))
            .select(self._id_col)
        )
        return batch.join(leaked, self._id_col, "left_anti")

    def foreach_batch(self, append):
        """Wrap ``append(clean_df, batch_id)`` as a foreachBatch callable."""

        def _fn(batch: DataFrame, batch_id: int) -> None:
            append(self.filter_batch(batch), batch_id)

        return _fn

    def save(self, path: str) -> None:
        """Persist the train shingle artifact + params for restart
        warm-load (see CorpusNearDupGate.save — same contract)."""
        spark = self._tsh.sparkSession
        self._tsh.write.mode("overwrite").parquet(f"{path}/tsh")
        local_rows_df(spark, 
            [
                (
                    self._split_col,
                    self._text_col,
                    self._id_col,
                    self._n,
                    self._train_split,
                    self._normalize,
                    self._broadcast_held_max,
                )
            ],
            "split_col string, text_col string, id_col string, n int, "
            "train_split string, normalize boolean, "
            "broadcast_held_max long",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "LeakageGate":
        meta = spark.read.parquet(f"{path}/meta").first()
        obj = cls.__new__(cls)
        obj._split_col = meta["split_col"]
        obj._text_col = meta["text_col"]
        obj._id_col = meta["id_col"]
        obj._n = int(meta["n"])
        obj._train_split = meta["train_split"]
        obj._normalize = bool(meta["normalize"])
        # pre-r9-guard artifacts lack the field: default, don't crash
        obj._broadcast_held_max = (
            int(meta["broadcast_held_max"])
            if "broadcast_held_max" in meta.__fields__
            else 2_000_000
        )
        obj._tsh = spark.read.parquet(f"{path}/tsh").persist()
        obj._tsh.count()
        return obj

    def close(self) -> None:
        self._tsh.unpersist()


class TokenizeGate:
    """Streaming face of the token-id chain (q116/:func:`~jsonify2ai_spark.
    operators.bpe.tokenize_to_ids`, r9): encode each micro-batch with a
    FROZEN tokenizer — the merges + vocab minted offline by
    :func:`~jsonify2ai_spark.pipelines.corpus_to_token_shards` (or
    train_bpe + build_vocab) — so a standing ingest emits trainer-ready
    token-id rows with the SAME inventory the training corpus used.
    Incremental corpus growth must NOT re-train the tokenizer (ids would
    shift under the trained model); genuine drift surfaces through the
    ``oov`` policy instead, and a re-train is an explicit offline event
    (mirroring refresh_quantizer's breach -> retrain loop, not a silent
    per-batch mutation).

    Chain shape (APPEND, a degenerate rewrite): ``kind='rewrite'`` with
    ``rewritten_col = _text_col = out_col`` — a column the input does NOT
    carry — so StreamingPrepChain's rewrite join ADDS ``token_ids`` to
    the surviving rows' full schema instead of replacing text. Place it
    LAST: downstream text gates would see unchanged text, but the ids
    reflect the text as of this stage.

    Per-batch cost: one Arrow rank-loop encode + one broadcast-vocab
    Arrow lookup — two map-only projections, proportional to the batch,
    never the corpus. The vocab is collected ONCE at construction
    (tokenizer-sized, 8k-256k entries) and shipped as a broadcast
    variable reused across every trigger; no per-batch collect, no
    shuffle anywhere (the opt-in OOV monitor below adds one batch-sized
    two-scalar aggregate per trigger).

    OOV drift monitor (r10, r9 verdict #6 — the health loop the frozen-
    tokenizer stance needs, completing the refresh_quantizer analogy):
    ``oov_alert=<fraction>`` measures each batch's OOV token rate
    (tokens absent from the frozen vocab / total BPE tokens, counted
    directly against the broadcast mapping so the metric is identical
    under drop/unk/error policies) and records it in
    :attr:`oov_history`; :attr:`oov_breached` flips when the LAST
    batch's rate exceeds the threshold — the "retrain the tokenizer
    offline" signal (rebuild via corpus_to_token_shards, then hand the
    stream a new gate with :meth:`from_artifacts`; ids under the old
    vocab stay valid, which is the point of freezing). Surfaced like
    ``mixture_monitor``: the history is driver-side telemetry, one dict
    per processed batch, not persisted by :meth:`save` (a restarted
    gate starts a fresh window; the threshold itself round-trips).
    """

    kind = "rewrite"  # StreamingPrepChain dispatch (see CorpusNearDupGate)

    def __init__(
        self,
        merges: list,
        vocab: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        out_col: str = "token_ids",
        oov: "str | int" = "drop",
        lowercase: bool = True,
        oov_alert: "float | None" = None,
    ) -> None:
        from jsonify2ai_spark.operators.bpe import _ids_lookup_udf

        # same contract as tokens_to_ids, enforced at CONSTRUCTION — an
        # invalid policy must not surface as a mid-stream per-batch crash
        # (or round-trip through save() as str(True); review-found r9)
        if isinstance(oov, bool) or not (
            oov in ("drop", "error") or isinstance(oov, int)
        ):
            raise ValueError(f"oov must be 'drop', 'error', or an int id: {oov!r}")
        self._merges = [tuple(m) for m in merges]
        self._input_col = text_col
        self._id_col = id_col
        self._oov = oov
        self._lowercase = lowercase
        # append shape: the chain drops-then-joins THIS column, which the
        # input does not carry — so the full schema survives + token_ids
        self._text_col = out_col
        self.rewritten_col = out_col
        self._spark = vocab.sparkSession
        self._mapping = {
            r["token"]: r["token_id"]
            for r in vocab.select("token", "token_id").collect()
        }
        self._udf, self._bc = _ids_lookup_udf(self._spark, self._mapping, oov)
        if oov_alert is not None and not (0.0 <= float(oov_alert) <= 1.0):
            raise ValueError(f"oov_alert must be a fraction in [0, 1]: {oov_alert!r}")
        self._oov_alert = None if oov_alert is None else float(oov_alert)
        self.oov_history: list[dict] = []
        if self._oov_alert is not None:
            from jsonify2ai_spark.operators.bpe import _oov_count_udf

            self._oov_udf = _oov_count_udf(self._bc)

    @property
    def oov_breached(self) -> bool:
        """True when the LAST processed batch's OOV rate exceeded
        ``oov_alert`` — the retrain-the-tokenizer-offline signal."""
        return bool(self.oov_history) and self.oov_history[-1]["breach"]

    @classmethod
    def from_artifacts(cls, spark, out_dir: str, **kw) -> "TokenizeGate":
        """Construct from a :func:`~jsonify2ai_spark.pipelines.
        corpus_to_token_shards` output root (or its ``tokenizer/`` dir) —
        the serving handoff: the batch job mints the artifacts, the
        stream loads them."""
        from jsonify2ai_spark.pipelines import load_tokenizer

        merges, vocab = load_tokenizer(spark, out_dir)
        return cls(merges, vocab, **kw)

    def filter_batch(
        self, batch: DataFrame, batch_id: "int | None" = None
    ) -> DataFrame:
        """Encode the batch: returns (id, out_col ids, n_tokens) — the
        chain joins ids back onto the full row; standalone callers get
        the narrow frame.

        ``batch_id`` (threaded by StreamingPrepChain/foreach_batch like
        the stateful gates') exists for the OOV monitor's replay
        hygiene: the encode itself is stateless, but ``oov_history`` is
        driver state, and Structured Streaming's at-least-once replay
        of an uncommitted trigger would otherwise append the same batch
        twice — skewing history indices/rates and potentially flipping
        ``oov_breached`` on stale data (r10 advisor). A redelivered
        batch_id OVERWRITES the entry it wrote the first time."""
        from jsonify2ai_spark.operators.bpe import bpe_encode_fast

        enc = bpe_encode_fast(
            batch.select(self._id_col, self._input_col),
            self._merges,
            text_col=self._input_col,
            out_col="_toks",
            lowercase=self._lowercase,
        )
        if self._oov_alert is not None:
            # one materialization: the monitor aggregate below AND the
            # caller's sink both read this (batch-sized) — without it the
            # rank-loop encode would run twice per trigger
            enc = enc.localCheckpoint(eager=False)
            row = enc.agg(
                F.coalesce(
                    F.sum(F.size("_toks")), F.lit(0)
                ).cast("bigint").alias("nt"),
                F.coalesce(
                    F.sum(self._oov_udf(F.col("_toks"))), F.lit(0)
                ).cast("bigint").alias("no"),
            ).first()
            nt, no = int(row["nt"]), int(row["no"])
            rate = (no / nt) if nt else 0.0
            entry = {
                "batch": len(self.oov_history),
                "batch_id": batch_id,
                "n_tokens": nt,
                "n_oov": no,
                "oov_rate": rate,
                "breach": rate > self._oov_alert,
            }
            replayed = (
                batch_id is not None
                and self.oov_history
                and self.oov_history[-1]["batch_id"] == batch_id
            )
            if replayed:
                entry["batch"] = self.oov_history[-1]["batch"]
                self.oov_history[-1] = entry
            else:
                self.oov_history.append(entry)
        return enc.select(
            F.col(self._id_col),
            self._udf(F.col("_toks")).alias(self._text_col),
        ).withColumn(
            "n_tokens", F.size(self._text_col).cast("bigint")
        )

    def foreach_batch(self, append):
        """Wrap ``append(ids_df, batch_id)`` as a foreachBatch callable
        (batch_id threads through for the OOV monitor's replay hygiene)."""

        def _fn(batch: DataFrame, batch_id: int) -> None:
            append(self.filter_batch(batch, batch_id=batch_id), batch_id)

        return _fn

    def save(self, path: str) -> None:
        """Persist merges + vocab + params (the corpus_to_token_shards
        tokenizer artifact layout, plus gate meta) for restart warm-load."""
        spark = self._spark
        local_rows_df(spark, 
            [(i, a, b) for i, (a, b) in enumerate(self._merges)],
            "rank int, left string, right string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/merges.parquet")
        local_rows_df(spark, 
            [(t, i) for t, i in self._mapping.items()],
            "token string, token_id long",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/vocab.parquet")
        local_rows_df(spark, 
            [
                (
                    self._input_col,
                    self._id_col,
                    self._text_col,
                    str(self._oov),
                    isinstance(self._oov, int),
                    self._lowercase,
                    self._oov_alert,
                )
            ],
            "text_col string, id_col string, out_col string, oov string, "
            "oov_is_int boolean, lowercase boolean, oov_alert double",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "TokenizeGate":
        meta = spark.read.parquet(f"{path}/meta").first()
        merges = [
            (r["left"], r["right"])
            for r in spark.read.parquet(f"{path}/merges.parquet")
            .orderBy("rank")
            .collect()
        ]
        vocab = spark.read.parquet(f"{path}/vocab.parquet")
        oov = int(meta["oov"]) if meta["oov_is_int"] else meta["oov"]
        # pre-r10 artifacts lack the monitor field: default, don't crash
        alert = (
            meta["oov_alert"] if "oov_alert" in meta.__fields__ else None
        )
        return cls(
            merges,
            vocab,
            text_col=meta["text_col"],
            id_col=meta["id_col"],
            out_col=meta["out_col"],
            oov=oov,
            lowercase=bool(meta["lowercase"]),
            oov_alert=alert,
        )

    def close(self) -> None:
        self._bc.unpersist()


class PackGate:
    """Streaming bin assembly (r10, r9 verdict 'What's missing #1'): the
    streaming face of :func:`~jsonify2ai_spark.operators.packing.
    pack_sequences` + :func:`~jsonify2ai_spark.operators.packing.
    concat_token_bins` — token-id rows arrive per trigger (e.g. from a
    :class:`TokenizeGate` upstream), next-fit packing continues ACROSS
    batches, and each trigger emits the bins that CLOSED (assembled,
    eos-joined, padded trainer sequences); the per-group trailing open
    bin waits in driver state for the next batch. This closes the last
    gap between "stream arrives" and "trainer loads" — previously a
    standing ingest had to run :func:`~jsonify2ai_spark.pipelines.
    append_token_shards` as a periodic batch step.

    Semantics: next-fit in ARRIVAL order across batches (the only causal
    option — DiversityCapGate's admission stance), id order within one
    batch's group (layout-invariant); a bin closes when the next
    document would overflow ``budget``, so a bin is emitted in the
    trigger where its successor's first document arrives, and the final
    open bins are emitted by :meth:`flush` at end of stream (partial,
    like the batch packer's last bin per group). Assembly inside a bin
    is ``id_col`` order (:func:`concat_token_bins`' convention — equal
    to arrival order when upstream delivers ids in order, e.g. the
    replayed-corpus parity test). Stream==batch parity: replaying a
    corpus in id-ordered batches and unioning every trigger's closed
    bins + the flush reproduces ``pack_sequences`` +
    ``concat_token_bins`` row-for-row — pinned by
    ``tests/test_streaming.py::test_pack_gate_stream_equals_batch``
    (plus replay/save-load/boundary/edge pins alongside it); with
    out-of-order
    arrival the batch operator's global id sort and the stream's
    arrival order legitimately diverge (the documented cross-batch
    boundary).

    Scale/state contract: the fold runs executor-side (one
    ``applyInPandas`` over (carried ∪ batch) rows, one batch-keyed
    shuffle — the same shape as the batch packer); driver state is the
    per-group open-bin members, bounded by ``n_groups × budget`` ids
    (plus at most one oversized document per group — next-fit never
    buffers more than one bin), NOT the corpus, and save/load
    round-trips it as JSON next to the config. A K-row (group,
    start_bin) frame broadcast-joins into the fold; closed-bin
    detection is a K-row aggregate; the new open-bin rows are a
    bounded collect.

    Retry/idempotency: DiversityCapGate's one-deep replay-snapshot
    contract, applied verbatim — pass ``batch_id`` from foreachBatch;
    replaying the last processed id re-derives the SAME closed bins
    from the pre-batch state without advancing it, older ids raise,
    and a batch_id-less one-shot call poisons the snapshot.

    Not a :class:`StreamingPrepChain` stage (``kind='terminal'``): the
    output schema is bins, not documents — run it INSIDE the
    foreachBatch body, after the chain, as the sink-side assembler.
    """

    kind = "terminal"  # bins out, not documents — not chain-dispatchable

    def __init__(
        self,
        budget: int,
        n_groups: int = 32,
        eos_id: "int | None" = None,
        pad_id: int = 0,
        boundaries: bool = False,
        ids_col: str = "token_ids",
        id_col: str = "doc_id",
    ) -> None:
        self._budget = int(budget)
        self._n_groups = int(n_groups)
        self._eos_id = eos_id
        self._pad_id = int(pad_id)
        self._boundaries = bool(boundaries)
        self._ids_col = ids_col
        self._id_col = id_col
        # per-group open-bin state: bin index + buffered member docs
        # [(doc_id, [ids]), ...] in fold order — bounded by the budget
        self._next_bin: dict[int, int] = {}
        self._open: dict[int, list] = {}
        self._id_dtype: "str | None" = None
        # one-deep replay snapshot (see DiversityCapGate)
        self._last_batch_id: "int | None" = None
        self._prev_next_bin: dict[int, int] = {}
        self._prev_open: dict[int, list] = {}
        self._snapshot_valid = True

    def _group_col(self, df: DataFrame):
        from pyspark.sql.types import NumericType

        if isinstance(df.schema[self._id_col].dataType, NumericType):
            return (F.col(self._id_col) % self._n_groups).cast("long")
        return F.pmod(F.xxhash64(self._id_col), F.lit(self._n_groups))

    def _snapshot(self) -> tuple:
        return (
            dict(self._next_bin),
            {g: [(i, list(t)) for i, t in docs] for g, docs in self._open.items()},
        )

    def filter_batch(
        self, batch: DataFrame, batch_id: "int | None" = None
    ) -> DataFrame:
        """Fold the batch's (id, ids) rows into the running per-group
        next-fit state and return this trigger's CLOSED bins as
        assembled sequences (concat_token_bins schema: pack_group,
        bin_idx, n_docs, n_ids, input_ids[, doc_ids, doc_lens] — padded
        to the budget). Pass ``batch_id`` from foreachBatch for the
        replay contract."""
        import pandas as pd
        from pyspark.sql.types import LongType, StructField, StructType

        from jsonify2ai_spark.operators.packing import concat_token_bins

        replay = False
        next_bin, open_docs = self._next_bin, self._open
        if batch_id is not None and self._last_batch_id is not None:
            if batch_id == self._last_batch_id:
                if not self._snapshot_valid:
                    raise ValueError(
                        f"batch_id {batch_id} precedes last processed "
                        "state: a batch_id-less one-shot call moved the "
                        "pack state past the replay snapshot — don't "
                        "interleave the one-shot API into a live stream"
                    )
                replay = True
                next_bin, open_docs = self._prev_next_bin, self._prev_open
            elif batch_id < self._last_batch_id:
                raise ValueError(
                    f"batch_id {batch_id} precedes last processed "
                    f"{self._last_batch_id}: the gate keeps a one-deep "
                    "replay snapshot (Structured Streaming replays at "
                    "most the one uncommitted batch)"
                )

        spark = batch.sparkSession
        idc, ids_c = self._id_col, self._ids_col
        self._id_dtype = batch.schema[idc].dataType.simpleString()
        narrow = batch.select(
            F.col(idc),
            F.coalesce(F.col(ids_c), F.array().cast("array<bigint>")).alias(
                ids_c
            ),
            F.lit(False).alias("_carried"),
            F.lit(0).cast("long").alias("_ord"),
        )
        carried_rows = [
            (i, t, True, k)
            for g, docs in open_docs.items()
            for k, (i, t) in enumerate(docs)
        ]
        if carried_rows:
            carried = local_rows_df(spark, 
                carried_rows,
                StructType(
                    [
                        narrow.schema[idc],
                        narrow.schema[ids_c],
                        StructField("_carried", narrow.schema["_carried"].dataType),
                        StructField("_ord", LongType()),
                    ]
                ),
            )
            narrow = narrow.unionByName(carried)
        grouped = narrow.withColumn("pack_group", self._group_col(narrow))
        # K-row start-bin frame, broadcast-joined (flat planning in K);
        # union with next_bin's keys so negative-id groups (outside
        # range(n_groups), see the fold's fillna note) keep their state
        starts = local_rows_df(spark, 
            [
                (g, next_bin.get(g, 0))
                for g in set(range(self._n_groups)) | set(next_bin)
            ],
            "pack_group long, _start_bin long",
        )
        grouped = grouped.join(F.broadcast(starts), "pack_group", "left")

        budget, per_doc_eos = self._budget, (
            1 if self._eos_id is not None else 0
        )
        out_schema = StructType(
            [
                grouped.schema["pack_group"],
                grouped.schema[idc],
                grouped.schema[ids_c],
                StructField("bin_idx", LongType()),
            ]
        )

        def fold(pdf):
            head = pdf[pdf["_carried"]].sort_values("_ord")
            tail = pdf[~pdf["_carried"]].sort_values(idc)
            pdf = pd.concat([head, tail], ignore_index=True)
            # fillna: a negative numeric id hashes outside range(n_groups)
            # (Spark % keeps sign, matching the batch packer) and misses
            # the starts frame — such a group simply starts at bin 0
            b = int(pdf["_start_bin"].fillna(0).iloc[0])
            acc, bins = 0, []
            for ids in pdf[ids_c]:
                w = (0 if ids is None else len(ids)) + per_doc_eos
                if acc > 0 and acc + w > budget:
                    b += 1
                    acc = 0
                acc += w
                bins.append(b)
            pdf["bin_idx"] = bins
            return pdf[["pack_group", idc, ids_c, "bin_idx"]]

        packed = (
            grouped.groupBy("pack_group")
            .applyInPandas(fold, schema=out_schema)
            # one materialization: the open-bin aggregate, the closed-bin
            # assembly, and the buffer collect all read this (batch-sized)
            .localCheckpoint(eager=False)
        )
        opens = {
            int(r["pack_group"]): int(r["mx"])
            for r in packed.groupBy("pack_group")
            .agg(F.max("bin_idx").alias("mx"))
            .collect()
        }
        open_frame = local_rows_df(spark, 
            [(g, b) for g, b in opens.items()] or [(0, -1)],
            "pack_group long, _open_bin long",
        )
        closed = packed.join(F.broadcast(open_frame), "pack_group").filter(
            F.col("bin_idx") < F.col("_open_bin")
        )
        out = concat_token_bins(
            closed,
            ids_col=ids_c,
            id_col=idc,
            eos_id=self._eos_id,
            pad_to=budget,
            pad_id=self._pad_id,
            with_boundaries=self._boundaries,
        )

        if not replay:
            self._prev_next_bin, self._prev_open = self._snapshot()
            # bounded collect: each group's open bin holds < budget ids
            # (+ at most one oversized doc)
            buf_rows = (
                packed.join(F.broadcast(open_frame), "pack_group")
                .filter(F.col("bin_idx") == F.col("_open_bin"))
                .collect()
            )
            for g, b in opens.items():
                self._next_bin[g] = b
            new_open: dict[int, list] = {}
            for r in sorted(
                buf_rows, key=lambda r: (r["pack_group"], r[idc])
            ):
                new_open.setdefault(int(r["pack_group"]), []).append(
                    (r[idc], list(r[ids_c] or []))
                )
            # groups untouched this batch keep their buffered bin
            for g, docs in self._open.items():
                if g not in opens:
                    new_open[g] = docs
            self._open = new_open
            if batch_id is not None:
                self._last_batch_id = batch_id
                self._snapshot_valid = True
            else:
                self._snapshot_valid = False
        return out

    def flush(self) -> "DataFrame | None":
        """Emit the per-group trailing OPEN bins as final (partial)
        sequences — the end-of-stream counterpart of the batch packer's
        last bin per group — and clear the buffers (subsequent batches
        start fresh bins). Returns None when nothing is buffered."""
        from jsonify2ai_spark.operators.packing import concat_token_bins
        from pyspark.sql import SparkSession

        if not any(self._open.values()):
            return None
        spark = SparkSession.getActiveSession()
        rows = [
            (g, i, t, self._next_bin.get(g, 0))
            for g, docs in self._open.items()
            for i, t in docs
        ]
        df = local_rows_df(spark, 
            rows,
            f"pack_group long, {self._id_col} {self._id_dtype}, "
            f"{self._ids_col} array<bigint>, bin_idx long",
        )
        out = concat_token_bins(
            df,
            ids_col=self._ids_col,
            id_col=self._id_col,
            eos_id=self._eos_id,
            pad_to=self._budget,
            pad_id=self._pad_id,
            with_boundaries=self._boundaries,
        ).localCheckpoint(eager=False)
        out.count()  # materialize BEFORE the buffers clear below
        for g in list(self._open):
            if self._open[g]:
                self._next_bin[g] = self._next_bin.get(g, 0) + 1
        self._open = {}
        self._snapshot_valid = False  # flush is a one-shot state move
        return out

    def foreach_batch(self, append):
        """Wrap ``append(bins_df, batch_id)`` as a foreachBatch callable
        (batch_id threads through for the replay contract)."""

        def _fn(batch: DataFrame, batch_id: int) -> None:
            append(self.filter_batch(batch, batch_id=batch_id), batch_id)

        return _fn

    def save(self, path: str) -> None:
        """Persist config + open-bin buffers + replay snapshot (bounded:
        n_groups × budget ids) — see CorpusNearDupGate.save, same
        restart contract."""
        import json
        import os

        os.makedirs(path, exist_ok=True)

        def _ser(open_map):
            return {
                str(g): [[i, list(t)] for i, t in docs]
                for g, docs in open_map.items()
            }

        with open(f"{path}/state.json", "w", encoding="utf-8") as f:
            json.dump(
                {
                    "budget": self._budget,
                    "n_groups": self._n_groups,
                    "eos_id": self._eos_id,
                    "pad_id": self._pad_id,
                    "boundaries": self._boundaries,
                    "ids_col": self._ids_col,
                    "id_col": self._id_col,
                    "id_dtype": self._id_dtype,
                    "next_bin": {str(k): v for k, v in self._next_bin.items()},
                    "open": _ser(self._open),
                    "last_batch_id": self._last_batch_id,
                    "prev_next_bin": {
                        str(k): v for k, v in self._prev_next_bin.items()
                    },
                    "prev_open": _ser(self._prev_open),
                    "snapshot_valid": self._snapshot_valid,
                },
                f,
            )

    @classmethod
    def load(cls, spark, path: str) -> "PackGate":
        import json

        with open(f"{path}/state.json", encoding="utf-8") as f:
            st = json.load(f)
        obj = cls(
            st["budget"],
            n_groups=st["n_groups"],
            eos_id=st["eos_id"],
            pad_id=st["pad_id"],
            boundaries=st["boundaries"],
            ids_col=st["ids_col"],
            id_col=st["id_col"],
        )

        def _de(open_map):
            return {
                int(g): [(i, list(t)) for i, t in docs]
                for g, docs in open_map.items()
            }

        obj._id_dtype = st["id_dtype"]
        obj._next_bin = {int(k): int(v) for k, v in st["next_bin"].items()}
        obj._open = _de(st["open"])
        obj._last_batch_id = st["last_batch_id"]
        obj._prev_next_bin = {
            int(k): int(v) for k, v in st["prev_next_bin"].items()
        }
        obj._prev_open = _de(st["prev_open"])
        obj._snapshot_valid = bool(st["snapshot_valid"])
        return obj

    def close(self) -> None:  # no persisted frames; symmetry with the family
        pass


class DSIRGate:
    """Streaming face of DSIR data selection (q120 /
    :func:`~jsonify2ai_spark.operators.sampling.dsir_weights` +
    ``dsir_resample``, Xie et al. 2023): score each micro-batch's
    documents against FROZEN hashed-n-gram bucket models — the
    target/raw importance models fitted offline at construction — so a
    standing ingest annotates (or thins) arriving documents toward the
    target distribution with the SAME arithmetic the batch selector
    used. The frozen-artifact stance of the family (TokenizeGate's
    tokenizer, LeakageGate's train shingles, the IVF centroids): corpus
    drift does not silently refit the models per trigger; refreshing is
    the explicit offline :meth:`rebuild`.

    Two chain shapes, declared at construction:

    - ``key_cutoff=None`` (default): ANNOTATE — ``kind='rewrite'`` with
      an append-shaped ``rewritten_col = out_col`` the input does not
      carry, so StreamingPrepChain ADDS ``dsir_log_weight`` to surviving
      rows. Featureless (empty-text) documents annotate NULL — total
      over the batch, never row-dropping.
    - ``key_cutoff=<float>``: THIN — ``kind='filter'``; keep a document
      iff its deterministic Gumbel key ``round(log_w/T + g(id), 4)`` ≥
      the cutoff, the streaming analog of ``dsir_resample`` (a stream
      cannot take a global top-k, so the caller calibrates the cutoff
      offline — :func:`~jsonify2ai_spark.operators.sampling.
      calibrate_dsir_cutoff` derives it as the k-th ``resample_key``
      of a batch resample over a calibration corpus — and the gate
      applies it per document).
      Same md5 uniforms, same 4dp-rounded key, so a replayed batch
      keeps exactly the same rows: idempotent under at-least-once
      delivery with NO cross-batch state. Featureless documents have no
      weight and no ticket — they drop, matching the batch operator.

    Per-trigger cost: gram hashing is a map-side column expression; one
    batch-sized (id, bucket) rollup; one join against the persisted
    ≤``buckets``-row logratio table (broadcast while ``buckets`` ≤
    ``broadcast_model_max``, shuffled join above it — the LeakageGate
    guard convention). Buckets a batch hashes into that NEITHER fit-time
    model saw (genuinely novel text — impossible at fit time, routine
    under drift) fold to the constant smoothing logratio
    ``ln(Nr + αB) − ln(Nt + αB)``, the Laplace value both models assign
    a count-0 bucket; :meth:`score_batch` on the fit corpus itself
    reproduces ``dsir_weights`` row-for-row (parity-pinned in tests).

    Reference anchor: no counterpart in the reference (single-node, no
    curation pipeline); the batch/stream split mirrors this repo's
    gate-family design only.
    """

    def __init__(
        self,
        raw: DataFrame,
        target: DataFrame,
        buckets: int = 10_000,
        alpha: float = 1.0,
        text_col: str = "text",
        id_col: str = "doc_id",
        target_text_col: str | None = None,
        key_cutoff: float | None = None,
        temperature: float = 1.0,
        salt: str = "dsir-v1",
        out_col: str = "dsir_log_weight",
        broadcast_model_max: int = 4_000_000,
        drift_alert: float | None = None,
    ) -> None:
        self._buckets = int(buckets)
        self._alpha = float(alpha)
        self._input_col = text_col
        self._text_col = out_col  # chain rewrite destination (append)
        self._id_col = id_col
        self._key_cutoff = None if key_cutoff is None else float(key_cutoff)
        self._temperature = float(temperature)
        self._salt = salt
        self._broadcast_model_max = int(broadcast_model_max)
        self._drift_alert = None if drift_alert is None else float(drift_alert)
        self.drift_history: list[dict] = []
        self.kind = "filter" if self._key_cutoff is not None else "rewrite"
        self.rewritten_col = out_col
        self.rebuild(raw, target, target_text_col=target_text_col)

    @property
    def drift_breached(self) -> bool:
        """True when the LAST processed batch's UNSEEN-feature rate
        (fraction of its gram mass hashing to buckets NEITHER fit-time
        model saw) exceeded ``drift_alert`` — the models no longer
        describe the stream; :meth:`rebuild` offline and recalibrate the
        cutoff. The exact analog of TokenizeGate's ``oov_breached``.
        The mean log-weight is deliberately NOT the signal: under
        Laplace smoothing an unseen bucket's logratio is the constant
        ln((Nr+αB)/(Nt+αB)) — usually POSITIVE when the target is a
        slice of raw (the smaller corpus has the higher smoothing
        floor), so fully-novel text can look target-like by weight
        while being invisible to both models. Unseen mass measures
        that invisibility directly."""
        return bool(self.drift_history) and self.drift_history[-1]["breach"]

    def rebuild(
        self,
        raw: DataFrame,
        target: DataFrame,
        target_text_col: str | None = None,
    ) -> None:
        """Refit the bucket models from the grown corpora — the explicit
        offline refresh (refresh_quantizer cadence), one pair of
        corpus-proportional count rollups, never a per-trigger cost. The
        old logratio artifact is unpersisted."""
        import math

        from jsonify2ai_spark.functions.text import tokens
        from jsonify2ai_spark.operators.sampling import _gram_buckets_of

        def counts(frame: DataFrame, col: str, alias: str) -> DataFrame:
            return (
                frame.select(tokens(col).alias("_tk"))
                .select(
                    F.explode(
                        _gram_buckets_of(F.col("_tk"), self._buckets)
                    ).alias("bucket")
                )
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).alias(alias))
            )

        a, b = self._alpha, float(self._buckets)
        tc = counts(target, target_text_col or self._input_col, "tc")
        rc = counts(raw, self._input_col, "rc")
        totals = (
            tc.join(rc, "bucket", "outer")
            .agg(
                F.sum(F.coalesce("tc", F.lit(0))).cast("double").alias("Nt"),
                F.sum(F.coalesce("rc", F.lit(0))).cast("double").alias("Nr"),
            )
            .first()
        )
        self._nt, self._nr = float(totals["Nt"]), float(totals["Nr"])
        logratio = (
            F.log((F.coalesce("tc", F.lit(0)) + F.lit(a)) / F.lit(self._nt + a * b))
            - F.log((F.coalesce("rc", F.lit(0)) + F.lit(a)) / F.lit(self._nr + a * b))
        ).alias("logratio")
        old = getattr(self, "_model", None)
        self._model = (
            tc.join(rc, "bucket", "outer").select("bucket", logratio).persist()
        )
        self._model.count()
        if old is not None:
            old.unpersist()
        # count-0 bucket under both models (novel text): α cancels
        self._unseen = math.log(self._nr + a * b) - math.log(self._nt + a * b)

    def _scores(self, batch: DataFrame) -> DataFrame:
        from jsonify2ai_spark.functions.text import tokens
        from jsonify2ai_spark.operators.sampling import _gram_buckets_of

        idc = self._id_col
        doc_counts = (
            batch.select(F.col(idc), tokens(self._input_col).alias("_tk"))
            .select(
                F.col(idc),
                F.explode(
                    _gram_buckets_of(F.col("_tk"), self._buckets)
                ).alias("bucket"),
            )
            .groupBy(idc, "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        model = (
            F.broadcast(self._model)
            if self._buckets <= self._broadcast_model_max
            else self._model
        )
        logw = F.sum(F.col("c") * F.col("lr"))
        return (
            doc_counts.join(model, "bucket", "left")
            .select(
                F.col(idc),
                F.col("c"),
                F.coalesce("logratio", F.lit(self._unseen)).alias("lr"),
                F.when(F.col("logratio").isNull(), F.col("c"))
                .otherwise(F.lit(0))
                .alias("u"),
            )
            .groupBy(idc)
            .agg(
                F.sum("c").cast("bigint").alias("n_feats"),
                (F.round(logw, 4) + F.lit(0.0)).alias("log_weight"),
                (F.round(logw / F.sum("c"), 4) + F.lit(0.0)).alias(
                    "logw_per_feat"
                ),
                F.sum("u").cast("bigint").alias("n_unseen"),
            )
        )

    def score_batch(self, batch: DataFrame) -> DataFrame:
        """Audit face: (id, n_feats, log_weight, logw_per_feat,
        n_unseen) for the batch's documents with ≥1 token —
        dsir_weights' exact arithmetic under the frozen models, plus
        the per-doc count of features in buckets neither model saw
        (the drift monitor's raw signal)."""
        return self._scores(batch)

    def _record_drift(self, scores: DataFrame, batch_id: "int | None"):
        """Batch unseen-feature rate (plus mean log-weight telemetry)
        into ``drift_history`` — with the replay-overwrite hygiene of
        TokenizeGate's OOV monitor (an at-least-once redelivery must not
        append the same batch twice)."""
        row = scores.agg(
            F.coalesce(F.sum("log_weight"), F.lit(0.0)).alias("lw"),
            F.coalesce(F.sum("n_feats"), F.lit(0)).cast("bigint").alias("nf"),
            F.coalesce(F.sum("n_unseen"), F.lit(0)).cast("bigint").alias("nu"),
        ).first()
        nf, nu = int(row["nf"]), int(row["nu"])
        rate = (nu / nf) if nf else 0.0
        entry = {
            "batch": len(self.drift_history),
            "batch_id": batch_id,
            "n_feats": nf,
            "n_unseen": nu,
            "unseen_rate": rate,
            "logw_per_feat": (float(row["lw"]) / nf) if nf else 0.0,
            "breach": rate > self._drift_alert,
        }
        replayed = (
            batch_id is not None
            and self.drift_history
            and self.drift_history[-1]["batch_id"] == batch_id
        )
        if replayed:
            entry["batch"] = self.drift_history[-1]["batch"]
            self.drift_history[-1] = entry
        else:
            self.drift_history.append(entry)

    def filter_batch(
        self, batch: DataFrame, batch_id: "int | None" = None
    ) -> DataFrame:
        """Chain face. Annotate mode (rewrite): every input id with its
        4dp log_weight (NULL when featureless). Thin mode (filter):
        surviving input rows, input schema. ``batch_id`` (threaded by
        the chain) serves only the drift monitor's replay hygiene —
        scoring itself is stateless."""
        from jsonify2ai_spark.operators.sampling import _BUCKETS, sample_hash

        idc = self._id_col
        scores = self._scores(batch)
        if self._drift_alert is not None:
            # one materialization: the monitor aggregate AND the
            # annotate/thin consumer both read this batch-sized frame
            scores = scores.localCheckpoint(eager=False)
            self._record_drift(scores, batch_id)
        if self._key_cutoff is None:
            return (
                batch.select(idc)
                .join(scores, idc, "left")
                .select(
                    F.col(idc),
                    F.col("log_weight").alias(self.rewritten_col),
                )
            )
        u = (sample_hash(F.col(idc), self._salt) + F.lit(0.5)) / F.lit(
            float(_BUCKETS)
        )
        key = F.round(
            F.col("log_weight") / F.lit(self._temperature) - F.log(-F.log(u)),
            4,
        ) + F.lit(0.0)
        keep = scores.filter(key >= F.lit(self._key_cutoff)).select(idc)
        return batch.join(keep, idc, "left_semi")

    def foreach_batch(self, append):
        """Wrap ``append(df, batch_id)`` as a foreachBatch callable.
        ``batch_id`` is threaded into ``filter_batch`` so the drift
        monitor's replay-overwrite hygiene holds on the standalone
        foreachBatch path too (TokenizeGate.foreach_batch contract —
        an at-least-once redelivery must not append a duplicate
        drift_history entry)."""

        def _fn(batch: DataFrame, batch_id: int) -> None:
            append(self.filter_batch(batch, batch_id=batch_id), batch_id)

        return _fn

    def save(self, path: str) -> None:
        """Persist the logratio model + params for restart warm-load
        (CorpusNearDupGate.save contract)."""
        spark = self._model.sparkSession
        self._model.write.mode("overwrite").parquet(f"{path}/model")
        local_rows_df(spark, 
            [
                (
                    self._buckets,
                    self._alpha,
                    self._input_col,
                    self._id_col,
                    self._key_cutoff,
                    self._temperature,
                    self._salt,
                    self.rewritten_col,
                    self._broadcast_model_max,
                    self._nt,
                    self._nr,
                    self._drift_alert,
                )
            ],
            "buckets long, alpha double, text_col string, id_col string, "
            "key_cutoff double, temperature double, salt string, "
            "out_col string, broadcast_model_max long, nt double, nr double, "
            "drift_alert double",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "DSIRGate":
        import math

        meta = spark.read.parquet(f"{path}/meta").first()
        obj = cls.__new__(cls)
        obj._buckets = int(meta["buckets"])
        obj._alpha = float(meta["alpha"])
        obj._input_col = meta["text_col"]
        obj._id_col = meta["id_col"]
        obj._key_cutoff = (
            None if meta["key_cutoff"] is None else float(meta["key_cutoff"])
        )
        obj._temperature = float(meta["temperature"])
        obj._salt = meta["salt"]
        obj._text_col = meta["out_col"]
        obj.rewritten_col = meta["out_col"]
        obj._broadcast_model_max = int(meta["broadcast_model_max"])
        obj._nt, obj._nr = float(meta["nt"]), float(meta["nr"])
        # artifacts saved before the monitor existed lack the field
        obj._drift_alert = (
            float(meta["drift_alert"])
            if "drift_alert" in meta.__fields__
            and meta["drift_alert"] is not None
            else None
        )
        obj.drift_history = []
        obj.kind = "filter" if obj._key_cutoff is not None else "rewrite"
        a, b = obj._alpha, float(obj._buckets)
        obj._unseen = math.log(obj._nr + a * b) - math.log(obj._nt + a * b)
        obj._model = spark.read.parquet(f"{path}/model").persist()
        obj._model.count()
        return obj

    def close(self) -> None:
        self._model.unpersist()


class PerplexityGate:
    """Streaming face of the CCNet reference-LM quality filter
    (:func:`~jsonify2ai_spark.operators.textstats.unigram_logprob` with
    ``reference=`` — q108's oracle-verified arithmetic): a
    Laplace-smoothed unigram model fits ONCE on the high-quality
    reference corpus (the Wikipedia-class LM), then every trigger's
    documents score against the FROZEN model — low mean log-probability
    = far from the quality distribution.

    Modes (the DSIRGate convention):
    - ``max_ppl=None`` (default): ANNOTATE — ``kind='rewrite'``,
      ``rewritten_col='ref_ppl'`` added to every surviving row
      (tokenless docs annotate NULL; total, never row-dropping).
    - ``max_ppl=<float>``: THIN — ``kind='filter'``; keep a document
      iff its 4dp-rounded perplexity ≤ the cutoff. Scoring is
      stateless and deterministic, so a replayed batch keeps exactly
      the same rows — idempotent under at-least-once delivery with no
      cross-batch state. Tokenless docs have no score and drop (the
      batch operator emits no row for them either).

    Per-trigger cost: one (id, word) rollup over the batch, one join
    against the persisted vocab (``F.broadcast`` hint while the fitted
    vocabulary is ≤ ``broadcast_vocab_max`` rows; above it the hint is
    withheld and Catalyst plans a shuffled join — a 100 TB reference's
    ~1e8-word vocab must never be forced into executor memory; both
    arms parity-pinned at birth, the DSIRGate r11-verdict lesson), and
    a batch-sized mean. The model side is reference-sized ONCE, never
    per trigger; ``rebuild()`` refits offline when the reference grows.

    ``drift_alert``: the DSIRGate drift lesson applied to the PPL gate
    (r12 verdict #7). Laplace smoothing makes NOVEL words score the
    constant floor ln(alpha / (N + alpha*V)) — bounded, so a stream
    drifting wholly out of the reference vocabulary moves mean
    perplexity smoothly while the model has stopped describing the
    data. The honest signal is the UNSEEN-WORD RATE: the fraction of
    the trigger's tokens whose word the frozen reference never saw.
    With ``drift_alert=<rate>``, every trigger records (n_tokens,
    n_unseen, unseen_rate, breach) into ``drift_history`` with
    at-least-once replay-overwrite hygiene (a redelivered batch_id
    overwrites its own entry, never appends a duplicate);
    ``drift_breached`` tells the operator to ``rebuild()``.
    """

    kind: str

    def __init__(
        self,
        reference: DataFrame,
        max_ppl: "float | None" = None,
        alpha: float = 1.0,
        text_col: str = "text",
        id_col: str = "doc_id",
        ref_text_col: "str | None" = None,
        broadcast_vocab_max: int = 4_000_000,
        drift_alert: "float | None" = None,
    ) -> None:
        self._alpha = float(alpha)
        self._input_col = text_col
        self._text_col = "ref_ppl"  # chain rewrite destination (append)
        self._id_col = id_col
        self._max_ppl = None if max_ppl is None else float(max_ppl)
        self._broadcast_vocab_max = int(broadcast_vocab_max)
        self._drift_alert = None if drift_alert is None else float(drift_alert)
        self.drift_history: list[dict] = []
        self.kind = "filter" if self._max_ppl is not None else "rewrite"
        self.rewritten_col = "ref_ppl"
        self._fit(reference, ref_text_col or text_col)

    @property
    def drift_breached(self) -> bool:
        """True when the latest trigger's unseen-word rate exceeded
        ``drift_alert`` — the frozen reference LM no longer describes
        the stream (mean perplexity alone cannot say so: every unseen
        word scores the same bounded smoothing floor). Refresh with
        :meth:`rebuild`."""
        return bool(self.drift_history) and self.drift_history[-1]["breach"]

    def _fit(self, reference: DataFrame, ref_text_col: str) -> None:
        from jsonify2ai_spark.functions.text import tokens

        old = getattr(self, "_vocab", None)
        self._vocab = (
            reference.select(F.explode(tokens(ref_text_col)).alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("c"))
            .persist()
        )
        self._vocab_rows = self._vocab.count()
        row = self._vocab.agg(
            F.sum("c").cast("double").alias("N"),
            F.count(F.lit(1)).cast("double").alias("V"),
        ).first()
        self._n, self._v = float(row["N"] or 0.0), float(row["V"] or 0.0)
        if old is not None:
            old.unpersist()

    def rebuild(self, reference: DataFrame, ref_text_col: "str | None" = None) -> None:
        """Offline model refresh from the grown reference — one
        reference-proportional rollup, never a per-trigger cost."""
        self._fit(reference, ref_text_col or self._input_col)

    def score_batch(self, batch: DataFrame) -> DataFrame:
        """(id, n_tokens, n_unseen, logprob_per_token, ppl) for the
        batch's documents with ≥1 token — unigram_logprob(reference=...)'s
        exact arithmetic under the frozen model; ``n_unseen`` counts the
        doc's tokens whose word the reference never saw (the drift
        monitor's raw signal)."""
        from jsonify2ai_spark.functions.text import tokens

        idc = self._id_col
        dw = (
            batch.select(F.col(idc), F.explode(tokens(self._input_col)).alias("w"))
            .groupBy(idc, "w")
            .agg(F.count(F.lit(1)).alias("dc"))
        )
        vocab = (
            F.broadcast(self._vocab)
            if self._vocab_rows <= self._broadcast_vocab_max
            else self._vocab
        )
        logp = F.log(
            (F.coalesce("c", F.lit(0)) + F.lit(self._alpha))
            / (F.lit(self._n) + F.lit(self._alpha) * F.lit(self._v))
        )
        per_doc = (
            dw.join(vocab, "w", "left")
            .groupBy(idc)
            .agg(
                F.sum("dc").cast("bigint").alias("n_tokens"),
                F.coalesce(
                    F.sum(F.when(F.col("c").isNull(), F.col("dc"))), F.lit(0)
                ).cast("bigint").alias("n_unseen"),
                (F.sum(F.col("dc") * logp) / F.sum("dc")).alias("_lp"),
            )
        )
        return per_doc.select(
            F.col(idc),
            "n_tokens",
            "n_unseen",
            F.round("_lp", 4).alias("logprob_per_token"),
            F.round(F.exp(-F.col("_lp")), 4).alias("ppl"),
        )

    def _record_drift(self, scores: DataFrame, batch_id: "int | None"):
        """Batch unseen-word rate into ``drift_history`` — the
        DSIRGate/TokenizeGate replay-overwrite hygiene (an at-least-once
        redelivery must not append the same batch twice)."""
        row = scores.agg(
            F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("bigint").alias("nt"),
            F.coalesce(F.sum("n_unseen"), F.lit(0)).cast("bigint").alias("nu"),
        ).first()
        nt, nu = int(row["nt"]), int(row["nu"])
        rate = (nu / nt) if nt else 0.0
        entry = {
            "batch": len(self.drift_history),
            "batch_id": batch_id,
            "n_tokens": nt,
            "n_unseen": nu,
            "unseen_rate": rate,
            "breach": rate > self._drift_alert,
        }
        replayed = (
            batch_id is not None
            and self.drift_history
            and self.drift_history[-1]["batch_id"] == batch_id
        )
        if replayed:
            entry["batch"] = self.drift_history[-1]["batch"]
            self.drift_history[-1] = entry
        else:
            self.drift_history.append(entry)

    def filter_batch(
        self, batch: DataFrame, batch_id: "int | None" = None
    ) -> DataFrame:
        idc = self._id_col
        scores = self.score_batch(batch)
        if self._drift_alert is not None:
            # one materialization: the monitor aggregate AND the
            # annotate/thin consumer both read this batch-sized frame
            scores = scores.localCheckpoint(eager=False)
            self._record_drift(scores, batch_id)
        if self._max_ppl is None:
            return (
                batch.select(idc)
                .join(scores.select(idc, "ppl"), idc, "left")
                .select(F.col(idc), F.col("ppl").alias(self.rewritten_col))
            )
        keep = scores.filter(F.col("ppl") <= F.lit(self._max_ppl)).select(idc)
        return batch.join(keep, idc, "left_semi")

    def foreach_batch(self, append):
        """Wrap ``append(df, batch_id)`` as a foreachBatch callable;
        ``batch_id`` is threaded into :meth:`filter_batch` so the drift
        monitor's replay-overwrite hygiene holds on the standalone path
        too (the DSIRGate r11-advisor contract)."""

        def _fn(batch: DataFrame, batch_id: int) -> None:
            append(self.filter_batch(batch, batch_id=batch_id), batch_id)

        return _fn

    def save(self, path: str) -> None:
        """Persist the vocab model + params for restart warm-load."""
        spark = self._vocab.sparkSession
        self._vocab.write.mode("overwrite").parquet(f"{path}/vocab")
        local_rows_df(spark, 
            [
                (
                    self._alpha,
                    self._input_col,
                    self._id_col,
                    self._max_ppl,
                    self._broadcast_vocab_max,
                    self._n,
                    self._v,
                )
            ],
            "alpha double, text_col string, id_col string, max_ppl double, "
            "broadcast_vocab_max long, n double, v double",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
        if self._drift_alert is not None:
            # sidecar rather than a meta column: pre-r13 artifacts stay
            # loadable with the fixed meta schema above
            local_rows_df(spark, 
                [(self._drift_alert,)], "drift_alert double"
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{path}/drift_meta"
            )

    @classmethod
    def load(cls, spark, path: str) -> "PerplexityGate":
        import os

        meta = spark.read.parquet(f"{path}/meta").first()
        obj = cls.__new__(cls)
        obj._alpha = float(meta["alpha"])
        obj._input_col = meta["text_col"]
        obj._text_col = "ref_ppl"
        obj._id_col = meta["id_col"]
        obj._max_ppl = None if meta["max_ppl"] is None else float(meta["max_ppl"])
        obj._broadcast_vocab_max = int(meta["broadcast_vocab_max"])
        obj._n, obj._v = float(meta["n"]), float(meta["v"])
        obj._drift_alert = None
        obj.drift_history = []
        if os.path.isdir(f"{path}/drift_meta"):
            obj._drift_alert = float(
                spark.read.parquet(f"{path}/drift_meta").first()["drift_alert"]
            )
        obj.kind = "filter" if obj._max_ppl is not None else "rewrite"
        obj.rewritten_col = "ref_ppl"
        obj._vocab = spark.read.parquet(f"{path}/vocab").persist()
        obj._vocab_rows = obj._vocab.count()
        return obj

    def close(self) -> None:
        self._vocab.unpersist()


class BloomDedupGate:
    """Exact-dedup streaming gate with a broadcast Bloom-filter prefilter:
    drop every micro-batch row whose (whitespace-normalized) content
    fingerprint already exists in a STATIC reference corpus, at a
    per-batch cost where the common case — a novel document — is decided
    MAP-SIDE with zero shuffle.

    Why a Bloom filter when CorpusNearDupGate already amortizes the
    corpus: that gate (and an exact fingerprint anti-join) still probes a
    corpus-sized distributed table every trigger — on a CLUSTER that is a
    per-trigger network reshuffle of the corpus side, growing with the
    corpus. Here the corpus collapses to an m-bit bitmap broadcast once
    to every executor (m = 10 bits/doc at fp 1%: a 1e9-doc corpus is a
    1.25 GB broadcast — size ``m_bits`` to the corpus and fall back to
    the join gate past executor memory). Each batch row tests its k
    positions against the local bitmap:

    - bloom-negative  -> DEFINITELY novel (no false negatives): emitted
      with no shuffle at all;
    - bloom-positive  -> true duplicate OR false positive (rate
      ~(1-e^{-kn/m})^k, :meth:`fp_rate_estimate`): verified EXACTLY
      against the persisted fingerprint table, a candidate-sized
      left-semi probe, so the gate's OUTPUT is exactly the fingerprint
      anti-join's — the bloom changes cost, never the answer.

    Positions are computed in the JVM (conv of md5(fp || "#i"), 60-bit,
    engine-deterministic); Python only tests bits against a shared numpy
    bitmap (Arrow-batched), so there is no cross-language hash parity to
    maintain. Build is one corpus scan: per-partition packed bitmaps
    (mapInPandas) OR-folded on the driver via toLocalIterator — driver
    peak is one m/8-byte buffer per in-flight partition chunk, never the
    position list.

    MEASURED regime (bench_bloom_gate.py, PERF.md): on local[32] the
    plain anti-join gate wins at every corpus size that fits the bench —
    a single-JVM shuffle is memory-local, so the reshuffle this gate
    avoids costs ~nothing there, while the bitmap probe pays a fixed
    ~1-3 s Arrow round-trip per trigger. Deploy this gate on multi-node
    clusters with >=1e9-doc corpora (where the join arm's per-trigger
    corpus reshuffle crosses the network); locally prefer the anti-join
    with auto-broadcast disabled. Output parity is test-pinned either
    way — choosing wrong costs time, never correctness.
    """

    kind = "filter"

    def __init__(
        self,
        corpus: DataFrame,
        m_bits: int = 1 << 22,
        n_hashes: int = 5,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        from jsonify2ai_spark.operators.dedup import _content_fingerprint

        if m_bits < 8:
            raise ValueError(f"m_bits must be >= 8, got {m_bits}")
        if n_hashes < 1:
            raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
        self._m = int(m_bits)
        self._k = int(n_hashes)
        self._text_col = text_col
        self._id_col = id_col
        # NULL text -> NULL fingerprint: such rows can never be duplicates
        # (the anti-join parity contract: NULL never equi-joins), so they
        # are excluded from the bitmap and bypass the probe (review-found:
        # NULL positions crashed both the build fold and the probe UDF)
        fps = (
            corpus.select(_content_fingerprint(F.col(text_col)).alias("_fp"))
            .filter(F.col("_fp").isNotNull())
            .distinct()
        )
        # exact-verification side: fingerprints clustered on their own
        # value so candidate probes shuffle only the candidates
        self._fps = fps.repartition(F.col("_fp")).persist()
        self._n_corpus = self._fps.count()
        self._bitmap = self._build_bitmap(
            self._fps.select(
                F.explode(self._positions(F.col("_fp"))).alias("pos")
            )
        )
        self._bc = corpus.sparkSession.sparkContext.broadcast(self._bitmap)

    # ---- hashing ----------------------------------------------------

    def _positions(self, fp):
        cols = [
            (
                F.conv(
                    F.substring(F.md5(F.concat(fp, F.lit(f"#{i}"))), 1, 15),
                    16,
                    10,
                ).cast("long")
                % F.lit(self._m)
            )
            for i in range(self._k)
        ]
        return F.array(*cols)

    def _build_bitmap(self, pos_df: DataFrame):
        import numpy as np
        import pandas as pd

        nbytes = (self._m + 7) // 8

        def fold(it):
            buf = np.zeros(nbytes, dtype=np.uint8)
            any_rows = False
            for pdf in it:
                if len(pdf):
                    any_rows = True
                    p = pdf["pos"].to_numpy(dtype=np.int64)
                    np.bitwise_or.at(buf, p >> 3, (1 << (p & 7)).astype(np.uint8))
            if any_rows:
                yield pd.DataFrame({"chunk": [buf.tobytes()]})

        final = np.zeros(nbytes, dtype=np.uint8)
        for row in pos_df.mapInPandas(fold, "chunk binary").toLocalIterator():
            final |= np.frombuffer(row["chunk"], dtype=np.uint8)
        return final

    def _hit_udf(self):
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        bc = self._bc

        def _test(positions):
            bm = bc.value

            def one(ps):
                # NULL fingerprint -> NULL positions: definitely not in
                # the corpus (parity with the NULL-never-joins baseline).
                # Arrow delivers NULL elements as None (object array) or
                # NaN (float array) depending on the batch — guard both.
                if ps is None:
                    return False
                a = np.asarray(ps)
                if a.dtype == object:
                    if any(x is None for x in a):
                        return False
                    a = a.astype(np.int64)
                elif a.dtype.kind == "f":
                    if np.isnan(a).any():
                        return False
                    a = a.astype(np.int64)
                else:
                    a = a.astype(np.int64)
                return bool(np.all(bm[a >> 3] & (1 << (a & 7)).astype(np.uint8)))

            return pd.Series([one(p) for p in positions], dtype="bool")

        return pandas_udf(_test, "boolean")

    # ---- serving ----------------------------------------------------

    def probe_batch(self, batch: DataFrame) -> DataFrame:
        """Audit face: ``(id, bloom_hit, is_dup)`` per batch row —
        bloom_hit from the bitmap alone, is_dup after exact verification
        (every is_dup has bloom_hit; the gap is the realized FP rate).
        Per-ROW semantics keyed on the fingerprint (r13 advisor: the
        previous id-equality re-join fanned out on repeated batch ids
        and never matched NULL ids); the id column is carried through
        untouched, whatever its contents."""
        from jsonify2ai_spark.operators.dedup import _content_fingerprint

        hit = self._hit_udf()
        probed = batch.select(
            F.col(self._id_col),
            _content_fingerprint(F.col(self._text_col)).alias("_fp"),
        ).withColumn(
            # NULL text -> NULL fingerprint -> NULL positions: never a
            # dup (NULL never equi-joins), so a definite bloom miss
            "bloom_hit",
            F.coalesce(hit(self._positions(F.col("_fp"))), F.lit(False)),
        )
        neg = probed.filter(~F.col("bloom_hit")).withColumn(
            "is_dup", F.lit(False)
        )
        # _fps is distinct by construction, so the left join cannot fan out
        marks = self._fps.withColumn("_in", F.lit(True))
        pos = (
            probed.filter(F.col("bloom_hit"))
            .join(marks, "_fp", "left")
            .withColumn("is_dup", F.coalesce(F.col("_in"), F.lit(False)))
        )
        return neg.unionByName(pos.drop("_in")).select(
            self._id_col, "bloom_hit", "is_dup"
        )

    def filter_batch(self, batch: DataFrame) -> DataFrame:
        """Rows of ``batch`` whose content is NOT in the corpus — exactly
        the fingerprint anti-join's output, bloom-accelerated. Keyed on
        the FINGERPRINT itself, never the batch's id column (r13
        advisor: the old id-keyed drop diverged on NULL or repeated
        batch ids): bloom-negative rows — including NULL-text rows,
        whose fingerprint can never equi-join — emit map-side with no
        shuffle; only bloom-positive candidates pay the exact
        candidate-sized anti-probe."""
        from jsonify2ai_spark.operators.dedup import _content_fingerprint

        hit = self._hit_udf()
        # collision-proof internal names: a caller's own '_fp'/'_bh'
        # column must pass through untouched (r14 self-review — the
        # old withColumn would silently overwrite then drop it)
        fpc, bhc = "_fp", "_bh"
        while fpc in batch.columns:
            fpc += "_"
        while bhc in batch.columns:
            bhc += "_"
        probed = batch.withColumn(
            fpc, _content_fingerprint(F.col(self._text_col))
        ).withColumn(
            bhc,
            F.coalesce(hit(self._positions(F.col(fpc))), F.lit(False)),
        )
        novel = probed.filter(~F.col(bhc))
        survivors = probed.filter(F.col(bhc)).join(
            self._fps.select(F.col("_fp").alias(fpc)), fpc, "left_anti"
        )
        return novel.unionByName(survivors).select(*batch.columns)

    def foreach_batch(self, append):
        """Wrap ``append(clean_df, batch_id)`` as a foreachBatch callable."""

        def _fn(batch: DataFrame, batch_id: int) -> None:
            append(self.filter_batch(batch), batch_id)

        return _fn

    def fp_rate_estimate(self) -> float:
        """Expected bloom false-positive rate (1 - e^{-kn/m})^k for the
        built corpus — the fraction of NOVEL rows that pay the exact
        verification probe (they are still emitted correctly)."""
        import math

        return (1.0 - math.exp(-self._k * self._n_corpus / self._m)) ** self._k

    # ---- persistence -------------------------------------------------

    def save(self, path: str) -> None:
        """Persist bitmap + fingerprints + params; a stream restart
        warm-loads instead of re-scanning the corpus (the
        CorpusNearDupGate.save contract)."""
        spark = self._fps.sparkSession
        self._fps.write.mode("overwrite").parquet(f"{path}/fps")
        chunk = 1 << 22
        raw = self._bitmap.tobytes()
        rows = [
            (i, raw[i : i + chunk]) for i in range(0, len(raw), chunk)
        ]
        local_rows_df(spark, rows, "off long, chunk binary").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{path}/bitmap")
        local_rows_df(spark, 
            [(self._m, self._k, self._text_col, self._id_col, self._n_corpus)],
            "m_bits long, n_hashes int, text_col string, id_col string, n_corpus long",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "BloomDedupGate":
        import numpy as np

        meta = spark.read.parquet(f"{path}/meta").first()
        obj = cls.__new__(cls)
        obj._m = int(meta["m_bits"])
        obj._k = int(meta["n_hashes"])
        obj._text_col = meta["text_col"]
        obj._id_col = meta["id_col"]
        obj._n_corpus = int(meta["n_corpus"])
        obj._fps = (
            spark.read.parquet(f"{path}/fps").repartition(F.col("_fp")).persist()
        )
        obj._fps.count()
        parts = sorted(
            spark.read.parquet(f"{path}/bitmap").collect(),
            key=lambda r: r["off"],
        )
        obj._bitmap = np.frombuffer(
            b"".join(bytes(r["chunk"]) for r in parts), dtype=np.uint8
        ).copy()
        obj._bc = spark.sparkContext.broadcast(obj._bitmap)
        return obj

    def close(self) -> None:
        self._fps.unpersist()
        self._bc.destroy()


class CommonnessGate:
    """Streaming face of SoftDeDup commonness reweighting
    (:func:`~jsonify2ai_spark.operators.dedup.soft_dedup_weights` —
    q146's oracle-verified arithmetic): the reference corpus's shingle
    document frequencies fit ONCE into a persisted, shingle-clustered
    table plus one normalization scalar, then every trigger's documents
    score against the FROZEN model — a doc whose shingles the corpus
    has seen a thousand times is common (low weight), novel content
    weighs ~max.

    A batch doc's commonness = geometric mean over its distinct
    shingles of (corpus df + 1) — the ``+1`` counts the document
    itself, so a doc that exactly duplicates a corpus doc with k copies
    reads commonness k+1, exactly what the batch operator would assign
    had it been appended; a fully novel doc reads 1.0. Weight =
    commonness^-beta normalized by the FROZEN corpus mean (the batch
    operator's own normalizer), so streaming weights are comparable
    with the q146 column across the whole run.

    Modes (the DSIRGate/PerplexityGate convention):
    - ``min_weight=None`` (default): ANNOTATE — ``kind='rewrite'``,
      appends ``dup_weight`` (and ``commonness``) to every row;
      shingle-less docs annotate NULL.
    - ``min_weight=<float>``: THIN — ``kind='filter'``; DROP a doc iff
      its 6dp weight falls under the floor (remove the most-duplicated
      content instead of loss-weighting it). A shingle-less doc has no
      weight and is KEPT — no score is no evidence of duplication (the
      BloomDedupGate NULL-parity rule, not the inverse). Stateless and
      deterministic, so a replayed batch keeps exactly the same rows.

    Per-trigger cost: one batch shingle explode, one join against the
    persisted df table CUT TO BATCH SIZE first (the batch's distinct
    shingles broadcast into a semi-join — the CorpusNearDupGate r6
    lesson, so the corpus-sized table contributes a memory-speed probe,
    never a per-trigger reshuffle), one per-doc stable-decimal mean.
    Model side is corpus-sized ONCE; ``save``/``load`` warm-restarts.
    """

    def __init__(
        self,
        corpus: DataFrame,
        beta: float = 1.0,
        min_weight: float | None = None,
        text_col: str = "text",
        id_col: str = "doc_id",
        shingle_n: int = 3,
    ) -> None:
        from jsonify2ai_spark.operators.dedup import shingles
        from jsonify2ai_spark.operators.inventory import _stable_avg

        self._beta = float(beta)
        self._min_weight = min_weight
        self._input_col = text_col
        # chain rewrite destination (APPEND, the DSIRGate convention):
        # the chain drops+rejoins gate._text_col, so it must name the
        # appended column, never the input text — review-found: the old
        # wiring made the chain overwrite document text with the weight
        self._text_col = "dup_weight"
        self._id_col = id_col
        self._shingle_n = shingle_n
        self.kind = "filter" if min_weight is not None else "rewrite"
        self.rewritten_col = "dup_weight"

        ex = (
            corpus.select(
                F.col(id_col),
                F.explode(shingles(F.col(text_col), shingle_n)).alias("sh"),
            )
            .filter(F.col("sh") != "")
            # consumed twice (the df rollup + the normalizer's per-doc
            # join) — checkpoint so the corpus tokenizes once at build
            .localCheckpoint(eager=False)
        )
        self._dfreq = (
            ex.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("dfq"))
            .repartition(F.col("sh"))
            .persist()
        )
        self._dfreq.count()
        # the batch operator's normalizer, frozen: mean over the corpus
        # of commonness^-beta (commonness at its 4dp rounding point)
        per_doc = (
            ex.join(self._dfreq, "sh")
            .groupBy(id_col)
            .agg(F.round(F.exp(_stable_avg(F.log("dfq"))), 4).alias("c"))
        )
        row = per_doc.agg(
            _stable_avg(F.pow(F.col("c"), F.lit(-self._beta))).alias("m")
        ).collect()[0]
        if row["m"] is None:
            # a model with no shingles scores nothing: every weight would
            # be NULL and a thin gate would silently drop whole triggers
            raise ValueError(
                "CommonnessGate: fit corpus produced no shingles "
                f"(text_col={text_col!r}, shingle_n={shingle_n}) — the "
                "gate cannot score; fit on a corpus with content"
            )
        self._mraw = float(row["m"])

    def _scored(self, batch: DataFrame) -> DataFrame:
        from jsonify2ai_spark.operators.dedup import shingles
        from jsonify2ai_spark.operators.inventory import _stable_avg

        idc = self._id_col
        ex = batch.select(
            F.col(idc),
            F.explode(shingles(F.col(self._input_col), self._shingle_n)).alias("sh"),
        ).filter(F.col("sh") != "")
        batch_sh = ex.select("sh").distinct()
        touched = self._dfreq.join(F.broadcast(batch_sh), "sh", "left_semi")
        joined = ex.join(touched, "sh", "left").withColumn(
            "dfq", F.coalesce("dfq", F.lit(0))
        )
        per_doc = joined.groupBy(idc).agg(
            F.round(
                F.exp(_stable_avg(F.log(F.col("dfq") + F.lit(1)))), 4
            ).alias("commonness")
        )
        w = F.round(
            F.pow(F.col("commonness"), F.lit(-self._beta)) / F.lit(self._mraw),
            6,
        )
        return per_doc.withColumn("dup_weight", w)

    def annotate_batch(self, batch: DataFrame) -> DataFrame:
        """Every batch row + (commonness, dup_weight); NULL for
        shingle-less docs."""
        return batch.join(self._scored(batch), self._id_col, "left")

    def filter_batch(self, batch: DataFrame) -> DataFrame:
        if self._min_weight is None:
            return self.annotate_batch(batch)
        # anti-join on the DROPPED ids: a shingle-less doc has no score
        # row, and no score is no evidence of duplication — it stays
        dropped = self._scored(batch).filter(
            F.col("dup_weight") < F.lit(float(self._min_weight))
        )
        return batch.join(
            dropped.select(self._id_col), self._id_col, "left_anti"
        )

    def foreach_batch(self, append):
        def _fn(batch: DataFrame, batch_id: int) -> None:
            append(self.filter_batch(batch), batch_id)

        return _fn

    def save(self, path: str) -> None:
        spark = self._dfreq.sparkSession
        self._dfreq.write.mode("overwrite").parquet(f"{path}/dfreq")
        local_rows_df(spark, 
            [
                (
                    self._beta,
                    self._min_weight,
                    self._input_col,
                    self._id_col,
                    self._shingle_n,
                    self._mraw,
                )
            ],
            "beta double, min_weight double, text_col string, id_col string, "
            "shingle_n int, mraw double",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "CommonnessGate":
        meta = spark.read.parquet(f"{path}/meta").first()
        obj = cls.__new__(cls)
        obj._beta = float(meta["beta"])
        obj._min_weight = (
            float(meta["min_weight"]) if meta["min_weight"] is not None else None
        )
        obj._input_col = meta["text_col"]
        obj._text_col = "dup_weight"  # chain append destination
        obj._id_col = meta["id_col"]
        obj._shingle_n = int(meta["shingle_n"])
        obj._mraw = float(meta["mraw"])
        obj.kind = "filter" if obj._min_weight is not None else "rewrite"
        obj.rewritten_col = "dup_weight"
        obj._dfreq = (
            spark.read.parquet(f"{path}/dfreq").repartition(F.col("sh")).persist()
        )
        obj._dfreq.count()
        return obj

    def close(self) -> None:
        self._dfreq.unpersist()


def streaming_best_of_n(
    records: DataFrame,
    n: int,
    prompt_col: str = "prompt_id",
    prompt_text_col: str = "prompt",
    response_col: str = "response",
    score_col: str = "score",
    ttl_seconds: int | None = None,
) -> DataFrame:
    """Streaming rejection sampling — the live face of
    :func:`~jsonify2ai_spark.operators.sft.best_of_n` for generation
    pipelines that STREAM candidates out of a sampler: candidates for
    each prompt accumulate across micro-batches in keyed state, and the
    trigger in which a prompt's candidate count reaches ``n`` emits ONE
    winner row ``(prompt_id, prompt, response, score, n_candidates)``;
    the prompt is then done and later candidates are ignored.

    Determinism: the winner is the MAX over every candidate seen up to
    and including the crossing trigger (score desc, response asc with
    NULLs first — exactly the batch operator's total order, so both
    faces pick the same winner), an order-free fold: arbitrary row
    order inside a trigger cannot change the emission. A NULL score
    raises in the state function (the best_of_n NULL contract — loud,
    not mis-ranked). State per live prompt is one (best, count) tuple;
    with ``ttl_seconds`` set, ANY prompt idle past the TTL is EVICTED:
    an incomplete prompt emits nothing (a sampler that died mid-prompt
    should be retried upstream, not awarded a sub-n winner), and — the
    stream_dedup caveat — a DONE prompt whose state ages out can emit
    AGAIN if candidates arrive later, i.e. at-most-once-per-TTL, so
    sinks that must be exactly-once dedup on the prompt id downstream.
    The 100 TB-safe state bound is TTL x live-prompt rate, not stream
    lifetime.

    Exactly-once through the engine: applyInPandasWithState rides the
    query checkpoint, so a replayed trigger re-emits the same winner to
    the sink's dedup boundary, never a different one.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if n < 1:
        raise ValueError(f"streaming_best_of_n: n must be >= 1, got {n}")
    pt = records.schema[prompt_col].dataType.simpleString()
    out_schema = (
        f"{prompt_col} {pt}, {prompt_text_col} string, "
        f"{response_col} string, {score_col} double, n_candidates bigint"
    )
    state_schema = (
        "best_response STRING, best_score DOUBLE, n_seen LONG, "
        "done BOOLEAN, prompt STRING"
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_seconds
        else GroupStateTimeout.NoTimeout
    )

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            best_r, best_s, n_seen, done, prompt = state.get
        else:
            best_r, best_s, n_seen, done, prompt = None, None, 0, False, None
        def beats(s, r):
            # the batch operator's total order: score desc, response asc
            # with NULLs FIRST (Spark asc default) — NULL responses stay
            # NULL, never the string 'None'
            if best_s is None:
                return True
            if s != best_s:
                return s > best_s
            if r is None:
                return best_r is not None
            if best_r is None:
                return False
            return str(r) < str(best_r)

        for pdf in pdfs:
            if done or not len(pdf):
                continue
            if pdf[score_col].isnull().any():
                raise ValueError(
                    f"streaming_best_of_n: NULL in score column "
                    f"{score_col!r} for prompt {key!r} — every candidate "
                    "must carry a score"
                )
            n_seen += len(pdf)
            if prompt is None:
                prompt = pdf[prompt_text_col].iloc[0]
            # vectorized per-chunk best (the hot path never loops rows):
            # NaN-free scores by the check above; na_position='first'
            # gives the response column its NULLS FIRST asc semantics
            top = pdf.sort_values(
                [score_col, response_col],
                ascending=[False, True],
                na_position="first",
            ).iloc[0]
            s = float(top[score_col])
            r = top[response_col]
            r = None if pd.isna(r) else str(r)
            if beats(s, r):
                best_s, best_r = s, r
        if not done and n_seen >= n:
            done = True
            yield pd.DataFrame(
                [
                    {
                        prompt_col: key[0],
                        prompt_text_col: prompt,
                        response_col: best_r,
                        score_col: best_s,
                        "n_candidates": n_seen,
                    }
                ]
            )
        state.update((best_r, best_s, n_seen, done, prompt))
        if ttl_seconds:
            state.setTimeoutDuration(ttl_seconds * 1000)

    return records.groupBy(prompt_col).applyInPandasWithState(
        fold, out_schema, state_schema, "append", timeout
    )
