"""Hybrid text search: tokenized inverted index + BM25 ranking.

The reference creates a word-tokenized TEXT payload index on `content` for
hybrid search (worker/app/services/qdrant_client.py:206-297 — K3 in SURVEY
§2.7; roadmap README.md:153). The Spark-native equivalent is an inverted
postings table + BM25 scoring, built entirely from joins and aggregations:

- postings: explode(lowered tokens) -> (term, doc, tf). One shuffle; at
  100 TB this is the classic inverted-index build and partitions by term.
- query: filter postings to the query's terms FIRST (predicate reaches the
  postings scan), join the tiny per-term document frequencies broadcast,
  score, and top-k. Work is proportional to the query terms' posting lists,
  never the corpus.

Determinism: BM25 constants are injected with Python float repr into both
engines so every arithmetic step is the same double op in the same order;
scores are rounded before ordering so the oracle's ln() ulp wiggle cannot
reorder the top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonify2ai_spark.session import local_rows_df
from jsonify2ai_spark.functions.text import tokens

K1_DEFAULT = 1.2
B_DEFAULT = 0.75

# Sentinel "term" for single-corpus-pass BM25 shapes (bm25_topk,
# mine_hard_negatives): contains whitespace, which tokens() (split on \s+)
# can never produce, so it cannot collide with a real token or query term.
# Every doc emits one sentinel row alongside its tokens; the corpus
# n_docs/avgdl scalars then come from conditional aggregation over the
# SAME (term, doc, dl, tf) frame the postings use — one tokenize+explode
# pass instead of one per consumer.
_SENT_TERM = "\x00 dl"


def build_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, id, dl, tf) postings — the inverted index as a table. Persist
    partitioned/bucketed by term for serving."""
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    base = docs.select(F.col(id_col), toks.alias("_tk")).withColumn("dl", F.size("_tk"))
    return (
        base.select(id_col, "dl", F.explode("_tk").alias("term"))
        .groupBy("term", id_col, "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 for a whitespace-tokenized query.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5))  (Robertson-Sparck Jones, the
    Lucene form — never negative), tf saturation k1, length normalization b.
    Everything is DataFrame ops: corpus stats broadcast, per-term df
    broadcast, one aggregation per doc. Output (id, bm25) rounded to 6dp.

    CONTRACT: ``id_col`` must be unique per document (r15 ADVICE). The
    single-pass corpus stats group the sentinel rows by (id, dl, term),
    so two corpus rows sharing BOTH id and token count would collapse to
    one in n_docs/avgdl, diverging from :func:`bm25_oracle_sql`'s
    count(*)/avg(dl). Every caller in this engine feeds a keyed corpus;
    a multiset corpus needs a surrogate key first.
    """
    terms = sorted({t.lower() for t in query.split() if t})
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    base = docs.select(F.col(id_col), toks.alias("_tk")).withColumn("dl", F.size("_tk"))
    # ONE corpus tokenization (r15): the n_docs/avgdl stats used to be a
    # separate aggregate over `base` — a second full tokenize pass. Every
    # doc now emits a sentinel row (empty/null text included, via
    # coalesce) that rides the query-term isin filter, and the stats are
    # a conditional aggregate over the SAME grouped frame the postings
    # use — count(when(.., tf)) keeps tf referenced so Catalyst cannot
    # prune the partial count out of the shared subtree, which is what
    # lets AQE land a ReusedExchange instead of a second scan.
    tok_rows = base.select(
        id_col,
        "dl",
        F.explode(
            F.concat(
                F.array(F.lit(_SENT_TERM)),
                F.coalesce("_tk", F.array().cast("array<string>")),
            )
        ).alias("term"),
    )
    grouped = (
        tok_rows.filter(F.col("term").isin(terms + [_SENT_TERM]))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = grouped.agg(
        F.count(F.when(F.col("term") == _SENT_TERM, F.col("tf"))).alias("n_docs"),
        F.avg(F.when(F.col("term") == _SENT_TERM, F.col("dl"))).alias("avgdl"),
    )
    # df_t via a window over posted, NOT a separate groupBy+join: posted is
    # derived from the corpus tokenize, and referencing it from two plan
    # branches would re-run that tokenize per branch (no subtree reuse).
    # The term-partition window holds one query term's posting list per
    # partition — bounded by the hottest query term, the standard serving
    # shape. Measured ~30% faster at sf0.1, identical scores. The sentinel
    # rows must drop BEFORE that window (they are a corpus-sized hot key)
    # but WITHOUT specializing the shared subtree away from the stats
    # branch: a term != sentinel FILTER pushes below the aggregate (term
    # is a grouping key), and so does a plain keyed anti-join
    # (PushDownLeftSemiAntiJoin). The anti-join's vacuous tf > -1
    # conjunct references an AGGREGATE OUTPUT, which cannot resolve below
    # the aggregate — the join stays put, the exchange stays shared, and
    # the one-row build side costs nothing. Shape validated on Spark
    # 4.1.2; it depends on optimizer NON-behavior (the vacuous conjunct
    # not being simplified, count(when(...)) not rewritten to count(1)) —
    # an upgrade that regresses it to two scans is caught by the
    # ReusedExchange canary test (correctness is unaffected either way).
    from pyspark.sql import Window

    sent_row = docs.sparkSession.range(1).select(
        F.lit(_SENT_TERM).alias("_sent")
    )
    posted = grouped.join(
        F.broadcast(sent_row),
        (F.col("term") == F.col("_sent")) & (F.col("tf") > F.lit(-1)),
        "left_anti",
    ).withColumn("df_t", F.count(F.lit(1)).over(Window.partitionBy("term")))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    w = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    scored = posted.crossJoin(F.broadcast(stats)).withColumn("w", w)
    out = scored.groupBy(id_col).agg(F.round(F.sum("w"), 6).alias("bm25"))
    return out.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)


def bm25_oracle_sql(
    query: str,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """The DuckDB twin of :func:`bm25_topk` (same constants, same op order)."""
    terms = sorted({t.lower() for t in query.split() if t})
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
        WITH base AS (
            SELECT {id_col},
                   list_transform(CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\\s+') END, t -> lower(t)) AS tk
            FROM {table}),
        b2 AS (SELECT {id_col}, tk, len(tk) AS dl FROM base),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM b2),
        posted AS (
            SELECT {id_col}, dl, term, count(*) AS tf
            FROM (SELECT {id_col}, dl, unnest(tk) AS term FROM b2)
            WHERE term IN ({term_list})
            GROUP BY 1, 2, 3),
        dfreq AS (SELECT term, count(*) AS df_t FROM posted GROUP BY 1),
        scored AS (
            SELECT p.{id_col},
                   ln(1.0 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
                     * p.tf * {k1 + 1.0!r}
                     / (p.tf + {k1!r} * (1.0 - {b!r} + {b!r} * p.dl / s.avgdl)) AS w
            FROM posted p JOIN dfreq d USING (term) CROSS JOIN stats s)
        SELECT {id_col}, round(sum(w), 6) AS bm25
        FROM scored GROUP BY {id_col}
        ORDER BY bm25 DESC, {id_col} ASC LIMIT {k}
    """


class BM25Index:
    """Built-once BM25 SERVING index. :func:`bm25_topk` re-tokenizes the
    whole corpus per query — the right shape for one-shot analytics and the
    oracle twin, the wrong one for a serving loop, where the corpus is
    static across thousands of queries. This class materializes the
    inverted postings ONCE (term-partitioned + persisted, the layout the
    module docstring prescribes) plus the two corpus scalars; each query
    then touches only its own terms' posting lists — work proportional to
    the query, never the corpus, on every call after the first.

    Scoring arithmetic is byte-for-byte :func:`bm25_topk`'s (same constant
    injection, same op order), pinned by a parity test; the one
    intentional difference is WHERE n_docs/avgdl/df_t come from
    (precomputed at build, not re-aggregated per query).

    FILTERED queries (``topk(..., filter=...)``) are a pool-semantics
    change: df_t and avgdl must describe the FILTERED pool or scores are
    wrong. The index supports them without touching text: ``attr_cols``
    named at build are carried on a narrow per-doc (id, dl, attrs) table,
    the filter runs there (n_docs/avgdl = one aggregate over ~16 bytes/doc
    — partition-prunable, never a retokenize), and df_t is recomputed over
    the semi-joined touched postings only. Parity with
    ``bm25_topk(docs.filter(pred))`` is test-pinned. A filter referencing
    a column NOT in ``attr_cols`` raises at plan time (nothing silent).

    BATCHED queries (``topk_batch``): one Spark job for N queries — the
    per-job scheduler floor (~200 ms on local mode) amortizes across the
    batch instead of multiplying by it.
    """

    def __init__(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        k1: float = K1_DEFAULT,
        b: float = B_DEFAULT,
        attr_cols: tuple[str, ...] = (),
    ) -> None:
        self._id_col = id_col
        self._k1, self._b = k1, b
        # df_t is a per-term constant of the corpus: bake it into the
        # postings at build so the unfiltered serving path needs no
        # per-query window (one fewer shuffleless-but-sorted exchange)
        posts = build_postings(docs, text_col=text_col, id_col=id_col)
        dfreq = posts.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
        self._posts = (
            posts.join(dfreq, "term").repartition(F.col("term")).persist()
        )
        self._posts.count()  # materialize before the first query
        # narrow per-doc table: dl + the filterable attributes. Covers the
        # WHOLE docs frame (zero-token docs included) so filtered-pool
        # n_docs/avgdl aggregate exactly as bm25_topk's stats CTE would
        toks = F.transform(tokens(F.col(text_col)), F.lower)
        self._doclens = (
            docs.select(
                F.col(id_col), F.size(toks).alias("dl"), *[F.col(c) for c in attr_cols]
            )
            .persist()
        )
        row = self._doclens.agg(
            F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
        ).first()
        self._n_docs = int(row["n"])
        self._avgdl = float(row["avgdl"]) if row["avgdl"] is not None else 0.0
        self._attr_cols = tuple(attr_cols)

    @property
    def attr_cols(self) -> tuple[str, ...]:
        return self._attr_cols

    def _score(self, posted: DataFrame, n_docs, avgdl) -> DataFrame:
        """bm25_topk's arithmetic verbatim over a (id, dl, tf, df_t[, ...])
        frame; n_docs/avgdl are Columns or literals from the pool."""
        idf = F.log(
            F.lit(1.0) + (n_docs - F.col("df_t") + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5))
        )
        denom = F.col("tf") + F.lit(self._k1) * (
            F.lit(1.0) - F.lit(self._b) + F.lit(self._b) * F.col("dl") / avgdl
        )
        return posted.withColumn("w", idf * F.col("tf") * F.lit(self._k1 + 1.0) / denom)

    def _lookup(self, terms: list) -> DataFrame:
        """The query terms' posting rows. The base index filters its
        memory-persisted postings; :class:`ShardedBM25Index` overrides
        with a partition-pruned disk scan."""
        return self._posts.filter(F.col("term").isin(terms))

    def _lookup_batch(self, qdf: DataFrame, terms: list) -> DataFrame:
        """Batch form: (query_id, term) broadcast-joined into the
        postings. ``terms`` (the distinct term list, known driver-side)
        lets the sharded override prune partitions STATICALLY."""
        return self._posts.join(F.broadcast(qdf), "term")

    def topk(self, query: str, k: int = 10, filter=None) -> DataFrame:
        """Top-k (id, bm25) for one query — touches only the query terms'
        posting lists in the persisted index. ``filter`` (a Column over
        ``attr_cols``) restricts the pool; scores then equal
        ``bm25_topk(docs.filter(filter))`` exactly."""
        terms = sorted({t.lower() for t in query.split() if t})
        idc = self._id_col
        posted = self._lookup(terms)
        if filter is None:
            scored = self._score(posted, F.lit(self._n_docs), F.lit(self._avgdl))
        else:
            from pyspark.sql import Window

            pool = self._doclens.filter(filter)
            # filtered-pool scalars: ONE aggregate over the narrow doclens
            # table (no text); crossJoin of a single scalar row — broadcast
            stats = pool.agg(
                F.count(F.lit(1)).alias("_n"), F.avg("dl").alias("_avgdl")
            )
            posted = (
                posted.drop("df_t")
                .join(pool.select(idc), idc, "left_semi")
                .withColumn(
                    "df_t", F.count(F.lit(1)).over(Window.partitionBy("term"))
                )
                .crossJoin(F.broadcast(stats))
            )
            scored = self._score(posted, F.col("_n"), F.col("_avgdl"))
        out = scored.groupBy(idc).agg(F.round(F.sum("w"), 6).alias("bm25"))
        return out.orderBy(F.col("bm25").desc(), F.col(idc).asc()).limit(k)

    def topk_batch(self, queries: list[str], k: int = 10) -> DataFrame:
        """Per-query top-k for MANY queries in ONE job: (query_id, id,
        bm25), query_id = position in ``queries``. The per-term posting
        lookups union into a single plan — the scheduler floor is paid
        once, not per query. Row-for-row equal to ``topk`` per query
        (parity-pinned)."""
        from pyspark.sql import Window

        spark = self._posts.sparkSession
        qterms = [
            (qi, t)
            for qi, q in enumerate(queries)
            for t in sorted({t.lower() for t in q.split() if t})
        ]
        idc = self._id_col
        if not qterms:
            # id type from the index's own doclens table, not a hardcoded
            # long — the empty-batch schema must equal the non-empty one
            # for downstream unions on the degenerate path (r7 advisor)
            idt = self._doclens.schema[idc].dataType.simpleString()
            return local_rows_df(
                spark, [], f"query_id int, {idc} {idt}, bm25 double"
            )
        qdf = local_rows_df(spark, qterms, "query_id int, term string")
        # broadcast the tiny (qid, term) list into the term-partitioned
        # postings: each query's terms pull only their own posting lists
        posted = self._lookup_batch(qdf, sorted({t for _, t in qterms}))
        scored = self._score(posted, F.lit(self._n_docs), F.lit(self._avgdl))
        agg = scored.groupBy("query_id", idc).agg(
            F.round(F.sum("w"), 6).alias("bm25")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("bm25").desc(), F.col(idc).asc()
        )
        return (
            agg.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )

    def save(self, path: str) -> None:
        """Persist the index durably: postings + doclens as parquet (the
        postings repartitioned by term at write, so a load re-clusters for
        free via the file layout) plus a one-row meta table for the
        scalars. A serving restart then :meth:`load`\\ s in seconds instead
        of re-tokenizing the corpus — at 100 TB the build is a batch job,
        the load is a cache warm."""
        spark = self._posts.sparkSession
        self._posts.write.mode("overwrite").parquet(f"{path}/postings")
        self._doclens.write.mode("overwrite").parquet(f"{path}/doclens")
        local_rows_df(
            spark,
            [
                (
                    self._n_docs,
                    self._avgdl,
                    self._k1,
                    self._b,
                    self._id_col,
                    ",".join(self._attr_cols),
                )
            ],
            "n_docs long, avgdl double, k1 double, b double, "
            "id_col string, attr_cols string",
        ).write.mode("overwrite").parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "BM25Index":
        """Rebuild a serving index from :meth:`save` output without
        touching the corpus text. Scoring state is byte-identical to the
        saved instance (scalars round-trip through parquet doubles;
        df_t/tf/dl are integers), so topk parity holds across a restart —
        test-pinned."""
        meta = spark.read.parquet(f"{path}/meta").first()
        obj = cls.__new__(cls)
        obj._id_col = meta["id_col"]
        obj._k1, obj._b = float(meta["k1"]), float(meta["b"])
        obj._n_docs = int(meta["n_docs"])
        obj._avgdl = float(meta["avgdl"])
        obj._attr_cols = tuple(
            c for c in (meta["attr_cols"] or "").split(",") if c
        )
        obj._posts = (
            spark.read.parquet(f"{path}/postings")
            .repartition(F.col("term"))
            .persist()
        )
        obj._posts.count()
        obj._doclens = spark.read.parquet(f"{path}/doclens").persist()
        return obj

    def close(self) -> None:
        self._posts.unpersist()
        self._doclens.unpersist()

def _term_bucket(term_col, n_buckets: int):
    """Engine-portable term -> bucket in [0, n_buckets): md5 first 12 hex
    chars as an integer, mod n_buckets (the sample_hash idiom). The
    PYTHON twin (_term_bucket_py) must stay in lockstep — query-side
    pruning computes the same buckets driver-side."""
    return (
        F.conv(F.substring(F.md5(term_col), 1, 12), 16, 10).cast("bigint")
        % n_buckets
    )


def _term_bucket_py(term: str, n_buckets: int) -> int:
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:12], 16) % n_buckets


def _with_impacts(
    joined: DataFrame,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
    id_col: str,
    max_postings_per_term: int | None,
    impact_ordered: bool,
) -> DataFrame:
    """Attach each posting's exact BM25 contribution (``impact``) and its
    rank inside the term's impact-descending list — the one home of the
    impact arithmetic, shared by :meth:`ShardedBM25Index.build` and
    :meth:`ShardedBM25Index.compact` so a compacted index's impact
    columns are byte-identical to a fresh build's under the same
    scalars. Optionally applies Carmel static pruning
    (``impact_rank <= max_postings_per_term``)."""
    from pyspark.sql import Window

    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    impact = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    w = Window.partitionBy("term").orderBy(impact.desc(), F.col(id_col).asc())
    out = joined.withColumn("impact", impact).withColumn(
        "impact_rank", F.row_number().over(w)
    )
    if max_postings_per_term is not None:
        out = out.filter(F.col("impact_rank") <= max_postings_per_term)
    if not impact_ordered:
        out = out.drop("impact", "impact_rank")
    return out


class ShardedBM25Index(BM25Index):
    """Term-bucket-SHARDED BM25 serving (r11 verdict #7): the postings
    persist as parquet PARTITIONED BY ``term_bucket = md5(term) %
    n_buckets``, and every query filters on its terms' buckets with a
    driver-computed literal IN list — static partition pruning, so the
    scan touches ONLY the query terms' bucket directories
    (``PartitionFilters`` in the plan, test-pinned), never the whole
    postings table.

    Why this is the 100 TB serving shape: :class:`BM25Index` persists
    the full postings in executor memory — per-query cost is a filter
    over ALL cached partitions, and the cache itself must fit the
    corpus (corpus-linear memory, the crossover bench's "lexical floor",
    PERF.md round-11). Here the resident state is the ~16-byte/doc
    doclens table only; per-query IO is the query terms' buckets,
    ~|terms|/n_buckets of the postings. Size ``n_buckets`` so a bucket
    is a few hundred MB at the target corpus (buckets scale WITH the
    corpus, keeping per-query scan cost roughly flat — the cell-parallel
    layout; hot terms' posting lists remain df-linear, which is
    inherent to exact BM25).

    Scoring arithmetic is the parent's verbatim (same ``_score``, same
    constants, same rounding) — parity with :func:`bm25_topk` and with
    the in-memory index is test-pinned, filtered and batched faces
    included.
    """

    @classmethod
    def build(
        cls,
        docs: DataFrame,
        path: str,
        n_buckets: int = 64,
        text_col: str = "text",
        id_col: str = "doc_id",
        k1: float = K1_DEFAULT,
        b: float = B_DEFAULT,
        attr_cols: tuple[str, ...] = (),
        max_postings_per_term: int | None = None,
        impact_ordered: bool = True,
    ) -> "ShardedBM25Index":
        """One batch job: tokenize -> postings(+df_t) -> bucketed parquet
        (one file per bucket via in-partition repartition, so a bucket
        is one contiguous read), doclens, meta — then :meth:`load`.

        ``max_postings_per_term``: static impact-based index pruning
        (Carmel et al. 2001): keep only each term's top-N postings by
        their exact BM25 contribution (idf computed from the FULL-corpus
        df_t, which stays baked in — so every SURVIVING posting scores
        byte-identically to the unpruned index, test-pinned). This
        bounds the df-linear residue the sharded layout can't remove: a
        stop-word's posting list caps at N rows instead of
        corpus-linear, at the cost of dropping each term's lowest-impact
        contributions — top-k quality degrades gracefully
        (bench_bm25_sharded measures recall@10). The build pays one
        extra per-term window over the postings shuffle it already does.
        ``None`` (default) = exact, no pruning.

        ``impact_ordered`` (default True): additionally persist each
        posting's exact BM25 contribution (``impact``) and its rank
        within the term's list ordered by impact desc (``impact_rank``),
        with files sorted by (term, impact_rank) so a serving-time
        ``impact_rank <= depth`` predicate skips the tails of hot
        terms' lists at the parquet row-group level. This is the
        DYNAMIC-pruning layout (Anh & Moffat, SIGIR'06 impact-ordered
        lists): the full index stays exact — :meth:`topk` is unchanged
        byte-for-byte — while :meth:`topk_impact` reads only each
        term's top-``depth`` postings and :meth:`topk_adaptive`
        escalates depth under a WAND-style rank-safety certificate.
        Costs one per-term window at build (shared with the static
        pruning path) and two extra postings columns (~12 B/posting)."""
        # doclens FIRST (r15): the corpus scalars (n_docs, avgdl) that the
        # impact branch and the meta both need are aggregates of the
        # doclens table — write it once and aggregate the WRITTEN parquet.
        # The previous order tokenized the corpus up to FOUR times (posts,
        # impact-stats agg, doclens write, meta agg over the un-persisted
        # doclens frame); now exactly twice (posts + doclens), the floor
        # for an index that stores both. Values are bit-identical: dl is
        # integral, so avg = exact long sum / count in either order.
        # Commit order is unchanged in effect — nothing is visible until
        # the meta lands.
        spark = docs.sparkSession
        toks = F.transform(tokens(F.col(text_col)), F.lower)
        doclens = docs.select(
            F.col(id_col), F.size(toks).alias("dl"), *[F.col(c) for c in attr_cols]
        )
        doclens.write.mode("overwrite").parquet(f"{path}/doclens")
        row = spark.read.parquet(f"{path}/doclens").agg(
            F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
        ).first()
        posts = build_postings(docs, text_col=text_col, id_col=id_col)
        dfreq = posts.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
        joined = posts.join(dfreq, "term")
        if max_postings_per_term is not None or impact_ordered:
            # exact per-posting BM25 contribution under the corpus scalars
            joined = _with_impacts(
                joined, int(row["n"]),
                float(row["avgdl"]) if row["avgdl"] is not None else 0.0,
                k1, b, id_col, max_postings_per_term, impact_ordered,
            )
        sort_cols = (
            ["term", "impact_rank"] if impact_ordered else ["term"]
        )
        (
            joined
            .withColumn("term_bucket", _term_bucket(F.col("term"), n_buckets))
            .repartition(F.col("term_bucket"))
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(f"{path}/postings")
        )
        cls._write_meta(
            spark, path,
            int(row["n"]),
            float(row["avgdl"]) if row["avgdl"] is not None else 0.0,
            k1, b, id_col, attr_cols, n_buckets,
            pruned=max_postings_per_term is not None,
        )
        return cls.load(spark, path)

    @classmethod
    def load(cls, spark, path: str) -> "ShardedBM25Index":
        """Open for serving. The postings are NOT persisted or counted —
        the entire point is that no query ever materializes them; only
        the narrow doclens table (filtered-pool scalars) is cached.
        Pre-segment metas (no ``segments``/dir-pointer columns) load
        with the original layout defaults."""
        row = spark.read.parquet(f"{path}/meta").first()
        meta = row.asDict()
        obj = cls.__new__(cls)
        obj._id_col = meta["id_col"]
        obj._k1, obj._b = float(meta["k1"]), float(meta["b"])
        obj._n_docs = int(meta["n_docs"])
        obj._avgdl = float(meta["avgdl"])
        obj._attr_cols = tuple(
            c for c in (meta["attr_cols"] or "").split(",") if c
        )
        obj._n_buckets = int(meta["n_buckets"])
        obj._path = path
        obj._spark = spark
        obj._postings_dir = meta.get("postings_dir") or "postings"
        obj._doclens_dir = meta.get("doclens_dir") or "doclens"
        obj._segments = [
            s for s in (meta.get("segments") or "").split(",") if s
        ]
        obj._pruned = bool(meta.get("pruned") or False)
        obj._posts = spark.read.parquet(f"{path}/{obj._postings_dir}")
        obj._seg_posts = [
            spark.read.parquet(f"{path}/postings_incr/{rid}")
            for rid in obj._segments
        ]
        obj._tombs = (
            spark.read.parquet(f"{path}/tombstones")
            if int(meta.get("n_deleted") or 0) > 0
            else None
        )
        dl = spark.read.parquet(f"{path}/{obj._doclens_dir}")
        for rid in obj._segments:
            dl = dl.unionByName(
                spark.read.parquet(f"{path}/doclens_incr/{rid}")
            )
        if obj._tombs is not None:
            dl = dl.join(
                F.broadcast(obj._tombs),
                dl[obj._id_col].cast("string") == F.col("_id"),
                "left_anti",
            )
        obj._doclens = dl.persist()
        return obj

    @staticmethod
    def _write_meta(
        spark,
        path: str,
        n_docs: int,
        avgdl: float,
        k1: float,
        b: float,
        id_col: str,
        attr_cols: tuple,
        n_buckets: int,
        postings_dir: str = "postings",
        doclens_dir: str = "doclens",
        segments: tuple = (),
        n_deleted: int = 0,
        pruned: bool = False,
    ) -> None:
        """The meta row is the index's COMMIT POINT: every structural
        mutation (append's new segment, compact's dir swap) becomes
        visible only when this one-file table lands — a crash before it
        leaves unreferenced directories, never a half-visible index.
        Single-writer maintenance contract: the overwrite itself is
        delete-then-write, so concurrent maintenance ops race."""
        local_rows_df(
            spark,
            [
                (
                    int(n_docs),
                    float(avgdl),
                    float(k1),
                    float(b),
                    id_col,
                    ",".join(attr_cols),
                    int(n_buckets),
                    postings_dir,
                    doclens_dir,
                    ",".join(segments),
                    int(n_deleted),
                    bool(pruned),
                )
            ],
            "n_docs long, avgdl double, k1 double, b double, "
            "id_col string, attr_cols string, n_buckets int, "
            "postings_dir string, doclens_dir string, segments string, "
            "n_deleted int, pruned boolean",
        ).write.mode("overwrite").parquet(f"{path}/meta")

    def save(self, path: str) -> None:
        """Copy the sharded layout to a new location (the postings frame
        carries ``term_bucket`` from the partitioned read, so the bucket
        assignment is preserved byte-for-byte). Live segments copy along
        unmerged — the copy serves identically; :meth:`compact` folds
        them at either location."""
        spark = self._posts.sparkSession
        sort_cols = (
            ["term", "impact_rank"]
            if "impact_rank" in self._posts.columns
            else ["term"]
        )
        (
            self._posts.repartition(F.col("term_bucket"))
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(f"{path}/postings")
        )
        spark.read.parquet(f"{self._path}/{self._doclens_dir}").write.mode(
            "overwrite"
        ).parquet(f"{path}/doclens")
        for rid, seg in zip(self._segments, self._seg_posts):
            seg.repartition(F.col("term_bucket")).sortWithinPartitions(
                "term"
            ).write.mode("overwrite").partitionBy("term_bucket").parquet(
                f"{path}/postings_incr/{rid}"
            )
            spark.read.parquet(f"{self._path}/doclens_incr/{rid}").write.mode(
                "overwrite"
            ).parquet(f"{path}/doclens_incr/{rid}")
        n_deleted = 0
        if self._tombs is not None:
            n_deleted = self._tombs.count()
            self._tombs.coalesce(1).write.mode("overwrite").parquet(
                f"{path}/tombstones"
            )
        self._write_meta(
            spark, path, self._n_docs, self._avgdl, self._k1, self._b,
            self._id_col, self._attr_cols, self._n_buckets,
            segments=tuple(self._segments), n_deleted=n_deleted,
            pruned=self._pruned,
        )

    def append(
        self, new_docs: DataFrame, run_id: str, text_col: str = "text"
    ) -> "ShardedBM25Index":
        """Incremental index maintenance (r13) — the LSM/Lucene-segment
        shape: NEW documents land as a self-contained SEGMENT
        (``postings_incr/<run_id>/`` bucketed by the SAME term hash as
        the base, plus ``doclens_incr/<run_id>/``), and the meta rewrite
        is the commit point. Nothing existing is rewritten — append cost
        is proportional to the increment, never the corpus, which is the
        only affordable maintenance shape at 100 TB (a base rebuild per
        ingest batch is corpus-linear).

        Serving semantics after append: the EXACT faces (:meth:`topk`,
        :meth:`topk_batch`, filtered, hybrid) are exactly correct —
        corpus scalars update here, and per-term df_t is recomputed over
        the pruned lookup itself (see :meth:`_lookup_parts`; exact
        because every part buckets a term's complete list into the same
        partition). The IMPACT faces raise until :meth:`compact`: stored
        impacts bake build-time scalars, and an appended corpus changes
        n_docs/avgdl for EVERY posting — serving stale impacts would
        silently break the WAND certificate's upper-bound property.

        Contracts: appended ids must be NEW (one broadcast semi-join
        guard — replace/delete is a different operation); attr columns
        must match the build's. Crash windows: before the meta lands the
        segment directories are unreferenced garbage and re-running the
        SAME run_id overwrites them (idempotent heal); after the meta
        lands the segment is committed and a same-run_id re-run RAISES
        (it would double-count the documents).

        Reference anchor: the watcher's incremental re-ingest loop
        (worker/app/watcher — new files upsert without reindexing the
        collection), applied to the lexical index this repo adds."""
        if str(run_id) in self._segments:
            raise ValueError(
                f"append: segment {run_id!r} is already committed — "
                "re-appending would double-count its documents; use a "
                "fresh run_id (or compact() and re-ingest deliberately)"
            )
        if self._pruned:
            raise ValueError(
                "append: this index was built with max_postings_per_term "
                "(statically pruned) — its stored lists no longer carry "
                "enough rows to recompute true df_t, so segment-mode "
                "serving would score WRONG; rebuild (or compact an "
                "unpruned base with max_postings_per_term=) instead"
            )
        idc = self._id_col
        # one agg: within-batch duplicate ids would double-count postings
        # and doclens SILENTLY (the distinct below would hide them)
        stats0 = new_docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(idc)).alias("d"),
        ).first()
        if int(stats0["n"]) != int(stats0["d"]):
            raise ValueError(
                f"append: increment carries {stats0['n'] - stats0['d']} "
                "duplicate id row(s) — dedup upstream; every id must "
                "appear exactly once"
            )
        new_ids = new_docs.select(F.col(idc)).distinct()
        dup = self._doclens.join(F.broadcast(new_ids), idc, "left_semi").count()
        if dup:
            raise ValueError(
                f"append: {dup} incoming id(s) already exist in the index "
                "— append() only ADDS documents; rebuild (or delete "
                "first) to replace content"
            )
        if self._tombs is not None:
            shadowed = (
                new_ids.join(
                    F.broadcast(self._tombs),
                    new_ids[idc].cast("string") == F.col("_id"),
                    "left_semi",
                ).count()
            )
            if shadowed:
                raise ValueError(
                    f"append: {shadowed} incoming id(s) are tombstoned by "
                    "a pending delete — compact() to erase them first, "
                    "then re-ingest"
                )
        missing = [c for c in self._attr_cols if c not in new_docs.columns]
        if missing:
            raise ValueError(
                f"append: increment lacks the build's attr_cols {missing}"
            )

        posts = build_postings(
            new_docs, text_col=text_col, id_col=idc
        ).withColumn("term_bucket", _term_bucket(F.col("term"), self._n_buckets))
        (
            posts.repartition(F.col("term_bucket"))
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(f"{self._path}/postings_incr/{run_id}")
        )
        toks = F.transform(tokens(F.col(text_col)), F.lower)
        doclens_new = new_docs.select(
            F.col(idc), F.size(toks).alias("dl"),
            *[F.col(c) for c in self._attr_cols],
        )
        doclens_new.write.mode("overwrite").parquet(
            f"{self._path}/doclens_incr/{run_id}"
        )
        srow = self._spark.read.parquet(
            f"{self._path}/doclens_incr/{run_id}"
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")).first()
        n_new, dl_new = int(srow["n"]), int(srow["s"] or 0)
        total = self._n_docs + n_new
        avgdl = (
            (self._avgdl * self._n_docs + dl_new) / total if total else 0.0
        )
        segments = tuple(self._segments) + (str(run_id),)
        # commit point: the segment becomes visible here
        self._write_meta(
            self._spark, self._path, total, avgdl, self._k1, self._b,
            idc, self._attr_cols, self._n_buckets,
            postings_dir=self._postings_dir, doclens_dir=self._doclens_dir,
            segments=segments,
        )
        self._doclens.unpersist()
        return type(self).load(self._spark, self._path)

    def delete(self, doc_ids: list) -> "ShardedBM25Index":
        """Delete documents from the index (r13) — the reference's
        delete-by-document reconciliation (worker/app/services/
        qdrant_io.py delete path; SURVEY K4) for the lexical store,
        tombstone-style: the ids land in ``tombstones/`` (request-sized
        by contract), the corpus scalars update EXACTLY in the meta
        commit (n_docs/avgdl subtract the deleted doclens), and serving
        switches to the df_t-recompute path (:meth:`_lookup_parts` —
        the same machinery segments use), so the EXACT faces score
        byte-identically to an index rebuilt without the documents.
        Physical erasure and the impact faces return at
        :meth:`compact` (stored impacts bake scalars, same reasoning as
        append). Deleting an unknown id is harmless; deletes merge."""
        if self._pruned:
            raise ValueError(
                "delete: this index was built with max_postings_per_term "
                "(statically pruned) — tombstone-mode serving recomputes "
                "df_t from the stored (pruned) lists and would score "
                "WRONG; rebuild without the documents instead"
            )
        idc = self._id_col
        spark = self._spark
        ids = sorted({str(x) for x in doc_ids})
        if not ids:
            return self
        prev = (
            [r["_id"] for r in self._tombs.collect()]
            if self._tombs is not None
            else []
        )
        asked = set(ids) - set(prev)
        # only ids that EXIST tombstone (a never-ingested id would tax
        # every lookup and block its future append for nothing); the
        # probe is one filter over the narrow persisted doclens
        exist_rows = (
            self._doclens.filter(
                F.col(idc).cast("string").isin(sorted(asked))
            )
            .select(F.col(idc).cast("string").alias("_i"), "dl")
            .collect()
        )
        fresh = {r["_i"] for r in exist_rows}
        merged = sorted(set(prev) | fresh)
        if not fresh:
            return self
        n_del = len(exist_rows)
        dl_del = sum(int(r["dl"]) for r in exist_rows)
        total = self._n_docs - n_del
        avgdl = (
            (self._avgdl * self._n_docs - dl_del) / total if total > 0 else 0.0
        )
        local_rows_df(
            spark, [(i,) for i in merged], "_id string"
        ).write.mode("overwrite").parquet(
            f"{self._path}/tombstones"
        )
        self._write_meta(
            spark, self._path, total, avgdl, self._k1, self._b, idc,
            self._attr_cols, self._n_buckets,
            postings_dir=self._postings_dir, doclens_dir=self._doclens_dir,
            segments=tuple(self._segments), n_deleted=len(merged),
        )
        self._doclens.unpersist()
        return type(self).load(spark, self._path)

    def compact(
        self, max_postings_per_term: int | None = None
    ) -> "ShardedBM25Index":
        """Fold live segments into a fresh base layout — the segment
        merge that restores the no-tax serving shape (stored df_t valid
        again, no per-query recompute window) and recomputes every
        posting's impact/rank under the MERGED corpus scalars, making
        the impact faces exact again (impact columns byte-identical to
        a fresh build of the merged corpus: shared ``_with_impacts``).
        Stage-and-swap through the meta commit point: the folded
        postings land at ``postings_v<k>/`` (same term-hash buckets)
        and doclens at ``doclens_v<k>/``; the old directories are
        removed best-effort AFTER the meta lands (single-writer
        maintenance window — a lazy reader mid-scan should finish
        before compaction runs). No-op without segments. One
        term-keyed shuffle over the merged postings (df_t + rank
        windows share it) and one bucket-keyed write."""
        if not self._segments and self._tombs is None:
            return self
        import shutil

        spark = self._spark
        keep_impact = "impact_rank" in self._posts.columns
        core = ["term", self._id_col, "dl", "tf"]
        merged = self._posts.select(*core)
        for seg in self._seg_posts:
            merged = merged.unionByName(seg.select(*core))
        if self._tombs is not None:
            # physical erasure of pending deletes rides the fold — df_t
            # and impacts below are computed over the survivors only
            merged = merged.join(
                F.broadcast(self._tombs),
                merged[self._id_col].cast("string") == F.col("_id"),
                "left_anti",
            )
        dfreq = merged.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
        joined = merged.join(dfreq, "term")
        if keep_impact or max_postings_per_term is not None:
            joined = _with_impacts(
                joined, self._n_docs, self._avgdl, self._k1, self._b,
                self._id_col, max_postings_per_term, keep_impact,
            )
        sort_cols = ["term", "impact_rank"] if keep_impact else ["term"]

        def _bump(rel: str, stem: str) -> str:
            v = int(rel.rsplit("_v", 1)[1]) if "_v" in rel else 0
            return f"{stem}_v{v + 1}"

        new_posts_rel = _bump(self._postings_dir, "postings")
        new_dl_rel = _bump(self._doclens_dir, "doclens")
        (
            joined.withColumn(
                "term_bucket", _term_bucket(F.col("term"), self._n_buckets)
            )
            .repartition(F.col("term_bucket"))
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(f"{self._path}/{new_posts_rel}")
        )
        self._doclens.write.mode("overwrite").parquet(
            f"{self._path}/{new_dl_rel}"
        )
        old_dirs = [
            f"{self._path}/{self._postings_dir}",
            f"{self._path}/{self._doclens_dir}",
        ] + [
            f"{self._path}/{sub}/{rid}"
            for rid in self._segments
            for sub in ("postings_incr", "doclens_incr")
        ]
        if self._tombs is not None:
            old_dirs.append(f"{self._path}/tombstones")
        # commit point: segments cleared, dir pointers swapped; a
        # freshly-applied static cap marks the new base pruned (its
        # lists can no longer recompute true df_t, so maintenance on it
        # must rebuild — the same contract as a pruned build())
        self._write_meta(
            spark, self._path, self._n_docs, self._avgdl, self._k1,
            self._b, self._id_col, self._attr_cols, self._n_buckets,
            postings_dir=new_posts_rel, doclens_dir=new_dl_rel,
            pruned=max_postings_per_term is not None,
        )
        for d in old_dirs:
            shutil.rmtree(d, ignore_errors=True)
        self._doclens.unpersist()
        return type(self).load(spark, self._path)

    def _lookup_parts(self, cond) -> DataFrame:
        """Bucket-pruned rows from the base layout plus every live
        segment (all partitioned the same way, so the pruning predicate
        lands on every scan). With segments present, the stored ``df_t``
        is stale for any term the segments touch — it is recomputed
        EXACTLY over the retrieved rows: the pruned scan returns each
        term's COMPLETE posting list (a term's list lives in exactly one
        bucket, in every part), so a per-term count over the lookup
        equals the merged index's df_t. Cost is a window over the query
        terms' rows only — the segment-mode serving tax; :meth:`compact`
        removes it."""
        base = self._posts.filter(cond)
        if not self._seg_posts and self._tombs is None:
            return base
        from pyspark.sql import Window

        core = ["term", self._id_col, "dl", "tf", "term_bucket"]
        u = base.select(*core)
        for seg in self._seg_posts:
            u = u.unionByName(seg.filter(cond).select(*core))
        if self._tombs is not None:
            # deleted docs leave the lookup BEFORE the df_t recompute,
            # so per-term df is exact for the post-delete corpus
            u = u.join(
                F.broadcast(self._tombs),
                u[self._id_col].cast("string") == F.col("_id"),
                "left_anti",
            )
        return u.withColumn(
            "df_t", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )

    def _lookup(self, terms: list) -> DataFrame:
        buckets = sorted({_term_bucket_py(t, self._n_buckets) for t in terms})
        return self._lookup_parts(
            F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
        )

    def _lookup_batch(self, qdf: DataFrame, terms: list) -> DataFrame:
        buckets = sorted({_term_bucket_py(t, self._n_buckets) for t in terms})
        # df_t (in segment mode) is computed over the bucket-pruned rows
        # BEFORE the query join — a term shared by two queries would
        # double its window count after the join
        return self._lookup_parts(F.col("term_bucket").isin(buckets)).join(
            F.broadcast(qdf), "term"
        )

    # -- impact-ordered (dynamic-pruning) serving -------------------------

    def _require_impact(self) -> None:
        if self._tombs is not None:
            raise ValueError(
                "impact-ordered serving is unavailable while deletions "
                "are pending: stored impacts/ranks bake pre-delete corpus "
                "scalars and df_t — compact() erases the tombstoned "
                "documents and restores exact impact order (the exact "
                "faces topk/topk_batch remain correct throughout)"
            )
        if self._segments:
            raise ValueError(
                "impact-ordered serving is unavailable while append() "
                "segments are live: stored impacts/ranks are computed "
                "under build-time corpus scalars and segment rows carry "
                "none — compact() folds the segments and restores exact "
                "impact order (the exact faces topk/topk_batch remain "
                "correct throughout)"
            )
        if "impact_rank" not in self._posts.columns:
            raise ValueError(
                "this index was built with impact_ordered=False — "
                "rebuild with impact_ordered=True for prefix serving"
            )

    def _impact_prefix(self, terms: list, depth: int) -> DataFrame:
        """The query terms' top-``depth`` postings by stored impact:
        bucket partition-pruning as in :meth:`_lookup`, plus an
        ``impact_rank <= depth`` pushed predicate that skips hot terms'
        tails at the row-group level (files are (term, impact_rank)-
        sorted at build). Result size is bounded by |terms| * depth."""
        return self._lookup(terms).filter(F.col("impact_rank") <= depth)

    def topk_impact(
        self,
        query: str,
        k: int = 10,
        depth: int = 1000,
        with_certificate: bool = False,
    ):
        """Impact-ordered prefix serving (Anh & Moffat, SIGIR'06): score
        only each query term's top-``depth`` postings by their stored
        exact BM25 contribution. Per-query cost is bounded by
        ``|terms| * depth`` postings REGARDLESS of df — the df-linear
        hot-term residue exact serving can't avoid (the PERF.md round-12
        two-regime table's common-words wall) becomes a constant-size
        read; quality degrades gracefully and is benched
        (bench_bm25_sharded recall-vs-depth table).

        A posting's stored impact equals the per-posting ``w`` the exact
        path computes (same expression, same constants, at build), so at
        a depth covering every list the scores — and the 6dp-rounded
        output — equal :meth:`topk` exactly (test-pinned).

        ``with_certificate=True`` additionally returns the WAND-style
        rank-safety verdict: per term the unread tail is bounded by the
        depth-th (smallest read) impact, so every doc's true score lies
        in [partial, partial + Σ unseen-term tail bounds]; if the k-th
        best partial beats every other doc's upper bound (including the
        all-tails bound of never-seen docs), AND every returned doc was
        seen in every CAPPED term's prefix (a term read in full has no
        tail, so absence there is a true zero), the returned top-k is
        provably the exact one — set AND scores (each winner's partial
        is its complete sum). The certificate aggregates run on the
        prefix frame, whose size is depth-bounded by construction —
        the two tiny collects here are |terms|- and 1-row-sized.

        Returns the (id, bm25) frame, or (frame, certified: bool) when
        ``with_certificate=True``."""
        self._require_impact()
        terms = sorted({t.lower() for t in query.split() if t})
        idc = self._id_col
        spark = self._posts.sparkSession
        if not terms:
            idt = self._doclens.schema[idc].dataType.simpleString()
            empty = local_rows_df(spark, [], f"{idc} {idt}, bm25 double")
            return (empty, True) if with_certificate else empty
        prefix = self._impact_prefix(terms, depth)
        if not with_certificate:
            out = prefix.groupBy(idc).agg(
                F.round(F.sum("impact"), 6).alias("bm25")
            )
            return out.orderBy(
                F.col("bm25").desc(), F.col(idc).asc()
            ).limit(k)

        # one materialization of the depth-bounded prefix feeds the
        # per-term tail bounds, the scores, and the certificate
        prefix = prefix.localCheckpoint(eager=False)
        trows = (
            prefix.groupBy("term")
            .agg(F.count(F.lit(1)).alias("n"), F.min("impact").alias("lo"))
            .collect()
        )
        # a term whose whole list fits inside the prefix has NO unread
        # tail; otherwise the tail is bounded by the smallest read impact
        tails = {
            r["term"]: (float(r["lo"]) if int(r["n"]) >= depth else 0.0)
            for r in trows
        }
        t_sum = sum(tails.values())
        n_capped = sum(1 for v in tails.values() if v > 0.0)
        tail_df = local_rows_df(
            spark, [(t, v) for t, v in tails.items()],
            "term string, _tail double",
        )
        aggd = (
            prefix.join(F.broadcast(tail_df), "term")
            .groupBy(idc)
            .agg(
                F.sum("impact").alias("_partial"),
                F.sum("_tail").alias("_seen_tail"),
                F.sum(
                    F.when(F.col("_tail") > 0.0, 1).otherwise(0)
                ).alias("_n_capped_seen"),
            )
            .withColumn(
                "_upper",
                F.col("_partial") + F.lit(t_sum) - F.col("_seen_tail"),
            )
            .localCheckpoint(eager=False)
        )
        from pyspark.sql import Window

        # single-partition window is fine: aggd is depth-bounded
        w = Window.orderBy(F.col("_partial").desc(), F.col(idc).asc())
        ranked = aggd.withColumn("_rn", F.row_number().over(w))
        cert_row = ranked.agg(
            F.min(F.when(F.col("_rn") <= k, F.col("_partial"))).alias("kth"),
            F.max(F.when(F.col("_rn") > k, F.col("_upper"))).alias("out_max"),
            F.min(
                F.when(F.col("_rn") <= k, F.col("_n_capped_seen"))
            ).alias("min_capped"),
        ).first()
        kth = cert_row["kth"]
        out_max = cert_row["out_max"]
        # STRICT inequalities: an exact tie (common in replicated
        # corpora) means the boundary doc is interchangeable with one we
        # can't see fully — escalate rather than claim safety
        certified = kth is not None and (
            # docs outside the returned set can't overtake ...
            (out_max is None or float(kth) > float(out_max))
            # ... and neither can a doc absent from every prefix ...
            and float(kth) > t_sum
            # ... and every winner's score is COMPLETE: seen in every
            # capped term (uncapped terms are fully read — absence there
            # is a true zero, never a hidden tail contribution)
            and int(cert_row["min_capped"] or 0) >= n_capped
        )
        out = (
            ranked.filter(F.col("_rn") <= k)
            .select(idc, F.round(F.col("_partial"), 6).alias("bm25"))
            .orderBy(F.col("bm25").desc(), F.col(idc).asc())
        )
        return out, bool(certified)

    def topk_batch_impact(
        self, queries: list, k: int = 10, depth: int = 1000
    ) -> DataFrame:
        """Batched :meth:`topk_impact` (no certificate): one job for N
        queries, each reading only its terms' top-``depth`` postings —
        the (query_id, id, bm25) contract of :meth:`topk_batch` with
        per-query cost bounded by ``|terms| * depth`` postings. Parity
        with the single-query face is test-pinned."""
        self._require_impact()
        spark = self._posts.sparkSession
        qterms = [
            (qi, t)
            for qi, q in enumerate(queries)
            for t in sorted({t.lower() for t in q.split() if t})
        ]
        idc = self._id_col
        if not qterms:
            idt = self._doclens.schema[idc].dataType.simpleString()
            return local_rows_df(
                spark, [], f"query_id int, {idc} {idt}, bm25 double"
            )
        qdf = local_rows_df(spark, qterms, "query_id int, term string")
        posted = self._lookup_batch(
            qdf, sorted({t for _, t in qterms})
        ).filter(F.col("impact_rank") <= depth)
        agg = posted.groupBy("query_id", idc).agg(
            F.round(F.sum("impact"), 6).alias("bm25")
        )
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.col("bm25").desc(), F.col(idc).asc()
        )
        return (
            agg.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )

    def topk_adaptive(
        self,
        query: str,
        k: int = 10,
        depth0: int = 1000,
        max_doublings: int = 3,
    ):
        """Rank-safe serving with bounded early exit: run
        :meth:`topk_impact` at ``depth0`` and geometrically escalate
        (2x per round, at most ``max_doublings`` times) until the
        certificate holds; past the cap, fall back to the exact scan.
        Discriminative queries certify at the first depth (their rare
        term's whole list fits, so its tail bound is 0 and the rare-term
        gap dominates); bag-of-common-words queries either certify at a
        deeper prefix or pay the exact cost they always did — never a
        silent quality loss (the RoutedBM25 rule's measured failure
        regime, closed). Total read <= 2x the certifying depth thanks to
        the geometric schedule. Returns (frame, info dict with the depth
        used and whether the exact fallback fired)."""
        depth = depth0
        for _ in range(max_doublings + 1):
            out, ok = self.topk_impact(
                query, k=k, depth=depth, with_certificate=True
            )
            if ok:
                return out, {"depth": depth, "exact_fallback": False}
            depth *= 2
        return self.topk(query, k=k), {
            "depth": None,
            "exact_fallback": True,
        }

    def topk_batch_adaptive(
        self,
        queries: list,
        k: int = 10,
        depth0: int = 1000,
        max_doublings: int = 3,
    ):
        """Batched rank-safe serving — the production shape: ONE prefix
        job certifies every query in the batch (per-query tail bounds /
        partials / k-th-vs-outside-upper comparison, all grouped by
        query_id over the depth-bounded prefix), then only the
        UNCERTIFIED sub-batch escalates to the doubled depth; whatever
        survives ``max_doublings`` rounds uncertified is served by one
        exact :meth:`topk_batch` job. Per-query results carry the same
        set-exactness guarantee as :meth:`topk_adaptive` (parity
        test-pinned). Job count per round is constant in the batch size
        — the RoutedBM25 batched-routing lesson applied to
        certification. Returns (frame keyed by the CALLER's query_id,
        info dict {certified_at: {depth: [query_id, ...]},
        exact_fallback: [query_id, ...]})."""
        self._require_impact()
        spark = self._posts.sparkSession
        idc = self._id_col
        idt = self._doclens.schema[idc].dataType.simpleString()
        empty = local_rows_df(
            spark, [], f"query_id int, {idc} {idt}, bm25 double"
        )
        pending = list(range(len(queries)))
        pieces, info = [], {"certified_at": {}, "exact_fallback": []}
        depth = depth0
        for _ in range(max_doublings + 1):
            if not pending:
                break
            qterms = [
                (qi, t)
                for qi in pending
                for t in sorted({t.lower() for t in queries[qi].split() if t})
            ]
            if not qterms:
                # all-empty queries: nothing to score, trivially certified
                for qi in pending:
                    info["certified_at"].setdefault(depth, []).append(qi)
                pending = []
                break
            qdf = local_rows_df(spark, qterms, "query_id int, term string")
            prefix = (
                self._lookup_batch(qdf, sorted({t for _, t in qterms}))
                .filter(F.col("impact_rank") <= depth)
                .localCheckpoint(eager=False)
            )
            # per-(query, term) tail bound: smallest read impact if the
            # term's prefix is full-depth, else 0 (whole list read)
            tails = prefix.groupBy("query_id", "term").agg(
                F.when(
                    F.count(F.lit(1)) >= depth, F.min("impact")
                ).otherwise(F.lit(0.0)).alias("_tail")
            )
            t_sums = {
                int(r["query_id"]): float(r["ts"])
                for r in tails.groupBy("query_id")
                .agg(F.coalesce(F.sum("_tail"), F.lit(0.0)).alias("ts"))
                .collect()
            }
            n_capped = {
                int(r["query_id"]): int(r["nc"])
                for r in tails.groupBy("query_id")
                .agg(
                    F.sum(
                        F.when(F.col("_tail") > 0.0, 1).otherwise(0)
                    ).alias("nc")
                )
                .collect()
            }
            aggd = (
                prefix.join(tails, ["query_id", "term"])
                .groupBy("query_id", idc)
                .agg(
                    F.sum("impact").alias("_partial"),
                    F.sum("_tail").alias("_seen_tail"),
                    F.sum(
                        F.when(F.col("_tail") > 0.0, 1).otherwise(0)
                    ).alias("_n_capped_seen"),
                )
                .localCheckpoint(eager=False)
            )
            from pyspark.sql import Window

            w = Window.partitionBy("query_id").orderBy(
                F.col("_partial").desc(), F.col(idc).asc()
            )
            ranked = aggd.withColumn("_rn", F.row_number().over(w))
            # per-query certificate in ONE aggregate: a doc's upper
            # bound is partial + (the query's all-terms tail sum − the
            # tails of terms it WAS seen in); the query's t_sum joins in
            # as a tiny broadcast frame
            tsum_df = local_rows_df(
                spark, [(qi, t_sums.get(qi, 0.0)) for qi in pending],
                "query_id int, _tsum double",
            )
            upper = F.col("_partial") + F.col("_tsum") - F.col("_seen_tail")
            cert = {
                int(r["query_id"]): (
                    r["kth"], r["out_max"], float(r["ts"]), r["min_capped"]
                )
                for r in ranked.join(F.broadcast(tsum_df), "query_id")
                .groupBy("query_id")
                .agg(
                    F.min(
                        F.when(F.col("_rn") <= k, F.col("_partial"))
                    ).alias("kth"),
                    F.max(F.when(F.col("_rn") > k, upper)).alias("out_max"),
                    F.first("_tsum").alias("ts"),
                    F.min(
                        F.when(F.col("_rn") <= k, F.col("_n_capped_seen"))
                    ).alias("min_capped"),
                )
                .collect()
            }
            certified = []
            for qi in pending:
                kth, out_max, t_sum, min_capped = cert.get(
                    qi, (None, None, 0.0, None)
                )
                # STRICT inequalities — exact ties escalate; winners must
                # be score-COMPLETE (seen in every capped term) — the
                # single-query certificate's contract
                if (
                    kth is not None
                    and float(kth) > t_sum
                    and (out_max is None or float(kth) > float(out_max))
                    and int(min_capped or 0) >= n_capped.get(qi, 0)
                ):
                    certified.append(qi)
            if certified:
                cset = set(certified)
                part = (
                    ranked.filter(
                        F.col("query_id").isin(sorted(cset))
                        & (F.col("_rn") <= k)
                    )
                    .select(
                        "query_id",
                        idc,
                        F.round(F.col("_partial"), 6).alias("bm25"),
                    )
                )
                pieces.append(part.localCheckpoint(eager=False))
                info["certified_at"].setdefault(depth, []).extend(sorted(cset))
                pending = [qi for qi in pending if qi not in cset]
            depth *= 2
        if pending:
            sub = [queries[qi] for qi in pending]
            remap = local_rows_df(
                spark, [(i, qi) for i, qi in enumerate(pending)],
                "query_id int, _orig int",
            )
            part = self.topk_batch(sub, k=k)
            part = (
                part.join(F.broadcast(remap), "query_id")
                .drop("query_id")
                .withColumnRenamed("_orig", "query_id")
                .select("query_id", idc, "bm25")
            )
            pieces.append(part)
            info["exact_fallback"] = sorted(pending)
        out = empty
        for p in pieces:
            out = out.unionByName(p)
        return out, info

    def close(self) -> None:
        self._doclens.unpersist()

class RoutedBM25:
    """Workload router over two :class:`ShardedBM25Index` builds of the
    SAME corpus — exact and impact-pruned. The pruned index is 10-20x
    cheaper per query but only rank-safe when the query carries a
    discriminative term (bench_bm25_sharded: recall@10 = 1.0 on
    entity-shaped queries, 0.0 on bag-of-common-words — PERF.md round
    12). The router applies exactly that measured rule per query: route
    to the pruned index iff the query's MINIMUM term df ≤ ``df_max``
    (a discriminative term dominates the ranking and its postings all
    survive the cap); otherwise serve exact.

    The df lookup reads the pruned index's own postings (df_t is baked
    into every row, and the probe partition-prunes to the query's
    buckets like any query) — one tiny job, no driver-side vocabulary.
    A term absent from BOTH indexes contributes nothing to either
    ranking and is ignored for routing. ``topk_batch`` routes the WHOLE
    batch with ONE probe action (distinct term→df_t over the union of
    the batch's buckets — a batch-terms-sized collect — then the min-df
    rule folds driver-side; r12 verdict #2: the previous per-query
    ``_route`` loop launched N sequential driver-bound probe jobs
    before any scoring), then runs ONE scoring job per sub-batch,
    re-keyed to the caller's query_ids. Probe job count is CONSTANT in
    the batch size, test-pinned.
    """

    def __init__(
        self,
        exact: "ShardedBM25Index",
        pruned: "ShardedBM25Index",
        df_max: int,
    ) -> None:
        if exact._id_col != pruned._id_col:
            raise ValueError("exact and pruned indexes disagree on id_col")
        self._exact = exact
        self._pruned = pruned
        self._df_max = int(df_max)

    def _route(self, query: str) -> bool:
        """True -> pruned. Min df over the query's terms, read from the
        pruned postings (bucket-pruned probe)."""
        return self._route_batch([query])[0]

    def _route_batch(self, queries: list) -> "list[bool]":
        """Route every query with ONE probe action: the distinct
        term→df_t pairs over the union of the batch's buckets (bucket +
        term partition-pruned, exactly like a query's own scan) collect
        once — the result is bounded by the batch's distinct TERM count,
        not by any posting list — and the per-query min-df rule folds
        driver-side over that tiny map. Constant job count in the batch
        size (test-pinned); the previous per-query loop launched N
        sequential probe jobs before any scoring started. A query with
        no surviving terms routes exact (it would score empty either
        way)."""
        per_q = [sorted({t.lower() for t in q.split() if t}) for q in queries]
        all_terms = sorted({t for ts in per_q for t in ts})
        if not all_terms:
            return [False] * len(queries)
        df_by_term = {
            r["term"]: int(r["df_t"])
            for r in self._pruned._lookup(all_terms)
            .select("term", "df_t")
            .distinct()
            .collect()
        }
        out = []
        for ts in per_q:
            dfs = [df_by_term[t] for t in ts if t in df_by_term]
            out.append(bool(dfs) and min(dfs) <= self._df_max)
        return out

    def topk(self, query: str, k: int = 10, filter=None) -> DataFrame:
        idx = self._pruned if self._route(query) else self._exact
        return idx.topk(query, k=k, filter=filter)

    def topk_batch(self, queries: list, k: int = 10) -> DataFrame:
        spark = self._exact._posts.sparkSession
        routed = self._route_batch(queries)
        out = None
        for use_pruned in (False, True):
            sub = [
                (qi, q)
                for qi, (q, r) in enumerate(zip(queries, routed))
                if r == use_pruned
            ]
            if not sub:
                continue
            idx = self._pruned if use_pruned else self._exact
            part = idx.topk_batch([q for _, q in sub], k=k)
            remap = local_rows_df(
                spark, [(i, qi) for i, (qi, _) in enumerate(sub)],
                "query_id int, _orig int",
            )
            part = (
                part.join(F.broadcast(remap), "query_id")
                .drop("query_id")
                .withColumnRenamed("_orig", "query_id")
                .select("query_id", *[c for c in part.columns if c != "query_id"])
            )
            out = part if out is None else out.unionByName(part)
        if out is None:
            idt = self._exact._doclens.schema[
                self._exact._id_col
            ].dataType.simpleString()
            return local_rows_df(
                spark, [],
                f"query_id int, {self._exact._id_col} {idt}, bm25 double",
            )
        return out

    def close(self) -> None:
        self._exact.close()
        self._pruned.close()


def mine_hard_negatives(
    pairs: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    positive_id_col: str = "positive_id",
) -> DataFrame:
    """BM25 hard-negative mining for retrieval/embedding training — the
    offline job that turns (query, positive) supervision into
    (query, positive, hard negatives) triplets (the DPR / sentence-
    transformers recipe: the strongest negatives are the lexically
    closest NON-relevant documents, and BM25 finds them without a
    trained model in the loop).

    ``pairs``: one row per (query_id, query_text, positive_id);
    repeated query_ids with different positives are fine — every listed
    positive is excluded. Returns ``(query_id, doc_id, rank, bm25)``:
    the top-``k`` BM25-scored corpus documents per query, positives
    removed BEFORE the rank cut so each query still yields k negatives.

    The whole batch is ONE plan — no per-query driver loop (the
    RoutedBM25 routing lesson): the corpus tokenizes once; postings are
    restricted to the batch's union vocabulary via a broadcast semi-join
    (the filter reaches the explode, so a 10k-term batch never
    materializes full-corpus postings); df_t comes from a term-partition
    window over that restricted posting (corpus-global df, the q30
    arithmetic unchanged); one term-keyed join fans contributions out to
    queries; per-query top-k is a query-partitioned row_number. At 100 TB
    serve instead from a prebuilt ShardedBM25Index (`topk_batch`) — this
    raw-corpus form exists for mining runs where no index is standing.

    CONTRACT: corpus ``id_col`` must be unique per document (r15 ADVICE,
    same contract as :func:`bm25_topk`): the single-pass corpus stats
    group sentinel rows by (id, dl, term), so duplicate (id, dl) corpus
    rows would collapse in n_docs/avgdl and diverge from the oracle's
    count(*)/avg(dl).
    """
    from pyspark.sql import Window

    # One corpus tokenization for the WHOLE mine (postings, df_t, and the
    # corpus-global n_docs/avgdl scalars). The naive three-branch form
    # (postings explode / df_t agg / stats agg) re-tokenizes the corpus
    # once per branch because column pruning specializes each branch's
    # aggregate and kills exchange reuse. Instead every doc emits one
    # SENTINEL row alongside its tokens (the sentinel contains whitespace,
    # which tokens() can never produce), the sentinel rides the vocabulary
    # broadcast, and all three consumers aggregate the SAME
    # (term, doc, dl) frame — each referencing tf so Catalyst cannot prune
    # the count out of the shared subtree, which makes all branches hit
    # ONE ReusedExchange over one tokenize+explode pass.
    _SENT = _SENT_TERM
    qt = pairs.select(
        F.col(query_id_col),
        F.explode(
            F.array_distinct(F.transform(tokens(F.col(query_text_col)), F.lower))
        ).alias("term"),
    ).distinct()
    vocab = qt.select("term").distinct().unionAll(
        pairs.sparkSession.range(1).select(F.lit(_SENT).alias("term"))
    )
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    base = corpus.select(F.col(id_col), toks.alias("_tk")).withColumn(
        "dl", F.size("_tk")
    )
    tok_rows = base.select(
        id_col,
        "dl",
        F.explode(
            F.concat(
                F.array(F.lit(_SENT)),
                F.coalesce("_tk", F.array().cast("array<string>")),
            )
        ).alias("term"),
    )
    grouped = (
        tok_rows.join(F.broadcast(vocab), "term")
        .groupBy("term", id_col, "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # n_docs/avgdl from the sentinel rows via conditional aggregation (a
    # term==SENT *filter* would push below grouped's aggregate and split
    # the exchange); count(when(..., tf)) keeps tf referenced so the
    # subtree stays identical to the postings branch. Sentinel rows exist
    # for EVERY doc (empty and null text included), so n_docs/avgdl match
    # the plain corpus aggregate exactly (dl is integral: avg is the exact
    # long sum over count in any order).
    stats = grouped.agg(
        F.count(F.when(F.col("term") == _SENT, F.col("tf"))).alias("n_docs"),
        F.avg(F.when(F.col("term") == _SENT, F.col("dl"))).alias("avgdl"),
    )
    # df_t via partial-agg + broadcast join, NOT a term-partition window:
    # the window re-shuffles EVERY restricted posting row by term just to
    # attach a per-term count. count(when(tf > 0, tf)) == count(1) here
    # (tf = count(1) >= 1 always) but the optimizer cannot prove that, so
    # tf stays referenced and the subtree stays identical to the postings
    # branch (a bare count("tf") gets rewritten to count(1), tf pruned,
    # and the shared exchange specialized away). The sentinel's df row
    # never matches a real posting term; the later inner join against qt
    # drops the sentinel postings themselves.
    dft = grouped.groupBy("term").agg(
        F.count(F.when(F.col("tf") > 0, F.col("tf"))).alias("df_t")
    )
    posted = grouped.join(F.broadcast(dft), "term")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = (
        posted.join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("w", idf * F.col("tf") * F.lit(k1 + 1.0) / denom)
    )
    scored = contrib.groupBy(query_id_col, id_col).agg(
        F.round(F.sum("w"), 6).alias("bm25")
    )
    # positives are batch-sized — broadcast the anti-join side so the
    # corpus×batch scored frame never shuffles just to drop labeled rows
    negatives = scored.join(
        F.broadcast(
            pairs.select(F.col(query_id_col), F.col(positive_id_col).alias(id_col))
        ),
        [query_id_col, id_col],
        "left_anti",
    )
    rn = F.row_number().over(
        Window.partitionBy(query_id_col).orderBy(
            F.col("bm25").desc(), F.col(id_col).asc()
        )
    )
    return (
        negatives.withColumn("rank", rn)
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "bm25")
    )


def mine_hard_negatives_indexed(
    index,
    queries: list,
    positives: dict,
    k: int = 5,
) -> DataFrame:
    """The standing-index form of :func:`mine_hard_negatives` — when a
    BM25 index already serves the corpus (BM25Index, ShardedBM25Index,
    or RoutedBM25: anything with the ``topk_batch(queries, k)`` face),
    recurring mining jobs should read the PREBUILT postings instead of
    re-deriving them per batch (PERF.md's measured division of labor:
    raw-corpus mining is corpus-linear per query once the batch
    amortizes; indexed serving is |terms|/n_buckets IO).

    ``queries``: list of ``(query_id, query_text)``; ``positives`` maps
    query_id -> iterable of positive doc ids to exclude. Returns
    ``(query_id, <id>, rank, bm25)`` — top-``k`` negatives per query
    with the caller's query ids (the index's positional ids are
    re-keyed), positives excluded BEFORE the rank cut: the index is
    over-fetched by the largest positive set so exclusion can never
    starve a query below k.
    """
    from jsonify2ai_spark.operators.search import _rekey_exclude_rank

    texts = [q for _, q in queries]
    over = k + max((len(v) for v in positives.values()), default=0)
    res = index.topk_batch(texts, k=over)
    id_col = [c for c in res.columns if c not in ("query_id", "bm25")][0]
    return _rekey_exclude_rank(
        res, queries, positives, k, score_col="bm25", id_col=id_col,
        out_score="bm25",
    )
