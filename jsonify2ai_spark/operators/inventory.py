"""Inventory / counting aggregations (SURVEY §2.4 A-series).

Reference behaviors:
- A1 documents inventory — group all chunks by document_id, collect kinds,
  first paths, per-kind counts, cap 200, sort desc (worker/app/routers/
  documents.py:19-102,163-168). The reference pages through Qdrant 8192 points
  at a time and merges dicts in Python; here it is one shuffle.
- A2/A3 counts — exact totals and filtered counts (worker/app/services/
  qdrant_client.py:611-675).
- A4 stats — total + per-kind + filtered in one pass
  (scripts/dev/tools/ingest_dropzone.py:541-567) = GROUPING SETS ((), (kind)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Exact-sum accumulator type for order-stable means. Decimal addition is
# ASSOCIATIVE (unlike float), so Spark's nondeterministic partial-agg combine
# order cannot change the sum by even one ulp; 18 fractional digits hold every
# rounding-relevant bit of an O(1)-magnitude double, and 20 integer digits
# leave ~1e19 of headroom before overflow (corpus sums here are <=1e9 * O(10)).
_DEC = "decimal(38,18)"


def _stable_avg(col: Column) -> Column:
    """Order-independent mean: exact decimal sum -> double, divided by the
    non-NULL count. ``F.avg`` sums doubles in whatever order partitions
    arrive; at a round(x, 4) boundary that reassociation noise (~1e-12
    relative) flips the last digit nondeterministically — the r5 q89 driver
    flake. DuckDB oracles mirror this expression verbatim
    (CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / count(x)), so both
    engines produce bit-identical means and the rounded value cannot diverge.
    """
    return F.sum(col.cast(_DEC)).cast("double") / F.count(col)


def _round_z(col: Column, scale: int) -> Column:
    """round() with the zero sign canonicalized to +0.0.

    Spark's round() (BigDecimal HALF_UP) emits +0.0 for a tiny-negative
    input where DuckDB's round() preserves the sign and emits -0.0. Python
    ``0.0 == -0.0`` is True so value comparison never sees it, but any
    byte-level canonicalizer (the driver hash) distinguishes the two — the
    r6 q89 driver red. Adding +0.0 after rounding maps -0.0 -> +0.0 by IEEE
    754 addition rules and is an exact no-op for every other value; DuckDB
    oracles mirror it as ``round(...) + 0.0``. Apply at EVERY rounded
    difference/mean that can straddle zero.
    """
    return F.round(col, scale) + F.lit(0.0)


def documents_inventory(
    chunks: DataFrame,
    doc_col: str = "document_id",
    kind_col: str = "kind",
    path_col: str = "path",
    limit: int = 200,
) -> DataFrame:
    """Per-document rollup: sorted kind set, first 3 sorted paths, chunk count.

    One hash aggregate (partial map-side combine is automatic), then a
    TakeOrdered for the cap — the 8192-page scroll loop of the reference
    becomes a single shuffle regardless of corpus size. The collected sets are
    sorted then comma-joined: deterministic, and scalar-typed so any
    row-hashing harness (the driver's canonicalizer rejects array cells) can
    consume the result.
    """
    return (
        chunks.groupBy(F.col(doc_col).alias("document_id"))
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set(kind_col))).alias("kinds"),
            F.concat_ws(
                ",", F.slice(F.array_sort(F.collect_set(path_col)), 1, 3)
            ).alias("paths"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .orderBy(F.col("document_id").desc())
        .limit(limit)
    )


def counts_by(df: DataFrame, *cols: str) -> DataFrame:
    """A3/A4: counts per group key(s) — one partial-aggregated shuffle."""
    return df.groupBy(*[F.col(c) for c in cols]).agg(F.count(F.lit(1)).alias("n"))


def count_where(df: DataFrame, predicate: Column) -> int:
    """A3 scalar form: exact count under a pushdown-able predicate."""
    return df.filter(predicate).count()


def stats_report(df: DataFrame, kind_col: str = "kind", filtered: Column | None = None) -> DataFrame:
    """A4: total + per-kind (+ optional filtered) counts in ONE scan using
    conditional aggregation over a rollup, instead of N filtered passes."""
    agg = [F.count(F.lit(1)).alias("n")]
    if filtered is not None:
        agg.append(F.count(F.when(filtered, 1)).alias("n_filtered"))
    return df.rollup(kind_col).agg(*agg)


def embedding_stats(
    df: DataFrame,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-health report: per-dimension n / mean / stddev / min / max
    over a vector column — the QA table a pipeline checks BEFORE building
    an ANN index (a dead dimension, a scale outlier, or NaN leakage each
    poison recall silently; this surfaces them as 64 rows a human reads).

    posexplode pins each value to its dimension; one partial-aggregated
    shuffle on the (tiny, = vector width) dimension key. mean and stddev
    are built from order-stable exact decimal sums (see :func:`_stable_avg`)
    rather than F.avg/F.stddev_pop, whose float-reassociation noise can
    flip the 4dp rounding nondeterministically under the oracle hash.
    NULL vectors contribute nothing; the `n` column exposes ragged widths
    (n < corpus rows for a dimension means short vectors exist).
    """
    ex = df.select(
        F.posexplode(F.col(vector_col).cast("array<double>")).alias("dim", "x")
    )
    x = F.col("x")
    mean = _stable_avg(x)
    # population variance from exact sums: E[x^2] - E[x]^2, clamped at 0
    # (the formula can dip a few ulp negative when variance ~ 0). Both
    # terms are bit-deterministic, so the sqrt is too. CAVEAT (advisor r6):
    # this one-pass form cancels catastrophically when |mean| >> stddev
    # (mean ~1e3 with stddev ~1e-3 loses every significant digit) — fine
    # for the O(1)-magnitude normalized-embedding components this operator
    # audits, NOT a general-purpose stddev. If large-offset dimensions ever
    # appear, subtract a per-dim pivot (e.g. the dimension's min) before
    # the decimal sums: shifted two-pass keeps determinism without the
    # cancellation.
    ssq_mean = F.sum((x * x).cast(_DEC)).cast("double") / F.count(x)
    stddev = F.sqrt(F.greatest(ssq_mean - mean * mean, F.lit(0.0)))
    return (
        ex.groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            _round_z(mean, 4).alias("mean"),
            _round_z(stddev, 4).alias("stddev"),
            _round_z(F.min("x"), 4).alias("vmin"),
            _round_z(F.max("x"), 4).alias("vmax"),
        )
        .orderBy("dim")
    )


def label_coherence(
    df: DataFrame,
    vector_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Embedding-space label QA: per label, member count and the mean cosine
    similarity of members to their label CENTROID — the one-table answer to
    "are these labels real clusters or noise?" before anyone trains a
    classifier head or trusts class-stratified sampling. A label whose
    mean-to-centroid cosine sits near the global background similarity is
    carrying no geometric signal (mislabeled or heterogeneous); a near-1.0
    label is redundant near-dup content.

    Two bounded shuffles: (1) posexplode -> (label, dim) means — key
    cardinality |labels| x dim, partial-aggregated; (2) members re-keyed by
    label against the BROADCAST centroid table (|labels| rows) — the
    per-row cosine is a map-side zip_with/aggregate fold, then one
    |labels|-keyed mean. No corpus-sized join, no driver collect.
    """
    vec = F.col(vector_col).cast("array<double>")
    base = df.filter(F.col(vector_col).isNotNull()).select(
        F.col(label_col).alias("lbl"), vec.alias("v")
    )
    dims = (
        base.select("lbl", F.posexplode("v").alias("d", "x"))
        .groupBy("lbl", "d")
        .agg(_stable_avg(F.col("x")).alias("m"))
    )
    cents = dims.groupBy("lbl").agg(
        F.array_sort(F.collect_list(F.struct("d", "m"))).alias("dm")
    ).select("lbl", F.transform("dm", lambda s: s["m"]).alias("centroid"))
    dot = F.aggregate(
        F.zip_with("v", "centroid", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    # zero-norm guard (same NULL-not-NaN contract as functions.vectors
    # cosine_similarity; ANSI mode raises on the raw division)
    den = norm(F.col("v")) * norm(F.col("centroid"))
    cos = F.when(den != 0, dot / den)
    return (
        base.join(F.broadcast(cents), "lbl")
        .select("lbl", cos.alias("_cos"))
        .groupBy("lbl")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            _round_z(_stable_avg(F.col("_cos")), 4).alias("mean_cos_to_centroid"),
            _round_z(F.min("_cos"), 4).alias("min_cos_to_centroid"),
        )
        .select(F.col("lbl").alias(label_col), "n", "mean_cos_to_centroid", "min_cos_to_centroid")
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    include_fingerprints: bool = False,
) -> DataFrame:
    """Corpus VERSION diff: per document id, its status between two corpus
    snapshots — added / removed / changed / unchanged — the audit a
    versioned training-data pipeline runs before re-embedding or
    re-training ("what actually moved between v3 and v4, and how much of
    it?"). Changed-ness is content identity (md5 of whitespace-normalized
    text), the same fingerprint the exact-dedup family keys on, so a
    formatting-only rewrite counts as unchanged.

    One full-outer equi-join on the id — the join key is the primary key,
    so there is no skew hazard and AQE sizes it; both inputs reduce to
    (id, 16-byte fingerprint) projections before the shuffle (no text
    movement). Output is corpus-sized; aggregate downstream if only the
    counts matter (:func:`corpus_diff_summary`).

    ``include_fingerprints=True`` adds the two fingerprint columns
    (``old_fingerprint``, ``new_fingerprint``, NULL on the absent side)
    so a lineage consumer can key follow-up work off content identity
    without re-hashing; the default output stays (id, status) — the q87
    contract.
    """
    from jsonify2ai_spark.functions.text import normalize_ws

    # presence flags, not fingerprint NULL-ness, decide added/removed:
    # a NULL-text document fingerprints to NULL, and reading that as
    # "absent" would call a deleted NULL-text doc 'added' (review-found);
    # null-safe fingerprint equality then treats NULL==NULL as unchanged
    fpo = old.select(
        F.col(id_col),
        F.md5(normalize_ws(F.col(text_col))).alias("_fo"),
        F.lit(True).alias("_po"),
    )
    fpn = new.select(
        F.col(id_col),
        F.md5(normalize_ws(F.col(text_col))).alias("_fn"),
        F.lit(True).alias("_pn"),
    )
    j = fpo.join(fpn, id_col, "full_outer")
    status = (
        F.when(F.col("_po").isNull(), F.lit("added"))
        .when(F.col("_pn").isNull(), F.lit("removed"))
        .when(F.col("_fo").eqNullSafe(F.col("_fn")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    if include_fingerprints:
        return j.select(
            F.col(id_col),
            F.col("_fo").alias("old_fingerprint"),
            F.col("_fn").alias("new_fingerprint"),
            status.alias("status"),
        )
    return j.select(F.col(id_col), status.alias("status"))


def corpus_diff_summary(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The churn card over :func:`corpus_diff`: ``(status, n_docs)`` plus
    a ``total`` row — the numbers a snapshot publication note carries.
    5-row-bounded output; the single wide shuffle is the diff's own (the
    diff subtree is checkpointed — it feeds both the per-status rollup
    and the total row)."""
    diff = corpus_diff(old, new, text_col, id_col).localCheckpoint(eager=False)
    per = diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))
    total = diff.agg(
        F.lit("total").alias("status"), F.count(F.lit(1)).alias("n_docs")
    )
    return per.unionByName(total)


def embedding_drift(
    old: DataFrame,
    new: DataFrame,
    vector_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Embedding DRIFT between two corpus/model versions, per label:
    member counts on each side, the cosine between the old and new label
    centroids, and the mean-norm delta — the re-index go/no-go check a
    versioned pipeline runs after re-embedding (a centroid cosine well
    under 1.0 on an unchanged label means the new model moved the space
    and EVERY downstream ANN index and threshold needs recalibration;
    norm drift alone breaks dot-product rankers).

    Same machinery as :func:`label_coherence` twice: per-(label, dim) mean
    via partial-aggregated posexplode (key cardinality |labels| x dim) on
    each side, centroids assembled by sorted collect, then ONE
    |labels|-sized join computes the cross-version cosine — no
    corpus-sized join anywhere; norms ride the same tiny aggregates.
    """
    def _cents(df: DataFrame, suffix: str) -> DataFrame:
        vec = F.col(vector_col).cast("array<double>")
        base = df.filter(F.col(vector_col).isNotNull()).select(
            F.col(label_col).alias("lbl"), vec.alias("v")
        )
        norm = F.sqrt(
            F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
        )
        stats = base.groupBy("lbl").agg(
            F.count(F.lit(1)).cast("bigint").alias(f"n_{suffix}"),
            # order-stable mean norm: the per-row norm is a sequential fold
            # (bit-parity with the oracle's list_sum); the cross-row mean is
            # an exact decimal sum so partial-agg order cannot move it
            _stable_avg(norm).alias(f"_mn_{suffix}"),
        )
        dims = (
            base.select("lbl", F.posexplode("v").alias("d", "x"))
            .groupBy("lbl", "d")
            .agg(_stable_avg(F.col("x")).alias("m"))
        )
        cents = (
            dims.groupBy("lbl")
            .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("dm"))
            .select("lbl", F.transform("dm", lambda s: s["m"]).alias(f"c_{suffix}"))
        )
        return stats.join(cents, "lbl")

    o, n = _cents(old, "old"), _cents(new, "new")
    j = o.join(n, "lbl", "full_outer")
    dot = F.aggregate(
        F.zip_with("c_old", "c_new", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    den = nrm(F.col("c_old")) * nrm(F.col("c_new"))
    return j.select(
        F.col("lbl").alias(label_col),
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
        # zero-norm / missing-side guard: NULL, never NaN or an ANSI error
        _round_z(F.when(den != 0, dot / den), 4).alias("centroid_cos"),
        _round_z(F.col("_mn_new") - F.col("_mn_old"), 4).alias("mean_norm_delta"),
    )
