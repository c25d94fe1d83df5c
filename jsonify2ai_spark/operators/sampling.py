"""Deterministic sampling for training-data pipelines.

`df.sample()`/`sampleBy()` use an RNG seeded per task attempt: retries,
repartitions, or a different executor count change WHICH rows are kept — at
100 TB that breaks resumability and makes experiment corpora irreproducible.
The engine-portable alternative: keep a row iff a content-derived hash of its
key falls under the quota. Same rows on every engine, every run, every
cluster shape; sampling composes with pushdown (it is a plain filter); and
nested quotas (90% -> 50%) are consistent because the hash is salted per
sampling stage.

Not in the reference (single-node, no sampling needs — SURVEY §4); this is
the standard hash-mod sampling used by large corpus pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000  # ppm resolution


def sample_hash(key: Column | str, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6) from md5(salt || key) — engine-portable
    (md5 + integer arithmetic only)."""
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint") % _BUCKETS


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — reproducible across
    retries/engines/cluster shapes, unlike rand()-based sample()."""
    return df.filter(sample_hash(key_col, salt) < int(fraction * _BUCKETS))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic quotas (e.g. per-language corpus mix):
    ``fractions`` maps stratum value -> keep fraction; strata not listed use
    ``default_fraction``. One map-side filter — no shuffle, no RNG."""
    quota = F.lit(int(default_fraction * _BUCKETS))
    for value, frac in fractions.items():
        quota = F.when(
            F.col(stratum_col) == value, F.lit(int(frac * _BUCKETS))
        ).otherwise(quota)
    return df.filter(sample_hash(key_col, salt) < quota)


def sample_to_token_budget(
    df: DataFrame,
    budget_tokens: int,
    stratum_col: str,
    weights: dict[str, float],
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Deterministic mixture sampling to a TOKEN budget: keep a hash-chosen
    subset whose per-stratum token mass approximates
    ``budget_tokens * w_s / Σw`` — the "mix corpora to a target token count
    and blend" step of training-data prep, as one aggregation plus one
    map-side filter.

    Per stratum s: target_s = budget * w_s / Σw; keep fraction
    f_s = min(1, target_s / total_tokens_s) (an under-supplied stratum
    contributes everything it has — the mix under-delivers rather than
    silently re-weighting). Rows are kept by the same engine-portable md5
    hash rule as :func:`deterministic_sample`, so the sample is reproducible
    across engines/retries/cluster shapes and composes with pushdown.
    Strata absent from ``weights`` get fraction 0 (excluded from the mix).

    Output: the kept rows + ``n_tokens`` (whitespace token count) and the
    stratum's ``keep_fraction``. One shuffle (the per-stratum token totals,
    broadcast back); the filter itself is map-side.
    """
    from jsonify2ai_spark.functions.text import token_count

    wsum = float(sum(weights.values()))
    w = F.lit(0.0)
    for value, weight in weights.items():
        w = F.when(F.col(stratum_col) == value, F.lit(float(weight))).otherwise(w)
    toks = df.withColumn("_tok", token_count(F.col(text_col)).cast("bigint"))
    totals = toks.groupBy(stratum_col).agg(F.sum("_tok").alias("_t_s"))
    frac = F.least(
        F.lit(1.0),
        (F.lit(float(budget_tokens)) * w / F.lit(wsum)) / F.col("_t_s"),
    )
    return (
        toks.join(F.broadcast(totals), stratum_col)
        .filter(sample_hash(key_col, salt) < frac * _BUCKETS)
        .withColumn("keep_fraction", F.round(frac, 6))
        .withColumnRenamed("_tok", "n_tokens")
        .drop("_t_s")
    )


def weighted_interleave(
    df: DataFrame,
    stratum_col: str,
    weights: dict[str, float],
    order_col: str,
    default_weight: float = 1.0,
    materialize_order: bool = False,
) -> DataFrame:
    """Deterministic weighted corpus mixing (stride scheduling): a global
    training order where a stratum with weight w appears ~w times as often
    as weight-1 strata, interleaved smoothly rather than concatenated.

    Each row's virtual time ``mix_vt`` = per-stratum rank / weight; the
    training order is orderBy(mix_vt, stratum, order_col). The per-stratum
    window and the range-partitioned global sort are both distributed
    shuffles, and the result is fully deterministic given (stratum,
    order_col) — an interrupted 100 TB mixing job resumes at the same order.

    ``materialize_order=True`` additionally numbers rows 1..N contiguously
    (``mix_order``). That is an empty-partition window — a single-reducer
    global pass — fine for samples and tests, NOT for the full corpus; at
    scale, sort by the key instead (writers consume order, not ordinals).
    """
    from pyspark.sql import Window

    w = F.lit(default_weight)
    for value, weight in weights.items():
        w = F.when(F.col(stratum_col) == value, F.lit(float(weight))).otherwise(w)
    rank = F.row_number().over(
        Window.partitionBy(stratum_col).orderBy(F.col(order_col).asc())
    )
    out = df.withColumn("mix_vt", rank.cast("double") / w)
    order = [F.col("mix_vt").asc(), F.col(stratum_col).asc(), F.col(order_col).asc()]
    if materialize_order:
        return out.withColumn("mix_order", F.row_number().over(Window.orderBy(*order)))
    return out.orderBy(*order)


def per_source_cap(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain document cap (the CommonCrawl-pipeline step: no single
    domain may contribute more than ``cap`` documents): every row gains its
    deterministic hash-order rank within its source and a ``kept`` flag
    (rank <= cap). Hash order makes the kept set a uniform random — but
    reproducible, partitioning-independent — ``cap``-subset per domain.

    Skew-aware two-phase rank: a naive row_number over
    partitionBy(source) funnels a hot domain (a billion-doc site at 100 TB)
    through ONE task. Instead the md5's first byte splits every source into
    256 sub-buckets: phase 1 aggregates (source, bucket) counts — a
    |sources| x 256-row table — and turns them into per-source running
    offsets; phase 2 ranks within (source, bucket) — 256x the parallelism
    on the hot key — and adds the broadcast offset. Because the bucket is a
    PREFIX of the ordering hash, offset + within-bucket rank IS the global
    per-source hash-order rank.
    """
    from pyspark.sql import Window

    h = F.md5(
        F.concat_ws(
            "|",
            F.coalesce(F.col(source_col), F.lit("")),
            F.col(id_col).cast("string"),
        )
    )
    based = df.select(
        F.col(id_col), F.col(source_col), h.alias("_h"),
        F.substring(h, 1, 2).alias("_bkt"),
    )
    counts = based.groupBy(source_col, "_bkt").agg(F.count(F.lit(1)).alias("_c"))
    offsets = counts.select(
        source_col,
        "_bkt",
        F.sum("_c")
        .over(
            Window.partitionBy(source_col)
            .orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        .alias("_off"),
    ).withColumn("_off", F.coalesce("_off", F.lit(0)))
    rk = F.row_number().over(
        Window.partitionBy(source_col, "_bkt").orderBy(F.col("_h"), F.col(id_col))
    )
    out = (
        based.join(F.broadcast(offsets), [source_col, "_bkt"])
        .select(
            F.col(id_col),
            F.col(source_col),
            (F.col("_off") + rk).cast("int").alias("src_rank"),
        )
        .withColumn("kept", F.col("src_rank") <= cap)
    )
    return out


def mixture_weights(
    df: DataFrame,
    alpha: float = 0.5,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Temperature-based corpus mixture reweighting (the exponential-
    smoothing scheme of multilingual LM training — XLM-R §3.1 / mT5 §3.2:
    q_s ∝ p_s^alpha): per source, its corpus token share p_s, its smoothed
    TARGET share q_s, and the sampling weight q_s / p_s a data loader
    multiplies into per-source sampling rates. alpha=1 reproduces the
    corpus (all weights 1), alpha=0 is uniform-over-sources; 0.3-0.7
    up-weights tail sources without letting them dominate.

    One partial-aggregated shuffle on the source key (token counts are a
    map-side `size(tokens)` projection — the token array is never
    exploded), then the normalizing scalars (total N, sum of p^alpha)
    attach via a one-row broadcast. Output is |sources|-sized. The hot-
    domain skew of a crawl corpus collapses map-side in the combiner, same
    as every count rollup in the repo.
    """
    from jsonify2ai_spark.functions.text import token_count

    per_src = df.groupBy(F.col(source_col)).agg(
        F.coalesce(F.sum(token_count(F.col(text_col))), F.lit(0))
        .cast("bigint")
        .alias("n_tokens")
    )
    totals = per_src.agg(
        F.sum("n_tokens").cast("double").alias("N"),
        F.sum(F.pow(F.col("n_tokens"), F.lit(alpha))).alias("Z"),
    )
    # Degenerate-corpus guards (NULL, never NaN / ANSI divide error — the
    # contract every operator here follows): an all-empty source has
    # n_tokens = 0 -> p = 0 and weight = q/p is undefined; an all-empty
    # CORPUS additionally has N = 0 (and Z = 0 when alpha > 0).
    p = F.when(F.col("N") > 0, F.col("n_tokens") / F.col("N"))
    q = F.when(
        F.col("Z") > 0, F.pow(F.col("n_tokens"), F.lit(alpha)) / F.col("Z")
    )
    w = F.when(F.col("n_tokens") > 0, q / p)
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            F.col(source_col),
            "n_tokens",
            F.round(p, 6).alias("p_corpus"),
            F.round(q, 6).alias("p_target"),
            F.round(w, 6).alias("weight"),
        )
    )


def curriculum_buckets(
    df: DataFrame,
    n_buckets: int = 10,
    score_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Curriculum-ordering assignment: per document, its score, its
    score-quantile BUCKET (0 = lowest-scoring slice .. n_buckets-1 =
    highest), and a deterministic within-bucket shuffle key — the three
    columns a curriculum data loader needs to serve "clean first, noisy
    later" (or the reverse) reproducibly across runs and machines. With
    ``score_col`` pointing at an LM log-probability (e.g.
    textstats.unigram_logprob's ``logprob_per_token``) and n_buckets=3
    this IS CCNet's head/middle/tail perplexity split, generalized; the
    default score is the heuristic quality_score for corpora without an
    LM signal.

    NOT ntile() over a corpus-wide ORDER BY (a single-partition sort, the
    canonical 100 TB anti-pattern — same reasoning as
    textstats.length_outlier_flags): the bucket comes from the VALUE-level
    CDF. Scores are 4dp-rounded upstream so the distinct-value frame is at
    most ~10^5 rows; cumulative counts over that tiny aggregate give each
    value its fraction-strictly-below, bucket = floor(frac * n_buckets)
    (ties share a bucket — deterministic by construction), and the mapping
    broadcasts back onto the corpus map-side. The shuffle key is
    md5(id) — stable, uniform, and engine-portable, so a loader's
    ORDER BY (bucket, shuffle_key) is the same permutation everywhere.
    NULL scores (e.g. empty documents under an LM score) are excluded
    from the CDF and emitted with NULL bucket — total over input, same
    contract as length_outlier_flags.
    """
    from pyspark.sql import Window

    from jsonify2ai_spark.operators.textstats import quality_score

    score = F.col(score_col) if score_col else quality_score(text_col)
    scored = df.select(F.col(id_col), score.alias("quality"))
    counts = (
        scored.filter(F.col("quality").isNotNull())
        .groupBy("quality")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    below = Window.orderBy("quality").rowsBetween(Window.unboundedPreceding, -1)
    total = Window.orderBy("quality").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    frac = F.coalesce(F.sum("cnt").over(below), F.lit(0)).cast("double") / F.sum(
        "cnt"
    ).over(total)
    cdf = counts.select(
        "quality",
        F.least(
            F.lit(n_buckets - 1), F.floor(frac * n_buckets)
        ).cast("int").alias("bucket"),
    )
    return scored.join(F.broadcast(cdf), ["quality"], "left").select(
        F.col(id_col),
        F.col("quality").alias("score"),
        "bucket",
        F.md5(F.col(id_col).cast("string")).alias("shuffle_key"),
    )


def assign_splits(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
    on_null: str = "error",
) -> DataFrame:
    """Deterministic, leakage-free train/val/test assignment — the split
    every training-data pipeline runs LAST: ``splits`` maps name ->
    fraction (must sum to <= 1; any remainder — including the few-ppm
    residue of per-fraction rounding, e.g. three 1/3 fractions leave one
    ppm unbounded — falls into the FIRST named split, so the default
    0.98/0.01/0.01 never leaks rows). Assignment is a pure function of
    md5(salt || key), so (a) re-running on a grown corpus never moves an
    existing document across splits (the document-stability property
    random splits lack — a doc that was in val stays in val forever),
    and (b) duplicate keys land in the SAME split, so key-level dedup
    upstream is the only leakage control needed. One map-side
    projection; the salt versions the split layout.

    A NULL key has no identity to hash, so silently assigning it would
    void both guarantees (r8 advisor: NULL hashes to NULL, every bound
    comparison is NULL, and the row used to fall through ``otherwise``
    into train unannounced). ``on_null="error"`` (default) fails the job
    at the first NULL key; ``on_null=<split name>`` routes NULL-keyed
    rows to that named split explicitly — route them to a held-out
    split only knowing they are indistinguishable duplicates-wise.
    """
    if splits is None:
        splits = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not splits or any(f < 0 for f in splits.values()):
        raise ValueError(f"bad splits: {splits!r}")
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    if on_null != "error" and on_null not in splits:
        raise ValueError(f"on_null={on_null!r} is not a split name")
    h = sample_hash(key_col, salt)
    names = list(splits)
    # cumulative ppm upper bounds in dict order: h < cum_1 -> first name,
    # elif h < cum_2 -> second, ...; anything past the last bound (the
    # fraction remainder) falls to the FIRST name
    cum = 0
    bounds = []
    for name in names:
        # round, not int: truncation of binary-inexact fractions loses one
        # ppm per boundary (int(0.3 * 1e6) == 299999 — review-found r8)
        cum += round(splits[name] * _BUCKETS)
        bounds.append((cum, name))
    null_key = F.col(key_col).isNull()
    if on_null == "error":
        null_arm = F.raise_error(
            F.lit(
                f"assign_splits: NULL in key column {key_col!r} — a NULL key "
                "has no stable identity; pass on_null=<split name> to route "
                "NULL-keyed rows explicitly"
            )
        )
    else:
        null_arm = F.lit(on_null)
    expr = F.when(null_key, null_arm).when(
        h < F.lit(bounds[0][0]), F.lit(bounds[0][1])
    )
    for hi, name in bounds[1:]:
        expr = expr.when(h < F.lit(hi), F.lit(name))
    expr = expr.otherwise(F.lit(names[0]))
    return df.withColumn(out_col, expr)


def diversity_sample(
    df: DataFrame,
    centroids: list[list[float]],
    cap: int,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    impl: str = "auto",
) -> DataFrame:
    """Embedding-diversity cap — the cluster-balanced curation step
    (SemDeDup/D4-style mode pruning, the embedding-space sibling of
    :func:`per_source_cap`'s per-domain rule): assign every vector to its
    nearest coarse centroid, then keep at most ``cap`` members per
    cluster, chosen by deterministic hash order. Over-represented
    embedding modes (boilerplate templates, near-identical spam shapes —
    exactly what crowds a web crawl) are trimmed to the cap while thin
    modes survive whole, flattening the density profile without an
    all-pairs similarity pass.

    Shape at scale: assignment is :func:`~jsonify2ai_spark.operators.ann.
    ivf_assign` (map-only; numpy-GEMM past K~16) and the cap reuses
    per_source_cap's skew-aware two-phase rank keyed on the cluster id —
    a corpus-sized hot mode fans out over 256 sub-buckets instead of one
    task. Output: (id, cluster, cluster_rank, kept) for EVERY input row
    (audit + filter share the pass; callers filter on ``kept``).
    """
    from jsonify2ai_spark.operators.ann import ivf_assign

    assigned = ivf_assign(
        df.select(id_col, vector_col), centroids, vector_col, impl=impl
    )
    return per_source_cap(
        assigned, cap, source_col="cluster", id_col=id_col
    ).withColumnRenamed("src_rank", "cluster_rank")


def _hashed_gram_buckets(text: Column | str, buckets: int) -> Column:
    """Hashed unigram+bigram feature buckets of a text column — the DSIR
    feature map (Xie et al. 2023 §2.2: bag of hashed n-grams). Engine-
    portable: bucket = conv(substr(md5(gram),1,12),16,10) % buckets, the
    same md5 idiom as :func:`sample_hash` (DuckDB twin:
    ``CAST('0x'||substr(md5(g),1,12) AS BIGINT) % B``). Pure column
    expression — whole-stage codegen, no UDF, no shuffle. Bigrams come
    from zip_with over two equal-length slices (the bigram_logprob
    idiom), NOT an index-lambda over ``element_at(toks, i)`` — Spark
    does no CSE across HOF lambda bodies, so the indexed form
    re-tokenizes the document once per element access (O(n²) per doc;
    measured 8.9 s → 1.7 s on q120 at sf0.1). Frame-level callers
    should project the token array to a real column first and pass it
    to :func:`_gram_buckets_of` — the expression references the array
    5× and a projected column is evaluated once (a further ~35%)."""
    from jsonify2ai_spark.functions.text import tokens

    return _gram_buckets_of(tokens(text), buckets)


def _gram_buckets_of(toks: Column, buckets: int) -> Column:
    """Hashed unigram+bigram buckets of a PRE-TOKENIZED array column —
    see :func:`_hashed_gram_buckets`."""
    n_less1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n_less1),
        F.slice(toks, 2, n_less1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.transform(
        F.concat(toks, bigrams),
        lambda g: F.conv(F.substring(F.md5(g), 1, 12), 16, 10).cast("bigint")
        % buckets,
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    buckets: int = 10_000,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_text_col: str | None = None,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw document
    by how much more likely its hashed-n-gram profile is under a TARGET
    corpus (the distribution you want more of — Wikipedia-grade text, a
    domain slice) than under the raw corpus itself. The standing
    alternative to hard classifier filtering: weights feed
    :func:`dsir_resample`, which draws a target-shaped subset instead of
    thresholding.

    Model: unigram+bigram grams hashed into ``buckets`` buckets
    (:func:`_hashed_gram_buckets`); bucket probabilities Laplace-smoothed
    with ``alpha`` over the B-bucket vocabulary, fitted once on target and
    once on ``df`` (the raw corpus is its own proposal distribution, per
    the paper). Per document: log w(x) = Σ_j c_j(x)·(ln p̂_target(j) −
    ln p̂_raw(j)).

    Plan shape at 100 TB: gram hashing is a map-side column expression;
    the two model fits are partial-aggregated count rollups of at most B
    rows each; per-doc bucket counts shuffle once on (id, bucket); the
    bucket→logratio join is B-row-bounded (AQE broadcasts it — same
    contract as unigram_logprob's vocab join) and inner-exact, because
    the raw fit and the per-doc counts share one feature frame — a
    target-only bucket joins nothing, a doc bucket is always in the raw
    model. No UDFs, no collect.

    Output (docs with ≥1 token; empty docs have no features and drop, as
    in the paper's featurization): ``(id, n_feats, log_weight,
    logw_per_feat)``, the log columns rounded to 4dp (+0.0 signed-zero
    guard) so cross-engine libm ulp noise cannot reach an oracle hash —
    downstream ranking uses the ROUNDED value, documented in
    :func:`dsir_resample`.
    """
    b = F.lit(float(buckets))
    a = F.lit(float(alpha))

    def feats(frame: DataFrame, col: str, keep_id: bool) -> DataFrame:
        from jsonify2ai_spark.functions.text import tokens

        sel = [F.col(id_col)] if keep_id else []
        return frame.select(*sel, tokens(col).alias("_tk")).select(
            *sel,
            F.explode(_gram_buckets_of(F.col("_tk"), buckets)).alias("bucket"),
        )

    raw_feats = feats(df, text_col, keep_id=True).localCheckpoint(eager=False)
    tgt_counts = (
        feats(target, target_text_col or text_col, keep_id=False)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    raw_counts = raw_feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    model = (
        tgt_counts.join(raw_counts, "bucket", "outer")
        .select(
            "bucket",
            F.coalesce("tc", F.lit(0)).alias("tc"),
            F.coalesce("rc", F.lit(0)).alias("rc"),
        )
        .localCheckpoint(eager=False)
    )
    scalars = model.agg(
        F.sum("tc").cast("double").alias("Nt"),
        F.sum("rc").cast("double").alias("Nr"),
    )
    logratio = (
        F.log((F.col("tc") + a) / (F.col("Nt") + a * b))
        - F.log((F.col("rc") + a) / (F.col("Nr") + a * b))
    ).alias("logratio")
    ratios = model.crossJoin(F.broadcast(scalars)).select("bucket", logratio)
    doc_counts = raw_feats.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    # inner join is exact: every doc bucket is in the raw model by
    # construction (the raw fit and doc_counts share raw_feats)
    scored = doc_counts.join(ratios, "bucket").select(
        F.col(id_col), F.col("c"), F.col("logratio").alias("lr")
    )
    logw = F.sum(F.col("c") * F.col("lr"))
    return scored.groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("n_feats"),
        (F.round(logw, 4) + F.lit(0.0)).alias("log_weight"),
        (F.round(logw / F.sum("c"), 4) + F.lit(0.0)).alias("logw_per_feat"),
    )


def dsir_resample(
    weights: DataFrame,
    k: int,
    weight_col: str = "log_weight",
    id_col: str = "doc_id",
    salt: str = "dsir-v1",
    temperature: float = 1.0,
) -> DataFrame:
    """DSIR's resampling half: draw ``k`` documents WITHOUT replacement
    with probability ∝ exp(log_weight / temperature), via the Gumbel
    top-k trick (Vieira 2014; Xie et al. 2023 §2.3 sample ∝ importance
    weight) — rank on log w/T + Gumbel noise and keep the top k. Unlike a
    hard threshold on the weight, resampling preserves DIVERSITY: a
    middling-weight document still wins sometimes, so the selected corpus
    approximates the target distribution instead of collapsing onto the
    target's mode. ``temperature`` → ∞ recovers uniform sampling, → 0
    recovers deterministic top-k by weight.

    Engine-portable determinism: the Gumbel variate derives from the md5
    uniform of :func:`sample_hash` (u = (bucket+0.5)/1e6, g =
    −ln(−ln u)) — same rows on every engine, retry, and cluster shape,
    exactly like every sampler in this module; the ranking key is rounded
    to 4dp BEFORE ordering (ties broken by id) so cross-engine float ulp
    cannot reorder the boundary. Plan: one map-side key projection + a
    TakeOrderedAndProject top-k — no corpus-wide sort, no shuffle beyond
    the k-row ordered take. k is SUBSET-sized by contract: the physical
    take keeps a k-row heap per input partition, so a corpus-scale k
    (say 10^9) allocates that heap 10^3 times over — for "keep
    everything above a weight floor" use a plain filter on the key
    (``DSIRGate``'s cutoff mode is exactly that), not a giant k.

    Output: every input column plus ``resample_key`` for the k selected
    documents — the full weight row rides the k-row take, so a caller
    wanting the selection WITH its weights pays no self-join (a second
    full weight computation: Spark does not dedupe common DataFrame
    subplans). NULL weights (docs absent from the model — callers
    joining weights back onto a wider frame) are excluded: no weight,
    no ticket.
    """
    u = (sample_hash(F.col(id_col), salt) + F.lit(0.5)) / F.lit(
        float(_BUCKETS)
    )
    key = F.round(
        F.col(weight_col) / F.lit(float(temperature)) - F.log(-F.log(u)), 4
    ) + F.lit(0.0)
    return (
        weights.filter(F.col(weight_col).isNotNull())
        .select("*", key.alias("resample_key"))
        .orderBy(F.col("resample_key").desc(), F.col(id_col))
        .limit(k)
    )


def calibrate_dsir_cutoff(
    weights: DataFrame,
    keep_frac: float,
    weight_col: str = "log_weight",
    id_col: str = "doc_id",
    salt: str = "dsir-v1",
    temperature: float = 1.0,
) -> float:
    """Derive the thin-mode ``key_cutoff`` for :class:`~jsonify2ai_spark.
    streaming.windowed.DSIRGate` from a calibration corpus's
    :func:`dsir_weights` frame: the k-th ``resample_key`` where
    ``k = ceil(keep_frac * n_weighted)`` — exactly the documented
    hand-recipe (r11 verdict #4), as a function, so the gate's one free
    parameter is DERIVED rather than hand-computed. A gate built with
    the returned cutoff keeps, on the calibration corpus itself, the
    same row set as ``dsir_resample(weights, k)`` (ties at the exact
    boundary key keep ALL tied rows — the 4dp key makes ties rare but
    possible, so ``keep_frac`` is a floor, not an exact quota).

    Pass the SAME ``salt``/``temperature`` the gate will run with —
    the keys must be the gate's keys for the quantile to transfer.

    Scale shape (r16, VERDICT r15 item 4): ONE driver action — a
    single-partition ranked window over the NULL-filtered keys picks
    the k-th key with ``k = ceil(keep_frac * count)`` computed inside
    the same pass (count(*) over the unbounded window), where the old
    shape paid two eager actions (a count, then a k-row ordered take)
    and therefore computed the weights frame twice when it was not
    checkpointed. The value is IDENTICAL: row_number k in
    (key desc, id asc) order is exactly min(resample_key) over
    ``dsir_resample(weights, k)`` (same key expression, same rounding,
    same tiebreak). The global window is the deliberate trade:
    calibrate on a SAMPLE-sized corpus (the deployment shape anyway —
    the calibration frame models the incoming distribution, it does
    not need to be the 100 TB corpus), and one sorted partition of a
    sample beats two full passes over it.
    """
    from pyspark.sql import Window

    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in (0, 1]: {keep_frac!r}")
    # the resample key verbatim (dsir_resample's arithmetic)
    u = (sample_hash(F.col(id_col), salt) + F.lit(0.5)) / F.lit(
        float(_BUCKETS)
    )
    key = F.round(
        F.col(weight_col) / F.lit(float(temperature)) - F.log(-F.log(u)), 4
    ) + F.lit(0.0)
    ranked = (
        weights.filter(F.col(weight_col).isNotNull())
        .select(key.alias("_k"), F.col(id_col).alias("_i"))
        .select(
            "_k",
            F.row_number()
            .over(Window.orderBy(F.col("_k").desc(), F.col("_i")))
            .alias("_rn"),
            F.count(F.lit(1))
            .over(
                # same ordering as the rank window -> one sort serves both
                Window.orderBy(F.col("_k").desc(), F.col("_i")).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("_n"),
        )
    )
    # k = max(1, ceil(keep_frac * n)) — the max() guard is vacuous for
    # n >= 1 (keep_frac > 0), and n == 0 yields no row at all
    row = ranked.filter(
        F.col("_rn")
        == F.ceil(F.lit(float(keep_frac)) * F.col("_n")).cast("int")
    ).select("_k").collect()
    if not row:
        raise ValueError(
            "calibrate_dsir_cutoff: no weighted rows in the calibration "
            "corpus (all-NULL weight_col or empty frame)"
        )
    return float(row[0][0])


def doremi_mixture_weights(
    df: DataFrame,
    reference: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    temperature: float = 1.0,
    alpha: float = 1.0,
    ref_text_col: str | None = None,
) -> DataFrame:
    """Domain reweighting from proxy-model excess log-likelihood — the
    DoReMi recipe (Xie et al. 2023, "Doremi: Optimizing Data Mixtures")
    with UNIGRAM proxies standing in for the trained proxy/reference
    LMs (the same substitution unigram_logprob makes for the CCNet
    KenLM): a domain whose OWN model explains its text much better than
    the generic reference model does carries domain-specific signal the
    reference lacks — DoReMi's "excess loss" — and gets up-weighted;
    a domain the reference already explains adds little and shrinks.

    Per domain ``d``: ``excess_d = mean own-model token logprob − mean
    reference-model token logprob`` (both Laplace-``alpha`` smoothed;
    the own model is fit per domain IN ONE PASS via (domain, word)
    counts — never K separate fits), then
    ``weight_d ∝ token_share_d · exp(excess_d / temperature)``,
    normalized to sum 1. ``temperature`` plays DoReMi's step-size role:
    large τ stays near the corpus proportions, small τ chases excess.
    Output: (domain, n_tokens, token_share, excess_logprob, weight) —
    feed ``weight`` to :func:`weighted_interleave` /
    :func:`read_token_shards_mixture` as the domain blend.

    Shapes: one (domain, word) rollup + one vocabulary join against the
    reference counts (AQE broadcasts it when small) + two domain-sized
    windows. All intermediates round (4dp logprobs, 6dp shares) BEFORE
    the exponential so the DuckDB twin reproduces the weights exactly
    (driver gate row q138).
    """
    from jsonify2ai_spark.functions.text import tokens

    if temperature <= 0:
        raise ValueError(f"temperature must be > 0: {temperature}")
    from pyspark.sql import Window

    words = df.select(
        F.col(domain_col).alias("_d"),
        F.explode(tokens(F.col(text_col))).alias("_w"),
    )
    cdw = words.groupBy("_d", "_w").agg(F.count(F.lit(1)).alias("_c"))
    dstats = cdw.groupBy("_d").agg(
        F.sum("_c").cast("double").alias("_n"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    refc = (
        reference.select(
            F.explode(tokens(F.col(ref_text_col or text_col))).alias("_w")
        )
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_rc"))
    )
    reft = refc.agg(
        F.sum("_rc").cast("double").alias("_rn"),
        F.count(F.lit(1)).cast("double").alias("_rv"),
    )
    a = F.lit(float(alpha))
    scored = (
        cdw.join(dstats, "_d")
        .join(refc, "_w", "left")
        .crossJoin(F.broadcast(reft))
    )
    own_lp = F.log((F.col("_c") + a) / (F.col("_n") + a * F.col("_v")))
    ref_lp = F.log(
        (F.coalesce(F.col("_rc"), F.lit(0)) + a)
        / (F.col("_rn") + a * F.col("_rv"))
    )
    per_dom = scored.groupBy("_d").agg(
        F.first("_n").alias("_n"),
        (F.sum(F.col("_c") * own_lp) / F.first("_n")).alias("_own"),
        (F.sum(F.col("_c") * ref_lp) / F.first("_n")).alias("_ref"),
    )
    wall = Window.partitionBy()
    excess = F.round(F.col("_own") - F.col("_ref"), 4)
    share = F.round(F.col("_n") / F.sum("_n").over(wall), 6)
    based = per_dom.select(
        F.col("_d").alias(domain_col),
        F.col("_n").cast("bigint").alias("n_tokens"),
        share.alias("token_share"),
        excess.alias("excess_logprob"),
    )
    raw = F.col("token_share") * F.exp(
        F.col("excess_logprob") / F.lit(float(temperature))
    )
    return based.select(
        domain_col,
        "n_tokens",
        "token_share",
        "excess_logprob",
        F.round(raw / F.sum(raw).over(wall), 6).alias("weight"),
    )


def excess_loss_select(
    df: DataFrame,
    target_ref: DataFrame,
    general_ref: DataFrame,
    keep_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    ref_text_col: str | None = None,
) -> DataFrame:
    """RHO-1-style excess-loss data selection at document granularity
    (Lin et al. 2024 "Selective Language Modeling"; the DoGE/DoReMi
    excess-likelihood signal applied per DOCUMENT instead of per domain):
    score every document by how much better a TARGET-domain reference
    model explains it than a GENERAL reference model does —
    ``excess = logprob_target - logprob_general`` per token — and keep
    the top ``keep_frac`` mass, the slice most distinctive of the target
    distribution relative to what any corpus already covers. Both
    references are Laplace-smoothed unigram proxies (the q108/q138
    stand-in for trained proxy LMs; swap in real per-token losses by
    replacing the two logprob columns).

    Output: ``(id, n_tokens, excess_logprob, selected)``; ``selected``
    keeps at LEAST ``keep_frac`` of the documents (ties at the cutoff
    share a side — the calibrate_dsir_cutoff floor convention), and the
    cutoff derives from the data, never hand-set.

    ONE scan of the corpus: a single (doc, word) rollup joins BOTH
    vocabularies (left joins — absent words are count-0 events under
    each model's own N/V, exactly unigram_logprob's fixed-vocabulary
    treatment), so the corpus is tokenized once, not once per model.
    Each reference is one count rollup, reference-sized. The cutoff is
    the ppl_buckets CDF idiom: cumulative doc counts over the DISTINCT
    4dp-excess frame — one |distinct excess|-sized window, never a
    global row sort. At 100 TB the vocab joins are plain shuffle joins
    AQE broadcasts when small; nothing driver-side but two scalar rows.
    """
    from pyspark.sql import Window

    from jsonify2ai_spark.functions.text import tokens

    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")

    def _c(x):
        return F.col(x) if isinstance(x, str) else x

    def _vocab(ref: DataFrame, cname: str) -> DataFrame:
        return (
            ref.select(
                F.explode(tokens(_c(ref_text_col or text_col))).alias("w")
            )
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias(cname))
        )

    dw = (
        df.select(F.col(id_col), F.explode(tokens(_c(text_col))).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("dc"))
    )
    tv = _vocab(target_ref, "tc")
    gv = _vocab(general_ref, "gc")
    totals = (
        tv.agg(
            F.sum("tc").cast("double").alias("tN"),
            F.count(F.lit(1)).cast("double").alias("tV"),
        )
        .crossJoin(
            gv.agg(
                F.sum("gc").cast("double").alias("gN"),
                F.count(F.lit(1)).cast("double").alias("gV"),
            )
        )
    )
    scored = (
        dw.join(tv, "w", "left")
        .join(gv, "w", "left")
        .withColumn("tc", F.coalesce("tc", F.lit(0)))
        .withColumn("gc", F.coalesce("gc", F.lit(0)))
        .crossJoin(F.broadcast(totals))
    )
    a = F.lit(float(alpha))
    lp_t = F.log((F.col("tc") + a) / (F.col("tN") + a * F.col("tV")))
    lp_g = F.log((F.col("gc") + a) / (F.col("gN") + a * F.col("gV")))
    # exact DECIMAL(38,18) accumulators (the _stable_avg discipline):
    # a plain double sum reassociates across partitions, and at the
    # round(.,4) boundary that noise can flip the 4th decimal — and with
    # it the CDF cutoff and the selected flag (the r5 q89 flake class)
    _DEC = "decimal(38,18)"
    per_doc = scored.groupBy(id_col).agg(
        F.sum("dc").cast("bigint").alias("n_tokens"),
        F.round(
            F.sum((F.col("dc") * lp_t).cast(_DEC)).cast("double") / F.sum("dc")
            - F.sum((F.col("dc") * lp_g).cast(_DEC)).cast("double") / F.sum("dc"),
            4,
        ).alias("excess_logprob"),
    ).localCheckpoint(eager=False)
    # cutoff = max 4dp-excess x with share(docs >= x) >= keep_frac: the
    # distinct-value CDF (descending), floor convention — ties keep.
    dist = per_doc.groupBy("excess_logprob").agg(F.count(F.lit(1)).alias("cnt"))
    w_desc = (
        Window.orderBy(F.col("excess_logprob").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dist.select(
        "excess_logprob",
        (
            F.sum("cnt").over(w_desc).cast("double")
            / F.sum("cnt").over(Window.partitionBy())
        ).alias("cdf"),
    )
    cutoff = cum.agg(
        F.max(
            F.when(F.col("cdf") >= F.lit(float(keep_frac)), F.col("excess_logprob"))
        ).alias("cut")
    )
    return per_doc.crossJoin(F.broadcast(cutoff)).select(
        F.col(id_col),
        "n_tokens",
        "excess_logprob",
        (F.col("excess_logprob") >= F.col("cut")).alias("selected"),
    )


def mixture_epoch_plan(
    df: DataFrame,
    token_budget: int,
    alpha: float = 0.5,
    text_col: str = "text",
    source_col: str = "source",
    max_epochs: float = 4.0,
) -> DataFrame:
    """Data-constrained repetition planning (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models"): given the alpha-smoothed
    target mixture (:func:`mixture_weights`) and a TOTAL training token
    budget, forecast per source how many epochs of its data the model
    will actually see — ``planned_tokens = budget * p_target`` and
    ``epochs = planned / n_tokens`` — and flag sources past
    ``max_epochs`` (the paper's ~4-epoch point where repeated tokens'
    value decays to near zero). The pre-flight check that catches "this
    mixture trains 30 epochs of the tiny domain" BEFORE the run, not in
    the loss curves.

    Derives from mixture_weights' 6dp-rounded p_target so the plan's
    arithmetic is engine-reproducible; |sources|-sized output, cost is
    the q82 rollup unchanged.
    """
    base = mixture_weights(df, alpha, text_col, source_col)
    planned = F.round(F.lit(float(token_budget)) * F.col("p_target"), 0)
    epochs = F.when(
        F.col("n_tokens") > 0,
        F.round(
            F.lit(float(token_budget)) * F.col("p_target") / F.col("n_tokens"), 4
        ),
    )
    return base.select(
        source_col,
        "n_tokens",
        "p_target",
        planned.cast("bigint").alias("planned_tokens"),
        epochs.alias("epochs"),
        (F.coalesce(epochs, F.lit(0.0)) > F.lit(float(max_epochs))).alias(
            "over_repeated"
        ),
    )


def cluster_safe_splits(
    df: DataFrame,
    pairs: DataFrame,
    splits: dict[str, float] | None = None,
    salt: str = "",
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Near-dup-CLUSTER-aware train/val/test assignment — the leakage
    control :func:`assign_splits` cannot give alone: that operator keys
    on content identity, so exact duplicates share a split, but NEAR
    duplicates carry different fingerprints and can straddle train/test
    (the classic eval-inflation trap: a paraphrased test document's
    sibling sits in train). Fold the near-dup pair graph
    (minhash_lsh_pairs / simhash_pairs / ngram_jaccard_pairs output)
    into connected components and hash the CLUSTER REPRESENTATIVE: every
    member of a near-dup cluster lands in the same split by
    construction; documents in no pair are their own singleton cluster.

    Output: ``(id, cluster_rep, split)`` — assign_splits' stability and
    NULL-safety guarantees carry over (the rep is never NULL: it
    coalesces to the document's own id). Cost: the components fold
    (edge-graph-sized, usually driver-small after LSH contraction) + one
    id-keyed join + the map-side split projection.
    """
    from jsonify2ai_spark.operators.dedup import connected_components

    cc = connected_components(pairs, a_col=a_col, b_col=b_col)
    labeled = (
        df.select(F.col(id_col))
        .join(cc.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn("cluster_rep", F.coalesce("cluster_rep", F.col(id_col)))
    )
    return assign_splits(labeled, "cluster_rep", splits, salt)


def semantic_domain_mixture(
    docs: DataFrame,
    embeddings: DataFrame,
    alpha: float = 0.5,
    n_bits: int = 3,
    dim: int = 64,
    seed: str = "domains-v1",
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """Domain-DISCOVERY mixture: the q82/mixture_weights recipe when the
    corpus has no trustworthy source labels (one giant crawl bucket, or
    labels that lie): domains are DISCOVERED by hyperplane-bucketing the
    embedding column (packing.semantic_pack_groups — 2**n_bits buckets
    from deterministic md5-planes, dots 6dp-rounded before the sign
    test, so the bucketing is engine-replayable), then the
    alpha-smoothed target mixture computes over the discovered domains
    exactly as over source labels. The unsupervised face of DoReMi-style
    reweighting: semantic neighborhoods get tail-up-weighted without
    anyone having labeled them.

    Output: ``(domain, n_tokens, p_corpus, p_target, weight)`` —
    2**n_bits rows, plug into weighted_interleave / sample_to_token_
    budget like any source mixture. Cost: the bucketing is map-side
    Column arithmetic on the embeddings; one id-keyed join attaches
    buckets to text; then mixture_weights' single token rollup.
    """
    from jsonify2ai_spark.operators.packing import semantic_pack_groups

    buckets = semantic_pack_groups(
        embeddings,
        vector_col=vector_col,
        n_bits=n_bits,
        dim=dim,
        seed=seed,
        out_col="domain",
    )
    joined = docs.select(F.col(id_col), F.col(text_col)).join(
        buckets.select(F.col(vec_id_col).alias(id_col), "domain"), id_col
    )
    return mixture_weights(joined, alpha, text_col, "domain")
