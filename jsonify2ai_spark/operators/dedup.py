"""Deduplication operators for training-data pipelines (north-star ops).

The reference only needs batch-internal dedup on deterministic keys
(scripts/dev/tools/ingest_dropzone.py:352,475-479 — J4 in SURVEY §2.3); a
100 TB corpus engine needs the full family:

- exact            — content-hash groupBy (one shuffle on the hash key)
- minhash + LSH    — shingle -> minhash signature -> band-bucket join; the
                     quadratic candidate space collapses to within-bucket pairs
- simhash          — 32-bit frequency-weighted fingerprint; near-dups differ in
                     few bits (pair by fingerprint or hamming-ball probing)
- n-gram Jaccard   — exact set-overlap via shingle self-join (the verifier for
                     the approximate paths)

Engine-independence: every hash is derived from md5/sha of the content (not
Spark's murmur3), so fingerprints are reproducible in any engine — that is
what lets the DuckDB oracle check these operators value-for-value.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonify2ai_spark.session import ensure_min_partitions, local_rows_df
from jsonify2ai_spark.functions.text import normalize_ws, shingles, tokens

# Modulus for the minhash permutation family: 2^31 - 1 (prime). Keeps
# a * h + b inside int64 for a, b, h < P.
_P = 2_147_483_647


def _content_fingerprint(text: Column) -> Column:
    return F.md5(normalize_ws(text))


def _store_partitioned_write(
    staged: DataFrame,
    dest: str,
    part_cols: list[str],
    sort_cols: list[str],
    n_rows: int | None = None,
) -> None:
    """Write a store table partitioned by ``part_cols`` — as DIRECTORIES
    when the table is big enough that directory pruning is the
    scan-avoidance that matters, and as LEADING SORT COLUMNS in a flat
    write when it is not (r15 optimization).

    Every partition directory costs ~15 ms of writer open/close + commit
    rename regardless of its size: the 16x16 (band, bpfx) band-table
    layout paid ~7 s PER WRITE at bench scale with a few KB in each cell
    (measured, OPTIMIZATION_r15.md). Below the row threshold the
    partition keys become ordinary data columns sorted to the front of
    one file — the probes' equality/isin predicates on them push down to
    parquet row-group stats instead of pruning directories (PushedFilters
    in place of PartitionFilters; same rows either way, pinned by
    parity + plan tests). Above it the directory layout returns, where
    cells are file-sized and dir pruning skips real IO. The threshold is
    rows, not bytes, because these tables are fixed-width key rows:
    SPARK_GRAFT_STORE_PART_ROWS (default 2M — ~30-60 MB of key rows,
    i.e. about one healthy parquet file; deployments override per store
    shape)."""
    n = staged.count() if n_rows is None else n_rows
    if n == 0:
        # an EMPTY partitionBy write leaves a schema-less dir that no
        # later load can read — land it flat (one zero-row part file
        # carries the schema; partition columns stay filterable)
        staged.write.mode("overwrite").parquet(dest)
        return
    if n < int(os.environ.get("SPARK_GRAFT_STORE_PART_ROWS", "2000000")):
        (
            staged.repartition(1)
            .sortWithinPartitions(*part_cols, *sort_cols)
            .write.mode("overwrite")
            .parquet(dest)
        )
        return
    (
        staged.repartition(*[F.col(c) for c in part_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .partitionBy(*part_cols)
        .parquet(dest)
    )


def _run_writes(thunks) -> None:
    """Run independent write jobs concurrently from driver threads
    (guide §2.6): Spark's FIFO scheduler back-fills one job's task tail
    with the next job's tasks, so two sub-second store commits overlap
    instead of paying two full scheduling floors. Callers order the
    VISIBILITY commit (the meta write) strictly after this returns, so
    the crash-consistency story is untouched — a die mid-writes leaves
    only unreferenced dirs. Zero/one thunk short-circuits (no thread)."""
    if not thunks:
        return
    if len(thunks) == 1:
        thunks[0]()
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futs = [pool.submit(t) for t in thunks]
        for f in futs:
            f.result()


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per distinct normalized text. Single shuffle on
    the 128-bit content hash; at scale partition-count it like any groupBy."""
    fp = _content_fingerprint(F.col(text_col))
    keep = (
        df.withColumn("fingerprint", fp)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
    )
    return keep


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(fingerprint, n_dups, keeper_id) per content group — the audit view."""
    return (
        df.withColumn("fingerprint", _content_fingerprint(F.col(text_col)))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keeper_id"))
    )


def _shingle_hash(s: Column) -> Column:
    """60-bit integer hash of a shingle via md5 (engine-independent)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def shingle_hash_sets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    mod: int | None = None,
) -> DataFrame:
    """(id, hs: array<bigint>) — each doc's DISTINCT shingle-hash set.

    Tokenization stays a JVM expression (regex \\s parity); gram joining +
    md5 run per Arrow batch in Python, which beats the interpreted
    slice/concat_ws/array_distinct/md5 expression chain ~3x. Hash values are
    bit-identical to ``_shingle_hash(shingles(text))``: md5 of the same
    space-joined gram, first 15 hex chars as int (mod optionally applied).
    """
    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tk"))

    def gen(batches):
        import pandas as pd

        for batch in batches:
            # NULL text -> NULL token array -> NO shingles (empty set, never
            # pairs) — matching the DuckDB oracles, where unnest(NULL) yields
            # no rows. Distinct from EMPTY text, which hashes the whole-text
            # fallback "" on both engines. Crash-found: list(None) raised.
            out = [
                [] if t is None else _gram_hashes_py(list(t), shingle_n, mod)
                for t in batch["_tk"]
            ]
            yield pd.DataFrame({id_col: batch[id_col], "hs": out})

    return ensure_min_partitions(src).mapInPandas(gen, schema=f"{id_col} {id_type}, hs array<bigint>")


def _gram_hashes_py(toks: list[str], n: int, mod: int | None = None) -> list[int]:
    """Distinct space-joined word n-gram hashes — the Python kernel twin of
    ``_shingle_hash(shingles(text))`` (first-occurrence order, whole-text
    fallback below n tokens)."""
    import hashlib

    if len(toks) >= n:
        grams = dict.fromkeys(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
    else:
        grams = {" ".join(toks): None}
    out = []
    for g in grams:
        v = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
        out.append(v % mod if mod else v)
    return out


def _perm_params(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the permutation family h_i = (a*x+b)%P.
    A tiny LCG keeps this reproducible with no RNG state."""
    params, state = [], seed
    for _ in range(num_hashes):
        state = (state * 1_103_515_245 + 12_345) % _P
        a = state or 1
        state = (state * 1_103_515_245 + 12_345) % _P
        b = state
        params.append((a, b))
    return params


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
    impl: str = "arrow",
) -> DataFrame:
    """(id, signature array<bigint>) — one row per doc, no shuffle.

    Shingling stays a JVM expression; the num_hashes permutation mins run as a
    vectorized Arrow batch (``impl="arrow"``, default): per document one
    (num_hashes x n_shingles) numpy broadcast-min. The pure-Column variant
    (``impl="expr"``) computes identical signatures via higher-order
    functions — exact but interpreted per element, measured ~5x slower at 64
    hashes. Both are map-only: this scales linearly over 100 TB with zero
    data movement either way.
    """
    sh = shingles(F.col(text_col), n=shingle_n)
    params = _perm_params(num_hashes)
    if impl == "expr":
        # Materialize the per-shingle hashes ONCE as a real column before
        # fanning out to num_hashes mins — inlining the md5 expression into
        # each of the 64 permutations would make Catalyst recompute it 64x per
        # row (no CSE across lambda bodies): measured 8x slower at 500 docs.
        hashed = df.select(
            F.col(id_col),
            F.transform(sh, lambda s: _shingle_hash(s) % _P).alias("_hs"),
        )

        def _minhash(a: int, b: int) -> Column:
            return F.array_min(F.transform(F.col("_hs"), lambda h: (F.lit(a) * h + F.lit(b)) % _P))

        sig = F.array(*[_minhash(a, b) for a, b in params])
        return hashed.select(F.col(id_col), sig.alias("signature"))

    import numpy as np

    a_vec = np.array([a for a, _ in params], dtype=np.int64)[:, None]
    b_vec = np.array([b for _, b in params], dtype=np.int64)[:, None]
    id_type = dict(df.dtypes)[id_col]
    # tokenize in the JVM (regex parity), gram+hash+mins in ONE Arrow pass
    src = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tk"))

    def gen(batches):
        import pandas as pd

        for batch in batches:
            sigs = []
            for toks in batch["_tk"]:
                if toks is None:
                    # NULL text: sentinel all-P signature — NULL docs bucket
                    # only with each other and any candidate pair they form
                    # fails exact verification (0-size sets -> NULL jaccard)
                    sigs.append([int(_P)] * len(params))
                    continue
                hs = np.asarray(_gram_hashes_py(list(toks), shingle_n, _P), dtype=np.int64)
                # a*h < P^2 < 2^62: stays inside int64, matching the JVM math
                sigs.append(((a_vec * hs[None, :] + b_vec) % _P).min(axis=1).tolist())
            yield pd.DataFrame({id_col: batch[id_col], "signature": sigs})

    return ensure_min_partitions(src).mapInPandas(gen, schema=f"{id_col} {id_type}, signature array<bigint>")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) via LSH banding.

    signature -> ``bands`` slices of r = num_hashes/bands values -> bucket key
    md5(band_idx || slice) -> groupBy bucket -> in-bucket pair expansion.
    Collision probability per band is s^r for Jaccard s — tune (bands, r) to
    place the S-curve threshold. Verify candidates with
    :func:`ngram_jaccard_pairs` semantics on the candidate set when exactness
    matters.

    Pair generation is groupBy(bucket).collect_list + double-explode rather
    than a bucket self-join: a self-join materializes the whole signature
    pipeline (the expensive Arrow minhash pass) TWICE — once per join side,
    no ReusedExchange across a BroadcastExchange — where the groupBy form
    computes signatures once and shuffles once. Measured 1.2 s -> 0.8 s at
    sf0.1; at 100 TB it halves the dominant stage. Per-bucket lists are
    near-dup clusters (small by construction); a pathological hot bucket
    produces the same quadratic pair count under either form.
    """
    banded = _lsh_banded(df, text_col, id_col, num_hashes, bands, shingle_n)
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list(id_col).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return (
        buckets.select(F.explode("ids").alias("a"), "ids")
        .select("a", F.explode("ids").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )


def _lsh_banded(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
) -> DataFrame:
    """(id, band, bucket) — one row per (document, band): the md5 bucket
    key of each signature slice. Shared by :func:`minhash_lsh_pairs`
    (in-corpus pair expansion) and :class:`NearDupStore` (the persisted
    band table an incremental batch probes); identical banding is what
    makes the incremental pair set equal the all-at-once one."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    return sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.md5(
                    F.concat_ws(
                        ",", bi.cast("string"),
                        F.concat_ws(",", F.transform(
                            F.slice("signature", bi * r + 1, r),
                            lambda x: x.cast("string"),
                        )),
                    )
                ),
            )
        ).alias("band", "bucket"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    round_to: int | None = 6,
    prefix_filter: bool = False,
    df_cap: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs (a < b, jaccard >= threshold) via shingle
    self-join: |A ∩ B| from an equi-join on shingle, |A ∪ B| = |A|+|B|-∩.

    The equi-join on shingle is the scalable form of all-pairs set overlap —
    no crossJoin; skewed (ubiquitous) shingles are the hazard at 100 TB: one
    shingle appearing in d documents contributes d^2/2 join rows.

    ``df_cap`` bounds that skew: shingles whose document frequency exceeds the
    cap are dropped from CANDIDATE GENERATION only — candidates are then
    verified against the full shingle sets, so every emitted score is still
    exact. The only possible loss is a qualifying pair whose shared shingles
    are ALL ubiquitous (each in > df_cap docs); for near-dup thresholds this
    means a pair of documents built entirely from boilerplate. The dropped-
    shingle set is tiny by construction (few shingles exceed the cap), so the
    posting filter is a broadcast anti-join — no extra shuffle of postings.

    ``prefix_filter=True`` switches to SSJoin/PPJoin-style prefix filtering
    (Chaudhuri et al. ICDE'06, Xiao et al. WWW'08), still EXACT: under any
    global total order of shingles (hash order here — free), two sets with
    jaccard >= t must share an element within their first
    |X| - ceil(t*|X|) + 1 shingles, so the candidate join explodes only
    prefixes; candidates are then verified with the exact intersection size.
    At high thresholds this collapses the join input (t=0.8 -> ~20% of rows).
    """
    if prefix_filter:
        return _jaccard_prefix_filtered(
            df, threshold, text_col, id_col, shingle_n, round_to
        )
    # shingle sets are already distinct-per-doc, so no dedup shuffle needed,
    # and |set| comes free from the array size (no extra aggregation). The
    # join key is the 60-bit md5-derived shingle hash, not the raw string:
    # the shuffle moves 8-byte ints instead of n-gram strings — same pair
    # counts modulo a ~2^-60 collision probability.
    based = shingle_hash_sets(df, text_col, id_col, shingle_n)
    if df_cap is not None:
        # the capped path references the shingle sets at candidate time AND
        # twice at verify time; a lazy local checkpoint materializes the
        # Arrow pass once instead of per-reference
        return _jaccard_df_capped(
            based.localCheckpoint(eager=False), threshold, id_col, round_to, df_cap
        )
    # carry |set| through the explode: sz is functionally dependent on the id,
    # so adding it to the pair groupBy keys is free and saves two join stages
    ex = based.select(
        F.col(id_col),
        F.size("hs").alias("sz"),
        F.explode("hs").alias("sh"),
    )
    # pair expansion via groupBy(sh) + double-explode, NOT a self-join: the
    # self-join form materializes the Arrow shingle pass once per side (no
    # exchange reuse), where this computes it once and shuffles once on sh.
    # Per-shingle posting lists bound the row width: identical d^2/2 blowup
    # semantics for a hot shingle as the join form, and the same df_cap is
    # the remedy for both.
    posts = (
        ex.groupBy("sh")
        .agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("id"), F.col("sz").alias("sz"))
            ).alias("ms")
        )
        .filter(F.size("ms") > 1)
    )
    common = (
        posts.select(F.explode("ms").alias("ma"), "ms")
        .select("ma", F.explode("ms").alias("mb"))
        .filter(F.col("ma.id") < F.col("mb.id"))
        .groupBy(
            F.col("ma.id").alias("a"),
            F.col("mb.id").alias("b"),
            F.col("ma.sz").alias("sza"),
            F.col("mb.sz").alias("szb"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        common.withColumn(
            "jaccard", F.col("common") / (F.col("sza") + F.col("szb") - F.col("common"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    if round_to is not None:
        out = out.withColumn("jaccard", F.round("jaccard", round_to))
    return out


def _jaccard_df_capped(
    based: DataFrame,
    threshold: float,
    id_col: str,
    round_to: int | None,
    df_cap: int,
) -> DataFrame:
    """df-capped candidate generation + full-set verification (see
    ngram_jaccard_pairs). Grouping postings by shingle makes the df cap a
    FILTER on the posting-list size (1 < |list| <= cap) — the hot-shingle
    aggregate + broadcast anti-join of the join formulation disappear
    entirely, and the d^2 blowup of a hot shingle is structurally bounded at
    cap^2 before any pair is generated. Survivors verify with array_intersect
    over the complete sets, so every emitted score stays exact."""
    ex = based.select(F.col(id_col), F.explode("hs").alias("sh"))
    posts = (
        ex.groupBy("sh")
        .agg(F.collect_list(id_col).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= df_cap))
    )
    cand = (
        posts.select(F.explode("ids").alias("a"), "ids")
        .select("a", F.explode("ids").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    full = based.select(F.col(id_col), F.col("hs"))
    cand = cand.join(
        full.select(F.col(id_col).alias("a"), F.col("hs").alias("_ha")), "a"
    ).join(full.select(F.col(id_col).alias("b"), F.col("hs").alias("_hb")), "b")
    common = F.size(F.array_intersect("_ha", "_hb"))
    union = F.size("_ha") + F.size("_hb") - common
    out = (
        cand.withColumn("jaccard", common / union)
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    if round_to is not None:
        out = out.withColumn("jaccard", F.round("jaccard", round_to))
    return out


def _jaccard_prefix_filtered(
    df: DataFrame,
    threshold: float,
    text_col: str,
    id_col: str,
    shingle_n: int,
    round_to: int | None,
) -> DataFrame:
    """Prefix-filtered exact Jaccard join (see ngram_jaccard_pairs).

    Plan: hash-sort each doc's shingle-hash set once; explode only the prefix;
    equi-join prefixes; verify candidate pairs against the full sorted arrays
    with array_intersect. Two shuffles total (candidate join + verify join),
    both proportional to prefix/candidate volume, not the full posting list.
    """
    # referenced at prefix-candidate time and twice at verify time: one lazy
    # local checkpoint instead of three Arrow passes
    based = shingle_hash_sets(df, text_col, id_col, shingle_n).select(
        F.col(id_col), F.array_sort("hs").alias("_hs")
    ).localCheckpoint(eager=False)
    sz = F.size("_hs")
    # prefix length |X| - ceil(t*|X|) + 1 (>= 1)
    plen = F.greatest(sz - F.ceil(F.lit(threshold) * sz).cast("int") + 1, F.lit(1))
    # candidate generation ships only (id, hash) pairs; the full arrays join
    # in at verify time (per-candidate, not per-prefix-element)
    prefixed = based.select(F.col(id_col), F.explode(F.slice("_hs", 1, plen)).alias("sh"))
    a = prefixed.select(F.col(id_col).alias("a"), "sh")
    b = prefixed.select(F.col(id_col).alias("b"), "sh")
    cand = a.join(b, "sh").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    cand = cand.join(
        based.select(F.col(id_col).alias("a"), F.col("_hs").alias("_ha")), "a"
    ).join(based.select(F.col(id_col).alias("b"), F.col("_hs").alias("_hb")), "b")
    common = F.size(F.array_intersect("_ha", "_hb"))
    union = F.size("_ha") + F.size("_hb") - common
    out = (
        cand.withColumn("jaccard", common / union)
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    if round_to is not None:
        out = out.withColumn("jaccard", F.round("jaccard", round_to))
    return out


def dedup_against(
    new: DataFrame,
    existing: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    method: str = "exact",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Incremental-ingest dedup: flag every row of ``new`` that has a
    jaccard >= threshold near-duplicate in ``existing`` — the "don't
    re-ingest what the corpus already holds" step an append-only training
    pipeline runs per batch (the batch-internal J4 dedup and corpus-wide
    q15/q18 passes don't cover the new-vs-existing direction).

    Returns one row per ``new`` document: (id, n_dups, kept) with
    kept = no near-duplicate found; append ``new`` filtered to the kept ids.

    ``method="exact"``: bipartite shingle-hash equi-join — the bipartite
    form of :func:`ngram_jaccard_pairs` (set sizes carried through the
    explode, one shuffle keyed on the 60-bit md5 shingle hash). Same
    hot-shingle d_new x d_existing hazard and the same remedies (df-cap /
    prefix filter) apply when a corpus has boilerplate.

    ``method="lsh"``: minhash band join across the two tables generates
    candidates, then EXACT verification against the full shingle sets — at
    100 TB the existing corpus's signatures/bands are computed once,
    persisted, and reused by every incoming batch, so per-batch cost is
    proportional to the batch, not the corpus. Scores are exact; recall of
    a qualifying pair is the banding S-curve (tune num_hashes/bands).
    """
    # each shingle-set frame is consumed exactly once per method branch, so
    # no checkpoint: lineage runs once anyway (review-found: earlier
    # checkpoints added a materialization write with no reuse). The LSH
    # branch DOES tokenize each table twice (signatures + verification
    # sets) — at deployment scale the existing side's signatures AND sets
    # are precomputed artifacts, so the per-batch double pass is over the
    # batch only.
    sn = shingle_hash_sets(new, text_col, id_col, shingle_n)
    se = shingle_hash_sets(existing, text_col, id_col, shingle_n)
    if method == "exact":
        exn = sn.select(
            F.col(id_col).alias("a"), F.size("hs").alias("sza"), F.explode("hs").alias("sh")
        )
        exe = se.select(
            F.col(id_col).alias("b"), F.size("hs").alias("szb"), F.explode("hs").alias("sh")
        )
        common = (
            exn.join(exe, "sh")
            .groupBy("a", "b", "sza", "szb")
            .agg(F.count(F.lit(1)).alias("common"))
        )
    elif method == "lsh":
        cand = _lsh_bipartite_candidates(
            new, existing, text_col, id_col, num_hashes, bands, shingle_n
        )
        common = (
            cand.join(sn.select(F.col(id_col).alias("a"), F.col("hs").alias("_ha")), "a")
            .join(se.select(F.col(id_col).alias("b"), F.col("hs").alias("_hb")), "b")
            .select(
                "a",
                "b",
                F.size("_ha").alias("sza"),
                F.size("_hb").alias("szb"),
                F.size(F.array_intersect("_ha", "_hb")).alias("common"),
            )
        )
    else:
        raise ValueError(f"unknown method: {method!r}")
    dups = (
        common.filter(
            F.col("common") / (F.col("sza") + F.col("szb") - F.col("common"))
            >= threshold
        )
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("n_dups"))
    )
    return (
        new.select(F.col(id_col))
        .join(dups.withColumnRenamed("a", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_dups", F.lit(0)).cast("bigint").alias("n_dups"),
            (F.coalesce("n_dups", F.lit(0)) == 0).alias("kept"),
        )
    )


def _lsh_bipartite_candidates(
    new: DataFrame,
    existing: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
) -> DataFrame:
    """(a=new id, b=existing id) candidate pairs via cross-table band-bucket
    join — minhash_lsh_pairs' banding, bipartite: only new x existing pairs
    emerge (never new x new), and the existing side is the part a production
    deployment precomputes."""
    assert num_hashes % bands == 0
    r = num_hashes // bands

    def banded(df: DataFrame, out: str) -> DataFrame:
        # contentless (NULL/empty) docs all hash to the all-sentinel
        # signature, so every dirty NEW row would band-join every dirty
        # EXISTING row — n_null^2 candidates that can never verify (0-size
        # shingle sets -> NULL jaccard). Skipping them is behavior-preserving
        # and removes the quadratic term on dirty corpora (advice-found).
        df = df.filter(
            F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) > 0
        )
        sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
        return sigs.select(
            F.col(id_col).alias(out),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda bi: F.md5(
                        F.concat_ws(
                            ",", bi.cast("string"),
                            F.concat_ws(",", F.transform(
                                F.slice("signature", bi * r + 1, r),
                                lambda x: x.cast("string"),
                            )),
                        )
                    ),
                )
            ).alias("band", "bucket"),
        )
    return (
        banded(new, "a")
        .join(banded(existing, "b"), ["band", "bucket"])
        .select("a", "b")
        .distinct()
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", impl: str = "arrow"
) -> DataFrame:
    """32-bit frequency-weighted SimHash fingerprint per document.

    Token hash = first 8 md5 hex chars (32 bits, engine-independent). Bit i of
    the fingerprint is 1 iff sum over tokens of (bit_i(h)*2 - 1) > 0, where
    bit_i(h) = floor(h / 2^i) % 2 — integer arithmetic only, so the identical
    formula runs in the DuckDB oracle.

    ``impl="arrow"`` (default): tokenization stays a JVM expression (Java and
    Python regex \\s disagree on Unicode whitespace, so tokens must NOT be
    re-derived in Python); the md5 + 32 bit-sums run vectorized per Arrow
    batch. ``impl="expr"``: identical math as higher-order Column aggregates.
    Both are map-only projections — no shuffle at any scale.
    """
    if impl == "arrow":
        import numpy as np

        id_type = dict(df.dtypes)[id_col]
        # token hashing stays in the JVM (codegen md5) — Python receives int64
        # arrays, not token strings
        th_col = F.transform(
            tokens(F.col(text_col)),
            lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint"),
        )
        src = df.select(F.col(id_col), th_col.alias("_th"))
        bit_idx = np.arange(32, dtype=np.int64)

        def gen(batches):
            import pandas as pd

            for batch in batches:
                fps = []
                for hashes in batch["_th"]:
                    th = np.asarray(
                        hashes if hashes is not None else [], dtype=np.int64
                    )
                    if not len(th):
                        fps.append(0)
                        continue
                    votes = (((th[:, None] >> bit_idx) & 1) * 2 - 1).sum(axis=0)
                    fps.append(int(((votes > 0).astype(np.int64) << bit_idx).sum()))
                yield pd.DataFrame({id_col: batch[id_col], "simhash": fps})

        return ensure_min_partitions(src).mapInPandas(gen, schema=f"{id_col} {id_type}, simhash bigint")
    # Materialize the token-hash array once (same CSE rationale as minhash:
    # 32 bit-terms referencing an inlined md5 expression would recompute it
    # 32x per row).
    toks = tokens(F.col(text_col))
    hashed = df.select(
        F.col(id_col),
        F.transform(
            toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
        ).alias("_th"),
    )

    def _bit_term(i: int) -> Column:
        # sum over tokens of (bit_i * 2 - 1); fingerprint bit set iff > 0
        pw = 1 << i
        s = F.aggregate(
            F.col("_th"), F.lit(0).cast("bigint"),
            lambda acc, h: acc + (F.floor(h / F.lit(pw)).cast("bigint") % 2) * 2 - 1,
        )
        return F.when(s > 0, F.lit(1 << i).cast("bigint")).otherwise(F.lit(0).cast("bigint"))

    fp = sum([_bit_term(i) for i in range(32)], F.lit(0).cast("bigint"))
    return hashed.select(F.col(id_col), fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs (a < b) with hamming(simhash_a, simhash_b) <= max_hamming.

    Banded candidate generation, not a quadratic join: split the 32-bit
    fingerprint into ``n_bands`` byte bands; by pigeonhole, any pair within
    hamming distance < n_bands shares at least one untouched band, so an
    equi-join on (band_idx, band_value) finds every true pair. Candidates are
    then verified exactly with bit_count(xor). The only shuffle is the band
    groupBy — same shape (and same 100 TB behavior) as MinHash-LSH banding,
    and for the same reason as there the pair expansion is
    groupBy + collect_list + double-explode, not a self-join: the self-join
    form runs the Arrow simhash pass once per join side.

    Requires max_hamming < n_bands for exactness (guaranteed recall).
    """
    assert max_hamming < n_bands, "pigeonhole guarantee needs max_hamming < n_bands"
    fps = simhash(df, text_col=text_col, id_col=id_col)
    width = 32 // n_bands
    bands = fps.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(*[
                (F.col("simhash").bitwiseAND(F.lit(((1 << width) - 1) << (width * i)))
                 / F.lit(1 << (width * i))).cast("bigint")
                for i in range(n_bands)
            ])
        ).alias("band", "band_val"),
    )
    buckets = (
        bands.select("band", "band_val", F.struct(F.col(id_col).alias("id"), "simhash").alias("m"))
        .groupBy("band", "band_val")
        .agg(F.collect_list("m").alias("ms"))
        .filter(F.size("ms") > 1)
    )
    pairs = (
        buckets.select(F.explode("ms").alias("ma"), "ms")
        .select("ma", F.explode("ms").alias("mb"))
        .filter(F.col("ma.id") < F.col("mb.id"))
    )
    return (
        pairs.select(
            F.col("ma.id").alias("a"),
            F.col("mb.id").alias("b"),
            F.bit_count(F.col("ma.simhash").bitwiseXOR(F.col("mb.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_n: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03): the
    rolling-hash selection used by MOSS-style near-dup/plagiarism detection.

    Positional word n-gram hashes -> sliding window of ``window`` hashes ->
    keep the min of each window -> distinct set. Guarantees any shared run of
    window+gram_n-1 tokens yields a shared fingerprint. All let-bound
    higher-order expressions (one md5 per gram), map-only at any scale.

    Output: (id, n_fingerprints, fingerprints sorted array<bigint>).
    """

    def _mins(hashes: Column) -> Column:
        n_windows = F.greatest(F.size(hashes) - F.lit(window - 1), F.lit(1))
        mins = F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.array_min(F.slice(hashes, i, window)),
        )
        return F.array_sort(F.array_distinct(mins))

    def _winnow(tk: Column) -> Column:
        cnt = F.size(tk)
        n_grams = cnt - F.lit(gram_n - 1)
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(tk, i, gram_n)),
        )
        hashes = F.transform(grams, lambda g: _shingle_hash(g))
        # second binding level: the mins lambda must see hashes as a BOUND
        # array, or each window re-derives every gram's md5 (O(grams^2))
        return F.element_at(F.transform(F.array(hashes), _mins), 1)

    # let-bind the token array (no CSE across lambda bodies — same rationale
    # as shingles())
    fps = F.element_at(F.transform(F.array(tokens(F.col(text_col))), _winnow), 1)
    return df.select(
        F.col(id_col),
        F.size(fps).alias("n_fingerprints"),
        fps.alias("fingerprints"),
    )


def overlap_pairs(
    df: DataFrame,
    min_shared: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_n: int = 3,
    window: int = 4,
    max_df: int | None = None,
    log_dropped: bool = False,
) -> DataFrame:
    """MOSS-style cross-document overlap detection: pairs (a < b) sharing
    >= ``min_shared`` winnowing fingerprints, with a containment-style
    overlap score n_shared / min(|fps_a|, |fps_b|).

    This is the cross-doc HALF of :func:`winnowing_fingerprints` (q28): the
    winnowing guarantee (any shared run of window+gram_n-1 tokens yields a
    shared fingerprint) makes the posting join a SPAN-overlap detector —
    what jaccard/minhash (bag-of-shingles, order-free) cannot see: a long
    verbatim passage inside otherwise-different documents. One shuffle on
    fingerprint (posting lists, same shape and df-cap hazard/remedy as
    ngram_jaccard_pairs).

    ``max_df`` bounds posting-list skew, exactly as ``df_cap`` does for
    ngram_jaccard_pairs: a fingerprint shared by d documents (a boilerplate
    header at corpus scale) emits d^2/2 pairs through one shuffle key —
    uncapped, that single hot key is the 100 TB scale-killer. With the cap,
    hot fingerprints (|posting| > max_df) are dropped from CANDIDATE
    GENERATION only; surviving candidates are verified against the COMPLETE
    fingerprint arrays with array_intersect, so every emitted (n_shared,
    overlap) is identical to the uncapped result. The only possible loss is
    a pair whose shared fingerprints are ALL ubiquitous — i.e. documents
    overlapping only in boilerplate, the pairs a dedup pipeline wants
    suppressed anyway. ``log_dropped=True`` additionally counts the dropped
    hot fingerprints (one tiny extra aggregation job, opt-in) and logs it.
    """
    # contentless documents (NULL/empty/whitespace-only text) would all
    # fingerprint the whole-text fallback "" and pair with each other at
    # overlap=1.0 — meaningless "full overlaps"; NULL text additionally
    # diverges from the DuckDB twin (split of NULL has no elements). Drop
    # them before fingerprinting (review-found).
    nonempty = df.filter(
        F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) > 0
    )
    fps = winnowing_fingerprints(nonempty, text_col, id_col, gram_n, window)
    if max_df is not None:
        return _overlap_df_capped(
            fps, min_shared, id_col, max_df, log_dropped
        )
    ex = fps.select(
        F.col(id_col),
        F.col("n_fingerprints").alias("nf"),
        F.explode("fingerprints").alias("fp"),
    )
    posts = (
        ex.groupBy("fp")
        .agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("id"), F.col("nf").alias("nf"))
            ).alias("ms")
        )
        .filter(F.size("ms") > 1)
    )
    return (
        posts.select(F.explode("ms").alias("ma"), "ms")
        .select("ma", F.explode("ms").alias("mb"))
        .filter(F.col("ma.id") < F.col("mb.id"))
        .groupBy(
            F.col("ma.id").alias("a"),
            F.col("mb.id").alias("b"),
            F.col("ma.nf").alias("nfa"),
            F.col("mb.nf").alias("nfb"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select(
            "a",
            "b",
            "n_shared",
            F.round(
                F.col("n_shared") / F.least(F.col("nfa"), F.col("nfb")), 6
            ).alias("overlap"),
        )
    )


def _overlap_df_capped(
    fps: DataFrame,
    min_shared: int,
    id_col: str,
    max_df: int,
    log_dropped: bool,
) -> DataFrame:
    """df-capped candidate generation + full-array verification for
    :func:`overlap_pairs` (see ngram_jaccard_pairs/_jaccard_df_capped for
    the shape). The cap is a FILTER on posting-list size — a hot
    fingerprint's d^2 blowup is structurally bounded at max_df^2 before any
    pair exists. Verification re-derives n_shared from array_intersect over
    the complete per-doc fingerprint arrays, so emitted scores are exact."""
    # fps is referenced at candidate time and twice at verify time; one lazy
    # local checkpoint materializes the winnowing Arrow pass once
    fps = fps.localCheckpoint(eager=False)
    ex = fps.select(F.col(id_col), F.explode("fingerprints").alias("fp"))
    posts_all = ex.groupBy("fp").agg(F.collect_list(id_col).alias("ids"))
    if log_dropped:
        n_hot = posts_all.filter(F.size("ids") > max_df).count()
        logging.getLogger(__name__).info(
            "overlap_pairs: dropped %d hot fingerprints (df > %d) from "
            "candidate generation",
            n_hot,
            max_df,
        )
    posts = posts_all.filter((F.size("ids") > 1) & (F.size("ids") <= max_df))
    cand = (
        posts.select(F.explode("ids").alias("a"), "ids")
        .select("a", F.explode("ids").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    full = fps.select(
        F.col(id_col), F.col("n_fingerprints").alias("nf"), F.col("fingerprints")
    )
    cand = cand.join(
        full.select(
            F.col(id_col).alias("a"),
            F.col("nf").alias("nfa"),
            F.col("fingerprints").alias("_fa"),
        ),
        "a",
    ).join(
        full.select(
            F.col(id_col).alias("b"),
            F.col("nf").alias("nfb"),
            F.col("fingerprints").alias("_fb"),
        ),
        "b",
    )
    return (
        cand.withColumn("n_shared", F.size(F.array_intersect("_fa", "_fb")))
        .filter(F.col("n_shared") >= min_shared)
        .select(
            "a",
            "b",
            "n_shared",
            F.round(
                F.col("n_shared") / F.least(F.col("nfa"), F.col("nfb")), 6
            ).alias("overlap"),
        )
    )


def _cc_union_find_driver(base: DataFrame) -> DataFrame:
    """Driver-side union-find for SMALL pair graphs (see connected_components
    gate): collect the edge list (bounded at ~1.6 MB by the 100k-edge gate),
    label components in O(E α(E)) Python, parallelize the labels back.

    Rationale: the distributed loop costs ~3 Spark jobs PER ROUND regardless
    of data size; on a sub-100k-edge graph that is pure scheduling (measured
    ~4.5 s for 920 edges at local[32], ballooning under co-tenant load). The
    contracted near-dup graph a real pipeline feeds this is edge-sparse by
    construction (LSH candidates post-threshold), so the small-graph case is
    common even at corpus scale — and 100k edges is driver-trivial while the
    distributed star path takes over well before anything driver-sized hurts.
    """
    rows = base.collect()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        a, b = row["a"], row["b"]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    reps: dict = {}
    for n in parent:
        r = find(n)
        if r not in reps or n < reps[r]:
            reps[r] = n
    out_schema = T.StructType(
        [
            T.StructField("node", base.schema["a"].dataType),
            T.StructField("cluster_rep", base.schema["a"].dataType),
        ]
    )
    data = [(n, reps[find(n)]) for n in parent]
    return local_rows_df(base.sparkSession, data, out_schema)


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
    propagate_rounds: int = 4,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Duplicate clusters from a near-dup pair graph: (node, cluster_rep)
    where cluster_rep = min node id in the connected component.

    This is the step a training-data pipeline runs AFTER candidate
    generation (minhash_lsh_pairs / simhash_pairs / ngram_jaccard_pairs):
    pairs chain transitively (A~B, B~C => one cluster), and keeping one
    representative per CLUSTER — not per pair — is what actually dedups the
    corpus.

    Staged escalation, cheapest-first:

    Phase 0 — graphs under ``driver_threshold`` edges (default 100k, ~1.6 MB)
    are labeled by union-find ON THE DRIVER (see _cc_union_find_driver): the
    distributed loop's per-round scheduling dwarfs any compute at that size,
    and the contracted post-LSH near-dup graph is usually this small even on
    a huge corpus. ``driver_threshold=0`` forces the distributed path.

    Phase 1 — min-label propagation for up to ``propagate_rounds`` rounds
    (one shuffle-join + one agg per round; rounds = graph diameter). Near-dup
    components are short chains in practice, so this phase almost always
    finishes in 3-5 rounds, and it is ~2x cheaper per round than phase 2.

    Phase 2 — reached only if phase 1 did not converge (a deep component):
    alternating large-star/small-star (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14), O(log n) rounds on ANY graph shape —
    measured 11 rounds for a 1000-link chain, where propagation needs 1000.
    large-star: each node u routes its LARGER neighbors to
    m(u) = min(N(u) ∪ {u}); small-star: on the resulting hi→lo edges, each
    node routes its smaller neighbors and itself to m(u) — stars flatten
    toward the component min. Fixpoint when the edge set stops changing,
    witnessed driver-side by (count, Σ xxhash64(u,v)) — one tiny action per
    round, order-independent, no edge-set comparison shuffle (the decimal
    sum is overflow-proof under ANSI mode at any edge count).

    Both phases ``localCheckpoint(eager=False)`` each round: lineage is
    truncated (the plan would double per iteration) and the checkpoint
    materializes on the convergence-witness action — one job per round, not
    two. Exiting via ``max_iter`` without a fixpoint warns instead of
    silently returning wrong labels.
    """
    import warnings

    # Checkpoint of the pair list before the symmetric union: the two
    # union branches are separate task chains, so an unmaterialized plan
    # would execute the (often expensive — banded candidate join, cosine
    # self-join) upstream subtree twice. Pairs are tiny relative to their
    # producing plan; one materialization job is the cheap side of the
    # trade — and the gate count below IS that job (lazy checkpoint +
    # immediate count = one driver action, not two; r16 §5 job-folding).
    base = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b")).localCheckpoint(
        eager=False
    )
    # Small-graph gate: below ``driver_threshold`` edges the distributed
    # loop is pure per-round scheduling (~3 jobs/round x ~log(n) rounds) —
    # union-find on the driver is both faster and immune to co-tenant
    # stalls. Set driver_threshold=0 to force the distributed path (tests
    # pin both paths against each other).
    n_pairs = base.count()
    if n_pairs < driver_threshold:
        return _cc_union_find_driver(base)
    # Iteration frames are edge/label-sized, not corpus-sized. When the pair
    # graph is small, per-round SCHEDULING (32-way shuffles x ~3 stages x N
    # rounds) dominates wall time — collapse the loop frames to a handful of
    # partitions. NOT one: a single-partition chain serializes every round
    # onto one core, and under co-tenant load that chain balloons (r3 local
    # runs spread 5-22 s); 4-8 partitions keeps scheduling negligible while
    # any one busy core only stalls a quarter of each stage. Above the
    # threshold the layout is untouched: at real scale the per-round DATA is
    # the cost and partitioning is load-bearing.
    if n_pairs < 100_000:
        n_fit = min(8, max(4, n_pairs // 10_000))
        _fit = lambda df: df.coalesce(n_fit)
    else:
        _fit = lambda df: df
    edges_sym = _fit(
        base.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(base.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    ).localCheckpoint(eager=False)

    # --- phase 1: min-label propagation, bounded rounds -------------------
    labels = _fit(
        edges_sym.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    ).localCheckpoint(eager=False)
    # decimal(38,0) sums: overflow-proof for 64-bit-hash node ids at any
    # node count (ANSI mode would otherwise throw; non-ANSI would silently
    # wrap — and a wrapped-equal sum could falsely witness convergence)
    def _label_sum(lb: DataFrame):
        return lb.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = _label_sum(labels)
    converged = prev_sum is None  # empty graph
    rounds = 0
    while not converged and rounds < min(propagate_rounds, max_iter):
        rounds += 1
        neighbor_min = (
            edges_sym.join(labels, edges_sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        labels = _fit(
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
            )
        ).localCheckpoint(eager=False)
        # labels only decrease, so a stable sum is a strict fixpoint witness
        cur_sum = _label_sum(labels)
        converged = cur_sum == prev_sum
        prev_sum = cur_sum
    if converged:
        return labels.select(F.col("node"), F.col("label").alias("cluster_rep"))

    # --- phase 2: large-star / small-star alternation ---------------------
    # CONTRACT the graph through the phase-1 labels instead of discarding
    # that work: edge (x, y) -> (label(x), label(y)). Labels are always
    # members of the node's own component (and the component minimum always
    # labels itself), so the contracted graph has the same components with
    # the same minima over a smaller node set — after k propagation rounds
    # each contracted node stands for a k-hop neighborhood. The final answer
    # maps every node through its phase-1 label to the star rep.
    lab_src = labels.withColumnRenamed("node", "src").withColumnRenamed("label", "lsrc")
    lab_dst = labels.withColumnRenamed("node", "dst").withColumnRenamed("label", "ldst")
    edges = _fit(
        edges_sym.join(lab_src, "src")
        .join(lab_dst, "dst")
        .filter(F.col("lsrc") != F.col("ldst"))
        .select(
            F.greatest(F.col("lsrc"), F.col("ldst")).alias("u"),
            F.least(F.col("lsrc"), F.col("ldst")).alias("v"),
        )
        .distinct()
    ).localCheckpoint(eager=False)

    def _witness(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = _witness(edges)
    converged = prev[0] == 0
    while not converged and rounds < max_iter:
        rounds += 1
        # large-star over the symmetric view: every edge is emitted exactly
        # once, by its smaller endpoint, re-pointing the larger one at m(u)
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
        )
        # no distinct here: duplicates (several u routing the same (v, m))
        # are bounded by degree and the small-star distinct collapses them
        # anyway — dropping it saves one full shuffle per round
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # small-star: large's output is already hi→lo, so m(u) = min(N(u))
        mins_s = large.groupBy("u").agg(F.min("v").alias("m"))
        edges = _fit(
            large.join(mins_s, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins_s.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        ).localCheckpoint(eager=False)
        cur = _witness(edges)
        converged = cur == prev
        prev = cur
    if not converged:
        warnings.warn(
            f"connected_components: not converged after {max_iter} rounds — "
            "cluster_rep labels may not be component minima",
            RuntimeWarning,
            stacklevel=2,
        )
    # at the star fixpoint every non-min contracted node has exactly one
    # (u, min) edge; the groupBy-min also makes the unconverged warning case
    # deterministic. Map every ORIGINAL node through its phase-1 label to
    # the star rep (labels whose sub-component fully collapsed in phase 1
    # have no star edge — they are their own rep).
    reps = edges.groupBy("u").agg(F.min("v").alias("_rep"))
    return (
        labels.join(reps, labels.label == reps.u, "left")
        .select("node", F.coalesce(F.col("_rep"), F.col("label")).alias("cluster_rep"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    normalize: bool = False,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any word
    ``n``-gram with an evaluation/benchmark corpus (the PaLM/GPT-3 style
    n-gram overlap rule). Leaked eval data inflates benchmark scores, so
    pipelines run this between dedup and sampling.

    ``normalize=True`` lowercases and collapses every non-alphanumeric run
    to a single space on BOTH sides before shingling — the form the GPT-3
    appendix-C / PaLM decontamination actually used. Exact-surface matching
    misses a benchmark question that re-enters the crawl re-cased,
    re-punctuated, or HTML-mangled; normalized matching catches it. The
    character class is ASCII-only ([^a-z0-9]+) on purpose: it means the
    same thing in Java regex, RE2, and every SQL dialect, so the oracle
    can reproduce it byte-for-byte.

    Shape: explode both sides to n-gram shingles, broadcast the benchmark
    side (eval sets are tiny next to a training corpus — at 100 TB the fact
    side streams map-only through a broadcast hash semi-aggregation; the
    only shuffle is the per-doc count). Output: every input doc with
    ``n_shared_ngrams`` and a ``contaminated`` flag; scores stay exact, no
    probabilistic filter. Normalization is a map-side expression — plan
    shape unchanged.
    """
    def _prep(c: Column) -> Column:
        if not normalize:
            return c
        return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))

    # Drop the degenerate '' shingle (an empty or — under normalize=True —
    # entirely non-ASCII/punctuation text collapses to '', and shingles('')
    # is ['']) from BOTH sides: one punctuation-only benchmark row would
    # otherwise flag every non-ASCII training document as contaminated
    # (mass false positives on multilingual corpora, invisible on ASCII
    # synthetic data). An empty-matching-empty "overlap" carries no n-gram
    # evidence; such docs read n_shared_ngrams=0 via the left join.
    d = docs.select(
        F.col(id_col), F.explode(shingles(_prep(F.col(text_col)), n)).alias("sh")
    ).filter(F.col("sh") != "")
    b = (
        benchmark.select(
            F.explode(shingles(_prep(F.col(bench_text_col)), n)).alias("sh")
        )
        .filter(F.col("sh") != "")
        .distinct()
    )
    shared = (
        d.join(F.broadcast(b), "sh")
        .groupBy(id_col)
        .agg(F.count_distinct("sh").alias("n_shared_ngrams"))
    )
    return docs.select(id_col).join(shared, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_shared_ngrams", F.lit(0)).cast("bigint").alias("n_shared_ngrams"),
        (F.coalesce("n_shared_ngrams", F.lit(0)) > 0).alias("contaminated"),
    )


def line_dedup(
    df: DataFrame,
    max_line_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level duplicated-LINE removal (the CCNet / RefinedWeb line
    dedup stage): a line whose trimmed hash appears in more than
    ``max_line_df`` distinct documents is boilerplate (nav bars, cookie
    banners, footers, "subscribe" blocks) and is dropped from EVERY
    document; each document's surviving lines reassemble in original
    order. This is the sub-document complement of whole-doc dedup — the
    duplication that q15/q18 can never see because every page is unique
    around its repeated chrome.

    Output: (id, n_lines, n_kept, cleaned_md5) — the md5 of the cleaned
    text rather than the text itself, so the row stays hashable/compact;
    callers that need the text run the same kept-lines reassembly with
    the text column kept.

    Plan: ONE posexplode of (doc, line-idx, line) — lazy-checkpointed, it
    feeds the census and the reassembly; per-hash distinct-doc counts
    partial-aggregate on the line hash; the hot set (df > cap) is
    boilerplate-catalog-sized at any corpus scale and BROADCASTs onto the
    line frame; reassembly is one id-keyed sorted-collect (array_sort over
    (idx, line) structs — document-sized groups, no corpus-wide sort).
    Two shuffles total (census, reassembly), both partial-aggregated.
    """
    lines = (
        df.select(
            F.col(id_col),
            # NULL text coalesces to '' (one empty line) so the document
            # STAYS in the output — posexplode of a NULL array would
            # silently drop the row, breaking the total-over-input
            # contract every operator here keeps
            F.posexplode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
            ).alias("idx", "ln"),
        )
        .withColumn("h", F.md5(F.trim("ln")))
        .localCheckpoint(eager=False)
    )
    hot = (
        lines.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("ldf"))
        .filter(F.col("ldf") > max_line_df)
        .select("h", F.lit(True).alias("_hot"))
    )
    marked = lines.join(F.broadcast(hot), "h", "left")
    kept_struct = F.array_sort(
        F.collect_list(F.when(F.col("_hot").isNull(), F.struct("idx", "ln")))
    )
    return (
        marked.groupBy(F.col(id_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.count(F.when(F.col("_hot").isNull(), 1)).cast("bigint").alias("n_kept"),
            kept_struct.alias("_ks"),
        )
        .select(
            F.col(id_col),
            "n_lines",
            "n_kept",
            F.md5(
                F.concat_ws("\n", F.transform("_ks", lambda s: s["ln"]))
            ).alias("cleaned_md5"),
        )
    )


def keep_representatives(
    docs: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """The dedup FINISHER: given (node, cluster_rep) labels from
    :func:`connected_components`, return ``docs`` with every non-representative
    cluster member dropped (exactly one survivor — the min id — per near-dup
    cluster; documents in no cluster pass through untouched).

    An anti-join against the non-representative node set. The drop set is
    DUPLICATE-COUNT-sized — on a crawl-like corpus that can be 30-50% of all
    documents, far past broadcast range — so no broadcast hint is forced:
    AQE broadcasts it when the duplicate set is actually small and falls
    back to a shuffle anti-join when it is not.
    """
    drop = labels.filter(F.col("node") != F.col("cluster_rep")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster-representative selection by QUALITY: label near-dup clusters
    (via :func:`connected_components` over ``pairs``), then keep the
    highest-``quality_col`` member of each cluster (ties -> min id) — the
    "keep the best copy, not the first copy" step real pipelines run
    instead of min-id dedup (the shortest or most boilerplate-laden member
    often has the smallest id). Unclustered documents form singleton
    clusters and keep themselves.

    Output: (id, cluster, quality, kept). Scale shape: the label frame is
    |clustered nodes| rows — near-dup clusters are a small fraction of a
    corpus, so the label join broadcasts (AQE does this from runtime
    stats); the argmax window partitions by cluster, whose sizes are
    near-dup group sizes — bounded small by construction, no hot-key
    hazard (unlike a per-domain window, see per_source_cap).
    """
    from pyspark.sql import Window

    labels = connected_components(pairs)
    based = df.select(F.col(id_col), F.col(quality_col)).join(
        labels.withColumnRenamed("node", id_col), id_col, "left"
    )
    cluster = F.coalesce(F.col("cluster_rep"), F.col(id_col))
    w = Window.partitionBy(cluster).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return based.select(
        F.col(id_col),
        cluster.alias("cluster"),
        F.col(quality_col),
        (F.row_number().over(w) == 1).alias("kept"),
    )


def containment_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    round_to: int | None = 6,
    df_cap: int | None = None,
) -> DataFrame:
    """ASYMMETRIC set containment pairs: c(A in B) = |A ∩ B| / |A|. Emits
    (a, b, containment_ab, containment_ba) for a < b where EITHER direction
    is >= threshold.

    Containment is the near-dup measure symmetric Jaccard structurally
    misses: a snippet fully embedded in a 100x larger page has
    jaccard ~ |A|/|B| ~ 0.01 but containment(A in B) = 1.0 — the
    quote-extraction / page-wrapping duplication pattern in crawl corpora
    (the measure behind Broder's resemblance-vs-containment split and
    CC-Net-style subset filtering). Same generalization direction as the
    repo's winnowing/overlap operators over the reference's exact-hash
    dedup (worker's sha256 content identity).

    Plan shape is identical to :func:`ngram_jaccard_pairs` — one shuffle of
    (id, sz, shingle) on the 60-bit shingle hash, posting-list pair
    expansion, partial-aggregated pair counting — only the final filter
    arithmetic differs (common/sza or common/szb instead of the union
    ratio). Same hot-shingle d^2 hazard, same ``df_cap`` remedy: capped
    candidate generation + exact full-set verification via array_intersect.
    """
    based = shingle_hash_sets(df, text_col, id_col, shingle_n)
    if df_cap is not None:
        based = based.localCheckpoint(eager=False)
        ex = based.select(F.col(id_col), F.explode("hs").alias("sh"))
        posts = (
            ex.groupBy("sh")
            .agg(F.collect_list(id_col).alias("ids"))
            .filter((F.size("ids") > 1) & (F.size("ids") <= df_cap))
        )
        cand = (
            posts.select(F.explode("ids").alias("a"), "ids")
            .select("a", F.explode("ids").alias("b"))
            .filter(F.col("a") < F.col("b"))
            .distinct()
        )
        sa = based.select(F.col(id_col).alias("a"), F.col("hs").alias("hsa"))
        sb = based.select(F.col(id_col).alias("b"), F.col("hs").alias("hsb"))
        verified = (
            cand.join(sa, "a").join(sb, "b")
            .select(
                "a",
                "b",
                F.size(F.array_intersect("hsa", "hsb")).alias("common"),
                F.size("hsa").alias("sza"),
                F.size("hsb").alias("szb"),
            )
        )
    else:
        ex = based.select(
            F.col(id_col),
            F.size("hs").alias("sz"),
            F.explode("hs").alias("sh"),
        )
        posts = (
            ex.groupBy("sh")
            .agg(
                F.collect_list(
                    F.struct(F.col(id_col).alias("id"), F.col("sz").alias("sz"))
                ).alias("ms")
            )
            .filter(F.size("ms") > 1)
        )
        verified = (
            posts.select(F.explode("ms").alias("ma"), "ms")
            .select("ma", F.explode("ms").alias("mb"))
            .filter(F.col("ma.id") < F.col("mb.id"))
            .groupBy(
                F.col("ma.id").alias("a"),
                F.col("mb.id").alias("b"),
                F.col("ma.sz").alias("sza"),
                F.col("mb.sz").alias("szb"),
            )
            .agg(F.count(F.lit(1)).alias("common"))
        )
    cab = F.col("common") / F.col("sza")
    cba = F.col("common") / F.col("szb")
    out = (
        verified.filter((cab >= threshold) | (cba >= threshold))
        .select("a", "b", cab.alias("containment_ab"), cba.alias("containment_ba"))
    )
    if round_to is not None:
        out = out.select(
            "a",
            "b",
            F.round("containment_ab", round_to).alias("containment_ab"),
            F.round("containment_ba", round_to).alias("containment_ba"),
        )
    return out


def shingle_df_census(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Shingle document-frequency HISTOGRAM: (df, n_shingles) — how many
    distinct shingles appear in exactly ``df`` documents.

    This is the operational pre-flight for every df-capped operator in this
    module (``ngram_jaccard_pairs(df_cap=)``, ``overlap_pairs(max_df=)``,
    ``dedup_against``): the histogram's tail IS the skew the caps bound, so
    a user picks the cap by reading this census, not by guessing. On a
    crawl corpus the tail exposes boilerplate (one shingle in 10^6 docs ->
    that shingle alone would emit 5*10^11 candidate pairs uncapped).

    Two shuffles, both safe at 100 TB: (1) per-shingle distinct-doc count —
    partial-aggregated on the 60-bit shingle hash (shingle sets are already
    distinct per doc, so count(*) == distinct-doc count; no count-distinct
    expansion); (2) histogram groupBy on df — at most |distinct df values|
    <= max-df rows in flight, partial aggregation collapses it map-side.
    """
    based = shingle_hash_sets(df, text_col, id_col, shingle_n)
    per_shingle = (
        based.select(F.explode("hs").alias("sh"))
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return (
        per_shingle.groupBy("df")
        .agg(F.count(F.lit(1)).alias("n_shingles"))
    )


def cross_source_dup_matrix(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    shingle_n: int = 3,
    df_cap: int | None = None,
) -> DataFrame:
    """Duplication PROVENANCE matrix: (source_a, source_b, n_pairs,
    max_jaccard) — which source pairs exchange near-duplicate content
    (mirror sites, syndication feeds, scraped re-posts).

    Composition of verified stages: exact n-gram Jaccard pairs (same
    candidate machinery as q17/q52) joined back to each side's source
    label, then a tiny groupBy on the source pair. Sources-per-pair lookup
    is a join against an id->source projection — pair counts are the
    near-dup rate (a small fraction of the corpus), so AQE broadcasts the
    pairs side at runtime; the groupBy output is |sources|^2-bounded
    (hundreds of domains -> thousands of rows), driver-safe at any corpus
    size. Intra-source pairs are kept (a==b row) — self-duplication is the
    most common and most actionable row in practice. ``df_cap`` plumbs to
    the pair generator's capped path (boilerplate-heavy corpora — the same
    remedy every posting-join operator carries).
    """
    pairs = ngram_jaccard_pairs(
        df, threshold, text_col=text_col, id_col=id_col, shingle_n=shingle_n,
        df_cap=df_cap,
    )
    src = df.select(F.col(id_col), F.col(source_col))
    withsrc = (
        pairs.join(src.withColumnRenamed(id_col, "a").withColumnRenamed(source_col, "sa"), "a")
        .join(src.withColumnRenamed(id_col, "b").withColumnRenamed(source_col, "sb"), "b")
    )
    return (
        withsrc.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
        )
    )


def novelty_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document NOVELTY: the fraction of a document's shingles that
    appear in no other document — the inverse of the census view (q77).
    Low-novelty documents are recombinations of corpus text (template
    output, quote-stitching, near-dup tails below the pair thresholds);
    high-novelty ones carry new content. Pipelines use it as a
    memorization-risk / information-density signal when choosing what to
    up-sample.

    A shingle's document frequency counts DISTINCT documents (sets are
    distinct per doc), so "novel" = df == 1, i.e. this document is its
    only holder. Plan: one exploded posting frame feeds BOTH the df
    aggregate and the join back (lazy-checkpointed — one Arrow pass);
    shuffles are the df groupBy and the posting equi-join on the same
    60-bit shingle key (partition-layout reuse applies), then one
    partial-aggregated per-doc rollup. No posting-list explosion — this
    never materializes pairs, so no df-cap is needed.
    """
    based = shingle_hash_sets(df, text_col, id_col, shingle_n)
    ex = based.select(F.col(id_col), F.explode("hs").alias("sh")).localCheckpoint(
        eager=False
    )
    dfreq = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    return (
        ex.join(dfreq, "sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("int")).cast("bigint").alias("n_novel"),
        )
        .withColumn(
            "novelty", F.round(F.col("n_novel") / F.col("n_shingles"), 6)
        )
    )


def boilerplate_catalog(
    df: DataFrame,
    top_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    shingle_n: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """Per-SOURCE boilerplate catalog: for each source, its ``top_k`` most
    document-frequent shingles AS READABLE STRINGS with their in-source
    document counts — the human-actionable face of the df census: q77 says
    "this corpus has hot shingles", this says "domain X's hot shingle is
    'all rights reserved'", which is what someone writes a cleaning rule
    from.

    Unlike the dedup operators this keeps the shingle STRING (the output
    is for humans); the groupBy key is therefore (source, gram) — wider
    shuffle rows than the hashed form, but the frame aggregates down to
    per-source-distinct-grams and the top-k window partitions by source
    over already-aggregated counts (|grams-per-source| rows per partition,
    never documents). ``min_df`` drops the df=1 noise floor before the
    window. Ties break by gram string — deterministic cross-engine.
    """
    from jsonify2ai_spark.functions.text import shingles

    from pyspark.sql import Window

    grams = df.select(
        F.col(id_col),
        F.col(source_col),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("gram"),
    )
    counts = (
        grams.groupBy(source_col, "gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    w = Window.partitionBy(source_col).orderBy(F.col("df").desc(), F.col("gram").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(source_col, F.col("rank").cast("int").alias("rank"), "gram", F.col("df").cast("bigint").alias("df"))
    )


def syndication_matrix(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    shingle_n: int = 3,
    df_cap: int | None = None,
) -> DataFrame:
    """DIRECTIONAL duplication flow between sources: an edge
    (source_contained -> source_container, n_pairs) for every document
    pair where the first side's shingles are >= threshold contained in the
    second's — i.e. "whose content shows up wrapped inside whose".
    q79's symmetric matrix says two sources share content; this says which
    way it flows (scraper vs origin, feed vs aggregator), which is what
    provenance triage actually needs. Near-equal pairs emit both
    directions — correctly: each contains the other.

    Composition: :func:`containment_pairs` (posting join, df-cap remedy
    available) + two id->source lookups (pairs side is near-dup-rate
    sized, AQE broadcasts it) + a |sources|^2-bounded rollup.
    """
    pairs = containment_pairs(
        df, threshold, text_col=text_col, id_col=id_col,
        shingle_n=shingle_n, df_cap=df_cap,
    )
    src = df.select(F.col(id_col), F.col(source_col))
    withsrc = (
        pairs.join(
            src.withColumnRenamed(id_col, "a").withColumnRenamed(source_col, "sa"), "a"
        ).join(
            src.withColumnRenamed(id_col, "b").withColumnRenamed(source_col, "sb"), "b"
        )
    )
    ab = withsrc.filter(F.col("containment_ab") >= threshold).select(
        F.col("sa").alias("source_contained"), F.col("sb").alias("source_container")
    )
    ba = withsrc.filter(F.col("containment_ba") >= threshold).select(
        F.col("sb").alias("source_contained"), F.col("sa").alias("source_container")
    )
    return (
        ab.unionByName(ba)
        .groupBy("source_contained", "source_container")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


def dedup_impact_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-row EXACT-dedup impact forecast: how many duplicate groups
    exist, and how many documents / tokens / characters a min-id exact
    dedup would drop — the "is dedup worth a full pass here" sizing a
    pipeline owner reads before scheduling the real job (on crawl corpora
    the answer is routinely 30-50% of tokens; on curated ones ~0, and
    running the full dedup+rewrite there is wasted cluster time).

    Costs ONE content-hash shuffle (the same key the dedup itself would
    use): per-fingerprint counts and sizes partial-aggregate map-side;
    "dropped" = group totals minus the kept member's (the min-id row's)
    contribution, computed via min_by on the same aggregate — no second
    scan, no join back. Output is a single row at any corpus size.
    """
    from jsonify2ai_spark.functions.text import token_count

    per_doc = df.select(
        F.col(id_col),
        _content_fingerprint(F.col(text_col)).alias("fp"),
        F.coalesce(token_count(F.col(text_col)), F.lit(0)).cast("bigint").alias("tok"),
        F.coalesce(F.length(text_col), F.lit(0)).cast("bigint").alias("ch"),
    )
    groups = per_doc.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("tok").alias("toks"),
        F.sum("ch").alias("chs"),
        F.min_by("tok", F.col(id_col)).alias("keep_tok"),
        F.min_by("ch", F.col(id_col)).alias("keep_ch"),
    )
    return groups.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).cast("bigint").alias("n_dup_groups"),
        F.sum("n").cast("bigint").alias("n_docs"),
        F.sum(F.col("n") - 1).cast("bigint").alias("n_docs_dropped"),
        F.sum(F.col("toks") - F.col("keep_tok")).cast("bigint").alias("n_tokens_dropped"),
        F.sum(F.col("chs") - F.col("keep_ch")).cast("bigint").alias("n_chars_dropped"),
    )


def squeeze_repeated_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """INTRA-document repetition cleanup: collapse runs of consecutive
    identical (trimmed) lines to their first occurrence — the scraped-page
    pathology :func:`line_dedup` cannot touch (line_dedup drops lines
    repeated ACROSS documents; a nav menu pasted 40 times inside ONE page
    is invisible to a corpus-level df census). RefinedWeb-style "repetitive
    content removal", restricted to the exactly-reproducible line form.

    Output: (id, n_lines, n_squeezed, cleaned_md5) — same row contract as
    line_dedup (total over input; NULL text reads as one empty line).

    Map-shaped at any scale: lines never leave their document, so the
    whole operator is array expressions over the split — no explode, no
    shuffle beyond whatever the input already has (plan: pure projection).
    A line is kept iff its trimmed form differs from the PREVIOUS line's
    (index fold over the split array).
    """
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")

    def _pack(ls: Column) -> Column:
        # ls is the LAMBDA-BOUND split array (the repo's no-CSE-across-
        # lambdas rule: referencing the raw split expr inside the per-index
        # lambdas would re-split the text once per index reference).
        # keep index i (1-based) iff trim(ls[i]) != trim(ls[i-1])
        keep_idx = F.filter(
            F.sequence(F.lit(1), F.size(ls)),
            lambda i: (i == F.lit(1))
            | (F.trim(F.element_at(ls, i)) != F.trim(F.element_at(ls, i - 1))),
        )
        kept = F.transform(keep_idx, lambda i: F.element_at(ls, i))
        return F.struct(F.size(ls).alias("n"), kept.alias("kept"))

    res = F.element_at(F.transform(F.array(lines), _pack), 1)
    return df.select(
        F.col(id_col),
        res["n"].alias("n_lines"),
        (res["n"] - F.size(res["kept"])).alias("n_squeezed"),
        F.md5(F.concat_ws("\n", res["kept"])).alias("cleaned_md5"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    n: int = 50,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "none",
    max_doc_starts: int | None = None,
) -> DataFrame:
    """Exact-substring span REMOVAL (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — the ExactSubstr rule):
    every token covered by an ``n``-token window whose exact content
    occurs >= ``min_df`` times in the corpus is cut out of the document;
    the survivors reassemble in order. The q68/q28 fingerprint family
    FLAGS shared verbatim runs; this operator performs the repair — the
    form the paper shows beats document-level dedup for LM training.
    (The paper's suffix array is a single-machine structure; the
    distributed equivalent is this rolling window-hash census — same
    decision rule for fixed n, expressed as joins/aggregations.)

    Shape at scale: one map pass builds per-document positional window
    hashes (md5 let-bound once per window, winnowing's idiom), ONE
    shuffle counts window-hash occurrences (partial-agg; the census keeps
    only hashes with count >= min_df, i.e. actual duplicates), one
    semi-join marks each document's hot window STARTS, and the rewrite is
    a per-document array fold. The token-coverage test is exists() over
    the doc's own hot starts — O(T x H_doc) per document, with H_doc <= T
    and text-sized rows, never corpus-sized state on any node. Documents
    shorter than ``n`` tokens have no windows and pass through unchanged
    (substring dedup has no evidence against them).

    Output (scalar columns only): (id, n_tokens, n_kept, text_dedup) —
    text reassembled with single spaces, the canonical form of the
    whitespace tokenizer this engine uses everywhere.

    ``keep`` selects the removal policy for duplicated material:

    - ``"none"`` (default, the rule this operator shipped with): EVERY
      occurrence of a hot window is cut — including the last one, so a
      span duplicated anywhere vanishes from the whole corpus.
    - ``"one"``: Lee et al.'s §4.1 keep-one rule applied PER WINDOW-HASH
      — for each hot window hash, all but the minimum-(id, pos)
      occurrence are cut (deterministic, layout-invariant); the
      exemption is one extra hash-keyed argmin aggregate + equi-join on
      the hot occurrences — still no pair materialization, still
      census-sized state. When a duplicated run's windows all have the
      same occurrence multiset (the plain A==B syndication case), the
      consistent (id, pos) order elects one document for every window,
      so the surviving copy is contiguous. The guarantee is
      per-window-hash, NOT per-run (r8 advisor): when a run PARTIALLY
      overlaps a third document, adjacent hot hashes can elect winners
      in different documents — content then survives split across
      exemptions — and a non-exempt hot window overlapping an exempt
      one's span still cuts the tokens it covers, so in corner cases no
      single intact copy remains (the python-model differential test
      pins exactly these semantics). Electing per maximal duplicated
      run would need run-merging across documents (a
      connected-components pass over overlapping occurrences) — out of
      scope for the census shape.

    ``max_doc_starts`` (optional) bounds the per-document hot-start array:
    a document whose hot-start count exceeds the cap short-circuits to
    n_kept=0 / empty text (with ``keep="one"`` the cap counts post-
    exemption starts, so a surviving unique copy is never clipped). At
    worst-case duplication (~everything hot) the uncapped array is
    token-count-sized per row; the cap keeps executor row width bounded
    at the price of over-cutting pathological rows — a doc with more hot
    starts than the cap is near-wholly duplicated material anyway. Off by
    default; the q106 oracle pins the uncapped rule.
    """
    if keep not in ("none", "one"):
        raise ValueError(f"keep must be 'none' or 'one', got {keep!r}")
    toks = tokens(F.col(text_col))

    def _wins(tk: Column) -> Column:
        cnt = F.size(tk)
        n_w = cnt - F.lit(n - 1)
        seq = F.sequence(F.lit(1), n_w)
        grams = F.transform(seq, lambda i: F.md5(F.concat_ws(" ", F.slice(tk, i, n))))
        # sequence(1, 0) would count BACKWARDS ([1, 0]) — guard short docs
        return F.when(n_w >= 1, grams).otherwise(F.array().cast("array<string>"))

    base = df.select(
        F.col(id_col),
        toks.alias("_tk"),
        F.element_at(F.transform(F.array(toks), _wins), 1).alias("_ws"),
    ).localCheckpoint(eager=False)  # census + rewrite both read it

    w = base.select(F.col(id_col), F.posexplode("_ws").alias("pos", "h"))
    census = (
        w.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_df)
        .select("h")
    )
    hot = w.join(census, "h", "left_semi")
    if keep == "one":
        # per hot hash, the minimum (id, pos) occurrence is exempt from
        # removal — min(struct) is a partial-aggregable argmin; the join
        # back is h-keyed like the census, so no new shuffle key appears
        winners = hot.groupBy("h").agg(
            F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias(
                "_w"
            )
        )
        hot = (
            hot.join(winners, "h")
            .filter(
                (F.col(id_col) != F.col("_w.i")) | (F.col("pos") != F.col("_w.p"))
            )
            .drop("_w")
        )
    starts = hot.groupBy(id_col).agg(
        F.array_sort(F.collect_list("pos")).alias("_ss")
    )

    joined = base.join(starts, id_col, "left").select(
        F.col(id_col),
        F.col("_tk"),
        F.coalesce("_ss", F.array().cast("array<int>")).alias("_ss"),
    )
    if max_doc_starts is not None:
        # bounded row width: above the cap the doc is near-wholly
        # duplicated — short-circuit the fold input to empty instead of
        # carrying a token-count-sized start array through the O(T x H)
        # coverage test (n_tokens still reports the true length)
        over = F.size("_ss") > max_doc_starts
        joined = joined.withColumn(
            "_fold_tk",
            F.when(over, F.array().cast("array<string>")).otherwise(F.col("_tk")),
        ).withColumn(
            "_ss", F.when(over, F.array().cast("array<int>")).otherwise(F.col("_ss"))
        )
    else:
        joined = joined.withColumn("_fold_tk", F.col("_tk"))
    kept_arr = F.filter(
        F.col("_fold_tk"),
        lambda x, i: ~F.exists(
            F.col("_ss"), lambda s: (s <= i) & (i <= s + F.lit(n - 1))
        ),
    )
    return joined.select(
        F.col(id_col),
        F.size("_tk").cast("bigint").alias("n_tokens"),
        F.size(kept_arr).cast("bigint").alias("n_kept"),
        F.concat_ws(" ", kept_arr).alias("text_dedup"),
    )


def split_leakage_report(
    df: DataFrame,
    split_col: str = "split",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    train_split: str = "train",
    normalize: bool = False,
    broadcast_held_max: int = 2_000_000,
) -> DataFrame:
    """Cross-split contamination audit — run AFTER
    :func:`~jsonify2ai_spark.operators.sampling.assign_splits` (q113) and
    before shipping an eval set: for every NON-train document, does it
    share any word ``n``-gram with the TRAIN split? A near-duplicate that
    survived dedup and straddles the split boundary silently turns held-
    out metrics into memorization scores; this is :func:`decontaminate`'s
    rule pointed at the pipeline's own splits instead of an external
    benchmark.

    Broadcast direction is the REVERSE of decontaminate's (there the
    benchmark is tiny; here TRAIN is ~98% of the corpus): the held-out
    side's distinct (id, shingle) pairs broadcast into one map-only pass
    over the train shingles, then one per-held-doc count. But "a couple
    percent of the corpus" is still CORPUS-PROPORTIONAL — unlike
    decontaminate's genuinely fixed-size benchmark side — so the
    broadcast is GUARDED by the materialized pair count
    (``broadcast_held_max``, the SpanDedupGate ``broadcast_hot_max``
    treatment): at 100 TB with 1%+1% held out, the distinct held pairs
    run hundreds of GB (shingling explodes ~n-fold before distinct) and
    a forced ``F.broadcast`` hint would OOM the executors while
    overriding AQE's better judgment. Above the threshold the probe
    falls back to a plain shuffled equi-join on ``sh`` — both shingle
    sides hash-partition on the same key, and the held side stays the
    smaller input, so AQE picks the sane build side. Cost model either
    way: two shingle explodes + distincts (train-side dominated), one
    sh-keyed join bounded at |held distinct pairs|, one per-held-doc
    count. Output: (id, split, n_shared_ngrams, leaked) for every
    non-train document.

    ``normalize=True`` applies decontaminate's ASCII lower/collapse form
    on both sides (re-cased/re-punctuated leaks). The degenerate ''
    shingle is dropped on both sides (same guard, same reason).
    """
    from jsonify2ai_spark.functions.text import shingles

    def _prep(c: Column) -> Column:
        if not normalize:
            return c
        return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))

    held = df.filter(F.col(split_col) != train_split)
    # distinct BOTH sides before the join (review-found r8): a boilerplate
    # 8-gram occurring 100k times in train and quoted by 500 held docs
    # would otherwise produce 50M intermediate rows for that one shingle
    # before count_distinct collapses them — distinct bounds the join at
    # |held pairs| with identical output
    d = (
        held.select(
            F.col(id_col),
            F.explode(shingles(_prep(F.col(text_col)), n)).alias("sh"),
        )
        .filter(F.col("sh") != "")
        .distinct()
        # materialized once: the guard count below AND the join probe
        # both read this (the distinct already forces a shuffle; the
        # checkpoint stops the held-side explode re-running per action)
        .localCheckpoint(eager=False)
    )
    t = (
        df.filter(F.col(split_col) == train_split)
        .select(F.explode(shingles(_prep(F.col(text_col)), n)).alias("sh"))
        .filter(F.col("sh") != "")
        .distinct()
    )
    held_pairs = d.count()
    probe = F.broadcast(d) if held_pairs <= broadcast_held_max else d
    shared = (
        t.join(probe, "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )
    return held.select(id_col, split_col).join(shared, id_col, "left").select(
        F.col(id_col),
        F.col(split_col),
        F.coalesce("n_shared_ngrams", F.lit(0))
        .cast("bigint")
        .alias("n_shared_ngrams"),
        (F.coalesce("n_shared_ngrams", F.lit(0)) > 0).alias("leaked"),
    )


def semantic_decontaminate(
    df: DataFrame,
    benchmark_vectors: list[list[float]],
    threshold: float = 0.95,
    vector_col: str = "embedding",
    id_col: str = "doc_id",
    impl: str = "auto",
    round_to: int | None = 4,
) -> DataFrame:
    """EMBEDDING-space contamination audit (r9) — the paraphrase-shaped
    leak :func:`decontaminate`'s verbatim 8-gram rule cannot see: flag
    every document whose embedding's max cosine against the benchmark's
    embeddings reaches ``threshold``. Run both before shipping an eval
    set — n-grams catch copies, this catches reworded copies (to the
    extent the embedding space does).

    The benchmark side is genuinely benchmark-sized (the decontaminate
    contract, NOT q114's corpus-proportional held-out side), so it ships
    as a plain Python list and the scan is MAP-ONLY over the corpus —
    zero shuffles at any corpus size:

    - ``impl="expr"``: the B cosines as one Column via
      :func:`~jsonify2ai_spark.operators.ann.centroid_scores` (norms
      let-bound) — exactly engine-replayable, the DuckDB-oracle form;
      interpreted-eval cliff past B~16 (the ivf_assign lesson).
    - ``impl="arrow"``: one numpy GEMM per Arrow batch — the production
      form for real benchmark sizes (hundreds+ of vectors). Same
      max-cosine up to float summation order.
    - ``impl="auto"``: expr for B <= 16 else arrow.

    Output: (id, max_bench_cos, contaminated) for EVERY input row —
    audit and filter share the pass (callers drop ``contaminated``).
    ``round_to`` rounds the reported cosine for display/oracle
    stability; the FLAG always compares the unrounded value.
    """
    from jsonify2ai_spark.operators.ann import centroid_scores

    b = len(benchmark_vectors)
    if b == 0:
        raise ValueError("benchmark_vectors is empty")
    if impl == "auto":
        impl = "expr" if b <= 16 else "arrow"
    if impl == "expr":
        sims = centroid_scores(F.col(vector_col), benchmark_vectors)
        best = F.array_max(F.filter(sims, lambda s: s.isNotNull()))
    elif impl == "arrow":
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        bench = np.asarray(benchmark_vectors, dtype=np.float64)  # (B, dim)
        bnorms = np.sqrt((bench * bench).sum(axis=1))  # (B,)

        dim = bench.shape[1]

        def _max_cos(vs):
            # NULL / wrong-dim rows stay NaN (→ SQL NULL), matching the
            # expr impl's NULL-propagation instead of crashing the stack
            out = np.full(len(vs), np.nan)
            rows, idxs = [], []
            for i, v in enumerate(vs):
                if v is None:
                    continue
                a = np.asarray(v, dtype=np.float64)
                if a.ndim == 1 and a.shape[0] == dim:
                    rows.append(a)
                    idxs.append(i)
            if rows:
                m = np.stack(rows)
                dots = m @ bench.T  # (N, B) — BLAS GEMM per Arrow batch
                vnorms = np.sqrt((m * m).sum(axis=1))
                denom = np.outer(vnorms, bnorms)
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = np.where(denom != 0, dots / denom, np.nan)
                    out[idxs] = np.nanmax(sims, axis=1)
            return pd.Series(out)

        _mc = pandas_udf(_max_cos, "double")
        best = _mc(F.col(vector_col).cast("array<double>"))
    else:
        raise ValueError(f"unknown impl: {impl!r}")
    shown = F.round(best, round_to) if round_to is not None else best
    # a zero-norm vector has no defined cosine against anything: NULL
    # max_bench_cos, contaminated=false (no evidence against the doc —
    # the family's short-doc convention)
    return df.select(
        F.col(id_col),
        shown.alias("max_bench_cos"),
        F.coalesce(
            best >= F.lit(float(threshold)), F.lit(False)
        ).alias("contaminated"),
    )


def memorization_probe(
    candidates: DataFrame,
    corpus: DataFrame,
    n: int = 8,
    corpus_text_col: str = "text",
    cand_text_col: str = "text",
    cand_id_col: str = "cand_id",
) -> DataFrame:
    """Verbatim-memorization probe of candidate texts (model generations,
    eval outputs) against a training corpus — the k-gram form of the
    Carlini et al. extraction methodology: a candidate span that appears
    word-for-word in the corpus is evidence of memorization, and the
    LENGTH of the longest such span is the severity. Per candidate:
    how many of its word ``n``-grams occur verbatim ANYWHERE in the
    corpus (``n_hits`` / ``hit_rate``), and the longest contiguous run
    of overlapped grams converted back to words
    (``longest_span_tokens`` = max_run + n - 1 — the longest verbatim
    substring at n-gram resolution). The inverse direction of
    :func:`decontaminate` (which protects eval sets FROM the corpus;
    this audits what came OUT of a model trained on it).

    Shape at scale: corpus grams reduce to a DISTINCT 60-bit md5 gram
    hash set (the shingle-hash idiom — engine-portable, so the DuckDB
    oracle replays collisions too); candidates posexplode to positioned
    gram hashes; one hash-keyed left join marks hits (corpus side
    distinct — never row-multiplying); runs fold with the gaps-and-
    islands window per candidate (candidate-sized partitions). No
    all-pairs anything; the join is the same decontamination shape the
    q60/q95 rows pin. Candidates shorter than ``n`` words carry zero
    grams and report rate 0.0 — a one-word verbatim copy is below the
    probe's resolution by construction.
    """
    from pyspark.sql import Window

    if n < 2:
        raise ValueError(f"n must be >= 2: {n}")

    def _pos_grams(df, text_col, keep):
        based = df.select(*keep, tokens(F.col(text_col)).alias("_tk"))
        m = F.size("_tk") - F.lit(n - 1)
        # sequence(1, m) DESCENDS when m < 1 — guard to an empty gram list
        idx = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(
            F.array().cast("array<int>")
        )
        ghs = F.transform(
            idx,
            lambda i: _shingle_hash(F.concat_ws(" ", F.slice("_tk", i, n))),
        )
        return based.select(
            *keep, F.posexplode(ghs).alias("pos", "gh")
        )

    cg = (
        _pos_grams(corpus, corpus_text_col, [])
        .select("gh")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    grams = _pos_grams(candidates, cand_text_col, [cand_id_col])
    hits = grams.join(cg, "gh", "left").localCheckpoint(eager=False)

    agg = hits.groupBy(cand_id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("n_hits"),
    )
    w = Window.partitionBy(cand_id_col).orderBy("pos")
    runs = (
        hits.filter(F.col("_hit") == 1)
        .withColumn("_isl", F.col("pos") - F.row_number().over(w))
        .groupBy(cand_id_col, "_isl")
        .agg(F.count(F.lit(1)).alias("_run"))
        .groupBy(cand_id_col)
        .agg(F.max("_run").cast("bigint").alias("_max_run"))
    )
    base = candidates.select(cand_id_col).distinct()
    out = base.join(agg, cand_id_col, "left").join(runs, cand_id_col, "left")
    n_grams = F.coalesce("n_grams", F.lit(0)).cast("bigint")
    n_hits = F.coalesce("n_hits", F.lit(0)).cast("bigint")
    max_run = F.coalesce("_max_run", F.lit(0)).cast("bigint")
    return out.select(
        F.col(cand_id_col),
        n_grams.alias("n_grams"),
        n_hits.alias("n_hits"),
        (
            F.when(n_grams > 0, F.round(n_hits / n_grams, 4)).otherwise(
                F.lit(0.0)
            )
            + F.lit(0.0)
        ).alias("hit_rate"),
        F.when(max_run > 0, max_run + F.lit(n - 1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("longest_span_tokens"),
    )


def decontaminate_multi(
    docs: DataFrame,
    benchmarks: dict[str, DataFrame],
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    normalize: bool = False,
) -> DataFrame:
    """Decontamination against MANY benchmarks in one corpus pass — the
    shape a release pipeline actually runs (a model card lists overlap
    against every eval suite, not one): the training side shingles ONCE,
    every benchmark's distinct shingle set is tagged with its name and
    unioned into a single broadcast, and one join + one (doc, benchmark)
    rollup yields the full contamination matrix. Per-benchmark passes
    would re-scan the corpus len(benchmarks) times; this is invariant in
    the benchmark count.

    Returns the SPARSE long form: ``(id, benchmark, n_shared_ngrams)``,
    one row per (document, benchmark) pair with at least one shared
    ``n``-gram — at 100 TB the dense matrix is corpus x suites and
    almost entirely zero, so the hit rows are the only sane
    materialization. Same shingle construction, empty-shingle guard, and
    optional GPT-3/PaLM normalization as :func:`decontaminate` (scores
    exact, benchmark side broadcast).
    """
    def _prep(c: Column) -> Column:
        if not normalize:
            return c
        return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))

    d = docs.select(
        F.col(id_col), F.explode(shingles(_prep(F.col(text_col)), n)).alias("sh")
    ).filter(F.col("sh") != "")
    tagged = None
    for name in sorted(benchmarks):
        b = (
            benchmarks[name]
            .select(
                F.lit(name).alias("benchmark"),
                F.explode(
                    shingles(_prep(F.col(bench_text_col)), n)
                ).alias("sh"),
            )
            .filter(F.col("sh") != "")
            .distinct()
        )
        tagged = b if tagged is None else tagged.unionByName(b)
    if tagged is None:
        raise ValueError("benchmarks must be a non-empty dict")
    return (
        d.join(F.broadcast(tagged), "sh")
        .groupBy(id_col, "benchmark")
        .agg(F.count_distinct("sh").cast("bigint").alias("n_shared_ngrams"))
    )


def decontamination_report(
    docs: DataFrame,
    benchmarks: dict[str, DataFrame],
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    normalize: bool = False,
) -> DataFrame:
    """The model-card rollup of :func:`decontaminate_multi`: per
    benchmark, how many training documents are contaminated and what
    corpus fraction that is — ``(benchmark, n_contaminated,
    pct_contaminated)`` (6dp). Suites-count-sized output; the corpus
    total attaches as a one-row broadcast."""
    hits = decontaminate_multi(
        docs, benchmarks, n, id_col, text_col, bench_text_col, normalize
    )
    total = docs.agg(F.count(F.lit(1)).cast("double").alias("_total"))
    # every suite gets a row — a CLEAN benchmark's n_contaminated=0 line
    # is the headline a model card needs, and the hits frame is sparse
    suites = local_rows_df(
        docs.sparkSession, [(name,) for name in sorted(benchmarks)],
        "benchmark string",
    )
    rollup = hits.groupBy("benchmark").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_contaminated")
    )
    return (
        suites.join(rollup, "benchmark", "left")
        .withColumn(
            "n_contaminated",
            F.coalesce("n_contaminated", F.lit(0)).cast("bigint"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "benchmark",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("_total"), 6).alias(
                "pct_contaminated"
            ),
        )
    )


def soft_dedup_weights(
    df: DataFrame,
    beta: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """SoftDeDup-style commonness reweighting (He et al. 2024): instead
    of DROPPING near-duplicate content, down-weight it in the sampling /
    loss schedule — per document, ``commonness`` = geometric mean of its
    distinct shingles' corpus document frequency (4dp), and ``weight``
    proportional to commonness^-beta, normalized to MEAN 1 over the
    weighted docs (6dp) so plugging the column into the existing mixture
    machinery leaves total token mass unchanged. A unique document
    weighs ~max; boilerplate that appears in a thousand docs weighs
    ~1000^-beta of that. The hard-dedup operators remove copies; this
    keeps them but stops them dominating the gradient.

    Shape: the q15/q17 shingle explode (distinct per doc by
    construction), one shingle-keyed df rollup, one join back, one
    per-doc mean — all partial-aggregated; the normalizing mean attaches
    as a one-row broadcast. Weight derives from the ROUNDED commonness,
    and BOTH means (the per-doc log mean and the normalizing mean) use
    the exact-decimal _stable_avg accumulator — F.avg's float
    reassociation at a round boundary is the r5 q89 driver flake, and a
    plain avg here would put it inside the 4dp/6dp outputs. Documents
    with no shingles (empty text) carry NULL commonness/weight — they
    have no content to weigh; filter or coalesce downstream.
    """
    from jsonify2ai_spark.operators.inventory import _stable_avg

    ex = (
        df.select(
            F.col(id_col),
            F.explode(shingles(F.col(text_col), shingle_n)).alias("sh"),
        )
        .filter(F.col("sh") != "")
        # consumed twice (df rollup + the join back) — checkpoint or the
        # tokenize/explode runs once per consumer
        .localCheckpoint(eager=False)
    )
    dfreq = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("dfq"))
    per_doc = (
        ex.join(dfreq, "sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.round(F.exp(_stable_avg(F.log("dfq"))), 4).alias("commonness"),
        )
        .withColumn("_raw", F.pow(F.col("commonness"), F.lit(-float(beta))))
        # consumed twice (normalizing mean + the join) — checkpoint the
        # subtree or the explode/df rollup runs once per consumer
        .localCheckpoint(eager=False)
    )
    m = per_doc.agg(_stable_avg(F.col("_raw")).alias("_mraw"))
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .crossJoin(F.broadcast(m))
        .select(
            F.col(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("bigint").alias("n_shingles"),
            "commonness",
            F.round(F.col("_raw") / F.col("_mraw"), 6).alias("weight"),
        )
    )


class ClusterStore:
    """Persisted near-dup cluster mapping with O(delta) incremental
    maintenance (r15) — the clustering analog of the serving stores'
    segment protocol (textsearch.ShardedBM25Index, ann.IVFIndex), and
    the scale answer to "q62/q154 recompute connected components from
    scratch per call": at 100 TB the closure recompute per append is
    corpus-sized, but a delta's edges only ever touch delta-many
    components, so the merge is delta-sized by construction.

    Reference anchor: the watcher's incremental re-ingest loop
    (scripts/dev/tools/watch_dropzone.py:190-229) — new/changed files
    are reconciled against the existing corpus without re-ingesting it;
    this store is that contract applied to duplicate clustering.

    On disk::

        nodes/            (node, rep0) base mapping, partitionBy(bucket)
        nodes_incr/<id>/  per-merge NEW nodes, same layout
        remap_v<k>/       (src_rep, dst_rep) overlay — path-compressed:
                          dst is ALWAYS the current canonical rep
        meta/             one-row commit point (the IVFIndex convention)

    The read face (:meth:`reps`) is ``union(parts) left-join broadcast
    remap`` — one corpus-wide map-side pass, no shuffle. The overlay is
    merge-sized, not corpus-sized: it holds one row per SUPERSEDED rep
    (a rep stops being canonical at most once per merge that touches
    it), and :meth:`compact` folds it into the base. ``bucket =
    pmod(xxhash64(node), n_buckets)`` partitions the mapping so a
    delta's membership probe prunes to the delta's buckets instead of
    scanning the corpus — the IVFIndex cluster-prune idiom applied to
    a key-value mapping.

    Merge math (:meth:`merge_delta`): map each delta endpoint through
    the current mapping (unknown nodes map to themselves), CONTRACT the
    delta to (rep_a, rep_b) edges, run :func:`connected_components` on
    that delta-sized graph, then (a) superseded old reps become overlay
    entries pointing at the merged component's min label, (b) new nodes
    land as a segment with their canonical rep. Because every stored
    rep0 is the min of its component at write time and min() is
    associative, incremental reps equal a full recompute on the union
    of all edge sets — the q136/q152 split-invariance contract, pinned
    by the q157 oracle row and the pytest parity suite.
    """

    def __init__(self) -> None:
        raise TypeError("use ClusterStore.build(...) or ClusterStore.load(...)")

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def build(
        cls,
        pairs: DataFrame,
        path: str,
        a_col: str = "a",
        b_col: str = "b",
        n_buckets: int = 64,
    ) -> "ClusterStore":
        """One batch job: full connected-components over ``pairs`` ->
        bucket-partitioned (node, rep0) mapping + meta."""
        spark = pairs.sparkSession
        if pairs.isEmpty():
            # empty-store fast path (r15): NearDupStore.create builds an
            # empty embedded ClusterStore on every store creation — the
            # CC machinery's checkpoint + count + collect actions are
            # ~4 driver jobs spent labeling nothing
            a_t = pairs.schema[a_col].dataType.simpleString()
            staged = local_rows_df(
                spark, [], f"node {a_t}, rep0 {a_t}, bucket int"
            )
            _store_partitioned_write(
                staged, f"{path}/nodes", ["bucket"], ["node"], n_rows=0
            )
            cls._write_meta(spark, path, n_buckets, "nodes", (), "")
            return cls.load(spark, path)
        labels = connected_components(pairs, a_col=a_col, b_col=b_col)
        staged = labels.select(
            F.col("node"),
            F.col("cluster_rep").alias("rep0"),
            F.pmod(F.xxhash64("node"), F.lit(n_buckets)).cast("int").alias("bucket"),
        )
        _store_partitioned_write(staged, f"{path}/nodes", ["bucket"], ["node"])
        cls._write_meta(spark, path, n_buckets, "nodes", (), "")
        return cls.load(spark, path)

    @staticmethod
    def _write_meta(
        spark, path, n_buckets, nodes_dir, segments, remap_dir,
        tombs_dir="",
    ) -> None:
        """The one-row commit point: segment visibility, overlay swaps,
        dir swaps, and node-tombstone visibility happen HERE or not at
        all."""
        local_rows_df(
            spark,
            [
                (
                    int(n_buckets), nodes_dir, ",".join(segments),
                    remap_dir, tombs_dir,
                )
            ],
            "n_buckets int, nodes_dir string, segments string, "
            "remap_dir string, tombs_dir string",
        ).write.mode("overwrite").parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "ClusterStore":
        meta = spark.read.parquet(f"{path}/meta").first().asDict()
        obj = cls.__new__(cls)
        obj._spark = spark
        obj._path = path
        obj._n_buckets = int(meta["n_buckets"])
        obj._nodes_dir = meta.get("nodes_dir") or "nodes"
        obj._segments = [s for s in (meta.get("segments") or "").split(",") if s]
        obj._remap_dir = meta.get("remap_dir") or ""
        obj._parts = [spark.read.parquet(f"{path}/{obj._nodes_dir}")] + [
            spark.read.parquet(f"{path}/nodes_incr/{rid}")
            for rid in obj._segments
        ]
        obj._remap = (
            spark.read.parquet(f"{path}/{obj._remap_dir}")
            if obj._remap_dir
            else None
        )
        obj._tombs_dir = meta.get("tombs_dir") or ""
        obj._tombs = (
            spark.read.parquet(f"{path}/{obj._tombs_dir}")
            if obj._tombs_dir
            else None
        )
        return obj

    # -- read faces ----------------------------------------------------------

    def _stored(self) -> DataFrame:
        """Union of the visible parts. Tombstones are GENERATION-tagged:
        a tomb (_tn, tgen) written when the store had ``tgen`` parts
        masks that node's rows in parts 0..tgen-1 ONLY — a node re-added
        by a LATER merge (re-ingest after an RTBF purge) lands in a
        segment with a higher ordinal and stays visible. One broadcast
        hash anti-join, map-side; compact() folds the tombs away."""
        if self._tombs is None:
            df = self._parts[0]
            for p in self._parts[1:]:
                df = df.unionByName(p)
            return df
        tagged = [
            p.withColumn("_pord", F.lit(i)) for i, p in enumerate(self._parts)
        ]
        df = tagged[0]
        for p in tagged[1:]:
            df = df.unionByName(p)
        return df.join(
            F.broadcast(self._tombs),
            (df["node"] == F.col("_tn")) & (df["_pord"] < F.col("tgen")),
            "left_anti",
        ).drop("_pord")

    def reps(self) -> DataFrame:
        """(node, cluster_rep) for every clustered node — stored rep0
        mapped through the broadcast overlay (merge-sized by the
        path-compression invariant; compact() folds it away)."""
        df = self._stored()
        if self._remap is None:
            return df.select("node", F.col("rep0").alias("cluster_rep"))
        return (
            df.join(
                F.broadcast(self._remap),
                df["rep0"] == F.col("src_rep"),
                "left",
            )
            .select(
                "node",
                F.coalesce(F.col("dst_rep"), F.col("rep0")).alias("cluster_rep"),
            )
        )

    def reps_of(
        self, nodes: DataFrame, node_col: str = "node", _buckets=None
    ) -> DataFrame:
        """Membership probe for a DELTA-sized node set: bucket-pruned
        scan of the mapping (partition filter on the delta's buckets —
        never a full-corpus scan), then the overlay map. Returns
        (node, cluster_rep) for the nodes that ARE in the store.
        ``_buckets`` (private): the caller already collected the node
        set's bucket values in an earlier job — skip the collect."""
        want = nodes.select(F.col(node_col).alias("node")).distinct()
        bs = _buckets if _buckets is not None else [
            r["b"]
            for r in want.select(
                F.pmod(F.xxhash64("node"), F.lit(self._n_buckets))
                .cast("int")
                .alias("b")
            )
            .distinct()
            .collect()  # bounded: <= n_buckets rows by construction
        ]
        df = self._stored().filter(F.col("bucket").isin(bs))
        hit = df.join(F.broadcast(want), "node", "inner")
        if self._remap is None:
            return hit.select("node", F.col("rep0").alias("cluster_rep"))
        return (
            hit.join(
                F.broadcast(self._remap),
                hit["rep0"] == F.col("src_rep"),
                "left",
            )
            .select(
                "node",
                F.coalesce(F.col("dst_rep"), F.col("rep0")).alias("cluster_rep"),
            )
        )

    # -- the delete face (RTBF / K4) -----------------------------------------

    def delete_nodes(
        self,
        deleted: DataFrame,
        repaired: "DataFrame | None" = None,
        run_id: str = "del",
        node_col: str = "node",
    ) -> "ClusterStore":
        """Remove ``deleted`` nodes from the mapping in O(delta) — the
        q137/q155 tombstone discipline applied to the clustering store.

        The store keeps no edges, so it cannot itself decide how a
        component REPAIRS after losing a node (a deleted bridge SPLITS
        its component; a deleted rep forces a relabel) — the caller owns
        that closure math and passes ``repaired`` = (node, cluster_rep)
        for every surviving member of every touched component that still
        has an edge (:meth:`NearDupStore.delete_docs` derives it exactly
        from the persisted band table). Survivors absent from
        ``repaired`` are dropped from the mapping too — they became
        edge-less singletons, which the mapping never stores (the
        connected-components convention, and what keeps this equal to a
        fresh closure over the surviving edge set).

        Mechanics: generation-tagged tombstones mask the old rows of
        deleted nodes AND repaired survivors in every CURRENT part; the
        repaired labels land as a new segment (higher ordinal, so they
        are visible); overlay entries pointing at a touched component's
        rep are dropped (all that component's visible rows now carry
        direct canonical labels — and without the drop, a repaired rep
        that was itself superseded pre-delete would be remapped to a
        purged label). Everything is sized by the touched components;
        the one-row meta commit makes it atomic. Redelivery of a
        committed ``run_id`` is a no-op — and the run_id NAMESPACE is
        shared with :meth:`merge_delta` (the repair lands as a segment),
        so reusing a merge's id silently skips the delete: key deletes
        distinctly (NearDupStreamSink uses ``b<id>-del`` vs ``b<id>``)."""
        if str(run_id) in self._segments:
            return self
        dead = (
            deleted.select(F.col(node_col).alias("node"))
            .filter(F.col("node").isNotNull())
            .distinct()
            .localCheckpoint(eager=False)
        )
        # one job: materialize the checkpoint, count it, and collect the
        # dead nodes' mapping buckets for the (conditional) overlay probe
        _drow = dead.agg(
            F.count(F.lit(1)).alias("n"),
            F.collect_set(
                F.pmod(F.xxhash64("node"), F.lit(self._n_buckets))
                .cast("int")
            ).alias("bs"),
        ).collect()[0]
        if _drow["n"] == 0:
            return self
        rep_rows = (
            repaired.select(
                F.col("node"),
                F.col("cluster_rep").alias("rep0"),
                F.pmod(F.xxhash64("node"), F.lit(self._n_buckets))
                .cast("int")
                .alias("bucket"),
            ).localCheckpoint(eager=False)
            if repaired is not None
            else None
        )
        tgen = len(self._parts)
        tombs_new = dead
        if rep_rows is not None:
            tombs_new = tombs_new.union(rep_rows.select("node")).distinct()
        tombs_new = tombs_new.select(
            F.col("node").alias("_tn"), F.lit(tgen).cast("int").alias("tgen")
        )
        composed = (
            self._tombs.unionByName(tombs_new)
            if self._tombs is not None
            else tombs_new
        )
        tv = (
            int(self._tombs_dir.rsplit("_v", 1)[1]) + 1
            if self._tombs_dir
            else 1
        )
        new_tombs_rel = f"node_tombs_v{tv}"
        segments = tuple(self._segments)
        # rep_rows materializes here (count on the lazy checkpoint = one
        # job) so both writer threads below read the checkpoint, not the
        # upstream lineage
        n_rep = rep_rows.count() if rep_rows is not None else 0
        writes = [
            lambda: composed.coalesce(1).write.mode("overwrite").parquet(
                f"{self._path}/{new_tombs_rel}"
            )
        ]
        if n_rep > 0:
            writes.append(
                lambda: _store_partitioned_write(
                    rep_rows, f"{self._path}/nodes_incr/{run_id}",
                    ["bucket"], ["node"], n_rows=n_rep,
                )
            )
            segments = segments + (str(run_id),)
        # overlay cleanup: path compression guarantees every entry of a
        # touched component has dst_rep == that component's current rep.
        # touched_reps (the components' CURRENT reps — bucket-pruned,
        # delta-sized) is only needed here, and it reads the PRE-delete
        # mapping view (self's frames; the tombstones land in a NEW dir
        # and are invisible to `self` by construction)
        new_remap_rel = self._remap_dir
        if self._remap is not None:
            touched_reps = (
                self.reps_of(dead, _buckets=sorted(_drow["bs"]))
                .select(F.col("cluster_rep").alias("_tr"))
                .distinct()
            )
            kept = self._remap.join(
                F.broadcast(touched_reps),
                self._remap["dst_rep"] == F.col("_tr"),
                "left_anti",
            ).localCheckpoint(eager=False)
            # one job: kept count + total overlay count (was three driver
            # actions — eager checkpoint + two counts)
            _oc = {
                r["t"]: r["n"]
                for r in kept.select(F.lit(0).alias("t"))
                .unionAll(self._remap.select(F.lit(1).alias("t")))
                .groupBy("t")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            if _oc.get(0, 0) < _oc.get(1, 0):
                v = int(self._remap_dir.rsplit("_v", 1)[1]) + 1
                new_remap_rel = f"remap_v{v}"
                writes.append(
                    lambda: kept.coalesce(1).write.mode("overwrite").parquet(
                        f"{self._path}/{new_remap_rel}"
                    )
                )
        # tombstones + repair segment + trimmed overlay land concurrently
        # (§2.6); visibility is the meta write below, exactly as before
        _run_writes(writes)
        self._write_meta(
            self._spark, self._path, self._n_buckets, self._nodes_dir,
            segments, new_remap_rel, new_tombs_rel,
        )
        import shutil

        for old_rel in (
            self._tombs_dir,
            self._remap_dir if new_remap_rel != self._remap_dir else "",
        ):
            if old_rel:
                shutil.rmtree(
                    f"{self._path}/{old_rel}", ignore_errors=True
                )
        # post-commit handle built directly from the committed state
        obj = type(self).__new__(type(self))
        obj._spark, obj._path = self._spark, self._path
        obj._n_buckets, obj._nodes_dir = self._n_buckets, self._nodes_dir
        obj._segments = [s for s in segments]
        obj._parts = list(self._parts)
        if n_rep > 0:
            obj._parts.append(
                self._spark.read.parquet(f"{self._path}/nodes_incr/{run_id}")
            )
        obj._remap_dir = new_remap_rel
        obj._remap = (
            self._spark.read.parquet(f"{self._path}/{new_remap_rel}")
            if new_remap_rel != self._remap_dir
            else self._remap
        )
        obj._tombs_dir = new_tombs_rel
        obj._tombs = self._spark.read.parquet(f"{self._path}/{new_tombs_rel}")
        return obj

    # -- the incremental merge ----------------------------------------------

    def merge_delta(
        self,
        pairs: DataFrame,
        run_id: str,
        a_col: str = "a",
        b_col: str = "b",
        replace: bool = False,
        _prepared_n: int | None = None,
        _endpoint_buckets=None,
    ) -> "ClusterStore":
        """Merge a delta's near-dup edges into the persisted clustering
        in O(delta): the only corpus-shaped IO is the bucket-PRUNED
        membership probe; everything else — contraction, the
        connected-components run, the overlay compose, the segment
        write — is sized by the delta and the components it touches.

        Same run_id contract as the serving stores: a pre-commit crash
        heals by re-running the id; a committed id raises unless
        ``replace=True`` (the store keeps no corpus scalars, so
        re-landing a segment is idempotent given the SAME delta).

        ``_prepared_n`` (private, NearDupStore.add_batch): the caller
        already normalized the delta — (a, b) columns, non-null,
        distinct, localCheckpointed — and knows its count; skip the
        redundant normalize + checkpoint + count driver actions here
        (r16 §5 driver-chain cut; the caller's derivation is exactly
        the removed normalization, so the merged rows are identical)."""
        if str(run_id) in self._segments and not replace:
            raise ValueError(
                f"merge_delta: segment {run_id!r} is already committed — "
                "re-merging would double its edges (pass replace=True only "
                "for deliberate same-delta redelivery)"
            )
        if _prepared_n is None:
            delta = (
                pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
                .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
                .distinct()
                # consumed by 3+ branches below; the count materializes it
                # (lazy checkpoint + count = ONE job, not two)
                .localCheckpoint(eager=False)
            )
            n_delta = delta.count()
        else:
            delta, n_delta = pairs, int(_prepared_n)
        if n_delta == 0:
            return self
        # Driver-sized fast path (r16): a delta under the SAME gate as
        # connected_components' phase-0 union-find gets contracted,
        # labeled, and split into segment/overlay rows entirely on the
        # driver — the distributed path below would collect the same
        # magnitude of edges inside CC anyway, but only after paying
        # ~6 plan-heavy delta-sized jobs (endpoints/known checkpoints,
        # CC gate count, the combined seg/remap count). Here the only
        # cluster-store reads are the bucket-pruned membership probe
        # (one collect) plus the commit writes. Identical labels by the
        # same argument as the CC gate (union-find with min-label =
        # the distributed algorithm's fixpoint); parity is test-pinned
        # against the distributed path. SPARK_GRAFT_CLUSTER_DRIVER_MERGE
        # overrides the row gate (0 forces the distributed path).
        drv_max = int(
            os.environ.get("SPARK_GRAFT_CLUSTER_DRIVER_MERGE", "100000")
        )
        if n_delta <= drv_max:
            return self._merge_delta_driver(delta, run_id, _endpoint_buckets)
        endpoints = (
            delta.select(F.col("a").alias("node"))
            .union(delta.select(F.col("b").alias("node")))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # delta-sized; lazy — materializes inside the first consuming job
        # (the CC gate count via `contracted`) and is reused by the three
        # later branches (old_reps / new_nodes / seg)
        known = self.reps_of(
            endpoints, _buckets=_endpoint_buckets
        ).localCheckpoint(eager=False)
        # contract: endpoint -> its current rep; unknown nodes are their
        # own rep (they join the graph as themselves)
        ka = known.select(F.col("node").alias("a"), F.col("cluster_rep").alias("ra"))
        kb = known.select(F.col("node").alias("b"), F.col("cluster_rep").alias("rb"))
        contracted = (
            delta.join(F.broadcast(ka), "a", "left")
            .join(F.broadcast(kb), "b", "left")
            .select(
                F.coalesce(F.col("ra"), F.col("a")).alias("a"),
                F.coalesce(F.col("rb"), F.col("b")).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # delta-sized CC: nodes are touched reps + new nodes only. Lazy
        # checkpoint: both consumers (remap_new + seg) materialize in the
        # ONE combined count job below
        merged = connected_components(contracted).localCheckpoint(eager=False)
        old_reps = known.select(F.col("cluster_rep").alias("node")).distinct()
        # (a) superseded reps -> overlay entries (path-compressed: dst is
        # the NEW canonical label, by CC's min-label construction)
        remap_new = (
            merged.join(F.broadcast(old_reps), "node", "left_semi")
            .filter(F.col("node") != F.col("cluster_rep"))
            .select(
                F.col("node").alias("src_rep"),
                F.col("cluster_rep").alias("dst_rep"),
            )
        )
        # (b) new nodes -> segment rows with their canonical rep. Every
        # new node with a real (non-self) edge survives contraction —
        # its mapped edge (node, rep_x) cannot collapse since the node
        # is not a store member — so its merged label is already the
        # post-merge canonical rep. A self-loop-only node falls back to
        # itself, exactly what a full CC over the union would emit.
        new_nodes = endpoints.join(F.broadcast(known.select("node")), "node", "left_anti")
        seg = (
            new_nodes.join(merged, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("cluster_rep"), F.col("node")).alias("rep0"),
                F.pmod(F.xxhash64("node"), F.lit(self._n_buckets)).cast("int").alias("bucket"),
            )
            .localCheckpoint(eager=False)
        )
        remap_new = remap_new.localCheckpoint(eager=False)
        # ONE job materializes BOTH checkpoints and returns both counts
        # (r16 §5: was 4 driver actions — two eager checkpoints + two
        # counts; the tagged-union count is one)
        _cnt = {
            r["t"]: r["n"]
            for r in seg.select(F.lit(0).alias("t"))
            .unionAll(remap_new.select(F.lit(1).alias("t")))
            .groupBy("t")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_seg, n_remap = _cnt.get(0, 0), _cnt.get(1, 0)
        return self._commit_merge(run_id, seg, n_seg, remap_new, n_remap)

    def _merge_delta_driver(
        self, delta: DataFrame, run_id: str, ebuckets=None
    ) -> "ClusterStore":
        """merge_delta's driver-sized path: collect the (bounded) delta,
        probe the store ONCE for the endpoints' current reps
        (bucket-pruned, the only corpus-shaped read), then contraction +
        min-label union-find + overlay/segment derivation in Python —
        exactly :func:`_cc_union_find_driver`'s algorithm applied to the
        contracted graph, so the labels equal the distributed path's by
        the same argument. Two driver actions before the commit writes."""
        rows = delta.collect()  # bounded by the caller's row gate
        nodes = set()
        for r in rows:
            nodes.add(r["a"])
            nodes.add(r["b"])
        node_t = delta.schema["a"].dataType
        want = local_rows_df(
            self._spark,
            [(n,) for n in sorted(nodes)],
            T.StructType([T.StructField("node", node_t)]),
        )
        known = {
            r["node"]: r["cluster_rep"]
            for r in self.reps_of(want, _buckets=ebuckets).collect()
        }
        # contract each edge through the current mapping (unknown nodes
        # are their own rep), then union-find with min-label reps — the
        # merged component label, as in _cc_union_find_driver
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in rows:
            a = known.get(row["a"], row["a"])
            b = known.get(row["b"], row["b"])
            if a == b:
                continue
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        reps_min: dict = {}
        for n in parent:
            r = find(n)
            if r not in reps_min or n < reps_min[r]:
                reps_min[r] = n
        merged = {n: reps_min[find(n)] for n in parent}
        # (a) superseded reps -> overlay entries (dst = new canonical)
        remap_rows = [
            (x, merged[x])
            for x in sorted(set(known.values()))
            if x in merged and merged[x] != x
        ]
        # (b) new nodes -> segment rows with their canonical rep (a
        # self-loop-only node is absent from `merged` and keeps itself)
        seg_rows = [
            (n, merged.get(n, n)) for n in sorted(nodes) if n not in known
        ]
        n_seg, n_remap = len(seg_rows), len(remap_rows)
        seg = remap_new = None
        if n_seg:
            seg = local_rows_df(
                self._spark, seg_rows,
                T.StructType(
                    [T.StructField("node", node_t), T.StructField("rep0", node_t)]
                ),
            ).withColumn(
                "bucket",
                F.pmod(F.xxhash64("node"), F.lit(self._n_buckets)).cast("int"),
            )
        if n_remap:
            remap_new = local_rows_df(
                self._spark, remap_rows,
                T.StructType(
                    [
                        T.StructField("src_rep", node_t),
                        T.StructField("dst_rep", node_t),
                    ]
                ),
            )
        return self._commit_merge(run_id, seg, n_seg, remap_new, n_remap)

    def _commit_merge(
        self, run_id, seg, n_seg: int, remap_new, n_remap: int
    ) -> "ClusterStore":
        """Shared commit tail of :meth:`merge_delta` (distributed and
        driver-sized paths): segment + composed-overlay writes land
        concurrently, the one-row meta write makes them visible, and
        the post-commit handle is built directly from the committed
        state. ``seg`` is a (node, rep0, bucket) frame, ``remap_new``
        a (src_rep, dst_rep) frame; both may be unused when their
        count is 0."""
        if n_seg == 0 and n_remap == 0:
            # the delta's every edge already lies inside one existing
            # component: re-merging edges is idempotent by the math, so
            # there is NOTHING to commit — no segment, no overlay, no
            # run_id (this is also what makes replace=True redelivery of
            # an already-merged delta a clean no-op instead of landing
            # an empty, unreadable segment dir)
            return self
        segments = tuple(self._segments)
        if n_seg > 0 and str(run_id) in segments:
            # replace=True redelivery of the SAME delta lands in the
            # no-op branch above (its nodes are already known). Reaching
            # here means the "replayed" delta carries nodes the committed
            # segment does not — overwriting that dir would drop the
            # previously landed rows. That is not redelivery; merge the
            # new content under its own id.
            raise ValueError(
                f"merge_delta: replayed segment {run_id!r} carries "
                f"{n_seg} node(s) the committed segment lacks — this is "
                "new content, not redelivery; use a fresh run_id"
            )
        writes = []
        if n_seg > 0:
            writes.append(
                lambda: _store_partitioned_write(
                    seg, f"{self._path}/nodes_incr/{run_id}",
                    ["bucket"], ["node"], n_rows=n_seg,
                )
            )
            if str(run_id) not in segments:
                segments = segments + (str(run_id),)
        # compose the overlay: existing entries whose dst was superseded
        # follow it (src uniqueness holds — a remap_new src is canonical
        # PRE-merge, so it cannot already be an overlay src). Untouched
        # when this merge superseded nothing (bridge-free delta).
        new_remap_rel = self._remap_dir
        if n_remap > 0:
            if self._remap is not None:
                composed = (
                    self._remap.alias("o")
                    .join(
                        F.broadcast(remap_new.alias("n")),
                        F.col("o.dst_rep") == F.col("n.src_rep"),
                        "left",
                    )
                    .select(
                        F.col("o.src_rep").alias("src_rep"),
                        F.coalesce(F.col("n.dst_rep"), F.col("o.dst_rep")).alias("dst_rep"),
                    )
                    .unionByName(remap_new)
                )
            else:
                composed = remap_new
            v = (
                int(self._remap_dir.rsplit("_v", 1)[1]) + 1
                if self._remap_dir
                else 1
            )
            new_remap_rel = f"remap_v{v}"
            writes.append(
                lambda: composed.coalesce(1).write.mode("overwrite").parquet(
                    f"{self._path}/{new_remap_rel}"
                )
            )
        # segment + overlay land CONCURRENTLY (guide §2.6: independent
        # jobs from driver threads back-fill each other's task tails) —
        # neither is visible until the meta commit that FOLLOWS both, so
        # the single-writer crash-consistency contract is unchanged
        _run_writes(writes)
        self._write_meta(
            self._spark, self._path, self._n_buckets, self._nodes_dir,
            segments, new_remap_rel, self._tombs_dir,
        )
        # old overlay dir removed best-effort after the commit
        if n_remap > 0 and self._remap_dir:
            import shutil

            shutil.rmtree(f"{self._path}/{self._remap_dir}", ignore_errors=True)
        # post-commit handle built directly from what was just committed —
        # a full load() would re-read the meta (a driver action) and
        # re-open every part; only the NEW segment/overlay need opening
        obj = type(self).__new__(type(self))
        obj._spark, obj._path = self._spark, self._path
        obj._n_buckets, obj._nodes_dir = self._n_buckets, self._nodes_dir
        obj._segments = [s for s in segments]
        obj._parts = list(self._parts)
        if n_seg > 0:
            obj._parts.append(
                self._spark.read.parquet(f"{self._path}/nodes_incr/{run_id}")
            )
        obj._remap_dir = new_remap_rel
        obj._remap = (
            self._spark.read.parquet(f"{self._path}/{new_remap_rel}")
            if n_remap > 0
            else self._remap
        )
        obj._tombs_dir, obj._tombs = self._tombs_dir, self._tombs
        return obj

    def compact(self) -> "ClusterStore":
        """Fold segments + overlay + tombstones into ``nodes_v<k>/`` —
        small-files / overlay-size maintenance, results unchanged
        (stage-and-swap through the meta, the IVFIndex discipline)."""
        if not self._segments and self._remap is None and self._tombs is None:
            return self
        import shutil

        v = (
            int(self._nodes_dir.rsplit("_v", 1)[1]) + 1
            if "_v" in self._nodes_dir
            else 1
        )
        new_rel = f"nodes_v{v}"
        folded = self.reps().select(
            "node",
            F.col("cluster_rep").alias("rep0"),
            F.pmod(F.xxhash64("node"), F.lit(self._n_buckets)).cast("int").alias("bucket"),
        )
        _store_partitioned_write(
            folded, f"{self._path}/{new_rel}", ["bucket"], ["node"]
        )
        old = [f"{self._path}/{self._nodes_dir}"] + [
            f"{self._path}/nodes_incr/{rid}" for rid in self._segments
        ]
        if self._remap_dir:
            old.append(f"{self._path}/{self._remap_dir}")
        if self._tombs_dir:
            old.append(f"{self._path}/{self._tombs_dir}")
        self._write_meta(
            self._spark, self._path, self._n_buckets, new_rel, (), ""
        )
        for d in old:
            shutil.rmtree(d, ignore_errors=True)
        return type(self).load(self._spark, self._path)


class NearDupStore:
    """Persisted end-to-end incremental near-dup pipeline (r15): a band
    table for O(batch) candidate generation + a :class:`ClusterStore`
    for O(delta) cluster maintenance, behind one ``add_batch`` call —
    the composition a streaming ingest loop actually needs (reference
    anchor: the watcher's incremental re-ingest reconciliation,
    scripts/dev/tools/watch_dropzone.py:190-229, which re-checks only
    the files that changed).

    On disk::

        bands/             (id, band, bucket) of every ingested doc,
                           partitionBy(band, bpfx) — bpfx = the bucket's
                           first md5 hex char (16 cells/band — 256 dirs
                           per write, the small-files/pruning trade at
                           bench scale; widen the prefix for a corpus
                           whose band cells outgrow one executor), so a batch's probe
                           join prunes to its own (band, prefix) cells
                           instead of scanning the corpus band table
        bands_incr/<id>/   per-batch increments, same layout
        clusters/          the embedded ClusterStore
        meta/              banding config (frozen) + segment commits

    ``add_batch`` computes the batch's band keys ONCE, derives the
    delta's edges as (within-batch bucket collisions) ∪ (batch-vs-store
    bucket joins against the PRUNED band table), merges them into the
    clustering, then commits the batch's bands as a segment. Because
    LSH banding is per-document, the union of every batch's edge sets
    equals :func:`minhash_lsh_pairs` over the full corpus — so the
    incremental clustering equals the all-at-once q51 pipeline exactly
    (oracle row q159; the banding config is frozen in the meta because
    that equivalence needs identical band keys forever).

    Redelivery: band commits and cluster merges are separately
    idempotent (a committed band segment is skipped; the cluster merge
    re-lands the same delta as a no-op), and the commit order — bands
    AFTER the cluster merge would lose the crash-heal property, so
    bands commit FIRST and a replayed batch derives the same edges with
    the batch already in the table (batch-vs-self collisions reproduce
    the within-batch pairs)."""

    def __init__(self) -> None:
        raise TypeError("use NearDupStore.create(...) or NearDupStore.load(...)")

    @classmethod
    def create(
        cls,
        spark,
        path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_hashes: int = 64,
        bands: int = 16,
        shingle_n: int = 3,
        n_buckets: int = 64,
    ) -> "NearDupStore":
        """An EMPTY store: banding config frozen into the meta; every
        document arrives through :meth:`add_batch`."""
        empty_bands = local_rows_df(
            spark, [], f"{id_col} long, band int, bucket string"
        )
        # the empty band table and the empty embedded ClusterStore are
        # independent sub-commits — land them concurrently (§2.6); the
        # store only becomes loadable through the meta write that follows
        _run_writes([
            lambda: cls._write_bands(
                empty_bands, f"{path}/bands", id_col, n_rows=0
            ),
            lambda: ClusterStore.build(
                local_rows_df(spark, [], "a long, b long"),
                f"{path}/clusters", n_buckets=n_buckets,
            ),
        ])
        cls._write_meta(
            spark, path, text_col, id_col, num_hashes, bands, shingle_n,
            "bands", (),
        )
        return cls.load(spark, path)

    @staticmethod
    def _write_bands(
        banded: DataFrame, dest: str, id_col: str, n_rows: int | None = None
    ) -> None:
        staged = banded.select(
            F.col(id_col), F.col("band"),
            F.substring("bucket", 1, 1).alias("bpfx"), F.col("bucket"),
        )
        _store_partitioned_write(
            staged, dest, ["band", "bpfx"], [id_col], n_rows=n_rows
        )

    @staticmethod
    def _write_meta(
        spark, path, text_col, id_col, num_hashes, bands, shingle_n,
        bands_dir, segments, btombs_dir="", dsegments=(),
    ) -> None:
        local_rows_df(
            spark,
            [
                (
                    text_col, id_col, int(num_hashes), int(bands),
                    int(shingle_n), bands_dir, ",".join(segments),
                    btombs_dir, ",".join(dsegments),
                )
            ],
            "text_col string, id_col string, num_hashes int, bands int, "
            "shingle_n int, bands_dir string, segments string, "
            "btombs_dir string, dsegments string",
        ).write.mode("overwrite").parquet(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "NearDupStore":
        meta = spark.read.parquet(f"{path}/meta").first().asDict()
        obj = cls.__new__(cls)
        obj._spark = spark
        obj._path = path
        obj._text_col = meta["text_col"]
        obj._id_col = meta["id_col"]
        obj._num_hashes = int(meta["num_hashes"])
        obj._bands = int(meta["bands"])
        obj._shingle_n = int(meta["shingle_n"])
        obj._bands_dir = meta.get("bands_dir") or "bands"
        obj._segments = [s for s in (meta.get("segments") or "").split(",") if s]
        obj._band_parts = [spark.read.parquet(f"{path}/{obj._bands_dir}")] + [
            spark.read.parquet(f"{path}/bands_incr/{rid}")
            for rid in obj._segments
        ]
        obj._btombs_dir = meta.get("btombs_dir") or ""
        obj._btombs = (
            spark.read.parquet(f"{path}/{obj._btombs_dir}")
            if obj._btombs_dir
            else None
        )
        obj._dsegments = [
            s for s in (meta.get("dsegments") or "").split(",") if s
        ]
        obj._clusters = ClusterStore.load(spark, f"{path}/clusters")
        return obj

    def _band_table(self) -> DataFrame:
        """Visible band rows. Tombstones are generation-tagged exactly
        like ClusterStore._stored's: a purged doc's bands are masked in
        the parts that existed when it was purged, while a LATER
        re-ingest of the same doc id (a fresh band segment, higher
        ordinal) stays visible. Broadcast anti-join, map-side."""
        if self._btombs is None:
            df = self._band_parts[0]
            for p in self._band_parts[1:]:
                df = df.unionByName(p)
            return df
        tagged = [
            p.withColumn("_pord", F.lit(i))
            for i, p in enumerate(self._band_parts)
        ]
        df = tagged[0]
        for p in tagged[1:]:
            df = df.unionByName(p)
        return df.join(
            F.broadcast(self._btombs),
            (df[self._id_col] == F.col("_td")) & (df["_pord"] < F.col("tgen")),
            "left_anti",
        ).drop("_pord")

    def reps(self) -> DataFrame:
        """(node, cluster_rep) — the maintained clustering (nodes that
        ever collided; singletons are implicit, the CC convention)."""
        return self._clusters.reps()

    def _batch_cells_and_count(self, batch_banded: DataFrame):
        """ONE job over the checkpointed banded batch: its row count
        (materializes the checkpoint) plus its distinct (band, bucket-
        prefix) cells — bounded at bands x 16 values by construction.
        The old shape paid a count job AND a distinct-collect job."""
        row = batch_banded.agg(
            F.count(F.lit(1)).alias("n"),
            F.collect_set(
                F.struct(
                    F.col("band").alias("b"),
                    F.substring("bucket", 1, 1).alias("p"),
                )
            ).alias("cells"),
        ).collect()[0]
        return int(row["n"]), [(c["b"], c["p"]) for c in row["cells"]]

    def _batch_edges(self, batch_banded: DataFrame, cells) -> DataFrame:
        """The batch's candidate-edge delta against THIS store view:
        ONE broadcast equi-join of the batch's (band, bucket) keys
        against (pruned band table ∪ the batch itself) — the union
        makes the within-batch bucket collisions (the minhash_lsh_pairs
        expansion) fall out of the same join that produces the
        batch-vs-store pairs, replacing the r15 shape's separate
        groupBy/collect_list/double-explode branch (one aggregate
        shuffle fewer; identical pair set: batch⋈batch collisions ARE
        the within-batch pairs after least/greatest + distinct, and
        self-pairs are filtered). The table side is PRUNED to the
        batch's (band, bucket-prefix) partition RECTANGLE — two plain
        isin filters on the partition columns (a concatenated key would
        not prune); the rectangle over-covers some (band, prefix)
        cells, which the equi-join then discards. Output is normalized
        for merge_delta's prepared path: (a, b) with a < b, non-null,
        distinct."""
        idc = self._id_col
        tbl = self._band_table().filter(
            F.col("band").isin(sorted({b for b, _ in cells}))
            & F.col("bpfx").isin(sorted({p for _, p in cells}))
        )
        both = tbl.select(idc, "band", "bucket").unionByName(
            batch_banded.select(idc, "band", "bucket")
        )
        probe = batch_banded.select(
            F.col(idc).alias("_nid"), "band", "bucket"
        )
        return (
            both.join(F.broadcast(probe), ["band", "bucket"])
            .filter(F.col(idc) != F.col("_nid"))
            .select(
                F.least(F.col(idc), F.col("_nid")).alias("a"),
                F.greatest(F.col(idc), F.col("_nid")).alias("b"),
            )
            .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
            .distinct()
        )

    def _prepared_delta(self, batch_banded: DataFrame, cells):
        """Checkpoint the batch's edge delta and, in the SAME job,
        count it and collect its endpoints' mapping buckets (bounded:
        <= n_buckets values) — everything merge_delta's prepared path
        needs, one driver action instead of three (count, then
        reps_of's separate bucket collect)."""
        delta = self._batch_edges(batch_banded, cells).localCheckpoint(
            eager=False
        )
        nb = self._clusters._n_buckets
        row = delta.agg(
            F.count(F.lit(1)).alias("n"),
            F.collect_set(
                F.pmod(F.xxhash64("a"), F.lit(nb)).cast("int")
            ).alias("ba"),
            F.collect_set(
                F.pmod(F.xxhash64("b"), F.lit(nb)).cast("int")
            ).alias("bb"),
        ).collect()[0]
        return delta, int(row["n"]), sorted(set(row["ba"]) | set(row["bb"]))

    def add_batch(self, docs: DataFrame, run_id: str) -> "NearDupStore":
        """Ingest one batch: O(batch * bands) band keys, candidate
        edges from (a) within-batch bucket collisions and (b) the
        batch's buckets probed against the band table — a join PRUNED
        to the batch's (band, bucket-prefix) partitions, so its cost
        follows the batch, not the corpus — then ONE O(delta) cluster
        merge. Bands commit first; both halves are redelivery-safe
        (see the class docstring for the crash-window argument).

        r16 driver-chain cut: the edge derivation runs CONCURRENTLY
        with the band-segment + meta commit (§2.6 — the probe is pure
        compute, the commit pure IO; commit ORDER is untouched). The
        probe reads the PRE-commit table view, which derives the same
        delta: the new segment holds exactly the batch's own rows, so
        probing it would only re-produce the within-batch pairs that
        branch (a) already contributes (self-pairs are filtered, and
        the union is distinct). The redelivery path still probes the
        committed table — there the batch IS in the table, and
        batch-vs-self collisions reproduce the within-batch pairs."""
        idc = self._id_col
        if str(run_id) in self._segments:
            # redelivery: bands already committed — self's view already
            # contains the segment (the invariant _band_parts mirrors
            # _segments), so the probe reproduces the same edge set
            batch_banded = _lsh_banded(
                docs, self._text_col, idc,
                self._num_hashes, self._bands, self._shingle_n,
            ).localCheckpoint(eager=False)
            n_banded, cells = self._batch_cells_and_count(batch_banded)
            if n_banded == 0:
                return self
            delta, n_delta, ebuckets = self._prepared_delta(
                batch_banded, cells
            )
            clusters = self._clusters.merge_delta(
                delta, run_id, replace=True, _prepared_n=n_delta,
                _endpoint_buckets=ebuckets,
            )
            out = type(self).__new__(type(self))
            out.__dict__.update(self.__dict__)
            out._clusters = clusters
            return out
        batch_banded = _lsh_banded(
            docs, self._text_col, idc,
            self._num_hashes, self._bands, self._shingle_n,
        ).localCheckpoint(eager=False)  # consumed by the write AND two joins
        # one job: materialize the checkpoint, count it, collect its cells
        n_banded, cells = self._batch_cells_and_count(batch_banded)
        if n_banded == 0:
            return self

        def _commit_bands():
            # ordered: segment BEFORE the meta that makes it visible
            self._write_bands(
                batch_banded, f"{self._path}/bands_incr/{run_id}", idc,
                n_rows=n_banded,
            )
            self._write_meta(
                self._spark, self._path, self._text_col, idc,
                self._num_hashes, self._bands, self._shingle_n,
                self._bands_dir, tuple(self._segments) + (str(run_id),),
                self._btombs_dir, dsegments=tuple(self._dsegments),
            )

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(_commit_bands)
            # the probe compute, overlapped with the commit IO
            delta, n_delta, ebuckets = self._prepared_delta(
                batch_banded, cells
            )
            fut.result()
        # post-commit handle built directly from the committed state (a
        # load() would re-read two metas and re-open every part)
        store = type(self).__new__(type(self))
        store.__dict__.update(self.__dict__)
        store._segments = list(self._segments) + [str(run_id)]
        store._band_parts = list(self._band_parts) + [
            self._spark.read.parquet(f"{self._path}/bands_incr/{run_id}")
        ]
        clusters = store._clusters.merge_delta(
            delta, run_id, replace=True, _prepared_n=n_delta,
            _endpoint_buckets=ebuckets,
        )
        out = type(store).__new__(type(store))
        out.__dict__.update(store.__dict__)
        out._clusters = clusters
        return out

    def delete_docs(self, ids: DataFrame, run_id: str) -> "NearDupStore":
        """RTBF purge (K4) for the near-dup pipeline — the q137/q155
        tombstone-delete applied to BOTH halves of the store, with EXACT
        cluster repair: the band table persists every surviving edge, so
        the store re-derives the closure of the touched components from
        the surviving band collisions — splits included, which no
        rep-relabel shortcut can express (delete a bridge doc and its
        component must fall apart).

        Cost model: the touched-component membership pass and the
        survivor band-row pass are each ONE map-side broadcast-semi scan
        (no shuffle) of the mapping / band table; the collision
        expansion, the connected-components rerun, and every write are
        sized by the touched components — O(delta) against the corpus.

        Commit order: band tombstones land FIRST (their meta row is the
        atomic point — a purged doc stops generating candidate edges
        even if the process dies mid-repair), then the cluster repair
        commits through ClusterStore.delete_nodes' own meta. A replay of
        the same ``run_id`` after a mid-window crash recomputes the same
        repair from the already-masked band table; after a full commit
        it's a no-op. Post-purge: the doc's band rows and mapping rows
        are invisible, survivors' clusters equal a fresh closure over
        the surviving pair set (the q160 oracle), and a later re-ingest
        of the same doc id through add_batch is a clean re-admission
        (generation-tagged tombstones only mask the OLD parts).

        The committed-``run_id`` ledger (``dsegments``, recorded in a
        final meta write AFTER the repair commits) is what makes the
        full-commit no-op exact: without it, a replay arriving after a
        delete-then-re-add of the same doc id would purge the re-added
        doc — the tombstone generation at replay time is higher than
        the re-add segment's ordinal."""
        idc = self._id_col
        if str(run_id) in self._dsegments:
            return self
        dead = (
            ids.select(F.col(idc).alias("node"))
            .filter(F.col("node").isNotNull())
            .distinct()
            .localCheckpoint(eager=False)
        )
        # one job: materialize the checkpoint, count it, collect the
        # dead docs' mapping buckets for the membership probe below
        _drow = dead.agg(
            F.count(F.lit(1)).alias("n"),
            F.collect_set(
                F.pmod(
                    F.xxhash64("node"), F.lit(self._clusters._n_buckets)
                ).cast("int")
            ).alias("bs"),
        ).collect()[0]
        if _drow["n"] == 0:
            return self
        # touched components + their full membership — read from the
        # PRE-delete view (self's frames; the tombstones land in a new,
        # not-yet-visible dir). reps_of is bucket-pruned (delta-sized
        # IO); the membership pass is one broadcast-semi map-side scan;
        # ONE eager checkpoint materializes the whole chain (touched and
        # members are single-consumer intermediates — r16 job-folding)
        touched = (
            self._clusters.reps_of(dead, _buckets=sorted(_drow["bs"]))
            .select(F.col("cluster_rep").alias("_tr"))
            .distinct()
        )
        reps_all = self._clusters.reps()
        members = reps_all.join(
            F.broadcast(touched),
            reps_all["cluster_rep"] == F.col("_tr"),
            "left_semi",
        ).select("node")
        survivors = members.join(
            F.broadcast(dead), "node", "left_anti"
        ).localCheckpoint()
        # -- band tombstones commit first, CONCURRENT with the repair ----
        # closure compute (§2.6). Equivalent to computing the repair from
        # the post-commit masked table: the new tombstones mask exactly
        # the `dead` rows, which the survivors semi-join below already
        # excludes (survivors ∩ dead = ∅ by construction), and older
        # tombstones are already masked in self's view.
        tgen = len(self._band_parts)
        tomb_new = dead.select(
            F.col("node").alias("_td"), F.lit(tgen).cast("int").alias("tgen")
        )
        composed = (
            self._btombs.unionByName(tomb_new)
            if self._btombs is not None
            else tomb_new
        )
        tv = (
            int(self._btombs_dir.rsplit("_v", 1)[1]) + 1
            if self._btombs_dir
            else 1
        )
        new_btombs_rel = f"band_tombs_v{tv}"

        def _commit_tombs():
            # ordered: tombstone file BEFORE the meta that makes it
            # visible — their meta row is the atomic point
            composed.coalesce(1).write.mode("overwrite").parquet(
                f"{self._path}/{new_btombs_rel}"
            )
            self._write_meta(
                self._spark, self._path, self._text_col, idc,
                self._num_hashes, self._bands, self._shingle_n,
                self._bands_dir, tuple(self._segments), new_btombs_rel,
                dsegments=tuple(self._dsegments),
            )

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(_commit_tombs)
            # -- exact repair: closure over the SURVIVING edges ----------
            # Every LSH edge incident to a touched component stays inside
            # it (an edge to an outside node would have merged the
            # components at ingest time), so the survivors' band rows
            # carry the complete surviving edge set of every touched
            # component.
            surv_bands = self._band_table().join(
                F.broadcast(survivors),
                F.col(idc) == F.col("node"),
                "left_semi",
            )
            edges = (
                surv_bands.groupBy("band", "bucket")
                .agg(F.collect_list(idc).alias("ids"))
                .filter(F.size("ids") > 1)
                .select(F.explode("ids").alias("a"), "ids")
                .select("a", F.explode("ids").alias("b"))
                .filter(F.col("a") < F.col("b"))
                .distinct()
            )
            # EAGER: must materialize while the old tombstone dir (read
            # via self._band_table()) still exists — the rmtree below
            # waits for both this and the commit
            repaired = connected_components(edges).localCheckpoint()
            fut.result()
        if self._btombs_dir:
            import shutil

            shutil.rmtree(
                f"{self._path}/{self._btombs_dir}", ignore_errors=True
            )
        # survivors that lost their every edge leave the mapping — they
        # are singletons now, which the mapping never stores
        edgeless = survivors.join(
            repaired.select("node"), "node", "left_anti"
        )
        clusters = self._clusters.delete_nodes(
            dead.union(edgeless).distinct(), repaired, run_id
        )
        # the run_id ledger commits LAST: a crash anywhere above leaves
        # the id unrecorded and the replay re-derives the same repair
        # from the already-masked band table
        self._write_meta(
            self._spark, self._path, self._text_col, idc,
            self._num_hashes, self._bands, self._shingle_n,
            self._bands_dir, tuple(self._segments), new_btombs_rel,
            dsegments=tuple(self._dsegments) + (str(run_id),),
        )
        # post-commit handle built directly from the committed state
        out = type(self).__new__(type(self))
        out.__dict__.update(self.__dict__)
        out._btombs_dir = new_btombs_rel
        out._btombs = self._spark.read.parquet(
            f"{self._path}/{new_btombs_rel}"
        )
        out._dsegments = list(self._dsegments) + [str(run_id)]
        out._clusters = clusters
        return out

    def compact(self) -> "NearDupStore":
        """Fold band segments + tombstones into ``bands_v<k>/`` and
        compact the embedded ClusterStore — small-files maintenance
        only."""
        if self._segments or self._btombs is not None:
            v = (
                int(self._bands_dir.rsplit("_v", 1)[1]) + 1
                if "_v" in self._bands_dir
                else 1
            )
            new_rel = f"bands_v{v}"
            folded = self._band_table().select(
                self._id_col, "band", "bpfx", "bucket"
            )
            _store_partitioned_write(
                folded, f"{self._path}/{new_rel}",
                ["band", "bpfx"], [self._id_col],
            )
            old = [f"{self._path}/{self._bands_dir}"] + [
                f"{self._path}/bands_incr/{rid}" for rid in self._segments
            ]
            if self._btombs_dir:
                old.append(f"{self._path}/{self._btombs_dir}")
            self._write_meta(
                self._spark, self._path, self._text_col, self._id_col,
                self._num_hashes, self._bands, self._shingle_n, new_rel, (),
                dsegments=tuple(self._dsegments),
            )
            import shutil

            for d in old:
                shutil.rmtree(d, ignore_errors=True)
        self._clusters.compact()
        return type(self).load(self._spark, self._path)


class NearDupStreamSink:
    """foreachBatch target that keeps a :class:`NearDupStore` CURRENT as
    a change stream of documents arrives (r15) — the FULL watcher
    reconciliation loop at store scale (reference anchor:
    scripts/dev/tools/watch_dropzone.py:190-229, which re-ingests new
    and CHANGED files and reconciles deletions): a new doc is an
    ``add_batch`` row, a removed doc a ``delete_docs`` row, and a
    changed doc is delete + re-add in the same trigger — which the
    generation-tagged tombstones make a clean re-admission (the old
    bands/mapping rows stay masked, the new ones land in a fresh
    segment).

    ``op_col`` names an optional operation column: rows with the value
    ``"delete"`` purge (only the id column is read), everything else
    upserts; without it every row is an upsert. Deletes run FIRST
    within a trigger so a changed doc's re-add lands after its purge.

    Redelivery-safe end-to-end: both halves key their commits on the
    batch id (``b<id>-del`` / ``b<id>``), ``delete_docs`` of an
    already-purged id is a no-op by the math, and a replayed
    ``add_batch`` re-derives the same edges against the already-
    committed band segment. Run :meth:`NearDupStore.compact` on the
    store's own cadence — per-trigger band segments and accumulated
    tombstones are small-files pressure, exactly the IVFStreamSink
    guidance."""

    def __init__(self, path: str, op_col: str | None = None) -> None:
        self._path = path
        self._op_col = op_col

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        store = NearDupStore.load(batch_df.sparkSession, self._path)
        bid = int(batch_id)
        ups = batch_df
        if self._op_col is not None:
            dels = batch_df.filter(F.col(self._op_col) == "delete")
            ups = batch_df.filter(
                F.coalesce(F.col(self._op_col), F.lit("")) != "delete"
            )
            store = store.delete_docs(
                dels.select(store._id_col), f"b{bid}-del"
            )
        store.add_batch(ups, f"b{bid}")
