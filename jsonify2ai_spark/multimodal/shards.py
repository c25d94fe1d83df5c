"""Media feature shards: the multimodal trainer path (r11 verdict #5).

The text side has a full produce/append/stream/load shard lifecycle
(pipelines.py: corpus_to_token_shards -> append_token_shards ->
read_token_shards, manifest.json + _increment.json discipline). The
multimodal columns stopped at QA/top-k — image features existed
(columns.py extract_media_features: dev hash-embedding or the real CLIP
tower) but nothing carried them into trainer-loadable shards. This
module closes that seam with the SAME manifest discipline, so image
embeddings ride the same produce/append/load loop the token shards do
(reference analog: the images collection the reference serves,
worker/app/config.py:36-38 — it upserts image vectors into a second
Qdrant collection; this is that idea carried through to training
shards instead of a serving index).

Layout (identical discipline, media content):

    <out_dir>/manifest.json              atomic, self-describing config
    <out_dir>/shards/media_group=N/      base run, md5(id)%n_groups
    <out_dir>/shards_incr/<run_id>/      appends, _increment.json sidecar

Interleaved-media rows: ``payload_cols`` carries any extra columns into
the shards alongside ``features`` — e.g. caption ``token_ids`` from a
TokenizeGate pass — so one shard row is a complete interleaved training
sample (image embedding + caption ids). The append face freezes
``payload_cols`` (with dim / dev_mode / model_name / n_groups) in the
manifest so increments can never silently diverge from the base shape.

Scale shape: featurize is one Arrow mapInPandas pass (columns.py), the
group assignment is a map-side md5 expression, and the write is one
repartition on the group key + an in-partition sort — no shuffle beyond
the grouping, no driver collect; undecodable-media drops (real mode
yields NULL features) are counted map-side into the manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonify2ai_spark.pipelines import (
    _read_sharded_store,
    _write_json_atomic,
)


def _media_group(id_col, n_groups: int):
    """Engine-portable id -> shard group (the sample_hash idiom)."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        % n_groups
    )


def _featurize(
    media: DataFrame,
    dim: int,
    dev_mode: bool,
    model_name: str,
    id_col: str,
    content_col: str,
    payload_cols: tuple,
) -> tuple[DataFrame, DataFrame]:
    """(kept rows with features, dropped-undecodable rows) — real mode
    yields NULL features for undecodable bytes (columns.py contract);
    those rows cannot train and are dropped COUNTED, never silently."""
    from jsonify2ai_spark.multimodal.columns import extract_media_features

    feats = extract_media_features(
        media.select(id_col, content_col, *payload_cols),
        content_col=content_col,
        dim=dim,
        dev_mode=dev_mode,
        model_name=model_name,
    ).drop(content_col)
    # two consumers (kept + dropped counts) of one Arrow featurize pass
    feats = feats.localCheckpoint(eager=False)
    return (
        feats.filter(F.col("features").isNotNull()),
        feats.filter(F.col("features").isNull()),
    )


def _write_media_part(
    kept: DataFrame, path: str, id_col: str, n_groups: int
) -> int:
    """Group-partitioned parquet, rows id-sorted within each group file;
    returns the row count (one count over the checkpointed frame)."""
    kept = kept.withColumn(
        "media_group", _media_group(F.col(id_col), n_groups)
    ).localCheckpoint(eager=False)
    (
        kept.repartition(F.col("media_group"))
        .sortWithinPartitions("media_group", id_col)
        .write.mode("overwrite")
        .partitionBy("media_group")
        .parquet(path)
    )
    return kept.count()


def media_to_feature_shards(
    media: DataFrame,
    out_dir: str,
    dim: int = 64,
    n_groups: int = 16,
    dev_mode: bool = True,
    model_name: str = "openai/clip-vit-base-patch32",
    payload_cols: tuple = (),
    id_col: str = "media_id",
    content_col: str = "content",
) -> dict:
    """Base run: media binary -> feature shards + manifest. Returns the
    manifest dict ({rows, groups, dim, dropped_undecodable, config})."""
    import os

    kept, dropped = _featurize(
        media, dim, dev_mode, model_name, id_col, content_col, tuple(payload_cols)
    )
    rows = _write_media_part(
        kept, os.path.join(out_dir, "shards"), id_col, n_groups
    )
    result = {
        "out_dir": out_dir,
        "rows": rows,
        "groups": n_groups,
        "dim": dim,
        "dropped_undecodable": dropped.count(),
        "config": {
            "dim": dim,
            "n_groups": n_groups,
            "dev_mode": dev_mode,
            "model_name": model_name,
            "payload_cols": list(payload_cols),
            "id_col": id_col,
            "content_col": content_col,
        },
    }
    os.makedirs(out_dir, exist_ok=True)
    _write_json_atomic(os.path.join(out_dir, "manifest.json"), result)
    return result


def append_media_shards(
    media: DataFrame, out_dir: str, run_id: str
) -> dict:
    """Incremental counterpart: featurize NEW media under the run's
    FROZEN config (dim / mode / model / groups / payload shape all come
    from manifest.json — an increment can never silently diverge) and
    land it as ``shards_incr/<run_id>/`` with the `_increment.json`
    sidecar-then-manifest-cache discipline of
    :func:`~jsonify2ai_spark.pipelines.append_token_shards` (its
    crash-window walk applies verbatim). Re-running a run_id overwrites
    it — idempotent re-ingest."""
    import json
    import os

    man_path = os.path.join(out_dir, "manifest.json")
    with open(man_path, encoding="utf-8") as fh:
        manifest = json.load(fh)
    cfg = manifest["config"]
    missing = [c for c in cfg["payload_cols"] if c not in media.columns]
    if missing:
        raise ValueError(
            f"append_media_shards: increment lacks the run's frozen "
            f"payload columns {missing} — the base shards carry them, "
            "so every increment must too"
        )
    if str(run_id) in manifest.get("compacted_runs", []):
        raise ValueError(
            f"append_media_shards: run_id {run_id!r} was already folded "
            "into the base by compact_media_shards — increments need "
            "fresh run_ids after a compaction"
        )
    kept, dropped = _featurize(
        media,
        int(cfg["dim"]),
        bool(cfg["dev_mode"]),
        cfg["model_name"],
        cfg["id_col"],
        cfg["content_col"],
        tuple(cfg["payload_cols"]),
    )
    sub = os.path.join(out_dir, "shards_incr", str(run_id))
    rows = _write_media_part(kept, sub, cfg["id_col"], int(cfg["n_groups"]))
    dropped_n = dropped.count()

    def _record(update) -> None:
        # read-modify-write against the CURRENT manifest (not the copy
        # loaded before featurization) under the store's single-writer
        # contract; _write_json_atomic fsyncs
        with open(man_path, encoding="utf-8") as fh:
            cur = json.load(fh)
        update(cur)
        _write_json_atomic(man_path, cur)

    # drops are keyed BY RUN and overwritten on a same-run_id replay —
    # exactly like the increments map — so an idempotent re-ingest can
    # never double-count them; the manifest's top-level
    # dropped_undecodable stays the BASE run's count and the store total
    # is base + sum(dropped_by_run.values()) (r12 advisor)
    if rows == 0:
        # idle trigger / all-undecodable batch: no increment-directory
        # litter, no increments entry (StreamShardSink's n==0 contract) —
        # but an all-undecodable batch's drops are still data loss and
        # must land in the ledger ("counted, never silently")
        import shutil

        shutil.rmtree(sub, ignore_errors=True)
        if dropped_n > 0:
            _record(
                lambda cur: cur.setdefault("dropped_by_run", {}).__setitem__(
                    str(run_id), dropped_n
                )
            )
        return {"run_id": str(run_id), "rows": 0, "out_dir": sub,
                "dropped_undecodable": dropped_n}
    _write_json_atomic(
        os.path.join(sub, "_increment.json"),
        {"run_id": str(run_id), "rows": rows},
    )

    def _apply(cur: dict) -> None:
        cur.setdefault("increments", {})[str(run_id)] = rows
        if dropped_n > 0 or str(run_id) in cur.get("dropped_by_run", {}):
            cur.setdefault("dropped_by_run", {})[str(run_id)] = dropped_n

    _record(_apply)
    return {"run_id": str(run_id), "rows": rows, "out_dir": sub,
            "dropped_undecodable": dropped_n}


def read_media_shards(
    spark,
    out_dir: str,
    include_increments: bool = True,
    validate: bool = False,
) -> DataFrame:
    """Load a media shard store for training: base + sidecar-listed
    increments, ``_source_run`` tags, optional per-part count validation
    — the exact :func:`~jsonify2ai_spark.pipelines.read_token_shards`
    contract over media rows (shared loader)."""
    return _read_sharded_store(
        spark, out_dir, include_increments, validate, "read_media_shards"
    )


class MediaShardSink:
    """foreachBatch adapter for a standing media ingest: each trigger's
    rows featurize and land as increment ``<prefix><batch_id>`` via
    :func:`append_media_shards` — whose same-run_id overwrite makes an
    at-least-once replay idempotent BY CONSTRUCTION (featurization is
    stateless and deterministic per byte content, so re-deriving the
    increment writes identical rows; no gate state to persist, unlike
    StreamShardSink's PackGate, whose open bins force a commit
    protocol). Idle triggers write nothing.

    Wiring: ``stream.writeStream.foreachBatch(sink)`` — the instance is
    the callable.
    """

    def __init__(self, out_dir: str, run_prefix: str = "m"):
        self._out_dir = out_dir
        self._prefix = run_prefix

    def __call__(self, batch: DataFrame, batch_id: int) -> dict:
        return append_media_shards(
            batch, self._out_dir, f"{self._prefix}{batch_id}"
        )


def read_media_shards_mixture(
    spark,
    stores: "dict[str, str]",
    weights: "dict[str, float]",
    budget_rows: int,
    salt: str = "mediamix-v1",
    include_increments: bool = True,
    validate: bool = False,
) -> DataFrame:
    """Weighted multi-store media blend — :func:`~jsonify2ai_spark.
    pipelines.read_token_shards_mixture`'s contract over media feature
    stores (the photos store, the diagrams store, the video-frames
    store), budgeted in ROWS (each row is one atomic training sample;
    there is no intra-row mass to weigh). Per store: keep fraction
    f_s = min(1, target_s / available_s) applied by the engine-portable
    md5 rule on (store alias, media id) — reproducible across
    engines/retries/cluster shapes, one map-side filter per store; the
    only extra jobs are the per-store row counts. Under-supplied stores
    contribute everything and the mix under-delivers rather than
    silently re-weighting. Stores must agree on columns (same dim +
    payload shape) or the blend raises — a trainer cannot consume
    mixed layouts.
    """
    from jsonify2ai_spark.operators.sampling import _BUCKETS, sample_hash

    total_w = sum(weights.get(a, 0.0) for a in stores)
    if total_w <= 0:
        raise ValueError("read_media_shards_mixture: no positive weights")

    from jsonify2ai_spark.pipelines import _balanced_union

    frames = []
    for alias, out_dir in stores.items():
        w = weights.get(alias, 0.0)
        if w <= 0:
            continue
        import json
        import os

        with open(os.path.join(out_dir, "manifest.json"), encoding="utf-8") as fh:
            id_col = json.load(fh)["config"]["id_col"]
        df = read_media_shards(
            spark, out_dir,
            include_increments=include_increments, validate=validate,
        )
        available = df.count()
        target = budget_rows * w / total_w
        frac = 1.0 if available <= target else target / available
        key = F.concat_ws("|", F.lit(alias), F.col(id_col).cast("string"))
        frames.append(
            df.filter(sample_hash(key, salt) < int(frac * _BUCKETS))
            .withColumn("_store", F.lit(alias))
        )
    if not frames:
        raise ValueError("read_media_shards_mixture: every store has weight 0")
    cols = {tuple(sorted(f.columns)) for f in frames}
    if len(cols) > 1:
        raise ValueError(
            "read_media_shards_mixture: stores have mismatched columns "
            f"{sorted(cols)} — different dim/payload configs cannot blend; "
            "re-run the odd store with matching config"
        )
    return _balanced_union(frames)


def media_dup_clusters(
    spark,
    out_dir: str,
    threshold: float = 0.95,
    n_bits: int = 0,
    seed: str = "media-dup-v1",
    include_increments: bool = True,
    strategy: str = "auto",
    center: float | None = None,
    n_bands: int = 1,
) -> DataFrame:
    """Near-duplicate clusters over a media feature store (r13 verdict
    #7 — the dedup families were text-keyed; this reads a store's
    FEATURE VECTORS into the q62 embedding machinery): load base +
    increments with the tombstone ledger applied, cosine-pair at
    ``threshold``, fold connected components, return
    ``(node, cluster_rep)`` keyed on the store's own id column — the
    frame a keep-one-per-cluster decision (or a purge request) acts on.

    ``n_bits=0`` is the EXACT all-pairs face (the recall yardstick, the
    q20/q62 relationship); ``n_bits>=1`` hyperplane-buckets the vectors
    first (``semantic_pack_groups``' deterministic md5 planes, dots
    6dp-rounded before the sign test, so the bucketing is
    engine-replayable) and pairs only WITHIN a bucket — the blocked
    equi-join form whose quadratic term shrinks by ~2**n_bits, the
    shape that survives a 100 TB media store. Same-bytes media always
    share every bucket (identical vectors, identical signs), so exact
    duplicates have recall 1.0 at any n_bits; near-dup recall is the
    usual LSH trade measured against the n_bits=0 face.

    ``n_bands`` (r15 — the q18 minhash-banding idiom on the vector
    side) runs B INDEPENDENT plane sets (seed-derived per band, so each
    stays deterministic and append-invariant) and unions the
    within-bucket candidates across bands: a near-dup pair split by one
    band's planes has B-1 more chances to collide, recall goes
    1-(1-p^n)^B while the blocked quadratic term only multiplies by B
    (each row is shipped once per band; recall/cost table in PERF.md
    via bench_media_dedup.py). Pair SCORES never change —
    every band scores the same raw vectors, so the cross-band distinct
    is exact and blocked ⊆ exact is preserved at any B.

    Reference anchor: the images collection the reference upserts
    (worker/app/config.py:36-38) — dedup over that collection's vectors
    is the maintenance pass it never had."""
    import json
    import os

    from jsonify2ai_spark.operators.dedup import connected_components
    from jsonify2ai_spark.operators.packing import semantic_pack_groups
    from jsonify2ai_spark.operators.search import similarity_self_join

    with open(os.path.join(out_dir, "manifest.json"), encoding="utf-8") as fh:
        cfg = json.load(fh)["config"]
    id_col = cfg.get("id_col", "media_id")
    emb = read_media_shards(
        spark, out_dir, include_increments=include_increments
    ).select(F.col(id_col), F.col("features"))
    block = None
    if n_bits:
        # ``center``: subtract a FIXED constant from every coordinate
        # before the sign test (bucketing only — pair SCORES always use
        # the raw vectors). Sign-LSH balance needs ~zero-mean data: the
        # dev-mode sha features live in [0,1)^d, so their dots with any
        # plane share the plane's weight-sum sign and ~everything lands
        # in one bucket (measured: 68% of a 20k store in a single
        # bucket at n_bits=3). center=0.5 rebalances them; real CLIP
        # embeddings are roughly centered already (leave None). A fixed
        # constant — never a corpus mean — keeps bucket assignment
        # append-invariant, the store-lifecycle contract.
        bvec = "features"
        if center is not None:
            c = float(center)
            emb = emb.withColumn(
                "_cf", F.transform(F.col("features"), lambda x: x - F.lit(c))
            )
            bvec = "_cf"
        if n_bands <= 1:
            emb = semantic_pack_groups(
                emb,
                vector_col=bvec,
                n_bits=n_bits,
                dim=int(cfg["dim"]),
                seed=seed,
                out_col="_blk",
            )
        else:
            # band-OR: one bucket key per independent plane set, bucket
            # ids namespaced per band so the blocked join never pairs
            # across bands; rows replicate B times (the multiprobe cost)
            banded = []
            for bi in range(int(n_bands)):
                banded.append(
                    semantic_pack_groups(
                        emb,
                        vector_col=bvec,
                        n_bits=n_bits,
                        dim=int(cfg["dim"]),
                        seed=f"{seed}|band{bi}",
                        out_col="_bits",
                    ).select(
                        "*",
                        F.concat(
                            F.lit(f"b{bi}:"), F.col("_bits").cast("string")
                        ).alias("_blk"),
                    ).drop("_bits")
                )
            emb = banded[0]
            for e in banded[1:]:
                emb = emb.unionByName(e)
        if center is not None:
            emb = emb.drop("_cf")
        block = "_blk"
    pairs = similarity_self_join(
        emb,
        threshold,
        vector_col="features",
        id_col=id_col,
        block_col=block,
        strategy=strategy,
        # the store's frozen dim: the expr path unrolls its per-pair dot
        # to a codegen'd F.get chain (bit-identical fp order, ~2x)
        dim=int(cfg["dim"]),
    )
    if n_bits and n_bands > 1:
        # the same pair can collide in several bands; scores are
        # band-independent (raw vectors), so the distinct is exact
        pairs = pairs.select("a", "b").distinct()
    return connected_components(pairs.select("a", "b"))
