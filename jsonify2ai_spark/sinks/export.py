"""Export sinks (SURVEY §2.7 K5-K7).

Reference semantics:
- K5 JSONL export per document: stable field order
  ``{id, document_id, path, kind, idx, text, meta}``, one JSON object per
  line (worker/app/routers/export.py:62-160, docs/DATA_MODEL.md:70-90).
- K6 ZIP archive: chunks.jsonl (+ images.jsonl) + README + manifest.json
  with request id, timestamp, counts, per-file sha256 + byte sizes
  (worker/app/routers/export.py:163-419).
- K7 ingest mirror: every upserted chunk also appended to an ingest JSONL
  log with its vector length (scripts/dev/tools/ingest_dropzone.py:344-347).

Spark-first split: row serialization and the JSONL write are DATA-PLANE
(distributed `to_json` + text sink — scales to any corpus); the ZIP+manifest
assembly is CONTROL-PLANE (driver-side, one archive per request, bounded by
the already-filtered export size — the reference caps exports the same way).
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import zipfile
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EXPORT_FIELDS = ("id", "document_id", "path", "kind", "idx", "text", "meta")


def _jsonl_lines(chunks: DataFrame, fields: tuple[str, ...] = EXPORT_FIELDS) -> DataFrame:
    """One stable-field-order JSON line per chunk, as a 1-column DataFrame.

    ``to_json(struct(...))`` preserves struct field order, matching the
    reference's explicit key ordering (export.py:101-109). Serialization is
    executor-side — the driver never sees the rows.
    """
    cols = [F.col(f) for f in fields if f in chunks.columns]
    return chunks.select(F.to_json(F.struct(*cols)).alias("value"))


def export_jsonl(
    chunks: DataFrame,
    out_dir: str,
    document_id: str | None = None,
    where: Column | None = None,
) -> None:
    """K5: write the (filtered) chunks as JSONL files under ``out_dir``.

    The document filter is pushed into the scan (Parquet predicate on the
    bucketed document_id layout touches only that doc's buckets)."""
    if document_id is not None:
        chunks = chunks.filter(F.col("document_id") == document_id)
    if where is not None:
        chunks = chunks.filter(where)
    _jsonl_lines(chunks).write.mode("overwrite").text(out_dir)


def ingest_mirror(chunks: DataFrame, out_dir: str, vector_col: str = "vector") -> None:
    """K7: append-mode mirror of upserted chunks with vec_len (the reference
    writes data/exports/ingest.jsonl next to every upsert)."""
    mirrored = chunks.withColumn("vec_len", F.size(F.col(vector_col))) if (
        vector_col in chunks.columns
    ) else chunks
    fields = EXPORT_FIELDS + ("vec_len",)
    _jsonl_lines(mirrored, fields).write.mode("append").text(out_dir)


def _collect_jsonl(out_dir: str) -> bytes:
    """Concatenate a Spark text-sink directory into one JSONL payload
    (driver-side, bounded by the per-request export size)."""
    parts = []
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("part-"):
            with open(os.path.join(out_dir, name), "rb") as f:
                parts.append(f.read())
    return b"".join(parts)


def upload_to_dropzone(content: bytes, filename: str, dropzone: str) -> dict[str, Any]:
    """K9 upload sink (reference worker/app/routers/upload.py:12-19): drop a
    payload into the watched dropzone under a traversal-sanitized basename;
    the streaming watcher (streaming/watcher.py) picks it up from there. A
    missing/empty name gets a uuid4 hex, exactly like the reference."""
    import uuid

    name = os.path.basename(filename or "") or f"file-{uuid.uuid4().hex}"
    os.makedirs(dropzone, exist_ok=True)
    dest = os.path.join(dropzone, name)
    with open(dest, "wb") as f:
        f.write(content)
    return {"ok": True, "path": dest, "filename": name}


def zip_export(
    chunks: DataFrame,
    document_id: str,
    out_zip: str,
    workdir: str,
    request_id: str = "export",
    images: DataFrame | None = None,
    extra_files: dict[str, bytes] | None = None,
) -> dict[str, Any]:
    """K6: one-document ZIP archive with manifest (counts, sha256, bytes).

    Data plane: the JSONL serialization runs distributed via
    :func:`export_jsonl`. Control plane: this function zips the results and
    writes manifest.json. ``extra_files`` maps archive names to raw payloads
    (the reference's ``source/`` passthrough) — names are gated against path
    traversal exactly like export.py:330-345.
    """
    payloads: dict[str, bytes] = {}
    cdir = os.path.join(workdir, "chunks_jsonl")
    export_jsonl(chunks, cdir, document_id=document_id)
    payloads["chunks.jsonl"] = _collect_jsonl(cdir)
    if images is not None:
        idir = os.path.join(workdir, "images_jsonl")
        export_jsonl(images, idir, document_id=document_id)
        payloads["images.jsonl"] = _collect_jsonl(idir)
    for name, data in (extra_files or {}).items():
        safe = os.path.normpath(name)
        if safe.startswith(("..", "/")) or os.path.isabs(safe):
            raise ValueError(f"unsafe archive member name: {name!r}")
        payloads[os.path.join("source", safe)] = data

    manifest = {
        "request_id": request_id,
        "document_id": document_id,
        "counts": {
            "chunks": payloads["chunks.jsonl"].count(b"\n"),
            "images": payloads.get("images.jsonl", b"").count(b"\n"),
        },
        "files": {
            name: {
                "sha256": hashlib.sha256(data).hexdigest(),
                "bytes": len(data),
            }
            for name, data in payloads.items()
        },
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in payloads.items():
            zf.writestr(name, data)
        zf.writestr("manifest.json", json.dumps(manifest, indent=2, sort_keys=True))
        zf.writestr(
            "README.txt",
            "jsonify2ai_spark export\nfields: " + ", ".join(EXPORT_FIELDS) + "\n",
        )
    with open(out_zip, "wb") as f:
        f.write(buf.getvalue())
    return manifest


def write_training_shards(
    packed: "DataFrame",
    out_dir: str,
    group_col: str = "pack_group",
    bin_col: str = "bin_idx",
    id_col: str = "doc_id",
    shuffle_seed: int | None = None,
) -> dict:
    """The trainer-facing output step after sequence packing: one Parquet
    shard directory per pack group (`group=N/`), rows sorted by
    (bin, id) WITHIN each shard file so a trainer streams bins contiguously
    without any read-side sort.

    ``shuffle_seed`` permutes the BIN order inside each shard (r9): packing
    assigns neighboring documents to neighboring bins, so the default
    bin-ascending layout feeds a sequential trainer correlated batches.
    The seeded order sorts bins by ``md5(seed||group||bin)`` — a
    deterministic pseudo-random whole-bin permutation (same seed, same
    corpus => byte-identical files on any cluster shape). Rows WITHIN a
    bin keep id order, so bins stay contiguous and the bin-streaming
    contract holds; assembled sequence rows (one row per bin) simply come
    out in shuffled order, which is exactly what the trainer wants.

    Plan shape: one repartition on the group key (each shard written by one
    task — files are whole training groups, not arbitrary splits) + an
    in-partition sort; no global sort, no driver collect. Returns a
    manifest dict {groups, rows, out_dir} for telemetry, mirroring the
    export sinks' manifest convention.
    """
    from pyspark.sql import functions as F

    # lazy checkpoint: the write materializes it, the manifest aggregation
    # then reads the checkpoint — one computation of `packed`, no re-scan
    # of the written output (which also cannot be schema-inferred when the
    # corpus filtered down to zero rows)
    packed = packed.localCheckpoint(eager=False)
    if shuffle_seed is None:
        bin_order = F.col(bin_col)
    else:
        bin_order = F.md5(
            F.concat_ws(
                "|",
                F.lit(int(shuffle_seed)),
                F.col(group_col),
                F.col(bin_col),
            )
        )
    (
        packed.repartition(F.col(group_col))
        .sortWithinPartitions(F.col(group_col), bin_order, F.col(id_col))
        .write.mode("overwrite")
        .partitionBy(group_col)
        .parquet(out_dir)
    )
    stats = packed.agg(
        F.count_distinct(F.col(group_col)).alias("g"), F.count(F.lit(1)).alias("n")
    ).first()
    return {"out_dir": out_dir, "groups": stats["g"], "rows": stats["n"]}


def write_token_shards(
    docs: "DataFrame",
    merges: list,
    vocab: "DataFrame",
    out_dir: str,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_groups: int = 32,
    oov: "str | int" = "drop",
    assemble: bool = False,
    eos_id: "int | None" = None,
    pad_id: int = 0,
    shuffle_seed: int | None = None,
    boundaries: bool = False,
) -> dict:
    """Corpus -> packed token-ID shards, the last pipeline step a
    pretraining user actually loads (r9, VERDICT r8 'What's missing #2'):
    :func:`~jsonify2ai_spark.operators.bpe.tokenize_to_ids` (rank-loop
    BPE encode + broadcast-vocab id lookup, map-only), next-fit
    :func:`~jsonify2ai_spark.operators.packing.pack_sequences` on the
    TOKEN count (``budget`` = ids per bin, the trainer's sequence
    length), then :func:`write_training_shards`'s group-partitioned
    bin-contiguous Parquet layout — rows carry (id, token_ids, n_tokens,
    pack_group, bin_idx). Empty-corpus safe (writes an empty layout,
    manifest rows=0). Scale shape: encode+lookup are projections, the
    pack is one group-keyed shuffle, the write is one repartition — no
    stage beyond what the text-shard path already pays.

    ``assemble=True`` writes BIN rows instead of doc rows: each bin
    becomes one :func:`~jsonify2ai_spark.operators.packing.
    concat_token_bins` sequence (``eos_id`` after every doc — the
    packing weight then counts it — right-padded with ``pad_id`` to
    ``budget``; q117 pins the assembly semantics), so the shard files
    are directly loadable fixed-length training rows (pack_group dirs,
    bin-ordered in-file). One extra hash aggregate on the bin key.
    ``boundaries=True`` adds per-sequence ``doc_ids``/``doc_lens``
    (block-diagonal-mask provenance); ``shuffle_seed`` applies the
    writer's deterministic whole-bin permutation (see
    :func:`write_training_shards`).
    """
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.bpe import tokenize_to_ids

    return _pack_and_write_ids(
        tokenize_to_ids(
            docs, merges, vocab, text_col=text_col, id_col=id_col, oov=oov
        ),
        out_dir,
        budget=budget,
        id_col=id_col,
        n_groups=n_groups,
        assemble=assemble,
        eos_id=eos_id,
        pad_id=pad_id,
        shuffle_seed=shuffle_seed,
        boundaries=boundaries,
    )


def _pack_and_write_ids(
    ids: "DataFrame",
    out_dir: str,
    budget: int,
    id_col: str,
    n_groups: int,
    assemble: bool,
    eos_id: "int | None",
    pad_id: int,
    shuffle_seed: int | None = None,
    boundaries: bool = False,
    mask_col: "str | None" = None,
) -> dict:
    """Shared pack-and-write tail of :func:`write_token_shards` and
    :func:`~jsonify2ai_spark.pipelines.corpus_to_token_shards` — ``ids``
    needs (id_col, token_ids); the packing weight (token count, + the
    per-doc eos when assembling) is derived HERE so the weight rule has
    exactly one home (review-found r9: two call sites carried the same
    projection and could drift)."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.packing import (
        concat_token_bins,
        pack_sequences,
    )

    if boundaries and not assemble:
        raise ValueError(
            "boundaries=True needs assemble=True: per-doc shard rows "
            "carry no assembled sequence to attach doc_ids/doc_lens to"
        )
    per_doc_eos = 1 if (assemble and eos_id is not None) else 0
    extra = [mask_col] if mask_col is not None else []
    ids = ids.select(
        id_col,
        "token_ids",
        *extra,
        F.size("token_ids").cast("bigint").alias("n_tokens"),
        (F.size("token_ids") + per_doc_eos).cast("bigint").alias("_w"),
    )
    packed = pack_sequences(
        ids, budget=budget, size_col="_w", id_col=id_col, n_groups=n_groups
    ).drop("_w")
    if assemble:
        bins = concat_token_bins(
            packed,
            id_col=id_col,
            eos_id=eos_id,
            pad_to=budget,
            pad_id=pad_id,
            with_boundaries=boundaries,
            mask_col=mask_col,
        )
        # bin rows: one per (group, bin); reuse the shard writer's layout
        # with the bin id standing in for the doc id sort key
        return write_training_shards(
            bins, out_dir, id_col="bin_idx", shuffle_seed=shuffle_seed
        )
    return write_training_shards(
        packed, out_dir, id_col=id_col, shuffle_seed=shuffle_seed
    )
