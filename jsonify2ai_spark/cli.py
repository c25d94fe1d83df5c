"""Command-line surface: the reference's HTTP routes + dev tools as one CLI.

Reference parity map (route/tool -> subcommand):
- POST /process, scripts ingest_dropzone.py      -> ``ingest``
- GET/POST /search (search.py:144-220)           -> ``search``
- POST /ask (ask.py:253-462)                     -> ``ask``
- GET /documents (documents.py:19-168)           -> ``documents``
- DELETE /documents/{id} (documents.py:171-203)  -> ``delete``
- GET /status (status.py:112-162)                -> ``stats``
- GET /export/{id}.jsonl (export.py:62-419)      -> ``export``
- scripts ask_eval.py                            -> ``eval``
- scripts filewatcher.py / watch_dropzone.py     -> ``watch``
- note2json CLI (modules/note2json/cli.py)       -> ``note2json``
- maintenance (reindex/compaction analogs)       -> ``compact``

Every subcommand prints one JSON document to stdout (rows for table-valued
results), so the CLI composes with jq the way the reference's HTTP responses
do. The chunks table is a Parquet path; mutating commands rewrite it through
the same crash-safe stage-and-swap the streaming merge uses.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spark(app: str):
    from jsonify2ai_spark.session import get_spark

    s = get_spark(app)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _read_table(spark, path: str):
    from jsonify2ai_spark.sinks.tables import recover_table

    # restore-only recovery: a crash between rename-aside and move-in
    # leaves the only copy in `{path}__old`, which reads must bring back —
    # but reads never DELETE (destructive cleanup is writer-startup work;
    # rm-ing a live writer's staging dir from a concurrent `stats` call
    # would kill its in-flight batch)
    recover_table(path, destructive=False)
    return spark.read.parquet(path)


def _write_table(df, path: str) -> None:
    """Stage-and-swap table rewrite (never write over files a plan is
    reading; crash-safe via sinks.tables.swap_dir + startup recovery in
    :func:`_read_table`)."""
    from jsonify2ai_spark.sinks.tables import recover_table, swap_dir

    recover_table(path)
    staging = f"{path}__staging"
    df.write.mode("overwrite").parquet(staging)
    swap_dir(staging, path)


def _emit(obj) -> None:
    print(json.dumps(obj, ensure_ascii=False, default=str))


def _emit_rows(df, limit: int | None = None) -> None:
    rows = df.limit(limit).collect() if limit else df.collect()
    _emit([r.asDict(recursive=True) for r in rows])


def cmd_ingest(args) -> int:
    from jsonify2ai_spark.api import ingest
    from jsonify2ai_spark.sinks.tables import recover_table

    spark = _spark("cli-ingest")
    # recover BEFORE the exists check: after a crash mid-swap the table dir
    # may be absent with the data in `__old` — skipping recovery here would
    # ingest fresh instead of merging and the swap would drop the old rows
    recover_table(args.table)
    existing = _read_table(spark, args.table) if os.path.exists(args.table) else None
    chunks = ingest(spark, args.root, existing=existing, dim=args.dim)
    _write_table(chunks, args.table)
    # plain read for the count: recovery already ran above (and in _write_table)
    n = spark.read.parquet(args.table).count()
    _emit({"table": args.table, "chunks": n})
    return 0


def cmd_search(args) -> int:
    from jsonify2ai_spark.api import search

    spark = _spark("cli-search")
    hits = search(
        _read_table(spark, args.table), args.query, k=args.k, dim=args.dim,
        **({"kind": args.kind} if args.kind else {}),
    )
    _emit_rows(hits)
    return 0


def cmd_ask(args) -> int:
    from jsonify2ai_spark.api import ask

    spark = _spark("cli-ask")
    _emit(ask(_read_table(spark, args.table), args.question, k=args.k, dim=args.dim))
    return 0


def cmd_documents(args) -> int:
    from jsonify2ai_spark.api import documents

    spark = _spark("cli-documents")
    _emit_rows(documents(_read_table(spark, args.table), limit=args.limit))
    return 0


def cmd_stats(args) -> int:
    from jsonify2ai_spark.api import stats

    spark = _spark("cli-stats")
    _emit_rows(stats(_read_table(spark, args.table)))
    return 0


def cmd_delete(args) -> int:
    from jsonify2ai_spark.api import delete_document

    spark = _spark("cli-delete")
    table = _read_table(spark, args.table)
    remaining = delete_document(table, args.document_id)
    _write_table(remaining, args.table)
    _emit({"table": args.table, "deleted": args.document_id,
           "chunks": _read_table(spark, args.table).count()})
    return 0


def cmd_export(args) -> int:
    from jsonify2ai_spark.api import export_document

    spark = _spark("cli-export")
    export_document(_read_table(spark, args.table), args.document_id, args.out)
    _emit({"out": args.out, "document_id": args.document_id})
    return 0


def cmd_eval(args) -> int:
    from jsonify2ai_spark.operators.evalharness import (
        eval_corpus_from_documents,
        run_qa_eval,
    )

    spark = _spark("cli-eval")
    if args.table:
        corpus = _read_table(spark, args.table).select(
            "id", "document_id", "path", "kind", "idx", "text", "vector"
        )
    else:
        corpus = eval_corpus_from_documents(spark, args.sf_dir, dim=args.dim)
    _emit(run_qa_eval(corpus, args.qa, out_path=args.out, k=args.k, dim=args.dim))
    return 0


def cmd_watch(args) -> int:  # pragma: no cover - blocking loop; logic tested via watcher tests
    from jsonify2ai_spark.streaming.watcher import watch_dropzone

    spark = _spark("cli-watch")
    q = watch_dropzone(
        spark, args.dropzone, args.table, args.checkpoint,
        trigger_seconds=args.trigger_seconds, dim=args.dim,
    )
    q.awaitTermination()
    return 0


def cmd_note2json(args) -> int:
    """Reference note2json CLI parity: stdin ('-'), literal paths, glob
    patterns (deduped + sorted for deterministic order), optional --out dir
    writing one .json per input, per-file skip-with-reason in batch mode.
    (For corpora already in a table, sources.notes.parse_notes is the
    distributed form — this command is the file-at-a-time tool.)"""
    import glob as globlib

    from jsonify2ai_spark.sources.notes import read_input

    if args.file == ["-"]:
        data = read_input(sys.stdin.buffer, input_format=args.input_format)
        if args.out:  # honor the one-.json-per-input contract for stdin too
            os.makedirs(args.out, exist_ok=True)
            with open(os.path.join(args.out, "stdin.json"), "w", encoding="utf-8") as f:
                json.dump({"file": "-", "ok": True, "data": data}, f, ensure_ascii=False, indent=2)
        _emit(data)
        return 0

    paths: list[str] = []
    results: list[dict] = []
    for pat in args.file:
        # a literal file wins over glob interpretation (a real file named
        # 'notes[1].md' must not be read as a character class); a pattern
        # matching nothing is an ERROR row, not silent success
        if os.path.exists(pat):
            paths.append(pat)
            continue
        matched = globlib.glob(pat, recursive=True) if globlib.has_magic(pat) else []
        if matched:
            paths.extend(matched)
        else:
            results.append({"file": pat, "ok": False, "error": "no such file or no glob match"})
    paths = sorted(set(paths))

    used_names: dict[str, int] = {}
    n_ok = 0
    for p in paths:
        try:
            # read_input falls back to treating a non-path string as raw
            # text (the API contract); at the CLI boundary the argument IS
            # a path, so a missing file must error, not parse its own name
            if not os.path.exists(p):
                raise FileNotFoundError(f"no such file: {p}")
            data = read_input(p, input_format=args.input_format)
            results.append({"file": p, "ok": True, "data": data})
            n_ok += 1
        except Exception as e:
            results.append({"file": p, "ok": False, "error": str(e)[:200]})
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            stem = os.path.splitext(os.path.basename(p))[0]
            # same-stem inputs (a/n.md, b/n.md) must not clobber each other
            seq = used_names.get(stem, 0)
            used_names[stem] = seq + 1
            name = f"{stem}.json" if seq == 0 else f"{stem}-{seq + 1}.json"
            with open(os.path.join(args.out, name), "w", encoding="utf-8") as f:
                json.dump(results[-1], f, ensure_ascii=False, indent=2)

    if len(results) == 1 and not args.out:
        r = results[0]  # single file keeps the plain-JSON output contract
        _emit(r["data"] if r["ok"] else r)
        return 0 if r["ok"] else 1
    _emit({"n": len(results), "ok": n_ok, "results": results})
    return 0 if results and n_ok == len(results) else 1


def cmd_compact(args) -> int:
    from jsonify2ai_spark.sinks.tables import compact_buckets

    spark = _spark("cli-compact")
    _emit(compact_buckets(spark, args.table, target_file_mb=args.target_file_mb))
    return 0


def cmd_purge(args) -> int:
    """Right-to-be-forgotten over a SHARD STORE (r13): ledger the ids
    as tombstones (logical at once for every loader), optionally run the
    erasing compaction in the same invocation (--erase)."""
    from jsonify2ai_spark.pipelines import (
        compact_media_shards,
        compact_token_shards,
        purge_shard_store,
    )

    res = purge_shard_store(args.store, args.ids, id_col=args.id_col)
    if args.erase:
        spark = _spark("cli-purge")
        compact = (
            compact_media_shards if args.kind == "media" else compact_token_shards
        )
        out = compact(spark, args.store)
        res = {**res, "physically_erased": True, "rows": out["rows"]}
    _emit(res)
    return 0


def cmd_snapshot(args) -> int:
    from jsonify2ai_spark.sinks.tables import snapshot_table

    spark = _spark("cli-snapshot")
    _emit(snapshot_table(spark, args.table, args.snap_dir, label=args.label))
    return 0


def cmd_restore(args) -> int:
    from jsonify2ai_spark.sinks.tables import restore_snapshot

    _emit(restore_snapshot(args.snapshot, args.table))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="jsonify2ai-spark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def table_arg(sp):
        sp.add_argument("--table", required=True, help="chunks Parquet table path")

    sp = sub.add_parser("ingest", help="ingest files under a root into the chunks table")
    sp.add_argument("root")
    table_arg(sp)
    sp.add_argument("--dim", type=int, default=64)
    sp.set_defaults(fn=cmd_ingest)

    sp = sub.add_parser("search", help="vector top-k over the chunks table")
    sp.add_argument("query")
    table_arg(sp)
    sp.add_argument("-k", type=int, default=5)
    sp.add_argument("--dim", type=int, default=64)
    sp.add_argument("--kind", default=None)
    sp.set_defaults(fn=cmd_search)

    sp = sub.add_parser("ask", help="retrieve -> gate -> snippets")
    sp.add_argument("question")
    table_arg(sp)
    sp.add_argument("-k", type=int, default=5)
    sp.add_argument("--dim", type=int, default=64)
    sp.set_defaults(fn=cmd_ask)

    sp = sub.add_parser("documents", help="per-document inventory")
    table_arg(sp)
    sp.add_argument("--limit", type=int, default=200)
    sp.set_defaults(fn=cmd_documents)

    sp = sub.add_parser("stats", help="total + per-kind counts")
    table_arg(sp)
    sp.set_defaults(fn=cmd_stats)

    sp = sub.add_parser("delete", help="remove one document from the table")
    sp.add_argument("document_id")
    table_arg(sp)
    sp.set_defaults(fn=cmd_delete)

    sp = sub.add_parser("export", help="JSONL export of one document")
    sp.add_argument("document_id")
    table_arg(sp)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_export)

    sp = sub.add_parser("eval", help="run a {question, answer_contains} QA file end-to-end")
    sp.add_argument("--qa", required=True)
    sp.add_argument("--table", default=None)
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sp.add_argument("--out", default=None)
    sp.add_argument("-k", type=int, default=5)
    sp.add_argument("--dim", type=int, default=64)
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("watch", help="stream a dropzone into the chunks table")
    sp.add_argument("dropzone")
    table_arg(sp)
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--trigger-seconds", type=int, default=2)
    sp.add_argument("--dim", type=int, default=64)
    sp.set_defaults(fn=cmd_watch)

    sp = sub.add_parser(
        "note2json", help="parse note files (paths/globs, or - for stdin) to JSON"
    )
    sp.add_argument("file", nargs="+")
    sp.add_argument("--input-format", default="auto", choices=["auto", "md", "txt", "json"])
    sp.add_argument("--out", default=None, help="directory for one .json per input")
    sp.set_defaults(fn=cmd_note2json)

    sp = sub.add_parser("compact", help="merge small files per bucket")
    table_arg(sp)
    sp.add_argument("--target-file-mb", type=int, default=128)
    sp.set_defaults(fn=cmd_compact)

    sp = sub.add_parser(
        "purge", help="tombstone document ids in a shard store (GDPR delete)"
    )
    sp.add_argument("--store", required=True, help="shard store directory")
    sp.add_argument("ids", nargs="+", help="document ids to purge")
    sp.add_argument("--id-col", default=None, help="override the store's key column")
    sp.add_argument("--kind", choices=["token", "media"], default="token")
    sp.add_argument(
        "--erase", action="store_true",
        help="also run the erasing compaction now (physical deletion)",
    )
    sp.set_defaults(fn=cmd_purge)

    sp = sub.add_parser("snapshot", help="tar.gz the table + integrity manifest")
    table_arg(sp)
    sp.add_argument("--snap-dir", required=True)
    sp.add_argument("--label", default=None)
    sp.set_defaults(fn=cmd_snapshot)

    sp = sub.add_parser("restore", help="restore a snapshot archive (sha-verified)")
    sp.add_argument("snapshot")
    table_arg(sp)
    sp.set_defaults(fn=cmd_restore)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
