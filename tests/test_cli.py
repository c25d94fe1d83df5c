"""CLI surface: the reference's route/tool set as subcommands, e2e over a
temp corpus (ingest -> search/ask/documents/stats -> delete -> export)."""

from __future__ import annotations

import json

import pytest

from jsonify2ai_spark import cli


def run_cli(capsys, argv):
    rc = cli.main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    return json.loads(out[-1])


@pytest.fixture(scope="module")
def corpus_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    (root / "golden.md").write_text("# Golden\nthe golden answer phrase lives here")
    (root / "other.txt").write_text("unrelated filler content about nothing")
    return root


def test_cli_ingest_search_ask_lifecycle(spark, corpus_root, tmp_path, capsys):
    table = str(tmp_path / "chunks")

    out = run_cli(capsys, ["ingest", str(corpus_root), "--table", table])
    assert out["chunks"] >= 2

    # search: the exact (ws-normalized) chunk text is hit@1 score 1.0 under
    # dev embeddings
    golden_text = "# Golden the golden answer phrase lives here"
    hits = run_cli(capsys, ["search", golden_text, "--table", table, "-k", "3"])
    assert hits and hits[0]["text"] == golden_text and hits[0]["score"] == 1.0

    ask = run_cli(capsys, ["ask", golden_text, "--table", table])
    assert ask["would_synth"] is True and ask["sources"]

    docs = run_cli(capsys, ["documents", "--table", table])
    assert len(docs) == 2  # one inventory row per ingested file
    assert hits[0]["document_id"] in {d["document_id"] for d in docs}
    doc_id = hits[0]["document_id"]

    stats = run_cli(capsys, ["stats", "--table", table])
    total = next(r for r in stats if r.get("kind") is None)
    assert total["n"] == out["chunks"]

    exp = run_cli(capsys, ["export", doc_id, "--table", table, "--out", str(tmp_path / "exp")])
    assert exp["document_id"] == doc_id

    before = out["chunks"]
    del_out = run_cli(capsys, ["delete", doc_id, "--table", table])
    assert del_out["chunks"] < before


def test_cli_note2json_and_eval(spark, tmp_path, capsys):
    note = tmp_path / "n.md"
    note.write_text("# My Note\n**Tags:** #x\nbody")
    out = run_cli(capsys, ["note2json", str(note)])
    assert out["title"] == "My Note" and out["tags"] == ["x"]

    qa = tmp_path / "qa.jsonl"
    qa.write_text(json.dumps({"question": "anything", "answer_contains": "zz-none"}) + "\n")
    ev = run_cli(capsys, ["eval", "--qa", str(qa), "--sf-dir", "/root/testdata/sf0.001"])
    assert ev["n"] == 1 and ev["hit@1"] == 0


def test_cli_note2json_glob_batch_and_out_dir(tmp_path, capsys):
    """Reference CLI parity: glob expansion (deduped, sorted), per-file
    results with skip-reasons, --out dir with one .json per input."""
    import os

    (tmp_path / "n1.md").write_text("# One\nbody")
    (tmp_path / "n2.md").write_text("# Two\nbody")
    (tmp_path / "bad.md").write_bytes(bytes(512))  # NUL-ridden -> per-file error
    out_dir = tmp_path / "parsed"

    rc = cli.main([
        "note2json", str(tmp_path / "*.md"), str(tmp_path / "n1.md"),  # dup collapses
        "--out", str(out_dir),
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1  # one file failed
    assert out["n"] == 3 and out["ok"] == 2
    by_file = {r["file"].rsplit("/", 1)[-1]: r for r in out["results"]}
    assert by_file["n1.md"]["data"]["title"] == "One"
    assert by_file["bad.md"]["ok"] is False and "UTF" in by_file["bad.md"]["error"]
    assert sorted(os.listdir(out_dir)) == ["bad.json", "n1.json", "n2.json"]


def test_cli_note2json_missing_files_and_collisions(tmp_path, capsys):
    """Review findings: missing files and zero-match globs are ERRORS (not
    the path parsed as note text), literal '[' filenames survive, and
    same-stem inputs get distinct --out names."""
    import os

    missing = str(tmp_path / "nope.md")
    rc = cli.main(["note2json", missing])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["ok"] is False and "no such file" in out["error"]

    rc = cli.main(["note2json", str(tmp_path / "zz_*.md")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["ok"] is False  # zero-match glob is not success

    bracket = tmp_path / "notes[1].md"
    bracket.write_text("# Bracket\nbody")
    rc = cli.main(["note2json", str(bracket)])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["title"] == "Bracket"

    (tmp_path / "a").mkdir(); (tmp_path / "b").mkdir()
    (tmp_path / "a" / "n.md").write_text("# A")
    (tmp_path / "b" / "n.md").write_text("# B")
    out_dir = tmp_path / "out"
    rc = cli.main([
        "note2json", str(tmp_path / "a" / "n.md"), str(tmp_path / "b" / "n.md"),
        "--out", str(out_dir),
    ])
    capsys.readouterr()
    assert rc == 0
    assert sorted(os.listdir(out_dir)) == ["n-2.json", "n.json"]


def test_bench_summary_line_bounded_and_parseable():
    """The r3/r5 regression class, pinned: the LAST stdout line of bench.py
    must parse as JSON and stay small enough for the driver's bounded tail
    capture even at 150 queries; a thrown query reads as null + errors>0,
    never as a silent speedup."""
    import json

    from bench import format_stdout_lines

    timings = {f"q{i:02d}_some_operator_name_{i}": (None if i == 7 else i * 0.137)
               for i in range(1, 151)}
    total = sum(v for v in timings.values() if v is not None)
    detail, summary = format_stdout_lines(timings, total, n_errors=1, sf=0.1)
    s = json.loads(summary)
    assert len(summary) < 2000, len(summary)
    assert s["metric"] == "total_query_seconds" and s["errors"] == 1
    assert s["n_queries"] == 150 and s["queries"]["q07"] is None
    d = json.loads(detail)
    assert set(d["queries"]) == set(timings)


def test_bench_skipped_queries_rerun_next_round():
    """r14 verdict #2 (the skip-tail blind spot), pinned: a query the
    deadline skipped in round N must be MEASURED in round N+1, not seeded
    to the tail and skipped forever. build_order_seed seeds skipped
    queries at the new-query weight (run first), so under the same
    per-query costs and the same deadline the next pass measures them at
    the head — the old 0.0 seeding pinned the same skip set forever, and
    an epsilon-above-cheapest placement still re-skips part of the band
    (this simulation showed it)."""
    from bench import NEW_QUERY_WEIGHT, build_order_seed, order_queries

    costs = {  # simulated true per-query wall cost, seconds
        "q90_heavy": 5.0, "q91_mid": 2.0, "q92_mid": 1.5,
        "q93_cheap": 0.3, "q94_cheap": 0.2, "q95_cheap": 0.1,
        "q96_cheap": 0.1, "q97_cheap": 0.1,
    }

    def simulate(prev_first, deadline):
        elapsed, measured, skipped = 0.0, {}, []
        for name, _ in order_queries({k: None for k in costs}, prev_first):
            if elapsed > deadline:
                skipped.append(name)
                continue
            measured[name] = [costs[name]]
            elapsed += costs[name]
        return measured, skipped

    # round N: full history from round N-1, noisy window → deadline skips
    # the two cheapest-tail queries
    full_seed = build_order_seed({"runs": {k: [v] for k, v in costs.items()}})
    measured_n, skipped_n = simulate(full_seed, deadline=9.0)
    assert skipped_n, "scenario must actually skip a tail"

    # round N+1 reads round N's artifact (skipped queries have NO runs row)
    seed_n1 = build_order_seed({"runs": measured_n, "skipped": skipped_n})
    # skipped queries run at the HEAD of the next pass, before every
    # measured query — the absolute form of the guarantee
    order_n1 = [k for k, _ in order_queries({k: None for k in costs}, seed_n1)]
    for s in skipped_n:
        assert order_n1.index(s) < order_n1.index("q90_heavy")
    # and under the SAME deadline they are measured this time
    measured_n1, skipped_n1 = simulate(seed_n1, deadline=9.0)
    for s in skipped_n:
        assert s in measured_n1, f"{s} skipped two rounds running"
    # the old 0.0-seeding failure mode: skip set must not repeat
    assert not (set(skipped_n) & set(skipped_n1))

    # degenerate artifacts never crash the ordering seed
    assert build_order_seed({"skipped": ["qx"]}) == {"qx": NEW_QUERY_WEIGHT}
    assert build_order_seed({}) == {}


def test_bench_degraded_window_goes_single_run_not_skip():
    """r15 coverage-first projection, pinned: in a window where every
    first run inflates by a common factor (the host-contention shape the
    r15 cold pass measured: ~2.2x, 51 queries deadline-skipped while
    extra min-of-N runs burned the margin the tail needed), the
    projection must flag the backlog so the run loop drops to single-run
    and the deadline never has to skip coverage; in a healthy window the
    projection must stay at plain history and leave min-of-N alone."""
    from bench import NEW_QUERY_WEIGHT, estimate_remaining_first_runs

    hist = [5.0, 2.0, 1.5, 1.0, 0.5, 0.5]  # remaining queries' history

    # healthy window: observed ratios ~1 → projection == sum(history)
    est = estimate_remaining_first_runs(hist, [1.0, 1.1, 0.9, 1.0, 1.05])
    assert abs(est - sum(hist)) < sum(hist) * 0.15

    # degraded window: sustained ~2.5x ratios → projection scales up, so
    # (elapsed + est) crosses a deadline that plain history would not
    est_bad = estimate_remaining_first_runs(hist, [2.4, 2.6, 2.5, 2.3, 2.7])
    assert est_bad > 2.2 * sum(hist)

    # too few observations: never leaves history (no single-sample panic)
    assert estimate_remaining_first_runs(hist, [9.0]) == sum(hist)

    # a FAST window may discount an inflated history (a degraded pass
    # writes 2x+ costs into BENCH_RUNS.json; the next healthy pass must
    # walk that back or it stays single-run forever) — but by at most
    # 2x: the ratio clamps at 0.5
    assert estimate_remaining_first_runs(hist, [0.3] * 6) == 0.5 * sum(hist)
    assert estimate_remaining_first_runs(hist, [0.8] * 6) == 0.8 * sum(hist)

    # skip-seeded / new entries (1e18 weight) estimate at the median of
    # the known costs, not at the seed weight
    with_seeds = hist + [NEW_QUERY_WEIGHT, NEW_QUERY_WEIGHT]
    est_seeded = estimate_remaining_first_runs(with_seeds, [])
    known_median = sorted(hist)[len(hist) // 2 - 1 : len(hist) // 2 + 1]
    med = sum(known_median) / 2
    assert abs(est_seeded - (sum(hist) + 2 * med)) < 1e-9

    # no history at all: every entry estimates at the 1 s default
    assert estimate_remaining_first_runs(
        [NEW_QUERY_WEIGHT, NEW_QUERY_WEIGHT], []
    ) == 2.0


def test_cli_purge_lifecycle(spark, tmp_path, capsys):
    """`purge` tombstones ids in a shard store (logical at once) and
    `--erase` runs the erasing compaction in the same invocation."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.pipelines import corpus_to_token_shards, read_token_shards

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j % 9}" for j in range(6))) for i in range(1, 13)],
        "doc_id long, text string",
    )
    store = str(tmp_path / "store")
    corpus_to_token_shards(
        docs, store, num_merges=4, budget=64, n_groups=2, assemble=False,
        prep=None,
    )
    res = run_cli(capsys, ["purge", "--store", store, "4", "7"])
    assert res["pending_purge_ids"] == 2 and not res["physically_erased"]
    left = {r["doc_id"] for r in read_token_shards(spark, store).collect()}
    assert not ({4, 7} & left)

    res = run_cli(capsys, ["purge", "--store", store, "9", "--erase"])
    assert res["physically_erased"] and res["rows"] == 9
    import json as _json
    import os

    man = _json.load(open(os.path.join(store, "manifest.json")))
    assert man["tombstones"] is None and man["purged_ids_applied"] == 3
    raw = spark.read.parquet(os.path.join(store, man["shards_dir"]))
    assert raw.filter(F.col("doc_id").isin([4, 7, 9])).count() == 0
