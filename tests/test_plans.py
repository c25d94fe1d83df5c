"""Plan-shape regression tests: the 100 TB properties, asserted.

A query that returns right answers but scans every column, skips pushdown, or
sort-shuffles for a top-k would melt at scale — these tests pin the plan
shapes Catalyst must keep producing.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from jsonify2ai_spark.plans import (
    codegen_stage_count,
    node_count,
    plan_string,
    pushed_filters,
    scan_read_schema,
)
from tests.conftest import SF_DIR


def test_q02_filters_reach_parquet_scan(spark):
    df = entry_mod.q02_revenue_filter(spark, SF_DIR)
    pushed = " ".join(pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"
    # column pruning: only the 4 referenced columns are read
    assert set(scan_read_schema(df)) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate",
    }


def test_q01_scan_prunes_to_needed_columns(spark):
    df = entry_mod.q01_pricing_summary(spark, SF_DIR)
    read = set(scan_read_schema(df))
    assert "l_comment" not in read and "l_orderkey" not in read
    assert {"l_returnflag", "l_linestatus", "l_quantity"} <= read


def test_q05_dimension_joins_broadcast(spark):
    plan = plan_string(entry_mod.q05_region_customers(spark, SF_DIR))
    # formatted mode prints each node in the tree AND the details section
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    assert "SortMergeJoin" not in plan


def test_q03_topk_is_take_ordered_not_full_sort(spark):
    plan = plan_string(entry_mod.q03_topk_orders(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    # no global sort-exchange for a limit-k
    assert "rangepartitioning" not in plan.lower()


def test_q24_replace_uses_broadcast_anti_join(spark):
    plan = plan_string(entry_mod.q24_replace_upsert(spark, SF_DIR))
    assert "LeftAnti" in plan and "Broadcast" in plan


def test_aggregates_are_partial_then_final(spark):
    """Map-side combine: two HashAggregate rounds around one exchange."""
    df = entry_mod.q04_orders_per_customer(spark, SF_DIR)
    assert node_count(df, "HashAggregate") == 2
    assert node_count(df, "Exchange") == 1


def test_scan_filter_agg_fuse_into_codegen(spark):
    df = entry_mod.q02_revenue_filter(spark, SF_DIR)
    df.collect()  # AQE annotates codegen ids only once the plan is final
    assert codegen_stage_count(df) >= 1


def test_q49_salted_join_stays_broadcast(spark):
    """The salted join must not fall back to sort-merge: big side map-only
    (salt is a projection, not a shuffle), dim side replicated + broadcast."""
    plan = plan_string(entry_mod.q49_salted_join(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan


def test_q48_salted_agg_two_phase(spark):
    """Salted agg = groupBy(key, salt) then groupBy(key): each groupBy gets
    partial+final HashAggregate, and only the two key exchanges exist — the
    salt must not add extra shuffles."""
    df = entry_mod.q48_salted_agg(spark, SF_DIR)
    assert node_count(df, "HashAggregate") == 4
    assert node_count(df, "Exchange") == 2


def test_q50_time_range_filter_under_topk(spark):
    """P2: the time-range predicate must run BEFORE cosine scoring (filter
    under the TakeOrdered), so the vector math only touches the slice."""
    df = entry_mod.q50_time_range_search(spark, SF_DIR)
    plan = plan_string(df)
    assert "TakeOrderedAndProject" in plan
    # the range predicate is a plain Filter condition on the raw scan column
    # (details section), not applied post-scoring
    cond = next(line for line in plan.splitlines() if "Condition" in line)
    assert "% 1000) >= 100" in cond and "% 1000) < 600" in cond, cond


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The engine's AQE configs actually fire: a join with one hot key gets
    runtime skew-split (SortMergeJoin(skew=true) in the FINAL adaptive plan).
    This is the automatic complement to the explicit salted path — both
    mitigations must hold at 100 TB. Thresholds are lowered to make test-size
    partitions count as skewed; restored after."""
    import pyspark.sql.functions as F

    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the SMJ path
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(300_000).select(
            F.when(F.col("id") % 10 < 8, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .cast("long")
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("v"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("d")
        )
        j = big.join(dim, "k")
        assert len(j.collect()) == 300_000  # inner join: every key matches
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "skew=true" in final, final[:1500]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_cbo_column_stats_flip_filtered_join_to_broadcast(spark):
    """ANALYZE + CBO: without stats the filtered fact side is estimated at
    its full file size (over the broadcast threshold -> SortMergeJoin); with
    table+column stats CBO sees the equality predicate keeps ~1/1000 of the
    rows and broadcasts that side. The join strategy must FLIP with stats
    present — this is why write_bucketed runs analyze_table after every bulk
    write."""
    import pyspark.sql.functions as F

    from jsonify2ai_spark.sinks.bucketed import analyze_table

    tuned = {
        "spark.sql.cbo.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(256 * 1024),
        "spark.sql.adaptive.enabled": "false",  # plan-time decision, no runtime rescue
    }
    saved = {k: spark.conf.get(k) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        # high-entropy pad so the parquet files are genuinely > threshold
        fact = spark.range(60_000).select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).alias("sel"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        spark.sql("DROP TABLE IF EXISTS cbo_fact")
        spark.sql("DROP TABLE IF EXISTS cbo_probe")
        fact.write.saveAsTable("cbo_fact")
        spark.range(60_000).select(
            F.col("id").alias("k"),
            F.sha2(F.concat(F.lit("p"), F.col("id").cast("string")), 256).alias("p"),
        ).write.saveAsTable("cbo_probe")

        def join_plan():
            j = spark.table("cbo_probe").join(
                spark.table("cbo_fact").filter(F.col("sel") == 7), "k"
            )
            return plan_string(j)

        before = join_plan()
        assert "SortMergeJoin" in before and "BroadcastHashJoin" not in before, before[:2000]

        analyze_table(spark, "cbo_fact", ["k", "sel"])
        after = join_plan()
        assert "BroadcastHashJoin" in after, after[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS cbo_fact")
        spark.sql("DROP TABLE IF EXISTS cbo_probe")


def test_q58_pii_scan_is_map_only(spark):
    """Detection + redaction are pure JVM regexp projections: ZERO exchanges
    at any scale."""
    p = plan_string(entry_mod.q58_pii_scan(spark, SF_DIR), "simple")
    assert "Exchange" not in p, p[:1500]


def test_q59_repetition_arrow_zero_aggregation_shuffles(spark):
    """Per-document stats need nothing across partitions: the Arrow kernel
    reads the corpus once with NO aggregation (the single Exchange is the
    parallelism round-robin from ensure_min_partitions, not a data
    shuffle). The engine-only cross-check impl keeps the bounded shape too:
    one scan, two partial-merge shuffles."""
    p = plan_string(entry_mod.q59_repetition_quality(spark, SF_DIR), "simple")
    assert p.count("Scan parquet") == 1, p[:1500]
    assert p.count("HashAggregate") == 0, p[:1500]
    assert p.count("Exchange") <= 1, p[:1500]

    from jsonify2ai_spark.operators.textstats import repetition_stats
    from jsonify2ai_spark.session import load_tables

    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    p2 = plan_string(repetition_stats(docs, impl="expr"), "simple")
    assert p2.count("Scan parquet") == 1, p2[:1500]
    assert p2.count("Exchange") == 2, p2[:1500]


def test_q70_per_source_cap_offsets_broadcast(spark):
    """Two-phase bucketed rank: the per-(source,bucket) offsets table
    (|sources| x 256 rows) must BROADCAST onto the corpus — a
    SortMergeJoin would shuffle the corpus to apply a dimension-sized
    table. The rank windows partition by (source, bucket), never by bare
    source (that single-task hot-domain window is what the design
    avoids)."""
    p = plan_string(entry_mod.q70_per_source_cap(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in p, p[:1500]
    assert "SortMergeJoin" not in p, p[:1500]
    import re
    frags = re.findall(r"hashpartitioning\(([^)]*)\)", p)
    # the CORPUS rank window partitions by (source, _bkt) — 256x the
    # parallelism on a hot domain...
    assert any("source" in f and "_bkt" in f for f in frags), (frags, p[:1500])
    # ...and bare-source partitionings exist only for the running-offset
    # window over the aggregated (source,_bkt) COUNTS table (tiny by
    # construction). The corpus is never windowed by bare source: exactly
    # the aggregate-side occurrences appear, each preceded by the count
    # aggregation in the same subtree.
    bare = [f for f in frags if "source" in f and "_bkt" not in f]
    assert len(bare) <= 1, (frags, p[:1500])
    assert "HashAggregate" in p  # the counts aggregation feeding offsets


def test_q71_gopher_filter_zero_aggregation_shuffles(spark):
    """Same contract as q59: per-document signals, one corpus scan, no
    aggregation exchange (the only Exchange allowed is
    ensure_min_partitions' parallelism round-robin)."""
    p = plan_string(entry_mod.q71_gopher_filter(spark, SF_DIR), "simple")
    assert p.count("Scan parquet") == 1, p[:1500]
    assert p.count("HashAggregate") == 0, p[:1500]
    assert p.count("Exchange") <= 1, p[:1500]


def test_q60_decontaminate_broadcasts_benchmark(spark):
    """The benchmark shingle set must broadcast (eval sets are tiny next to
    a training corpus); the corpus side streams map-only into the join."""
    p = plan_string(entry_mod.q60_decontaminate(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in p, p[:1500]
    assert "SortMergeJoin" not in p, p[:1500]


def test_q66_token_budget_mix_totals_broadcast(spark):
    """Mixture sampling: the per-stratum token totals (<= |strata| rows)
    broadcast back onto the corpus — the keep filter itself is map-side.
    A SortMergeJoin here would shuffle the corpus to apply a 5-row table."""
    p = plan_string(entry_mod.q66_token_budget_mix(spark, SF_DIR), "simple")
    assert "SortMergeJoin" not in p, p[:1500]
    assert "BroadcastHashJoin" in p, p[:1500]


def test_q67_quantized_search_scan_once_takeordered(spark):
    """Quantized serving: one pass over the embeddings for scoring (probe
    side is a broadcast 1-row frame), top-k via TakeOrderedAndProject."""
    p = plan_string(entry_mod.q67_quantized_search(spark, SF_DIR), "simple")
    assert "SortMergeJoin" not in p, p[:1500]
    assert "TakeOrderedAndProject" in p, p[:1500]
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p[:1500]


def test_q69_quantized_ivf_prune_then_takeordered(spark):
    """Composed int8-IVF serving (q69): the query side is a cluster filter
    + integer cosine + TakeOrderedAndProject — no join, no shuffle of the
    index (the only Exchange is the top-k's single-partition gather). The
    cluster filter sits in the scan stage, which is what becomes a
    partition PRUNE under the partitionBy(cluster) layout."""
    import re

    p = plan_string(entry_mod.q69_quantized_ivf(spark, SF_DIR), "simple")
    assert "TakeOrderedAndProject" in p, p[:1500]
    assert "Join" not in p, p[:1500]
    assert "cluster" in p and "IN (" in p.upper() or "cluster#" in p, p[:800]
    data_shuffles = re.findall(r"\bExchange (?:hash|range)", p)
    assert not data_shuffles, (data_shuffles, p[:1500])


def test_quantized_ivf_partitioned_layout_prunes(spark, tmp_path):
    """The 100 TB layout claim, executed: write the quantized index
    partitionBy(cluster), query it with the probe filter, and assert the
    scan's PartitionFilters prune to the probed cells — only n_probe/K of
    the files are read, before any row is touched."""
    from pyspark.sql import functions as F

    from jsonify2ai_spark.operators.ann import (
        build_quantized_ivf, probe_clusters, quantized_ivf_topk,
    )
    from jsonify2ai_spark.session import load_tables

    emb = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]
    rows = emb.filter(F.col("vec_id") < 8).orderBy("vec_id").select("embedding").collect()
    cents = [[float(x) for x in r[0]] for r in rows]
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    path = str(tmp_path / "qivf")
    build_quantized_ivf(emb, cents).write.partitionBy("cluster").parquet(path)
    index = spark.read.parquet(path)
    out = quantized_ivf_topk(index, q, cents, k=5, n_probe=2)
    p = plan_string(out, "formatted")
    assert "PartitionFilters" in p and "cluster" in p, p[:2000]
    # correctness through the physical layout: self-hit at ~1.0
    top = out.collect()
    assert top[0]["vec_id"] == 0 and abs(top[0]["qcos"] - 1.0) < 1e-4


def test_q64_tfidf_small_sides_broadcast_one_corpus_shuffle(spark):
    """Sparse TF-IDF cosine (q64): the corpus-sized data crosses the wire
    once (the (doc,bucket) tf aggregation); everything joined onto it — the
    <=dim-row df table, the 1-row n_docs scalar, the probe weights, the
    1-row probe norm — must BROADCAST. A SortMergeJoin anywhere here means
    a corpus-sized shuffle snuck into what should be dimension-table work."""
    import re

    p = plan_string(entry_mod.q64_tfidf_sql(spark, SF_DIR), "simple")
    assert "SortMergeJoin" not in p, p[:2000]
    assert p.count("BroadcastHashJoin") >= 3, p[:2000]
    # data shuffles only (NOT BroadcastExchange): the doc-keyed dot + norm
    # aggregations and the two 1-row scalar aggs (probe id, probe norm) are
    # the full set — anything beyond means a corpus-sized shuffle appeared
    data_shuffles = re.findall(r"\bExchange (?:hash|range|Single)", p)
    assert len(data_shuffles) <= 5, (data_shuffles, p[:2000])
    assert "TakeOrderedAndProject" in p, p[:2000]  # top-k never full-sorts


def test_q80_length_trim_broadcasts_cdf_no_corpus_sort(spark):
    """The percent-rank CDF must stay a value-level aggregate: broadcast
    join back onto the corpus (never SortMergeJoin), and the only window
    sort runs over the tiny per-value counts frame — the corpus side has
    no Exchange into a sort."""
    p = plan_string(entry_mod.q80_length_outliers(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in p, p[:1500]
    assert "SortMergeJoin" not in p, p[:1500]


def test_q81_source_quality_no_corpus_join(spark):
    """carry_cols design: the source label rides the Arrow pass, so the
    plan has NO join at all — one ArrowEvalPython/mapInPandas stage plus
    the |sources|-keyed partial aggregate."""
    p = plan_string(entry_mod.q81_source_quality(spark, SF_DIR), "simple")
    assert "Join" not in p, p[:1500]
    assert "HashAggregate" in p


def test_q82_mixture_weights_no_explode_broadcast_totals(spark):
    """Token counts are map-side size(split(...)) — no Generate/explode
    node anywhere; the normalizing scalars attach via a broadcast
    nested-loop (one-row frame)."""
    p = plan_string(entry_mod.q82_mixture_weights(spark, SF_DIR), "simple")
    assert "Generate" not in p, p[:1500]
    assert "BroadcastNestedLoopJoin" in p, p[:1500]
    assert "SortMergeJoin" not in p


def test_q83_label_coherence_broadcast_centroids(spark):
    """The centroid table (|labels| rows) must broadcast onto the members;
    the corpus never shuffles for the join (the only exchanges are the two
    label-keyed partial aggregates)."""
    p = plan_string(entry_mod.q83_label_coherence(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in p, p[:1500]
    assert "SortMergeJoin" not in p, p[:1500]


def test_q77_shingle_census_two_partial_aggregates(spark):
    """Census = two partial-aggregated shuffles (shingle df, then the
    histogram); no join, no window, no sort anywhere."""
    p = plan_string(entry_mod.q77_shingle_census(spark, SF_DIR), "simple")
    assert "Join" not in p, p[:1500]
    assert "Sort" not in p, p[:1500]


def test_q84_novelty_no_pair_explosion(spark):
    """Novelty joins postings to the df table and rolls up per doc — the
    plan must contain NO posting-list collect (collect_list) and no
    window: this operator is structurally linear, unlike the pair
    generators."""
    p = plan_string(entry_mod.q84_novelty_scores(spark, SF_DIR), "simple")
    assert "collect_list" not in p, p[:1500]
    assert "Window" not in p, p[:1500]


def test_q85_catalog_window_over_aggregates_only(spark):
    """The top-k window must consume the (source, gram) AGGREGATE — the
    plan shows the HashAggregate below the Window sort, so the per-source
    sort touches distinct-gram counts, never document rows."""
    p = plan_string(entry_mod.q85_boilerplate_catalog(spark, SF_DIR), "formatted")
    assert "Window" in p
    agg_pos = p.find("HashAggregate")
    win_pos = p.find("Window")
    assert 0 <= agg_pos and 0 <= win_pos
    # formatted mode prints leaves last: the aggregate feeding the window
    # appears BELOW it in the operator tree listing
    assert "min_df" not in p  # literal folded, not a runtime filter name


def test_q86_token_histogram_map_only_bucketing(spark):
    """Token counting never explodes: no Generate node; the only exchange
    is the ~40-key histogram aggregate."""
    p = plan_string(entry_mod.q86_token_histogram(spark, SF_DIR), "simple")
    assert "Generate" not in p, p[:1500]
    assert p.count("Exchange") == 1, p[:1500]


def test_q112_q113_map_only(spark):
    """Encoding repair and split assignment are pure projections: zero
    Exchange at any corpus size (r8)."""
    for q in ("q112_fix_mojibake", "q113_assign_splits"):
        p = plan_string(entry_mod.queries()[q](spark, SF_DIR), "simple")
        assert p.count("Exchange") == 0, (q, p[:1200])


def test_q114_broadcasts_held_out_side(spark):
    """The leakage audit must broadcast the SMALL held-out side into the
    train scan (decontaminate's direction reversed): the shingle join is
    a BroadcastHashJoin and the train side is never collected/broadcast
    by hint (only the held (id, sh) pairs are)."""
    df = entry_mod.queries()["q114_split_leakage"](spark, SF_DIR)
    p = plan_string(df, "simple")
    assert "BroadcastHashJoin" in p, p[:1500]
    # the logical plan's explicit hint sits on the held-out pairs (the
    # side derived from split <> 'train')
    lp = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in lp or "train" not in lp.split("ResolvedHint")[0][-200:]


def test_q116_q117_stay_arrow_batched(spark):
    """The token-id rows must never fall back to row-at-a-time Python:
    the only Python in either plan is the Arrow-batched id-lookup UDF
    (q116/q117), and q116's lookup stage adds no Exchange beyond
    build_vocab's own rank shuffles."""
    for q in ("q116_token_ids", "q117_pack_token_ids"):
        p = plan_string(entry_mod.queries()[q](spark, SF_DIR), "simple")
        assert "ArrowEvalPython" in p, (q, p[:800])
        assert "BatchEvalPython" not in p, (q, p[:800])


def test_q120_dsir_single_weight_subtree_and_ordered_take(spark):
    """DSIR's 100 TB shape, pinned: the resample is a per-partition-heap
    TakeOrderedAndProject (never a global sort-exchange), and because
    dsir_resample carries the weight row through the take, the weight
    subtree — featurization + both model rollups — appears ONCE in the
    plan (a join-back form re-derived it all on the join's right side;
    Spark does not dedupe common DataFrame subplans)."""
    df = entry_mod.q120_dsir(spark, SF_DIR)
    plan = plan_string(df)
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()
    # one (id,bucket)->(id) weight aggregation chain, not two: the
    # doc-side rollup pair appears once, plus one rollup per model fit
    # = 3 aggregate pairs total (6 HashAggregate nodes). The join-back
    # form doubles this.
    assert node_count(df, "HashAggregate") == 6, plan_string(df)


def test_q121_pack_report_bounded_aggregates_no_sort(spark):
    """pack_report rolls per-bin then one row — two aggregate pairs
    around the pack fold, and the exact percentile runs inside the final
    one-row aggregate (ObjectHashAggregate), never via a corpus sort."""
    df = entry_mod.q121_pack_report(spark, SF_DIR)
    plan = plan_string(df)
    assert "FlatMapGroupsInPandas" in plan  # the pack fold itself
    assert "rangepartitioning" not in plan.lower()
    assert node_count(df, "ObjectHashAggregate") == 2  # percentile pair


def test_q122_prep_report_single_corpus_scan(spark):
    """The run card counts the chain's own checkpointed boundaries: the
    raw table is scanned ONCE (the input stage); every later stage
    aggregate reads a checkpoint, never re-derives the chain (the
    subtree-recompute pitfall the boundary checkpoints exist to stop).
    The rows_dropped lag runs on the stage-count-sized frame (one
    Window), and no stage join survives into the card's plan."""
    df = entry_mod.queries()["q122_prep_report"](spark, SF_DIR)
    plan = plan_string(df)
    assert node_count(df, "Scan parquet") == 1, plan[:1200]
    assert node_count(df, "Window") == 1
    assert "SortMergeJoin" not in plan


def test_q123_sharded_bm25_partition_pruned_scan(spark, tmp_path):
    """The served query's postings scan must carry the terms' buckets as
    PartitionFilters — the literal IN list computed driver-side — so IO
    is the touched bucket directories, never the postings table. q123
    itself now returns an eagerly checkpointed k-row frame (the r12
    advisor's scratch-dir leak fix erases the upstream plan), so the pin
    reconstructs the gate row's serve step — the same build + topk the
    wrapper runs before its checkpoint."""
    import re

    from jsonify2ai_spark.operators.textsearch import ShardedBM25Index

    t = entry_mod.load_tables(spark, SF_DIR, ["documents"])
    idx = ShardedBM25Index.build(
        t["documents"], str(tmp_path / "q123pin"), n_buckets=16,
        impact_ordered=False,
    )
    df = idx.topk(entry_mod._SEARCH_QUERY, k=15)
    plan = plan_string(df)

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "term_bucket" in m.group(1), plan[:1500]
    assert "TakeOrderedAndProject" in plan  # top-k, no global sort
    assert "rangepartitioning" not in plan.lower()
    # and the gate wrapper still returns the right rows post-checkpoint
    out = entry_mod.queries()["q123_bm25_sharded"](spark, SF_DIR)
    assert out.count() == 15
    idx.close()


def test_q141_hard_negatives_broadcast_restriction_no_python(spark):
    """The mining batch's union vocabulary must broadcast into the corpus
    postings explode (a BroadcastHashJoin below the tf rollup), the
    query fan-out join must also be broadcast (query-terms side is
    batch-sized), and the whole plan stays JVM-side — no Python eval of
    any kind."""
    df = entry_mod.queries()["q141_hard_negatives"](spark, SF_DIR)
    p = plan_string(df, "simple")
    assert "BroadcastHashJoin" in p, p[:1500]
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p[:800]
    # top-k per query is a window rank filter, not a global sort+limit
    assert "RunningWindowFunction" in p or "Window" in p, p[:1500]


def test_q142_decontaminate_multi_single_corpus_explode(spark):
    """The multi-benchmark matrix must shingle the corpus ONCE: exactly
    one explode over the full documents relation (the three benchmark
    slices explode their own filtered subsets), and the tagged benchmark
    union joins as a broadcast."""
    df = entry_mod.queries()["q142_decontaminate_multi"](spark, SF_DIR)
    p = plan_string(df, "simple")
    assert "BroadcastHashJoin" in p, p[:1500]
    # corpus-side (unfiltered) explode appears once: count Generate nodes
    # that are NOT below a doc_id-filter (benchmark sides filter first)
    n_gen = p.count("Generate explode")
    assert n_gen == 4, (n_gen, p[:2000])  # 1 corpus + 3 filtered benches
