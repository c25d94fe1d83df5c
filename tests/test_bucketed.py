"""Native bucketing scale proof: co-located joins and aggs with ZERO shuffle.

The claim that matters at 100 TB: after paying one bucketed write, every
equi-join and group-by on the bucket key runs with no Exchange on the fact
side. Asserted on the physical plan, not argued in a comment.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from jsonify2ai_spark.plans import node_count
from jsonify2ai_spark.sinks.bucketed import read_bucketed, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tables, tmp_path):
    """documents + a per-doc stats side, both bucketed by doc_id into the
    same bucket count (unique table names — the catalog is session-shared)."""
    suffix = uuid.uuid4().hex[:8]
    t_docs, t_stats = f"docs_b_{suffix}", f"stats_b_{suffix}"
    docs = tables["documents"].select("doc_id", "source", "n_chars")
    stats = tables["documents"].select(
        "doc_id", F.length("text").alias("text_len")
    )
    write_bucketed(docs, t_docs, "doc_id", n_buckets=4, path=str(tmp_path / "d"))
    write_bucketed(stats, t_stats, "doc_id", n_buckets=4, path=str(tmp_path / "s"))
    yield t_docs, t_stats
    spark.sql(f"DROP TABLE IF EXISTS {t_docs}")
    spark.sql(f"DROP TABLE IF EXISTS {t_stats}")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    t_docs, t_stats = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = read_bucketed(spark, t_docs).join(
            read_bucketed(spark, t_stats), "doc_id"
        )
        assert node_count(joined, "Exchange") == 0, "bucketed join must not shuffle"
        assert joined.count() == read_bucketed(spark, t_docs).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    t_docs, _ = bucketed_pair
    agg = (
        read_bucketed(spark, t_docs)
        .groupBy("doc_id")
        .agg(F.sum("n_chars").alias("c"))
    )
    assert node_count(agg, "Exchange") == 0, "bucketing satisfies the agg distribution"
    assert agg.count() > 0


def test_unbucketed_baseline_does_shuffle(spark, tables):
    """Control: the same join/agg over plain parquet DOES exchange — so the
    zero-Exchange assertions above are the bucketing, not a quirk."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = tables["documents"].select("doc_id", "n_chars")
        stats = tables["documents"].select("doc_id", F.length("text").alias("l"))
        assert node_count(docs.join(stats, "doc_id"), "Exchange") > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
