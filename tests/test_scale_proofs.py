"""Scale-claim proofs: assertions that the documented 100 TB strategies are
what the plans actually do (not just docstring promises).

- IVF layout: partitioning the embedding table by cluster makes the probe
  filter a PARTITION PRUNE (PartitionFilters in the scan, only probed
  directories read).
- as-of join / sessionize: exactly ONE exchange (the key shuffle) — the
  inequality never becomes a join and no extra shuffle sneaks in.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from jsonify2ai_spark.operators.ann import ivf_assign
from jsonify2ai_spark.plans import node_count, plan_string
from tests.conftest import SF_DIR


def test_ivf_partitioned_layout_prunes(spark, tables, tmp_path):
    emb = tables["embeddings"]
    cents = [
        [float(x) for x in r[0]]
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").select("embedding").collect()
    ]
    path = str(tmp_path / "ivf_table")
    ivf_assign(emb, cents).write.partitionBy("cluster").parquet(path)
    dirs = {d for d in os.listdir(path) if d.startswith("cluster=")}
    assert len(dirs) > 1

    pruned = spark.read.parquet(path).filter(F.col("cluster").isin([0, 1]))
    plan = plan_string(pruned)
    assert "PartitionFilters" in plan and "cluster" in plan.split("PartitionFilters", 1)[1][:200]
    # the pruned scan returns exactly the probed cells' rows
    expect = spark.read.parquet(path).collect()
    got = pruned.collect()
    assert {r["cluster"] for r in got} <= {0, 1}
    assert len(got) == sum(1 for r in expect if r["cluster"] in (0, 1))


def test_asof_join_single_shuffle(spark):
    df = entry_mod.q40_asof_join(spark, SF_DIR)
    # one Exchange for the union's key partitioning; no join node at all
    assert node_count(df, "Exchange") == 1, plan_string(df)[:1500]
    plan = plan_string(df)
    assert "Join" not in plan or "BroadcastNestedLoop" not in plan


def test_sessionize_single_shuffle(spark):
    df = entry_mod.q39_sessionize(spark, SF_DIR)
    assert node_count(df, "Exchange") == 1, plan_string(df)[:1500]


def test_similarity_join_default_never_driver_materializes(spark, tables, monkeypatch):
    """Above max_broadcast_bytes, the auto strategy must route to the chunked
    block-GEMM — proven by poisoning toPandas: the broadcast path calls it,
    the chunked path must not."""
    import pyspark.sql.dataframe as df_mod

    from jsonify2ai_spark.operators.search import similarity_self_join

    emb = tables["embeddings"].limit(60)
    expected = {
        (r["a"], r["b"]): r["score"]
        for r in similarity_self_join(emb, 0.3, strategy="blas").collect()
    }

    def boom(self):
        raise AssertionError("driver-side toPandas() on the scale path")

    monkeypatch.setattr(df_mod.DataFrame, "toPandas", boom)
    got = {
        (r["a"], r["b"]): r["score"]
        for r in similarity_self_join(
            emb, 0.3, strategy="auto", max_broadcast_bytes=1, n_chunks=4
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_similarity_join_chunked_matches_blas(spark, tables):
    """Chunked block-GEMM is exact: same pairs, same 6-dp scores as the
    broadcast GEMM, for every chunk count including C > distinct rows."""
    from jsonify2ai_spark.operators.search import similarity_self_join

    emb = tables["embeddings"].limit(120)
    expected = sorted(
        map(tuple, similarity_self_join(emb, 0.25, strategy="blas").collect())
    )
    for c in (1, 3, 16):
        got = sorted(
            map(
                tuple,
                similarity_self_join(
                    emb, 0.25, strategy="chunked", n_chunks=c
                ).collect(),
            )
        )
        assert got == expected, f"n_chunks={c}"
