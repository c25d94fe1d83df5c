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
