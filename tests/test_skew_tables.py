"""Skew-mitigation operators (salted agg/join), K2 table ensure, A5 summary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from jsonify2ai_spark.operators.skew import salted_agg, salted_join
from jsonify2ai_spark.sinks.tables import SchemaMismatch, ensure_table, table_exists


def test_salted_agg_matches_plain_groupby(spark, tables):
    ev = tables["events"]
    plain = {
        r["event_type"]: (r["n"], r["total"], r["vmax"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], round(r["total"], 2), r["vmax"])
        for r in salted_agg(
            ev,
            ["event_type"],
            {
                "n": (F.count(F.lit(1)), "sum"),
                "total": (F.sum("value"), "sum"),
                "vmax": (F.max("value"), "max"),
            },
            n_salts=8,
            salt_basis=["event_id"],
        ).collect()
    }
    # doubles: compare rounded totals (salting changes summation order)
    assert {k: (v[0], v[2]) for k, v in plain.items()} == {
        k: (v[0], v[2]) for k, v in salted.items()
    }
    for k in plain:
        assert abs(plain[k][1] - salted[k][1]) < 0.05


def test_salted_agg_rejects_bad_combine(spark, tables):
    with pytest.raises(ValueError):
        salted_agg(
            tables["events"], ["event_type"], {"a": (F.avg("value"), "avg")}
        ).collect()


def test_salted_join_row_identical(spark, tables):
    ev = tables["events"].select("event_id", "user_id", "event_type")
    dim = tables["events"].select("event_type").distinct().withColumn(
        "label", F.concat(F.lit("type:"), F.col("event_type"))
    )
    plain = sorted(
        (r["event_id"], r["label"])
        for r in ev.join(dim, "event_type").collect()
    )
    salted = sorted(
        (r["event_id"], r["label"])
        for r in salted_join(ev, dim, on=["event_type"], n_salts=8).collect()
    )
    assert plain == salted


SCHEMA = StructType(
    [StructField("id", StringType(), True), StructField("n", IntegerType(), True)]
)


def test_ensure_table_creates_and_validates(spark, tmp_path):
    path = str(tmp_path / "tbl")
    assert not table_exists(spark, path)
    t = ensure_table(spark, path, SCHEMA)
    assert t.count() == 0 and table_exists(spark, path)

    # compatible re-ensure: no-op
    spark.createDataFrame([("a", 1)], SCHEMA).write.mode("append").parquet(path)
    assert ensure_table(spark, path, SCHEMA).count() == 1

    # incompatible: raises, or recreates when allowed
    bad = StructType([StructField("id", IntegerType(), True)])
    with pytest.raises(SchemaMismatch):
        ensure_table(spark, path, bad)
    assert ensure_table(spark, path, bad, recreate_bad=True).count() == 0


def test_ingest_summary(spark, tmp_path):
    from jsonify2ai_spark.sources.ingest import chunk_parsed, ingest_summary, parse_files, read_binary_files

    d = tmp_path / "drop"
    d.mkdir()
    (d / "a.md").write_text("hello world " * 100)
    (d / "b.csv").write_text("x,y\n1,2\n")
    docs = parse_files(read_binary_files(spark, str(d)))
    chunks = chunk_parsed(docs, size=200, overlap=40)
    row = ingest_summary(docs, chunks).collect()[0]
    assert row["files_scanned"] == 2 and row["documents_seen"] == 2
    assert row["documents_skipped"] == 0 and row["skip_reasons"] == []
    assert row["chunks_emitted"] >= 2
    assert row["per_kind"]["csv"] >= 1 and row["per_kind"]["text"] >= 1


def test_salted_ops_null_keys_and_values(spark):
    """Adversarial parity: NULL group keys, NULL values, one hot key.
    Salted forms must agree with the plain forms on all of them (xxhash64
    hashes NULL deterministically; inner-join NULL keys drop in BOTH forms)."""
    rows = (
        [(None, None)] * 3
        + [(None, 5.0)]
        + [("hot", float(i % 7)) for i in range(500)]
        + [("cold", -1.5), ("cold", None)]
    )
    df = spark.createDataFrame(rows, "k string, v double")

    plain = {
        (r["k"],): (r["n"], r["vmin"], r["vmax"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.min("v").alias("vmin"), F.max("v").alias("vmax"))
        .collect()
    }
    salted = {
        (r["k"],): (r["n"], r["vmin"], r["vmax"])
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": (F.count(F.lit(1)), "sum"),
                "vmin": (F.min("v"), "min"),
                "vmax": (F.max("v"), "max"),
            },
            n_salts=4,
        ).collect()
    }
    assert plain == salted

    dim = spark.createDataFrame([("hot", 1), ("cold", 2)], "k string, tag int")
    plain_j = sorted(
        ((r["k"], r["v"], r["tag"]) for r in df.join(dim, "k").collect()), key=repr
    )
    salted_j = sorted(
        ((r["k"], r["v"], r["tag"]) for r in salted_join(df, dim, on=["k"], n_salts=4).collect()),
        key=repr,
    )
    assert plain_j == salted_j
