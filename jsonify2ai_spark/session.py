"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]``; the configs below are the ones that matter at
cluster scale too: AQE for runtime re-planning (skew joins, coalesced shuffles),
Arrow for every pandas-UDF boundary, and an explicit shuffle-partition count that
callers override per deployment (rule of thumb: 2-3x total cores, sized so a
shuffle partition stays in the low hundreds of MB at the target data scale).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "jsonify2ai_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Respects ``SPARK_GRAFT_CPUS`` for local core count. On a real cluster the
    master/resource configs come from spark-submit; only the SQL-level knobs
    here carry over.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime shuffle coalescing + skew-join splitting. At 100 TB this is
        # what keeps a salted/skewed groupBy from stalling on one reducer.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow makes every pandas-UDF boundary a columnar batch transfer.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Broadcast anything dimension-sized; AQE converts post-filter too.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Stable timestamp semantics for the DuckDB oracle comparison.
        .config("spark.sql.session.timeZone", "UTC")
        # The driver's synthetic parquet stores TIMESTAMP(NANOS); Spark has no
        # nanos type, so read them as int64 nanos and convert on load.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # FileOutputCommitter v1 renames every task's output sequentially on
        # the driver during commitJob; v2 renames in the tasks, in parallel.
        # Measured on the 256-dir band-table write: 8.2 s -> 4.3 s (same
        # rows). Safe here: every store commit becomes visible only through
        # the meta write that FOLLOWS the data write (single-writer
        # contract), so a crashed v2 write leaves an unreferenced dir, never
        # a half-visible table. Cluster deployments on object stores should
        # override with a manifest committer via SPARK_GRAFT_COMMITTER_V.
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
            os.environ.get("SPARK_GRAFT_COMMITTER_V", "2"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def local_rows_df(spark: SparkSession, rows, schema):
    """A DataFrame over driver-local rows in ONE partition.

    ``spark.createDataFrame(rows, schema)`` parallelizes local data into
    ``defaultParallelism`` slices that are each evaluated THROUGH THE PYTHON
    WORKER BOUNDARY; the ``.coalesce(1)`` the store meta-writes used to add
    then made a single task evaluate all 32 parent slices sequentially —
    ~0.2 s of worker round-trip per slice, a measured 5–7 s floor on every
    one-row commit (OPTIMIZATION_r15.md). One explicit slice is one
    round-trip: the same write costs ~0.3 s. Use for meta rows, query-term
    frames, tombstone lists — anything driver-sized that feeds a plan or a
    single-file write.
    """
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=1), schema
    )


def ensure_min_partitions(df, n: int | None = None):
    """Widen tiny inputs so compute-bound Arrow kernels use every core.

    A small parquet file arrives as ONE input partition (a row group is not
    splittable), which serializes any per-row kernel onto a single core —
    measured 2.5x on minhash signatures at sf0.1. Round-robin repartition up
    to the session's default parallelism only when the input has fewer
    partitions: a no-op at real scale, where the scan already yields
    thousands of partitions; never shrinks an already-parallel input.
    """
    if n is None:
        n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


# Timestamp columns in the driver's parquet; surfaced to queries as proper
# TimestampType (microsecond, session-UTC) columns regardless of whether the
# generator emitted TIMESTAMP(NANOS) (reads as bigint under nanosAsLong) or
# TIMESTAMP_NTZ (timestamp[us] without zone).
_NANO_TS_COLS: dict[str, list[str]] = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Register the driver's synthetic parquet tables as temp views.

    Returns dict name -> DataFrame. Views let both the DataFrame API and
    ``spark.sql`` paths address the same tables. Nanosecond timestamps are
    converted to TimestampType (exact here — the generator emits microsecond
    precision stored as nanos).
    """
    from pyspark.sql import functions as F

    # The driver's harness passes its OWN SparkSession (not one from get_spark),
    # so the confs the reads depend on must be set here, on the caller's session.
    # Both are runtime-settable SQL confs.
    #  - nanosAsLong: the synthetic parquet stores TIMESTAMP(NANOS), which Spark
    #    cannot read natively; read as int64 nanos, converted below.
    #  - timeZone: date_trunc/date_format results must match the UTC-running
    #    DuckDB oracle regardless of the host session's zone.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # TIMESTAMP_NTZ detection below relies on NTZ inference being on (it is by
    # default on Spark >=3.4, but a caller session may have disabled it, in
    # which case the column would read as plain 'timestamp' and silently skip
    # both conversion branches).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")

    all_names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    out = {}
    for name in names or all_names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            for c in _NANO_TS_COLS.get(name, []):
                if c not in df.columns:
                    continue
                dt = dict(df.dtypes)[c]
                if dt == "bigint":
                    # Integer division: float division has a 256 ns double ULP
                    # at epoch-nanos magnitude, which can truncate micros off
                    # by one. `div` is exact 64-bit integer division.
                    df = df.withColumn(
                        c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
                    )
                elif dt == "timestamp_ntz":
                    # timestamp[us] with no zone: the cast interprets the
                    # wall-clock in the session zone — pinned to UTC above —
                    # so unix_micros/double casts and the DuckDB oracle agree.
                    # Explicit type object: cast('timestamp') resolves via
                    # spark.sql.timestampType and would no-op if the caller's
                    # session defaults to TIMESTAMP_NTZ.
                    from pyspark.sql.types import TimestampType

                    df = df.withColumn(c, F.col(c).cast(TimestampType()))
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
