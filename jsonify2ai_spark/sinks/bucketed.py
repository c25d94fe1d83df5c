"""Native Spark bucketing: shuffle-free co-located joins and aggregations.

The chunks table's `bucket=N/` directory layout (operators/upsert.py) gives
hash-pruned REWRITES; this module adds Spark's catalog bucketing, which gives
hash-aligned READS: two tables bucketed by the same key into the same bucket
count join with ZERO Exchange on either side, and a groupBy on the bucket key
aggregates without a shuffle. At 100 TB that turns every
chunks-join-embeddings / group-by-document query from a full shuffle of the
fact table into a map-side merge — the single biggest recurring cost in a
document pipeline, paid once at write time instead of per query.

Not in the reference (single-process Qdrant has no shuffles — SURVEY §4);
this is the Spark-native answer to its "collection co-residency" layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    path: str | None = None,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    analyze: bool = True,
    analyze_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as a catalog table bucketed by ``bucket_col``.

    ``sort_cols`` additionally sorts within each bucket file (turns the
    bucket-aligned join's per-task sort into a no-op for sort-merge, and
    gives min/max-pruned point lookups on the sort key).
    ``path`` makes it an external table (data outside the warehouse dir).
    ``analyze`` computes table stats after the write (see
    :func:`analyze_table`); ``analyze_cols`` adds column stats — defaults to
    the bucket column (it is by construction the downstream join key).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
    if analyze:
        analyze_table(df.sparkSession, table, analyze_cols or [bucket_col])


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed catalog table. The bucket spec is only honored through
    the catalog — reading the parquet path directly loses it."""
    return spark.table(table)


def analyze_table(
    spark: SparkSession, table: str, columns: list[str] | None = None
) -> None:
    """``ANALYZE TABLE ... COMPUTE STATISTICS`` (+ ``FOR COLUMNS`` when
    given): feed the cost-based optimizer.

    Table-level stats (sizeInBytes, rowCount) replace the raw file-size
    estimate; column stats (ndv, min/max, null count) are what let CBO
    estimate filter and join selectivity — the difference between "this
    filtered fact is 6 GB on disk, sort-merge it" and "the predicate keeps
    ~1/1000 of it, broadcast it". Run after every bulk write of a table that
    joins downstream (write_bucketed does this for you); the stats scan is a
    one-time metadata pass, the bad join plan is paid on every query.
    Column-stat candidates: join keys and frequently-filtered columns.
    """
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        spark.sql(
            f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {', '.join(columns)}"
        )
