"""Table lifecycle: ensure / validate / repair (SURVEY §2.7 K2).

Reference: collection ensure-or-create with dimension/metric validation,
schema-mismatch detection, and optional drop-recreate behind a flag
(worker/app/services/qdrant_client.py:75-203, qdrant_init.py:22-52). The
Parquet analog: a table directory either exists with a compatible schema, is
created empty with the expected schema, or — only when explicitly allowed —
is dropped and recreated. Readers never see a half-state (create writes a
complete empty parquet footer before any data lands).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class SchemaMismatch(Exception):
    """Existing table schema is incompatible with the expected one."""


def table_exists(spark: SparkSession, path: str) -> bool:
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:
        return False


def _compatible(existing: StructType, expected: StructType) -> bool:
    """Expected fields must exist with identical types (extra existing
    columns are tolerated — additive evolution is fine, type drift is not)."""
    have = {f.name: f.dataType for f in existing.fields}
    return all(f.name in have and have[f.name] == f.dataType for f in expected.fields)


def ensure_table(
    spark: SparkSession,
    path: str,
    schema: StructType,
    recreate_bad: bool = False,
) -> DataFrame:
    """K2: return a reader for ``path``, creating an empty table with
    ``schema`` if missing. Incompatible existing schema raises
    SchemaMismatch unless ``recreate_bad`` (the reference's
    QDRANT_RECREATE_BAD flag) — then the table is dropped and recreated.
    """
    if table_exists(spark, path):
        existing = spark.read.parquet(path)
        if _compatible(existing.schema, schema):
            return existing
        if not recreate_bad:
            raise SchemaMismatch(
                f"{path}: has {existing.schema.simpleString()}, "
                f"expected {schema.simpleString()}"
            )
        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    spark.createDataFrame([], schema).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
