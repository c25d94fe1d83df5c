"""Shared Spark session for the suite (one JVM for all tests).

Mirrors the reference's deterministic test env (worker/tests/conftest.py:20-26
forces EMBED_DEV_MODE=1 so embeddings are pure functions of text): here
dev-mode hash embeddings are simply the default oracle mode.
"""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from jsonify2ai_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tables(spark):
    from jsonify2ai_spark.session import load_tables

    return load_tables(spark, SF_DIR)
