"""Shared fixtures: one SparkSession + one DuckDB connection per test run.

Mirrors the reference's WholeStageTransformerSuite setup (one session, temp
views per parquet dir, differential compare — SURVEY §5).
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from incubator_gluten_spark.session import get_session

    spark = get_session(app_name="incubator-gluten-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    from incubator_gluten_spark.testing.compare import duckdb_connection

    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
