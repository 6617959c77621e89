"""Shared fixtures: one SparkSession + one DuckDB connection with the
fixture tables registered as views (mirrors the driver's harness,
SURVEY.md §5.2)."""

from __future__ import annotations

import os

import duckdb
import pytest

from mapreducepy_spark.io import TABLES
from mapreducepy_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="mapreducepy-spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
