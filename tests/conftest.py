"""Shared fixtures: one SparkSession per test session, DuckDB with the
fixture tables registered as views, and the sf_dir roots."""

from __future__ import annotations

import os

import duckdb
import pytest

from etl_template_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# sf0.001 for fast unit iteration; the oracle-differential suite honors
# SPARK_GRAFT_TEST_SF_DIR (set to sf0.01 to mirror the driver's gate).
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session", autouse=True)
def _refresh_correctness_snapshot():
    """Stamp QUERY_CONTENT_HASHES.json for freshly recorded queries at
    the first test run of a round (builders run tests before editing;
    the refresh itself refuses to stamp modules already edited vs git
    HEAD, so a late run is safe too — see verification.refresh_snapshot)."""
    try:
        from etl_template_spark import verification

        verification.refresh_snapshot()
    except Exception:
        pass  # never block tests on snapshot bookkeeping


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="etl-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()
