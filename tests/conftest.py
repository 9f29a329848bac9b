"""Shared fixtures: one SparkSession per test session, DuckDB per sf dir."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobhouse_spark.session import get_spark  # noqa: E402
from tests.oracle import duckdb_connect  # noqa: E402

SF_SMOKE = os.environ.get("JH_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("JH_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="jobhouse_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def oracle_sf_dir() -> str:
    return SF_ORACLE


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb_connect(sf_dir)
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_oracle(oracle_sf_dir):
    con = duckdb_connect(oracle_sf_dir)
    yield con
    con.close()
