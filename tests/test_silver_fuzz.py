"""Grammar-v8 silver-universe fuzzing regression net
(tools/silver_fuzz.py; wide campaigns + lessons in COVERAGE.md).

The silver substrate is the engine's OWN bronze->silver output — the
campaign that caught the 1-ULP DuckDB decimal-literal lesson on its
first run (COVERAGE.md generator-contract lesson #6). A fixed seed
block keeps that surface pinned in CI; the universe swap is restored
in teardown so the TPC-H fuzz tests in this same process see the
default tables."""

from __future__ import annotations

import duckdb
import pytest

from tools import query_fuzz as qf
from tools.silver_fuzz import SILVER_FKS, SILVER_PK, SILVER_TABLES, materialize

SEED_BLOCKS = [(1, 12), (13, 25)]


@pytest.fixture(scope="module")
def silver_env(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("silver_fuzz"))
    materialize(spark, root, enlarge=0)
    con = duckdb.connect()
    for t in SILVER_TABLES:
        spark.read.parquet(f"{root}/{t}").createOrReplaceTempView(t)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{root}/{t}/*.parquet')"
        )
    prev = qf.set_universe(SILVER_TABLES, SILVER_PK, SILVER_FKS)
    try:
        yield con, qf.build_pools(con)
    finally:
        qf.set_universe(*prev)
        con.close()


@pytest.mark.parametrize(("lo", "hi"), SEED_BLOCKS)
def test_silver_fuzzed_queries_agree(spark, silver_env, lo, hi):
    con, pools = silver_env
    failures = qf.run_campaign(
        spark, con, pools, range(lo, hi + 1), verbose=False,
        shapes=qf.GENERIC_SHAPES,
    )
    assert not failures, "\n".join(
        f"seed={s}: {why}\n  {sql}" for s, sql, why in failures
    )


def test_seed_19_boundary_literal_regression(spark, silver_env):
    """Seed 19 is the catch: a BETWEEN whose endpoint is a stored
    double sampled from the areas rollup. Under the pre-v8 grammar
    DuckDB's DECIMAL(17,11) literal cast dropped the boundary row;
    the e-notation respelling must keep it green forever."""
    con, pools = silver_env
    failures = qf.run_campaign(
        spark, con, pools, [19], verbose=False, shapes=qf.GENERIC_SHAPES
    )
    assert not failures, failures
