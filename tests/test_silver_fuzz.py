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
from tools.silver_fuzz import (
    SILVER_ARR_SPEC,
    SILVER_FKS,
    SILVER_IVAL_SPEC,
    SILVER_JSON_SPEC,
    SILVER_PK,
    SILVER_TABLES,
    materialize,
)

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
    prev = qf.set_universe(SILVER_TABLES, SILVER_PK, SILVER_FKS,
                           json_spec=SILVER_JSON_SPEC,
                           arr_spec=SILVER_ARR_SPEC,
                           ival_spec=SILVER_IVAL_SPEC)
    try:
        yield con, qf.build_pools(con)
    finally:
        qf.restore_universe(prev)
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


def test_silver_v9_json_hof_shapes_agree(spark, silver_env):
    """v9 (round-13): the spec-driven JSON / HOF / interval / v7
    composition shapes over the PIPELINE surface — raw_json is the
    bronze envelope's raw_content, req_lens a derived array<int>. A
    fixed seed block over ONLY these shapes keeps the semi-structured
    silver surface pinned in CI (wide campaigns in QUERYFUZZ.json)."""
    con, pools = silver_env
    v9_shapes = ["json_path", "interval_arith", "array_hof",
                 "win_json", "win_hof", "setop_json"]
    failures = qf.run_campaign(
        spark, con, pools, range(1, 19), verbose=False, shapes=v9_shapes,
    )
    assert not failures, "\n".join(
        f"seed={s}: {why}\n  {sql}" for s, sql, why in failures
    )
