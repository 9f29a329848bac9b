"""CBO demonstration (VERDICT r6 task #7): table/column statistics
change the PLANNED join strategy — the class of decision AQE alone
cannot make at 100 TB.

AQE re-plans at runtime from ACTUAL shuffle sizes, but only after the
first stage has already materialized its shuffle output: a fact-table
shuffle that CBO would have avoided entirely (by broadcasting a
selectively-filtered dimension, or by reordering a join chain to join
the selective dimension first) still costs a full fact scan + shuffle
write before AQE can react. Cost-based planning from ANALYZE TABLE
statistics removes that shuffle at PLAN time. At 100 TB the difference
is "shuffle 100 TB once, then notice" vs "never shuffle it".

The test builds catalog tables (the stats carrier — path-based reads
have no catalog entry to attach statistics to), plans a query with a
highly selective dimension filter both without and with
ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS, and asserts the
physical strategy flips from shuffle join to broadcast join. Findings
recorded in SCALE.md §CBO.
"""

from __future__ import annotations

import pytest

from jobhouse_spark.tables import Tables

_CBO_CONFS = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    "spark.sql.cbo.planStats.enabled": "true",
    # a threshold small enough that only a STATS-aware estimate of the
    # filtered dimension qualifies for broadcast; the raw file-size
    # estimate (customer.parquet is ~33 KB at sf0.01) stays above it
    "spark.sql.autoBroadcastJoinThreshold": "8KB",
    "spark.sql.adaptive.enabled": "false",  # isolate the PLANNER decision
}


@pytest.fixture()
def cbo_tables(spark, oracle_sf_dir):
    # sf0.01: customer's file size (~33 KB) exceeds the 8 KB broadcast
    # threshold, so WITHOUT stats the no-selectivity estimate forbids
    # broadcasting the filtered dimension (at sf0.001 the whole file is
    # already under any reasonable threshold and nothing can flip)
    t = Tables(spark, oracle_sf_dir)
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo_demo")
    for name in ("orders", "customer", "nation"):
        getattr(t, name).write.mode("overwrite").saveAsTable(f"cbo_demo.{name}")
    saved = {k: spark.conf.get(k, None) for k in _CBO_CONFS}
    for k, v in _CBO_CONFS.items():
        spark.conf.set(k, v)
    yield "cbo_demo"
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
    spark.sql("DROP DATABASE cbo_demo CASCADE")


def _plan(spark, db: str) -> str:
    # orders is the "fact"; customer is filtered to a handful of rows.
    # Without stats the filter's size estimate equals the full table's
    # file size, so the planner shuffles both sides.
    df = spark.sql(
        f"""
        SELECT o.o_orderkey, c.c_name, n.n_name
        FROM {db}.orders o
        JOIN {db}.customer c ON o.o_custkey = c.c_custkey
        JOIN {db}.nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_custkey < 10
        """
    )
    return df._jdf.queryExecution().executedPlan().toString()


def test_column_stats_flip_shuffle_join_to_broadcast(spark, cbo_tables):
    db = cbo_tables
    before = _plan(spark, db)
    assert "SortMergeJoin" in before or "ShuffledHashJoin" in before, (
        "precondition lost: without stats the filtered dim should NOT "
        "qualify for broadcast under the 8KB threshold\n" + before
    )

    for name in ("orders", "customer", "nation"):
        spark.sql(
            f"ANALYZE TABLE {db}.{name} COMPUTE STATISTICS FOR ALL COLUMNS"
        )
    after = _plan(spark, db)
    assert "BroadcastHashJoin" in after and "SortMergeJoin" not in after, (
        "column stats (rowCount x equality selectivity ~ k/ndv) should "
        "shrink the filtered dimension below the broadcast threshold at "
        "PLAN time\n" + after
    )


def test_stats_survive_for_verification(spark, cbo_tables):
    """ANALYZE actually attached catalog statistics (rowCount visible in
    DESCRIBE EXTENDED) — guards against silently testing nothing."""
    db = cbo_tables
    spark.sql(f"ANALYZE TABLE {db}.customer COMPUTE STATISTICS")
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {db}.customer").collect()
    stats = [r for r in rows if r.col_name == "Statistics"]
    assert stats and "rows" in stats[0].data_type, stats
