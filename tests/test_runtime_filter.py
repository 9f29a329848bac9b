"""Runtime Bloom-filter join pruning demonstration (SCALE.md §runtime
filters) — the third leg of the optimizer-evidence set, next to CBO
(plan-time stats) and AQE (post-shuffle re-planning).

When a join's build side is small AFTER a selective filter but the
join still executes as a shuffle join (too big to broadcast, or
broadcast disabled), Spark 3.3+ can inject a Bloom filter built from
the build side's join keys INTO the probe side's scan stage
(spark.sql.optimizer.runtime.bloomFilter.enabled). At 100 TB this is
the mechanism that keeps a selective dim join from shuffling the full
fact table: rows that cannot match are dropped at the scan, before the
exchange — the same effect dynamic partition pruning has for
partitioned layouts, generalized to unpartitioned columns.

The test asserts the mechanism on this exact build: with the feature
on, the fact side's plan gains a might_contain(...) filter fed by a
bloom_filter_agg subquery over the filtered dimension; results are
bit-identical with the feature off.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # the fact side here is a few MB, far under the 10 GB default gate
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # force the shuffle join: broadcast joins don't need (or get) the
    # runtime filter — the broadcast hash set IS the filter
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def rf_tables(spark, tmp_path):
    fact_path = str(tmp_path / "rf_fact")
    dim_path = str(tmp_path / "rf_dim")
    (
        spark.range(500_000)
        .select(
            F.col("id"),
            (F.col("id") % 50_000).alias("fk"),
            (F.col("id") * 7 % 1000).alias("v"),
        )
        .write.mode("overwrite")
        .parquet(fact_path)
    )
    (
        spark.range(50_000)
        .select(
            F.col("id").alias("dk"),
            (F.col("id") % 97).alias("attr"),
        )
        .write.mode("overwrite")
        .parquet(dim_path)
    )
    # spark.conf.get(k, None) returns the built-in SQLConf DEFAULT for
    # known keys (never None), so that idiom would leave the keys
    # explicitly pinned to default values after teardown. SQLConf's
    # settings map holds only EXPLICITLY-set entries; use it to decide
    # restore-value vs unset.
    jconf = spark._jsparkSession.sessionState().conf()
    saved = {k: spark.conf.get(k) if jconf.contains(k) else None for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield fact_path, dim_path
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _join(spark, fact_path, dim_path):
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("attr") == 13)
    return fact.join(dim, fact.fk == dim.dk).groupBy().agg(
        F.count("*").alias("n"), F.sum("v").alias("sv")
    )


def test_bloom_filter_injected_and_semantics_unchanged(spark, rf_tables):
    fact_path, dim_path = rf_tables
    df_on = _join(spark, fact_path, dim_path)
    plan_on = df_on._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan_on, (
        "runtime bloom filter not injected into the probe side"
    )
    row_on = df_on.collect()[0]

    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    df_off = _join(spark, fact_path, dim_path)
    plan_off = df_off._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" not in plan_off
    row_off = df_off.collect()[0]
    assert (row_on["n"], row_on["sv"]) == (row_off["n"], row_off["sv"])
    assert row_on["n"] > 0  # non-degenerate: the filter had rows to prune to
