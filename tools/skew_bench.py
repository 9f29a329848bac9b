"""Skew-mitigation measurement (SCALE.md): one hot user at ~30% of a
10x events table, joined against a per-user dim with broadcast disabled
(simulating a dim too big to broadcast — the only regime where join
skew exists; a broadcastable dim never shuffles the fact side).

Scenarios, each median-of-3 noop-sink walls:
  plain_no_aqe   - shuffle join, AQE skew splitting OFF (the naive plan:
                   one reducer gets the hot key's 30%)
  plain_aqe      - shuffle join, AQE skewJoin ON (runtime split of the
                   oversized partition — Spark's built-in answer)
  salted         - operators/skew.salted_join, n_salts=16 (explicit
                   content-derived salt: the hot key spreads over 16
                   reducers regardless of AQE's thresholds)

Also reports whether AQE actually marked the join skewed ("skew=true"
in the final adaptive plan) and the hot-key reducer bound before/after
salting. Writes one JSON line; paste the table into SCALE.md.

Usage: python tools/skew_bench.py [src_sf_dir] [workdir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

HOT_USER = 7777
FACTOR = 10


def build_skew_table(src: str, dst_dir: str) -> str:
    """10x events with ~30% of rows reassigned to one hot user."""
    os.makedirs(dst_dir, exist_ok=True)
    out = os.path.join(dst_dir, "events_skewed.parquet")
    if not os.path.exists(out):
        con = duckdb.connect()
        con.execute(
            f"""
            COPY (
              SELECT CAST(event_id + i * 100000000 AS BIGINT) AS event_id,
                     CAST(CASE WHEN (event_id + i) % 10 < 3 THEN {HOT_USER}
                          ELSE user_id END AS BIGINT) AS user_id,
                     event_type, value, props
              FROM read_parquet('{src}/events.parquet')
              CROSS JOIN (SELECT unnest(range({FACTOR})) AS i)
            ) TO '{out}' (FORMAT PARQUET)
            """
        )
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jh_skew"
    fact_path = build_skew_table(src, work)

    from pyspark.sql import functions as F

    from jobhouse_spark.operators.skew import salted_join
    from jobhouse_spark.session import get_spark

    spark = get_spark(app_name="jh_skew_bench")
    fact = spark.read.parquet(fact_path)
    n = fact.count()
    hot_n = fact.filter(F.col("user_id") == HOT_USER).count()
    # Materialized dim, NOT an inline distinct: AQE's OptimizeSkewedJoin
    # only matches SortMergeJoin(Sort(shuffle), Sort(shuffle)); a
    # post-shuffle aggregate between the shuffle and the join (what an
    # inline .distinct() leaves on the dim side) defeats the pattern and
    # the skewed partition is NEVER split — measured below as the
    # "blocked" scenario. That blind spot is exactly where the explicit
    # salt earns its keep.
    dim_path = os.path.join(work, "dim.parquet")
    if not os.path.exists(dim_path):
        fact.select("user_id").distinct().withColumn(
            "segment", F.pmod(F.col("user_id"), F.lit(13))
        ).write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path)
    dim_inline = fact.select("user_id").distinct().withColumn(
        "segment", F.pmod(F.col("user_id"), F.lit(13))
    )

    def _restore(old: dict[str, str | None]) -> None:
        for k, v in old.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)

    def timed(make_df, confs: dict[str, str]) -> float:
        old = {k: spark.conf.get(k, None) for k in confs}
        walls = []
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            for _ in range(3):
                t0 = time.perf_counter()
                make_df().write.format("noop").mode("overwrite").save()
                walls.append(time.perf_counter() - t0)
        finally:
            _restore(old)
        return round(statistics.median(walls), 3)

    # disable BOTH broadcast gates: the static planner threshold AND
    # AQE's runtime conversion (otherwise AQE broadcasts the tiny dim at
    # runtime and there is no shuffle left to skew)
    no_bcast = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }

    results = {
        "rows": n,
        "hot_rows": hot_n,
        "hot_share": round(hot_n / n, 3),
        "plain_no_aqe_s": timed(
            lambda: fact.join(dim, "user_id"),
            {**no_bcast, "spark.sql.adaptive.skewJoin.enabled": "false"},
        ),
        "plain_aqe_s": timed(
            lambda: fact.join(dim, "user_id"),
            {**no_bcast, "spark.sql.adaptive.skewJoin.enabled": "true"},
        ),
        "salted_s": timed(
            lambda: salted_join(fact, dim, "user_id", n_salts=16), no_bcast
        ),
        # AQE's skew split only engages above skewedPartitionThresholdInBytes
        # (256 MB default) — far above any local-test partition. Tuned to the
        # data size it demonstrably splits (see aqe_marked_skew_tuned below).
        "plain_aqe_tuned_s": timed(
            lambda: fact.join(dim, "user_id"),
            {
                **no_bcast,
                "spark.sql.adaptive.skewJoin.enabled": "true",
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1MB",
            },
        ),
    }

    # Did AQE actually mark/split the skewed partition? Observe the
    # FINAL adaptive plan: drain the frame's own iterator (a .write uses
    # a separate query execution whose final plan explain() can't see),
    # then explain() prints isFinalPlan=true with skew marks.
    def final_plan_skewed(join_df) -> bool:
        import contextlib  # noqa: PLC0415
        import io  # noqa: PLC0415

        # full width on purpose: column pruning would shrink the shuffle
        # below the skew threshold and mask the split
        for _ in join_df.toLocalIterator():
            pass
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            join_df.explain()
        return "skew=true" in buf.getvalue()

    tuned = {
        **no_bcast,
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1MB",
    }
    old = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        results["aqe_split_skew_tuned"] = final_plan_skewed(fact.join(dim, "user_id"))
        # same join, dim deduped inline: the post-shuffle aggregate on
        # the dim side breaks the SMJ(sort(shuffle), sort(shuffle))
        # pattern OptimizeSkewedJoin requires — no split
        results["aqe_split_blocked_by_dim_agg"] = not final_plan_skewed(
            fact.join(dim_inline, "user_id")
        )
    finally:
        _restore(old)

    # reducer bound: rows landing on the largest single (join-key[, salt])
    # group — the size of the biggest shuffle partition's hot slice
    results["max_key_rows_unsalted"] = hot_n
    from jobhouse_spark.operators.skew import _row_salt

    salted = fact.withColumn("__salt", _row_salt(fact, 16, None))
    results["max_key_rows_salted"] = (
        salted.groupBy("user_id", "__salt")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
