"""Concurrent-query evidence (VERDICT r7 task #5): a 100 TB cluster
serves many queries at once; all prior measurements were serial.

Runs a 6-query mix (join/agg/window/sort/dedup/contamination — distinct
shuffle shapes, so they genuinely compete) three ways in ONE process:

  serial     — one after another on the shared session (the baseline)
  concurrent — all six at once from Python threads (Spark schedules
               concurrent jobs from one SparkContext natively)

and reports aggregate wall + per-query interference (concurrent wall /
serial wall). Scheduler mode is pinned at context start, so comparing
FIFO vs FAIR takes two processes:

  python tools/concurrency_bench.py FIFO
  python tools/concurrency_bench.py FAIR

--bucketed=BASE (round 10) re-registers an existing bucketed at-rest
layout (written by tools/bucket_bench.py under BASE/{lineitem,orders})
as external CLUSTERED BY tables plus jhbkt_-prefixed views for the
rest, and runs the whole mix through the Tables "table:jhbkt_" catalog
scheme — same query code, bucketed layout — so FIFO/FAIR interference
can be compared bucketed vs not: the layout deletes the big-side
shuffles, which is exactly the resource the queries fight over.

Under FIFO, concurrent jobs still interleave (task-level), but a large
early-submitted stage can starve later ones; FAIR round-robins task
slots across pools (each thread sets its own spark.scheduler.pool), so
short queries are not stuck behind long scans — the prescription for
multi-tenant sessions (see session.py note + SCALE.md table).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobhouse_spark.queries import all_queries  # noqa: E402
from jobhouse_spark.session import get_spark  # noqa: E402
from jobhouse_spark.tables import Tables  # noqa: E402

_args = [a for a in sys.argv[1:] if not a.startswith("--")]
MODE = (_args[0] if _args else "FIFO").upper()
DATA_DIR = _args[1] if len(_args) > 1 else "/tmp/jh_scale_30x"
BUCKETED_BASE = next((a.split("=", 1)[1] for a in sys.argv
                      if a.startswith("--bucketed=")), None)
BUCKETS = int(next((a.split("=")[1] for a in sys.argv
                    if a.startswith("--buckets=")), "64"))

QUERY_MIX = (
    "g1_groupby_agg",
    "q18_large_volume_customer",
    "w4_topk_per_group",
    "o1_global_sort",
    "l1_exact_dedup",
    "l13_contamination_overlap",
)


def main() -> None:
    assert MODE in ("FIFO", "FAIR"), MODE
    spark = get_spark(
        app_name=f"concurrency_{MODE}",
        extra_conf={"spark.scheduler.mode": MODE},
    )
    qs = all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    data_loc = DATA_DIR
    if BUCKETED_BASE:
        # external bucketed tables over the layout bucket_bench wrote
        # (bucket ids are encoded in the part-file names, so a CREATE
        # TABLE ... CLUSTERED BY ... LOCATION re-attaches the existing
        # files with their bucket spec intact); everything else becomes
        # a same-prefix temp view over the plain corpus
        bucketed = {"lineitem": "l_orderkey", "orders": "o_orderkey"}
        for tbl, key in bucketed.items():
            loc = os.path.join(BUCKETED_BASE, tbl)
            ddl = spark.read.parquet(loc)._jdf.schema().toDDL()
            spark.sql(f"DROP TABLE IF EXISTS jhbkt_{tbl}")
            spark.sql(
                f"CREATE TABLE jhbkt_{tbl} ({ddl}) USING parquet "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                f"INTO {BUCKETS} BUCKETS LOCATION '{loc}'"
            )
        for tbl in ("customer", "supplier", "part", "nation", "region",
                    "documents", "events", "embeddings"):
            # events must go through Tables (nanos-ts coercion) — a
            # plain spark.read.parquet raises PARQUET_TYPE_ILLEGAL on
            # the sf0.x nanos-timestamp corpora (round-10 ADVICE)
            Tables(spark, DATA_DIR).load(tbl) \
                .createOrReplaceTempView(f"jhbkt_{tbl}")
        data_loc = "table:jhbkt_"

    def run_one(name: str) -> float:
        t0 = time.perf_counter()
        qs[name].fn(spark, data_loc).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # serial baseline (same session, same warm caches)
    serial = {n: round(run_one(n), 2) for n in QUERY_MIX}

    # concurrent: one thread per query; under FAIR each thread gets its
    # own pool so the scheduler round-robins task slots between them
    conc: dict[str, float] = {}
    errors: dict[str, BaseException] = {}
    def worker(name: str) -> None:
        if MODE == "FAIR":
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        try:
            conc[name] = round(run_one(name), 2)
        except BaseException as exc:  # surface in the report, not as a
            errors[name] = exc       # later KeyError masking the cause

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(n,)) for n in QUERY_MIX]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    conc_wall = time.perf_counter() - t0
    if errors:
        for n, exc in errors.items():
            print(f"FAILED {n}: {exc!r}", file=sys.stderr)
        raise SystemExit(f"{len(errors)}/{len(QUERY_MIX)} concurrent queries failed")

    serial_total = sum(serial.values())
    print(f"\n| query | serial s | concurrent s ({MODE}) | interference x |")
    print("|---|---|---|---|")
    for n in QUERY_MIX:
        print(f"| {n} | {serial[n]} | {conc[n]} | "
              f"{conc[n] / serial[n] if serial[n] else 0:.1f}x |")
    print(json.dumps({
        "mode": MODE,
        "data_dir": DATA_DIR,
        "bucketed": BUCKETED_BASE,
        "serial_total_s": round(serial_total, 2),
        "concurrent_wall_s": round(conc_wall, 2),
        "speedup_vs_serial": round(serial_total / conc_wall, 2),
        "serial": serial,
        "concurrent": conc,
    }))


if __name__ == "__main__":
    main()
