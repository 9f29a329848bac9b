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

MODE = (sys.argv[1] if len(sys.argv) > 1 else "FIFO").upper()
DATA_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jh_scale_30x"

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

    def run_one(name: str) -> float:
        t0 = time.perf_counter()
        qs[name].fn(spark, DATA_DIR).write.format("noop").mode("overwrite").save()
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
        "serial_total_s": round(serial_total, 2),
        "concurrent_wall_s": round(conc_wall, 2),
        "speedup_vs_serial": round(serial_total / conc_wall, 2),
        "serial": serial,
        "concurrent": conc,
    }))


if __name__ == "__main__":
    main()
