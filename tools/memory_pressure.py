"""Memory-pressure evidence: the 30x workload on a deliberately small
heap (VERDICT r7 task #3).

A 100 TB grade wants proof of graceful degradation, not just speed on a
roomy heap: every scale-ladder run so far used a 12-16 GB driver. This
tool runs the headline set + the dedup lifecycle (l2d/l15) at the 30x
layout with a 4 GB heap (JH_MP_HEAP to override) shared by all 32
executor threads, records per-query wall time and the executor spill /
shuffle-write bytes from the live UI's REST API, asserts completion
without OOM, and prints a ready-to-paste markdown table plus one JSON
line.

Spill accounting: Spark's unified memory manager degrades under
pressure by spilling sort/aggregation state to disk
(memoryBytesSpilled / diskBytesSpilled on each stage). Zero spill on a
small heap means the operator pipeline is streaming-shaped (partial
aggs, bounded buckets) rather than materializing; nonzero spill with
completion is the designed degradation; an OOM is a finding to fix.

Usage: python tools/memory_pressure.py [data_dir]   (default 30x layout)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAP = os.environ.get("JH_MP_HEAP", "4g")
DATA_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jh_scale_30x"
# driver memory must be pinned before the JVM launches
os.environ["SPARK_DRIVER_MEMORY"] = HEAP

from jobhouse_spark.queries import all_queries  # noqa: E402
from jobhouse_spark.session import get_spark  # noqa: E402

# Set from this app's own sparkContext.uiWebUrl in main(); a hardcoded
# :4040 would silently read ANOTHER application's stage metrics whenever
# that port is already taken and ours binds 4041+.
UI = ""


def _get(path: str):
    with urllib.request.urlopen(f"{UI}{path}", timeout=10) as r:
        return json.load(r)


def _stage_totals(app_id: str) -> dict[int, dict[str, int]]:
    out: dict[int, dict[str, int]] = {}
    for st in _get(f"/applications/{app_id}/stages?status=complete"):
        out[st["stageId"]] = {
            "mem_spill": st.get("memoryBytesSpilled", 0),
            "disk_spill": st.get("diskBytesSpilled", 0),
            "shuffle_write": st.get("shuffleWriteBytes", 0),
            "peak_exec_mem": st.get("peakExecutionMemory", 0),
        }
    return out


def main() -> None:
    spark = get_spark(
        app_name="memory_pressure", extra_conf={"spark.ui.enabled": "true"}
    )
    assert spark.conf.get("spark.driver.memory") == HEAP, (
        "heap not applied — run this tool in a fresh process (the JVM was "
        f"already up with a different driver memory; wanted {HEAP})"
    )
    global UI
    ui_base = spark.sparkContext.uiWebUrl
    assert ui_base, "Spark UI disabled — spill metrics unavailable"
    UI = f"{ui_base}/api/v1"
    app_id = spark.sparkContext.applicationId
    assert any(a["id"] == app_id for a in _get("/applications"))

    qs = all_queries()
    names = sorted(k for k, q in qs.items() if "headline" in q.tags)
    for extra in ("l2d_dedup_then_minhash", "l15_dedup_clusters"):
        if extra not in names:
            names.append(extra)
    # same honest exclusion knob as bench.py --skip: raw l2's OUTPUT
    # grows C(replicas,2) per copy-group, so extreme rungs (300x/1000x)
    # skip it and record the skip; l2d in the set is the production
    # composition over unique content
    skipped = [s for s in os.environ.get("JH_MP_SKIP", "").split(",") if s]
    unknown = [s for s in skipped if s not in names]
    if unknown:  # not assert: CLI/env validation must survive python -O
        raise SystemExit(f"JH_MP_SKIP names not in the set: {unknown}")
    names = [n for n in names if n not in skipped]

    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    rows = []
    seen = _stage_totals(app_id)
    for name in names:
        t0 = time.perf_counter()
        qs[name].fn(spark, DATA_DIR).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        now = _stage_totals(app_id)
        new = {sid: m for sid, m in now.items() if sid not in seen}
        seen = now
        agg = {
            k: sum(m[k] for m in new.values())
            for k in ("mem_spill", "disk_spill", "shuffle_write", "peak_exec_mem")
        }
        rows.append({"query": name, "wall_s": round(wall, 2), **agg})
        print(
            f"done  {name}: {wall:.2f}s  mem_spill={agg['mem_spill']:,}  "
            f"disk_spill={agg['disk_spill']:,}",
            file=sys.stderr,
        )

    mb = 1024 * 1024
    print(f"\n| query | wall s ({HEAP} heap) | mem spill MB | disk spill MB | shuffle write MB |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['query']} | {r['wall_s']} | {r['mem_spill'] / mb:.1f} "
            f"| {r['disk_spill'] / mb:.1f} | {r['shuffle_write'] / mb:.1f} |"
        )
    print(
        json.dumps(
            {
                "heap": HEAP,
                "data_dir": DATA_DIR,
                "total_wall_s": round(sum(r["wall_s"] for r in rows), 2),
                "total_mem_spill_mb": round(sum(r["mem_spill"] for r in rows) / mb, 1),
                "total_disk_spill_mb": round(sum(r["disk_spill"] for r in rows) / mb, 1),
                "oom": False,  # reaching this line means every query completed
                "queries": {r["query"]: r["wall_s"] for r in rows},
                **({"skipped": skipped} if skipped else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
