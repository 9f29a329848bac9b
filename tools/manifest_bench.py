"""Manifest-planning payoff at FILE-COUNT scale (round 11).

s19 proves manifest_pruned_read content-exact; this measures the
reason it exists: on a many-file table, a selective query through
`spark.read.parquet(root)` pays listing + per-file footer/schema cost
for EVERY file before row-group pruning can help, while the manifest
path filters kilobytes of metadata and opens only the matching files.

Method: fragment a table into N range-clustered files (disjoint key
spans — the best case for BOTH paths, so the delta isolates planning
cost, not data volume), build the manifest once, then run the same
selective aggregate via (a) full-path read + predicate, (b)
manifest_pruned_read. Median-of-3 walls + the planned file count.

Usage:
  python tools/manifest_bench.py [sf_dir] [--table=events]
         [--key=event_id] [--files=2000] [--sel=0.001] [--json=PATH]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    opt = {a.split("=")[0][2:]: a.split("=", 1)[1]
           for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    table = opt.get("table", "events")
    key = opt.get("key", "event_id")
    n_files = int(opt.get("files", "2000"))
    sel = float(opt.get("sel", "0.001"))

    mem = os.environ.get("JH_SIM_DRIVER_MEM", "12g")
    if "PYSPARK_SUBMIT_ARGS" not in os.environ:
        os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory {mem} pyspark-shell"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from jobhouse_spark.operators.maintenance import (
        build_manifest,
        manifest_pruned_read,
    )
    from jobhouse_spark.tables import Tables

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("manifest_bench")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = f"/tmp/jh_manifest_{os.path.basename(sf_dir.rstrip('/'))}_{table}"
    data = f"{base}/clustered"
    src = getattr(Tables(spark, sf_dir), table)
    if not os.path.isdir(data):
        # range-clustered many-file layout: each file a disjoint key span
        (src.repartitionByRange(n_files, key).sortWithinPartitions(key)
            .write.mode("overwrite").parquet(data))

    t0 = time.perf_counter()
    manifest = build_manifest(spark, data, [key])
    manifest = spark.createDataFrame(manifest.collect(), manifest.schema)
    manifest_build_sec = round(time.perf_counter() - t0, 1)
    files_on_disk = manifest.count()

    lo_all, hi_all = spark.read.parquet(data).agg(F.min(key), F.max(key)).first()
    span = max(1, int((hi_all - lo_all) * sel))
    lo = lo_all + (hi_all - lo_all) // 3
    hi = lo + span

    def agg(df):
        return df.where(F.col(key).between(lo, hi)).agg(
            F.count("*").alias("n"), F.sum(key).alias("s")).first()

    results: dict = {}
    for label in ("full_path", "manifest"):
        walls, row = [], None
        for _ in range(3):
            # a fresh reader each repeat; Spark caches FileIndex per
            # path+session, so drop it to charge the real listing cost
            spark.catalog.clearCache()
            spark._jvm.org.apache.spark.sql.execution.datasources \
                .FileStatusCache.resetForTesting()
            t0 = time.perf_counter()
            if label == "full_path":
                row = agg(spark.read.parquet(data))
            else:
                row = agg(manifest_pruned_read(spark, manifest, {key: (lo, hi)}))
            walls.append(round(time.perf_counter() - t0, 3))
        results[label] = {"walls": walls, "wall_median": sorted(walls)[1],
                          "rows": row.n, "sum": row.s}

    assert results["full_path"]["rows"] == results["manifest"]["rows"]
    planned = manifest.filter(
        (F.col(f"{key}_min") <= hi) & (F.col(f"{key}_max") >= lo)).count()
    summary = {
        "metric": "manifest_bench", "sf_dir": sf_dir, "table": table,
        "files_on_disk": files_on_disk, "files_planned": planned,
        "manifest_build_sec": manifest_build_sec,
        "predicate_rows": results["manifest"]["rows"],
        "full_path_wall": results["full_path"]["wall_median"],
        "manifest_wall": results["manifest"]["wall_median"],
        "speedup": round(results["full_path"]["wall_median"]
                         / max(1e-9, results["manifest"]["wall_median"]), 1),
        "detail": results,
    }
    print(json.dumps(summary))
    out = opt.get("json")
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
    if opt.get("keep") != "1":
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
