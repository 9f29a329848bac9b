"""Simulate the driver's verify pass end-to-end.

Builds a VANILLA SparkSession (no engine tuning — exactly what the
driver would hand us), smoke-runs entry(), then runs every queries()
entry at sf0.01 against its oracle_sql() in DuckDB and prints the
per-query verdict. This is the production interface of the repo.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as contract
from tests.oracle import compare_frames, duckdb_connect

_args = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"
# --only=name1,name2 runs a subset (substring match), skipping entry()
ONLY = next(
    (a.split("=", 1)[1].split(",") for a in sys.argv[1:] if a.startswith("--only=")),
    None,
)


def main() -> None:
    # JH_SIM_DRIVER_MEM=8g etc. sizes the (single local) JVM for scale
    # runs — the default 1g heap shared by 32 executor threads is an
    # artificial bound no real deployment has, and it heap-OOMs the
    # heavier queries at 10x data. Must be set before gateway launch.
    mem = os.environ.get("JH_SIM_DRIVER_MEM")
    if mem and "PYSPARK_SUBMIT_ARGS" not in os.environ:
        os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory {mem} pyspark-shell"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver_sim")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if ONLY is None:
        df = contract.entry(spark)
        rows = df.collect()
        print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
        assert len(rows) > 0

    qs = contract.queries()
    if ONLY is not None:
        qs = {k: v for k, v in qs.items() if any(pat in k for pat in ONLY)}
    oracles = contract.oracle_sql()
    duck = duckdb_connect(SF_DIR)
    n_pass = n_fail = n_rows_only = 0
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            pdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {e}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        # drop relations persisted inside the finished query (e.g. the
        # minhash feature cache) so a 155-query session doesn't
        # accumulate heap that an individual query would never see
        spark.catalog.clearCache()
        if name not in oracles:
            print(f"rows  {name}: {len(pdf)} rows ({dt:.1f}s)")
            n_rows_only += 1
            continue
        try:
            duck_pdf = duck.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {e}")
            n_fail += 1
            continue
        problems = compare_frames(pdf, duck_pdf)
        if problems:
            print(f"FAIL  {name}: {problems}")
            n_fail += 1
        else:
            print(f"ok    {name}: {len(pdf)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} hash-match, {n_rows_only} rows-only, {n_fail} FAIL")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
