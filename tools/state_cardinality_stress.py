"""High-cardinality stateful stress: RocksDB vs HDFS when state is BIG.

The 30x state_store_suite runs ~1,500 user keys — trivial state, so it
proves provider EQUIVALENCE but measures only fixed overhead. This rung
regenerates events with the key space itself scaled (make_scale_data
--also-offset=events:user_id: factor x 1,500 distinct users — 1M+ at
factor 700) and runs the two user-keyed stateful shapes under both
providers:

  t7b-shape  applyInPandasWithState running count per user
             (custom Python state, update mode)
  t13s-shape streaming dynamic-gap session windows per user
             (15 min after clicks / 45 min otherwise, complete mode)

For each case x provider it records wall, batch count, max/mean batch
duration, and the state-store's own telemetry (numRowsTotal,
memory/disk bytes from stateOperators) — the capacity argument made
with MEASUREMENTS instead of assertions. Results must be identical
across providers (hash-compared), and the running count is additionally
checked against the batch groupBy ground truth.

Build the corpus first:
  python tools/make_scale_data.py /root/testdata/sf0.1 /tmp/jh_scale_hc \
      700 --tables=events --also-offset=events:user_id

Usage: python tools/state_cardinality_stress.py [data_dir]
           [--max-files=100] [--json=PATH] [--cases=t7b,t13s]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = next((a for a in sys.argv[1:] if not a.startswith("--")),
                "/tmp/jh_scale_hc")
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def _running_count(events):
    """The t7b shape: per-user running count via applyInPandasWithState
    (update mode; max-per-key collapse happens on the sink table)."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415
    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: PLC0415

    out_schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("n", T.LongType())]
    )
    state_schema = T.StructType([T.StructField("n", T.LongType())])

    def count_fn(key, pdf_iter, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    return events.select("user_id").groupBy("user_id").applyInPandasWithState(
        count_fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def _dynamic_sessions(events):
    """The t13s shape: dynamic-gap session windows per user."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    gap = F.expr(
        "CASE WHEN event_type = 'click' THEN make_interval(0,0,0,0,0,15,0) "
        "ELSE make_interval(0,0,0,0,0,45,0) END"
    )
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("s"),
            "user_id",
            "n_events",
        )
    )


def _state_metrics(progress_list) -> dict:
    """Aggregate stateOperators telemetry across a run's progress."""
    rows = mem = 0
    batch_ms = []
    for p in progress_list:
        batch_ms.append(p["durationMs"].get("triggerExecution", 0))
        for so in p.get("stateOperators") or []:
            rows = max(rows, so.get("numRowsTotal", 0))
            mem = max(mem, so.get("memoryUsedBytes", 0))
    return {
        "batches": len(progress_list),
        "max_batch_s": round(max(batch_ms) / 1000, 2) if batch_ms else None,
        "mean_batch_s": round(sum(batch_ms) / len(batch_ms) / 1000, 2)
        if batch_ms else None,
        "state_rows_max": rows,
        "state_mem_bytes_max": mem,
    }


def run_case(spark, shape, mode: str, provider: str, max_files: int) -> tuple:
    import pyspark.sql.types as T  # noqa: PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415

    from jobhouse_spark.streaming.jobs import (  # noqa: PLC0415
        _events_stream_dir,
        _events_stream_schema,
        _events_ts_is_nanos,
    )

    if provider == "rocksdb":
        spark.conf.set(PROVIDER_KEY, ROCKSDB)
    else:
        spark.conf.unset(PROVIDER_KEY)

    if _events_ts_is_nanos(DATA_DIR):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = (
            spark.readStream.schema(_events_stream_schema(T.LongType()))
            .format("parquet")
            .option("maxFilesPerTrigger", max_files)
            .load(_events_stream_dir(DATA_DIR))
        )
        events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        events = (
            spark.readStream.schema(_events_stream_schema(T.TimestampType()))
            .format("parquet")
            .option("maxFilesPerTrigger", max_files)
            .load(_events_stream_dir(DATA_DIR))
        )

    sink = f"jh_hc_{provider}_{time.time_ns()}"
    t0 = time.perf_counter()
    q = (
        shape(events)
        .writeStream.outputMode(mode)
        .format("memory")
        .queryName(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        progress = [json.loads(p.json) for p in q.recentProgress]
        q.stop()
        q.awaitTermination()
    wall = time.perf_counter() - t0

    limit = int(spark.conf.get("spark.sql.streaming.numRecentProgressUpdates"))
    assert len(progress) < limit, (
        f"{len(progress)} progress entries hit the {limit}-entry ring "
        "buffer; raise numRecentProgressUpdates"
    )
    return sink, wall, _state_metrics(progress)


def main() -> None:
    out = next((a.split("=", 1)[1] for a in sys.argv
                if a.startswith("--json=")), None)
    max_files = int(next((a.split("=")[1] for a in sys.argv
                          if a.startswith("--max-files=")), "100"))
    only = next((a.split("=", 1)[1].split(",") for a in sys.argv
                 if a.startswith("--cases=")), ["t7b", "t13s"])

    mem = os.environ.get("JH_SIM_DRIVER_MEM", "12g")
    if "PYSPARK_SUBMIT_ARGS" not in os.environ:
        os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory {mem} pyspark-shell"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from jobhouse_spark.tables import Tables

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("state_cardinality_stress")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.streaming.numRecentProgressUpdates", "400")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    ev = Tables(spark, DATA_DIR).events
    n_users, n_events = ev.agg(
        F.countDistinct("user_id"), F.count("*")
    ).first()
    print(f"{DATA_DIR}: {n_events} events, {n_users} distinct users")

    cases = {}
    if "t7b" in only:
        cases["t7b_running_count"] = (_running_count, "update", "max")
    if "t13s" in only:
        cases["t13s_dynamic_sessions"] = (_dynamic_sessions, "complete", None)

    results = {"corpus": DATA_DIR, "n_events": int(n_events),
               "n_users": int(n_users), "max_files_per_trigger": max_files,
               "cases": {}}
    for name, (shape, mode, collapse) in cases.items():
        digests = {}
        row = {}
        for provider in ("hdfs", "rocksdb"):
            sink, wall, metrics = run_case(spark, shape, mode, provider,
                                           max_files)
            tbl = spark.table(sink)
            if collapse == "max":
                # update mode re-emits a key per batch: collapse to the
                # final (max — counts are monotone) value per key
                tbl = tbl.groupBy("user_id").agg(F.max("n").alias("n"))
            # digest instead of a 1M-row collect: count + two
            # order-insensitive exact sums over every column
            digest = tbl.select(
                F.count("*").alias("rows"),
                F.sum(F.xxhash64(*tbl.columns)).alias("h"),
            ).first()
            digests[provider] = (digest.rows, digest.h)
            row[provider] = {"wall_s": round(wall, 1), **metrics,
                             "result_rows": int(digest.rows)}
            spark.catalog.dropTempView(sink)
            print(f"{name} [{provider}]: {round(wall, 1)}s, "
                  f"{metrics['batches']} batches, "
                  f"state_rows={metrics['state_rows_max']}, "
                  f"state_mem={metrics['state_mem_bytes_max']}")
        row["identical"] = digests["hdfs"] == digests["rocksdb"]
        assert row["identical"], f"{name}: providers disagree: {digests}"
        if name == "t7b_running_count":
            # ground truth: the batch groupBy count must digest-match
            batch = ev.groupBy("user_id").agg(F.count("*").alias("n"))
            bd = batch.select(
                F.count("*").alias("rows"),
                F.sum(F.xxhash64("user_id", "n")).alias("h"),
            ).first()
            row["matches_batch"] = (bd.rows, bd.h) == digests["hdfs"]
            assert row["matches_batch"], "running count != batch ground truth"
        results["cases"][name] = row

    summary = {"metric": "state_cardinality_stress", **results}
    print(json.dumps(summary))
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
