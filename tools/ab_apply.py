"""Interleaved A/B of the jh11/jh12 APPLY phases (the recurring-daily
cost the incremental operators exist to shrink) under the old vs new
connected_components loop — exactly the bench _run_jh11_split protocol
(stored map persisted + noop-forced BEFORE the apply timer), alternated
old/new in one session so host drift cancels. Job counts per apply via
job groups.

Usage: python tools/ab_apply.py [reps]
"""

from __future__ import annotations

import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import jobhouse_spark.operators.entity as entity_mod
import jobhouse_spark.operators.graph as graph_mod
from jobhouse_spark.operators.entity import (
    EntityGramIndex,
    build_entity_index,
    persist_entity_mapping,
    release_persisted_entity_maps,
    resolve_entities,
    resolve_entities_incremental,
    resolve_entities_incremental_indexed,
)
from jobhouse_spark.queries.jobhouse_gold import jh11_split_inputs
from jobhouse_spark.session import get_spark
from tools.ab_graph_probe import old_connected_components


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    spark = get_spark("ab_apply")
    sc = spark.sparkContext
    new_cc = graph_mod.connected_components
    tracker = sc._jsc.sc().statusTracker()

    walls: dict[str, list[float]] = {}
    jobs: dict[str, list[int]] = {}

    def timed(key: str, group: str, fn) -> None:
        sc.setJobGroup(group, group)
        t0 = time.perf_counter()
        fn()
        walls.setdefault(key, []).append(time.perf_counter() - t0)
        jobs.setdefault(key, []).append(len(tracker.getJobIdsForGroup(group)))
        sc.setJobGroup("", "")

    idx_dir = tempfile.mkdtemp(prefix="jh_ab_idx_")
    try:
        for rep in range(reps):
            for tag, cc in (("old", old_connected_components), ("new", new_cc)):
                entity_mod.connected_components = cc
                release_persisted_entity_maps()
                day1, batch = jh11_split_inputs(spark)
                stored = persist_entity_mapping(resolve_entities(day1))
                stored.write.format("noop").mode("overwrite").save()

                timed(
                    f"jh11_batch_apply_{tag}",
                    f"a11_{tag}_{rep}",
                    lambda: resolve_entities_incremental(batch, stored)
                    .orderBy("name")
                    .write.format("noop")
                    .mode("overwrite")
                    .save(),
                )

                build_entity_index(day1).save(idx_dir)
                idx = EntityGramIndex.load(spark, idx_dir)
                timed(
                    f"jh12_apply_{tag}",
                    f"a12_{tag}_{rep}",
                    lambda: resolve_entities_incremental_indexed(
                        batch, stored, idx
                    )[0]
                    .orderBy("name")
                    .write.format("noop")
                    .mode("overwrite")
                    .save(),
                )
        release_persisted_entity_maps()
    finally:
        entity_mod.connected_components = new_cc
        shutil.rmtree(idx_dir, ignore_errors=True)

    for key in sorted(walls):
        w = walls[key]
        warm = w[1:] if reps >= 3 else w
        print(
            f"{key}: warm-median {statistics.median(warm):.3f}s "
            f"min {min(warm):.3f}s jobs {statistics.median(jobs[key])} "
            f"(all: {[round(x, 2) for x in w]})"
        )
    for k in ("jh11_batch_apply", "jh12_apply"):
        o = min(walls[f"{k}_old"][1:])
        n = min(walls[f"{k}_new"][1:])
        print(f"{k}: old/new min = {o / n:.3f}x")


if __name__ == "__main__":
    main()
