"""Interleaved A/B of the l2 candidate-pair stage: r14 self-join of the
capped buckets (re-executes the banded->window pipeline per join side)
vs r15 in-row pair expansion over collected capped buckets. Both run
the FULL operator protocol (featurize persist -> pairs -> exact-Jaccard
rejoin -> eager checkpoint -> unpersist), alternating in one session.

Usage: python tools/ab_l2_pairs.py [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from jobhouse_spark.materialize import materialize_barrier
from jobhouse_spark.operators.similarity import (
    _band_signatures,
    _capped_buckets,
    _exact_jaccard_pairs,
    _minhash_featurize,
)
from jobhouse_spark.session import get_spark
from jobhouse_spark.tables import Tables

SF = "/root/testdata/sf0.1"


def pairs_old(capped):
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def pairs_new(capped):
    members = capped.groupBy("band_idx", "sig").agg(
        F.sort_array(F.collect_list("doc")).alias("ms")
    )
    return (
        members.select(
            F.explode(
                F.expr(
                    "flatten(transform(ms, (x, i) -> "
                    "transform(slice(ms, i + 2, size(ms)), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def run(spark, docs, pair_fn):
    featured = _minhash_featurize(
        docs, "doc_id", "text", 3, 1 << 16, "xxhash64"
    ).persist()
    capped = _capped_buckets(_band_signatures(featured, 42, 3), 500)
    out = _exact_jaccard_pairs(pair_fn(capped), featured, 0.5)
    out = materialize_barrier(out)
    featured.unpersist()
    out.select("doc_a", "doc_b").orderBy("doc_a", "doc_b").write.format(
        "noop"
    ).mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    spark = get_spark("ab_l2_pairs")
    sc = spark.sparkContext
    docs = Tables(spark, SF).documents
    tracker = sc._jsc.sc().statusTracker()
    walls = {"old": [], "new": []}
    jobs = {"old": [], "new": []}
    for rep in range(reps):
        for tag, fn in (("old", pairs_old), ("new", pairs_new)):
            group = f"l2_{tag}_{rep}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            run(spark, docs, fn)
            walls[tag].append(time.perf_counter() - t0)
            jobs[tag].append(len(tracker.getJobIdsForGroup(group)))
            sc.setJobGroup("", "")
    for tag in ("old", "new"):
        warm = walls[tag][1:]
        print(
            f"{tag}: warm-median {statistics.median(warm):.3f}s "
            f"min {min(warm):.3f}s jobs {statistics.median(jobs[tag])} "
            f"(all: {[round(w, 2) for w in walls[tag]]})"
        )
    print(
        f"old/new: median {statistics.median(walls['old'][1:]) / statistics.median(walls['new'][1:]):.3f}x "
        f"min {min(walls['old'][1:]) / min(walls['new'][1:]):.3f}x"
    )


if __name__ == "__main__":
    main()
