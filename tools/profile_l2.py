"""Phase profile of l2_minhash_neardup at sf0.1 (round-15 verdict task
5): time each pipeline stage separately (noop-forced, labeled jobs) so
the expensive phase is measured, not guessed, and dump the pure-lazy
full plan (no checkpoint barrier) so the bucket-join shape is visible.

Usage: python tools/profile_l2.py [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from jobhouse_spark.operators.similarity import (
    _band_signatures,
    _capped_buckets,
    _exact_jaccard_pairs,
    _minhash_featurize,
    minhash_near_duplicates,
)
from jobhouse_spark.session import get_spark
from jobhouse_spark.tables import Tables

SF = "/root/testdata/sf0.1"


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("profile_l2")
    sc = spark.sparkContext
    docs = Tables(spark, SF).documents

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def phase(label, build):
        ws = []
        for _ in range(reps):
            sc.setJobDescription(f"l2 profile: {label}")
            t0 = time.perf_counter()
            noop(build())
            ws.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        print(f"{label}: median {statistics.median(ws):.3f}s "
              f"min {min(ws):.3f}s (all {[round(w, 2) for w in ws]})")

    feat = lambda: _minhash_featurize(docs, "doc_id", "text", 3, 1 << 16, "xxhash64")  # noqa: E731

    phase("1 featurize", feat)
    phase("2 +band signatures", lambda: _band_signatures(feat(), 42, 3))
    phase("3 +capped buckets",
          lambda: _capped_buckets(_band_signatures(feat(), 42, 3), 500))

    def cand():
        f = feat().persist()
        capped = _capped_buckets(_band_signatures(f, 42, 3), 500)
        a, b = capped.alias("a"), capped.alias("b")
        out = (
            a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.sig") == F.col("b.sig"))
                   & (F.col("a.doc") < F.col("b.doc")))
            .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .distinct()
        )
        return out, f

    def cand_only():
        out, f = cand()
        noop_df = out
        return noop_df

    phase("4 +bucket self-join+distinct", cand_only)

    def full():
        out, f = cand()
        return _exact_jaccard_pairs(out, f, 0.5)

    phase("5 +exact jaccard rejoin", full)
    phase("6 operator end-to-end (checkpoint mode)",
          lambda: minhash_near_duplicates(
              docs, jaccard_threshold=0.5, num_hash_tables=3))
    spark.catalog.clearCache()

    # pure plan for plans/r15 (lazy mode: every stage visible)
    lazy = minhash_near_duplicates(
        docs, jaccard_threshold=0.5, num_hash_tables=3, materialize="lazy"
    ).select("doc_a", "doc_b").orderBy("doc_a", "doc_b")
    plan = lazy._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    out = "/root/repo/plans/r15/l2_minhash_lazy_pipeline.txt"
    with open(out, "w") as fh:
        fh.write(plan)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
