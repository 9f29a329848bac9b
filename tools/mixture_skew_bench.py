"""Measure WHY mixture_select decomposes the per-domain rank
(SCALE.md "mixture at scale").

The naive plan for "top-quota docs per domain by hash rank" is
``row_number() OVER (PARTITION BY domain ORDER BY hash)`` — with a
handful of domains that is a per-domain GLOBAL SORT into |domains|
reducer tasks, the same byte-blind compute-skew class as the SemDeDup
post-mortem (AQE cannot split a window's partition). This bench builds
an N-row two-domain corpus (95/5 skew — a realistic web-dominated mix)
entirely from spark.range (no I/O bias), then times the SAME selection
(rank <= quota, identical output verified by count+checksum) under:

  naive      row_number over PARTITION BY domain   (2 sort tasks)
  decomposed hash_ranked's (domain, hash-prefix) local ranks +
             broadcast bucket offsets              (2*256 even tasks)

Run: python tools/mixture_skew_bench.py [n_rows] [quota_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from jobhouse_spark.operators.mixture import hash_rank, hash_ranked
from jobhouse_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000
QUOTA = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000


def summarize(sel):
    """count + order-insensitive checksum per domain — proves both
    plans picked the identical rows."""
    return sorted(
        map(
            tuple,
            sel.groupBy("lang")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.crc32(F.col("doc_id").cast("string"))).alias("chk"),
            )
            .collect(),
        )
    )


def main() -> None:
    spark = get_spark("mixture_skew_bench")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 20 < 19, F.lit("web"))
        .otherwise(F.lit("books"))
        .alias("lang"),
    )

    # naive: per-domain global rank (2 reducer tasks carry everything)
    t0 = time.perf_counter()
    w = Window.partitionBy("lang").orderBy(hash_rank(F.col("doc_id")), "doc_id")
    naive_sel = (
        df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= QUOTA)
    )
    naive_sum = summarize(naive_sel)
    t_naive = time.perf_counter() - t0

    # decomposed: even (domain, hash-prefix-bucket) local ranks
    t0 = time.perf_counter()
    ranked, _ = hash_ranked(df, "lang", "doc_id")
    dec_sel = ranked.filter(F.col("_rn") <= QUOTA).select(
        F.col("_id").alias("doc_id"), F.col("_g").alias("lang")
    )
    dec_sum = summarize(dec_sel)
    t_dec = time.perf_counter() - t0

    assert naive_sum == dec_sum, f"plans diverged: {naive_sum} vs {dec_sum}"
    print(f"rows={N:,} skew=95/5 quota={QUOTA:,} (identical selections)")
    print(f"naive per-domain window : {t_naive:7.1f} s  -> {naive_sum}")
    print(f"bucket-decomposed       : {t_dec:7.1f} s  -> {dec_sum}")
    print(f"speedup: {t_naive / t_dec:.2f}x")


if __name__ == "__main__":
    main()
