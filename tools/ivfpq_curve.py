"""IVF-PQ recall@10 vs wall-clock operating curve with TRAINED codebooks.

The registry's l27a/b/c pin the MECHANISM with seeded codebooks (the
differential-oracle discipline); tests/test_pq.py proves trained
codebooks lift recall at test scale. This tool closes the remaining
evidence gap: on a scale-rung corpus (default /tmp/jh_scale_30x,
60k x 64-dim vectors) it trains BOTH production training paths —

  * coarse quantizer: operators.ann.train_centroids (pyspark.ml KMeans
    over the full corpus), micro-ized to the exact-integer form;
  * PQ sub-codebooks: per-subspace numpy Lloyd on a deterministic
    sample (the FAISS practice — codebooks train on a bounded sample,
    ~100k-1M vectors in production, never the full corpus);

then sweeps (n_probe, rerank_k) through the UNCHANGED ivf_pq_top_k
operator and records tie-tolerant recall@10 vs wall per config — the
table a platform team picks an operating point from.

Tie-tolerant recall: the scale corpus replicates each base vector ~30x
verbatim, so the exact top-10 is a tie CLASS, not a list — a retrieved
neighbor counts as a hit iff its exact integer dot >= the 10th-best
exact dot among non-self candidates (the standard tie-aware definition;
anything stricter grades tie-ordering luck, not retrieval).

Usage: python tools/ivfpq_curve.py [sf_dir] [--cells=32] [--queries=64]
                                   [--json=PATH]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM, N_SUB, SUB_DIM, N_CODES = 64, 8, 8, 16
TRAIN_SAMPLE = 10_000
SWEEP = [
    # (n_probe, rerank_k)
    (1, None), (2, None), (4, None), (8, None), (16, None), (32, None),
    (4, 100), (8, 100), (16, 100), (8, 30), (8, 300),
]


def _micro(mat: np.ndarray) -> np.ndarray:
    return np.round(np.round(mat.astype(np.float64), 6) * 1e6).astype(np.int64)


def _d2(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Squared L2 via the expansion trick — O(N*k) memory, not N*k*dim."""
    return (
        (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
    )


def _lloyd(X: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), k, replace=False)].astype(np.float64)
    for _ in range(iters):
        assign = _d2(X.astype(np.float64), cents).argmin(1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(0)
    return cents


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/tmp/jh_scale_30x"
    cells = int(next((a.split("=")[1] for a in sys.argv
                      if a.startswith("--cells=")), "32"))
    n_queries = int(next((a.split("=")[1] for a in sys.argv
                          if a.startswith("--queries=")), "64"))
    out = next((a.split("=", 1)[1] for a in sys.argv
                if a.startswith("--json=")), None)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from jobhouse_spark.operators.ann import ivf_pq_top_k, train_centroids

    mem = os.environ.get("JH_SIM_DRIVER_MEM", "8g")
    if "PYSPARK_SUBMIT_ARGS" not in os.environ:
        os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory {mem} pyspark-shell"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ivfpq_curve")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_total = emb.count()

    # ---- training (both production paths), walls recorded ------------
    t0 = time.perf_counter()
    coarse_f = train_centroids(emb, n_cells=cells, seed=42)
    coarse = [[int(round(round(x, 6) * 1e6)) for x in c] for c in coarse_f]
    wall_coarse = time.perf_counter() - t0

    t0 = time.perf_counter()
    # deterministic training sample: smallest TRAIN_SAMPLE vec_ids
    # (id order is replication-stratified — every base vector's first
    # copy lands in the sample before any second copy)
    sample = (
        emb.orderBy("vec_id").limit(TRAIN_SAMPLE)
        .select("vec_id", "embedding").collect()
    )
    smat = _micro(np.array([r["embedding"] for r in sample]))
    codebooks = []
    for m in range(N_SUB):
        sub = smat[:, m * SUB_DIM:(m + 1) * SUB_DIM]
        cents = _lloyd(sub, N_CODES, iters=12, seed=m)
        codebooks.append([[int(round(x)) for x in c] for c in cents])
    wall_pq = time.perf_counter() - t0
    print(f"trained: coarse k={cells} via pyspark.ml in {wall_coarse:.1f}s, "
          f"{N_SUB}x{N_CODES} PQ codebooks on {TRAIN_SAMPLE} samples "
          f"in {wall_pq:.1f}s (corpus n={n_total})")

    # ---- ground truth (exact integer dot, tie-tolerant) --------------
    allv = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in allv])
    micro = _micro(np.array([r["embedding"] for r in allv]))
    rng = np.random.default_rng(7)
    q_ids = sorted(int(ids[i]) for i in rng.choice(len(ids), n_queries,
                                                   replace=False))
    by_pos = {int(v): i for i, v in enumerate(ids)}
    thresh = {}
    for qid in q_ids:
        dots = micro @ micro[by_pos[qid]]
        dots[by_pos[qid]] = np.iinfo(np.int64).min  # exclude self
        thresh[qid] = np.partition(dots, -10)[-10]  # 10th-best exact dot
    dots_by_q = {qid: micro @ micro[by_pos[qid]] for qid in q_ids}

    probes = emb.filter(F.col("vec_id").isin(q_ids))

    # ---- sweep --------------------------------------------------------
    results = []
    for n_probe, rerank in SWEEP:
        t0 = time.perf_counter()
        got = (
            ivf_pq_top_k(probes, emb, coarse, codebooks, k=10,
                         n_probe=n_probe, rerank_k=rerank)
            .groupBy("query_id")
            .agg(F.collect_list("neighbor_id").alias("nbrs"))
            .collect()
        )
        wall = time.perf_counter() - t0
        recs = []
        for r in got:
            qid = int(r["query_id"])
            hits = sum(
                1 for n in r["nbrs"]
                if dots_by_q[qid][by_pos[int(n)]] >= thresh[qid]
            )
            recs.append(hits / 10.0)
        rec = float(np.mean(recs)) if recs else 0.0
        results.append({"n_probe": n_probe, "rerank_k": rerank,
                        "recall_at_10": round(rec, 3),
                        "wall_sec": round(wall, 2)})
        print(f"n_probe={n_probe:>2} rerank={str(rerank):>4}: "
              f"recall@10={rec:.3f} wall={wall:.1f}s")

    summary = {
        "metric": "ivfpq_curve", "sf_dir": sf_dir, "n_vectors": n_total,
        "cells": cells, "n_sub": N_SUB, "n_codes": N_CODES,
        "train_sample": TRAIN_SAMPLE, "n_queries": n_queries,
        "wall_train_coarse": round(wall_coarse, 1),
        "wall_train_pq": round(wall_pq, 1), "sweep": results,
    }
    print(json.dumps(summary))
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
