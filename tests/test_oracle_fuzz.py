"""Seeded differential-oracle fuzzing (VERDICT r6 task #6).

The registry's oracles were authored against ONE synthetic dataset; a
Spark-vs-DuckDB divergence that only fires on duplicate-heavy, null-heavy
or empty-group data would never show (the 10x run caught a real t4
tie-ordering bug only by accident of replication). This module generates
5 seeded random fixture variants — each seed stresses a different
profile — writes them as a full sf_dir, and runs the dedup / similarity /
window families Spark-vs-DuckDB through the exact driver compare
(tests.oracle.compare_frames).

Columns the queries ORDER BY without an explicit NULL placement
(o_orderdate, o_orderpriority, ts) are generated non-null: Spark
(ASC=NULLS FIRST) and DuckDB (NULLS LAST) legitimately disagree there,
so a null would assert engine defaults, not our operators. Value
columns, texts, keys and group occupancy are fuzzed hard.
"""

from __future__ import annotations

import datetime as dt
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle import compare_frames, duckdb_connect

# oracle-backed entries spanning the dedup, similarity and window
# families, all reading only documents/embeddings/orders/events
FUZZ_ENTRIES = (
    "l1_exact_dedup",
    "l1b_dedup_survivors",
    "l2b_ngram_jaccard",
    "l2b2_ngram_jaccard_capped",
    "l2c_minhash_checked",
    "l2e_incremental_minhash",
    "l21_duplicated_spans",
    "l3_cosine_topk",
    "l3b2_lsh_checked",
    "l3c2_ivf_checked",
    "w1_row_number",
    "w4_topk_per_group",
    "w5_latest_per_key",
    # round-8 additions: mixture quota arithmetic under skewed/missing
    # lang groups, and SemDeDup's centroid-assignment tie-breaks under
    # duplicate-vector stress (15% exact-dup vectors in every profile)
    "l24_domain_mixture",
    "l24b_token_budget_mixture",
    "l23b_semantic_dedup_scaled",
    # Lloyd-step assignment/update tie-breaks under duplicate-vector
    # stress (integer means over cells containing exact-dup members)
    "l26_kmeans_refine_checked",
    # percentile_disc thresholds + NULL-difficulty branch under
    # null/empty-text stress
    "l25_curriculum_bins",
    # round-15 (ADVICE r14): the r14 pair-proxy rewrite silently
    # diverged from the oracle on NULL user_ids (dau counted the
    # (day, NULL) pair; an all-NULL day vanished from the spine) —
    # latent because the static fixtures have none. The 5%-NULL
    # user_id stream here exercises exactly that surface.
    "e5_dau_wau_stickiness",
)

# per-seed stress profile: (exact_dup_rate, null_text_rate, empty_rate,
# n_cust_keys, ts_dup_rate)
_PROFILES = {
    1: dict(dup=0.45, null=0.05, empty=0.05, custs=120, tsdup=0.2),   # dup-heavy
    2: dict(dup=0.10, null=0.25, empty=0.15, custs=120, tsdup=0.2),   # null-heavy
    3: dict(dup=0.20, null=0.05, empty=0.05, custs=12, tsdup=0.2),    # few hot groups
    4: dict(dup=0.20, null=0.10, empty=0.30, custs=300, tsdup=0.1),   # sparse/empty groups
    5: dict(dup=0.30, null=0.10, empty=0.10, custs=60, tsdup=0.6),    # tie-heavy
}


def _make_fuzz_dir(root: str, seed: int) -> str:
    rng = random.Random(seed * 9973)
    prof = _PROFILES[seed]
    out = os.path.join(root, f"fuzz_{seed}")
    os.makedirs(out, exist_ok=True)
    vocab = [f"w{i:02d}" for i in range(40)]

    # documents — dup-heavy / null-heavy / short-text stress
    texts: list[str | None] = []
    prior: list[str] = []
    for _ in range(400):
        r = rng.random()
        if r < prof["null"]:
            t = None
        elif r < prof["null"] + prof["empty"]:
            t = rng.choice(["", "   ", "x"])
        elif r < prof["null"] + prof["empty"] + prof["dup"] and prior:
            t = rng.choice(prior)  # exact duplicate
            if rng.random() < 0.3:  # near-duplicate: mutate one token
                toks = t.split()
                if toks:
                    toks[rng.randrange(len(toks))] = rng.choice(vocab)
                    t = " ".join(toks)
        else:
            t = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 60)))
            prior.append(t)
        texts.append(t)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(400), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(
                    [rng.choice(["en", "ru", None]) for _ in range(400)], pa.string()
                ),
                "source": pa.array(
                    [rng.choice(["web", "api"]) for _ in range(400)], pa.string()
                ),
                "n_chars": pa.array(
                    [len(t) if t is not None else None for t in texts], pa.int64()
                ),
            }
        ),
        os.path.join(out, "documents.parquet"),
    )

    # embeddings — includes exact-duplicate vectors (score ties)
    vecs: list[list[float]] = []
    for _ in range(200):
        if vecs and rng.random() < 0.15:
            vecs.append(list(rng.choice(vecs)))
        else:
            vecs.append([round(rng.uniform(-1, 1), 4) for _ in range(64)])
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(200), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(
                    [rng.randrange(8) for _ in range(200)], pa.int32()
                ),
            }
        ),
        os.path.join(out, "embeddings.parquet"),
    )

    # orders — skewed/empty customer groups, nullable totalprice.
    # o_orderdate/o_orderpriority stay non-null (ORDER BY columns).
    n_orders = 1200
    custs = prof["custs"]
    o_cust = [
        7 if rng.random() < 0.3 else rng.randrange(custs) for _ in range(n_orders)
    ]
    base = dt.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_orders), pa.int64()),
                "o_custkey": pa.array(o_cust, pa.int64()),
                "o_orderstatus": pa.array(
                    [rng.choice(["O", "F", "P"]) for _ in range(n_orders)], pa.string()
                ),
                "o_totalprice": pa.array(
                    [
                        None if rng.random() < 0.05 else round(rng.uniform(1, 9e4), 2)
                        for _ in range(n_orders)
                    ],
                    pa.float64(),
                ),
                "o_orderdate": pa.array(
                    [
                        base + dt.timedelta(seconds=rng.randrange(100 * 86400))
                        for _ in range(n_orders)
                    ],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(
                    [rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"]) for _ in range(n_orders)],
                    pa.string(),
                ),
            }
        ),
        os.path.join(out, "orders.parquet"),
    )

    # events — duplicate timestamps (w5 tiebreak stress), nullable
    # user_id/event_type/value; ts non-null (ORDER BY column)
    n_ev = 1500
    ts_pool = [base + dt.timedelta(seconds=rng.randrange(30 * 86400)) for _ in range(60)]
    evs = [
        rng.choice(ts_pool)
        if rng.random() < prof["tsdup"]
        else base + dt.timedelta(seconds=rng.randrange(30 * 86400), microseconds=rng.randrange(10**6))
        for _ in range(n_ev)
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n_ev), pa.int64()),
                "ts": pa.array(evs, pa.timestamp("us")),
                "user_id": pa.array(
                    [None if rng.random() < 0.05 else rng.randrange(50) for _ in range(n_ev)],
                    pa.int64(),
                ),
                "event_type": pa.array(
                    [rng.choice(["click", "view", "buy", None]) for _ in range(n_ev)],
                    pa.string(),
                ),
                "value": pa.array(
                    [None if rng.random() < 0.2 else round(rng.uniform(0, 100), 3) for _ in range(n_ev)],
                    pa.float64(),
                ),
                "props": pa.array(
                    [rng.choice(['{"k":1}', '{"k":2}', None]) for _ in range(n_ev)],
                    pa.string(),
                ),
            }
        ),
        os.path.join(out, "events.parquet"),
    )
    return out


# Campaign-gated (round-15 verdict task 1): each seed runs the full
# 23-entry family sweep (22-115 s each) — breadth re-verification for
# JH_FULL_TESTS=1 / gate.sh runs, not default-suite regression pins.
# The always-on nets for the divergences these profiles caught live in
# focused tests (e.g. test_e5_nulls.py for the NULL-user surface).
@pytest.mark.campaign
@pytest.mark.parametrize("seed", sorted(_PROFILES))
def test_fuzzed_oracles_agree(spark, tmp_path_factory, seed):
    from jobhouse_spark.queries import all_queries

    root = str(tmp_path_factory.mktemp("oracle_fuzz"))
    sf = _make_fuzz_dir(root, seed)
    qs = all_queries()
    duck = duckdb_connect(sf)
    try:
        failures = []
        for name in FUZZ_ENTRIES:
            q = qs[name]
            spark_pdf = q.fn(spark, sf).toPandas()
            spark.catalog.clearCache()
            duck_pdf = duck.execute(q.oracle).fetchdf()
            problems = compare_frames(spark_pdf, duck_pdf)
            if problems:
                failures.append(f"{name}[seed={seed}]: {problems}")
        assert not failures, "\n".join(failures)
    finally:
        duck.close()
