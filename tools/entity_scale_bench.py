"""Entity-resolution scale ladder (round 11): resolve_entities at
entity cardinalities the jh8 fixture can't reach.

jh8 proves the pipeline hash-exact on 10 entities; this tool proves the
SHAPE at 10^4-10^6 dirty names: generate E synthetic companies
("<adj> <noun>" from two seeded wordlists, pairwise Levenshtein >= 5
within each list, so a distance-2 threshold can never bridge two true
entities even typo-to-typo — the fixture-v3 separation argument at
scale), plant the v3 variant kinds per entity (suffix / case /
whitespace dirt + a deletion typo + a substitution typo, all Spark-side
string surgery, no Python row functions), run
operators/entity.resolve_entities, and assert EXACT recovery:

  - number of clusters == E,
  - every cluster has exactly 3 normalized members
    (clean / deletion-typo / substitution-typo),

then measure the map-back join onto an R-rows-per-name postings corpus.

Why this scales where naive fuzzy matching dies: at E=250k the shared
word grams ("aurb" appears in sqrt(E)*3 names) blow past the df cap and
are dropped as stop-grams; candidate pairs then come ONLY from the
rare combo-specific grams (the adj-tail/space/noun-head boundary
region, which deletion/substitution typos leave intact past the edit
point). The df cap is what keeps the inverted-index join linear-ish —
this ladder measures exactly that mechanism.

Usage:
  python tools/entity_scale_bench.py [--entities=100000] [--rows-per=5]
         [--json=PATH]
"""

from __future__ import annotations

import json
import math
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def make_wordlist(seed: int, n: int, min_dist: int = 5) -> list[str]:
    """n pronounceable-ish words, pairwise Levenshtein >= min_dist
    (greedy filter over seeded candidates)."""
    rng = random.Random(seed)
    cons, vow = "bcdfghjklmnpqrstvwz", "aeiou"
    words: list[str] = []
    while len(words) < n:
        w = "".join(
            (rng.choice(cons) + rng.choice(vow) for _ in range(rng.randint(4, 5)))
        )
        if all(_levenshtein(w, x) >= min_dist for x in words):
            words.append(w)
    return words


def main() -> None:
    opt = {a.split("=")[0][2:]: a.split("=", 1)[1]
           for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    n_entities = int(opt.get("entities", "100000"))
    rows_per = int(opt.get("rows-per", "5"))

    mem = os.environ.get("JH_SIM_DRIVER_MEM", "12g")
    if "PYSPARK_SUBMIT_ARGS" not in os.environ:
        os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory {mem} pyspark-shell"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from jobhouse_spark.operators.entity import (
        normalize_entity_name,
        resolve_entities,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("entity_scale_bench")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    side = math.isqrt(n_entities - 1) + 1
    adjs = make_wordlist(11, side)
    nouns = make_wordlist(23, side)
    adj_arr = F.array(*[F.lit(w) for w in adjs])
    noun_arr = F.array(*[F.lit(w) for w in nouns])

    base = (
        spark.range(n_entities)
        .withColumn(
            "base",
            F.concat(
                F.element_at(adj_arr, (F.col("id") % side + 1).cast("int")),
                F.lit(" "),
                F.element_at(noun_arr, (F.col("id") / side + 1).cast("int")),
            ),
        )
    )
    # the fixture-v3 variant kinds, as JVM-side string surgery
    variants = base.select(
        "id",
        F.explode(
            F.array(
                F.col("base"),                                   # clean
                F.concat(F.col("base"), F.lit(" LLC")),          # suffix
                F.concat(F.col("base"), F.lit(" Ltd")),
                F.concat(F.col("base"), F.lit(" Group")),
                F.upper(F.regexp_replace("base", " ", "  ")),    # shouting
                F.concat(F.col("base"), F.lit(" inc")),
                # deletion typo: drop the 5th character
                F.concat(F.substring("base", 1, 4), F.expr("substring(base, 6)")),
                # substitution typo: 3rd character -> 'x'
                F.concat(F.substring("base", 1, 2), F.lit("x"),
                         F.expr("substring(base, 4)")),
            )
        ).alias("name"),
    )
    n_raw = variants.count()

    t0 = time.perf_counter()
    mapping = resolve_entities(variants.select("name"))
    mapping = mapping.persist()
    n_nodes = mapping.count()
    resolve_wall = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    stats = (
        mapping.groupBy("canonical").agg(F.count("*").alias("members"))
        .agg(
            F.count("*").alias("clusters"),
            F.min("members").alias("min_m"),
            F.max("members").alias("max_m"),
        )
        .first()
    )
    verify_wall = round(time.perf_counter() - t0, 1)
    ok = stats.clusters == n_entities and stats.min_m == stats.max_m == 3

    # map-back: R posting rows per raw name join the (normalized ->
    # canonical) map; no manual broadcast hint — measure what AQE picks
    t0 = time.perf_counter()
    postings = (
        variants.crossJoin(spark.range(rows_per).select(F.col("id").alias("r")))
        .select("name", "r")
        .withColumn("norm", normalize_entity_name(F.col("name")))
    )
    mart = (
        postings.join(mapping.withColumnRenamed("name", "mname"),
                      postings["norm"] == F.col("mname"))
        .groupBy("canonical")
        .agg(F.count("*").alias("n_postings"))
        .agg(F.count("*").alias("k"), F.sum("n_postings").alias("rows"))
        .first()
    )
    mapback_wall = round(time.perf_counter() - t0, 1)

    summary = {
        "metric": "entity_scale_bench",
        "entities": n_entities,
        "raw_names": n_raw,
        "distinct_normalized": n_nodes,
        "clusters": int(stats.clusters),
        "members_min_max": [int(stats.min_m), int(stats.max_m)],
        "exact_recovery": bool(ok),
        "resolve_wall_s": resolve_wall,
        "verify_wall_s": verify_wall,
        "mapback_rows": int(mart.rows),
        "mapback_wall_s": mapback_wall,
    }
    print(json.dumps(summary))
    out = opt.get("json")
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
