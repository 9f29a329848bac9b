"""Grammar-v8 differential fuzzing over the SILVER domain tables
(round 12, VERDICT r11 task 5).

Every prior fuzz campaign (v1–v7, ~6,600 seeds) runs on the
TPC-H-shaped fixtures; this one runs on the engine's OWN output — the
silver postings table materialized by the bronze->silver pipeline
(replay fixture v4 -> envelope -> partitioned bronze ->
standardize_postings, jobhouse_gold._silver_v4) plus two derived dims:

  postings   — 18 queryable columns: NULLABLE salary longs (the
               completeness surface jh10 scores), dirty employer/area
               strings, pipeline-parsed timestamps, pub_* date parts
  areas      — per-area rollup (unique string PK)
  employers  — per-employer rollup (unique string PK)

Both engines read the SAME parquet (Spark writes it once; DuckDB views
it via read_parquet), so the differential isolates QUERY semantics over
pipeline-produced data — standardization-dependent divergence (NULL
salary arithmetic, string-PK window orders, timestamp grouping) that
the TPC-H substrate cannot reach. The bronze->silver plumbing itself is
differentially checked by jh9/jh10's raw-JSON oracles.

`--enlarge=K` appends K replicated copies (posting_id suffixed,
published_at shifted +i minutes, salary nudged +i) BEFORE the write,
so both engines still read identical bytes — the 30x-style block that
catches cardinality-dependent divergence (spill paths, hash collisions).

Usage:
  python tools/silver_fuzz.py [--n=500] [--seed0=1] [--enlarge=0]
                              [--json=PATH]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import query_fuzz as qf  # noqa: E402

SILVER_TABLES = {
    "postings": {
        "posting_id": "str", "source": "str", "extracted_at": "ts",
        "search_text": "str", "title": "str", "area_name": "str",
        "salary_from": "int", "salary_to": "int", "salary_currency": "str",
        "employer_name": "str", "requirement": "str", "schedule": "str",
        "experience": "str", "employment": "str", "published_at": "ts",
        "salary_mid": "float", "pub_year": "int", "pub_month": "int",
        "pub_day": "int",
    },
    "areas": {
        "area_name": "str", "n_postings": "int", "n_employers": "int",
        "avg_salary_mid": "float",
    },
    "employers": {
        "employer_name": "str", "n_postings": "int", "n_areas": "int",
        "first_published": "ts",
    },
}

SILVER_PK = {
    "postings": ("posting_id",),
    "areas": ("area_name",),
    "employers": ("employer_name",),
}

SILVER_FKS = [
    ("postings", "area_name", "areas", "area_name"),
    ("postings", "employer_name", "employers", "employer_name"),
]


def materialize(spark, root: str, enlarge: int) -> None:
    """Write postings/areas/employers parquet under ``root``."""
    from pyspark.sql import functions as F

    from jobhouse_spark.queries.jobhouse_gold import _silver_v4

    silver = _silver_v4(spark).drop("salary_gross")  # bool: out of model
    if enlarge:
        copies = [silver]
        for i in range(1, enlarge + 1):
            copies.append(
                silver.withColumn(
                    "posting_id", F.concat("posting_id", F.lit(f"_r{i}"))
                )
                .withColumn(
                    "published_at",
                    F.col("published_at") + F.expr(f"INTERVAL {i} MINUTES"),
                )
                .withColumn("salary_from", F.col("salary_from") + F.lit(i))
                .withColumn("salary_mid", F.col("salary_mid") + F.lit(float(i)))
            )
        silver = copies[0]
        for c in copies[1:]:
            silver = silver.unionByName(c)
    silver.write.mode("overwrite").parquet(f"{root}/postings")
    p = spark.read.parquet(f"{root}/postings")
    (
        p.groupBy("area_name").agg(
            F.count("*").alias("n_postings"),
            F.countDistinct("employer_name").alias("n_employers"),
            F.avg("salary_mid").alias("avg_salary_mid"),
        )
        .write.mode("overwrite").parquet(f"{root}/areas")
    )
    (
        p.groupBy("employer_name").agg(
            F.count("*").alias("n_postings"),
            F.countDistinct("area_name").alias("n_areas"),
            F.min("published_at").alias("first_published"),
        )
        .write.mode("overwrite").parquet(f"{root}/employers")
    )


def main() -> None:
    opt = {a.split("=")[0][2:]: a.split("=", 1)[1]
           for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    n = int(opt.get("n", "500"))
    seed0 = int(opt.get("seed0", "1"))
    enlarge = int(opt.get("enlarge", "0"))

    if "PYSPARK_SUBMIT_ARGS" not in os.environ:
        os.environ["PYSPARK_SUBMIT_ARGS"] = "--driver-memory 6g pyspark-shell"
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("silver_fuzz")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="jh_silver_fuzz_")
    materialize(spark, root, enlarge)

    duck = duckdb.connect()
    for t in SILVER_TABLES:
        spark.read.parquet(f"{root}/{t}").createOrReplaceTempView(t)
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{root}/{t}/*.parquet')"
        )

    qf.set_universe(SILVER_TABLES, SILVER_PK, SILVER_FKS)
    pools = qf.build_pools(duck)
    failures = qf.run_campaign(
        spark, duck, pools, range(seed0, seed0 + n),
        shapes=qf.GENERIC_SHAPES,
    )
    summary = {
        "metric": "silver_fuzz", "grammar": qf.GRAMMAR_VERSION,
        "universe": "silver", "n": n, "seed0": seed0, "enlarge": enlarge,
        "postings_rows": spark.table("postings").count(),
        "pass": n - len(failures), "fail": len(failures),
        "failed_seeds": [s for s, _, _ in failures][:20],
    }
    print(json.dumps(summary))
    out = opt.get("json")
    if out:
        with open(out, "w") as f:
            json.dump(summary, f)
            f.write("\n")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
