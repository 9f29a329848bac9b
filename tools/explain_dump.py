"""Dump .explain("formatted") for registry queries to plans/<round>/.

Usage:
    python tools/explain_dump.py --out plans/r14 --suffix before \
        [--names q1,q2,...] [--tag headline] [--sf-dir DIR]

Writes one <name>_<suffix>.txt per query. Plans are captured from the
un-executed DataFrame (AdaptiveSparkPlan isFinalPlan=false), which is
the shape the optimization round's before/after claims are judged on.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobhouse_spark.queries import all_queries
from jobhouse_spark.session import get_spark


def plan_of(spark, fn, sf_dir: str) -> str:
    df = fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--names", default="")
    ap.add_argument("--tag", default="headline")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    qs = all_queries()
    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
        unknown = [n for n in names if n not in qs]
        if unknown:
            raise SystemExit(f"unknown query names: {unknown}")
    else:
        names = sorted(n for n, q in qs.items() if args.tag in q.tags)

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("explain_dump")
    for name in names:
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        try:
            plan = plan_of(spark, qs[name].fn, args.sf_dir)
        except Exception as exc:  # noqa: BLE001 - record, keep dumping
            plan = f"EXPLAIN FAILED: {exc}\n"
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
