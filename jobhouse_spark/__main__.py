"""One-shot pipeline CLI (reference src/main.py:11-28 — fetch postings
for a search text and land them in the raw layer; here the full
bronze -> silver -> gold chain is drivable too).

    python -m jobhouse_spark ingest --search "python data engineer" \
        --out /tmp/bronze [--fixture tests/fixtures/hh_pages.json]
    python -m jobhouse_spark silver --bronze /tmp/bronze --out /tmp/silver
    python -m jobhouse_spark gold --silver /tmp/silver

Transport: live HTTP when JOBHOUSE_API_BASE_URL is set (sources/rest.py
client_from_env), else replay of the given fixture — same pagination,
rate limiting, and backoff either way.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from datetime import datetime, timezone


def _spark():
    from jobhouse_spark.session import get_spark  # noqa: PLC0415

    return get_spark(app_name="jobhouse_cli")


def _parse_utc(iso: str) -> datetime:
    """ISO timestamp -> aware UTC. Offset-aware inputs are CONVERTED
    (2024-03-05T14:30:45+03:00 -> 11:30:45Z); only naive inputs get UTC
    attached — .replace() on an aware value would silently discard the
    offset and reinterpret the wall-clock."""
    dt = datetime.fromisoformat(iso)
    if dt.tzinfo is not None:
        return dt.astimezone(timezone.utc)
    return dt.replace(tzinfo=timezone.utc)


def cmd_ingest(args: argparse.Namespace) -> int:
    from jobhouse_spark.sources.bronze import (  # noqa: PLC0415
        envelope_projection,
        make_batch_id,
        write_bronze_batch,
        write_bronze_partitioned,
    )
    from jobhouse_spark.sources.rest import (  # noqa: PLC0415
        PaginatedFetcher,
        client_from_env,
        items_to_dataframe,
        replay_client,
    )

    client = client_from_env()
    if client is None:
        with open(args.fixture) as f:
            client = replay_client(json.load(f))
    items = PaginatedFetcher(client=client).fetch_all(args.search)
    spark = _spark()
    at = _parse_utc(args.at) if args.at else datetime.now(timezone.utc)
    env = envelope_projection(
        items_to_dataframe(spark, items), args.search, extracted_at=at
    )
    if args.layout == "flat":
        meta = write_bronze_batch(env, args.out, make_batch_id(args.search, at), at)
        n_meta = meta.count()
        print(f"ingested {len(items)} postings -> {args.out} ({n_meta} metadata rows)")
    else:
        write_bronze_partitioned(env, args.out)
        print(f"ingested {len(items)} postings -> {args.out} (hive-partitioned)")
    return 0


def cmd_silver(args: argparse.Namespace) -> int:
    from jobhouse_spark.silver import standardize_postings  # noqa: PLC0415
    from jobhouse_spark.sources.bronze import read_bronze  # noqa: PLC0415

    spark = _spark()
    silver = standardize_postings(read_bronze(spark, args.bronze))
    silver.write.mode("overwrite").parquet(args.out)
    print(f"standardized {spark.read.parquet(args.out).count()} postings -> {args.out}")
    return 0


def cmd_gold(args: argparse.Namespace) -> int:
    from jobhouse_spark.silver import gold_daily_mart  # noqa: PLC0415

    spark = _spark()
    mart = gold_daily_mart(spark.read.parquet(args.silver))
    if args.out:
        mart.write.mode("overwrite").parquet(args.out)
        print(f"gold mart -> {args.out}")
    else:
        for row in mart.collect():
            print(json.dumps(row.asDict(), default=str))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m jobhouse_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_ing = sub.add_parser("ingest", help="fetch postings and write bronze")
    p_ing.add_argument("--search", required=True)
    p_ing.add_argument("--out", required=True)
    p_ing.add_argument(
        "--fixture",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests", "fixtures", "hh_pages.json",
        ),
        help="replay fixture when no JOBHOUSE_API_BASE_URL is set",
    )
    p_ing.add_argument("--at", default=None, help="ISO extracted_at (default: now)")
    p_ing.add_argument("--layout", choices=("hive", "flat"), default="hive")
    p_ing.set_defaults(fn=cmd_ingest)

    p_sil = sub.add_parser("silver", help="bronze -> typed silver parquet")
    p_sil.add_argument("--bronze", required=True)
    p_sil.add_argument("--out", required=True)
    p_sil.set_defaults(fn=cmd_silver)

    p_gold = sub.add_parser("gold", help="silver -> daily mart")
    p_gold.add_argument("--silver", required=True)
    p_gold.add_argument("--out", default=None)
    p_gold.set_defaults(fn=cmd_gold)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
