"""Ingestion/bronze unit tests (SURVEY §5.2.2/.6): key-scheme parity,
envelope projection, replay pipeline, metadata, corrupt quarantine."""

from __future__ import annotations

import gzip
import json
import os
import tempfile
from datetime import datetime, timezone

from pyspark.sql import functions as F

from jobhouse_spark.sources.bronze import (
    bronze_key,
    envelope_projection,
    make_batch_id,
    quarantine_corrupt,
    read_bronze,
    write_bronze_batch,
    write_bronze_partitioned,
)
from jobhouse_spark.sources.rest import (
    FetchPolicy,
    PaginatedFetcher,
    RateLimiter,
    RetryableStatus,
    items_to_dataframe,
    replay_client,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "hh_pages.json")
AT = datetime(2024, 3, 5, 14, 30, 45, tzinfo=timezone.utc)


def _pages():
    with open(FIXTURE) as f:
        return json.load(f)


def test_batch_id_and_key_scheme_parity():
    # reference format: "{search}_{yyyymmdd_HHMMSS}" (extract_raw_jobs.py:129)
    bid = make_batch_id("python data engineer", AT)
    assert bid == "python data engineer_20240305_143045"
    # reference layout: {source}/{y}/{m}/{d}/{h}/{batch}.jsonl.gz (raw_layer.py:25-28)
    assert bronze_key("HH", bid, AT) == (
        "HH/2024/03/05/14/python data engineer_20240305_143045.jsonl.gz"
    )


def test_replay_fetch_and_envelope(spark):
    pages = _pages()
    fetcher = PaginatedFetcher(client=replay_client(pages))
    items = fetcher.fetch_all("python data engineer")
    assert len(items) == 17  # both pages flattened (A1)

    df = items_to_dataframe(spark, items)
    env = envelope_projection(df, "python data engineer", extracted_at=AT)
    rows = env.collect()
    assert len(rows) == 17
    r = {row.posting_id: row for row in rows}["1003"]
    assert r.source == "HH"
    assert r.metadata == {"search_text": "python data engineer"}
    payload = json.loads(r.raw_content)
    assert payload["employer"]["name"] == "Employer 3"
    assert payload["salary"]["currency"] == "RUR"


def test_single_object_bronze_writer(spark):
    pages = _pages()
    items = PaginatedFetcher(client=replay_client(pages)).fetch_all("q")
    env = envelope_projection(items_to_dataframe(spark, items), "q", extracted_at=AT)
    root = tempfile.mkdtemp(prefix="jh_test_bronze_")
    bid = make_batch_id("q", AT)

    meta = write_bronze_batch(env, root, bid, AT)
    meta_rows = meta.collect()
    assert len(meta_rows) == 17  # one StorageMetadata row per posting
    key = meta_rows[0].s3_key
    assert key == f"HH/2024/03/05/14/{bid}.jsonl.gz"
    assert all(r.etag == meta_rows[0].etag for r in meta_rows)

    # exactly one object, gzip JSONL, one JSON doc per line (raw_layer.py:33-44)
    path = os.path.join(root, key)
    with gzip.open(path, "rt") as f:
        lines = [json.loads(line) for line in f if line.strip()]
    assert len(lines) == 17
    assert {l["posting_id"] for l in lines} == {str(1000 + i) for i in range(17)}

    back = read_bronze(spark, root, layout="flat")
    assert back.count() == 17
    assert back.schema["extracted_at"].dataType.typeName() == "timestamp"


def test_partitioned_writer_prunes(spark):
    pages = _pages()
    items = PaginatedFetcher(client=replay_client(pages)).fetch_all("q")
    env = envelope_projection(items_to_dataframe(spark, items), "q", extracted_at=AT)
    root = tempfile.mkdtemp(prefix="jh_test_bronzep_")
    write_bronze_partitioned(env, root)
    # directory contract: source=HH/year=2024/month=03/day=05/hour=14
    assert os.path.isdir(os.path.join(root, "source=HH", "year=2024", "month=03", "day=05", "hour=14"))
    back = spark.read.option("recursiveFileLookup", "false").option("basePath", root).json(
        os.path.join(root, "source=HH", "year=2024", "month=03", "day=05", "hour=14")
    )
    assert back.count() == 17


def test_rate_limiter_spacing():
    t = {"now": 0.0}
    slept = []
    rl = RateLimiter(calls=2, period=1.0, clock=lambda: t["now"], sleep=slept.append)
    rl.acquire(); rl.acquire()           # window fills at t=0
    rl.acquire()                         # third call must wait the period
    assert slept and abs(slept[0] - 1.0) < 1e-9


def test_backoff_on_429_then_success():
    calls = {"n": 0}
    slept = []

    def flaky(params):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RetryableStatus(429)
        return {"items": [{"id": "1"}], "pages": 1}

    fetcher = PaginatedFetcher(
        client=flaky,
        limiter=RateLimiter(calls=100, period=1.0, sleep=lambda s: None),
        policy=FetchPolicy(backoff_seconds=5.0, max_retries=5),
        sleep=slept.append,
    )
    items = fetcher.fetch_all("q")
    assert items == [{"id": "1"}]
    assert slept == [5.0, 5.0]  # reference's 5 s backoff (hh_api.py:125-128)


def test_corrupt_record_quarantine(spark):
    root = tempfile.mkdtemp(prefix="jh_test_corrupt_")
    good = {"posting_id": "1", "raw_content": "{}", "metadata": {},
            "source": "HH", "extracted_at": "2024-03-05T14:30:45.000Z"}
    with open(os.path.join(root, "batch.jsonl"), "w") as f:
        f.write(json.dumps(good) + "\n")
        f.write("{this is not json\n")
        f.write(json.dumps(good | {"posting_id": "2"}) + "\n")
    ok, bad = quarantine_corrupt(spark, root)
    assert ok.count() == 2
    assert bad.count() == 1
    assert "{this is not json" in bad.collect()[0][0]
