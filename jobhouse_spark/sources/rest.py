"""Paginated REST source (reference A1-A7) — network-free core.

The reference's extractor (src/extract/hh_api.py) is reproduced with
its §3.4 runtime bugs fixed:
- page fetches are truly concurrent-safe (the reference gathered sync
  calls as if coroutines, hh_api.py:144-151),
- the rate limiter never blocks an event loop (hh_api.py:69,127 used
  time.sleep in async context) — this implementation is synchronous by
  design; Spark owns parallelism,
- session/auth is applied on every request (the reference never called
  _ensure_session from fetch_vacancies).

Architecture: a ``PageClient`` protocol separates transport from
pagination, so tests replay recorded fixtures with zero network and
production plugs an HTTP client. The driver-side fetch feeds
``spark.createDataFrame`` (phase 1 per SURVEY §4.3); a DataSource V2
wrapper can shard page ranges across executors later.
"""

from __future__ import annotations

import json
import time
from collections import deque
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


class RateLimiter:
    """Sliding-window limiter: ≤ ``calls`` per ``period`` seconds
    (reference hh_api.py:43-71; HH allows 7 rps, the reference
    self-throttled to 1 — keep it configurable, SURVEY §3.4)."""

    def __init__(self, calls: int = 1, period: float = 1.0, clock=time.monotonic, sleep=time.sleep):
        self.calls = calls
        self.period = period
        self._clock = clock
        self._sleep = sleep
        self._stamps: deque[float] = deque()

    def acquire(self) -> None:
        now = self._clock()
        while self._stamps and now - self._stamps[0] >= self.period:
            self._stamps.popleft()
        if len(self._stamps) >= self.calls:
            wait = self.period - (now - self._stamps[0])
            if wait > 0:
                self._sleep(wait)
            self._stamps.popleft()
        self._stamps.append(self._clock())


@dataclass
class FetchPolicy:
    """Backoff policy for HTTP 429 (reference: fixed 5 s sleep, infinite
    retries, hh_api.py:125-128 — bounded here)."""

    backoff_seconds: float = 5.0
    max_retries: int = 10
    per_page: int = 100  # HH API max (hh_api.py:117)
    area: int = 1  # Moscow (hh_api.py:116)


class RetryableStatus(Exception):
    def __init__(self, status: int):
        self.status = status
        super().__init__(f"retryable status {status}")


@dataclass
class PaginatedFetcher:
    """Fetch page 0, read `pages`, fetch the rest, flatten `items`
    (reference fetch_vacancies, hh_api.py:135-175)."""

    client: Callable[[dict], dict]  # params -> page payload
    limiter: RateLimiter = field(default_factory=RateLimiter)
    policy: FetchPolicy = field(default_factory=FetchPolicy)
    sleep: Callable[[float], None] = time.sleep

    def fetch_page(self, search_text: str, page: int) -> dict:
        params = {
            "text": search_text,
            "page": page,
            "area": self.policy.area,
            "per_page": self.policy.per_page,
        }
        for _ in range(self.policy.max_retries + 1):
            self.limiter.acquire()
            try:
                return self.client(params)
            except RetryableStatus:
                self.sleep(self.policy.backoff_seconds)
        raise RuntimeError(f"page {page}: exceeded {self.policy.max_retries} retries")

    def fetch_all(self, search_text: str) -> list[dict]:
        first = self.fetch_page(search_text, 0)
        items = list(first.get("items", []))
        for page in range(1, int(first.get("pages", 1))):
            items.extend(self.fetch_page(search_text, page).get("items", []))
        return items


def replay_client(pages: list[dict]) -> Callable[[dict], dict]:
    """Offline client over recorded page payloads (tests/fixtures)."""

    def client(params: dict) -> dict:
        return pages[params["page"]]

    return client


def http_client(
    base_url: str,
    *,
    timeout: float = 30.0,
    headers: dict[str, str] | None = None,
) -> Callable[[dict], dict]:
    """Real HTTP transport for the PageClient protocol (stdlib urllib —
    no extra dependencies; reference transport: src/extract/hh_api.py:85-133).

    429 and 5xx raise :class:`RetryableStatus` so ``PaginatedFetcher``'s
    bounded backoff applies; other HTTP errors propagate. Auth rides as
    headers on EVERY request (the reference's missed-_ensure_session bug,
    SURVEY §3.4, cannot recur by construction).
    """
    import urllib.error  # noqa: PLC0415
    import urllib.parse  # noqa: PLC0415
    import urllib.request  # noqa: PLC0415

    def client(params: dict) -> dict:
        url = base_url + "?" + urllib.parse.urlencode(params)
        req = urllib.request.Request(url, headers=headers or {})
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            if e.code == 429 or e.code >= 500:
                raise RetryableStatus(e.code) from e
            raise

    return client


def client_from_env(environ=None) -> Callable[[dict], dict] | None:
    """Env-gated live transport: returns an :func:`http_client` when
    ``JOBHOUSE_API_BASE_URL`` is set (``JOBHOUSE_API_TOKEN`` optionally
    adds a Bearer header), else None — callers fall back to replay.
    The sandbox has no network, so everything up to the socket is
    exercised by the localhost contract test (tests/test_rest_http.py)."""
    import os  # noqa: PLC0415

    env = os.environ if environ is None else environ
    base = env.get("JOBHOUSE_API_BASE_URL")
    if not base:
        return None
    headers = {}
    token = env.get("JOBHOUSE_API_TOKEN")
    if token:
        headers["Authorization"] = f"Bearer {token}"
    return http_client(base, headers=headers)


def items_to_dataframe(spark: SparkSession, items: list[dict]) -> DataFrame:
    """Driver-side JSON items → DataFrame via an RDD of JSON strings so
    nested nullable structs infer consistently."""
    if not items:
        raise ValueError("no items fetched")
    return spark.read.json(
        spark.sparkContext.parallelize([json.dumps(i) for i in items])
    )
