"""Contract test for the live HTTP PageClient (S7 production transport).

A localhost http.server stands in for the HH API: serves the replay
fixture pages by `page` query param, returns one 429 first to prove the
RetryableStatus -> bounded-backoff path, and requires the auth header on
every request (the reference's missed-session bug, SURVEY §3.4).
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from jobhouse_spark.sources.rest import (
    PaginatedFetcher,
    RateLimiter,
    RetryableStatus,
    client_from_env,
    http_client,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "hh_pages.json")


@pytest.fixture()
def api_server():
    with open(FIXTURE) as f:
        pages = json.load(f)
    state = {"hits": 0, "rate_limited_once": False, "auth_seen": []}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            state["hits"] += 1
            state["auth_seen"].append(self.headers.get("Authorization"))
            if not state["rate_limited_once"]:
                state["rate_limited_once"] = True
                self.send_response(429)
                self.end_headers()
                return
            q = parse_qs(urlparse(self.path).query)
            page = int(q.get("page", ["0"])[0])
            body = json.dumps(pages[page]).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence per-request stderr lines
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}/vacancies", state
    finally:
        srv.shutdown()


def test_http_client_fetches_all_pages_with_retry_and_auth(api_server):
    url, state = api_server
    client = http_client(url, headers={"Authorization": "Bearer tok"})
    fetcher = PaginatedFetcher(
        client=client,
        limiter=RateLimiter(calls=100, period=1.0),
        sleep=lambda s: None,  # don't actually wait out the backoff
    )
    items = fetcher.fetch_all("python data engineer")
    with open(FIXTURE) as f:
        pages = json.load(f)
    expected = [i["id"] for p in pages for i in p["items"]]
    assert [i["id"] for i in items] == expected
    # one 429 then a success per page, auth header on every request
    assert state["rate_limited_once"]
    assert state["hits"] == 1 + len(pages)
    assert all(a == "Bearer tok" for a in state["auth_seen"])


def test_client_from_env_gating(api_server):
    url, _ = api_server
    assert client_from_env({}) is None
    client = client_from_env(
        {"JOBHOUSE_API_BASE_URL": url, "JOBHOUSE_API_TOKEN": "t0"}
    )
    assert client is not None
    params = {"text": "x", "page": 0, "area": 1, "per_page": 100}
    with pytest.raises(RetryableStatus):
        client(params)  # the server's planted 429 surfaces as retryable
    page = client(params)
    assert "items" in page
