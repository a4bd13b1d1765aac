"""Live-fetch contract test for HttpFetcher against a loopback stdlib
HTTP server — no external network.  Exercises the reference's fetch
semantics (/root/reference/news_crawler/core/base.py:26-28,73-78):

  * 200 → html returned, attempts == 1;
  * deterministic 404 → status recorded, all 3 attempts consumed;
  * transient 500,500,200 → retry ladder recovers, attempts == 3;
  * timeout → status 0 (connection-level failure), attempts == 3;
  * iframe holder page → in-stage two-phase hop (S3, naver semantics),
    document keeps the ORIGINAL url identity.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from newscrawler_spark.sources.fetch import HttpFetcher

OK_HTML = "<html><body><p>hello from loopback</p></body></html>"


class _Handler(BaseHTTPRequestHandler):
    hits: dict[str, int] = {}
    lock = threading.Lock()

    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        with self.lock:
            n = self.hits.get(self.path, 0) + 1
            self.hits[self.path] = n
        if self.path == "/ok":
            body = OK_HTML.encode()
            self.send_response(200)
        elif self.path == "/notfound":
            body = b"gone"
            self.send_response(404)
        elif self.path == "/flaky":
            if n < 3:
                body = b"boom"
                self.send_response(500)
            else:
                body = b"<html><p>recovered</p></html>"
                self.send_response(200)
        elif self.path == "/slow":
            import time

            time.sleep(3.0)
            body = b"late"
            self.send_response(200)
        elif self.path == "/iframe":
            body = (
                '<html><iframe id="mainFrame" src="/ok"></iframe></html>'
            ).encode()
            self.send_response(200)
        else:
            body = b"?"
            self.send_response(404)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def server():
    _Handler.hits = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_fetcher_contract(spark, server):
    urls = [
        f"{server}/ok",
        f"{server}/notfound",
        f"{server}/flaky",
        f"{server}/slow",
        f"{server}/iframe",
    ]
    frontier = spark.createDataFrame(
        [(u, "127.0.0.1") for u in urls], "url string, domain string"
    )
    fetcher = HttpFetcher(
        max_attempts=3, wait_s=0.05, timeout_s=1.0, n_partitions=2, salt_factor=2
    )
    rows = {r.url.rsplit("/", 1)[-1]: r for r in fetcher.fetch(frontier).collect()}

    ok = rows["ok"]
    assert (ok.status, ok.attempts) == (200, 1) and "hello from loopback" in ok.html

    nf = rows["notfound"]
    assert nf.status == 404 and nf.attempts == 3 and nf.html is None

    fl = rows["flaky"]
    assert fl.status == 200 and fl.attempts == 3 and "recovered" in fl.html

    sl = rows["slow"]
    assert sl.status == 0 and sl.attempts == 3 and sl.html is None

    # S3: iframe holder resolved in-stage; row keeps the ORIGINAL url
    fr = rows["iframe"]
    assert fr.status == 200 and "hello from loopback" in fr.html
    assert fr.url.endswith("/iframe")
