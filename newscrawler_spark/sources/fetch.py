"""U3 — the fetch stage.

Two implementations behind one seam:

  * FixtureFetcher — joins the eligible frontier against an offline
    ``pages`` table (url, status, html, out_links).  This is the test /
    bench path: deterministic, no network.  Retry semantics collapse
    (a fixture status is stable across attempts), so attempts is
    reported as 1 for 200s and `max_attempts` for failures — exactly
    what tenacity's stop_after_attempt(3) would have produced for a
    deterministic failure (/root/reference/news_crawler/core/base.py:73-78).

  * HttpFetcher — mapInPandas over URL batches with one requests.Session
    per Arrow batch, a real retry loop (3 attempts, 1 s fixed wait,
    15 s timeout — base.py:26-28) and per-row error isolation.  Carried
    for live use; tests never hit the network.

Both return the frontier columns + (status:int, html:string,
out_links:array<string>, attempts:int).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FETCH_ATTEMPTS = 3     # base.py:26
FETCH_WAIT_S = 1.0     # base.py:27
FETCH_TIMEOUT_S = 15.0 # base.py:28


class FixtureFetcher:
    def __init__(self, pages: DataFrame, max_attempts: int = FETCH_ATTEMPTS):
        self.pages = pages
        self.max_attempts = max_attempts

    def fetch(self, eligible: DataFrame) -> DataFrame:
        pages = self.pages.select(
            F.col("url").alias("p_url"), "status", "html", "out_links"
        )
        out = eligible.join(pages, eligible["url"] == pages["p_url"], "left").drop(
            "p_url"
        )
        # URL not in the fixture web = unresolvable host → status 0
        out = out.withColumn("status", F.coalesce(F.col("status"), F.lit(0)))
        return out.withColumn(
            "attempts",
            F.when(F.col("status") == 200, F.lit(1)).otherwise(
                F.lit(self.max_attempts)
            ),
        )


class HttpFetcher:
    """Live fetch via mapInPandas; requests imported lazily on executors."""

    def __init__(self, max_attempts: int = FETCH_ATTEMPTS,
                 wait_s: float = FETCH_WAIT_S, timeout_s: float = FETCH_TIMEOUT_S):
        self.max_attempts = max_attempts
        self.wait_s = wait_s
        self.timeout_s = timeout_s

    def fetch(self, eligible: DataFrame) -> DataFrame:
        max_attempts, wait_s, timeout_s = self.max_attempts, self.wait_s, self.timeout_s
        out_schema = (
            eligible.schema.simpleString()[7:-1]
            + ",status int,html string,out_links array<string>,attempts int"
        )
        cols = [f.name for f in eligible.schema.fields]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import time

            import requests

            session = requests.Session()
            for pdf in batches:
                statuses, htmls, attempts = [], [], []
                # per-row header maps from with_fetch_config (S4/J2); the
                # `impersonate` column targets a curl_cffi-backed fetcher
                # (S2) on deployments that ship it — requests ignores it
                hdr_col = pdf["headers"] if "headers" in pdf.columns else None
                for i, url in enumerate(pdf["url"]):
                    headers = dict(hdr_col.iloc[i]) if hdr_col is not None and hdr_col.iloc[i] is not None else None
                    status, html, n = 0, None, 0
                    for n in range(1, max_attempts + 1):
                        try:
                            resp = session.get(url, timeout=timeout_s, headers=headers)
                            status = resp.status_code
                            if status == 200:
                                html = resp.text
                                break
                        except requests.RequestException:
                            status = 0
                        if n < max_attempts:
                            time.sleep(wait_s)
                    statuses.append(status)
                    htmls.append(html)
                    attempts.append(n)
                out = pdf[cols].copy()
                out["status"] = statuses
                out["html"] = htmls
                out["out_links"] = [None] * len(pdf)
                out["attempts"] = attempts
                yield out

        return eligible.mapInPandas(run, schema=out_schema)
