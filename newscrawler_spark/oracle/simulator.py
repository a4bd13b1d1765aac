"""Single-threaded reference-semantics crawl simulator (SURVEY.md §5).

This is the executable specification the Spark engine must match on
**crawl ordering** and **URL-seen set** (north_rule criteria): a plain
Python loop implementing exactly the semantics of the reference's
run() pipeline generalized to a frontier (fetch order, retry-inside-
fetch, seen-by-canonical-id idempotence per base.py:99-107, budget
arithmetic per pixabay/common/base.py:16-55), over an offline synthetic
web (url -> status/html/out_links).

It shares the per-URL pure functions with the engine (canonical_py
twins, extract_one), so engine-vs-simulator differences isolate the
*distributed* logic: dedup windows, anti-joins, budget ranks, deferral,
frontier unions.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ..canonical import canonical_url_py, detect_platform_py, domain_of_py
from ..functions.extract import extract_one
from ..xhash import md5_64_py


@dataclass(order=True)
class Candidate:
    priority: int
    depth: int
    seq: int
    url: str = field(compare=False)
    source_seed: str = field(compare=False)


def simulate_crawl(
    seeds: list[dict],
    pages: dict[str, tuple[int, str | None, list[str]]],
    budgets: dict[str, tuple[int, int]],       # domain -> (capacity, window_s)
    robots: list[tuple[str, str, bool, float]],  # (domain, prefix, allow, delay)
    max_rounds: int = 10,
    max_depth: int = 10,
) -> dict:
    """Returns {fetch_order, seen, docs, quarantine} ground truth."""
    frontier: list[Candidate] = [
        Candidate(s.get("priority", 0), 0, s["seq"], s["url"], s.get("source_seed", s["url"]))
        for s in seeds
    ]
    seen: set[str] = set()
    fetch_order: list[tuple[int, str, int, str]] = []  # (round, domain, rank, canonical)
    docs: dict[str, dict] = {}
    quarantine: list[tuple[str, int, str]] = []

    def robots_rule(domain: str, url: str) -> tuple[bool, float]:
        path = "/" + url.split("://", 1)[-1].split("/", 1)[-1] if "/" in url.split("://", 1)[-1] else "/"
        best = None
        for d, prefix, allow, delay in robots:
            if d == domain and path.startswith(prefix):
                # deterministic longest-prefix: ties broken by prefix desc
                # (matches the engine's (len, prefix)-desc-sorted array)
                if best is None or (len(prefix), prefix) > (len(best[0]), best[0]):
                    best = (prefix, allow, delay)
        if best is None:
            return True, 0.0
        return best[1], best[2]

    for round_no in range(max_rounds):
        if not frontier:
            break
        # within-round first-wins dedup by canonical (priority, depth, seq)
        by_canon: dict[str, Candidate] = {}
        for cand in sorted(frontier):
            canon = canonical_url_py(cand.url)
            if canon not in by_canon:
                by_canon[canon] = cand

        per_domain: dict[str, list[tuple[Candidate, str]]] = {}
        deferred: list[Candidate] = []
        for canon, cand in by_canon.items():
            if canon in seen:
                continue
            platform = detect_platform_py(cand.url)
            domain = domain_of_py(cand.url)
            if platform is None:
                quarantine.append((cand.url, round_no, "unsupported_platform"))
                seen.add(canon)
                continue
            allow, delay = robots_rule(domain, cand.url)
            if not allow:
                quarantine.append((cand.url, round_no, "robots_denied"))
                seen.add(canon)
                continue
            per_domain.setdefault(domain, []).append((cand, canon))

        discovered: list[Candidate] = []
        for domain in sorted(per_domain):
            entries = sorted(per_domain[domain], key=lambda e: e[0])
            cap, window_s = budgets.get(domain, (2**31 - 1, 60))
            _, delay = robots_rule(domain, entries[0][0].url)
            if delay > 0:
                cap = min(cap, math.floor(window_s / delay))
            for rank, (cand, canon) in enumerate(entries, start=1):
                if rank > cap:
                    deferred.append(cand)
                    continue
                seen.add(canon)
                fetch_order.append((round_no, domain, rank, canon))
                status, html, out_links = pages.get(cand.url, (0, None, []))
                if status == 200 and html:
                    # S3 two-phase hop (same semantics as the fetch stage)
                    from ..sources.fetch import iframe_target_py

                    target = iframe_target_py(html, cand.url)
                    if target:
                        status, html, out_links = pages.get(target, (0, None, []))
                if status != 200:
                    quarantine.append((cand.url, round_no, f"http_{status}"))
                    continue
                ex = extract_one(html, cand.url, detect_platform_py(cand.url))
                if ex["error"] or not ex["spans"]:
                    quarantine.append(
                        (cand.url, round_no, ex["error"] or "empty content")
                    )
                    continue
                docs[canon] = ex
                if cand.depth < max_depth:
                    for link in out_links:
                        discovered.append(
                            Candidate(
                                cand.priority,
                                cand.depth + 1,
                                md5_64_py(link),
                                link,
                                cand.source_seed,
                            )
                        )
        frontier = deferred + discovered
    return {
        "fetch_order": fetch_order,
        "seen": seen,
        "docs": docs,
        "quarantine": quarantine,
    }
