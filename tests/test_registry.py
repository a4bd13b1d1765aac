"""Registry-level invariants: every query has a DuckDB-parsable oracle
and the two dicts stay in lockstep.  Pure DuckDB — no Spark session —
so this is the cheapest guard against SQL drift in the full oracle set."""

from __future__ import annotations

import re

import duckdb
import pytest

from newscrawler_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def test_every_query_has_an_oracle():
    assert set(QUERIES) == set(ORACLES), (
        "queries()/oracle_sql() out of lockstep: "
        f"{set(QUERIES) ^ set(ORACLES)}"
    )


def test_registry_names_are_stable_identifiers():
    for name in QUERIES:
        assert re.fullmatch(r"[a-z][a-z0-9_]*", name), name


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
            " LIMIT 0"
        )
    return con


def test_all_oracles_parse_and_bind(duck):
    """EXPLAIN binds every oracle against the real table schemas
    (zero-row views) — catches column typos, type errors, and DuckDB
    syntax drift without executing anything heavy."""
    bad = {}
    for name, sql in ORACLES.items():
        try:
            duck.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 — collect all failures
            bad[name] = f"{type(exc).__name__}: {exc}"
    assert not bad, bad
