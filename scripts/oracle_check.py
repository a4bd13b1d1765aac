"""Run every registry query against its DuckDB oracle at any sf dir.

The driver does this at sf0.01 (CORRECTNESS_r{N}.json); this script is
the same comparison shape — columns sorted by name, rows sorted, values
stringified — runnable at other scales (notably the sf1 upsample from
scripts/make_sf.py, round-4 verdict task 1: "CORRECTNESS green at sf1
for the oracle-feasible rows").

Usage:
  python scripts/oracle_check.py [SF_DIR]   # default /tmp/sfscale/sf1

Prints one JSON line: {"sf_dir": ..., "checked": N, "failures": [...],
"per_query": {name: {"rows": n, "match": bool, "sec": s}}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df):
    """Engine-neutral frame: column-name order, stringified cells
    (floats rounded so the two engines' float printing agrees; list
    cells via python list so numpy arrays from DuckDB compare equal),
    row-sorted."""
    import numpy as np

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        def cell(v):
            if isinstance(v, (list, np.ndarray)):
                return str([cell(x) for x in v])
            if isinstance(v, (float, np.floating)):
                return f"{float(v):.9g}"
            return str(v)
        df[c] = df[c].map(cell)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf1"
    import duckdb

    import __spark_entry__ as entrymod
    from newscrawler_spark.session import get_spark

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    only = os.environ.get("SPARK_GRAFT_QUERIES", "")
    if only:
        keep = {q.strip() for q in only.split(",") if q.strip()}
        qs = {k: v for k, v in qs.items() if k in keep}
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("oracle-check", cores=cpus, shuffle_partitions=2 * cpus)
    con = duckdb.connect()
    con.execute(f"SET threads TO {cpus}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    per_query: dict[str, dict] = {}
    failures: list[str] = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            if name not in oracles:
                per_query[name] = {
                    "rows": len(sdf), "match": None, "sec": round(time.time() - t0, 2),
                    "note": "no oracle (non-SQL-expressible); rows-only",
                }
                print(f"ROWS  {name}: {len(sdf)} rows (no oracle)", file=sys.stderr)
                continue
            odf = con.execute(oracles[name]).df()
            a, b = normalize(sdf), normalize(odf)
            ok = list(a.columns) == list(b.columns) and len(a) == len(b) and a.equals(b)
            per_query[name] = {
                "rows": len(sdf), "oracle_rows": len(odf), "match": bool(ok),
                "sec": round(time.time() - t0, 2),
            }
            tag = "OK   " if ok else "FAIL "
            print(f"{tag} {name}: {len(sdf)} rows [{per_query[name]['sec']}s]",
                  file=sys.stderr)
            if not ok:
                failures.append(name)
        except Exception as exc:  # noqa: BLE001 — record, keep checking
            per_query[name] = {"match": False, "err": f"{type(exc).__name__}: {exc}"}
            failures.append(name)
            print(f"ERR   {name}: {exc}", file=sys.stderr)
    spark.stop()
    print(json.dumps({
        "sf_dir": sf_dir, "checked": len(per_query), "failures": failures,
        "per_query": per_query,
    }))


if __name__ == "__main__":
    main()
