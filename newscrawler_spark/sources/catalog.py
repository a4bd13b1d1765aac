"""Snapshot catalog — the Iceberg-shaped seam.

The north rule asks for Iceberg tables with per-round snapshots and
per-partition lineage; this container has no Iceberg runtime jars, so
the same semantics are implemented over parquet + an atomically-written
JSON manifest (SURVEY.md §7 step 6 fallback), behind one `Catalog` class
so a real Iceberg catalog can be dropped in on a cluster:

  <root>/manifest.json            {"last_round": k, "deltas": {...}}
  <root>/<table>/round=<k>/*.parquet   append-only per-round deltas

Semantics matched to Iceberg:
  * snapshot isolation per round — a round's deltas become visible only
    when the manifest is atomically replaced (os.replace) after all
    writes succeed; a kill mid-round leaves the previous manifest intact;
  * reads union the delta files up to `last_round` (like snapshot
    time-travel `VERSION AS OF`);
  * lineage — every delta row carries its `round`; docs rows also carry
    (domain_bucket, source_seed);
  * at scale, per-round full rewrites are forbidden: url_seen/docs are
    append-only deltas; compaction would be an Iceberg maintenance
    action (rewrite_data_files) and is out of scope here.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# The three small per-round outputs (seen delta, fetch order, quarantine)
# are written as ONE partitioned `round_log` delta —
#   <root>/round_log/round=<k>/kind=<seen|order|quarantine>/*.parquet
# — so a round costs one write job instead of three, while each logical
# table keeps its own name + schema through these read-time views.  The
# kind partition column means a view's read prunes at the FILE level
# (partition pruning, not row-group statistics).  On Iceberg this is an
# append to a log table with PARTITIONED BY (round, kind).
ROUND_LOG_VIEWS: dict[str, tuple[str, list[str]]] = {
    "url_seen": ("seen", ["url_hash", "bucket", "canonical_url", "round AS round_seen"]),
    "fetch_order": ("order", ["round", "domain", "rank", "canonical_url", "url"]),
    "quarantine": ("quarantine", ["url", "round", "error", "attempt"]),
}

# Explicit read schemas: a round with zero log rows writes no partition
# files at all (partitionBy of an empty frame), so inference would fail —
# and at 10^10 scale schema-on-read should never scan footers anyway.
# `kind` (and `round` for multi-delta reads) are partition columns whose
# values come from the directory names.
ROUND_LOG_SCHEMA = (
    "url string, canonical_url string, url_hash bigint, bucket int, "
    "domain string, rank int, error string, attempt int, kind string"
)
ROUND_LOG_SCHEMA_MULTI = ROUND_LOG_SCHEMA + ", round int"


class Catalog:
    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- manifest ------------------------------------------------------------
    @property
    def _manifest_path(self) -> Path:
        return self.root / "manifest.json"

    def read_manifest(self) -> dict:
        if not self._manifest_path.exists():
            return {"last_round": -1, "tables": {}}
        return json.loads(self._manifest_path.read_text())

    def commit_round(self, round_no: int, tables: dict[str, int]) -> None:
        """Atomically publish round `round_no` (tables maps name -> rows
        written this round, recorded as metrics-in-manifest)."""
        manifest = self.read_manifest()
        manifest["last_round"] = round_no
        manifest.setdefault("rounds", {})[str(round_no)] = tables
        tmp = self._manifest_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(manifest, indent=2))
        os.replace(tmp, self._manifest_path)  # atomic on POSIX

    @property
    def last_round(self) -> int:
        return int(self.read_manifest()["last_round"])

    # -- deltas ----------------------------------------------------------------
    def delta_path(self, table: str, round_no: int) -> str:
        return str(self.root / table / f"round={round_no}")

    def write_delta(self, df: DataFrame, table: str, round_no: int) -> int:
        """Write one round's delta; returns row count.  Overwrite is safe:
        an uncommitted round's partial delta is simply rewritten on retry
        (the manifest hasn't advanced).  The count rides on the write
        itself via an Observation — one job, no second execution of the
        lineage and no extra footer-scan job.

        The REBALANCE hint (AQE) sizes the output: a delta assembled
        from unions of 64-partition persisted frames would otherwise
        write one tiny task per input partition (measured 145-674 tasks
        for KB-sized rounds — pure scheduling overhead), while at 100 TB
        the same hint yields evenly-sized ~64 MB files instead of one
        file per upstream partition."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        path = self.delta_path(table, round_no)
        obs = Observation()
        df.hint("rebalance").observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(path)
        return int(obs.get["n"])

    def write_round_log(self, df: DataFrame, round_no: int) -> dict[str, int]:
        """Write the unified per-round log (seen ∪ order ∪ quarantine,
        discriminated and partitioned by `kind`) in ONE job; per-kind row
        counts ride on the write via a multi-aggregate Observation."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        obs = Observation()
        aggs = [
            F.count(F.when(F.col("kind") == k, 1)).alias(k)
            for k in ("seen", "order", "quarantine")
        ]
        # rebalance: see write_delta — the 6-branch union would write
        # one task per upstream partition otherwise
        df.hint("rebalance").observe(obs, *aggs).write.mode("overwrite").partitionBy(
            "kind"
        ).parquet(self.delta_path("round_log", round_no))
        got = obs.get
        return {k: int(got[k]) for k in ("seen", "order", "quarantine")}

    def write_metrics_row(self, round_no: int, counters: dict[str, int]) -> None:
        """Driver-side metrics delta via pyarrow — the row is a handful
        of already-known longs, so spinning a Spark job for it would be
        pure fixed cost."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = Path(self.delta_path("metrics", round_no))
        path.mkdir(parents=True, exist_ok=True)
        table = pa.table(
            {
                "round": pa.array([round_no], type=pa.int32()),
                "scheduled": pa.array([counters["scheduled"]], type=pa.int64()),
                "docs": pa.array([counters["docs"]], type=pa.int64()),
                "quarantined": pa.array([counters["quarantined"]], type=pa.int64()),
                "new_seen": pa.array([counters["new_seen"]], type=pa.int64()),
                "frontier_next": pa.array([counters["frontier_next"]], type=pa.int64()),
            }
        )
        pq.write_table(table, path / "part-00000.parquet")

    def write_budget_state_row_local(
        self,
        round_no: int,
        budget_rows,
        window_s_default: int = 60,
    ) -> None:
        """A4 driver-side: fold the round's per-domain consumption (read
        straight from the just-written round_log order partition with
        in-process DuckDB) into the budget table and write the delta
        with pyarrow — zero Spark jobs.  Same arithmetic as
        operators.scheduling.budget_accounting (which remains the
        distributed path for rounds too big to fold on the driver)."""
        import glob as _glob

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        order_glob = f"{self.delta_path('round_log', round_no)}/kind=order/*.parquet"
        used: dict[str, int] = {}
        if _glob.glob(order_glob):
            for dom, n in duckdb.sql(
                f"SELECT domain, count(*) FROM '{order_glob}' GROUP BY domain"
            ).fetchall():
                used[dom] = int(n)
        doms, caps, wins, useds, rems, resets = [], [], [], [], [], []
        for r in budget_rows:
            u = used.get(r["domain"], 0)
            doms.append(r["domain"])
            caps.append(r["capacity"])
            wins.append(r["window_s"])
            useds.append(u)
            # NULL capacity = unbounded budget (budget_gate semantics):
            # remaining stays NULL, matching the distributed path's
            # null-propagating arithmetic
            rems.append(
                max(0, int(r["capacity"]) - u)
                if r["capacity"] is not None
                else None
            )
            resets.append(
                float(
                    (round_no + 1)
                    * (r["window_s"] if r["window_s"] is not None else window_s_default)
                )
            )
        table = pa.table(
            {
                "domain": pa.array(doms, type=pa.string()),
                "capacity": pa.array(caps, type=pa.int32()),
                "window_s": pa.array(wins, type=pa.int32()),
                "used": pa.array(useds, type=pa.int64()),
                "remaining": pa.array(rems, type=pa.int64()),
                "reset_ts": pa.array(resets, type=pa.float64()),
            }
        )
        path = Path(self.delta_path("budget_state", round_no))
        path.mkdir(parents=True, exist_ok=True)
        pq.write_table(table, path / "part-00000.parquet")

    def write_bloom_local(
        self,
        round_no: int,
        prev_round: int | None,
        m_bits: int,
    ) -> None:
        """Bloom sidecar build/merge on the DRIVER for small rounds —
        zero Spark jobs: the round's (bucket, url_hash) seen rows are
        read with in-process DuckDB, OR-ed into the previous round's
        bitsets with the SAME numpy kernels the distributed path uses
        (operators.seen._build_bitset — bit-for-bit identical sidecars
        either way), and written back with pyarrow.  Total sidecar size
        is n_buckets × m_bits/8 (tens of MB at sandbox scale); rounds
        past the scheduler's threshold use the distributed
        build_bloom/merge_bloom instead."""
        import glob as _glob

        import duckdb
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..operators.seen import _build_bitset

        seen_glob = f"{self.delta_path('round_log', round_no)}/kind=seen/*.parquet"
        by_bucket: dict[int, "np.ndarray"] = {}
        counts: dict[int, int] = {}
        if _glob.glob(seen_glob):
            rel = duckdb.sql(
                f"SELECT bucket, list(url_hash), count(*) "
                f"FROM '{seen_glob}' GROUP BY bucket"
            )
            for bucket, hashes, n in rel.fetchall():
                bits = _build_bitset(np.array(hashes, dtype=np.int64), m_bits)
                by_bucket[int(bucket)] = np.frombuffer(bits, dtype=np.uint8).copy()
                counts[int(bucket)] = int(n)

        if prev_round is not None:
            prev_glob = f"{self.delta_path('bloom', prev_round)}/*.parquet"
            for bucket, bits, n in duckdb.sql(
                f"SELECT bucket, bitset, n_items FROM '{prev_glob}'"
            ).fetchall():
                bucket = int(bucket)
                arr = np.frombuffer(bits, dtype=np.uint8)
                if bucket in by_bucket:
                    by_bucket[bucket] |= arr
                else:
                    by_bucket[bucket] = arr.copy()
                counts[bucket] = counts.get(bucket, 0) + int(n)

        buckets = sorted(by_bucket)
        table = pa.table(
            {
                "bucket": pa.array(buckets, type=pa.int32()),
                "bitset": pa.array(
                    [by_bucket[b].tobytes() for b in buckets], type=pa.binary()
                ),
                "n_items": pa.array(
                    [counts.get(b, 0) for b in buckets], type=pa.int64()
                ),
            }
        )
        path = Path(self.delta_path("bloom", round_no))
        path.mkdir(parents=True, exist_ok=True)
        pq.write_table(table, path / "part-00000.parquet")

    def write_cuckoo_local(
        self,
        round_no: int,
        prev_round: int | None,
        capacity_per_bucket: int,
    ) -> None:
        """Cuckoo sidecar build/merge on the DRIVER for small rounds —
        the write_bloom_local twin for conf.seen_filter='cuckoo'.  Uses
        the SAME numpy kernels as the distributed cogroup
        (operators.cuckoo._bulk_insert on sorted hashes), so the folded
        sidecar is byte-identical per bucket either way (tested)."""
        import glob as _glob

        import duckdb
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..operators.cuckoo import (
            CUCKOO_SLOTS,
            _bulk_insert,
            _size_rows,
        )

        tables: dict[int, "np.ndarray"] = {}
        stashes: dict[int, list] = {}
        counts: dict[int, int] = {}
        if prev_round is not None:
            prev_glob = f"{self.delta_path('cuckoo', prev_round)}/*.parquet"
            for bucket, blob, n_rows, stash, n in duckdb.sql(
                f"SELECT bucket, \"table\", n_rows, stash, n_items "
                f"FROM '{prev_glob}'"
            ).fetchall():
                bucket = int(bucket)
                tables[bucket] = (
                    np.frombuffer(blob, dtype=np.uint16)
                    .reshape(int(n_rows), CUCKOO_SLOTS)
                    .copy()
                )
                stashes[bucket] = list(stash or [])
                counts[bucket] = int(n)

        seen_glob = f"{self.delta_path('round_log', round_no)}/kind=seen/*.parquet"
        if _glob.glob(seen_glob):
            rel = duckdb.sql(
                f"SELECT bucket, list(url_hash ORDER BY url_hash) "
                f"FROM '{seen_glob}' GROUP BY bucket"
            )
            for bucket, hashes in rel.fetchall():
                bucket = int(bucket)
                arr = np.array(hashes, dtype=np.int64)
                if bucket not in tables:
                    tables[bucket] = np.zeros(
                        (
                            _size_rows(max(capacity_per_bucket, len(arr))),
                            CUCKOO_SLOTS,
                        ),
                        dtype=np.uint16,
                    )
                    stashes[bucket] = []
                    counts[bucket] = 0
                overflow = _bulk_insert(tables[bucket], arr)
                stashes[bucket].extend(int(arr[i]) for i in overflow)
                counts[bucket] += len(arr)

        buckets = sorted(tables)
        out = pa.table(
            {
                "bucket": pa.array(buckets, type=pa.int32()),
                "table": pa.array(
                    [tables[b].tobytes() for b in buckets], type=pa.binary()
                ),
                "n_rows": pa.array(
                    [tables[b].shape[0] for b in buckets], type=pa.int32()
                ),
                "stash": pa.array(
                    [stashes[b] for b in buckets], type=pa.list_(pa.int64())
                ),
                "n_items": pa.array(
                    [counts[b] for b in buckets], type=pa.int64()
                ),
            }
        )
        path = Path(self.delta_path("cuckoo", round_no))
        path.mkdir(parents=True, exist_ok=True)
        pq.write_table(out, path / "part-00000.parquet")

    # -- maintenance (Iceberg rewrite_data_files / expire_snapshots) ---------

    # per-round INPUT deltas (frontier) and the kind-partitioned log are
    # excluded: the scheduler addresses them by exact round directory
    COMPACTABLE = ("docs", "neardup", "dedup_index", "dedup_sigs")

    def compact_table(self, spark: SparkSession, table: str,
                      upto_round: int | None = None) -> int:
        """Merge a table's per-round deltas (≤ upto_round) into one
        compacted snapshot — the Iceberg `rewrite_data_files`
        maintenance action, run OUTSIDE the crawl path.  Read-equivalent
        by construction: rows carry their lineage (`round` is a data
        column on docs), only the file layout changes.

        Kill-safe: the compacted dir is written aside and renamed into
        place, then the manifest records the compaction horizon
        atomically; a kill at any point leaves reads on the previous
        layout.  Old round dirs stay until expire_rounds (so time
        travel below the horizon keeps working).  Returns rows
        compacted."""
        if table not in self.COMPACTABLE:
            raise ValueError(f"{table} is not compactable (allow: {self.COMPACTABLE})")
        last = self.last_round if upto_round is None else upto_round
        paths = self._delta_paths(table, last)
        if not paths:
            return 0
        import shutil as _shutil

        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        df = spark.read.parquet(*paths)
        obs = Observation()
        tmp = self.root / table / f"_compact_tmp_{last}"
        _shutil.rmtree(tmp, ignore_errors=True)
        df.hint("rebalance").observe(
            obs, F.count(F.lit(1)).alias("n")
        ).write.mode("overwrite").parquet(str(tmp))
        final = self.root / table / f"compact_upto={last}"
        _shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)
        manifest = self.read_manifest()
        manifest.setdefault("compacted", {})[table] = last
        mtmp = self._manifest_path.with_suffix(".tmp")
        mtmp.write_text(json.dumps(manifest, indent=2))
        os.replace(mtmp, self._manifest_path)
        # superseded compaction snapshots are unreachable once the
        # manifest points past them
        for d in (self.root / table).glob("compact_upto=*"):
            if d != final:
                _shutil.rmtree(d, ignore_errors=True)
        return int(obs.get["n"])

    def expire_rounds(self, table: str) -> int:
        """Delete a table's round deltas at or below its compaction
        horizon (Iceberg `expire_snapshots`): afterwards time travel
        below the horizon raises, exactly like reading an expired
        snapshot.  Returns #dirs removed."""
        import shutil as _shutil

        manifest = self.read_manifest()
        horizon = manifest.get("compacted", {}).get(table)
        if horizon is None:
            return 0
        removed = []
        for r in range(horizon + 1):
            p = Path(self.delta_path(table, r))
            if p.exists():
                _shutil.rmtree(p)
                removed.append(r)
        if removed:
            expired = set(manifest.setdefault("expired", {}).get(table, []))
            manifest["expired"][table] = sorted(expired.union(removed))
            mtmp = self._manifest_path.with_suffix(".tmp")
            mtmp.write_text(json.dumps(manifest, indent=2))
            os.replace(mtmp, self._manifest_path)
        return len(removed)

    def _delta_paths(self, table: str, last: int) -> list[str]:
        manifest = self.read_manifest()
        horizon = manifest.get("compacted", {}).get(table)
        compact_dir = (
            self.root / table / f"compact_upto={horizon}"
            if horizon is not None
            else None
        )
        if (
            horizon is not None
            and horizon <= last
            and compact_dir.exists()
        ):
            start = horizon + 1
            paths = [str(compact_dir)]
        else:
            start = 0
            paths = []
            if horizon is not None and horizon > last:
                # time travel below the compaction horizon only works on
                # unexpired deltas — fail loudly if any are gone
                gone = [
                    r
                    for r in manifest.get("expired", {}).get(table, [])
                    if r <= last
                ]
                if gone:
                    raise ValueError(
                        f"time travel to round {last} of '{table}' crosses the "
                        f"compaction horizon ({horizon}) and deltas {gone} "
                        f"are expired"
                    )
        paths += [
            self.delta_path(table, r)
            for r in range(start, last + 1)
            if Path(self.delta_path(table, r)).exists()
        ]
        return paths

    def read_table(
        self, spark: SparkSession, table: str, upto_round: int | None = None
    ) -> DataFrame | None:
        """Union of committed deltas (≤ upto_round); None if no data.
        The seen/order/quarantine tables resolve as partition-pruned
        views over the unified round_log deltas."""
        last = self.last_round if upto_round is None else upto_round
        if table in ROUND_LOG_VIEWS:
            kind, cols = ROUND_LOG_VIEWS[table]
            paths = self._delta_paths("round_log", last)
            if not paths:
                return None
            from pyspark.sql import functions as F

            return (
                spark.read.schema(ROUND_LOG_SCHEMA_MULTI)
                .option("basePath", str(self.root / "round_log"))
                .parquet(*paths)
                .filter(F.col("kind") == kind)
                .selectExpr(*cols)
            )

        paths = self._delta_paths(table, last)
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def read_round_log_delta(self, spark: SparkSession, round_no: int) -> DataFrame:
        """One round's log delta (kind partition column from the dirs;
        schema explicit so an empty delta still reads)."""
        return spark.read.schema(ROUND_LOG_SCHEMA).parquet(
            self.delta_path("round_log", round_no)
        )
