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

    def _delta_paths(self, table: str, last: int) -> list[str]:
        return [
            self.delta_path(table, r)
            for r in range(last + 1)
            if Path(self.delta_path(table, r)).exists()
        ]

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
