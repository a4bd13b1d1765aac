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
        lineage and no extra footer-scan job."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        path = self.delta_path(table, round_no)
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(path)
        return int(obs.get["n"])

    def read_table(
        self, spark: SparkSession, table: str, upto_round: int | None = None
    ) -> DataFrame | None:
        """Union of committed deltas (≤ upto_round); None if no data."""
        last = self.last_round if upto_round is None else upto_round
        paths = [
            self.delta_path(table, r)
            for r in range(last + 1)
            if Path(self.delta_path(table, r)).exists()
        ]
        if not paths:
            return None
        return spark.read.parquet(*paths)
