"""Catalog seam: Iceberg-shaped table API with a parquet fallback.

The north_rule targets Iceberg tables (snapshot isolation, append
commits, partition layout).  This sandbox has no Iceberg runtime jar,
so the same interface is backed by a parquet directory per table plus
a JSON manifest that emulates snapshot ids/commits:

    <root>/<table>/data/snap=<snapshot_id>/part-*.parquet
    <root>/<table>/manifest.json   {"snapshots": [{"id", "run_id",
                                     "rows", "committed"}...]}

Readers see only COMMITTED snapshots (the manifest is written last,
atomically via rename) — the same reader-isolation property an Iceberg
append gives.  On a cluster with the Iceberg jar, ``IcebergCatalog``
(same three methods) maps to ``writeTo(...).append()`` / snapshot
metadata; nothing above this seam changes.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class ParquetCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "manifest.json")

    def snapshots(self, table: str) -> list[dict]:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)["snapshots"]

    def exists(self, table: str) -> bool:
        return bool(self.snapshots(table))

    def append(self, table: str, df: DataFrame, run_id: str,
               partition_by: list[str] | None = None) -> str:
        """One atomic append commit; returns the new snapshot id."""
        snap_id = uuid.uuid4().hex[:12]
        data_dir = os.path.join(self._tdir(table), "data", f"snap={snap_id}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        snaps = self.snapshots(table)
        snaps.append(
            {
                "id": snap_id,
                "run_id": run_id,
                "committed": time.time(),
            }
        )
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"snapshots": snaps}, f, indent=1)
        os.replace(tmp, self._manifest_path(table))  # atomic commit point
        return snap_id

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        """Union of all committed snapshots (uncommitted dirs invisible)."""
        snaps = self.snapshots(table)
        if not snaps:
            raise FileNotFoundError(f"table {table} has no committed snapshots")
        paths = [
            os.path.join(self._tdir(table), "data", f"snap={s['id']}")
            for s in snaps
        ]
        return spark.read.option("basePath", self._tdir(table)).parquet(*paths)
