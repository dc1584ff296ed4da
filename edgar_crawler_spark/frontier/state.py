"""Snapshot store: atomic checkpoint of frontier/seen/pages/metrics.

The reference's resume mechanism is "whole ledger CSV rewritten to a
tmp file then moved into place after every filing"
(/root/reference/download_filings.py:196-215) plus skip-if-on-disk
checks. Here the same exact-resume guarantee is table snapshots with
an Iceberg-style commit protocol, implemented on plain parquet (the
Iceberg runtime jar is not in this sandbox; the protocol is what
matters and it is identical in spirit):

  snapshot directory  <root>/v<k>/<table>/*.parquet   (data, written first)
  manifest            <root>/v<k>/MANIFEST.json       (commit point)

A snapshot is visible iff its MANIFEST.json exists; the manifest is
written via tmp-file + atomic rename, LAST. Readers resolve
`latest()` = max committed version, so a crash mid-write leaves a
dangling uncommitted directory that the next writer ignores/overwrites
— exactly Iceberg's snapshot isolation, and the property the
kill/resume test exercises. On a real deployment swap this class for
`df.writeTo("catalog.db.t")` Iceberg commits; callers don't change.

Tables per snapshot:
  seen      (url)                          — the URL-seen set
  bloom     (shard, bitmap)                — its sharded bloom bitmaps
  frontier  (remaining scheduled rows)     — queue state
  pages     (FETCH_SCHEMA rows, appended)  — the crawl output
  metrics   (per-partition lineage rows)   — see crawler.py
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SnapshotStore:
    root: str

    def _vdir(self, version: int) -> str:
        return os.path.join(self.root, f"v{version}")

    def versions(self) -> list[int]:
        """Committed versions only (manifest present)."""
        if not os.path.isdir(self.root):
            return []
        out = []
        for name in os.listdir(self.root):
            if name.startswith("v") and name[1:].isdigit():
                if os.path.exists(os.path.join(self.root, name, "MANIFEST.json")):
                    out.append(int(name[1:]))
        return sorted(out)

    def latest(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def manifest(self, version: int) -> dict:
        with open(os.path.join(self._vdir(version), "MANIFEST.json")) as f:
            return json.load(f)

    def commit(
        self,
        tables: dict[str, DataFrame],
        summary: dict | None = None,
    ) -> int:
        """Write all tables of the next snapshot, then commit by
        atomically renaming the manifest into place. Anything that
        dies before the rename is invisible to readers."""
        version = (self.latest() or 0) + 1
        vdir = self._vdir(version)
        if os.path.isdir(vdir):  # uncommitted debris from a crash
            shutil.rmtree(vdir)
        os.makedirs(vdir, exist_ok=True)
        counts = {}
        for name, df in tables.items():
            path = os.path.join(vdir, name)
            df.write.mode("overwrite").parquet(path)
            counts[name] = None  # filled lazily by readers; avoid extra jobs
        manifest = {
            "version": version,
            "committed_at": time.time(),
            "tables": sorted(tables.keys()),
            "summary": summary or {},
        }
        tmp = os.path.join(vdir, ".MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, os.path.join(vdir, "MANIFEST.json"))
        return version

    def read(
        self, spark: SparkSession, table: str, version: int | None = None
    ) -> DataFrame | None:
        v = version if version is not None else self.latest()
        if v is None:
            return None
        path = os.path.join(self._vdir(v), table)
        if not os.path.isdir(path):
            return None
        return spark.read.parquet(path)

    def read_any(self, spark: SparkSession, table: str) -> DataFrame | None:
        """Read `table` from the NEWEST committed version that carries
        it — for tables (e.g. the company_info dim) that not every
        commit rewrites (a requeue commit writes only frontier+seen)."""
        for v in reversed(self.versions()):
            df = self.read(spark, table, v)
            if df is not None:
                return df
        return None
