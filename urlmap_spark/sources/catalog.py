"""Catalog shim: atomic per-round commits over plain Parquet.

The target deployment uses Iceberg tables (snapshot-isolated commits);
the Iceberg runtime JAR is not available in this sandbox, so this shim
provides the same contract over a directory layout:

    <root>/rounds/r=NNNN/{frontier,results,seen_delta,lineage}/  (parquet)
    <root>/rounds/r=NNNN/metrics.json
    <root>/rounds/r=NNNN/_COMMITTED          <- written LAST (atomic marker)

A round is visible iff its _COMMITTED marker exists; a crashed round
leaves no marker and is overwritten on resume. This emulates Iceberg's
snapshot semantics (readers never see a half-written round) with rename-
level atomicity, and keeps the code Iceberg-ready: every write goes
through commit_round()/read_* below, so swapping in `writeTo(...).append()`
is a one-file change.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class RoundCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "rounds"), exist_ok=True)

    def _rdir(self, r: int) -> str:
        return os.path.join(self.root, "rounds", f"r={r:04d}")

    def committed_rounds(self) -> list[int]:
        base = os.path.join(self.root, "rounds")
        out = []
        for d in os.listdir(base):
            if d.startswith("r=") and os.path.exists(os.path.join(base, d, "_COMMITTED")):
                out.append(int(d[2:]))
        return sorted(out)

    def last_round(self) -> int | None:
        rs = self.committed_rounds()
        return rs[-1] if rs else None

    def commit_round(self, r: int, tables: dict[str, DataFrame], metrics: dict,
                     partition_by: dict[str, list[str]] | None = None) -> None:
        """Write all tables + metrics, then the commit marker (atomic-ish:
        a reader only trusts rounds with the marker). partition_by maps a
        table name to its on-disk partition columns (e.g. the frontier's
        host-hash bucket — north_rule: a frontier partitioned by
        host-hash, so per-host maintenance reads prune at scan time)."""
        rdir = self._rdir(r)
        if os.path.exists(rdir):  # uncommitted leftover from a crash
            shutil.rmtree(rdir)
        os.makedirs(rdir)
        for name, df in tables.items():
            w = df.write.mode("overwrite")
            cols = (partition_by or {}).get(name)
            if cols:
                w = w.partitionBy(*cols)
            w.parquet(os.path.join(rdir, name))
        tmp = os.path.join(rdir, ".metrics.tmp")
        with open(tmp, "w") as f:
            json.dump(metrics, f)
        os.replace(tmp, os.path.join(rdir, "metrics.json"))
        # marker last: rename is atomic on POSIX
        mtmp = os.path.join(rdir, "._COMMITTED.tmp")
        open(mtmp, "w").close()
        os.replace(mtmp, os.path.join(rdir, "_COMMITTED"))

    def read(self, spark: SparkSession, r: int, name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self._rdir(r), name))

    def read_metrics(self, r: int) -> dict:
        with open(os.path.join(self._rdir(r), "metrics.json")) as f:
            return json.load(f)

    def read_union(self, spark: SparkSession, name: str, upto: int | None = None) -> DataFrame:
        """Union of table `name` across committed rounds (e.g. the full
        seen set = union of seen_delta). Parquet reads many dirs in one
        scan — no driver-side loop over rows."""
        rs = self.committed_rounds()
        if upto is not None:
            rs = [r for r in rs if r <= upto]
        paths = [os.path.join(self._rdir(r), name) for r in rs
                 if os.path.exists(os.path.join(self._rdir(r), name))]
        if not paths:
            raise FileNotFoundError(f"no committed '{name}' tables under {self.root}")
        return spark.read.parquet(*paths)
