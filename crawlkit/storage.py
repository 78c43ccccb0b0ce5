"""Warehouse: per-round snapshot tables with atomic manifest commits.

On a production cluster these tables are Iceberg (atomic snapshot per
round, bucketed by host-hash; SURVEY.md §1.3).  This sandbox has no
Iceberg runtime jar, so the same *commit semantics* are provided by a
directory-per-round Parquet layout plus a JSON manifest whose rewrite
(temp file + ``os.replace``) is the atomic commit point — readers only
see rounds recorded in the manifest, exactly like Iceberg snapshot
isolation.  ``rounds.py`` is written against this interface only, so an
Iceberg-backed implementation is a drop-in swap.

Checkpoint/resume (T6, reference graceful-shutdown analog
``src/main.ts:22-33``): resume = read manifest → last committed round →
continue; a half-written round directory is invisible and re-executed.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class Warehouse:
    def __init__(self, path: str | os.PathLike) -> None:
        self.root = Path(path)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- manifest ---------------------------------------------------------
    @property
    def _manifest_path(self) -> Path:
        return self.root / "_manifest.json"

    def _read_manifest(self) -> dict:
        if not self._manifest_path.exists():
            return {"last_round": None, "rounds": {}}
        return json.loads(self._manifest_path.read_text())

    def commit_round(self, round_no: int, tables: dict[str, int]) -> None:
        """Atomically publish a round: record table row-counts; readers
        never see data from uncommitted rounds."""
        manifest = self._read_manifest()
        manifest["rounds"][str(round_no)] = {"tables": tables}
        last = manifest["last_round"]
        manifest["last_round"] = round_no if last is None else max(last, round_no)
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix="_manifest_", suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(tmp, self._manifest_path)

    def last_committed_round(self) -> int | None:
        return self._read_manifest()["last_round"]

    def committed_rounds(self, table: str) -> list[int]:
        manifest = self._read_manifest()
        return sorted(
            int(r)
            for r, info in manifest["rounds"].items()
            if table in info["tables"]
        )

    # -- data -------------------------------------------------------------
    def _round_dir(self, table: str, round_no: int) -> Path:
        return self.root / table / f"round={round_no}"

    def round_path(self, table: str, round_no: int) -> Path:
        """Staging path for a round's data — written by the engine
        (including in-task pyarrow shard writers), invisible to readers
        until commit_round publishes it in the manifest."""
        return self._round_dir(table, round_no)

    def write(self, df: DataFrame, table: str, round_no: int) -> None:
        """Stage a round's data (not visible until commit_round)."""
        df.write.mode("overwrite").parquet(str(self._round_dir(table, round_no)))

    def row_count(self, table: str, round_no: int) -> int:
        """Row count of a staged round from parquet FOOTER metadata —
        no Spark job.  Iceberg keeps the same number in snapshot
        manifests; here the footers are the metadata store.  Replaces
        post-write ``df.count()`` actions, which each cost a full
        scheduling round-trip just to recount already-written data."""
        import pyarrow.parquet as pq

        total = 0
        d = self._round_dir(table, round_no)
        for f in d.glob("*.parquet"):
            total += pq.ParquetFile(f).metadata.num_rows
        return total

    def read(
        self,
        spark: SparkSession,
        table: str,
        schema: T.StructType,
        rounds: list[int] | None = None,
    ) -> DataFrame:
        """Read committed rounds only (or an explicit round subset)."""
        if rounds is None:
            rounds = self.committed_rounds(table)
        paths = [
            str(self._round_dir(table, r))
            for r in rounds
            if self._round_dir(table, r).exists()
        ]
        if not paths:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*paths)
