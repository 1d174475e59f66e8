"""Stage checkpointing with per-partition lineage + metrics + resume.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". The reference's only checkpoint mechanism is
skip-if-output-file-exists (reference corpus.py:497, topic_modeling.py:69);
here every stage writes a parquet table (stand-in for Iceberg — the
Iceberg runtime jar is not in this sandbox; the writer API is isolated in
``_write`` so swapping ``df.writeTo(table).createOrReplace()`` in is a
one-liner) plus a JSON manifest recording row counts per partition and a
schema fingerprint. ``run_stage`` skips recompute when a valid manifest
exists — the DAG resumes mid-pipeline after a crash.

Lineage columns: each checkpointed table carries ``_stage`` and
``_partition_id`` (spark_partition_id at write time).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_kargo_manifest.json"


@dataclass
class StageResult:
    name: str
    path: str
    rows: int
    seconds: float
    resumed: bool
    partitions: dict[str, int] = field(default_factory=dict)


class CheckpointRunner:
    """Chains DataFrame stages with parquet checkpoints + resume.

    ``root=None`` switches to in-memory mode: stages persist() LAZILY
    (rows recorded as -1) and the caller's terminal action materializes
    the whole chain as one DAG — no per-stage count barrier, no
    durability. ``use_snapshots=True`` (with a root) stores each stage as
    an Iceberg-lite snapshot table instead of bare parquet+manifest.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str | None,
        resume: bool = True,
        use_snapshots: bool = False,
    ):
        self.spark = spark
        self.root = root
        self.resume = resume and root is not None
        self.use_snapshots = use_snapshots and root is not None
        self.results: list[StageResult] = []
        if root is not None:
            os.makedirs(root, exist_ok=True)

    def table(self, name: str):
        """The stage's Iceberg-lite table (snapshot mode only): atomic
        metadata-pointer commits, time travel, rollback — see
        iceberg_lite.IcebergLiteTable."""
        from .iceberg_lite import IcebergLiteTable

        return IcebergLiteTable(self.spark, self._dir(name))

    def _run_stage_snapshot(self, name: str, fn: Callable[[], DataFrame]) -> DataFrame:
        t0 = time.time()
        tbl = self.table(name)
        if self.resume and tbl.exists():
            snap = tbl._snapshot(tbl.current_snapshot_id())
            self.results.append(
                StageResult(
                    name, self._dir(name), snap["summary"]["added_rows"],
                    time.time() - t0, True, snap["summary"]["added_partitions"],
                )
            )
            return tbl.read()
        tbl.commit(fn(), "overwrite")
        snap = tbl._snapshot(tbl.current_snapshot_id())
        self.results.append(
            StageResult(
                name, self._dir(name), snap["summary"]["added_rows"],
                time.time() - t0, False, snap["summary"]["added_partitions"],
            )
        )
        return tbl.read()

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._dir(name), MANIFEST)

    def is_done(self, name: str) -> bool:
        mp = self._manifest_path(name)
        if not os.path.exists(mp):
            return False
        try:
            with open(mp) as f:
                m = json.load(f)
            return m.get("status") == "complete"
        except (json.JSONDecodeError, OSError):
            return False

    def run_stage(
        self, name: str, fn: Callable[[], DataFrame], persist: bool = True
    ) -> DataFrame:
        """Compute-or-load a stage. ``fn`` is only invoked on a cache miss,
        so resumed runs never even build the upstream plan.

        ``persist=False`` (in-memory mode only) skips the stage cache:
        right for stages with exactly ONE downstream consumer, where a
        lazy persist is pure overhead — the cache write (copy + memory
        pressure) buys nothing because the block is read back exactly once
        (guide §5: caching is only worth it when a DataFrame is REUSED).
        Durable modes ignore the flag — a checkpoint is the product there,
        not an optimization."""
        if self.use_snapshots:
            return self._run_stage_snapshot(name, fn)
        t0 = time.time()
        if self.root is None:
            # in-memory mode: persist WITHOUT a count action. A count per
            # stage = one serialized job wave each (9 waves for the
            # triples-only DAG); lazy persists let the caller's single
            # terminal action materialize the whole chain in one DAG while
            # still caching every shared node. rows=-1 marks "not counted".
            df = fn()
            if persist:
                df = df.persist()
            self.results.append(StageResult(name, "<memory>", -1, time.time() - t0, False))
            return df
        path = self._dir(name)
        if self.resume and self.is_done(name):
            df = self.spark.read.parquet(path)
            with open(self._manifest_path(name)) as f:
                m = json.load(f)
            self.results.append(
                StageResult(name, path, m["rows"], time.time() - t0, True, m["partitions"])
            )
            return df.drop("_stage", "_partition_id")
        df = fn()
        out = df.withColumn("_stage", F.lit(name)).withColumn(
            "_partition_id", F.spark_partition_id()
        )
        out.write.mode("overwrite").parquet(path)
        written = self.spark.read.parquet(path)
        pcounts = {
            str(r["_partition_id"]): r["n"]
            for r in written.groupBy("_partition_id").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        rows = sum(pcounts.values())
        manifest = {
            "status": "complete",
            "stage": name,
            "rows": rows,
            "partitions": pcounts,
            "schema": written.drop("_stage", "_partition_id").schema.simpleString(),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "seconds": round(time.time() - t0, 3),
        }
        with open(self._manifest_path(name), "w") as f:
            json.dump(manifest, f, indent=1)
        self.results.append(StageResult(name, path, rows, time.time() - t0, False, pcounts))
        return written.drop("_stage", "_partition_id")

    def metrics(self) -> list[dict]:
        return [
            {
                "stage": r.name,
                "rows": r.rows,
                "seconds": round(r.seconds, 3),
                "resumed": r.resumed,
                "n_partitions": len(r.partitions),
            }
            for r in self.results
        ]
