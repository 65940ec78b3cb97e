"""Checkpoint lakehouse with per-partition lineage (SURVEY.md section 4.3/7).

Production target is Iceberg (partitioned ``days(warc_ts)`` + ``bucket(url)``,
MERGE INTO for upserts); this sandbox has no Iceberg runtime jar, so the same
contract is implemented over parquet directories + a ``_lineage`` parquet
table. The lineage law replaces the reference's Mongo work-queue/status
machinery (status/ml_status claims at crocodile/crocodile.py:158-173 and
crocodile/ml.py:110-128): one lineage row per (stage, partition) with row
counts and wall time; a restarted run skips stages whose lineage says DONE
(the anti-join resume of SURVEY.md section 7).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageResult:
    name: str
    df: DataFrame
    rows: int
    wall_s: float
    resumed: bool


class Lakehouse:
    """Parquet-backed stage store with lineage rows and stage-level resume."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths -------------------------------------------------------------
    def _stage_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _lineage_path(self) -> str:
        return os.path.join(self.root, "_lineage")

    def _marker(self, name: str) -> str:
        return os.path.join(self.root, f"_{name}.DONE.json")

    # -- lineage -----------------------------------------------------------
    def is_done(self, name: str) -> bool:
        return os.path.exists(self._marker(name))

    def lineage(self) -> DataFrame | None:
        p = self._lineage_path()
        if not os.path.exists(p):
            return None
        return self.spark.read.parquet(p)

    def _write_lineage(self, name: str, part_counts: DataFrame, wall_s: float) -> None:
        new = (
            part_counts.withColumn("stage", F.lit(name))
            .withColumn("wall_s", F.lit(wall_s))
            .withColumn("status", F.lit("DONE"))
        )
        p = self._lineage_path()
        existing = self.lineage()
        if (
            existing is not None
            and existing.where(F.col("stage") == name).limit(1).count() > 0
        ):
            # stage re-execution after a kill/invalidate: replace this
            # stage's lineage rows instead of appending a duplicate set
            # (lineage totals would double-count otherwise). Materialize the
            # kept rows before overwriting the directory they were read from.
            kept = existing.where(F.col("stage") != name).localCheckpoint(eager=True)
            kept.unionByName(new).write.mode("overwrite").parquet(p)
        else:
            new.write.mode("append").parquet(p)

    # -- stage execution with resume ---------------------------------------
    def run_stage(self, name: str, build) -> StageResult:
        """Run ``build() -> DataFrame`` unless this stage is already DONE.

        On completion the stage output is written to parquet, per-partition
        row counts go to ``_lineage``, and a DONE marker (with totals) makes
        the stage skippable on restart.
        """
        path = self._stage_path(name)
        if self.is_done(name):
            df = self.spark.read.parquet(path)
            with open(self._marker(name)) as f:
                meta = json.load(f)
            return StageResult(name, df, meta["rows"], 0.0, resumed=True)

        t0 = time.time()
        df = build()
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        # per-partition lineage of the materialized output
        part_counts = (
            out.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(F.count(F.lit(1)).alias("rows"))
        )
        wall = time.time() - t0
        self._write_lineage(name, part_counts, wall)
        rows = out.count()
        with open(self._marker(name), "w") as f:
            json.dump({"stage": name, "rows": rows, "wall_s": wall}, f)
        return StageResult(name, out, rows, wall, resumed=False)

    def invalidate(self, name: str) -> None:
        """Simulate a mid-run kill: forget that a stage completed."""
        m = self._marker(name)
        if os.path.exists(m):
            os.remove(m)
