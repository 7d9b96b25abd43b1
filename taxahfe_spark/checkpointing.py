"""Stage checkpointing with per-partition lineage + metrics (north rule).

A run is a DAG of named stages. Each stage is materialized to parquet under
``{base}/{run_id}/{stage}/data`` with a manifest recording:

- lineage: stage name, declared inputs, a fingerprint of the logical plan;
- per-partition metrics: rows per partition written by the stage.

``checkpoint()`` is resume-aware: if the stage directory already carries a
committed manifest whose plan fingerprint matches, the stage is NOT
recomputed — the parquet is read back, truncating both work and lineage
(the iterative analog of the reference rerunning from saved flat files;
also how the level-loop competition survives a mid-run restart).

The manifest is written AFTER the data (write-ahead data, commit-last), so a
crash mid-stage leaves no committed marker and the stage reruns cleanly.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "manifest.json"


def plan_fingerprint(df: DataFrame) -> str:
    """Stable fingerprint of the analyzed logical plan (expression ids are
    normalized away so the same query text fingerprints identically)."""
    import re

    plan = df._jdf.queryExecution().analyzed().toString()
    plan = re.sub(r"#\d+L?", "#x", plan)
    return hashlib.sha256(plan.encode()).hexdigest()[:16]


def partition_metrics(df: DataFrame) -> list[dict]:
    """Rows per physical partition — one tiny aggregation, no collect of data."""
    rows = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    return [{"partition": r["__pid"], "rows": r["count"]} for r in rows]


class StageCheckpointer:
    def __init__(self, spark: SparkSession, base_dir: str, run_id: str):
        self.spark = spark
        self.base = os.path.join(base_dir, run_id)
        os.makedirs(self.base, exist_ok=True)

    def _paths(self, stage: str) -> tuple[str, str]:
        d = os.path.join(self.base, stage)
        return os.path.join(d, "data"), os.path.join(d, MANIFEST)

    def load_manifest(self, stage: str) -> dict | None:
        _, mpath = self._paths(stage)
        if os.path.exists(mpath):
            with open(mpath) as f:
                return json.load(f)
        return None

    def checkpoint(
        self,
        df: DataFrame,
        stage: str,
        inputs: list[str] | None = None,
        partition_by: list[str] | None = None,
        force: bool = False,
    ) -> DataFrame:
        """Materialize ``df`` as ``stage`` (or reuse the committed result)."""
        data_path, mpath = self._paths(stage)
        fp = plan_fingerprint(df)
        manifest = self.load_manifest(stage)
        if manifest and manifest.get("plan_fingerprint") == fp and not force:
            return self.spark.read.parquet(data_path)

        t0 = time.time()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_path)
        out = self.spark.read.parquet(data_path)
        metrics = partition_metrics(out)
        with open(mpath + ".tmp", "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "inputs": inputs or [],
                    "plan_fingerprint": fp,
                    "wall_seconds": round(time.time() - t0, 3),
                    "rows": sum(m["rows"] for m in metrics),
                    "n_partitions": len(metrics),
                    "partition_metrics": metrics,
                    "committed_at": time.time(),
                },
                f,
                indent=2,
            )
        os.replace(mpath + ".tmp", mpath)  # commit-last
        return out

    def lineage(self) -> list[dict]:
        """All committed stage manifests for this run (audit surface)."""
        out = []
        if not os.path.isdir(self.base):
            return out
        for stage in sorted(os.listdir(self.base)):
            m = self.load_manifest(stage)
            if m:
                out.append(m)
        return out
