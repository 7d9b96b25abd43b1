"""Checkpoint/lineage tests: commit-last semantics, resume skips recompute,
per-partition metrics recorded."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from taxahfe_spark.checkpointing import StageCheckpointer, partition_metrics


def test_checkpoint_resume(spark, tmp_path):
    cp = StageCheckpointer(spark, str(tmp_path), "run1")
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    out1 = cp.checkpoint(df, "stage_a", inputs=[])
    assert out1.count() == 1000
    m = cp.load_manifest("stage_a")
    assert m["rows"] == 1000
    assert m["n_partitions"] >= 1
    assert sum(p["rows"] for p in m["partition_metrics"]) == 1000
    committed = m["committed_at"]

    # same plan -> resume, no rewrite (manifest timestamp unchanged)
    out2 = cp.checkpoint(df, "stage_a", inputs=[])
    assert out2.count() == 1000
    assert cp.load_manifest("stage_a")["committed_at"] == committed

    # changed plan -> recompute
    df2 = spark.range(500).withColumn("v", F.col("id") * 3)
    out3 = cp.checkpoint(df2, "stage_a", inputs=[])
    assert out3.count() == 500
    assert cp.load_manifest("stage_a")["rows"] == 500


def test_lineage_chain(spark, tmp_path):
    cp = StageCheckpointer(spark, str(tmp_path), "run2")
    a = cp.checkpoint(spark.range(10), "a", inputs=[])
    b = cp.checkpoint(a.withColumn("x", F.col("id") + 1), "b", inputs=["a"])
    lin = cp.lineage()
    assert [m["stage"] for m in lin] == ["a", "b"]
    assert lin[1]["inputs"] == ["a"]
    assert all("plan_fingerprint" in m for m in lin)


def test_no_commit_marker_means_rerun(spark, tmp_path):
    cp = StageCheckpointer(spark, str(tmp_path), "run3")
    df = spark.range(100)
    cp.checkpoint(df, "s", inputs=[])
    # simulate crash: manifest lost, data present
    os.remove(os.path.join(str(tmp_path), "run3", "s", "manifest.json"))
    out = cp.checkpoint(df, "s", inputs=[])
    assert out.count() == 100
    assert cp.load_manifest("s") is not None
