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


def test_competition_level_resume(spark, tmp_path):
    """A restarted competition with the same inputs + resume_dir skips every
    completed level (no Spark stages run) and reproduces the state exactly;
    changed params invalidate the checkpoint via the run fingerprint."""
    import numpy as np
    import pandas as pd

    from taxahfe_spark.operators.competition import CompetitionParams, TreeCompetition
    from taxahfe_spark.operators.filters import feature_filter_flags
    from taxahfe_spark.taxonomy import hierarchical_rollup, to_feature_vectors

    rng = np.random.default_rng(2)
    entities = [f"s{i}" for i in range(40)]
    label = np.array(["a"] * 20 + ["b"] * 20)
    rows = []
    for i, e in enumerate(entities):
        sig = 4.0 if label[i] == "a" else 0.5
        rows.append(("k__x|p__sig", e, float(sig + rng.normal(0, 0.2))))
        rows.append(("k__x|p__junk", e, float(abs(rng.normal(1, 0.3)))))
    long = spark.createDataFrame(rows, "clade_name string, entity_id string, value double")
    resolved = hierarchical_rollup(long)
    flags = (
        feature_filter_flags(resolved, 40, 0.0, 0.0)
        .select("path", "level", "passed_filters")
        .toPandas()
    )
    vectors = to_feature_vectors(resolved, entities)
    params = CompetitionParams(lowest_level=1, nperm=2, num_trees=20, seed=3)
    rdir = str(tmp_path / "resume")

    comp1 = TreeCompetition(vectors, flags, label, None, params)
    state1 = comp1.run(resume_dir=rdir)

    comp2 = TreeCompetition(vectors, flags, label, None, params)
    comp2._run_stage = None  # any Spark stage attempt would raise TypeError
    state2 = comp2.run(resume_dir=rdir)
    pd.testing.assert_frame_equal(state1, state2)

    # different seed -> fingerprint mismatch -> checkpoint ignored (stages
    # WOULD run; verify by the loader returning no completed levels)
    comp3 = TreeCompetition(
        vectors, flags, label, None,
        CompetitionParams(lowest_level=1, nperm=2, num_trees=20, seed=4),
    )
    assert comp3._load_progress(rdir) == []
