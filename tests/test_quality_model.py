"""Model-based quality filtering (functions/quality_model.py).

Training gate: pyspark.ml's unregularized logistic fit must land on the
same MLE as an INDEPENDENT numpy IRLS (Newton) implementation — different
algorithm, shared data only. Scoring gate lives in the driver oracle
(quality_model_score_docs); here we pin scoring's shape + direction.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _irls_logistic(X: np.ndarray, y: np.ndarray, iters: int = 50) -> np.ndarray:
    """Plain Newton/IRLS for the logistic MLE: nothing shared with
    quality_model.py (which delegates to pyspark.ml LBFGS)."""
    Xa = np.hstack([np.ones((X.shape[0], 1)), X])
    beta = np.zeros(Xa.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-Xa @ beta))
        w = p * (1.0 - p)
        H = Xa.T @ (Xa * w[:, None]) + 1e-10 * np.eye(Xa.shape[1])
        g = Xa.T @ (y - p)
        step = np.linalg.solve(H, g)
        beta = beta + step
        if np.max(np.abs(step)) < 1e-12:
            break
    return beta


def test_fit_matches_independent_irls_mle(spark):
    from taxahfe_spark.functions.quality_model import fit_quality_model

    rng = np.random.default_rng(17)
    n = 600
    X = rng.normal(0, 1, (n, 3))
    true = np.array([0.5, 1.5, -2.0, 0.8])
    z = true[0] + X @ true[1:]
    y = (rng.uniform(0, 1, n) < 1.0 / (1.0 + np.exp(-z))).astype(float)
    # noisy labels -> non-separable -> finite, unique MLE
    rows = [
        (float(y[i]), float(X[i, 0]), float(X[i, 1]), float(X[i, 2]))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "label double, f1 double, f2 double, f3 double")
    got = fit_quality_model(df, "label", feature_cols=["f1", "f2", "f3"])
    ref = _irls_logistic(X, y)
    assert abs(got["intercept"] - ref[0]) < 1e-4
    for i, c in enumerate(["f1", "f2", "f3"]):
        assert abs(got["weights"][c] - ref[i + 1]) < 1e-4


def test_score_quality_direction_and_range(spark):
    from taxahfe_spark.functions.quality_model import score_quality

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and they all have fun"),
        (2, "919293 038123 9983 120938 1923 0812 3981 23 0918"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["model_quality"] for r in score_quality(df).collect()}
    assert 0.0 < out[2] < out[1] < 1.0


def test_fit_then_score_roundtrip(spark):
    """A model trained on weak labels separates its own training classes."""
    from taxahfe_spark.functions.quality_model import (
        QUALITY_FEATURES,
        fit_quality_model,
        quality_feature_frame,
        score_quality,
    )

    prose = [
        f"the cat and the dog walked to {w} and they were happy with it all"
        for w in ("town", "school", "market", "paris", "rome", "york")
    ]
    junk = [
        f"{i}9123 08{i}23 99{i}3 12093{i} 19{i}3 08{i}2 39{i}1"
        for i in range(6)
    ]
    rows = [(i, t, 1.0) for i, t in enumerate(prose)] + [
        (100 + i, t, 0.0) for i, t in enumerate(junk)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    feats = quality_feature_frame(df)
    model = fit_quality_model(feats, "label", feature_cols=QUALITY_FEATURES, max_iter=25)
    scored = score_quality(df.drop("label"), model)
    got = {r["doc_id"]: r["model_quality"] for r in scored.collect()}
    assert min(got[i] for i in range(6)) > max(got[100 + i] for i in range(6))
