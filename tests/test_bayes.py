"""M7 Bayesian tuning (tune_bayes analog, functions/bayes.py).

The GP surrogate + EI loop is validated on closed-form landscapes (no
Spark), then end-to-end through run_dietml(tune_strategy="bayes") on the
small-n rf fast path. Reference: lib/diet_ml_funcs.R:722-806
(tune_bayes with initial=5/15/20, iter=tune_length, no_improve=tune_stop,
uncertain=5, seeded)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from taxahfe_spark.functions.bayes import (
    _expected_improvement,
    _fit_gp,
    bayes_search,
    decode,
    space_for,
)


def test_decode_bounds_and_types():
    for model in ("rf", "lasso", "ridge", "enet", "xgboost", "svm"):
        space = space_for(model)
        for u in (np.zeros(len(space)), np.ones(len(space)), np.full(len(space), 0.5)):
            params = decode(u, model)
            for (name, kind, lo, hi), _ in zip(space, u):
                v = params[name]
                if kind == "int":
                    assert isinstance(v, int) and lo <= v <= hi
                elif kind == "log":
                    assert 10.0**lo <= v <= 10.0**hi * (1 + 1e-12)
                elif kind == "frac":
                    assert isinstance(v, str) and lo <= float(v) <= hi
                else:
                    assert lo <= v <= hi


def test_gp_interpolates_training_points():
    rng = np.random.default_rng(0)
    X = rng.random((12, 2))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2
    gp = _fit_gp(X, y)
    mu, sigma = gp.posterior(X)
    assert np.allclose(mu, y, atol=0.05)
    # posterior collapses at observed points, stays wide far away
    far = np.array([[5.0, 5.0]])
    _, s_far = gp.posterior(far)
    assert s_far[0] > sigma.mean()


def test_expected_improvement_prefers_high_mean_then_uncertainty():
    mu = np.array([0.0, 1.0, 0.0])
    sigma = np.array([0.1, 0.1, 2.0])
    ei = _expected_improvement(mu, sigma, best=0.5)
    assert ei[1] > ei[0]  # higher mean wins at equal sigma
    assert ei[2] > ei[0]  # high sigma beats a clearly-worse certain point


def test_bayes_search_converges_on_1d_log_landscape():
    """svm cost space is log10 in [-3, 1]; optimum planted at cost=0.1."""

    def evaluate(params: dict) -> float:
        return -((math.log10(params["cost"]) + 1.0) ** 2)

    rows = bayes_search(
        "svm", evaluate, maximize=True, seed=0, iterations=25, no_improve=25
    )
    best = max(rows, key=lambda r: r["mean_metric"])
    assert abs(math.log10(best["params"]["cost"]) + 1.0) < 0.3
    # 5 initial + up to 25 iterations
    assert 6 <= len(rows) <= 30


def test_bayes_search_deterministic_and_stops_early():
    calls = []

    def evaluate(params: dict) -> float:
        calls.append(params)
        return 1.0  # flat landscape: nothing ever improves on the incumbent

    rows = bayes_search(
        "svm", evaluate, maximize=True, seed=7, iterations=50, no_improve=4
    )
    # initial design of 5, then exactly no_improve non-improving iterations
    assert len(rows) == 5 + 4
    rows2 = bayes_search(
        "svm", lambda p: 1.0, maximize=True, seed=7, iterations=50, no_improve=4
    )
    assert [r["params"] for r in rows] == [r["params"] for r in rows2]


def test_bayes_search_minimize_direction():
    def evaluate(params: dict) -> float:
        return (math.log10(params["cost"]) + 1.0) ** 2  # minimize at cost=0.1

    rows = bayes_search(
        "svm", evaluate, maximize=False, seed=3, iterations=20, no_improve=20
    )
    best = min(rows, key=lambda r: r["mean_metric"])
    assert abs(math.log10(best["params"]["cost"]) + 1.0) < 0.3


def test_run_dietml_bayes_end_to_end(spark):
    """rf classification on the small-n local fast path: the whole bayes
    trajectory (5 initial + iterations) runs driver-local numpy fits."""
    from taxahfe_spark.dietml import run_dietml

    rows = [
        (
            f"s{i}",
            float(i % 7) + (10.0 if i % 2 else 0.0),
            float((i * 13) % 5),
            "yes" if i % 2 else "no",
        )
        for i in range(90)
    ]
    df = spark.createDataFrame(
        rows, "subject_id string, a double, b double, feature_of_interest string"
    )
    kw = dict(
        feature_type="factor", model="rf", folds=2, cv_repeats=1,
        tune_length=3, tune_stop=3, metric="bal_accuracy", seed=11,
        tune_strategy="bayes", num_trees=25,
    )
    r1 = run_dietml(df, **kw)
    r2 = run_dietml(df, **kw)
    assert r1.best_params == r2.best_params
    assert list(r1.cv_results["mean_metric"]) == list(r2.cv_results["mean_metric"])
    assert len(r1.cv_results) >= 5  # at least the initial design
    p = r1.best_params
    assert 1 <= int(p["min_n"]) <= 40
    assert 0.1 <= float(p["mtry"]) <= 0.9
    # separable task: the tuned model must beat the null baseline
    fr = r1.full_results.set_index(".metric")
    assert fr.loc["bal_accuracy", "estimate"] > fr.loc["bal_accuracy", "null_model_avg"]
