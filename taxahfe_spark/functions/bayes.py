"""Gaussian-process Bayesian hyperparameter search (SURVEY M7).

Numpy-only analog of tidymodels ``tune_bayes`` (reference
lib/diet_ml_funcs.R:789-806): an RBF-kernel GP surrogate over
unit-cube-encoded hyperparameters, expected-improvement acquisition over a
seeded candidate pool, an *uncertain* pick (max posterior sigma) every
``uncertain`` consecutive non-improving iterations
(``control_bayes(uncertain = 5)``), and a stop after ``no_improve``
non-improving iterations (reference ``--tune_stop``).

Everything is deterministic in ``seed``: the initial design, the per-
iteration candidate pools, and the GP (whose lengthscale/noise are chosen
from a fixed grid by log marginal likelihood) involve no un-seeded
randomness, so a re-run reproduces the identical search trajectory.

Parameter spaces mirror the reference's ``dials`` ranges where they exist
(penalty widened to log10 range (-8, 3) and mixture to (0.1, 0.9) exactly
as lib/diet_ml_funcs.R:763-771 does; initial-design sizes 5/15/20 per
lib/diet_ml_funcs.R:726,748,770); integer dials round after decoding.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable

import numpy as np

# (name, kind, lo, hi): kind "int" rounds after decode, "log" decodes
# through log10-space. rf's mtry decodes to a feature-fraction STRING —
# pyspark.ml's featureSubsetStrategy and the local forest path both accept
# "0.417"-style fractions, giving the GP a continuous axis where the grid
# strategy only has three points.
_SPACES: dict[str, list[tuple[str, str, float, float]]] = {
    "rf": [("min_n", "int", 1.0, 40.0), ("mtry", "frac", 0.1, 0.9)],
    "lasso": [("penalty", "log", -8.0, 3.0)],
    "ridge": [("penalty", "log", -8.0, 3.0)],
    "enet": [("penalty", "log", -8.0, 3.0), ("mixture", "float", 0.1, 0.9)],
    "xgboost": [("tree_depth", "int", 1.0, 8.0), ("trees", "int", 20.0, 100.0)],
    "svm": [("cost", "log", -3.0, 1.0)],
    "mars": [("num_terms", "int", 2.0, 30.0), ("prod_degree", "int", 1.0, 2.0)],
}

_N_INITIAL = {  # lib/diet_ml_funcs.R:726 (default 5), :748 (xgboost), :770
    "xgboost": 15,
    "lasso": 20,
    "ridge": 20,
    "enet": 20,
}


def space_for(model: str) -> list[tuple[str, str, float, float]]:
    if model not in _SPACES:
        raise NotImplementedError(f"no bayes space for model '{model}'")
    return _SPACES[model]


def decode(u: np.ndarray, model: str) -> dict:
    """Unit-cube point -> params dict (the estimator-facing encoding)."""
    params: dict = {}
    for (name, kind, lo, hi), x in zip(space_for(model), u):
        v = lo + float(x) * (hi - lo)
        if kind == "int":
            params[name] = int(round(v))
        elif kind == "log":
            params[name] = float(10.0**v)
        elif kind == "frac":
            params[name] = f"{v:.3f}"
        else:
            params[name] = float(v)
    return params


# -- GP surrogate -------------------------------------------------------------


def _rbf(a: np.ndarray, b: np.ndarray, ls: float) -> np.ndarray:
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(axis=2)
    return np.exp(-0.5 * d2 / (ls * ls))


@dataclass
class _GP:
    X: np.ndarray
    alpha: np.ndarray  # K^-1 y_std
    L: np.ndarray
    ls: float
    y_mean: float
    y_sd: float

    def posterior(self, Xs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        Ks = _rbf(Xs, self.X, self.ls)
        mu = Ks @ self.alpha
        w = np.linalg.solve(self.L, Ks.T)
        var = np.clip(1.0 - (w * w).sum(axis=0), 1e-12, None)
        return (
            mu * self.y_sd + self.y_mean,
            np.sqrt(var) * self.y_sd,
        )


def _fit_gp(X: np.ndarray, y: np.ndarray) -> _GP:
    """Fixed-grid lengthscale/noise selection by log marginal likelihood —
    no iterative optimizer, so the fit is exactly reproducible."""
    y_mean, y_sd = float(y.mean()), float(y.std() or 1.0)
    ys = (y - y_mean) / y_sd
    n = len(X)
    best = None
    for ls in (0.1, 0.25, 0.5, 1.0):
        K = _rbf(X, X, ls)
        for noise in (1e-6, 1e-4, 1e-2):
            Kn = K + np.eye(n) * noise
            try:
                L = np.linalg.cholesky(Kn)
            except np.linalg.LinAlgError:
                continue
            alpha = np.linalg.solve(L.T, np.linalg.solve(L, ys))
            lml = (
                -0.5 * float(ys @ alpha)
                - float(np.log(np.diag(L)).sum())
                - 0.5 * n * math.log(2 * math.pi)
            )
            if best is None or lml > best[0]:
                best = (lml, _GP(X, alpha, L, ls, y_mean, y_sd))
    assert best is not None
    return best[1]


def _norm_cdf(z: np.ndarray) -> np.ndarray:
    return 0.5 * (1.0 + np.vectorize(math.erf)(z / math.sqrt(2.0)))


def _expected_improvement(
    mu: np.ndarray, sigma: np.ndarray, best: float
) -> np.ndarray:
    """EI for MAXIMIZATION (callers negate y for minimized metrics)."""
    z = (mu - best) / sigma
    return (mu - best) * _norm_cdf(z) + sigma * (
        np.exp(-0.5 * z * z) / math.sqrt(2 * math.pi)
    )


# -- the search loop ----------------------------------------------------------


def bayes_search(
    model: str,
    evaluate: Callable[[dict], float],
    *,
    maximize: bool,
    seed: int,
    iterations: int,
    no_improve: int,
    uncertain: int = 5,  # control_bayes(uncertain = 5), lib/diet_ml_funcs.R:799
    n_initial: int | None = None,
    time_limit_s: float | None = None,
    pool_size: int = 512,
    clock: Callable[[], float] | None = None,
) -> list[dict]:
    """Run the tune_bayes analog; returns tidy rows
    ``[{"params": dict, "mean_metric": float}, ...]`` (the same shape the
    grid/halving strategies feed ``select_by_pct_loss``).

    ``evaluate`` is the CV scorer (params -> mean metric over resamples) —
    fold/repeat handling, engines, and seeds stay the caller's business.
    """
    space = space_for(model)
    d = len(space)
    n_init = n_initial if n_initial is not None else _N_INITIAL.get(model, 5)
    rng = np.random.default_rng(seed)
    t0 = clock() if clock else None

    U = list(rng.random((n_init, d)))  # initial design
    rows: list[dict] = []
    ys: list[float] = []
    for u in U:
        params = decode(u, model)
        y = evaluate(params)
        rows.append({"params": params, "mean_metric": y})
        ys.append(y if maximize else -y)

    since_best = 0
    best_y = max(ys)
    for it in range(iterations):
        if since_best >= no_improve:
            break
        if time_limit_s is not None and clock and clock() - t0 > time_limit_s:
            break
        X = np.asarray(U)
        y_arr = np.asarray(ys)
        finite = np.isfinite(y_arr)
        if finite.sum() < 2:
            cand_u = rng.random(d)
        else:
            gp = _fit_gp(X[finite], y_arr[finite])
            pool = rng.random((pool_size, d))
            mu, sigma = gp.posterior(pool)
            # tidymodels: after `uncertain` consecutive non-improving
            # iterations, spend one pick on the most uncertain region
            # instead of max-EI
            if uncertain > 0 and since_best > 0 and since_best % uncertain == 0:
                pick = int(np.argmax(sigma))
            else:
                pick = int(np.argmax(_expected_improvement(mu, sigma, best_y)))
            cand_u = pool[pick]
        params = decode(cand_u, model)
        y = evaluate(params)
        U.append(cand_u)
        rows.append({"params": params, "mean_metric": y})
        s = y if maximize else -y
        ys.append(s)
        if np.isfinite(s) and s > best_y:
            best_y, since_best = s, 0
        else:
            since_best += 1
    return rows
