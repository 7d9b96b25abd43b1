"""Independent pure-pandas/numpy re-derivation of run_dietml's grid-rf
tuning trajectory (VERDICT r5 task 4).

Dual-implementation oracle for the dietML fast path's FULL selection chain
on the reference bike-share fixture (reference lib/diet_ml_funcs.R:722-1027):
stratified 0.8 split -> recipe (zv drop) -> stratified k-fold assignment ->
per-(candidate, repeat, fold) RF fit + RMSE -> mean-metric table ->
pct-loss selection -> final last-fit + null-model metrics.

Shares NO code with taxahfe_spark/dietml.py or taxahfe_spark/functions/rf.py.
Only the documented *seeded contracts* are re-derived so both implementations
walk identical random streams and identical orderings:

- Spark's ``xxhash64`` expression (the split/fold ranking key) is the public
  XXH64 algorithm (Collet); Spark chains multi-argument calls by feeding each
  value's hash in as the next seed, starting at 42, and hashes int literals
  through the 4-byte finalizer ("hashInt") and strings through the full
  byte-stream algorithm. Ranking compares the DECIMAL STRING of the signed
  hash (the engine casts to string), ties broken by id ascending.
- The numeric-response strata edges come from ``approxQuantile`` whose
  Greenwald-Khanna sketch is LAYOUT-SENSITIVE (measured: repartitioning the
  same 585 values moves the quartile edges by one rank), i.e. the engine's
  edges are not a pure function of the data and cannot be re-derived — they
  are a MEASUREMENT. The test therefore (a) injects the train/test split via
  run_dietml's ``split_col`` (the reference's create_data_split_obj path,
  cmd/taxa_hfe_ml.R:52-54) using this module's own hash-split rule, and
  (b) reproduces the engine's fold-strata measurement with one public-API
  ``approxQuantile`` call on a single-partition frame holding the train
  labels in the engine's row order (the only quantile surface left once the
  split is injected). Everything downstream of those three floats —
  bucketing, hash ranking, fold dealing, every fit, every metric — is
  re-derived here from scratch.
- The numpy forest engine's rng stream (functions/rf.py docstring contract):
  one default_rng(seed); bootstrap draws integers(0, n, (T, n)) first; then
  per depth ONE argsort(random((G, P)))[:, :mtry] candidate draw over ALL G
  active (tree, node) groups in ascending (tree << (depth+1)) | node key
  order, drawn only when at least one group is splittable.

Everything else — quantile binning, SSE split search, routing, leaf means,
metric formulas — is written as the simplest possible per-group / per-tree
python loops, deliberately the opposite code shape from the engine's fused
multi-group histogram kernel. The bike labels are integer counts, so every
sum both engines take is exact in float64 and the divisions are identical
expressions: CV scores, selection, and final metrics must agree to float
identity, which the pytest asserts (rtol 1e-12).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

# -- Spark xxhash64 (public XXH64), re-derived --------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _xxh64_bytes(data: bytes, seed: int) -> int:
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            for k, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * k : i + 8 * k + 8], "little")
                v = (v + lane * _P2) & _M
                v = (_rotl(v, 31) * _P1) & _M
                if k == 0:
                    v1 = v
                elif k == 1:
                    v2 = v
                elif k == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            k1 = (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (((h ^ k1) * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k1 = int.from_bytes(data[i : i + 8], "little")
        k1 = (_rotl((k1 * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h ^ k1, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        k1 = int.from_bytes(data[i : i + 4], "little")
        h = ((_rotl(h ^ ((k1 * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _xxh64_int(i32: int, seed: int) -> int:
    # Spark XxHash64.hashInt: the 4-byte finalizer applied to one int
    h = (seed + _P5 + 4) & _M
    h = ((_rotl(h ^ (((i32 & 0xFFFFFFFF) * _P1) & _M), 23) * _P2) + _P3) & _M
    return _fmix(h)


def _xxh64_long(i64: int, seed: int) -> int:
    h = (seed + _P5 + 8) & _M
    k1 = (_rotl(((i64 & _M) * _P2) & _M, 31) * _P1) & _M
    h = ((_rotl(h ^ k1, 27) * _P1) + _P4) & _M
    return _fmix(h)


def spark_xxhash64_str_int(s: str, lit: int) -> int:
    """xxhash64(cast(x as string), lit(seed)) as the SIGNED 64-bit value
    Spark produces: string bytes hashed with seed 42, the result seeding the
    int literal's 4-byte finalizer (python ints fit int32 -> IntegerType)."""
    h = _xxh64_bytes(s.encode("utf-8"), 42)
    h = _xxh64_int(lit, h)
    return h - (1 << 64) if h >= (1 << 63) else h


# -- split / folds (rsample contracts, re-derived) -----------------------------


def strata_codes(label: np.ndarray, edges: list[float]) -> np.ndarray:
    """Numeric-response strata: sum of (label > edge) over the distinct
    quantile edges (breaks=4 -> three quartile edges)."""
    lab = np.asarray(label, dtype=np.float64)
    code = np.zeros(len(lab), dtype=np.int64)
    for e in sorted(set(edges)):
        code += (lab > e).astype(np.int64)
    return code


def hash_split_train_ids(ids: np.ndarray, train_frac: float, seed: int) -> set:
    """The split rule this oracle INJECTS via run_dietml's split_col: all ids
    ranked by (str(xxhash64(str(id), seed)), id) ascending, first
    ceil(frac * n) train. (The engine receives the resulting boolean column
    and never recomputes it — split semantics are not under test here, the
    trajectory downstream is.)"""
    ranked = sorted(
        ids, key=lambda i: (str(spark_xxhash64_str_int(str(i), seed)), i)
    )
    return set(ranked[: math.ceil(len(ranked) * train_frac)])


def fold_map(
    ids: np.ndarray,
    label: np.ndarray,
    edges: list[float],
    folds: int,
    repeats: int,
    seed: int,
) -> dict:
    """(repeat, id) -> fold. Strata from the measured TRAIN quartile edges;
    per repeat r the hash seed is seed + 7919*(r+1); within each stratum ids
    rank by (str(xxhash64), id) asc and deal round-robin:
    fold = (rank-1) % folds."""
    strat = strata_codes(label, edges)
    out: dict = {}
    for r in range(repeats):
        hseed = seed + 7919 * (r + 1)
        for s in np.unique(strat):
            members = ids[strat == s]
            ranked = sorted(
                members, key=lambda i: (str(spark_xxhash64_str_int(str(i), hseed)), i)
            )
            for pos, i in enumerate(ranked):
                out[(r, i)] = pos % folds
    return out


# -- the regression forest (rng-contract twin, loop-shaped) --------------------

N_BINS = 64
MAX_DEPTH = 16


def _train_bins(X: np.ndarray):
    qs = np.linspace(0, 1, N_BINS + 1)[1:-1]
    edges = [np.unique(np.quantile(X[:, j], qs)) for j in range(X.shape[1])]
    return edges


def _code(X: np.ndarray, edges) -> np.ndarray:
    return np.column_stack(
        [np.searchsorted(edges[j], X[:, j], side="right") for j in range(X.shape[1])]
    ).astype(np.int64)


class _OracleForest:
    def __init__(self, edges, trees):
        self.edges = edges
        self.trees = trees  # per tree: dict (depth, node) -> ("leaf", mean) | ("split", j, thr)


def rf_fit_oracle(
    X: np.ndarray,
    y: np.ndarray,
    num_trees: int,
    mtry: int,
    min_node: int,
    seed: int,
) -> _OracleForest:
    """Regression forest under the engine's documented rng contract, split
    search as plain per-group loops. Trees are stored as per-tree node maps
    (the engine stores per-depth sorted key tables)."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, p = X.shape
    rng = np.random.default_rng(seed)
    edges = _train_bins(X)
    codes = _code(X, edges)
    m_eff = min(mtry, p)
    min_child = max(1, min_node)
    min_size = max(2, 2 * min_node)

    boot = rng.integers(0, n, (num_trees, n))
    trees = [dict() for _ in range(num_trees)]
    # groups keyed by the engine's (tree << (depth+1)) | node encoding so the
    # per-depth candidate draw walks the identical ascending order
    groups = {(t << 1): boot[t].astype(np.int64) for t in range(num_trees)}
    for depth in range(MAX_DEPTH):
        if not groups:
            break
        keys = sorted(groups)
        stopped = {}
        means = {}
        any_split = False
        for k in keys:
            rows = groups[k]
            size = len(rows)
            s1 = float(y[rows].sum())
            s2 = float((y[rows] ** 2).sum())
            var = max(s2 / size - (s1 / size) ** 2, 0.0)
            stop = (size < min_size) or (math.sqrt(var) <= 1e-15)
            stopped[k] = stop
            means[k] = s1 / size
            any_split = any_split or not stop
        if not any_split:
            for k in keys:
                t = k >> (depth + 1)
                node = k & ((1 << (depth + 1)) - 1)
                trees[t][(depth, node)] = ("leaf", means[k])
            groups = {}
            break
        feats = np.argsort(rng.random((len(keys), p)), axis=1)[:, :m_eff]
        nxt: dict = {}
        for ki, k in enumerate(keys):
            t = k >> (depth + 1)
            node = k & ((1 << (depth + 1)) - 1)
            rows = groups[k]
            size = len(rows)
            if stopped[k]:
                trees[t][(depth, node)] = ("leaf", means[k])
                continue
            yv = y[rows]
            fsize = float(size)
            gains = []
            for j in feats[ki]:
                # one candidate feature of one group: SSE gain per threshold
                # (exact-integer sums -> identical floats to the engine's
                # fused multi-group cumsum kernel)
                c = codes[rows, j]
                lsum = np.cumsum(np.bincount(c, weights=yv, minlength=N_BINS))
                nl = np.cumsum(np.bincount(c, minlength=N_BINS)).astype(np.float64)
                tot = lsum[-1]
                nr = fsize - nl
                g = lsum**2 / np.where(nl > 0, nl, 1) + (tot - lsum) ** 2 / np.where(
                    nr > 0, nr, 1
                )
                g = g - tot**2 / fsize
                g[~((nl >= min_child) & (nr >= min_child))] = -np.inf
                gains.append(g)
            allg = np.concatenate(gains)
            flat = int(np.argmax(allg))
            best = allg[flat]
            mi, bt = divmod(flat, N_BINS)
            bj = int(feats[ki][mi])
            if not np.isfinite(best) or best <= 1e-12:
                trees[t][(depth, node)] = ("leaf", means[k])
                continue
            trees[t][(depth, node)] = ("split", bj, bt)
            go_right = codes[rows, bj] > bt
            nk = k >> (depth + 1) << (depth + 2)
            nxt[nk | (node * 2)] = rows[~go_right]
            nxt[nk | (node * 2 + 1)] = rows[go_right]
        groups = nxt
    # depth-cap leaves
    for k, rows in groups.items():
        t = k >> (MAX_DEPTH + 1)
        node = k & ((1 << (MAX_DEPTH + 1)) - 1)
        trees[t][(MAX_DEPTH, node)] = ("leaf", float(y[rows].sum()) / len(rows))
    return _OracleForest(edges, trees)


def rf_predict_oracle(model: _OracleForest, X: np.ndarray) -> np.ndarray:
    X = np.asarray(X, dtype=np.float64)
    codes = _code(X, model.edges)
    per_tree = np.zeros((len(model.trees), len(X)))
    for t, tree in enumerate(model.trees):
        for i in range(len(X)):
            depth, node = 0, 0
            while True:
                kind = tree.get((depth, node))
                if kind is None:  # walked past a recorded level: depth-cap key
                    kind = tree[(MAX_DEPTH, node)]
                if kind[0] == "leaf":
                    per_tree[t, i] = kind[1]
                    break
                _, j, thr = kind
                node = node * 2 + (1 if codes[i, j] > thr else 0)
                depth += 1
    return per_tree.mean(axis=0)


# -- metrics (yardstick formulas, re-derived) ----------------------------------


def reg_metrics(t: np.ndarray, e: np.ndarray) -> dict:
    t = np.asarray(t, dtype=np.float64)
    e = np.asarray(e, dtype=np.float64)
    n = len(t)
    mae = float(np.abs(t - e).mean())
    rmse = float(np.sqrt(((t - e) ** 2).mean()))
    mt, me = float(t.mean()), float(e.mean())
    vt = float(((t - mt) ** 2).sum() / (n - 1)) if n > 1 else 0.0
    ve = float(((e - me) ** 2).sum() / (n - 1)) if n > 1 else 0.0
    cov = float(((t - mt) * (e - me)).sum() / (n - 1)) if n > 1 else 0.0
    rsq = float(cov**2 / (vt * ve)) if vt * ve > 0 else float("nan")
    denom = vt + ve + (mt - me) ** 2
    ccc = float(2 * cov / denom) if denom else float("nan")
    return {"mae": mae, "rmse": rmse, "rsq": rsq, "ccc": ccc}


# -- grid + selection (caret/tidymodels contracts, re-derived) ------------------


def rf_grid(tune_length: int, seed: int) -> list[dict]:
    combos = [
        {"min_n": n, "mtry": m}
        for n in (1, 5, 10, 20)
        for m in ("sqrt", "0.33", "0.5")
    ]
    order = np.random.default_rng(seed).permutation(len(combos))
    return [combos[i] for i in order[: max(1, min(tune_length, len(combos)))]]


def mtry_count(strategy: str, p: int) -> int:
    if strategy == "sqrt":
        return max(1, int(math.ceil(math.sqrt(p))))
    return max(1, int(math.ceil(p * float(strategy))))


def select_pct_loss_zero(rows: list[dict]) -> dict:
    """pct_loss=0, minimize: the FIRST candidate attaining the minimum."""
    best_i = min(range(len(rows)), key=lambda i: (rows[i]["mean_metric"], i))
    return rows[best_i]["params"]


# -- the full trajectory --------------------------------------------------------


def oracle_dietml_rf(
    pdf: pd.DataFrame,
    id_col: str,
    label_col: str,
    feature_cols: list[str],
    folds: int,
    cv_repeats: int,
    tune_length: int,
    seed: int,
    num_trees: int,
    train_ids: set,
    fold_edges: list[float],
) -> dict:
    """Re-derive the whole grid-rf regression run. pdf holds the RAW fixture
    with numeric feature columns already coerced (non-numeric -> NaN);
    ``train_ids`` is the injected split (hash_split_train_ids) and
    ``fold_edges`` the measured train-label quartile edges (module
    docstring). Returns {best_params, cv_results, estimate, null_model_avg,
    train_metrics, keep_cols} keyed exactly like DietMLResult's artifacts."""
    ids = pdf[id_col].to_numpy()
    is_train = np.array([i in train_ids for i in ids])
    tr_pdf = pdf[is_train]
    te_pdf = pdf[~is_train]

    # recipe: step_novel -> step_dummy (one 0/1 column per sorted TRAIN
    # level of each string feature) -> step_zv on TRAIN (no standardize for
    # rf). keep order = dummies in feature order x sorted levels, then
    # numerics in feature order — the engine's names order.
    nominal = [c for c in feature_cols if pdf[c].dtype == object]
    numeric = [c for c in feature_cols if c not in nominal]
    levels = {
        c: sorted(str(v) for v in tr_pdf[c].dropna().unique()) for c in nominal
    }
    names: list[str] = []
    for c in nominal:
        names.extend(f"{c}_{lv}" for lv in levels[c])
    names.extend(numeric)

    def design(frame: pd.DataFrame, use: list[str]) -> np.ndarray:
        use_set = set(use)
        mat = []
        for c in nominal:
            s = frame[c].astype(str)
            for lv in levels[c]:
                if f"{c}_{lv}" in use_set:
                    mat.append((s == lv).to_numpy(np.float64))
        for c in numeric:
            if c in use_set:
                mat.append(frame[c].to_numpy(np.float64))
        return np.column_stack(mat)

    full_tr = design(tr_pdf, names)
    n_tr_rows = len(tr_pdf)
    keep = [
        c
        for i, c in enumerate(names)
        if n_tr_rows > 1
        and float(((full_tr[:, i] - full_tr[:, i].mean()) ** 2).sum())
        / (n_tr_rows - 1)
        > 0.0
    ]

    fmap = fold_map(
        tr_pdf[id_col].to_numpy(),
        tr_pdf[label_col].to_numpy(np.float64),
        fold_edges,
        folds,
        cv_repeats,
        seed,
    )

    # the engine's local_cv frame: train rows sorted by id (per repeat)
    tr_sorted = tr_pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
    Xtr_all = design(tr_sorted, keep)
    ytr_all = tr_sorted[label_col].to_numpy(np.float64)
    tr_ids_sorted = tr_sorted[id_col].to_numpy()

    candidates = [dict(c, num_trees=num_trees) for c in rf_grid(tune_length, seed)]
    pairs = [(r, f) for r in range(cv_repeats) for f in range(folds)]
    rows = []
    for ci, params in enumerate(candidates):
        scores = []
        for r, f in pairs:
            fold_of = np.array([fmap[(r, i)] for i in tr_ids_sorted])
            tr_m = fold_of != f
            Xf, yf = Xtr_all[tr_m], ytr_all[tr_m]
            Xv, yv = Xtr_all[~tr_m], ytr_all[~tr_m]
            model = rf_fit_oracle(
                Xf,
                yf,
                num_trees=num_trees,
                mtry=mtry_count(str(params["mtry"]), Xf.shape[1]),
                min_node=int(params["min_n"]),
                seed=seed + 31 * ci + r,
            )
            scores.append(reg_metrics(yv, rf_predict_oracle(model, Xv))["rmse"])
        rows.append({"params": params, "mean_metric": float(np.nanmean(scores))})
    best_params = select_pct_loss_zero(rows)

    # last fit: best params on the full (repeat-0) train frame, seed = seed
    final = rf_fit_oracle(
        Xtr_all,
        ytr_all,
        num_trees=num_trees,
        mtry=mtry_count(str(best_params["mtry"]), Xtr_all.shape[1]),
        min_node=int(best_params["min_n"]),
        seed=seed,
    )
    te_sorted = te_pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
    Xte = design(te_sorted, keep)
    yte = te_sorted[label_col].to_numpy(np.float64)
    train_m = reg_metrics(ytr_all, rf_predict_oracle(final, Xtr_all))
    final_m = reg_metrics(yte, rf_predict_oracle(final, Xte))
    nm = reg_metrics(yte, np.full(len(yte), float(np.mean(ytr_all))))
    null_m = {k: nm[k] for k in ("mae", "rmse", "ccc")}

    names = sorted(set(final_m) | set(null_m))
    return {
        "best_params": best_params,
        "cv_results": rows,
        "metric_names": names,
        "estimate": [final_m.get(x, float("nan")) for x in names],
        "null_model_avg": [null_m.get(x, float("nan")) for x in names],
        "train_metrics": train_m,
        "keep_cols": keep,
        "n_train": len(tr_sorted),
        "n_test": len(te_sorted),
    }
