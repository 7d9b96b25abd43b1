"""Pure-numpy random forest with bias-corrected impurity importance.

The reference scores competition features with ranger's ``impurity_corrected``
importance (reference: lib/tree.R:777-796 — nperm fits, ``sample.fraction=1,
replace=TRUE``, averaged). sklearn is not available in this environment, and
the competition matrices are tiny (n samples x <= dozens of features), so a
vectorized numpy CART/forest is the right tool: it runs *inside* the Arrow
pandas UDF on executors, keeping the engine free of extra dependencies.

Bias correction follows the public Sandri & Zuccolotto (2008) pseudo-variable
approach (the same family ranger's AIR method descends from, Nembrini et al.
2018, Bioinformatics): each tree is grown on [X, X_shadow] where X_shadow is
X with every column independently row-permuted; corrected importance(j) =
impurity_importance(X_j) - impurity_importance(shadow_j). Uninformative
features score ~0 (can be negative), which the competition's "> 0" and
"> mean" thresholds rely on.

Split search is histogram-based (quantile binning to <= 64 bins, one
np.add.at + cumsum per candidate feature per node) — no per-row Python.
Exact importance VALUES are engine-specific; the competition decision rules
(tie nudge, >= parent wins) are what must match the reference.
"""

from __future__ import annotations

import numpy as np

N_BINS = 64


def _bin_features(X: np.ndarray) -> np.ndarray:
    """Quantile-bin each column of X to uint8 codes in [0, N_BINS-1]."""
    n, p = X.shape
    codes = np.empty((n, p), dtype=np.uint8)
    qs = np.linspace(0, 1, N_BINS + 1)[1:-1]
    for j in range(p):
        col = X[:, j]
        edges = np.unique(np.quantile(col, qs))
        codes[:, j] = np.searchsorted(edges, col, side="right").astype(np.uint8)
    return codes


def _best_split_classification(
    codes: np.ndarray, y: np.ndarray, n_classes: int
) -> tuple[float, int]:
    """Best gini decrease (in weighted count units) and threshold bin."""
    n = codes.shape[0]
    cnt = np.zeros((N_BINS, n_classes))
    np.add.at(cnt, (codes, y), 1.0)
    left = np.cumsum(cnt, axis=0)[:-1]  # split after bin b: codes <= b go left
    nl = left.sum(axis=1)
    total = cnt.sum(axis=0)
    nr = n - nl
    valid = (nl > 0) & (nr > 0)
    if not valid.any():
        return 0.0, -1
    right = total[None, :] - left
    with np.errstate(divide="ignore", invalid="ignore"):
        gl = nl - (left**2).sum(axis=1) / np.where(nl > 0, nl, 1)
        gr = nr - (right**2).sum(axis=1) / np.where(nr > 0, nr, 1)
    parent_gini = n - (total**2).sum() / n
    dec = parent_gini - (gl + gr)
    dec[~valid] = -np.inf
    b = int(np.argmax(dec))
    return (float(dec[b]), b) if dec[b] > 0 else (0.0, -1)


def _best_split_regression(codes: np.ndarray, y: np.ndarray) -> tuple[float, int]:
    """Best SSE decrease and threshold bin."""
    n = codes.shape[0]
    sums = np.zeros(N_BINS)
    cnts = np.zeros(N_BINS)
    np.add.at(sums, codes, y)
    np.add.at(cnts, codes, 1.0)
    lsum = np.cumsum(sums)
    lcnt = np.cumsum(cnts)
    tot = lsum[-1]
    nl = lcnt
    nr = n - nl
    valid = (nl > 0) & (nr > 0)
    if not valid.any():
        return 0.0, -1
    with np.errstate(divide="ignore", invalid="ignore"):
        gain = lsum**2 / np.where(nl > 0, nl, 1) + (tot - lsum) ** 2 / np.where(
            nr > 0, nr, 1
        )
    gain = gain - tot**2 / n
    gain[~valid] = -np.inf
    b = int(np.argmax(gain))
    return (float(gain[b]), b) if gain[b] > 1e-12 else (0.0, -1)


def _grow_tree(
    codes: np.ndarray,
    y: np.ndarray,
    rng: np.random.Generator,
    classification: bool,
    n_classes: int,
    mtry: int,
    min_node: int,
    importance: np.ndarray,
    max_depth: int = 16,
) -> None:
    """Grow one CART on a bootstrap sample, accumulating impurity importance."""
    n, p = codes.shape
    boot = rng.integers(0, n, n)
    stack = [(boot, 0)]
    while stack:
        idx, depth = stack.pop()
        if idx.size < max(2, min_node) or depth >= max_depth:
            continue
        ynode = y[idx]
        if classification:
            if (ynode == ynode[0]).all():
                continue
        elif ynode.std() <= 1e-15:
            continue
        feats = rng.choice(p, size=min(mtry, p), replace=False)
        best_dec, best_f, best_b = 0.0, -1, -1
        for f in feats:
            if classification:
                dec, b = _best_split_classification(codes[idx, f], ynode, n_classes)
            else:
                dec, b = _best_split_regression(codes[idx, f], ynode)
            if dec > best_dec:
                best_dec, best_f, best_b = dec, f, b
        if best_f < 0:
            continue
        importance[best_f] += best_dec / n
        mask = codes[idx, best_f] <= best_b
        stack.append((idx[mask], depth + 1))
        stack.append((idx[~mask], depth + 1))


def forest_importance(
    X: np.ndarray,
    y: np.ndarray,
    classification: bool,
    num_trees: int = 100,
    mtry: int | None = None,
    min_node: int | None = None,
    seed: int = 0,
    corrected: bool = True,
    max_depth: int = 16,
) -> np.ndarray:
    """Averaged (optionally shadow-corrected) impurity importance, shape (p,).

    Mirrors ranger's call shape in the reference (bootstrap with
    sample.fraction=1, importance summed over splits, averaged over trees).
    """
    X = np.asarray(X, dtype=np.float64)
    n, p = X.shape
    rng = np.random.default_rng(seed)
    if classification:
        _, y_enc = np.unique(y, return_inverse=True)
        n_classes = int(y_enc.max()) + 1
        yv = y_enc.astype(np.int64)
    else:
        yv = np.asarray(y, dtype=np.float64)
        n_classes = 0
    if min_node is None:
        # ranger-parity (1 / 5) for small n; adaptive floor for big n so the
        # importance competition stays tractable on 10^4+ samples (tree depth
        # and split count dominate; importance RANKING is what's consumed)
        base = 1 if classification else 5
        min_node = max(base, n // 512)
    base_codes = _bin_features(X)
    p_eff = 2 * p if corrected else p
    if mtry is None:
        mtry = max(1, int(np.floor(np.sqrt(p_eff))))
    imp = np.zeros(p_eff)
    codes = np.empty((n, p_eff), dtype=np.uint8)
    codes[:, :p] = base_codes
    for _ in range(num_trees):
        if corrected:
            for j in range(p):
                codes[:, p + j] = base_codes[rng.permutation(n), j]
        _grow_tree(
            codes, yv, rng, classification, n_classes, mtry, min_node, imp, max_depth
        )
    imp /= num_trees
    if corrected:
        return imp[:p] - imp[p:]
    return imp[:p]
