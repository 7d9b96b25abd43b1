"""Independent pure-pandas/numpy implementation of the full HFE collapse.

Dual-implementation oracle for the engine's decision chain (reference
lib/tree.R:457-657): rollup -> filters -> correlation prune -> RF importance
average -> winner rules -> super filter. Shares NO code with
taxahfe_spark.operators.competition / taxahfe_spark.functions.rf — only the
documented *seeded RNG contract* is re-derived here so both implementations
draw identical random streams:

- per-competition seed:  (seed * 1_000_003 + crc32(key)) % 2^31,
  chunk fit c uses seed + 7919*c  (key = parent path, "__final__" for the
  super filter);
- per-forest stream (numpy default_rng(seed)): trees grow in blocks of
  ceil(131072/n); per block, draws occur in the fixed order
  (1) bootstrap  integers(0, n, (T, n)),
  (2) one shadow permutation per tree  argsort(random((T, n))),
  (3) one candidate-feature draw per depth  argsort(random((G, P)))[:, :mtry]
  over ALL G active (tree, node) groups at that depth (ascending
  (tree << (depth+1)) | node key order), drawn only when >=1 group is
  splittable.

Everything else — quantile binning, gini split search, stopping rules,
importance accumulation, tie-breaking, the decision rules — is written as
the SIMPLEST possible per-group python loops, deliberately the opposite
code shape from the engine's fused multi-group histogram kernel, so any
indexing/batching/compaction bug in either implementation shows up as a
winner-set mismatch.

All arithmetic on classification designs is exact-integer-in-float64 until
the final divisions, so the two implementations agree bit-for-bit there;
the tests assert winner-set equality (and importance allclose) rather than
float identity to stay robust for regression labels.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

N_BINS = 64
MAX_DEPTH = 16


# -- input normalization (janitor-parity, re-derived) -------------------------


def clean_entity(s: str) -> str:
    return re.sub(r"[^a-z0-9]+", "_", str(s).lower()).strip("_")


def clean_path(s: str) -> str:
    return re.sub(r"[^_|a-z0-9]", "", str(s).lower())


# -- rollup + filters ---------------------------------------------------------


def rollup(long_pdf: pd.DataFrame, entities: list[str]) -> dict[str, np.ndarray]:
    """Observed-wins hierarchical rollup: path -> dense vector over
    ``entities``. Observed rows keep their values verbatim; missing
    ancestors get the elementwise sum of their resolved children,
    deepest-first."""
    eidx = {e: i for i, e in enumerate(entities)}
    n = len(entities)
    df = long_pdf[long_pdf["entity_id"].isin(eidx)]
    assert not df.duplicated(["path", "entity_id"]).any(), (
        "oracle assumes unique (path, entity) pairs after cleaning"
    )
    vec: dict[str, np.ndarray] = {}
    for path, grp in df.groupby("path", sort=True):
        v = np.zeros(n)
        v[[eidx[e] for e in grp["entity_id"]]] = grp["value"].to_numpy(np.float64)
        vec[path] = v
    observed = set(vec)
    max_lvl = max(p.count("|") + 1 for p in observed)
    # resolve missing ancestors level by level, deepest-first
    resolved_by_level: dict[int, set[str]] = {
        lvl: {p for p in observed if p.count("|") + 1 == lvl}
        for lvl in range(1, max_lvl + 1)
    }
    for lvl in range(max_lvl - 1, 0, -1):
        children = resolved_by_level.get(lvl + 1, set())
        for child in sorted(children):
            if "|" not in child:
                continue
            parent = child.rsplit("|", 1)[0]
            if parent in observed:
                continue  # observed wins — never overwritten
            if parent not in vec:
                vec[parent] = np.zeros(n)
                resolved_by_level.setdefault(lvl, set()).add(parent)
            vec[parent] = vec[parent] + vec[child]
    return vec


def filter_flags(
    vec: dict[str, np.ndarray],
    n_entities: int,
    filter_prevalence: float,
    filter_mean_abundance: float,
) -> dict[str, bool]:
    """Strict-> prevalence and mean-abundance filters (lib/tree.R:343-353)."""
    out = {}
    for path, v in vec.items():
        prev = int((v != 0).sum())
        mean = float(v.sum()) / n_entities
        out[path] = (
            prev > n_entities * filter_prevalence
            and mean > filter_mean_abundance
        )
    return out


# -- independent forest (per-group loops, engine RNG contract) ----------------


def _bin_column(col: np.ndarray) -> np.ndarray:
    qs = np.linspace(0, 1, N_BINS + 1)[1:-1]
    edges = np.unique(np.quantile(col, qs))
    return np.searchsorted(edges, col, side="right").astype(np.uint8)


def _split_feature_classification(
    c: np.ndarray, ysub: np.ndarray, size: float, n_classes: int
) -> np.ndarray:
    """Gini decrease at each of the B-1 thresholds for ONE candidate feature
    of one group; invalid thresholds are -inf."""
    if n_classes == 2:
        cnt = np.bincount(c, minlength=N_BINS)
        cnt1 = np.bincount(c, weights=(ysub == 1).astype(np.float64), minlength=N_BINS)
        nl = np.cumsum(cnt)[:-1].astype(np.float64)
        c1 = np.cumsum(cnt1)
        nl1 = c1[:-1]
        tot1 = c1[-1]
        nr = size - nl
        nr1 = tot1 - nl1
        valid = (nl >= 1) & (nr >= 1)
        gl = nl - (nl1**2 + (nl - nl1) ** 2) / np.where(nl > 0, nl, 1)
        gr = nr - (nr1**2 + (nr - nr1) ** 2) / np.where(nr > 0, nr, 1)
        parent = size - (tot1**2 + (size - tot1) ** 2) / size
        dec = parent - (gl + gr)
        dec[~valid] = -np.inf
        return dec
    C = n_classes
    cnt = (
        np.bincount(c.astype(np.int64) * C + ysub, minlength=N_BINS * C)
        .reshape(N_BINS, C)
        .astype(np.float64)
    )
    left = np.cumsum(cnt, axis=0)[:-1]
    nl = left.sum(axis=1)
    nr = size - nl
    total = cnt.sum(axis=0)
    valid = (nl >= 1) & (nr >= 1)
    right = total[None, :] - left
    gl = nl - (left**2).sum(axis=1) / np.where(nl > 0, nl, 1)
    gr = nr - (right**2).sum(axis=1) / np.where(nr > 0, nr, 1)
    parent = size - (total**2).sum() / size
    dec = parent - (gl + gr)
    dec[~valid] = -np.inf
    return dec


def _split_feature_regression(
    c: np.ndarray, ysub: np.ndarray, size: float
) -> np.ndarray:
    """SSE gain at each of the B thresholds for one candidate feature."""
    sums = np.bincount(c, weights=ysub, minlength=N_BINS)
    cnts = np.bincount(c, minlength=N_BINS).astype(np.float64)
    lsum = np.cumsum(sums)
    lcnt = np.cumsum(cnts)
    tot = lsum[-1]
    nl = lcnt
    nr = size - nl
    valid = (nl >= 1) & (nr >= 1)
    gain = lsum**2 / np.where(nl > 0, nl, 1) + (tot - lsum) ** 2 / np.where(
        nr > 0, nr, 1
    )
    gain = gain - tot**2 / size
    gain[~valid] = -np.inf
    return gain


def forest_importance_oracle(
    X: np.ndarray,
    y: np.ndarray,
    classification: bool,
    num_trees: int,
    seed: int,
    max_depth: int = MAX_DEPTH,
) -> np.ndarray:
    """Shadow-corrected impurity importance, shape (p,) — slow loop-based
    twin of the engine's fused level-synchronous kernel, drawing the
    identical RNG stream (see module docstring)."""
    X = np.asarray(X, dtype=np.float64)
    n, p = X.shape
    rng = np.random.default_rng(seed)
    if classification:
        _, yv = np.unique(y, return_inverse=True)
        yv = yv.astype(np.int64)
        n_classes = int(yv.max()) + 1
        min_node = max(1, n // 512)
    else:
        yv = np.asarray(y, dtype=np.float64)
        n_classes = 0
        min_node = max(5, n // 512)
    min_size = max(2, min_node)
    codes = np.column_stack([_bin_column(X[:, j]) for j in range(p)]).astype(
        np.uint8
    )
    P = 2 * p
    m_eff = min(max(1, int(np.floor(np.sqrt(P)))), P)
    block = max(1, -(-(1 << 17) // n))
    imp = np.zeros(P)

    for t_lo in range(0, num_trees, block):
        T = min(block, num_trees - t_lo)
        boot = rng.integers(0, n, (T, n))
        perm = np.argsort(rng.random((T, n)), axis=1)

        sample_idx = boot.ravel().astype(np.int64)
        tree_id = np.repeat(np.arange(T, dtype=np.int64), n)
        node_id = np.zeros(T * n, dtype=np.int64)
        active = np.ones(T * n, dtype=bool)

        for depth in range(max_depth):
            act = np.flatnonzero(active)
            if act.size == 0:
                break
            keys = (tree_id[act] << (depth + 1)) | node_id[act]
            uniq, gidx = np.unique(keys, return_inverse=True)
            G = len(uniq)
            sizes = np.bincount(gidx, minlength=G).astype(np.float64)
            # stopping rules per group
            stopped = np.zeros(G, dtype=bool)
            for g in range(G):
                slots = act[gidx == g]
                ysub = yv[sample_idx[slots]]
                if classification:
                    counts = np.bincount(ysub, minlength=n_classes)
                    stopped[g] = counts.max() == sizes[g]
                else:
                    # sequential accumulation order == engine's bincount
                    s1 = np.bincount(
                        np.zeros(len(ysub), dtype=np.int64), weights=ysub
                    )[0]
                    s2 = np.bincount(
                        np.zeros(len(ysub), dtype=np.int64), weights=ysub**2
                    )[0]
                    var = max(s2 / sizes[g] - (s1 / sizes[g]) ** 2, 0.0)
                    stopped[g] = np.sqrt(var) <= 1e-15
            stopped |= sizes < min_size
            sg = np.flatnonzero(~stopped)
            if sg.size == 0:
                break
            feats = np.argsort(rng.random((G, P)), axis=1)[:, :m_eff]

            for g in sg:
                slots = act[gidx == g]
                rows = sample_idx[slots]
                t = int(tree_id[slots[0]])
                size = sizes[g]
                cand = feats[g]
                best_dec = -np.inf
                best_j = 0
                best_thr = 0
                cand_codes = []
                for j, f in enumerate(cand):
                    if f >= p:  # shadow column: real column via tree's perm
                        cvals = codes[perm[t, rows], f - p]
                    else:
                        cvals = codes[rows, f]
                    cand_codes.append(cvals)
                    if classification:
                        dec = _split_feature_classification(
                            cvals, yv[rows], size, n_classes
                        )
                    else:
                        dec = _split_feature_regression(cvals, yv[rows], size)
                    jb = int(np.argmax(dec))
                    if dec[jb] > best_dec:  # strict: first max wins, matching
                        best_dec = dec[jb]  # row-major (feature, bin) argmax
                        best_j, best_thr = j, jb
                if not np.isfinite(best_dec):
                    best_dec = 0.0
                if not classification and best_dec <= 1e-12:
                    best_dec = 0.0
                if best_dec > 0:
                    imp[cand[best_j]] += best_dec / n
                    go_right = (cand_codes[best_j] > best_thr).astype(np.int64)
                    node_id[slots] = node_id[slots] * 2 + go_right
                else:
                    active[slots] = False
            for g in np.flatnonzero(stopped):
                active[act[gidx == g]] = False

    imp /= num_trees
    return imp[:p] - imp[p:]


# -- correlation + decisions (re-derived from lib/tree.R) ---------------------


def corr_with_parent(mat: np.ndarray, method: str = "pearson") -> np.ndarray:
    x = mat.astype(np.float64)
    if method == "spearman":
        x = np.column_stack(
            [pd.Series(x[:, j]).rank(method="average").to_numpy()
             for j in range(x.shape[1])]
        )
    xc = x - x.mean(axis=0)
    denom = np.sqrt((xc**2).sum(axis=0))
    with np.errstate(divide="ignore", invalid="ignore"):
        r = (xc[:, :1].T @ xc / (denom[0] * denom))[0]
    tiny = denom <= np.abs(x).max(axis=0) * x.shape[0] * 1e-14
    r = r[1:]
    r[tiny[0] | tiny[1:]] = np.nan
    return r


def group_seed(seed: int, key: str) -> int:
    return (seed * 1_000_003 + zlib.crc32(key.encode())) % (2**31)


def decide_parent_descendant(
    names: list[str], imp: dict[str, float], parent: str
) -> set[str]:
    vals = dict(imp)
    ordered = sorted(names, key=lambda nm: -vals[nm])
    if len(ordered) >= 2 and vals[ordered[0]] == vals[ordered[1]]:
        if parent in ordered[:2]:
            vals[parent] += 0.000001
            ordered = sorted(names, key=lambda nm: -vals[nm])
    if ordered[0] == parent:
        return {parent}
    return {nm for nm in names if nm != parent and vals[nm] >= vals[parent]}


def decide_final(names: list[str], imp: dict[str, float]) -> set[str]:
    mean_imp = float(np.mean([imp[nm] for nm in names]))
    return {nm for nm in names if imp[nm] > mean_imp and imp[nm] > 0}


# -- the full chain -----------------------------------------------------------


def oracle_collapse(
    meta_pdf: pd.DataFrame,
    long_pdf: pd.DataFrame,
    *,
    filter_prevalence: float = 0.01,
    filter_mean_abundance: float = 0.0,
    lowest_level: int = 2,
    max_level: int = 14,
    corr_threshold: float = 0.95,
    corr_method: str = "pearson",
    feature_type: str = "factor",
    nperm: int = 4,
    num_trees: int = 100,
    seed: int = 42,
    disable_super_filter: bool = False,
    super_filter_nperm_factor: int = 10,
) -> pd.DataFrame:
    """Full collapse on pandas inputs. meta_pdf: (subject_id,
    feature_of_interest[, covariates...]); long_pdf: (clade_name, entity_id,
    value). Returns a (path, level, passed_filters, winner, sf_winner,
    highly_correlated, lost_rf) frame sorted by (level, path)."""
    meta = meta_pdf.copy()
    meta["subject_id"] = meta["subject_id"].map(clean_entity)
    long = pd.DataFrame(
        {
            "path": long_pdf["clade_name"].map(clean_path),
            "entity_id": long_pdf["entity_id"].map(clean_entity),
            "value": long_pdf["value"].astype(np.float64),
        }
    )
    long = long[long["entity_id"].isin(set(meta["subject_id"]))]
    # entity universe = metadata INTERSECT data subjects, metadata row order
    present = set(long["entity_id"])
    meta = meta[meta["subject_id"].isin(present)].reset_index(drop=True)
    entities = meta["subject_id"].tolist()
    n_entities = len(entities)

    vec = rollup(long, entities)
    passed = filter_flags(vec, n_entities, filter_prevalence, filter_mean_abundance)

    label = meta["feature_of_interest"].to_numpy()
    classification = feature_type == "factor"
    if not classification:
        label = label.astype(np.float64)
    cov_cols = [
        c for c in meta.columns if c not in ("subject_id", "feature_of_interest")
    ]
    cov = (
        pd.get_dummies(meta[cov_cols], dummy_na=False).to_numpy(np.float64)
        if cov_cols
        else None
    )

    levels = {path: path.count("|") + 1 for path in vec}
    children: dict[str, list[str]] = {}
    for path in vec:
        if "|" in path:
            children.setdefault(path.rsplit("|", 1)[0], []).append(path)

    winner = {p: False for p in vec}
    sf_winner = {p: False for p in vec}
    high_corr = {p: False for p in vec}
    lost_rf = {p: False for p in vec}

    def descendant_winners(path: str) -> list[str]:
        if levels[path] >= max_level:
            return []
        found = []
        for ch in sorted(children.get(path, [])):
            if winner[ch]:
                found.append(ch)
            else:
                found.extend(descendant_winners(ch))
        return found

    def averaged_importance(
        competitors: list[str], key: str, n_chunks: int
    ) -> dict[str, float]:
        Xf = np.column_stack([vec[nm] for nm in competitors])
        X = Xf if cov is None else np.column_stack([Xf, cov])
        base = group_seed(seed, key)
        total = np.zeros(len(competitors))
        cnt = np.zeros(len(competitors))
        for chunk in range(n_chunks):
            imp = forest_importance_oracle(
                X, label, classification, num_trees, base + 7919 * chunk
            )[: len(competitors)]
            m = ~np.isnan(imp)
            total[m] += imp[m]
            cnt[m] += 1
        return {
            nm: (total[i] / n_chunks) if cnt[i] else np.nan
            for i, nm in enumerate(competitors)
        }

    for lvl in sorted(set(levels.values()), reverse=True):
        if lvl > max_level or lvl < lowest_level:
            continue
        comps: dict[str, list[str]] = {}
        for path in vec:
            if levels[path] != lvl:
                continue
            if not passed[path]:
                continue
            if not children.get(path):
                winner[path] = True
                continue
            if lvl == max_level:
                winner[path] = True
                continue
            dws = descendant_winners(path)
            if not dws:
                winner[path] = True
                continue
            comps[path] = dws
        for parent, descs in comps.items():
            descs_sorted = sorted(descs)
            mat = np.column_stack([vec[parent]] + [vec[d] for d in descs_sorted])
            r = corr_with_parent(mat, corr_method)
            survivors, pruned = [], []
            for d, rv in zip(descs_sorted, r):
                if not np.isnan(rv) and rv >= corr_threshold:
                    pruned.append(d)
                else:
                    survivors.append(d)
            for d in pruned:
                winner[d] = False
                high_corr[d] = True
            if not survivors:
                winner[parent] = True
                continue
            names = [parent] + survivors
            imp = averaged_importance(names, parent, nperm)
            wins = decide_parent_descendant(names, imp, parent)
            for nm in names:
                if nm in wins:
                    winner[nm] = True
                else:
                    winner[nm] = False
                    lost_rf[nm] = True

    if not disable_super_filter:
        competitors = []
        for rt in sorted(p for p in vec if "|" not in p):
            if winner[rt]:
                competitors.append(rt)
            else:
                competitors.extend(descendant_winners(rt))
        if competitors:
            names = sorted(competitors)
            imp = averaged_importance(
                names, "__final__", nperm * super_filter_nperm_factor
            )
            for nm in decide_final(names, imp):
                sf_winner[nm] = True

    return (
        pd.DataFrame(
            {
                "path": list(vec),
                "level": [levels[p] for p in vec],
                "passed_filters": [passed[p] for p in vec],
                "winner": [winner[p] for p in vec],
                "sf_winner": [sf_winner[p] for p in vec],
                "highly_correlated": [high_corr[p] for p in vec],
                "lost_rf": [lost_rf[p] for p in vec],
            }
        )
        .sort_values(["level", "path"])
        .reset_index(drop=True)
    )
