"""Tree competition: correlation pruning + RF importance winnowing.

Reproduces the reference's post-order node competition (reference:
lib/tree.R:457-590 compete_node, 595-657 compete_all_winners, 673-720
compete_tree, 724-732 calculate_correlation, 738-850 rf_competition) in
Spark's execution model:

- post-order traversal -> driver loop over levels, deepest first; within a
  level every competition (one per competing parent node) touches a disjoint
  subtree, so a whole level fans out in parallel.
- each level runs ONE grouped Arrow stage: every group is a
  (competition x permutation-chunk) that computes the parent-vs-descendant
  correlations, prunes locally, and fits its forests in the same pass —
  halving the per-level driver barriers vs separate corr + RF jobs. Chunking
  the nperm averaged fits across groups keeps the engine scalable both ways:
  with FEW competitions (reference shape, super filter) the nperm fits fan
  out so wall time is bounded by one fit; with MANY competitions (web-scale
  taxonomies) chunking collapses to one task per competition so the vector
  payload ships through the shuffle once per level.
- vector delivery is strategy-selected (``vector_strategy``):
  * ``broadcast`` — collect the (taxonomy-sized) sparse vectors once and
    broadcast; stages ship only assignment rows. Fastest at reference shape.
  * ``shuffle``  — NEVER collects to the driver: assignment rows join the
    distributed vector frame and ``applyInPandas`` consumes one competition
    group per task. This is the 100 TB path (at >1e5 nodes x dense entities
    the vector dict outgrows any driver/broadcast budget).
  * ``auto``     — broadcast below ``broadcast_max_bytes`` of vector payload,
    shuffle above.
- ALL decision semantics live driver-side on taxonomy-sized data: the UDFs
  return plain numbers (correlations, importances), never decisions.
- all randomness derives from ``hash(seed, parent_path) + chunk``, so
  results are partition-layout-invariant, identical across vector
  strategies, and reproducible (reference roots everything in one set.seed,
  lib/options.R:225).
- repeated measures (``random_effects``, reference lib/tree.R:776-793 +
  1086-1144 prep_re_data): each fit trains TWO forests — per-(individual,
  label) mean-abundance design and per-(individual, label) slope-over-time
  design — ranks each fit's importances (R ``rank``: ascending, average
  ties) and averages the two ranks; covariate one-hot columns join both
  designs and are dropped from the final ranking driver-side.

Decision semantics preserved exactly (each is a unit-tested one-character
trap): strict-> filters gate competition; no-children / max_level /
no-descendant-winners auto-wins; corr >= threshold prunes (signed, default
Pearson; NaN corr does NOT prune); all-pruned -> parent wins; RF tie on
top-2 nudges parent +1e-6; top-1 == parent -> parent sole winner; else
descendants with importance >= parent win and the parent loses; final
(super-filter) mode keeps importance > mean(importance) and > 0.
"""

from __future__ import annotations

import os
import sys
import time
import zlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from taxahfe_spark.functions.rf import forest_importance
from taxahfe_spark.taxonomy import sparse_to_dense

_DEBUG_TIMING = os.environ.get("TAXAHFE_DEBUG_TIMING") == "1"


def _tlog(msg: str) -> None:
    if _DEBUG_TIMING:
        print(f"[timing] {msg}", file=sys.stderr, flush=True)


@dataclass
class CompetitionParams:
    lowest_level: int = 2  # in path-segment units (reference level 3 == 2 segments)
    max_level: int = 14  # reference level 15 == 14 segments
    corr_threshold: float = 0.95
    corr_method: str = "pearson"  # reference default; "spearman" supported
    feature_type: str = "factor"  # "factor" (classification) | "numeric"
    nperm: int = 4  # averaged fits per competition
    num_trees: int = 100  # trees per fit (reference ranger default 500)
    seed: int = 42
    disable_super_filter: bool = False
    super_filter_nperm_factor: int = 10  # reference: nperm*10 for the final RF
    # "full" runs the RF stage; "corr_only" is a deterministic collapse where
    # corr survivors win and the parent loses (SQL-oracle-checkable prefix of
    # the full competition — the RF decisions are the only randomized part)
    competition_mode: str = "full"
    # repeated-measures competition (reference --random_effects)
    random_effects: bool = False
    # "auto" | "broadcast" | "shuffle" (see module docstring)
    vector_strategy: str = "auto"
    broadcast_max_bytes: int = 128 * 1024 * 1024
    # Entity-dimension bound. The competition design matrix is inherently
    # n_entities wide (the reference's RF is fit over all samples), so the
    # label/covariate context broadcast is n_entities x 8B x (1 + n_cov) and
    # each task materializes an (n_entities x competitors) dense block: at
    # ~10^8+ entities that ceiling is real. design_sample_frac < 1 applies a
    # SEEDED, LAYOUT-INVARIANT hash subsample of entity positions to every
    # design (the reference's ranger sample.fraction analog, applied once,
    # consistently, so all competitors see the same rows). 1.0 = exact
    # reference behavior, bit-identical to the pre-option code path.
    design_sample_frac: float = 1.0


@dataclass
class NodeState:
    """Driver-side bookkeeping for one taxonomy node."""

    path: str
    level: int
    passed_filters: bool
    winner: bool = False
    sf_winner: bool = False
    highly_correlated: bool = False
    lost_rf: bool = False
    competed: bool = False
    outcomes: list[str] = field(default_factory=list)


_STAGE_SCHEMA = T.StructType(
    [
        T.StructField("competition_id", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("chunk_lo", T.IntegerType()),
        T.StructField("corr", T.DoubleType()),
        T.StructField("importance", T.DoubleType()),
    ]
)


def group_seed(seed: int, key: str) -> int:
    """Partition-layout-invariant per-group seed."""
    return (seed * 1_000_003 + zlib.crc32(key.encode())) % (2**31)


def _to_dense(idxs, vals, n_entities: int, remap: np.ndarray | None) -> np.ndarray:
    """Sparse (idxs, vals) -> dense design column, optionally through the
    design_sample_frac position remap (original position -> kept position or
    -1)."""
    if remap is None:
        return sparse_to_dense(idxs, vals, n_entities)
    sel = remap[np.asarray(idxs, dtype=np.int64)]
    m = sel >= 0
    out = np.zeros(n_entities)
    out[sel[m]] = np.asarray(vals, dtype=np.float64)[m]
    return out


def _corr_with_parent(mat: np.ndarray, method: str) -> np.ndarray:
    """Correlation of column 0 (parent) with each other column.

    corrr::correlate default is Pearson (reference lib/tree.R:724-732);
    spearman = Pearson on ranks. Constant columns give NaN, which must NOT
    prune (the reference's dplyr::filter drops NA rows).
    """
    x = mat.astype(np.float64)
    if method == "spearman":
        x = np.apply_along_axis(
            lambda c: pd.Series(c).rank(method="average").to_numpy(), 0, x
        )
    xc = x - x.mean(axis=0)
    denom = np.sqrt((xc**2).sum(axis=0))
    num = xc[:, :1].T @ xc  # (1, k)
    with np.errstate(divide="ignore", invalid="ignore"):
        r = (num / (denom[0] * denom))[0]
    # (effectively-)constant columns must yield NaN, never a prune: without
    # the relative floor, catastrophic cancellation in the mean subtraction
    # can turn an exactly-constant column into denom ~ 1e-20 and a spurious
    # r = +/-1 (found by hypothesis)
    tiny = denom <= np.abs(x).max(axis=0) * x.shape[0] * 1e-14
    r = r[1:]
    r[tiny[0] | tiny[1:]] = np.nan
    return r


def _decide_parent_descendant(
    names: list[str], importance: np.ndarray, parent_name: str
) -> list[str]:
    """RF decision, parent-descendant mode (reference lib/tree.R:817-850)."""
    imp = {n: v for n, v in zip(names, importance)}
    ordered = sorted(names, key=lambda n: -imp[n])
    if len(ordered) >= 2 and imp[ordered[0]] == imp[ordered[1]]:
        if parent_name in ordered[:2]:
            imp[parent_name] += 0.000001
            ordered = sorted(names, key=lambda n: -imp[n])
    if ordered[0] == parent_name:
        return [parent_name]
    parent_imp = imp[parent_name]
    return [n for n in names if n != parent_name and imp[n] >= parent_imp]


def _decide_final(names: list[str], importance: np.ndarray) -> list[str]:
    """RF decision, final/super-filter mode (reference lib/tree.R:815-822)."""
    mean_imp = float(np.mean(importance))
    return [n for n, v in zip(names, importance) if v > mean_imp and v > 0]


# -- per-group importance kernels (executor-side numpy) ----------------------


def _group_slopes(
    X: np.ndarray, t: np.ndarray, gidx: np.ndarray, n_groups: int
) -> np.ndarray:
    """Per-group OLS slope of each X column over t; shape (n_groups, p).

    Closed form of the reference's per-feature ``lm(. ~ time)$coef[2]``
    (lib/tree.R:1127-1133); degenerate groups (one obs / constant time)
    yield 0 like the reference's replace_na(0).
    """
    p = X.shape[1]
    cnt = np.zeros(n_groups)
    st = np.zeros(n_groups)
    stt = np.zeros(n_groups)
    np.add.at(cnt, gidx, 1.0)
    np.add.at(st, gidx, t)
    np.add.at(stt, gidx, t * t)
    sv = np.zeros((n_groups, p))
    stv = np.zeros((n_groups, p))
    np.add.at(sv, gidx, X)
    np.add.at(stv, gidx, X * t[:, None])
    with np.errstate(divide="ignore", invalid="ignore"):
        denom = stt - st * st / np.where(cnt > 0, cnt, 1)
        num = stv - (st[:, None] * sv) / np.where(cnt > 0, cnt, 1)[:, None]
        slopes = num / denom[:, None]
    slopes[~np.isfinite(slopes)] = 0.0
    return slopes


def _group_means(
    X: np.ndarray, gidx: np.ndarray, n_groups: int
) -> np.ndarray:
    p = X.shape[1]
    cnt = np.zeros(n_groups)
    np.add.at(cnt, gidx, 1.0)
    s = np.zeros((n_groups, p))
    np.add.at(s, gidx, X)
    return s / np.where(cnt > 0, cnt, 1)[:, None]


def _rank_avg(v: np.ndarray) -> np.ndarray:
    """R rank(): ascending, average ties (reference lib/tree.R:780-790)."""
    return pd.Series(v).rank(method="average").to_numpy()


# executor-process bin-code memo: chunk fan-out runs MANY tasks per
# competition, each rebuilding the identical design and re-binning it (1.8s
# at the sf0.1 super filter's 15k x 1000 shape). Python workers are reused
# across tasks, so a per-process cache amortizes binning across a worker's
# share of the fan-out. Keyed by (competition key + a content crc of the
# design), so a colliding key from a different run can never serve stale
# codes; bounded to the last few competitions.
_BIN_MEMO: dict[str, np.ndarray] = {}


def _cached_bins(X: np.ndarray, cache_key: str | None) -> np.ndarray:
    from taxahfe_spark.functions.rf import _bin_features

    if cache_key is None:
        return _bin_features(X)
    key = (
        f"{cache_key}|{X.shape}|"
        f"{zlib.crc32(np.ascontiguousarray(X[: min(64, X.shape[0])]).tobytes())}"
    )
    codes = _BIN_MEMO.get(key)
    if codes is None:
        codes = _bin_features(X)
        if len(_BIN_MEMO) >= 4:
            _BIN_MEMO.pop(next(iter(_BIN_MEMO)))
        _BIN_MEMO[key] = codes
    return codes


def make_importance_runner(
    Xf: np.ndarray,
    label: np.ndarray,
    cov: np.ndarray | None,
    re_individual: np.ndarray | None,
    re_time: np.ndarray | None,
    params: "CompetitionParams",
    cache_key: str | None = None,
):
    """Per-competition importance closure: design matrices AND quantile bin
    codes are computed ONCE, then each chunk's fit reuses them (binning is a
    large share of a small-forest fit; results are bit-identical).
    ``cache_key`` additionally memoizes the bin codes across TASKS of the
    same competition in one worker process (see _BIN_MEMO).

    Non-RE: one corrected-impurity forest on [features | covariates]
    (reference lib/tree.R:799-803). RE: two forests on the per-(individual,
    label) mean and slope designs, rank-averaged (lib/tree.R:776-793).
    """
    classification = params.feature_type == "factor"
    p = Xf.shape[1]
    if not params.random_effects:
        X = Xf if cov is None or not cov.size else np.column_stack([Xf, cov])
        codes = _cached_bins(X, cache_key)

        def run(seed: int) -> np.ndarray:
            return forest_importance(
                X, label, classification=classification,
                num_trees=params.num_trees, seed=seed, codes=codes,
            )[:p]

        return run

    # repeated measures: pseudo-sample = (individual, label) pair
    _, lab_codes = np.unique(label.astype(str), return_inverse=True)
    pair_keys = re_individual.astype(np.int64) * (lab_codes.max() + 1) + lab_codes
    uniq, gidx = np.unique(pair_keys, return_inverse=True)
    n_groups = len(uniq)
    # group label = the label component of the pair key
    y_group = np.empty(n_groups, dtype=label.dtype)
    y_group[gidx] = label
    Xall = Xf if cov is None or not cov.size else np.column_stack([Xf, cov])
    X_mean = _group_means(Xall, gidx, n_groups)
    slopes = _group_slopes(Xf, re_time.astype(np.float64), gidx, n_groups)
    # slope design keeps the (mean-encoded) covariates (reference merges the
    # one-hot covariate means back onto the slope table, lib/tree.R:1139)
    X_slope = (
        slopes if cov is None or not cov.size
        else np.column_stack([slopes, X_mean[:, p:]])
    )
    codes_mean = _cached_bins(X_mean, cache_key and f"{cache_key}:mean")
    codes_slope = _cached_bins(X_slope, cache_key and f"{cache_key}:slope")

    def run_re(seed: int) -> np.ndarray:
        imp_a = forest_importance(
            X_mean, y_group, classification=classification,
            num_trees=params.num_trees, seed=seed, codes=codes_mean,
        )
        imp_s = forest_importance(
            X_slope, y_group, classification=classification,
            num_trees=params.num_trees, seed=seed + 1, codes=codes_slope,
        )
        # rank within each fit (over features AND covariates), avg the ranks
        return ((_rank_avg(imp_a) + _rank_avg(imp_s)) / 2.0)[:p]

    return run_re


def chunk_importance(
    Xf: np.ndarray,
    label: np.ndarray,
    cov: np.ndarray | None,
    re_individual: np.ndarray | None,
    re_time: np.ndarray | None,
    params: "CompetitionParams",
    seed: int,
) -> np.ndarray:
    """One permutation-fit's importance (single-shot wrapper around
    make_importance_runner)."""
    return make_importance_runner(
        Xf, label, cov, re_individual, re_time, params
    )(seed)


# executor-process design memo: the chunk fan-out runs MANY tasks per
# competition; every one re-densified the competitors' sparse vectors,
# re-ran the correlation prune, and re-stacked the design matrix before its
# chunk fits (at the sf0.1 super filter's 15k x 1000 shape that is ~100 MB
# of pure memory traffic per task — exactly the non-scaling byte-bound work
# the eta audit flagged). Workers are reused across tasks, so the last two
# competitions' (corr, competitors, Xf) live here, keyed by a run-identity
# token + competition key + competitor-set crc (a different run or node set
# can never serve stale state). Size-capped so a beyond-budget design never
# pins worker memory.
_DESIGN_MEMO: dict[str, tuple] = {}
_DESIGN_MEMO_MAX_BYTES = 256 * 1024 * 1024


def _prepare_design(
    parent_path: str | None,
    names: list[str],
    get_dense,
    params: "CompetitionParams",
    memo_key: str | None,
) -> tuple[np.ndarray | None, list[str], np.ndarray | None]:
    """(corr vs parent over sorted descendants | None, competitors, Xf | None)
    — the chunk-invariant prefix of a competition, memoized per process.
    ``competitors`` is empty when the RF stage must not run (all pruned, or
    corr_only mode)."""
    if memo_key is not None:
        hit = _DESIGN_MEMO.get(memo_key)
        if hit is not None:
            return hit
    descs = [n for n in names if n != parent_path]
    competitors = list(descs)
    r = None
    if parent_path is not None:
        # correlation prune (reference lib/tree.R:505-545): signed r >=
        # threshold prunes; NaN keeps
        mat = np.column_stack(
            [get_dense(parent_path)] + [get_dense(d) for d in descs]
        )
        r = _corr_with_parent(mat, params.corr_method)
        keep = [
            d for d, rv in zip(descs, r)
            if np.isnan(rv) or rv < params.corr_threshold
        ]
        if not keep or params.competition_mode == "corr_only":
            competitors = []
        else:
            competitors = [parent_path] + keep
    Xf = (
        np.column_stack([get_dense(n) for n in competitors])
        if competitors
        else None
    )
    entry = (r, competitors, Xf)
    if memo_key is not None and (
        Xf is None or Xf.nbytes <= _DESIGN_MEMO_MAX_BYTES
    ):
        if len(_DESIGN_MEMO) >= 2:
            _DESIGN_MEMO.pop(next(iter(_DESIGN_MEMO)))
        _DESIGN_MEMO[memo_key] = entry
    return entry


def _run_group(
    parent_path: str | None,
    names: list[str],
    get_dense,
    chunk_lo: int,
    chunk_hi: int,
    label: np.ndarray,
    cov: np.ndarray | None,
    re_individual: np.ndarray | None,
    re_time: np.ndarray | None,
    params: "CompetitionParams",
    emit_corr: bool,
    memo_key: str | None = None,
) -> tuple[list[str], list[float | None], list[float | None]]:
    """Fused corr + prune + forest pass for one competition x chunk-range.

    Returns parallel (path, corr, importance) row lists — ONE importance row
    per competitor carrying the sum over this range's chunk fits (summed
    HERE, in ascending chunk order, so the cross-range reduction on the
    driver stays bit-deterministic regardless of task scheduling). ``names``
    is the deterministic competitor order: parent first (when present), then
    sorted descendants — layout-stable in every delivery strategy.
    ``get_dense``: name -> dense design column; densification, the corr
    prune, and the design stack are chunk-invariant and served from
    _DESIGN_MEMO when another range of the same competition already ran in
    this worker process.
    """
    out_paths: list[str] = []
    out_corr: list[float | None] = []
    out_imp: list[float | None] = []
    descs = [n for n in names if n != parent_path]
    r, competitors, Xf = _prepare_design(
        parent_path, names, get_dense, params, memo_key
    )
    if parent_path is not None:
        if emit_corr:
            out_paths.extend(descs)
            out_corr.extend(float(v) for v in r)
            out_imp.extend([None] * len(descs))
        if not competitors:
            return out_paths, out_corr, out_imp
    parent_key = parent_path if parent_path is not None else "__final__"
    cache_key = f"{parent_key}|{len(competitors)}|{zlib.crc32('|'.join(competitors).encode())}"
    run_fit = make_importance_runner(
        Xf, label, cov, re_individual, re_time, params, cache_key=cache_key
    )
    imp_sum = np.zeros(len(competitors))
    imp_cnt = np.zeros(len(competitors), dtype=np.int64)
    for chunk in range(chunk_lo, chunk_hi):
        imp = run_fit(group_seed(params.seed, parent_key) + 7919 * chunk)
        m = ~np.isnan(imp)
        imp_sum[m] += imp[m]
        imp_cnt[m] += 1
    out_paths.extend(competitors)
    out_corr.extend([None] * len(competitors))
    out_imp.extend(
        float(s) if c else None for s, c in zip(imp_sum, imp_cnt)
    )
    return out_paths, out_corr, out_imp


# driver-local fused-stage context: set by _run_stage_local immediately
# before the fork pool spins up, inherited by children via copy-on-write
# (never pickled), cleared in a finally. One slot — stages never overlap.
_LOCAL_STAGE_CTX: list = [None]


def _local_stage_worker(task):
    """One (competition x chunk-range) on the driver pool — the local twin
    of make_broadcast_stage_udf's per-row body (same _run_group call, same
    seeds, bit-identical output)."""
    key, parent, names, lo, hi = task
    vecs, label, cov, re_ind, re_time, remap, params = _LOCAL_STAGE_CTX[0]
    n_entities = len(label)
    paths, corrs, imps = _run_group(
        parent, names,
        lambda n: _to_dense(*vecs[n], n_entities, remap),
        lo, hi, label, cov, re_ind, re_time, params,
        emit_corr=lo == 0, memo_key=None,
    )
    return key, lo, paths, corrs, imps


def _collect_vectors_arrow(vectors: DataFrame) -> dict:
    """(path, idxs, vals) frame -> {path: (int32 idxs, float64 vals)} via one
    Arrow transfer (flat buffer slices, no per-element deserialization)."""
    tbl = vectors.select("path", "idxs", "vals").toArrow()
    paths = tbl.column("path").to_pylist()
    idxs_col = tbl.column("idxs").combine_chunks()
    vals_col = tbl.column("vals").combine_chunks()
    off_i = idxs_col.offsets.to_numpy()
    flat_i = idxs_col.values.to_numpy().astype(np.int32, copy=False)
    off_v = vals_col.offsets.to_numpy()
    flat_v = vals_col.values.to_numpy()
    return {
        p: (flat_i[off_i[i]: off_i[i + 1]], flat_v[off_v[i]: off_v[i + 1]])
        for i, p in enumerate(paths)
    }


# per-run memo-identity tokens (driver-side counter + pid; Broadcast has no
# worker-visible id). A token is unique per TreeCompetition instance, so a
# _DESIGN_MEMO entry can never cross runs.
_RUN_TOKEN_COUNTER = [0]


def _next_run_token() -> str:
    _RUN_TOKEN_COUNTER[0] += 1
    return f"{os.getpid()}:{_RUN_TOKEN_COUNTER[0]}"


def make_broadcast_stage_udf(
    bc_vectors, bc_ctx, params: CompetitionParams, run_token: str = ""
):
    """mapInPandas runner for the broadcast strategy: one INPUT ROW per
    (competition x chunk-range) — (competition_id, parent_path, paths,
    chunk_lo, chunk_hi); vectors come from the explicit broadcast."""

    def fn(batches):
        vecs_sparse = bc_vectors.value
        label, cov, re_ind, re_time, remap = bc_ctx.value
        n_entities = len(label)
        for pdf in batches:
            rows_p, rows_c, rows_i, rows_id, rows_lo = [], [], [], [], []
            for row in pdf.itertuples():
                names = ([row.parent_path] if row.parent_path else []) + sorted(
                    p for p in row.paths if p != row.parent_path
                )
                base_key = str(row.competition_id).split("\x1f", 1)[0]
                memo_key = (
                    f"b{run_token}|{base_key}|"
                    f"{zlib.crc32('|'.join(names).encode())}"
                )
                paths, corrs, imps = _run_group(
                    row.parent_path or None, names,
                    lambda n: _to_dense(*vecs_sparse[n], n_entities, remap),
                    int(row.chunk_lo), int(row.chunk_hi),
                    label, cov, re_ind, re_time, params,
                    emit_corr=int(row.chunk_lo) == 0,
                    memo_key=memo_key,
                )
                rows_p.extend(paths)
                rows_c.extend(corrs)
                rows_i.extend(imps)
                rows_id.extend([row.competition_id] * len(paths))
                rows_lo.extend([int(row.chunk_lo)] * len(paths))
            yield pd.DataFrame(
                {
                    "competition_id": rows_id,
                    "path": rows_p,
                    "chunk_lo": pd.array(rows_lo, dtype="int32"),
                    "corr": pd.array(rows_c, dtype="float64"),
                    "importance": pd.array(rows_i, dtype="float64"),
                }
            )

    return fn


def make_shuffle_stage_udf(
    bc_ctx, params: CompetitionParams, run_token: str = ""
):
    """applyInPandas runner for the shuffle strategy: one GROUP per
    (competition x chunk-range); each group's rows carry its competitors'
    sparse vectors (joined in, never via the driver)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        label, cov, re_ind, re_time, remap = bc_ctx.value
        n_entities = len(label)
        first = pdf.iloc[0]
        parent = first["parent_path"] if pd.notna(first["parent_path"]) else None
        chunk_lo, chunk_hi = int(first["chunk_lo"]), int(first["chunk_hi"])
        sparse = {r.path: (r.idxs, r.vals) for r in pdf.itertuples()}
        names = ([parent] if parent else []) + sorted(
            p for p in sparse if p != parent
        )
        base_key = str(first["competition_id"]).split("\x1f", 1)[0]
        memo_key = (
            f"s{run_token}|{base_key}|{zlib.crc32('|'.join(names).encode())}"
        )
        paths, corrs, imps = _run_group(
            parent, names,
            lambda n: _to_dense(*sparse[n], n_entities, remap),
            chunk_lo, chunk_hi,
            label, cov, re_ind, re_time, params, emit_corr=chunk_lo == 0,
            memo_key=memo_key,
        )
        return pd.DataFrame(
            {
                "competition_id": [first["competition_id"]] * len(paths),
                "path": paths,
                "chunk_lo": pd.array([chunk_lo] * len(paths), dtype="int32"),
                "corr": pd.array(corrs, dtype="float64"),
                "importance": pd.array(imps, dtype="float64"),
            }
        )

    return fn


class TreeCompetition:
    """Level-by-level tree competition over a distributed vector frame.

    vectors: DataFrame (path, level, idxs, vals) - SPARSE, from
    taxonomy.to_feature_vectors; entity index order == order of ``label``.
    flags:   pandas (path -> level, passed_filters) from feature_filter_flags.
    re_individual / re_time: per-entity arrays (aligned to ``label``) for the
    repeated-measures competition; required when params.random_effects.
    """

    def __init__(
        self,
        vectors: DataFrame,
        flags_pdf: pd.DataFrame,
        label: np.ndarray,
        covariates: np.ndarray | None,
        params: CompetitionParams,
        re_individual: np.ndarray | None = None,
        re_time: np.ndarray | None = None,
        vectors_dict: dict | None = None,
    ):
        if params.random_effects and (re_individual is None or re_time is None):
            raise ValueError(
                "random_effects competition requires re_individual and re_time "
                "arrays (metadata columns 'individual' and 'time', reference "
                "lib/tree.R:116-122)"
            )
        self.spark = vectors.sparkSession
        self.params = params
        self._memo_token = _next_run_token()
        self._local_pool = None  # driver-local stage pool (see _run_stage)
        # design_sample_frac < 1: seeded hash subsample of entity POSITIONS,
        # applied to label/cov/RE arrays here and to every sparse vector at
        # densify time via the remap (see CompetitionParams docstring). A
        # pure function of (seed, position) — layout-invariant, identical
        # across vector strategies and reruns.
        remap = None
        if params.design_sample_frac < 1.0:
            n0 = len(label)
            cut = params.design_sample_frac * 2**32
            keep = np.fromiter(
                (
                    zlib.crc32(f"{params.seed}:e{i}".encode()) % 2**32 < cut
                    for i in range(n0)
                ),
                dtype=bool,
                count=n0,
            )
            if keep.sum() < 2:  # degenerate frac on tiny data: keep all
                keep[:] = True
            remap = np.full(n0, -1, dtype=np.int64)
            remap[np.flatnonzero(keep)] = np.arange(int(keep.sum()))
            label = label[keep]
            covariates = covariates[keep] if covariates is not None else None
            re_individual = (
                re_individual[keep] if re_individual is not None else None
            )
            re_time = re_time[keep] if re_time is not None else None
        self.label = label
        self.covariates = covariates
        # label/covariates/RE arrays are one-per-entity (not per-node): ship
        # once per executor via an explicit broadcast, not per-task closures
        self.bc_ctx = self.spark.sparkContext.broadcast(
            (label, covariates, re_individual, re_time, remap)
        )

        strategy = params.vector_strategy
        self.vectors = vectors
        self.bc_vectors = None
        if vectors_dict is not None and strategy != "shuffle":
            # caller already holds the collected sparse vectors (taxa_hfe's
            # driver-prefix fast path): size the auto decision from the dict
            # itself — no persist, no sizing agg, no second collect
            nnz = sum(len(i) for i, _ in vectors_dict.values())
            if strategy == "auto":
                strategy = (
                    "broadcast"
                    if nnz * 12 <= params.broadcast_max_bytes
                    else "shuffle"
                )
                _tlog(f"vector_strategy auto -> {strategy} (nnz={nnz}, dict)")
            if strategy == "broadcast":
                self.strategy = strategy
                self.bc_vectors = self.spark.sparkContext.broadcast(
                    vectors_dict
                )
        if self.bc_vectors is None and strategy == "auto":
            # persist BEFORE the sizing agg so the (collect_list pivot)
            # vector build runs once, whichever strategy wins
            vectors = vectors.persist()
            nnz = vectors.agg(F.sum(F.size("idxs"))).first()[0] or 0
            strategy = (
                "broadcast"
                if nnz * 12 <= params.broadcast_max_bytes
                else "shuffle"
            )
            _tlog(f"vector_strategy auto -> {strategy} (nnz={nnz})")
        self.strategy = strategy
        if self.bc_vectors is not None:
            pass  # pre-collected dict already broadcast above
        elif strategy == "broadcast":
            # vectors are taxonomy-sized here; collect ONCE and broadcast
            # explicitly so every stage ships only assignment rows. Stored as
            # NUMPY arrays: a dict of Python int lists measured 13s PER
            # UNPICKLE on executors; numpy buffers deserialize at memory speed.
            # Collected via toArrow(), not collect(): Row deserialization of
            # ~10^6 array elements is per-object Python work (measured 0.7 s
            # at the sf0.1 flagship's 949k nnz), while the Arrow list columns
            # expose flat values+offsets buffers that slice into numpy with
            # no per-element cost (0.15 s same shape).
            self.bc_vectors = self.spark.sparkContext.broadcast(
                _collect_vectors_arrow(vectors)
            )
            if params.vector_strategy == "auto":
                vectors.unpersist()
        else:
            # the 100 TB path: vectors never touch the driver; persist so the
            # per-level join doesn't recompute the pivot each iteration
            self.vectors = vectors.select("path", "idxs", "vals").persist()
            self.vectors.count()
            if params.vector_strategy == "auto":
                vectors.unpersist()  # superseded by the projected cache

        self.nodes: dict[str, NodeState] = {}
        for r in flags_pdf.itertuples():
            self.nodes[r.path] = NodeState(
                path=r.path, level=int(r.level), passed_filters=bool(r.passed_filters)
            )
        self.children: dict[str, list[str]] = {}
        for path in self.nodes:
            if "|" in path:
                self.children.setdefault(path.rsplit("|", 1)[0], []).append(path)

    # -- reference get_descendant_winners (lib/tree.R:310-330) --------------
    def descendant_winners(self, path: str) -> list[str]:
        node = self.nodes[path]
        if node.level >= self.params.max_level:
            return []
        found: list[str] = []
        for child in sorted(self.children.get(path, [])):
            cn = self.nodes[child]
            if cn.winner:
                found.append(child)
            else:
                found.extend(self.descendant_winners(child))
        return found

    # -- resume (north rule: restart from per-level checkpoints) ------------

    def _run_fingerprint(self) -> str:
        """Identity of this competition run: params + node universe + the
        DESIGN DATA (label / covariates / RE arrays). A resume dir holding a
        different fingerprint is ignored, never mixed — without the data
        hash, re-pointing resume_dir at a run whose metadata changed under
        an unchanged taxonomy would silently mix stale winners (ADVICE r2)."""
        import hashlib

        def arr_bytes(a) -> bytes:
            if a is None:
                return b"none"
            a = np.asarray(a)
            if a.dtype.kind in "OUS":  # strings / objects: join repr
                return "\x1f".join(map(str, a.ravel())).encode()
            return np.ascontiguousarray(a).tobytes()

        p = self.params
        key = "|".join(
            [
                str(p.seed), str(p.nperm), str(p.corr_threshold), p.corr_method,
                p.feature_type, p.competition_mode, str(p.num_trees),
                str(p.lowest_level), str(p.max_level), str(p.random_effects),
                str(p.design_sample_frac),
            ]
        )
        h = hashlib.sha256(key.encode())
        label, cov, re_ind, re_time, _ = self.bc_ctx.value
        for a in (label, cov, re_ind, re_time):
            h.update(arr_bytes(a))
            h.update(b"\x00")
        for path in sorted(self.nodes):
            h.update(path.encode())
            h.update(b"\x00")
        return h.hexdigest()[:16]

    def _save_progress(self, resume_dir: str, completed: list) -> None:
        import json
        import os

        os.makedirs(resume_dir, exist_ok=True)
        state = {
            "fingerprint": self._run_fingerprint(),
            "completed": completed,
            "nodes": [
                {
                    "path": n.path,
                    "winner": n.winner,
                    "sf_winner": n.sf_winner,
                    "highly_correlated": n.highly_correlated,
                    "lost_rf": n.lost_rf,
                    "competed": n.competed,
                    "outcomes": n.outcomes,
                }
                for n in self.nodes.values()
            ],
        }
        tmp = os.path.join(resume_dir, "competition_state.json.tmp")
        dst = os.path.join(resume_dir, "competition_state.json")
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, dst)  # commit-last: a crash mid-write leaves the
        # previous committed level intact

    def _load_progress(self, resume_dir: str) -> list:
        import json
        import os

        path = os.path.join(resume_dir, "competition_state.json")
        if not os.path.exists(path):
            return []
        with open(path) as f:
            state = json.load(f)
        if state.get("fingerprint") != self._run_fingerprint():
            return []
        for rec in state["nodes"]:
            n = self.nodes.get(rec["path"])
            if n is None:
                continue
            n.winner = rec["winner"]
            n.sf_winner = rec["sf_winner"]
            n.highly_correlated = rec["highly_correlated"]
            n.lost_rf = rec["lost_rf"]
            n.competed = rec["competed"]
            n.outcomes = list(rec["outcomes"])
        return state["completed"]

    def run(self, resume_dir: str | None = None) -> pd.DataFrame:
        """Compete the tree. With ``resume_dir``, node state is committed
        after every level (driver-side JSON, taxonomy-sized, commit-last) and
        a restarted run with the same inputs skips completed levels — the
        level-loop analog of StageCheckpointer for the distributed frames."""
        p = self.params
        done = self._load_progress(resume_dir) if resume_dir else []
        levels = sorted({n.level for n in self.nodes.values()}, reverse=True)
        try:
            for lvl in levels:
                if lvl > p.max_level or lvl < p.lowest_level:
                    continue
                if lvl in done:
                    continue
                self._compete_level(lvl)
                if resume_dir:
                    self._save_progress(resume_dir, done := done + [lvl])
            if not p.disable_super_filter and p.competition_mode == "full":
                if "super" not in done:
                    self._super_filter()
                    if resume_dir:
                        self._save_progress(resume_dir, done + ["super"])
        finally:
            self._close_local_pool()
        if self.strategy == "shuffle":
            self.vectors.unpersist()
        return self.state_frame()

    # -- fused stage runner ---------------------------------------------------

    def _chunk_ranges(self, n_comps: int, n_chunks: int) -> list[tuple[int, int]]:
        """Split nperm fits into contiguous chunk ranges, adaptively: few
        competitions -> full fan-out (wall time ~ one fit); many competitions
        -> one range per competition (vectors ship once per level). The
        range count targets ~8x parallelism total tasks so a near-core-count
        competition list doesn't end on a one-task straggler wave (25 tasks
        on 8 cores = waves of 8,8,8,1 — the tail wave is a full per-task
        latency), and so heterogeneous competition costs level out (the
        worker-process design memo makes extra ranges nearly free: the
        densify+corr+stack prefix is computed once per worker, not per
        task). Seeds depend only on the absolute chunk index, so scheduling
        never changes results."""
        par = self.spark.sparkContext.defaultParallelism
        per_comp = max(1, min(n_chunks, -(-8 * par // max(n_comps, 1))))
        step = (n_chunks + per_comp - 1) // per_comp
        return [(lo, min(lo + step, n_chunks)) for lo in range(0, n_chunks, step)]

    def _driver_stage_cells(
        self, comps: dict[str, tuple[str | None, list[str]]], n_chunks: int
    ) -> int:
        """Work proxy for the fused stage: design cells x fits summed over
        competitions (n_entities x competitors x chunk fits)."""
        n_entities = len(self.label)
        return sum(
            n_chunks * n_entities * (len(paths) + 1)
            for (_parent, paths) in comps.values()
        )

    def _run_stage(
        self,
        comps: dict[str, tuple[str | None, list[str]]],
        n_chunks: int,
    ) -> tuple[dict[str, dict[str, float]], dict[str, dict[str, float]]]:
        """comps: key -> (parent_path | None, competitor paths). Runs the
        fused corr+RF stage; returns (corrs, importances) keyed by
        competition key -> {path: value}. Importances are averaged over
        n_chunks fits.

        Small stages run DRIVER-LOCAL (multiprocessing fork pool) when the
        vectors are already on the driver (broadcast strategy) and the total
        design work is below ``TAXAHFE_DRIVER_STAGE_MAX_CELLS`` (env,
        default 64e6 entityxcompetitorxfit cells): a megabyte-scale stage
        pays more in Spark scheduling + exchanges (~1 s/stage measured at
        sf0.1) than in compute, the same size-gated driver fast-path rule as
        dietml's small-n CV. Results are bit-identical: _run_group is a pure
        function of (inputs, seeds) and partial sums reduce in chunk order
        on both paths; cluster-scale inputs always take the Spark path (the
        gate scales with n_entities, so it closes itself at scale)."""
        ranges = self._chunk_ranges(len(comps), n_chunks)
        if (
            self.strategy == "broadcast"
            and self._driver_stage_cells(comps, n_chunks)
            <= int(
                os.environ.get("TAXAHFE_DRIVER_STAGE_MAX_CELLS", "64000000")
            )
        ):
            try:
                return self._run_stage_local(comps, ranges, n_chunks)
            except (ImportError, OSError) as e:  # no fork / pool failure
                _tlog(f"driver-local stage unavailable ({e}); Spark path")
        # "\x1f" separates the competition key from the chunk-range suffix —
        # a control char that cannot appear in taxonomy paths, so the
        # Spark-side substring_index split-back is unambiguous
        rows_in = [
            (f"{key}\x1f{lo}", parent, sorted(set(paths) | ({parent} if parent else set())), lo, hi)
            for key, (parent, paths) in comps.items()
            for (lo, hi) in ranges
        ]
        t0 = time.time()
        if self.strategy == "broadcast":
            adf = self.spark.createDataFrame(
                rows_in,
                "competition_id string, parent_path string, paths array<string>, "
                "chunk_lo int, chunk_hi int",
            )
            # one assignment row per task (capped): competitions differ
            # wildly in cost (competitor count x prune outcome), so packing
            # 3-4 rows per partition made stage wall = the unluckiest
            # packing; single-row tasks let the scheduler level the load and
            # cost only ~50 ms each against multi-second rows
            n_part = max(
                1, min(len(rows_in), self.spark.sparkContext.defaultParallelism * 16)
            )
            fn = make_broadcast_stage_udf(
                self.bc_vectors, self.bc_ctx, self.params, self._memo_token
            )
            stage = adf.repartition(n_part).mapInPandas(fn, _STAGE_SCHEMA)
        else:
            assign = [
                (cid, parent, path, lo, hi)
                for (cid, parent, paths, lo, hi) in rows_in
                for path in paths
            ]
            adf = self.spark.createDataFrame(
                assign,
                "competition_id string, parent_path string, path string, "
                "chunk_lo int, chunk_hi int",
            )
            joined = adf.join(self.vectors, "path")
            fn = make_shuffle_stage_udf(
                self.bc_ctx, self.params, self._memo_token
            )
            stage = joined.groupBy("competition_id").applyInPandas(fn, _STAGE_SCHEMA)
        # Pre-aggregate ON THE CLUSTER before collecting: each task already
        # summed its own chunk range (in ascending chunk order), so the
        # stage output is one row per (competitor x range) and this groupBy
        # collapses it to ONE collected row per (competition, competitor) —
        # a driver-side average over raw per-chunk rows would collect
        # nperm-fold more (x400 at the reference's super filter). The
        # per-range partials come back as a (chunk_lo, partial) list and are
        # reduced IN CHUNK ORDER on the driver, so the final float sum is
        # bit-identical regardless of task scheduling, partitioning, or
        # vector strategy. A TRUE NaN correlation — which must NOT prune —
        # is masked to null so it stays absent from the corr dict.
        agg_rows = (
            stage.groupBy(
                F.substring_index("competition_id", "\x1f", 1).alias("key"), "path"
            )
            .agg(
                F.collect_list(F.struct("chunk_lo", "importance")).alias("parts"),
                F.max(F.when(~F.isnan("corr"), F.col("corr"))).alias("corr"),
            )
            .collect()
        )
        _tlog(
            f"fused stage [{self.strategy}]: {len(comps)} comps x {n_chunks} "
            f"chunks in {len(rows_in)} tasks, {time.time()-t0:.2f}s"
        )
        corrs: dict[str, dict[str, float]] = {}
        imps: dict[str, dict[str, float]] = {}
        for r in agg_rows:
            if r["corr"] is not None:
                corrs.setdefault(r["key"], {})[r["path"]] = r["corr"]
            parts = sorted(
                (
                    (e["chunk_lo"], e["importance"])
                    for e in r["parts"]
                    if e["importance"] is not None
                    and not np.isnan(e["importance"])
                ),
            )
            if parts:
                total = 0.0
                for _, v in parts:
                    total += v
                imps.setdefault(r["key"], {})[r["path"]] = total / n_chunks
        return corrs, imps

    def _ensure_local_ctx(self) -> None:
        label, cov, re_ind, re_time, remap = self.bc_ctx.value
        _LOCAL_STAGE_CTX[0] = (
            self.bc_vectors.value, label, cov, re_ind, re_time, remap,
            self.params,
        )

    def _close_local_pool(self) -> None:
        if self._local_pool is not None:
            self._local_pool.terminate()
            self._local_pool.join()
            self._local_pool = None
        _LOCAL_STAGE_CTX[0] = None

    def _run_stage_local(
        self,
        comps: dict[str, tuple[str | None, list[str]]],
        ranges: list[tuple[int, int]],
        n_chunks: int,
    ) -> tuple[dict[str, dict[str, float]], dict[str, dict[str, float]]]:
        """Driver-local fused stage: same (competition x chunk-range) task
        list as the Spark path, run on a fork pool. The fork children
        inherit the vector dict and design context by COW memory — zero
        serialization, no Spark jobs. Reduction is identical to the Spark
        path: per-range partials sorted by chunk_lo and summed in chunk
        order, NaN corr masked to absent."""
        import multiprocessing as mp

        t0 = time.time()
        tasks = []
        for key, (parent, paths) in comps.items():
            names = ([parent] if parent else []) + sorted(
                p for p in paths if p != parent
            )
            for lo, hi in ranges:
                tasks.append((key, parent, names, lo, hi))
        if len(tasks) == 1:
            self._ensure_local_ctx()
            try:
                results = [_local_stage_worker(tasks[0])]
            finally:
                if self._local_pool is None:
                    _LOCAL_STAGE_CTX[0] = None
        else:
            # ONE fork pool per run, created at the first local stage and
            # closed in run(): 20-30 forks of a driver holding the vector
            # dict measured ~0.5 s — paid once, not per level. The ctx is
            # stage-invariant (vectors + design arrays + params), so a pool
            # forked at stage 1 serves every later stage unchanged.
            if self._local_pool is None:
                self._ensure_local_ctx()
                procs = min(
                    max(len(tasks), 8),
                    self.spark.sparkContext.defaultParallelism,
                )
                self._local_pool = mp.get_context("fork").Pool(procs)
            results = self._local_pool.map(_local_stage_worker, tasks)
        corrs: dict[str, dict[str, float]] = {}
        parts: dict[tuple[str, str], list[tuple[int, float]]] = {}
        for key, lo, r_paths, r_corrs, r_imps in results:
            for pth, c, v in zip(r_paths, r_corrs, r_imps):
                if c is not None and not np.isnan(c):
                    corrs.setdefault(key, {})[pth] = float(c)
                if v is not None and not np.isnan(v):
                    parts.setdefault((key, pth), []).append((lo, float(v)))
        imps: dict[str, dict[str, float]] = {}
        for (key, pth), pl in parts.items():
            total = 0.0
            for _, v in sorted(pl):
                total += v
            imps.setdefault(key, {})[pth] = total / n_chunks
        _tlog(
            f"fused stage [driver-local]: {len(comps)} comps x {n_chunks} "
            f"chunks in {len(tasks)} tasks, {time.time()-t0:.2f}s"
        )
        return corrs, imps

    # -- level competition ---------------------------------------------------

    def _compete_level(self, lvl: int) -> None:
        p = self.params
        comps: dict[str, list[str]] = {}  # parent -> descendant winners
        for path, node in self.nodes.items():
            if node.level != lvl:
                continue
            node.competed = True
            if not node.passed_filters:
                node.outcomes.append("loss: did not pass filters")
                continue
            if not self.children.get(path):
                node.outcomes.append("win: no children")
                node.winner = True
                continue
            if node.level == p.max_level:
                node.outcomes.append("win: max_level reached")
                node.winner = True
                continue
            dws = self.descendant_winners(path)
            if not dws:
                node.outcomes.append("win: no descendant winners")
                node.winner = True
                continue
            comps[path] = dws
        if not comps:
            return

        n_chunks = 1 if p.competition_mode == "corr_only" else max(1, p.nperm)
        corrs, imps = self._run_stage(
            {parent: (parent, descs) for parent, descs in comps.items()}, n_chunks
        )

        for parent, descs in comps.items():
            pname = parent.rsplit("|", 1)[-1]
            pruned, survivors = [], []
            for d in descs:
                r = corrs.get(parent, {}).get(d)
                if r is not None and not np.isnan(r) and r >= p.corr_threshold:
                    pruned.append(d)
                else:
                    survivors.append(d)
            for d in pruned:
                nd = self.nodes[d]
                nd.winner = False
                nd.highly_correlated = True
                nd.outcomes.append(f"loss: highly correlated to ancestor {pname}")
            if not survivors:
                names = ", ".join(d.rsplit("|", 1)[-1] for d in descs)
                node = self.nodes[parent]
                node.winner = True
                node.outcomes.append(
                    f"win: all descendant winners highly correlated, {names}"
                )
                continue
            if p.competition_mode == "corr_only":
                # deterministic collapse: survivors win, parent loses
                self.nodes[parent].winner = False
                self.nodes[parent].outcomes.append(
                    "loss: corr-only mode, descendants survived"
                )
                for d in survivors:
                    self.nodes[d].winner = True
                    self.nodes[d].outcomes.append("win: corr survivor")
                continue
            names = [parent] + sorted(survivors)
            avg = np.array([imps[parent][n] for n in names])
            winners = set(_decide_parent_descendant(names, avg, parent))
            wstr = ",".join(sorted(n.rsplit("|", 1)[-1] for n in winners))
            lstr = ",".join(
                sorted(n.rsplit("|", 1)[-1] for n in set(names) - winners)
            )
            oc = f"winners: {wstr}; losers: {lstr}"
            for n in names:
                node = self.nodes[n]
                if n in winners:
                    node.winner = True
                    node.outcomes.append(f"win: rf winner, {oc}")
                else:
                    node.winner = False
                    node.lost_rf = True
                    node.outcomes.append(f"loss: rf loser, {oc}")

    # -- super filter --------------------------------------------------------

    def _super_filter(self) -> None:
        # nearest winners from the virtual root == the full winner antichain
        roots = sorted(pth for pth in self.nodes if "|" not in pth)
        competitors: list[str] = []
        for rt in roots:
            if self.nodes[rt].winner:
                competitors.append(rt)
            else:
                competitors.extend(self.descendant_winners(rt))
        if not competitors:
            return
        p = self.params
        n_chunks = max(1, p.nperm * p.super_filter_nperm_factor)
        _, imps = self._run_stage({"__final__": (None, competitors)}, n_chunks)
        names = sorted(imps["__final__"])
        avg = np.array([imps["__final__"][n] for n in names])
        winners = set(_decide_final(names, avg))
        wstr = ",".join(sorted(winners))
        lstr = ",".join(sorted(set(names) - winners))
        oc = f"winners: {wstr}; losers: {lstr}"
        for n in names:
            node = self.nodes[n]
            if n in winners:
                node.sf_winner = True
                node.outcomes.append(f"win: final rf winner, {oc}")
            else:
                node.sf_winner = False
                node.outcomes.append(f"loss: final rf loser, {oc}")

    def state_frame(self) -> pd.DataFrame:
        rows = [
            {
                "path": n.path,
                "level": n.level,
                "passed_filters": n.passed_filters,
                "winner": n.winner,
                "sf_winner": n.sf_winner,
                "highly_correlated": n.highly_correlated,
                "lost_rf": n.lost_rf,
                "outcomes": "|\n".join(n.outcomes),
            }
            for n in self.nodes.values()
        ]
        return pd.DataFrame(rows).sort_values(["level", "path"]).reset_index(drop=True)
