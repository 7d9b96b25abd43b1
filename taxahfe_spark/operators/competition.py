"""Tree competition: correlation pruning + RF importance winnowing.

Reproduces the reference's post-order node competition (reference:
lib/tree.R:457-590 compete_node, 595-657 compete_all_winners, 673-720
compete_tree, 724-732 calculate_correlation, 738-850 rf_competition) in
Spark's execution model:

- post-order traversal -> driver loop over levels, deepest first; within a
  level every competition (one per competing parent node) touches a disjoint
  subtree, so a whole level fans out in parallel.
- each level runs TWO grouped-map stages: (1) a correlation stage, one Arrow
  group per competition, and (2) an RF-importance stage, one group per
  (competition x permutation-chunk). Chunking the nperm averaged fits across
  groups is what keeps the engine scalable: the reference runs nperm (and
  nperm*10 for the super filter) ranger fits SERIALLY per node; here every
  fit is an independent executor task, so wall time is bounded by one fit,
  not nperm fits - and the lone super-filter competition no longer
  serializes the whole job (Amdahl).
- ALL decision semantics live driver-side on taxonomy-sized data: the UDFs
  return plain numbers (correlations, importances), never decisions. The
  per-entity abundance VECTORS are the big data and stay distributed; each
  group ships only its own competitors' vectors through Arrow.
- all randomness derives from ``hash(seed, parent_path) + chunk``, so
  results are partition-layout-invariant and reproducible (reference roots
  everything in one set.seed, lib/options.R:225).

Decision semantics preserved exactly (each is a unit-tested one-character
trap): strict-> filters gate competition; no-children / max_level /
no-descendant-winners auto-wins; corr >= threshold prunes (signed, default
Pearson; NaN corr does NOT prune); all-pruned -> parent wins; RF tie on
top-2 nudges parent +1e-6; top-1 == parent -> parent sole winner; else
descendants with importance >= parent win and the parent loses; final
(super-filter) mode keeps importance > mean(importance) and > 0.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from taxahfe_spark.functions.rf import forest_importance
from taxahfe_spark.taxonomy import sparse_to_dense

import os
import sys
import time

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
    nperm: int = 4  # averaged fits per competition == parallel chunks
    num_trees: int = 100  # trees per fit (reference ranger default 500)
    seed: int = 42
    disable_super_filter: bool = False
    super_filter_nperm_factor: int = 10  # reference: nperm*10 for the final RF


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


_CORR_SCHEMA = T.StructType(
    [
        T.StructField("competition_id", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("corr", T.DoubleType()),
    ]
)

_IMP_SCHEMA = T.StructType(
    [
        T.StructField("competition_id", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("importance", T.DoubleType()),
    ]
)


def group_seed(seed: int, key: str) -> int:
    """Partition-layout-invariant per-group seed."""
    return (seed * 1_000_003 + zlib.crc32(key.encode())) % (2**31)


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
    return r[1:]


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


def make_corr_udf(bc_vectors, corr_method: str, n_entities: int):
    """Batch correlation runner: one INPUT ROW per competition
    (competition_id, parent_path, paths). The competitor vectors come from
    the broadcast dict — only assignment rows move through the shuffle (the
    alternative, replicating vectors into every group, ships the whole
    vector payload once per chunk)."""

    def corr_fn(batches):
        vecs_sparse = bc_vectors.value
        for pdf in batches:
            cids, paths, corrs = [], [], []
            for row in pdf.itertuples():
                dense = {
                    p: sparse_to_dense(*vecs_sparse[p], n_entities)
                    for p in [row.parent_path, *row.paths]
                }
                desc = sorted(p for p in row.paths if p != row.parent_path)
                if not desc:
                    continue
                mat = np.column_stack(
                    [dense[row.parent_path]] + [dense[p] for p in desc]
                )
                r = _corr_with_parent(mat, corr_method)
                cids.extend([row.competition_id] * len(desc))
                paths.extend(desc)
                corrs.extend(r.astype(np.float64))
            yield pd.DataFrame(
                {"competition_id": cids, "path": paths, "corr": corrs}
            )

    return corr_fn


def make_importance_udf(
    bc_vectors,
    label: np.ndarray,
    covariates: np.ndarray | None,
    params: CompetitionParams,
):
    """Batch forest runner: one INPUT ROW per (competition x chunk)
    (competition_id = "<parent>#<chunk>", parent_path nullable, paths).
    Competitor order is deterministic (parent first, then sorted
    descendants) so the importance-to-path mapping is layout-stable.

    bc_vectors is an explicit SparkContext broadcast of the (taxonomy-sized)
    sparse vector dict — shipped once per executor, NOT once per task/chunk.
    label/covariates are closure-captured (tiny).
    """
    classification = params.feature_type == "factor"
    n_entities = len(label)

    def imp_fn(batches):
        import os as _os, time as _time, sys as _sys
        _t_start = _time.time()
        vecs_sparse = bc_vectors.value
        _dbg = _os.environ.get("TAXAHFE_DEBUG_TIMING") == "1"
        if _dbg:
            print(f"[udfT] worker pid={_os.getpid()} bc_load={_time.time()-_t_start:.2f}s", file=_sys.stderr, flush=True)
        for pdf in batches:
            cids, out_paths, imps = [], [], []
            for row in pdf.itertuples():
                parent_key, chunk = row.competition_id.rsplit("#", 1)
                names = ([row.parent_path] if row.parent_path else []) + sorted(
                    p for p in row.paths if p != row.parent_path
                )
                X = np.column_stack(
                    [sparse_to_dense(*vecs_sparse[n], n_entities) for n in names]
                )
                n_feat = X.shape[1]
                if covariates is not None and covariates.size:
                    X = np.column_stack([X, covariates])
                seed = group_seed(params.seed, parent_key) + 7919 * int(chunk)
                imp = forest_importance(
                    X,
                    label,
                    classification=classification,
                    num_trees=params.num_trees,
                    seed=seed,
                )[:n_feat]
                cids.extend([row.competition_id] * len(names))
                out_paths.extend(names)
                imps.extend(imp)
                if _dbg:
                    print(f"[udfT] pid={_os.getpid()} fit cid={row.competition_id} p={n_feat} dt={_time.time()-_t_start:.2f}s", file=_sys.stderr, flush=True)
                    _t_start = _time.time()
            yield pd.DataFrame(
                {"competition_id": cids, "path": out_paths, "importance": imps}
            )

    return imp_fn


class TreeCompetition:
    """Level-by-level tree competition over a distributed vector frame.

    vectors: DataFrame (path, level, idxs, vals) - SPARSE, from
    taxonomy.to_feature_vectors; entity index order == order of ``label``.
    flags:   pandas (path -> level, passed_filters) from feature_filter_flags.
    """

    def __init__(
        self,
        vectors: DataFrame,
        flags_pdf: pd.DataFrame,
        label: np.ndarray,
        covariates: np.ndarray | None,
        params: CompetitionParams,
    ):
        # vectors are taxonomy-sized (one row per node); collect ONCE and
        # broadcast explicitly so every stage ships only assignment rows.
        # Store as NUMPY arrays: a dict of Python int lists measured 13s PER
        # UNPICKLE on executors (millions of boxed ints); numpy buffers
        # deserialize at memory speed. (At >1e5 nodes x dense entities this
        # outgrows broadcast — shard the competition by subtree before then.)
        self.spark = vectors.sparkSession
        vec_rows = vectors.collect()
        self.bc_vectors = self.spark.sparkContext.broadcast(
            {
                r["path"]: (
                    np.asarray(r["idxs"], dtype=np.int32),
                    np.asarray(r["vals"], dtype=np.float64),
                )
                for r in vec_rows
            }
        )
        self.params = params
        self.label = label
        self.covariates = covariates
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

    def run(self) -> pd.DataFrame:
        p = self.params
        levels = sorted({n.level for n in self.nodes.values()}, reverse=True)
        for lvl in levels:
            if lvl > p.max_level or lvl < p.lowest_level:
                continue
            self._compete_level(lvl)
        if not p.disable_super_filter:
            self._super_filter()
        return self.state_frame()

    # -- stage runners -------------------------------------------------------

    def _assignment_df(self, rows: list[tuple[str, str | None, list[str]]]):
        adf = self.spark.createDataFrame(
            rows, "competition_id string, parent_path string, paths array<string>"
        )
        # one row per competition(-chunk): spread rows evenly over tasks
        n_part = max(1, min(len(rows), self.spark.sparkContext.defaultParallelism * 2))
        return adf.repartition(n_part)

    def _run_corr(self, comps: dict[str, list[str]]) -> dict[str, dict[str, float]]:
        """comps: parent -> descendant winners. Returns parent -> {desc: r}."""
        rows_in = [(parent, parent, descs) for parent, descs in comps.items()]
        fn = make_corr_udf(self.bc_vectors, self.params.corr_method, len(self.label))
        t0 = time.time()
        rows = self._assignment_df(rows_in).mapInPandas(fn, _CORR_SCHEMA).collect()
        _tlog(f"corr stage: {len(comps)} comps, {time.time()-t0:.2f}s")
        out: dict[str, dict[str, float]] = {p: {} for p in comps}
        for r in rows:
            out[r["competition_id"]][r["path"]] = r["corr"]
        return out

    def _run_importance(
        self, comps: dict[str, tuple[str | None, list[str]]], n_chunks: int
    ) -> dict[str, dict[str, float]]:
        """comps: key -> (parent_path | None, competitor list). Fans out
        n_chunks forest fits per competition; returns key -> {path: avg imp}.
        """
        rows_in = [
            (f"{key}#{k}", parent, competitors)
            for key, (parent, competitors) in comps.items()
            for k in range(n_chunks)
        ]
        fn = make_importance_udf(
            self.bc_vectors, self.label, self.covariates, self.params
        )
        t0 = time.time()
        rows = self._assignment_df(rows_in).mapInPandas(fn, _IMP_SCHEMA).collect()
        _tlog(f"importance stage: {len(comps)} comps x {n_chunks} chunks, {time.time()-t0:.2f}s")
        sums: dict[str, dict[str, float]] = {}
        for r in rows:
            key = r["competition_id"].rsplit("#", 1)[0]
            sums.setdefault(key, {}).setdefault(r["path"], 0.0)
            sums[key][r["path"]] += r["importance"]
        return {
            key: {p: v / n_chunks for p, v in d.items()} for key, d in sums.items()
        }

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

        # stage 1: correlation prune (reference lib/tree.R:505-545)
        corrs = self._run_corr(comps)
        rf_comps: dict[str, tuple[str | None, list[str]]] = {}
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
            rf_comps[parent] = (parent, survivors)
        if not rf_comps:
            return

        # stage 2: RF importance, nperm chunks per competition
        imps = self._run_importance(rf_comps, max(1, p.nperm))
        for parent, (_, survivors) in rf_comps.items():
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
        imps = self._run_importance({"__final__": (None, competitors)}, n_chunks)
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
