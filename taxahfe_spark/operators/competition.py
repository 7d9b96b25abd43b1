"""Tree competition: correlation pruning + RF importance winnowing.

Reproduces the reference's post-order node competition (reference:
lib/tree.R:457-590 compete_node, 595-657 compete_all_winners, 673-720
compete_tree, 724-732 calculate_correlation, 738-850 rf_competition) in
Spark's execution model:

- post-order traversal -> driver loop over levels, deepest first; within a
  level every competition (one per competing parent node) touches a disjoint
  subtree, so the whole level runs as ONE ``applyInPandas`` fan-out.
- node bookkeeping (flags, outcomes, winner sets) is taxonomy-sized (<=1e5
  rows) and lives in driver pandas — the analog of the reference's node
  graph. The per-entity abundance VECTORS are the big data and stay
  distributed; each competition group ships only its own competitors'
  vectors through Arrow.
- all randomness derives from ``hash(seed, parent_path)`` so results are
  partition-layout-invariant and reproducible (reference roots everything in
  one set.seed, lib/options.R:225).

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


@dataclass
class CompetitionParams:
    lowest_level: int = 2  # in path-segment units (reference level 3 == 2 segments)
    max_level: int = 14  # reference level 15 == 14 segments
    corr_threshold: float = 0.95
    corr_method: str = "pearson"  # reference default; "spearman" supported
    feature_type: str = "factor"  # "factor" (classification) | "numeric"
    nperm: int = 4  # reference default 40; engine default lower because
    # num_trees*nperm is what controls variance
    num_trees: int = 100
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


_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("competition_id", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("role", T.StringType()),  # parent | descendant
        T.StructField("result", T.StringType()),  # win | loss | pruned
        T.StructField("outcome", T.StringType()),
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


def make_compete_udf(
    label: np.ndarray,
    covariates: np.ndarray | None,
    params: CompetitionParams,
    final_mode: bool = False,
):
    """Build the per-competition grouped-map function.

    label/covariates are aligned to the canonical entity order of the
    ``values`` vectors and are closure-captured (tiny; Spark pickles them to
    executors once per stage — the broadcast-variable idiom for small state).
    """
    classification = params.feature_type == "factor"
    nperm = params.nperm * (params.super_filter_nperm_factor if final_mode else 1)

    def compete(pdf: pd.DataFrame) -> pd.DataFrame:
        cid = pdf["competition_id"].iloc[0]
        out: list[tuple[str, str, str, str, str]] = []
        vecs = {r.path: np.asarray(r.values, dtype=np.float64) for r in pdf.itertuples()}

        if final_mode:
            comp_names = sorted(vecs)  # deterministic order
            mat = np.column_stack([vecs[n] for n in comp_names])
            imp = _run_forest(mat, comp_names)
            winners = set(_decide_final(comp_names, imp))
            wstr = ",".join(sorted(winners))
            lstr = ",".join(sorted(set(comp_names) - winners))
            oc = f"winners: {wstr}; losers: {lstr}"
            for n in comp_names:
                res = "win" if n in winners else "loss"
                kind = "final rf winner" if n in winners else "final rf loser"
                out.append((cid, n, "descendant", res, f"{res}: {kind}, {oc}"))
            return pd.DataFrame(out, columns=[f.name for f in _RESULT_SCHEMA.fields])

        parent_row = pdf[pdf["is_parent"]]
        parent_path = parent_row["path"].iloc[0]
        desc_paths = sorted(p for p in vecs if p != parent_path)

        # correlation prune (>= threshold, signed; NaN never prunes)
        mat = np.column_stack([vecs[parent_path]] + [vecs[p] for p in desc_paths])
        r = _corr_with_parent(mat, params.corr_method)
        pruned = [p for p, ri in zip(desc_paths, r) if not np.isnan(ri) and ri >= params.corr_threshold]
        survivors = [p for p in desc_paths if p not in pruned]
        for p in pruned:
            out.append(
                (cid, p, "descendant", "pruned",
                 f"loss: highly correlated to ancestor {parent_path.rsplit('|', 1)[-1]}")
            )
        if not survivors:
            names = ", ".join(p.rsplit("|", 1)[-1] for p in desc_paths)
            out.append(
                (cid, parent_path, "parent", "win",
                 f"win: all descendant winners highly correlated, {names}")
            )
            return pd.DataFrame(out, columns=[f.name for f in _RESULT_SCHEMA.fields])

        comp_names = [parent_path] + survivors
        mat = np.column_stack([vecs[n] for n in comp_names])
        imp = _run_forest(mat, comp_names)
        winners = set(_decide_parent_descendant(comp_names, imp, parent_path))
        wstr = ",".join(sorted(n.rsplit("|", 1)[-1] for n in winners))
        lstr = ",".join(sorted(n.rsplit("|", 1)[-1] for n in set(comp_names) - winners))
        oc = f"winners: {wstr}; losers: {lstr}"
        for n in comp_names:
            role = "parent" if n == parent_path else "descendant"
            if n in winners:
                out.append((cid, n, role, "win", f"win: rf winner, {oc}"))
            else:
                out.append((cid, n, role, "loss", f"loss: rf loser, {oc}"))
        return pd.DataFrame(out, columns=[f.name for f in _RESULT_SCHEMA.fields])

    def _run_forest(mat: np.ndarray, comp_names: list[str]) -> np.ndarray:
        """nperm seeded forests, averaged importance; covariates appended to
        the design matrix but excluded from the returned ranking (reference
        lib/tree.R:741-744, 806-809)."""
        X = mat
        n_feat = X.shape[1]
        if covariates is not None and covariates.size:
            X = np.column_stack([X, covariates])
        base = group_seed(params.seed, comp_names[0] if len(comp_names) else "_")
        imps = np.zeros(n_feat)
        for k in range(nperm):
            imps += forest_importance(
                X,
                label,
                classification=classification,
                num_trees=params.num_trees,
                seed=base + 7919 * k,
            )[:n_feat]
        return imps / nperm

    return compete


class TreeCompetition:
    """Level-by-level tree competition over a distributed vector frame.

    vectors: DataFrame (path, level, values array<double>) — from
    taxonomy.to_feature_vectors, entity order == order of ``label``.
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
        self.vectors = vectors.persist()
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

    def _compete_level(self, lvl: int) -> None:
        p = self.params
        assignments: list[tuple[str, str, bool]] = []  # (competition_id, path, is_parent)
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
            assignments.append((path, path, True))
            assignments.extend((path, d, False) for d in dws)
        if not assignments:
            return
        self._run_competitions(assignments, final_mode=False)

    def _run_competitions(
        self, assignments: list[tuple[str, str, bool]], final_mode: bool
    ) -> None:
        spark = self.vectors.sparkSession
        adf = spark.createDataFrame(
            assignments, "competition_id string, path string, is_parent boolean"
        )
        grouped = self.vectors.join(F.broadcast(adf), "path", "inner")
        fn = make_compete_udf(self.label, self.covariates, self.params, final_mode)
        results = (
            grouped.repartition("competition_id")
            .groupBy("competition_id")
            .applyInPandas(fn, _RESULT_SCHEMA)
            .collect()  # one row per competitor — taxonomy-sized, tiny
        )
        for row in results:
            node = self.nodes[row["path"]]
            node.outcomes.append(row["outcome"])
            if final_mode:
                node.sf_winner = row["result"] == "win"
                continue
            if row["result"] == "win":
                node.winner = True
            elif row["result"] == "loss":
                node.winner = False
                node.lost_rf = True
            elif row["result"] == "pruned":
                node.winner = False
                node.highly_correlated = True

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
        assignments = [("__final__", c, False) for c in competitors]
        self._run_competitions(assignments, final_mode=True)

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
