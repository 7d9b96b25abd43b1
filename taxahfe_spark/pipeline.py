"""End-to-end taxaHFE pipeline: scan -> rollup -> filter -> compete -> export.

The Spark analog of the reference entry point cmd/taxa_hfe.R ->
lib/methods.R:11-53 (method_taxa_hfe): read metadata + hierarchical matrix,
build the tree, compete it, and emit the collapsed winner feature matrix.

Levels here are in path-segment units; reference CLI levels count a synthetic
root as 1, so ``reference_level == segments + 1`` (pass CLI-style values
through ``from_reference_levels=True``).
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taxahfe_spark.naming import clean_entity, clean_entity_expr, clean_name, clean_names_df
from taxahfe_spark.operators.competition import (
    CompetitionParams,
    TreeCompetition,
    _tlog,
)
from taxahfe_spark.operators.filters import feature_filter_flags
from taxahfe_spark.taxonomy import hierarchical_rollup, melt_wide_matrix, to_feature_vectors


def read_metadata(
    spark: SparkSession,
    path: str,
    subject_identifier: str,
    label: str,
    sep: str | None = None,
    limit_covariates: bool = True,
    feature_type: str | None = None,
) -> DataFrame:
    """CSV/TSV metadata scan (reference lib/tree.R:49-138): rename the id and
    label columns to canonical names, clean names, drop NA rows.

    ``limit_covariates`` (reference lib/tree.R:100-107, on for taxa_hfe /
    taxa_hfe_ml, off for diet_ml): warn past 8 covariates — taxaHFE merely
    appends covariates to the RF design, so many covariates change the
    competition without being its purpose. ``feature_type`` enables the
    response-shape diagnostics: the reference logs the level count, and a
    numeric-valued label declared ``factor`` silently becomes one class PER
    VALUE, which is almost never intended — warn loudly."""
    import warnings

    if sep is None:
        sep = "\t" if path.endswith((".tsv", ".txt")) else ","
    df = spark.read.option("header", True).option("sep", sep).csv(path)
    df = df.withColumnsRenamed(
        {subject_identifier: "subject_id", label: "feature_of_interest"}
    )
    df = clean_names_df(df, skip=("subject_id", "feature_of_interest"))
    df = df.na.drop()
    if limit_covariates and len(df.columns) > 10:
        warnings.warn(
            "You have selected quite a few covariates (this warning shows at "
            "> 8 covariates). TaxaHFE merely adds the covariates to the RF "
            "models; its primary purpose is hierarchical feature engineering."
        )
    if feature_type == "factor":
        n_levels = df.select("feature_of_interest").distinct().count()
        # try_cast: ANSI mode makes a plain cast THROW on non-numeric strings
        numeric_like = (
            df.filter(
                F.col("feature_of_interest").try_cast("double").isNotNull()
            ).count()
            == df.count()
        )
        if numeric_like and n_levels > 10:
            warnings.warn(
                f"feature_type=factor with a numeric-valued label produces "
                f"one class PER VALUE ({n_levels} levels). If the response "
                "is continuous, use -t numeric, or --random_effects for "
                "kmeans binning (reference lib/tree.R:114-131)."
            )
    return df


def read_hierarchical_data(
    spark: SparkSession, path: str, sep: str | None = None, validate_na: bool = False
) -> DataFrame:
    """Wide hierarchical matrix scan (reference lib/tree.R:143-200): drop
    known-useless taxon-id columns at the scan.

    ``validate_na=True`` enforces the reference's NA-fatal contract
    (lib/tree.R:193-196: any NA in the hierarchical matrix stops the run —
    silent NA ingestion would propagate nulls into every rollup sum). It
    costs one scan-time validation pass; leave off for huge inputs you have
    already validated upstream.
    """
    if sep is None:
        sep = "\t" if path.endswith((".tsv", ".txt")) else ","
    df = spark.read.option("header", True).option("sep", sep).csv(path)
    drop = [c for c in ("NCBI_tax_id", "clade_taxid") if c in df.columns]
    df = df.drop(*drop)
    if validate_na:
        assert_no_na(df)
    return df


def assert_no_na(df: DataFrame) -> None:
    """NA-fatal guard (reference lib/tree.R:193-196, P8): raise if ANY cell
    is null/NaN. One aggregation pass; counts per column for the message."""
    checks = []
    for c, t in df.dtypes:
        cond = F.col(c).isNull()
        if t in ("double", "float"):
            cond = cond | F.isnan(F.col(c))
        checks.append(F.sum(cond.cast("long")).alias(c))
    row = df.agg(*checks).first()
    bad = {c: row[c] for c, _ in df.dtypes if row[c]}
    if bad:
        raise ValueError(
            f"hierarchical data contains NA cells (fatal, reference "
            f"lib/tree.R:193-196): {bad}"
        )


def prepare_label_covariates(
    metadata_pdf: pd.DataFrame, feature_type: str, random_effects: bool = False
) -> tuple[np.ndarray, np.ndarray | None, list[str]]:
    """Label vector + one-hot covariate matrix aligned to metadata row order.
    Under random effects the reserved ``individual``/``time`` columns are
    structural, not covariates (reference lib/tree.R:116-122)."""
    label = metadata_pdf["feature_of_interest"].to_numpy()
    if feature_type == "numeric":
        label = label.astype(np.float64)
    reserved = {"subject_id", "feature_of_interest"}
    if random_effects:
        reserved |= {"individual", "time"}
    cov_cols = [c for c in metadata_pdf.columns if c not in reserved]
    cov = None
    if cov_cols:
        cov = pd.get_dummies(metadata_pdf[cov_cols], dummy_na=False).to_numpy(
            dtype=np.float64
        )
    return label, cov, cov_cols


def discretize_label(
    metadata_pdf: pd.DataFrame, k: int = 3, seed: int = 42, max_iter: int = 50
) -> pd.DataFrame:
    """KMeans label binning (reference lib/tree.R:125-131, G10): a numeric
    response becomes 'feature_of_interest_{i}' factor levels, with cluster
    ids REINDEXED BY SORTED CENTER MEAN so level 1 is always the smallest-
    center cluster (the reference's determinism trick). 1-D k-means on the
    driver — the label vector is metadata-sized.
    """
    y = metadata_pdf["feature_of_interest"].to_numpy(dtype=np.float64)
    rng = np.random.default_rng(seed)
    # k-means++ style deterministic init on quantiles (stable for 1-D data)
    centers = np.quantile(y, np.linspace(0, 1, k + 2)[1:-1])
    centers = centers + rng.normal(0, 1e-9, k)  # break exact ties
    for _ in range(max_iter):
        assign = np.argmin(np.abs(y[:, None] - centers[None, :]), axis=1)
        new = np.array(
            [y[assign == j].mean() if (assign == j).any() else centers[j] for j in range(k)]
        )
        if np.allclose(new, centers):
            break
        centers = new
    order = np.argsort(centers)
    relabel = np.empty(k, dtype=np.int64)
    relabel[order] = np.arange(1, k + 1)
    out = metadata_pdf.copy()
    out["feature_of_interest"] = [
        f"feature_of_interest_{relabel[a]}" for a in assign
    ]
    return out


def _parent_str(p: str) -> str | None:
    """Driver mirror of taxonomy.parent_path (any '|' -> strip last segment)."""
    return p[: p.rfind("|")] if "|" in p else None


class _DeferredLocalFrame:
    """DataFrame stand-in whose local relation is built on first real use.

    The driver-prefix fast path reconstructs ``resolved`` as driver-resident
    pandas, but shipping those rows back to the JVM as a local relation costs
    ~1.5-3 s at the sf0.1 flagship's 949k rows — and the two declared collapse
    queries never consume the frame (winner_feature_matrix reads only the
    ``_taxahfe_*`` handles and the session). This proxy defers the
    ``createDataFrame`` until a consumer actually touches DataFrame API.

    Deferral here is SAFE, unlike the deferred distributed level chain (see
    hierarchical_rollup's defer_levels contract): the backing rows live in
    driver memory, so late construction can never re-execute Spark work —
    it only pays the same one-time serialization later, and exactly once.

    Contract: attributes set on the proxy (the ``_taxahfe_*`` handles) are
    answered from the proxy without building; ``sparkSession`` is answered
    directly; ``unpersist`` on an unbuilt frame is a no-op (nothing was ever
    persisted). Any other attribute or item access builds the real frame and
    delegates to it forever after.
    """

    def __init__(self, spark, build):
        object.__setattr__(self, "_lazy_spark", spark)
        object.__setattr__(self, "_lazy_build", build)
        object.__setattr__(self, "_lazy_df", None)

    @property
    def sparkSession(self) -> SparkSession:
        return self._lazy_spark

    def _materialize(self) -> DataFrame:
        df = object.__getattribute__(self, "_lazy_df")
        if df is None:
            df = object.__getattribute__(self, "_lazy_build")()
            # carry the attached handles over so readers that reached the
            # real frame directly still see them
            for k, v in list(self.__dict__.items()):
                if k.startswith("_taxahfe_"):
                    setattr(df, k, v)
            object.__setattr__(self, "_lazy_df", df)
        return df

    def unpersist(self, *args, **kwargs):
        df = object.__getattribute__(self, "_lazy_df")
        if df is not None:
            df.unpersist(*args, **kwargs)
        return self

    def __getattr__(self, name):
        return getattr(self._materialize(), name)

    def __getitem__(self, item):
        return self._materialize()[item]


def _driver_prefix(
    base: DataFrame,
    path_map: list[tuple[str, str, int]] | None,
    meta_subjects: list[str],
    filter_prevalence: float,
    filter_mean_abundance: float,
) -> tuple[list[str], list[str], dict, pd.DataFrame, pd.DataFrame]:
    """Observed-wins rollup + filter flags + sparse design vectors computed
    DRIVER-SIDE from the cached long frame, in one Arrow collect.

    The broadcast-strategy competition collects every node's sparse vector
    to the driver anyway, so below the driver budget the distributed prefix
    (level-chain materialization, entity distinct, vectors groupBy, flags
    job — 4 Spark jobs over data-sized frames) reduces to one Arrow
    transfer of the base pairs plus taxonomy-sized numpy (guide §8: decide
    with small rows). Semantics mirror hierarchical_rollup +
    feature_filter_flags + to_feature_vectors exactly: observed nodes keep
    their pairs verbatim, missing ancestors sum resolved children
    (deterministically, children in sorted path order), prevalence counts
    nonzero present values, mean divides by the full entity universe,
    vector entries sort by (entity index, value).

    Returns (present_entities_sorted, entity_ids, vectors_dict, flags_pdf,
    resolved_pdf) — resolved_pdf is the full resolved long frame (path,
    level, entity_id, value, observed) reconstructed driver-side so
    taxa_hfe can hand callers a local-relation `resolved` instead of an
    unmaterialized distributed level chain.
    """
    tbl = base.toArrow()
    pdf = tbl.to_pandas()
    raw_col = "__raw" if "__raw" in pdf.columns else "path"
    # raw path -> (clean path, level): factorize once, map the small universe
    rcodes, runiq = pd.factorize(pdf[raw_col])
    if path_map is not None:
        pmap = {r: (p, lvl) for r, p, lvl in path_map}
        u_paths = [pmap[r][0] for r in runiq]
        u_levels = {pmap[r][0]: pmap[r][1] for r in runiq}
    else:
        u_paths = list(runiq)
        u_levels = {p: p.count("|") + 1 for p in u_paths}
    # clean collisions merge distinct raws into one path: re-factorize
    pcodes_u, puniq = pd.factorize(pd.Series(u_paths))
    pcodes = pcodes_u[rcodes]
    obs_paths = list(puniq)

    ecodes, euniq = pd.factorize(pdf["entity_id"])
    present = sorted(euniq)
    present_set = set(present)
    entity_ids = [s for s in meta_subjects if s in present_set]
    n_entities = len(entity_ids)
    # entity universe == meta INTERSECT data by construction upstream;
    # unknown entities (slot -1) are dropped like the inner idx join
    idx_map = {e: i for i, e in enumerate(entity_ids)}
    slot = np.array([idx_map.get(e, -1) for e in euniq], dtype=np.int64)
    eidx = slot[ecodes]
    vals = pdf["value"].to_numpy(dtype=np.float64)
    keep = eidx >= 0
    pcodes, eidx, vals = pcodes[keep], eidx[keep], vals[keep]

    # leaf vectors: rows grouped per path, entries sorted by (idx, value) —
    # the array_sort((eidx, value)) layout of to_feature_vectors
    order = np.lexsort((vals, eidx, pcodes))
    pcodes_o, eidx_o, vals_o = pcodes[order], eidx[order], vals[order]
    bounds = np.searchsorted(pcodes_o, np.arange(len(obs_paths) + 1))
    vecs: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for k, p in enumerate(obs_paths):
        lo, hi = bounds[k], bounds[k + 1]
        vecs[p] = (
            eidx_o[lo:hi].astype(np.int32),
            vals_o[lo:hi],
        )

    # observed-wins rollup of MISSING ancestors (taxonomy-sized numpy):
    # identical traversal to hierarchical_rollup's missing_by_level driver
    # precompute — resolved(lvl) = observed(lvl) + missing parents of
    # resolved(lvl+1); each missing parent is the elementwise sum of its
    # resolved children
    obs_by_level: dict[int, set[str]] = {}
    for p in obs_paths:
        obs_by_level.setdefault(u_levels[p], set()).add(p)
    levels_dict: dict[str, int] = {p: u_levels[p] for p in obs_paths}
    max_level = max(obs_by_level, default=0)
    resolved_at = {max_level: sorted(obs_by_level.get(max_level, set()))}
    for lvl in range(max_level - 1, 0, -1):
        children_of: dict[str, list[str]] = {}
        for q in resolved_at[lvl + 1]:
            par = _parent_str(q)
            if par:
                children_of.setdefault(par, []).append(q)
        obs_lvl = obs_by_level.get(lvl, set())
        missing = sorted(set(children_of) - obs_lvl)
        for p in missing:
            # PRESENCE mask, not nonzero: the distributed groupBy emits a
            # row for every entity present in ANY child even when the sums
            # cancel to exactly 0.0 — mirror that so the reconstructed
            # resolved frame and the design vectors are row-identical
            acc = np.zeros(n_entities)
            mask = np.zeros(n_entities, dtype=bool)
            for q in sorted(children_of[p]):
                i, v = vecs[q]
                i64 = i.astype(np.int64)
                np.add.at(acc, i64, v)
                mask[i64] = True
            pres = np.flatnonzero(mask)
            vecs[p] = (pres.astype(np.int32), acc[pres])
            levels_dict[p] = lvl
        resolved_at[lvl] = sorted(obs_lvl | set(missing))

    flags_rows = []
    for p, (i, v) in vecs.items():
        prev = int(np.count_nonzero(v))
        mean = float(v.sum()) / n_entities if n_entities else 0.0
        flags_rows.append(
            {
                "path": p,
                "level": int(levels_dict[p]),
                "passed_filters": (
                    prev > n_entities * filter_prevalence
                    and mean > filter_mean_abundance
                ),
            }
        )
    flags_pdf = pd.DataFrame(flags_rows)

    # resolved reconstruction: observed rows verbatim from the base pairs
    # (cleaned path + level, duplicates preserved), missing ancestors from
    # the rollup above — the exact content the distributed level chain
    # would materialize, as driver arrays (gated smallness by construction)
    ent_arr = np.asarray(entity_ids, dtype=object)
    obs_paths_arr = np.asarray(obs_paths, dtype=object)
    res_parts = [
        pd.DataFrame(
            {
                "path": obs_paths_arr[pcodes],
                "level": np.asarray(
                    [u_levels[p] for p in obs_paths], dtype=np.int64
                )[pcodes],
                "entity_id": ent_arr[eidx],
                "value": vals,
                "observed": True,
            }
        )
    ]
    for p in sorted(set(vecs) - set(obs_paths)):
        i, v = vecs[p]
        res_parts.append(
            pd.DataFrame(
                {
                    "path": p,
                    "level": int(levels_dict[p]),
                    "entity_id": ent_arr[i.astype(np.int64)],
                    "value": v,
                    "observed": False,
                }
            )
        )
    resolved_pdf = pd.concat(res_parts, ignore_index=True)
    return present, entity_ids, vecs, flags_pdf, resolved_pdf


def taxa_hfe(
    metadata: DataFrame,
    hierarchical_long: DataFrame,
    params: CompetitionParams | None = None,
    filter_prevalence: float = 0.01,
    filter_mean_abundance: float = 0.0,
    from_reference_levels: bool = False,
    resume_dir: str | None = None,
    k_splits: int = 3,
) -> tuple[DataFrame, pd.DataFrame]:
    """Run the full HFE collapse.

    ``k_splits``: kmeans bin count for discretizing a numeric response under
    random_effects (reference -k/--k_splits, lib/options.R:30 + tree.R:129).

    ``resume_dir``: commit per-level competition state there and skip
    completed levels on restart (see TreeCompetition.run).

    metadata: (subject_id, feature_of_interest, covariates...) — small, used
    both to prune entities (reference lib/tree.R:177-178) and as the RF design.
    hierarchical_long: (clade_name, entity_id, value) long frame
    (use taxonomy.melt_wide_matrix for reference-shaped wide CSVs).

    Entity-dimension bound (documented ceiling): the reference's competition
    semantics make every RF design n_entities wide, so this driver holds the
    metadata frame (n_entities x covariates) in pandas and broadcasts an
    n_entities-long label/covariate context to executors — at 8 B/entity/
    column that is ~1 GB per 10^8 entities, the practical ceiling of the
    exact-reference path. Past it, set
    ``params.design_sample_frac < 1`` (seeded, layout-invariant entity
    subsampling applied consistently to every design — the ranger
    sample.fraction analog); the taxonomy/abundance side stays fully
    distributed either way and has no such bound.

    Returns (resolved long frame with per-node values, node-state pandas frame
    with winner/sf_winner flags and audit outcomes).
    """
    params = params or CompetitionParams()
    if from_reference_levels:
        params = replace(
            params, lowest_level=params.lowest_level - 1, max_level=params.max_level - 1
        )

    import time as _time

    _t0 = _time.time()
    meta_pdf = metadata.toPandas()
    meta_pdf["subject_id"] = meta_pdf["subject_id"].map(clean_entity)
    if meta_pdf["subject_id"].duplicated().any():
        dupes = meta_pdf["subject_id"][meta_pdf["subject_id"].duplicated()].tolist()
        raise ValueError(
            "subject ids collide after clean_names normalization "
            f"(janitor-style cleaning maps distinct raw ids to {dupes[:5]}...); "
            "rename the colliding subjects"
        )

    # entity pruning to metadata subjects (left-semi in long layout)
    spark = metadata.sparkSession
    ids_df = spark.createDataFrame(
        [(e,) for e in meta_pdf["subject_id"]], ["entity_id"]
    )
    long = hierarchical_long.withColumn(
        "entity_id", clean_entity_expr("entity_id")
    ).join(F.broadcast(ids_df), "entity_id", "left_semi")

    # the rollup checkpoints its levels, so after the first action below
    # `resolved` is served from stored blocks for every later consumer.
    # COALESCE the union first: it stacks max_level per-level shuffles
    # (~200 narrow partitions at default config) and five downstream
    # consumers (entity distinct, flags, vectors, winner pivot, final
    # materialize) each paid ~200 near-empty task launches per scan —
    # measured ~10 s/scan of pure scheduling at sf0.1 local[8]. Target is
    # parallelism-sized, never below the source count on a big cluster.
    spark_par = metadata.sparkSession.sparkContext.defaultParallelism
    _tlog(f"taxa_hfe: meta prep {_time.time()-_t0:.2f}s")
    _t0 = _time.time()
    # DEFERRED levels: the rollup's only actions here are the base cache
    # fill + the taxonomy-sized mapping collect. If the driver-prefix fast
    # path wins below, the distributed level chain is never needed (the
    # returned `resolved` is replaced by a driver-reconstructed local
    # relation); if the distributed path runs, the rollup is re-issued with
    # level checkpoints (its base plan matches the already-filled cache, so
    # the re-issue costs the level chain only — exactly the r7 build)
    rolled = hierarchical_rollup(long, defer_levels=True)
    resolved = rolled.coalesce(max(2 * spark_par, 16))
    # coalesce() returns a new frame: re-attach the rollup's scratch-cache
    # handle so the unpersist below still finds it
    resolved._taxahfe_scratch = getattr(rolled, "_taxahfe_scratch", None)

    # the design universe is metadata INTERSECT data subjects (reference
    # lib/tree.R:177-178 prunes data columns to metadata, and every
    # downstream denominator/merge is over the data's sample columns);
    # metadata-only subjects contribute neither filter denominators nor
    # competition rows
    _tlog(f"taxa_hfe: meta+rollup build {_time.time()-_t0:.2f}s")
    _t0 = _time.time()
    # Driver-prefix fast path (guide §8 — decide with small rows): below the
    # driver budget the whole prefix (entity distinct, rollup level chain,
    # flags, vector build + collect) reduces to one Arrow transfer of the
    # cached base pairs plus taxonomy-sized numpy — the competition's
    # broadcast strategy collects exactly these vectors anyway. The gate is
    # row-based and scale-adaptive: past TAXAHFE_DRIVER_PREFIX_MAX_ROWS
    # (env, default 2M — roughly where a single-threaded collect stops
    # beating the 4-job distributed prefix on a 32-core box) the original
    # distributed path runs unchanged, as it always does for the shuffle
    # vector strategy.
    import os as _os

    base_info = getattr(rolled, "_taxahfe_base", None)
    vecs_dict = None
    use_driver_prefix = False
    if base_info is not None and params.vector_strategy != "shuffle":
        base_df, path_map = base_info
        max_rows = int(
            _os.environ.get("TAXAHFE_DRIVER_PREFIX_MAX_ROWS", "2000000")
        )
        # count served from the cache the rollup's distinct collect filled
        use_driver_prefix = base_df.count() <= max_rows
    if use_driver_prefix:
        present_list, entity_ids, vecs_dict, flags_pdf, resolved_pdf = (
            _driver_prefix(
                base_df,
                path_map,
                meta_pdf["subject_id"].tolist(),
                filter_prevalence,
                filter_mean_abundance,
            )
        )
        present = set(present_list)
        scratch = getattr(resolved, "_taxahfe_scratch", None)
        if scratch is not None:
            scratch.unpersist()
        meta_pdf = meta_pdf[meta_pdf["subject_id"].isin(present)].reset_index(
            drop=True
        )
        # the deferred distributed chain is UNSAFE to materialize (see
        # hierarchical_rollup's defer_levels contract) — replace the
        # returned frame with the driver-reconstructed resolved content
        # (identical rows; gated smallness by construction). The local
        # relation itself is built on FIRST USE (_DeferredLocalFrame): the
        # declared collapse queries consume only the _taxahfe_* handles, so
        # they skip the ~1.5-3 s row serialization outright, while flagship
        # consumers (summary/v1/oudah sinks, dietML) build it transparently
        # from the driver-held pandas at the same one-time cost
        _resolved_schema = (
            "path string, level int, entity_id string, "
            "value double, observed boolean"
        )
        resolved = _DeferredLocalFrame(
            spark,
            lambda: spark.createDataFrame(resolved_pdf, schema=_resolved_schema),
        )
        resolved._taxahfe_entities = present_list
        # lazy frame only for TreeCompetition's session handle / shuffle
        # fallback — never materialized when the dict broadcast wins
        vectors = _DeferredLocalFrame(
            spark,
            lambda: to_feature_vectors(resolved._materialize(), entity_ids),
        )
        _tlog(f"taxa_hfe: driver prefix {_time.time()-_t0:.2f}s")
        _t0 = _time.time()
    else:
        # re-issue the rollup WITH level checkpoints (the deferred frame is
        # unsafe to consume); its base subtree matches the already-filled
        # cache, so this pays the level chain once — the r7 build shape.
        # allow_driver=False: this branch exists precisely because the data
        # is past the driver budget or the caller forced the distributed
        # vector strategy — the rollup must stay distributed with it
        rolled = hierarchical_rollup(long, allow_driver=False)
        resolved = rolled.coalesce(max(2 * spark_par, 16))
        resolved._taxahfe_scratch = getattr(rolled, "_taxahfe_scratch", None)
        present = {
            r["entity_id"]
            for r in resolved.select("entity_id").distinct().collect()
        }
        _tlog(
            f"taxa_hfe: rollup materialize + entity distinct "
            f"{_time.time()-_t0:.2f}s"
        )
        _t0 = _time.time()
        # ^ that action materialized every level cache; the rollup's scratch
        # cache can go (ADVICE: repeated invocations must not accumulate)
        scratch = getattr(resolved, "_taxahfe_scratch", None)
        if scratch is not None:
            scratch.unpersist()
        meta_pdf = meta_pdf[meta_pdf["subject_id"].isin(present)].reset_index(
            drop=True
        )
        entity_ids = meta_pdf["subject_id"].tolist()
        # the data's entity universe is already on the driver: hand it to
        # winner_feature_matrix (via the same attribute idiom as the scratch
        # handle) so the export does not pay ANOTHER full distinct scan of
        # resolved for a list this function already computed
        resolved._taxahfe_entities = sorted(present)

        # Vectors FIRST, flags FROM the vectors: both filter statistics are
        # pure functions of a path's (entity, value) pairs, and the vector
        # frame already groups exactly those pairs per path — so the filter
        # pass is a map-only job over the taxonomy-sized vector frame
        # instead of a second full groupBy scan + shuffle of resolved
        # (measured ~0.6 s at sf0.1). Semantics identical to
        # feature_filter_flags (strict > on both, absent pairs are implicit
        # zeros: prevalence counts nonzero PRESENT values and the mean
        # divides by the full entity universe). The persist is released
        # after the competition (TreeCompetition's auto branch also
        # unpersists once it has chosen a delivery strategy).
        vectors = to_feature_vectors(resolved, entity_ids).persist()
        flags_pdf = (
            vectors.select(
                "path",
                "level",
                (
                    (
                        F.size(F.filter("vals", lambda v: v != 0))
                        > F.lit(float(len(entity_ids)) * filter_prevalence)
                    )
                    & (
                        F.aggregate(
                            "vals", F.lit(0.0), lambda acc, v: acc + v
                        ) / F.lit(float(len(entity_ids)))
                        > F.lit(float(filter_mean_abundance))
                    )
                ).alias("passed_filters"),
            )
            .toPandas()
        )
        _tlog(f"taxa_hfe: vectors + flags {_time.time()-_t0:.2f}s")
        _t0 = _time.time()
    re_individual = re_time = None
    if params.random_effects:
        # reference lib/tree.R:116-131: individual/time required; a numeric
        # response is kmeans-discretized into k factor levels first
        missing = {"individual", "time"} - set(meta_pdf.columns)
        if missing:
            raise ValueError(
                f"random_effects requires metadata columns {sorted(missing)} "
                "(reference lib/tree.R:116-119)"
            )
        if params.feature_type == "numeric":
            meta_pdf = discretize_label(meta_pdf, k=int(k_splits), seed=params.seed)
            params = replace(params, feature_type="factor")
        # np.unique codes sort by value -> the RE design-matrix row order is
        # a pure function of the data, not of metadata row order
        re_individual = np.unique(
            meta_pdf["individual"].astype(str).to_numpy(), return_inverse=True
        )[1].astype(np.int64)
        re_time = meta_pdf["time"].to_numpy(dtype=np.float64)

    label, cov, _ = prepare_label_covariates(
        meta_pdf, params.feature_type, params.random_effects
    )

    comp = TreeCompetition(
        vectors, flags_pdf, label, cov, params,
        re_individual=re_individual, re_time=re_time,
        vectors_dict=vecs_dict,
    )
    _tlog(f"taxa_hfe: competition init {_time.time()-_t0:.2f}s")
    _t0 = _time.time()
    try:
        state = comp.run(resume_dir=resume_dir)
    finally:
        vectors.unpersist()  # no-op when TreeCompetition already released it
    _tlog(f"taxa_hfe: competition run {_time.time()-_t0:.2f}s")
    if comp.bc_vectors is not None:
        # the broadcast-strategy vector dict is already driver-resident:
        # hand it to winner_feature_matrix (same attribute idiom as
        # _taxahfe_entities) so the winner pivot can be assembled driver-
        # side instead of re-scanning resolved for a taxonomy-sized slice
        resolved._taxahfe_vecs = (entity_ids, comp.bc_vectors.value)
    return resolved, state


def levels_tree(
    metadata: DataFrame,
    hierarchical_long: DataFrame,
    filter_prevalence: float = 0.01,
    filter_mean_abundance: float = 0.0,
) -> tuple[DataFrame, pd.DataFrame]:
    """Full-data tree with filter flags and NO competition — the input for
    summarized-levels mode (reference method_levels, lib/methods.R:144-181:
    build_tree over ALL subjects, per-level summaries of filter-passing
    features). Returns (resolved long frame, flags pandas frame shaped like
    a competition state with passed_filters)."""
    meta_pdf = metadata.select("subject_id").toPandas()
    meta_pdf["subject_id"] = meta_pdf["subject_id"].map(clean_entity)
    spark = metadata.sparkSession
    ids_df = spark.createDataFrame(
        [(e,) for e in meta_pdf["subject_id"]], ["entity_id"]
    )
    long = hierarchical_long.withColumn(
        "entity_id", clean_entity_expr("entity_id")
    ).join(F.broadcast(ids_df), "entity_id", "left_semi")
    resolved = hierarchical_rollup(long)
    n_entities = resolved.select("entity_id").distinct().count()
    scratch = getattr(resolved, "_taxahfe_scratch", None)
    if scratch is not None:
        scratch.unpersist()
    flags = feature_filter_flags(
        resolved, n_entities, filter_prevalence, filter_mean_abundance
    )
    return resolved, flags.select("path", "level", "passed_filters").toPandas()


def winner_feature_matrix(
    resolved: DataFrame,
    state: pd.DataFrame,
    metadata: DataFrame | None = None,
    use_super_filter: bool = False,
) -> DataFrame:
    """Collapsed output matrix: one row per entity, one column per winning
    feature (reference lib/tree.R:880-950 prepare_flattened_df +
    write_output_file). Winner count is small by construction, so the pivot
    is a bounded-width groupBy."""
    flag = "sf_winner" if use_super_filter else "winner"
    winners = [r.path for r in state[state[flag]].itertuples()]
    # ALL data entities appear in the output, even those whose every winner
    # value is an implicit zero (the reference's transposed flattened frame
    # keeps one row per sample column regardless of abundance). taxa_hfe
    # attaches the already-collected entity universe; fall back to a
    # distinct scan for frames from other producers
    known = getattr(resolved, "_taxahfe_entities", None)
    if known is not None:
        entities = resolved.sparkSession.createDataFrame(
            [(e,) for e in known], ["subject_id"]
        )
    else:
        entities = resolved.select(
            F.col("entity_id").alias("subject_id")
        ).distinct()
    vecs_ctx = getattr(resolved, "_taxahfe_vecs", None)
    if not winners:
        base = entities
    elif (
        vecs_ctx is not None
        and all(w in vecs_ctx[1] for w in winners)
        and len(vecs_ctx[0]) * len(winners) <= 50_000_000
        and len({clean_name(w) for w in winners}) == len(winners)
    ):
        # driver fast path: taxa_hfe's broadcast-strategy competition
        # already collected every node's sparse vector, so the winner
        # matrix (winner count x entities — small by construction, the
        # whole point of the collapse) densifies locally and ships back as
        # ONE Arrow createDataFrame instead of a filter+pivot re-scan of
        # resolved. Values identical to the pivot: present pairs keep their
        # value, absent pairs are the same zeros na.fill produced. The cell
        # gate falls back to the distributed pivot for pathological winner
        # counts.
        w_entities, vecs = vecs_ctx
        pdf = pd.DataFrame({"subject_id": list(w_entities)})
        for w in winners:
            idxs, vals = vecs[w]
            col = np.zeros(len(w_entities))
            col[np.asarray(idxs, dtype=np.int64)] = vals
            pdf[clean_name(w)] = col
        base = resolved.sparkSession.createDataFrame(pdf)
    else:
        pivoted = (
            resolved.filter(F.col("path").isin(winners))
            .groupBy(F.col("entity_id").alias("subject_id"))
            .pivot("path", winners)
            .agg(F.first("value"))
        )
        base = entities.join(pivoted, "subject_id", "left").na.fill(
            0.0, subset=winners
        )
        renames = {w: clean_name(w) for w in winners}
        base = base.withColumnsRenamed(renames)
    if metadata is not None:
        meta = metadata.withColumn("subject_id", clean_entity_expr("subject_id"))
        base = base.join(F.broadcast(meta), "subject_id", "inner")
    return base


def write_output_file(matrix: DataFrame, output_path: str) -> None:
    """Final winner matrix sink (reference lib/tree.R:933-950)."""
    matrix.coalesce(1).write.mode("overwrite").option("header", True).csv(output_path)


def write_summary_files(
    resolved: DataFrame, state: pd.DataFrame, flags_passed_only: bool, output_path: str
) -> None:
    """Per-level summary export (reference lib/tree.R:205-245), written as a
    single parquet partitioned by level instead of one CSV per depth."""
    keep = state[state["passed_filters"]]["path"] if flags_passed_only else state["path"]
    spark = resolved.sparkSession
    keep_df = spark.createDataFrame([(p,) for p in keep], ["path"])
    out = resolved.join(F.broadcast(keep_df), "path", "left_semi")
    out.write.mode("overwrite").partitionBy("level").parquet(output_path)


def write_level_summary_csvs(
    resolved: DataFrame,
    state: pd.DataFrame,
    metadata: DataFrame,
    output_dir: str,
) -> list[str]:
    """True per-depth transposed summary CSVs (reference lib/tree.R:205-245
    write_summary_files): for each tree depth, the features passing filters
    at that level become columns, one row per entity, joined to metadata.

    Feature counts per level are taxonomy-sized, so each pivot is a
    bounded-width groupBy; levels are independent jobs.
    """
    passed = state[state["passed_filters"]]
    written: list[str] = []
    for lvl in sorted(passed["level"].unique()):
        paths = passed[passed["level"] == lvl]["path"].tolist()
        lvl_df = (
            resolved.filter(F.col("level") == int(lvl))
            .filter(F.col("path").isin(paths))
            .groupBy(F.col("entity_id").alias("subject_id"))
            .pivot("path", paths)
            .agg(F.first("value"))
            .na.fill(0.0, subset=paths)
            .withColumnsRenamed({p: clean_name(p) for p in paths})
        )
        meta = metadata.withColumn("subject_id", clean_entity_expr("subject_id"))
        out = lvl_df.join(F.broadcast(meta), "subject_id", "inner")
        dest = f"{output_dir}/level_{int(lvl)}"
        out.coalesce(1).write.mode("overwrite").option("header", True).csv(dest)
        written.append(dest)
    return written


def write_v1_input_file(resolved: DataFrame, output_dir: str) -> str:
    """S5: legacy taxaHFE-v1 input export (reference lib/tree.R:247-257):
    one row per tree node at EVERY level, clade_name = pipe path, one column
    per entity. Wide one-column-per-entity layout is inherent to the legacy
    format — this sink exists for interop with the v1 tool and is bounded by
    what that tool can read, not a 100 TB path."""
    entities = sorted(
        r["entity_id"] for r in resolved.select("entity_id").distinct().collect()
    )
    wide = (
        resolved.groupBy(F.col("path").alias("clade_name"))
        .pivot("entity_id", entities)
        .agg(F.first("value"))
        .na.fill(0.0, subset=entities)
    )
    dest = f"{output_dir}/v1_input"
    wide.coalesce(1).write.mode("overwrite").option("header", True).csv(dest)
    return dest


def write_oudah_input(
    resolved: DataFrame,
    state: pd.DataFrame,
    metadata: DataFrame,
    output_dir: str,
) -> dict[str, str]:
    """S6/T8/J3: legacy Oudah-HFE 3-file export (reference lib/tree.R:
    261-305): taxonomy.tab (deepest filter-passing paths split into level
    columns, index from 1001, first level forced 'k__Bacteria' — a verbatim
    reference quirk), otu.tab (index + per-entity abundances), labels.tab
    (one row: 'label' then the response ordered by the abundance columns).
    Legacy-tool-sized by definition; shaped driver-side."""
    import os

    os.makedirs(output_dir, exist_ok=True)
    max_level = int(state["level"].max())
    keep = state[
        (state["level"] == max_level) & state["passed_filters"]
    ]["path"].tolist()
    entities = sorted(
        r["entity_id"] for r in resolved.select("entity_id").distinct().collect()
    )
    spark = resolved.sparkSession
    keep_df = spark.createDataFrame([(p,) for p in keep], ["path"])
    abundance = (
        resolved.filter(F.col("level") == max_level)
        .join(F.broadcast(keep_df), "path", "left_semi")
        .groupBy("path")
        .pivot("entity_id", entities)
        .agg(F.first("value"))
        .na.fill(0.0, subset=entities)
        .toPandas()
        .sort_values("path")
        .reset_index(drop=True)
    )
    # T8: path -> L1..Lmax columns
    parts = abundance["path"].str.split("|", expand=True)
    parts.columns = [f"L{i+1}" for i in range(parts.shape[1])]
    parts["L1"] = "k__Bacteria"  # reference lib/tree.R:290 verbatim quirk
    index = pd.Series(range(1001, 1001 + len(abundance)), name="index")
    taxa = pd.concat([index, parts], axis=1)
    otu = pd.concat([index, abundance[entities]], axis=1)
    paths = {
        "taxa": f"{output_dir}/oudah_hfe_taxa.txt",
        "otu": f"{output_dir}/oudah_hfe_otu.txt",
        "label": f"{output_dir}/oudah_hfe_label.txt",
    }
    taxa.to_csv(paths["taxa"], sep="\t", header=False, index=False)
    otu.to_csv(paths["otu"], sep="\t", header=False, index=False)
    # J3/O2: labels ordered by the abundance matrix's entity column order
    meta_pdf = metadata.select("subject_id", "feature_of_interest").toPandas()
    meta_pdf["subject_id"] = meta_pdf["subject_id"].map(clean_entity)
    lab = (
        meta_pdf.set_index("subject_id")
        .reindex(entities)["feature_of_interest"]
        .tolist()
    )
    with open(paths["label"], "w") as f:
        f.write("\t".join(["label", *[str(x) for x in lab]]) + "\n")
    return paths
