"""Taxonomy tree as DataFrames: path split, node skeleton, observed-wins rollup.

Re-expresses the reference's mutable ``data.tree`` graph (reference:
lib/tree.R:396-449 build_tree, lib/tree.R:372-388 fix_unpopulated_node) as
pure DataFrame transformations:

- the *tree* is just the set of distinct path prefixes of the observed rows
  (small — broadcastable even for 10^5-node taxonomies);
- the *per-node abundance state* is a long (path, entity_id, value) frame
  (big — stays distributed, shuffle-partitioned on (path, entity_id));
- post-order traversal becomes a driver loop over levels from deepest to
  shallowest; within a level every node is independent, so each iteration is
  ONE map-side-combined groupBy — no per-node work, no driver data movement.

Correctness-critical invariant ("observed wins", lib/tree.R:374-376): a node
that appears in the input keeps its own vector verbatim; only missing
ancestors are synthesized as the elementwise sum of their (already-resolved)
children, so grandchildren roll up transitively exactly like the reference's
post-order ``fix_unpopulated_node``.

Level convention: ``level == size(split(path, '|'))`` (number of path
segments). The reference counts its synthetic root as level 1, so
``reference_level == level + 1``; the pipeline wrapper converts CLI-style
bounds (see pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taxahfe_spark.naming import clean_value_col

PATH_SEP = "|"
_SPLIT_RE = r"\|"


def parent_path(col) -> F.Column:
    """Parent path = path minus its last segment ('' for depth-1 nodes)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.instr(c, PATH_SEP) > 0, F.regexp_replace(c, r"\|[^|]*$", "")).otherwise(F.lit(None))


def path_level(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(c, _SPLIT_RE))


def explode_ancestors(df: DataFrame, path_col: str = "path") -> DataFrame:
    """One output row per (row, ancestor-prefix) incl. the path itself.

    Adds ``anc_path`` and ``anc_level``. Pure built-ins:
    ``transform(sequence(...), k -> array_join(slice(parts,1,k),'|'))``
    stays inside whole-stage codegen (no UDF, no shuffle).
    """
    parts = F.split(F.col(path_col), _SPLIT_RE)
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda k: F.array_join(F.slice(parts, F.lit(1), k), PATH_SEP),
    )
    return df.select(
        "*", F.posexplode(prefixes).alias("_anc_pos", "anc_path")
    ).withColumn("anc_level", F.col("_anc_pos") + 1).drop("_anc_pos")


def node_skeleton(observed_paths: DataFrame, path_col: str = "path") -> DataFrame:
    """All distinct nodes (observed paths + every ancestor prefix).

    Returns (path, level, name, parent_path, observed). This is the
    broadcastable tree skeleton — the analog of the reference's node graph
    minus the per-node abundance state.
    """
    obs = observed_paths.select(F.col(path_col).alias("path")).distinct()
    all_nodes = (
        explode_ancestors(obs, "path")
        .groupBy(F.col("anc_path").alias("path"))
        .agg(F.max("anc_level").alias("level"))
    )
    obs_flag = obs.withColumn("observed", F.lit(True))
    return (
        all_nodes.join(obs_flag, "path", "left")
        .select(
            "path",
            "level",
            F.element_at(F.split("path", _SPLIT_RE), -1).alias("name"),
            parent_path("path").alias("parent_path"),
            F.coalesce("observed", F.lit(False)).alias("observed"),
        )
    )


def melt_wide_matrix(
    wide: DataFrame, feature_col: str = "clade_name", value_type: str = "double"
) -> DataFrame:
    """Wide (feature row x one column per entity) -> long (clade_name, entity_id, value).

    The reference's input format (lib/tree.R:143-200): col 1 = clade_name,
    remaining columns one per subject. One-column-per-entity breaks beyond
    ~10^4 entities, so everything downstream uses this long layout.
    """
    entity_cols = [c for c in wide.columns if c != feature_col]
    ids = [feature_col]
    long = wide.unpivot(ids, entity_cols, "entity_id", "value")
    return long.select(
        F.col(feature_col).alias("clade_name"),
        "entity_id",
        F.col("value").cast(value_type).alias("value"),
    )


def _driver_rollup_pdf(pdf, raw_map):
    """Observed-wins rollup computed DRIVER-SIDE from the collected base
    pairs — the exact content the distributed level chain materializes,
    as one pandas frame (r8 guide §8: decide with small rows).

    Mirrors pipeline._driver_prefix's resolved reconstruction (minus the
    metadata entity pruning, which the plain rollup does not do): observed
    rows keep their (possibly duplicated) pairs verbatim; each MISSING
    ancestor gets one row per entity PRESENT in any resolved child (even
    when the sums cancel to exactly 0.0 — the groupBy-presence semantics),
    values summed over child rows with children visited in sorted path
    order. ``raw_map`` is the (raw, clean path, level) mapping for
    clean_paths inputs (collision-merging included) or None for identity.
    """
    import numpy as np
    import pandas as pd

    if raw_map is not None:
        rcodes, runiq = pd.factorize(pdf["__raw"])
        pmap = {r: (p, lvl) for r, p, lvl in raw_map}
        u_paths = [pmap[r][0] for r in runiq]
        u_lvls = [pmap[r][1] for r in runiq]
    else:
        rcodes, runiq = pd.factorize(pdf["path"])
        u_paths = list(runiq)
        u_lvls = [p.count("|") + 1 for p in u_paths]
    # clean collisions merge distinct raws into one path: re-factorize
    pcodes_u, puniq = pd.factorize(pd.Series(u_paths))
    pcodes = pcodes_u[rcodes]
    obs_paths = list(puniq)
    levels: dict[str, int] = {}
    for p, lvl in zip(u_paths, u_lvls):
        levels[p] = int(lvl)

    ecodes, euniq = pd.factorize(pdf["entity_id"])
    n_ent = len(euniq)
    vals = pdf["value"].to_numpy(dtype=np.float64)
    order = np.lexsort((vals, ecodes, pcodes))
    p_o, e_o, v_o = pcodes[order], ecodes[order], vals[order]
    bounds = np.searchsorted(p_o, np.arange(len(obs_paths) + 1))
    vecs = {
        p: (e_o[bounds[k]: bounds[k + 1]], v_o[bounds[k]: bounds[k + 1]])
        for k, p in enumerate(obs_paths)
    }

    obs_by_level: dict[int, set] = {}
    for p in obs_paths:
        obs_by_level.setdefault(levels[p], set()).add(p)
    max_level = max(obs_by_level)
    resolved_at = sorted(obs_by_level.get(max_level, set()))
    for lvl in range(max_level - 1, 0, -1):
        children_of: dict[str, list] = {}
        for q in resolved_at:
            par = q[: q.rfind("|")] if "|" in q else None
            if par:
                children_of.setdefault(par, []).append(q)
        obs_lvl = obs_by_level.get(lvl, set())
        missing = sorted(set(children_of) - obs_lvl)
        for p in missing:
            acc = np.zeros(n_ent)
            mask = np.zeros(n_ent, dtype=bool)
            for q in sorted(children_of[p]):
                i, v = vecs[q]
                i64 = i.astype(np.int64)
                np.add.at(acc, i64, v)
                mask[i64] = True
            pres = np.flatnonzero(mask)
            vecs[p] = (pres, acc[pres])
            levels[p] = lvl
        resolved_at = sorted(obs_lvl | set(missing))

    ent_arr = np.asarray(list(euniq), dtype=object)
    obs_paths_arr = np.asarray(obs_paths, dtype=object)
    lvl_by_code = np.asarray([levels[p] for p in obs_paths], dtype=np.int64)
    parts = [
        pd.DataFrame(
            {
                "path": obs_paths_arr[pcodes],
                "level": lvl_by_code[pcodes],
                "entity_id": ent_arr[ecodes],
                "value": vals,
                "observed": True,
            }
        )
    ]
    for p in sorted(set(vecs) - set(obs_paths)):
        i, v = vecs[p]
        parts.append(
            pd.DataFrame(
                {
                    "path": p,
                    "level": int(levels[p]),
                    "entity_id": ent_arr[i.astype(np.int64)],
                    "value": v,
                    "observed": False,
                }
            )
        )
    return pd.concat(parts, ignore_index=True)


def hierarchical_rollup(
    long_df: DataFrame,
    clean_paths: bool = True,
    checkpoint: bool = True,
    defer_levels: bool = False,
    allow_driver: bool = True,
) -> DataFrame:
    """Observed-wins hierarchical rollup (reference: lib/tree.R:372-449).

    Input: long frame (clade_name, entity_id, value) — one row per observed
    (feature-path, entity) pair; absent pairs are implicit zeros.

    Output: resolved long frame (path, level, entity_id, value, observed)
    covering EVERY node of the taxonomy: observed nodes keep their input
    vector verbatim; unobserved ancestors get the elementwise sum of their
    resolved children (transitive, deepest-first).

    Scale shape: one shuffle per level (groupBy(parent, entity) with map-side
    partial aggregation), broadcast semi-join of the taxonomy-sized missing
    sets, localCheckpoint per level to truncate lineage — MANDATORY for any
    consumer: without it each missing level's plan nests the previous
    level's, so Spark re-executes deep levels combinatorially on every
    action (r8 measured a 7-level tree at ~100 s PER ACTION when per-level
    truncation was replaced by lazy persist markers; the eager checkpoint
    computes each level exactly once from the previous level's stored
    blocks). ``defer_levels=True`` skips the truncation and returns raw
    lazy level plans — STRICTLY for callers that never materialize the
    result (taxa_hfe's driver-prefix fast path, which replaces the frame
    before returning it); materializing a deferred result on a deep tree
    is the combinatorial case above.
    """
    spark = long_df.sparkSession
    import os as _os, sys as _sys, time as _time
    _t0 = _time.time()
    if clean_paths:
        # The janitor-style clean regex is data-INVARIANT per distinct path,
        # and distinct paths are taxonomy-sized by contract (<= ~1e5) while
        # the long frame is data-sized — so clean the DISTINCT paths once
        # and re-attach via a broadcast join instead of running two regex
        # passes over every row (measured 2.7 s of pure regexp_replace at
        # sf0.1's 587k rows vs ~0 on the 1000-row distinct frame). The
        # distinct collect below doubles as the obs_paths_by_level source,
        # so no separate (path, level) distinct job runs at all.
        base = (
            long_df.select(
                F.col("clade_name").cast("string").alias("__raw"),
                F.col("entity_id").cast("string").alias("entity_id"),
                F.col("value").cast("double").alias("value"),
            )
            # COLUMNAR cache (see the clean_paths=False branch note)
            .persist()
        )
        map_df = (
            base.select("__raw")
            .distinct()
            .select(
                "__raw",
                clean_value_col("__raw").alias("path"),
                path_level(clean_value_col("__raw")).alias("level"),
            )
        )
        map_rows = map_df.collect()  # taxonomy-sized; materializes the cache
        obs_pairs = {(r["path"], r["level"]) for r in map_rows}
        observed = base.join(F.broadcast(map_df), "__raw").select(
            "path", "entity_id", "value", "level"
        )
        scratch = base
    else:
        observed = (
            long_df.select(
                F.col("clade_name").cast("string").alias("path"),
                F.col("entity_id").cast("string").alias("entity_id"),
                F.col("value").cast("double").alias("value"),
            )
            .withColumn("level", path_level("path"))
            # COLUMNAR cache, deliberately not localCheckpoint: the frame is
            # re-sliced once per level (filter level == lvl) and the in-memory
            # columnar relation serves those with stats-based batch pruning;
            # checkpoint blocks are row-format and rescan everything (measured
            # 3.6x slower end-to-end). Callers that materialize the result can
            # release it via the attached `_taxahfe_scratch` handle (taxa_hfe
            # does); one cached input frame is the cost for direct callers.
            .persist()
        )
        # distinct observed paths per level — tiny, broadcast into anti-joins.
        # ONE action: max_level falls out of the same collect (a separate
        # agg(max) paid a full extra scan of the cached join per run)
        obs_pairs = {
            (r["path"], r["level"])
            for r in observed.select("path", "level").distinct().collect()
        }
        scratch = observed
    obs_paths_by_level: dict[int, list[str]] = {}
    for path, level in obs_pairs:
        # taxonomy-sized (<=1e5), not data-sized
        obs_paths_by_level.setdefault(level, []).append(path)
    if _os.environ.get("TAXAHFE_DEBUG_TIMING") == "1":
        print(f"[timing] rollup: observed persist + distinct collect "
              f"{_time.time()-_t0:.2f}s", file=_sys.stderr, flush=True)
    max_level = max(obs_paths_by_level, default=None)
    if max_level is None:
        return observed.select(
            "path", "level", "entity_id", "value", F.lit(True).alias("observed")
        ).limit(0)

    # Driver fast path (r8, guide §8 — decide with small rows): below the
    # row gate the whole level chain (one localCheckpoint job per level —
    # ~1 s of pure scheduling at sf0.1's 3-level/15k-row hfe inputs)
    # reduces to one Arrow collect of the already-cached base plus
    # taxonomy-sized numpy, returned as a single local relation. Identical
    # rows to the distributed chain (pinned by
    # tests/test_taxonomy.py::test_driver_rollup_parity_with_distributed
    # on top of the DuckDB oracles); the gate is scale-adaptive — past
    # TAXAHFE_ROLLUP_DRIVER_MAX_ROWS (env, default 2M) or under
    # allow_driver=False (taxa_hfe's distributed re-issue, which must keep
    # the r7 checkpoint shape) the level chain runs unchanged.
    raw_map = (
        [(r["__raw"], r["path"], r["level"]) for r in map_rows]
        if clean_paths
        else None
    )
    if allow_driver and checkpoint and not defer_levels:
        gate = int(
            _os.environ.get("TAXAHFE_ROLLUP_DRIVER_MAX_ROWS", "2000000")
        )
        # count served from the cache the distinct collect just filled
        if gate > 0 and scratch.count() <= gate:
            _t0 = _time.time()
            pdf = scratch.toArrow().to_pandas()
            out = spark.createDataFrame(
                _driver_rollup_pdf(pdf, raw_map),
                schema="path string, level int, entity_id string, "
                       "value double, observed boolean",
            )
            if _os.environ.get("TAXAHFE_DEBUG_TIMING") == "1":
                print(
                    f"[timing] rollup: driver resolve {_time.time()-_t0:.2f}s",
                    file=_sys.stderr, flush=True,
                )
            out._taxahfe_scratch = scratch
            out._taxahfe_base = (scratch, raw_map)
            return out

    # which parents are actually MISSING per level, precomputed from path
    # strings alone (taxonomy-sized, pure driver arithmetic): resolved
    # paths at lvl = observed(lvl) + missing parents of resolved(lvl+1).
    # The per-level rollup only needs to aggregate the children of MISSING
    # parents — a fully-observed level (the common case for well-formed
    # taxonomies) costs zero shuffle instead of a whole-level groupBy whose
    # every output row the old anti-join then discarded.
    def _parent(p: str) -> str | None:
        # exact mirror of parent_path(): any "|" present -> strip the last
        # segment (a pathological leading-pipe path yields "")
        return p[: p.rfind("|")] if "|" in p else None

    missing_by_level: dict[int, set[str]] = {}
    resolved_paths = set(obs_paths_by_level.get(max_level, []))
    for lvl in range(max_level - 1, 0, -1):
        parents = {q for q in (_parent(p) for p in resolved_paths) if q}
        missing_by_level[lvl] = parents - set(obs_paths_by_level.get(lvl, []))
        resolved_paths = set(obs_paths_by_level.get(lvl, [])) | missing_by_level[lvl]

    _t0 = _time.time()
    # LAZY per-level checkpoints (r7 mechanism, kept deliberately): the
    # first action computes every level in ONE fused chain off the stored
    # input cache, then each level's blocks serve all later consumers.
    # Under AQE even eager=False executes the level's stages at call time
    # (toRdd finalizes the adaptive plan) — that build-time cost is the
    # price of a SAFE resolved frame; per-level persist() markers were
    # tried in r8 and do NOT reliably serve these nested level plans
    # (measured ~100 s per action on the reference example's 7-level tree
    # vs seconds with checkpoints). Callers that never consume the frame
    # can skip the cost with defer_levels (see docstring).
    truncate = checkpoint and not defer_levels
    resolved_per_level: list[DataFrame] = []
    current = observed.filter(F.col("level") == max_level).withColumn(
        "observed", F.lit(True)
    )
    if truncate:
        current = current.localCheckpoint(eager=False)
    resolved_per_level.append(current)

    for lvl in range(max_level - 1, 0, -1):
        child = resolved_per_level[-1]
        has_obs = bool(obs_paths_by_level.get(lvl))
        obs_lvl = observed.filter(F.col("level") == lvl).withColumn(
            "observed", F.lit(True)
        )
        missing = missing_by_level.get(lvl, set())
        if not missing:
            # every parent at this level is observed: the old shape ran a
            # whole-level groupBy and anti-joined away 100% of its output
            current = obs_lvl
        elif not has_obs:
            # NOTHING observed at this level: the obs_lvl slice would scan
            # the cached input only to yield 0 rows — every node here is a
            # rolled-up missing parent, so skip the union (and its scan)
            current = (
                child.withColumn("path", parent_path("path"))
                .filter(F.col("path").isNotNull())
                .groupBy("path", "entity_id")
                .agg(F.sum("value").alias("value"))
                .withColumn("level", F.lit(lvl))
                .withColumn("observed", F.lit(False))
                .select(*obs_lvl.columns)
            )
        else:
            # roll up ONLY the children of missing parents. Parent derived
            # from the path string, no join to find it; the old
            # observed-wins anti-join is unnecessary because the
            # aggregation now produces missing parents only.
            parents = child.withColumn("path", parent_path("path")).filter(
                F.col("path").isNotNull()
            )
            # partially observed level: broadcast semi-join on the
            # taxonomy-sized missing set (not an IN-list — a 10^5-path
            # isin builds a megabyte expression tree re-parsed per
            # level) prunes the children to the needed subtrees
            miss_df = spark.createDataFrame(
                [(p,) for p in sorted(missing)], ["path"]
            )
            parents = parents.join(F.broadcast(miss_df), "path", "left_semi")
            rolled = (
                parents.groupBy("path", "entity_id")
                .agg(F.sum("value").alias("value"))
                .withColumn("level", F.lit(lvl))
                .withColumn("observed", F.lit(False))
            )
            current = obs_lvl.unionByName(rolled.select(*obs_lvl.columns))
        if truncate:
            current = current.localCheckpoint(eager=False)
        resolved_per_level.append(current)

    if _os.environ.get("TAXAHFE_DEBUG_TIMING") == "1":
        print(f"[timing] rollup: level-loop build {_time.time()-_t0:.2f}s",
              file=_sys.stderr, flush=True)
    _t0 = _time.time()
    out = resolved_per_level[0]
    for lvl_df in resolved_per_level[1:]:
        out = out.unionByName(lvl_df)
    out = out.select("path", "level", "entity_id", "value", "observed")
    if _os.environ.get("TAXAHFE_DEBUG_TIMING") == "1":
        print(f"[timing] rollup: union build {_time.time()-_t0:.2f}s",
              file=_sys.stderr, flush=True)
    # cleanup handle: safe to unpersist once the result has been fully
    # materialized (the level checkpoints pin the data from then on)
    out._taxahfe_scratch = scratch
    # driver-prefix handle (taxa_hfe fast path): the cached INPUT frame plus
    # the raw-path -> (clean path, level) mapping already collected above —
    # enough to rebuild flags/vectors driver-side without materializing the
    # distributed level chain. clean_paths=False passes None (identity map).
    out._taxahfe_base = (scratch, raw_map)
    return out


def to_feature_vectors(resolved: DataFrame, entity_ids: list[str]) -> DataFrame:
    """(path, level, entity_id, value) -> SPARSE per-path vectors
    (path, level, idxs: array<int>, vals: array<double>) sorted by idx.

    ``entity_ids`` fixes the canonical vector order (the reference's column
    order); missing (path, entity) pairs are implicit zeros and are NOT
    materialized — consumers densify with :func:`sparse_to_dense` (numpy,
    O(nnz)). Sparse transfer matters: deep taxa touch few entities, so a
    dense layout would ship n_entities doubles per node through Arrow.
    """
    spark = resolved.sparkSession
    idx = spark.createDataFrame(
        [(e, i) for i, e in enumerate(entity_ids)], ["entity_id", "_eidx"]
    )
    pairs = resolved.join(F.broadcast(idx), "entity_id", "inner")
    return (
        pairs.groupBy("path", "level")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_eidx"), F.col("value")))
            ).alias("_iv")
        )
        .select(
            "path",
            "level",
            F.transform("_iv", lambda s: s["_eidx"].cast("int")).alias("idxs"),
            F.transform("_iv", lambda s: s["value"]).alias("vals"),
        )
    )


def sparse_to_dense(idxs, vals, n: int):
    """numpy densifier for one sparse vector row (executor-side, O(nnz))."""
    import numpy as np

    out = np.zeros(n, dtype=np.float64)
    if len(idxs):
        out[np.asarray(idxs, dtype=np.int64)] = np.asarray(vals, dtype=np.float64)
    return out
