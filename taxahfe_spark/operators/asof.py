"""Point-in-time (as-of) join: each left row matched to the latest right row
with ``right_ts <= left_ts`` for the same key — zero temporal leakage.
``direction='forward'/'nearest'`` generalize to pandas.merge_asof's other
two modes (next-at-or-after / closer-of-the-two, ties backward).

The reference engine is snapshot-static (its leakage contract is the
train-only competition, reference lib/methods.R:65-123); the generalized
engine needs true event-time alignment to versioned taxonomy snapshots
(BASELINE.json north_rule). Spark has no native as-of join, so two physical
strategies are provided and both are leakage-safe:

1. ``strategy='union'`` (default, fully distributed): tag the two inputs,
   union them, and run ``last(payload, ignorenulls=True)`` over a window
   partitioned by key and ordered by (ts, tag). ONE shuffle total, sized by
   left+right; no driver participation. Optional key salting splits a hot
   key's events across ``n_salt`` buckets with the right side replicated per
   bucket — the timeline order within each bucket is preserved, so salting
   can never leak a future snapshot.

2. ``strategy='broadcast'`` (right side fits in memory, e.g. taxonomy
   snapshots): mapInPandas over the left with an np.searchsorted probe into
   the broadcast right side — ZERO shuffle, the left's partitioning is
   untouched. This is the 100-TB fast path when the dimension is small.

Tie semantics match pandas.merge_asof: ``allow_exact_matches=True`` includes
a right row with right_ts == left_ts; among right duplicates on (key, ts) the
winner is deterministic in the broadcast strategy only (stable mergesort
order — see asof_join's docstring for the union strategy's caveat).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_SALT = "__asof_salt"


def _seconds(col: F.Column, dtype) -> F.Column:
    """Epoch-seconds view of a timestamp-like column for distance math.
    TIMESTAMP_NTZ has no direct double cast — route it (and DATE) through
    timestamp_ltz first; the session TZ is pinned UTC by get_spark, so the
    wall-clock reinterpretation is a constant offset that cancels in every
    distance difference."""
    s = dtype.simpleString()
    if s == "timestamp_ntz" or s == "date":
        return col.cast("timestamp_ltz").cast("double")
    return col.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str | None = None,
    value_cols: list[str] | None = None,
    allow_exact_matches: bool = True,
    strategy: str = "union",
    n_salt: int = 1,
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join. Returns left columns + matched right ``value_cols``
    (null when no match exists in the chosen direction/tolerance).

    ``direction`` follows pandas.merge_asof: 'backward' (default — latest
    right with right_ts <= left_ts, the zero-leakage training shape),
    'forward' (earliest right with right_ts >= left_ts — label-lookahead
    joins, where leakage is the POINT: next outcome after the event), and
    'nearest' (closer of the two; ties go backward, pandas-style). Among
    right duplicates on (key, ts): in the BROADCAST strategy backward keeps
    the LAST and forward the FIRST in the stable (key, ts) mergesort order
    (pinned by tests and the SQL oracle); the UNION strategy's window order
    (ts, tag) has no tiebreaker among identical right rows, so WHICH
    duplicate's values win there is partition-layout-dependent — feed it
    deduplicated snapshots (one row per (key, ts)) when that matters
    (ADVICE r7).

    In the union strategy every direction is ONE shuffle: backward/forward
    are a single partitioned window pass; nearest runs the two passes over
    the same exchange (Catalyst plans Exchange -> Sort -> Window -> Sort ->
    Window; the second sort is in-partition, no second shuffle).
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys + [right_ts]]
    if strategy == "broadcast":
        return _asof_broadcast(
            left, right, keys, left_ts, right_ts, value_cols,
            allow_exact_matches, tolerance_seconds, direction,
        )
    return _asof_union(
        left, right, keys, left_ts, right_ts, value_cols,
        allow_exact_matches, n_salt, tolerance_seconds, direction,
    )


def _asof_union(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    allow_exact_matches: bool,
    n_salt: int,
    tolerance_seconds: float | None,
    direction: str,
) -> DataFrame:
    left_cols = left.columns
    ts_col = "__asof_ts"

    # Per-direction tie tags at equal ts. Backward frame is
    # [preceding, current]: a right row is visible to an equal-ts left row
    # iff it sorts BEFORE it (tag 0). Forward frame is [current, following]:
    # visible iff it sorts AFTER (tag 1). allow_exact_matches=False flips
    # each. _TAG doubles as the backward tag and the left-row filter flag.
    rb_tag, lb_tag = (0, 1) if allow_exact_matches else (1, 0)
    rf_tag, lf_tag = (1, 0) if allow_exact_matches else (0, 1)
    r = right.select(
        *keys,
        F.col(right_ts).alias(ts_col),
        F.lit(rb_tag).alias(_TAG),
        F.lit(rf_tag).alias("__asof_ftag"),
        F.col(right_ts).alias("__asof_src_ts"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in keys],
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias(ts_col),
        F.lit(lb_tag).alias(_TAG),
        F.lit(lf_tag).alias("__asof_ftag"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__asof_src_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
        *[F.col(c) for c in left_cols if c not in keys],
    )

    part_keys = list(keys)
    if n_salt > 1:
        # split a hot key's LEFT rows across buckets; replicate the RIGHT side
        # into every bucket. Each bucket still sees the full snapshot
        # timeline, so within-bucket LOCF semantics are exact.
        l = l.withColumn(
            _SALT, F.pmod(F.xxhash64(F.col(ts_col)), F.lit(n_salt)).cast("int")
        )
        r = r.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
        part_keys.append(_SALT)

    u = l.unionByName(r)
    fill_cols = []
    if direction in ("backward", "nearest"):
        wb = (
            Window.partitionBy(*part_keys)
            .orderBy(F.col(ts_col).asc(), F.col(_TAG).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        fill_cols.append(
            F.last("__asof_src_ts", ignorenulls=True).over(wb).alias("__asof_bts")
        )
        fill_cols += [
            F.last(f"__v_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}")
            for c in value_cols
        ]
    if direction in ("forward", "nearest"):
        # same partitioning -> Catalyst reuses the exchange; only a second
        # in-partition sort (the ftag order differs) precedes this window
        wf = (
            Window.partitionBy(*part_keys)
            .orderBy(F.col(ts_col).asc(), F.col("__asof_ftag").asc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        fill_cols.append(
            F.first("__asof_src_ts", ignorenulls=True).over(wf).alias("__asof_fts")
        )
        fill_cols += [
            F.first(f"__v_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}")
            for c in value_cols
        ]
    filled = u.select("*", *fill_cols)
    out = filled.filter(F.col(_TAG) == lb_tag)

    tol = None if tolerance_seconds is None else float(tolerance_seconds)
    lts_dtype = left.schema[left_ts].dataType
    rts_dtype = right.schema[right_ts].dataType
    lts_d = _seconds(F.col(ts_col), lts_dtype)
    if direction == "backward":
        ok = F.col("__asof_bts").isNotNull()
        if tol is not None:
            ok &= (lts_d - _seconds(F.col("__asof_bts"), rts_dtype)) <= F.lit(tol)
        sel_vals = [
            F.when(ok, F.col(f"__b_{c}")).otherwise(F.lit(None)).alias(c)
            for c in value_cols
        ]
    elif direction == "forward":
        ok = F.col("__asof_fts").isNotNull()
        if tol is not None:
            ok &= (_seconds(F.col("__asof_fts"), rts_dtype) - lts_d) <= F.lit(tol)
        sel_vals = [
            F.when(ok, F.col(f"__f_{c}")).otherwise(F.lit(None)).alias(c)
            for c in value_cols
        ]
    else:  # nearest: closer side wins, ties go backward (pandas semantics)
        db = lts_d - _seconds(F.col("__asof_bts"), rts_dtype)
        df_ = _seconds(F.col("__asof_fts"), rts_dtype) - lts_d
        ok_b = F.col("__asof_bts").isNotNull()
        ok_f = F.col("__asof_fts").isNotNull()
        if tol is not None:
            ok_b &= db <= F.lit(tol)
            ok_f &= df_ <= F.lit(tol)
        use_b = ok_b & (~ok_f | (db <= df_))
        sel_vals = [
            F.when(use_b, F.col(f"__b_{c}"))
            .when(ok_f, F.col(f"__f_{c}"))
            .otherwise(F.lit(None))
            .alias(c)
            for c in value_cols
        ]
    return out.select(
        *keys,
        F.col(ts_col).alias(left_ts),
        *[c for c in left_cols if c not in keys + [left_ts]],
        *sel_vals,
    )


def _asof_broadcast(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    allow_exact_matches: bool,
    tolerance_seconds: float | None,
    direction: str,
) -> DataFrame:
    """Zero-shuffle as-of probe against a small right side.

    The right side is collected once on the driver, sorted per key, and
    shipped to executors inside the mapInPandas closure (Spark broadcasts the
    pickled function once per stage). Left partitioning is untouched — at
    100 TB this reads the fact table exactly once with no exchange.
    All three directions are a searchsorted variant: backward takes the
    last position at-or-before, forward the first at-or-after, nearest
    whichever is closer (ties backward).
    """
    rp = right.select(*keys, right_ts, *value_cols).toPandas()
    rp = rp.sort_values(keys + [right_ts], kind="mergesort")
    lookup: dict[tuple, tuple[np.ndarray, pd.DataFrame]] = {}
    for kv, grp in rp.groupby(keys, sort=False):
        kt = kv if isinstance(kv, tuple) else (kv,)
        lookup[kt] = (grp[right_ts].to_numpy(), grp[value_cols].reset_index(drop=True))

    left_schema = left.schema
    left_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in left_schema.fields
    )
    out_fields = ", ".join(
        f"`{c}` {right.schema[c].dataType.simpleString()}" for c in value_cols
    )
    side_b = "right" if allow_exact_matches else "left"
    side_f = "left" if allow_exact_matches else "right"

    def _dist_seconds(dt: np.ndarray) -> np.ndarray:
        if np.issubdtype(np.asarray(dt).dtype, np.timedelta64):
            return dt.astype("timedelta64[ns]").astype(np.int64) / 1e9
        return dt

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            vals = {c: pd.Series([None] * n, dtype=object) for c in value_cols}
            if n:
                lts = pdf[left_ts].to_numpy()
                for kt, grp_idx in pdf.groupby(keys, sort=False).indices.items():
                    key_t = kt if isinstance(kt, tuple) else (kt,)
                    hit = lookup.get(key_t)
                    if hit is None:
                        continue
                    rts, rvals = hit
                    g = lts[grp_idx]
                    pos_b = np.searchsorted(rts, g, side=side_b) - 1
                    ok_b = pos_b >= 0
                    pos_f = np.searchsorted(rts, g, side=side_f)
                    ok_f = pos_f < len(rts)
                    if direction in ("backward", "nearest"):
                        db = _dist_seconds(g - rts[np.clip(pos_b, 0, len(rts) - 1)])
                        if tolerance_seconds is not None:
                            ok_b &= db <= tolerance_seconds
                    if direction in ("forward", "nearest"):
                        df_ = _dist_seconds(rts[np.clip(pos_f, 0, len(rts) - 1)] - g)
                        if tolerance_seconds is not None:
                            ok_f &= df_ <= tolerance_seconds
                    if direction == "backward":
                        ok, pos = ok_b, pos_b
                    elif direction == "forward":
                        ok, pos = ok_f, pos_f
                    else:
                        use_b = ok_b & (~ok_f | (db <= df_))
                        ok = ok_b | ok_f
                        pos = np.where(use_b, pos_b, pos_f)
                    for c in value_cols:
                        cv = rvals[c].to_numpy()
                        take = grp_idx[ok]
                        vals[c].iloc[take] = cv[pos[ok]]
            out = pdf.copy()
            for c in value_cols:
                out[c] = vals[c].values
            yield out

    schema = f"{left_fields}, {out_fields}" if out_fields else left_fields
    return left.mapInPandas(probe, schema=schema)
