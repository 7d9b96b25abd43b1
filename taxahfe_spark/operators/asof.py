"""Point-in-time (as-of) join: each left row matched to the latest right row
with ``right_ts <= left_ts`` for the same key — zero temporal leakage.

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
last one in (ts, tiebreak) order wins.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_SALT = "__asof_salt"


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
) -> DataFrame:
    """As-of join. Returns left columns + matched right ``value_cols``
    (null when no snapshot exists at or before the row's timestamp)."""
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys + [right_ts]]
    if strategy == "broadcast":
        return _asof_broadcast(
            left, right, keys, left_ts, right_ts, value_cols,
            allow_exact_matches, tolerance_seconds,
        )
    return _asof_union(
        left, right, keys, left_ts, right_ts, value_cols,
        allow_exact_matches, n_salt, tolerance_seconds,
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
) -> DataFrame:
    left_cols = left.columns
    ts_col = "__asof_ts"

    # right rows tagged 0 (sort before left rows at equal ts when exact
    # matches are allowed), left rows tagged 1
    r_tag, l_tag = (0, 1) if allow_exact_matches else (1, 0)
    r = right.select(
        *keys,
        F.col(right_ts).alias(ts_col),
        F.lit(r_tag).alias(_TAG),
        F.col(right_ts).alias("__asof_src_ts"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in keys],
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias(ts_col),
        F.lit(l_tag).alias(_TAG),
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
    w = (
        Window.partitionBy(*part_keys)
        .orderBy(F.col(ts_col).asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        F.last("__asof_src_ts", ignorenulls=True).over(w).alias("__asof_match_ts"),
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in value_cols
        ],
    )
    out = filled.filter(F.col(_TAG) == l_tag)
    if tolerance_seconds is not None:
        in_tol = (
            F.col(ts_col).cast("double") - F.col("__asof_match_ts").cast("double")
        ) <= F.lit(float(tolerance_seconds))
        sel_vals = [
            F.when(in_tol, F.col(f"__f_{c}")).otherwise(F.lit(None)).alias(c)
            for c in value_cols
        ]
    else:
        sel_vals = [F.col(f"__f_{c}").alias(c) for c in value_cols]
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
) -> DataFrame:
    """Zero-shuffle as-of probe against a small right side.

    The right side is collected once on the driver, sorted per key, and
    shipped to executors inside the mapInPandas closure (Spark broadcasts the
    pickled function once per stage). Left partitioning is untouched — at
    100 TB this reads the fact table exactly once with no exchange.
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
    side = "right" if allow_exact_matches else "left"
    ts_dtype = rp[right_ts].dtype

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
                    pos = np.searchsorted(rts, lts[grp_idx], side=side) - 1
                    ok = pos >= 0
                    if tolerance_seconds is not None:
                        dt = lts[grp_idx] - rts[np.clip(pos, 0, len(rts) - 1)]
                        dt_s = (
                            dt.astype("timedelta64[ns]").astype(np.int64) / 1e9
                            if np.issubdtype(np.asarray(lts).dtype, np.datetime64)
                            else dt
                        )
                        ok &= dt_s <= tolerance_seconds
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
