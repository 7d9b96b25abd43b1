"""Windowed event-time feature engineering: lag/lead, gap sessionization,
LOCF/NOCB backfill, session statistics.

Generalizes the reference's longitudinal path (per-individual mean + slope,
reference lib/tree.R:1086-1144) into the full windowed toolkit the north rule
requires. Everything here is built-in window functions — JVM-side, one
shuffle on the partition key, whole-stage-codegen'd; no Python in the hot
path. All window orderings include a deterministic tiebreaker so results are
partition-layout-invariant even with duplicate timestamps.

Watermark-compatible definitions: the gap-session id below is exactly the
batch semantics of Structured Streaming's ``session_window(ts, gap)``, and
LOCF only ever reads the past — both survive a streaming port unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _w(keys: list[str], ts: str, tiebreak: str | None):
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    return Window.partitionBy(*keys).orderBy(*order)


def ts_seconds(df: DataFrame, ts: str) -> F.Column:
    """Timestamp column as epoch seconds (double). TIMESTAMP_NTZ cannot cast
    to double in Spark 4; go through unix_micros on a session-TZ timestamp
    (session TZ is pinned to UTC, so NTZ->LTZ is the identity)."""
    dt = df.schema[ts].dataType.typeName()
    c = F.col(ts)
    if dt in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(c.cast("timestamp")) / F.lit(1e6)
    return c.cast("double")


def lag_lead_features(
    df: DataFrame,
    keys: str | list[str],
    ts: str,
    cols: list[str],
    lags: list[int] = (1,),
    leads: list[int] = (1,),
    tiebreak: str | None = None,
    with_delta: bool = True,
) -> DataFrame:
    """Add lag/lead columns (and deltas vs lag-1) per key ordered by ts."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = _w(keys, ts, tiebreak)
    out = df
    for c in cols:
        for k in lags:
            out = out.withColumn(f"{c}_lag{k}", F.lag(c, k).over(w))
        for k in leads:
            out = out.withColumn(f"{c}_lead{k}", F.lead(c, k).over(w))
        if with_delta and 1 in set(lags):
            out = out.withColumn(f"{c}_delta", F.col(c) - F.col(f"{c}_lag1"))
    return out


def sessionize(
    df: DataFrame,
    keys: str | list[str],
    ts: str,
    gap_seconds: float,
    tiebreak: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based session ids per key: a new session starts when the gap to
    the previous event exceeds ``gap_seconds``. Ids are 0-based and dense per
    key (batch equivalent of session_window(ts, gap))."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = _w(keys, ts, tiebreak)
    tsec = ts_seconds(df, ts)
    gap = tsec - F.lag(tsec).over(w)
    is_new = F.when(gap.isNull() | (gap > F.lit(float(gap_seconds))), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(session_col, (F.sum(is_new).over(wsum) - 1).cast("long"))


def session_stats(
    df: DataFrame,
    keys: str | list[str],
    ts: str,
    gap_seconds: float,
    agg_cols: dict[str, str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-session aggregates: bounds, event count, duration + requested aggs.

    agg_cols: {column: spark_agg_fn_name}, e.g. {"value": "sum"}.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    s = sessionize(df, keys, ts, gap_seconds, tiebreak)
    aggs = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ts_seconds(s, ts)) - F.min(ts_seconds(s, ts))).alias(
            "duration_seconds"
        ),
    ]
    for c, fn in (agg_cols or {}).items():
        aggs.append(getattr(F, fn)(c).alias(f"{fn}_{c}"))
    return s.groupBy(*keys, "session_id").agg(*aggs)


def locf(
    df: DataFrame,
    keys: str | list[str],
    ts: str,
    cols: list[str],
    tiebreak: str | None = None,
    suffix: str = "_filled",
) -> DataFrame:
    """Last-observation-carried-forward: fill nulls with the most recent
    non-null value per key (reads only the past — leakage-safe)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = _w(keys, ts, tiebreak).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in cols:
        out = out.withColumn(f"{c}{suffix}", F.last(c, ignorenulls=True).over(w))
    return out


def nocb(
    df: DataFrame,
    keys: str | list[str],
    ts: str,
    cols: list[str],
    tiebreak: str | None = None,
    suffix: str = "_bfilled",
) -> DataFrame:
    """Next-observation-carried-backward (reads the FUTURE — only valid for
    training-time imputation, never for point-in-time serving features)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = _w(keys, ts, tiebreak).rowsBetween(0, Window.unboundedFollowing)
    out = df
    for c in cols:
        out = out.withColumn(f"{c}{suffix}", F.first(c, ignorenulls=True).over(w))
    return out


def per_key_slope(
    df: DataFrame,
    keys: str | list[str],
    ts: str,
    value: str,
) -> DataFrame:
    """OLS slope of value ~ ts per key, closed form
    covar_samp(value, ts) / var_samp(ts); NaN/null -> 0.0 (reference
    lib/tree.R:1127-1133 replace_na(0)). One aggregation, no UDF."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    tsd = ts_seconds(df, ts)
    return df.groupBy(*keys).agg(
        F.coalesce(
            F.covar_samp(F.col(value), tsd) / F.nullif(F.var_samp(tsd), F.lit(0.0)),
            F.lit(0.0),
        ).alias("slope"),
        F.avg(value).alias("mean_value"),
        F.count(F.lit(1)).alias("n_obs"),
    )


def rolling_stats(
    df: DataFrame,
    keys: str | list[str],
    ts: str,
    value: str,
    window_seconds: float,
) -> DataFrame:
    """Trailing event-time window features: for every row, the count / sum /
    mean / min / max of ``value`` over this key's rows in
    [ts - window_seconds, ts] (inclusive both ends — RANGE frame semantics,
    so timestamp ties are all in-frame regardless of partition layout).

    The north rule's entityxtimestamp feature vector in its simplest form:
    one shuffle on the key, one RANGE-frame window pass, whole-stage
    codegen, no Python. Frames are value-based (rangeBetween over epoch
    seconds), so results are deterministic under duplicate timestamps
    WITHOUT a tiebreaker — every tie sees the same frame.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    # timestamps: EXACT integer microseconds (a double epoch-second loses
    # sub-us precision at 2^53 and can flip frame membership for rows
    # exactly window_seconds apart — the oracle's INTERVAL arithmetic is
    # exact, so ours must be too). Numeric (and DATE) ts columns scale into
    # the same integer-microsecond units: Window.rangeBetween only accepts
    # int bounds, so the former double passthrough raised
    # 'Method rangeBetween([Double, Integer]) does not exist' on every
    # numeric ts (ADVICE r7); integer-us scaling fixes that and keeps frame
    # membership exact to 1 us of the numeric unit.
    dt = df.schema[ts].dataType.typeName()
    if dt in ("timestamp", "timestamp_ntz", "date"):
        tsv = F.unix_micros(F.col(ts).cast("timestamp"))
    else:
        tsv = F.round(F.col(ts).cast("double") * 1e6).cast("long")
    delta: int = int(round(float(window_seconds) * 1e6))
    out = df.withColumn("__tsd", tsv)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__tsd"))
        .rangeBetween(-delta, 0)
    )
    return (
        out.withColumn("w_count", F.count(F.lit(1)).over(w))
        .withColumn("w_sum", F.sum(value).over(w))
        .withColumn("w_mean", F.avg(value).over(w))
        .withColumn("w_min", F.min(value).over(w))
        .withColumn("w_max", F.max(value).over(w))
        .drop("__tsd")
    )
