"""Structured Streaming variants of the event-time operators.

The batch definitions in operators/windows.py were written watermark-
compatible on purpose (SURVEY.md §2.12): gap sessionization == Spark's
``session_window(ts, gap)``, and LOCF/as-of only read the past. These
wrappers express the same semantics over ``readStream`` sources so the
engine's event-time layer ports to continuous ingestion without semantic
drift; tests drive them with file sources + ``processAllAvailable()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_stats(
    events: DataFrame,
    keys: str | list[str],
    ts: str,
    gap_seconds: float,
    watermark: str = "1 hour",
    agg_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Per-session aggregates over a stream: session_window + watermark.

    Near-equivalent batch result: operators.windows.session_stats. The one
    boundary-equality difference: the batch rule starts a new session on
    strict ``gap > gap_seconds`` (an event exactly gap_seconds later stays
    in-session), while session_window closes at prev_ts + gap EXCLUSIVE (an
    exact-boundary event starts a new session). For continuous timestamps the
    results are identical; the watermark only bounds state, it does not
    change on-time results.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    # watermarks require TIMESTAMP (LTZ); parquet often yields NTZ — the
    # cast is the identity under the pinned UTC session TZ
    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
    ]
    for c, fn in (agg_cols or {}).items():
        aggs.append(getattr(F, fn)(c).alias(f"{fn}_{c}"))
    return (
        events.withWatermark(ts, watermark)
        .groupBy(
            F.session_window(F.col(ts), f"{int(gap_seconds)} seconds").alias("session"),
            *keys,
        )
        .agg(*aggs)
        .select(
            *keys,
            F.col("session.start").alias("window_start"),
            F.col("session.end").alias("window_end"),
            "n_events",
            "session_start",
            "session_end",
            *[f"{fn}_{c}" for c, fn in (agg_cols or {}).items()],
        )
    )


def streaming_asof_snapshot(
    events: DataFrame,
    snapshot: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str | None = None,
    value_cols: list[str] | None = None,
    allow_exact_matches: bool = True,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Streaming point-in-time join: each streamed event matched to the
    latest STATIC snapshot row at-or-before its event time (north-rule
    zero-temporal-leakage contract, continuously ingested).

    Reuses the batch broadcast as-of strategy verbatim (operators/asof.py
    ``strategy='broadcast'``): the snapshot dimension is collected once,
    sorted per key, and probed with np.searchsorted inside a STATELESS
    mapInPandas over the stream — no watermark, no state store, no shuffle;
    the stream's partitioning is untouched and each micro-batch pays one
    Arrow pass. Correct whenever the snapshot side is bounded (taxonomy
    snapshots, dimension tables); batch == stream equality is pinned in
    tests/test_sources_streaming.py. For a snapshot side that itself grows
    in event time, use the batch union strategy over closed windows
    instead — Structured Streaming cannot re-emit past matches when a
    late snapshot arrives (the same reason the reference recomputes its
    tree per run rather than incrementally, lib/tree.R:396-449).
    """
    from taxahfe_spark.operators.asof import asof_join

    events = events.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
    return asof_join(
        events,
        snapshot,
        on=on,
        left_ts=left_ts,
        right_ts=right_ts,
        value_cols=value_cols,
        allow_exact_matches=allow_exact_matches,
        strategy="broadcast",
        tolerance_seconds=tolerance_seconds,
    )


def streaming_windowed_counts(
    events: DataFrame,
    ts: str,
    keys: str | list[str],
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling/sliding windowed counts with late-data handling."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    win = F.window(F.col(ts), window, slide) if slide else F.window(F.col(ts), window)
    return (
        events.withWatermark(ts, watermark)
        .groupBy(win.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            *keys,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "sum_value",
        )
    )
