"""Prevalence and mean-abundance feature filters.

Reference semantics (lib/tree.R:339-363, STRICT inequalities both):
- prevalence:      count(value != 0)  >  n_entities * filter_prevalence
- mean abundance:  mean(value)        >  filter_mean_abundance   (trim = 0)

Operates on the long resolved frame, so "mean" is sum(value) / n_entities —
absent (path, entity) pairs are implicit zeros and MUST count in the
denominator (a sparse long layout that used avg(value) over present rows
would silently inflate the mean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feature_filter_flags(
    resolved: DataFrame,
    n_entities: int,
    filter_prevalence: float = 0.01,
    filter_mean_abundance: float = 0.0,
) -> DataFrame:
    """Per-path filter flags: (path, level, prevalence, mean_abundance,
    passed_prevalence, passed_abundance, passed_filters).

    One map-side-combined groupBy on path — no per-node work.
    """
    return (
        resolved.groupBy("path", "level")
        .agg(
            F.sum((F.col("value") != 0).cast("long")).alias("prevalence"),
            (F.sum("value") / F.lit(float(n_entities))).alias("mean_abundance"),
        )
        .withColumn(
            "passed_prevalence",
            F.col("prevalence") > F.lit(float(n_entities) * filter_prevalence),
        )
        .withColumn(
            "passed_abundance",
            F.col("mean_abundance") > F.lit(float(filter_mean_abundance)),
        )
        .withColumn(
            "passed_filters", F.col("passed_prevalence") & F.col("passed_abundance")
        )
    )
