"""Model-based document quality filtering — the GPT-3 / CCNet idiom: train
a logistic-regression quality classifier on weakly-labeled documents (e.g.
"curated source vs random crawl"), freeze the coefficients, and score the
corpus with a pure Column expression.

Scale shape: training runs on a SAMPLE (quality classifiers are trained on
10^4-10^6 labeled docs, not the corpus) via pyspark.ml; scoring — the pass
that actually touches 100 TB — never sees a model object: the frozen
coefficients are inlined as literals into ``sigmoid(b + w.x)``, which
compiles into whole-stage codegen. One scan, zero Python, zero shuffle.

Correctness: the scoring chain (feature extraction + sigmoid) is value-gated
by the driver oracle ``quality_model_score_docs`` (DuckDB recomputes every
feature and the sigmoid from raw text); the TRAINING path is gated in pytest
against an independent numpy IRLS (Newton) implementation of the logistic
MLE — same optimum, different algorithm (tests/test_quality_model.py).

Graft operator (SURVEY LLM-pipeline family); no reference counterpart —
the reference's ML surface (lib/diet_ml_funcs.R) predicts outcomes from
features, it does not filter documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from taxahfe_spark.operators.textstats import text_stats

# Features with proven SQL-replayable definitions (see the driver's
# _TEXT_QUALITY_ORACLE): ratios from text_stats plus a log-compressed length.
QUALITY_FEATURES = [
    "alpha_ratio",
    "digit_ratio",
    "upper_ratio",
    "stopword_coverage",
    "unique_word_ratio",
    "log1p_n_words",
]

# A frozen reference model for the driver value-gate: hand-set magnitudes in
# the direction every web-filtering paper uses (prose-y, stopword-dense,
# lexically diverse text up; digit/caps-heavy text down). The driver query
# exercises the full scoring machinery with these constants; real models come
# from fit_quality_model and have the same dict shape.
FROZEN_QUALITY_MODEL: dict = {
    "intercept": -1.5,
    "weights": {
        "alpha_ratio": 2.0,
        "digit_ratio": -3.0,
        "upper_ratio": -1.0,
        "stopword_coverage": 2.5,
        "unique_word_ratio": 1.0,
        "log1p_n_words": 0.25,
    },
}


def quality_feature_frame(df: DataFrame, text_col: str = "text") -> DataFrame:
    """text_stats features + log1p(n_words), the model's input columns."""
    return text_stats(df, text_col).withColumn(
        "log1p_n_words", F.log1p(F.col("n_words"))
    )


def quality_score_expr(model: dict) -> Column:
    """sigmoid(intercept + sum_i w_i * feature_i) as a single Column —
    literals only, stays inside whole-stage codegen."""
    z = F.lit(float(model["intercept"]))
    for feat, w in sorted(model["weights"].items()):
        z = z + F.lit(float(w)) * F.col(feat)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_quality(
    df: DataFrame,
    model: dict | None = None,
    text_col: str = "text",
    out_col: str = "model_quality",
) -> DataFrame:
    """Corpus-wide quality scoring with a frozen model: feature extraction
    (built-ins) + inlined-literal sigmoid. The 100 TB hot path."""
    model = model if model is not None else FROZEN_QUALITY_MODEL
    feats = quality_feature_frame(df, text_col)
    return feats.withColumn(out_col, quality_score_expr(model))


def fit_quality_model(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str] | None = None,
    max_iter: int = 100,
    tol: float = 1e-9,
) -> dict:
    """Fit the quality classifier on an (already featurized) labeled frame
    via pyspark.ml LogisticRegression — unregularized, unstandardized, so
    the coefficients are the plain logistic MLE and apply directly to raw
    feature columns as literals (portable to SQL / any scorer).

    Returns {"intercept": float, "weights": {feature: coef}} — the exact
    shape score_quality consumes.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feature_cols = feature_cols or QUALITY_FEATURES
    asm = VectorAssembler(inputCols=feature_cols, outputCol="__fv")
    lr = LogisticRegression(
        featuresCol="__fv",
        labelCol=label_col,
        regParam=0.0,
        standardization=False,
        maxIter=max_iter,
        tol=tol,
    )
    m = lr.fit(asm.transform(df.select(label_col, *feature_cols)))
    return {
        "intercept": float(m.intercept),
        "weights": {
            c: float(w) for c, w in zip(feature_cols, m.coefficients.toArray())
        },
    }
