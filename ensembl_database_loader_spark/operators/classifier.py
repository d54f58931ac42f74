"""Trained quality classification — the model-based filter step
(CCNet / fastText-classifier style) a pretraining pipeline runs after
the heuristic filters: learn which documents look like a curated
reference corpus, score every document, keep the confident ones.

Spark-first split of concerns:

- **Training** is MLlib logistic regression: distributed LBFGS whose
  per-iteration cost is ONE treeAggregate over a cached feature
  matrix — the gradient is partially aggregated map-side exactly like
  a SQL partial agg, so iterations scale with executors, not with a
  driver-side collect. Feature extraction is pure whole-stage-codegen
  column expressions (no UDF, no tokenizer crossing).
- **Serving** never touches MLlib: the fitted model is exported as a
  tiny JSON dict (intercept + per-feature coefficients) and applied as
  a generated ``sigmoid(b + w.x)`` column expression. At 100 TB the
  scoring pass is just another codegen projection — broadcastable
  model, no Python, no model object on executors, filter pushes down
  like any other predicate.

Reference analogue: the reference pipeline has no trained components —
its closest is the healthcheck-style validation modes
(``LoadDBs_conf.pm`` mode dispatch); this operator family is part of
the beyond-reference LLM-data surface, alongside the bigram-LM
perplexity filter (``operators/lm.py``) which it complements: the LM
filter scores fluency against a reference corpus, this scores
arbitrary labeled quality with a discriminative model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ensembl_database_loader_spark.functions.text import (
    mean_token_length,
    tokens,
)

#: The default interpretable feature set ``quality_features`` emits.
#: Deliberately built from the SAME signals as the heuristic
#: ``textstats.with_quality_score`` (length window, lexical diversity,
#: mean token length) plus continuous refinements, so a model trained
#: against any labeling derived from those heuristics is learnable by
#: construction, and a model trained against real human labels gets
#: the signals those heuristics approximate.
QUALITY_FEATURES = (
    "f_len_in_bounds",
    "f_diversity_ok",
    "f_mtl_ok",
    "f_len_log",
    "f_diversity",
    "f_mean_tok_len",
    "f_digit_ratio",
)


def quality_features(
    df: DataFrame,
    text_col: str = "text",
    min_chars: int = 100,
    max_chars: int = 400,
) -> DataFrame:
    """Add the ``QUALITY_FEATURES`` columns — all null-safe doubles,
    all single-pass codegen expressions over ``text_col`` (the one
    tokenization is shared by every feature that needs it)."""
    toks = tokens(text_col)
    n = F.length(F.coalesce(F.col(text_col), F.lit("")))
    n_toks = F.greatest(F.size(toks), F.lit(1))
    diversity = F.coalesce(
        F.size(F.array_distinct(toks)).cast("double") / n_toks, F.lit(0.0)
    )
    mtl = mean_token_length(toks)
    digits = F.length(
        F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), "[^0-9]", "")
    )
    return (
        df.withColumn(
            "f_len_in_bounds",
            F.when((n >= min_chars) & (n <= max_chars), 1.0).otherwise(0.0),
        )
        .withColumn(
            "f_diversity_ok", F.when(diversity >= 0.5, 1.0).otherwise(0.0)
        )
        .withColumn(
            "f_mtl_ok",
            F.when((mtl >= 3.0) & (mtl <= 10.0), 1.0).otherwise(0.0),
        )
        .withColumn("f_len_log", F.log1p(n.cast("double")))
        .withColumn("f_diversity", diversity)
        .withColumn("f_mean_tok_len", F.coalesce(mtl, F.lit(0.0)))
        .withColumn("f_digit_ratio", digits.cast("double") / F.greatest(n, F.lit(1)))
    )


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    feature_cols: tuple[str, ...] = QUALITY_FEATURES,
    max_iter: int = 50,
    reg: float = 0.01,
) -> dict:
    """Fit a logistic-regression quality model; return it as plain data.

    The returned dict — ``{"intercept": float, "coef": {col: float},
    "features": [...]}`` — is the ENTIRE model: JSON-serializable,
    versionable next to the corpus manifest, and consumed by
    ``score_quality`` as a codegen expression. MLlib's LBFGS runs one
    treeAggregate per iteration (map-side partial gradients), so
    training on a 1B-document feature frame is iterations x one
    aggregate scan, with nothing but the (|features|+1)-vector ever on
    the driver. ``reg`` (L2) keeps the solution finite on separable
    data; standardization is on, coefficients are returned on the
    original feature scale."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    missing = sorted(set(feature_cols) - set(df.columns))
    if missing:
        raise ValueError(
            f"feature columns {missing!r} not in frame — run quality_features first"
        )
    asm = VectorAssembler(
        inputCols=list(feature_cols), outputCol="__features", handleInvalid="keep"
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg,
        standardization=True,
    )
    prepped = asm.transform(
        df.select(*feature_cols, F.col(label_col).cast("double").alias(label_col))
    )
    model = lr.fit(prepped)
    return {
        "intercept": float(model.intercept),
        "coef": {c: float(w) for c, w in zip(feature_cols, model.coefficients)},
        "features": list(feature_cols),
    }


def quality_score_expr(model: dict) -> Column:
    """``sigmoid(intercept + sum(coef_i * f_i))`` as a pure column
    expression — the whole serving path, whole-stage-codegen."""
    z = F.lit(float(model["intercept"]))
    for c in model["features"]:
        z = z + F.lit(float(model["coef"][c])) * F.coalesce(
            F.col(c).cast("double"), F.lit(0.0)
        )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_quality(
    df: DataFrame, model: dict, out_col: str = "quality_prob"
) -> DataFrame:
    """Add the model's probability column. The frame must carry the
    model's feature columns (``quality_features``)."""
    missing = sorted(set(model["features"]) - set(df.columns))
    if missing:
        raise ValueError(
            f"feature columns {missing!r} not in frame — run quality_features first"
        )
    return df.withColumn(out_col, quality_score_expr(model))


def filter_by_quality(
    df: DataFrame, model: dict, threshold: float = 0.5
) -> DataFrame:
    """Keep documents the model scores at or above ``threshold`` —
    a codegen filter like any other predicate (pushes down past
    everything that doesn't touch the feature columns)."""
    return df.filter(quality_score_expr(model) >= threshold)
