"""Trained quality classifier (operators/classifier.py): codegen
features, MLlib LBFGS training, JSON-model codegen serving."""

from __future__ import annotations

import json
import math

import pytest
from pyspark.sql import functions as F

from ensembl_database_loader_spark.operators.classifier import (
    QUALITY_FEATURES,
    filter_by_quality,
    quality_features,
    score_quality,
    train_quality_classifier,
)


def _labeled(spark, n=400):
    """Separable synthetic: y = 1 iff at least two of the three
    indicator features fire (the heuristic-label planting the probe
    uses on the documents fixture)."""
    good = "the quick brown fox jumps over the lazy dog and runs far away " * 4
    short = "tiny text"
    dup = "spam spam spam spam spam spam spam spam spam spam " * 6
    rows = []
    for i in range(n):
        rows.append((i, (good, short, dup)[i % 3]))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_features_are_nullsafe_and_complete(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "hello world of words")],
        "doc_id bigint, text string",
    )
    out = quality_features(df).collect()
    for r in out:
        for c in QUALITY_FEATURES:
            v = r[c]
            assert v is not None and not math.isnan(v), (r.doc_id, c, v)


def test_train_score_filter_roundtrip(spark):
    d = quality_features(_labeled(spark))
    d = d.withColumn(
        "y",
        (
            F.col("f_len_in_bounds") + F.col("f_diversity_ok") + F.col("f_mtl_ok")
            >= 2
        ).cast("double"),
    )
    model = train_quality_classifier(d, "y")
    # the model is plain data: JSON round-trips
    model2 = json.loads(json.dumps(model))
    scored = score_quality(d, model2)
    # separable labeling -> the learned boundary reproduces it exactly
    wrong = scored.filter(
        ((F.col("quality_prob") >= 0.5).cast("int")) != F.col("y").cast("int")
    ).count()
    assert wrong == 0
    # codegen score equals a hand-computed sigmoid on one row
    row = scored.select(*model["features"], "quality_prob").first()
    z = model["intercept"] + sum(
        model["coef"][c] * row[c] for c in model["features"]
    )
    assert abs(row["quality_prob"] - 1.0 / (1.0 + math.exp(-z))) < 1e-9
    # filter keeps exactly the positives at the natural threshold
    kept = filter_by_quality(d, model2, 0.5).count()
    assert kept == d.filter(F.col("y") == 1.0).count()


def test_score_is_pure_codegen(spark):
    """The serving path must stay JVM-side: no python UDF / BatchEval
    nodes in the scored plan."""
    d = quality_features(_labeled(spark, 30))
    model = {
        "intercept": -1.5,
        "coef": {c: 1.0 for c in QUALITY_FEATURES},
        "features": list(QUALITY_FEATURES),
    }
    plan = score_quality(d, model)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_guards(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="quality_features first"):
        train_quality_classifier(df, "doc_id")
    with pytest.raises(ValueError, match="quality_features first"):
        score_quality(df, {"intercept": 0.0, "coef": {}, "features": ["f_len_log"]})
