"""Mergeable distinct sketches (operators/sketches.py): storable HLL
batch sketches, union error bounds, theta set algebra."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ensembl_database_loader_spark.operators.sketches import (
    corpus_overlap_estimate,
    distinct_sketches,
    merge_distinct_sketches,
)


def _vals(spark, lo, hi, group="g"):
    return spark.range(lo, hi).select(
        F.col("id").cast("string").alias("w"), F.lit(group).alias("g")
    )


def test_hll_incremental_store_matches_one_shot_within_bound(spark):
    """The incremental flow a 100 TB pipeline runs: per-batch sketches
    written to parquet, later unioned WITHOUT rescanning the batches —
    estimate within the sketch error bound of both the one-shot union
    estimate and the exact count."""
    b1, b2 = _vals(spark, 0, 30_000), _vals(spark, 20_000, 60_000)  # overlap
    store = tempfile.mkdtemp(prefix="hll_store_") + "/sketches"
    distinct_sketches(b1, ("g",), "w").write.mode("overwrite").parquet(store)
    distinct_sketches(b2, ("g",), "w").write.mode("append").parquet(store)

    est = merge_distinct_sketches(
        spark.read.parquet(store), ("g",)
    ).collect()[0].distinct_est
    one_shot = merge_distinct_sketches(
        distinct_sketches(b1.unionByName(b2), ("g",), "w")
    ).collect()[0].distinct_est
    exact = 60_000
    assert abs(est - exact) / exact < 0.05
    assert abs(est - one_shot) / one_shot < 0.02  # no error growth on merge


def test_hll_estimates_deterministic_and_layout_independent(spark):
    df = _vals(spark, 0, 50_000)
    a = merge_distinct_sketches(distinct_sketches(df, ("g",), "w")).collect()[0]
    b = merge_distinct_sketches(
        distinct_sketches(df.repartition(17), ("g",), "w")
    ).collect()[0]
    assert a.distinct_est == b.distinct_est  # set function, not layout function


def test_theta_overlap_no_join_estimates(spark):
    a = _vals(spark, 0, 40_000)
    b = _vals(spark, 30_000, 70_000)
    row = corpus_overlap_estimate(a, b, "w", lg_k=14).collect()[0]
    assert abs(row.est_a - 40_000) / 40_000 < 0.05
    assert abs(row.est_b - 40_000) / 40_000 < 0.05
    assert abs(row.est_intersection - 10_000) / 10_000 < 0.12
    assert abs(row.est_union - 70_000) / 70_000 < 0.05
    exact_j = 10_000 / 70_000
    assert abs(row.est_jaccard - exact_j) <= 0.03
    # plan shape: no join of the two corpora — one 1x1 cartesian only
    plan = corpus_overlap_estimate(a, b, "w")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
