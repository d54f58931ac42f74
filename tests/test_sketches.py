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


def test_corpus_sketch_store_accumulates_across_runs(spark, tmp_path):
    """The incremental corpus-accounting flow: one sketch row appended
    per curation run; cumulative distinct-token estimate from the tiny
    rows only, within the sketch bound of the exact cross-batch
    distinct count."""
    from ensembl_database_loader_spark.functions.text import tokens as tok_fn
    from ensembl_database_loader_spark.pipeline.curate import (
        corpus_distinct_stats,
        write_corpus_sketch,
    )

    store = str(tmp_path / "store")
    b1 = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha tok"), F.col("id").cast("string"), F.lit(" beta")).alias("text"),
    )
    b2 = spark.range(400, 1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha tok"), F.col("id").cast("string"), F.lit(" gamma")).alias("text"),
    )
    write_corpus_sketch(b1, store, "run1")
    write_corpus_sketch(b2, store, "run2")
    row = corpus_distinct_stats(spark, store).collect()[0]
    assert row.n_batches == 2
    assert row.n_docs == 1000
    assert row.n_tokens == 3000
    exact = (
        b1.unionByName(b2)
        .select(F.explode(tok_fn("text")).alias("w"))
        .agg(F.countDistinct("w"))
        .collect()[0][0]
    )  # 1000 unique tokN + alpha/beta/gamma = 1003
    assert exact == 1003
    assert abs(row.distinct_tokens_est - exact) / exact < 0.05


def test_corpus_sketch_store_records_empty_batches(spark, tmp_path):
    """An empty curation batch still lands one accounting row (null
    sketch, zero counts) — runs are never silently missing from the
    store."""
    from ensembl_database_loader_spark.pipeline.curate import (
        corpus_distinct_stats,
        write_corpus_sketch,
    )

    store = str(tmp_path / "store")
    full = spark.createDataFrame([(1, "alpha beta")], "doc_id bigint, text string")
    empty = full.limit(0)
    write_corpus_sketch(full, store, "run1")
    write_corpus_sketch(empty, store, "run2")
    row = corpus_distinct_stats(spark, store).collect()[0]
    assert row.n_batches == 2  # the empty run is still accounted
    assert row.n_docs == 1 and row.n_tokens == 2
    assert row.distinct_tokens_est == 2
