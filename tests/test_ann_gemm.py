"""The per-cell GEMM batch scorer (similarity._gemm_cell_scores via
ivf_topk_many_indexed(scorer='gemm')): row-identical to the codegen
pair-expression plan on float and int8 indexes, exclude_self parity,
and the plan gates (cogrouped Arrow exchange + cell-pruned scan)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ensembl_database_loader_spark.operators.similarity import (
    build_ann_index,
    ivf_topk_many_indexed,
)

DIM = 16
N_CLUSTERS = 8
PER_CLUSTER = 40


@pytest.fixture(scope="module")
def clustered(spark):
    rows = []
    for c in range(N_CLUSTERS):
        s = [math.sin(c * 23.7 + i * 1.91) for i in range(DIM)]
        n = math.sqrt(sum(x * x for x in s))
        s = [x / n for x in s]
        for j in range(PER_CLUSTER):
            noise = [
                (((c * 911 + j * 157 + i * 11) % 201) - 100) / 100.0 * 0.02
                for i in range(DIM)
            ]
            rows.append((j * N_CLUSTERS + c, [a + b for a, b in zip(s, noise)]))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).persist()


def _queries(clustered, n=6):
    return clustered.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


def _diff(a, b):
    return a.exceptAll(b).unionAll(b.exceptAll(a)).count()


@pytest.mark.parametrize("quantized", [False, True])
def test_gemm_row_identical_to_expr(spark, clustered, tmp_path, quantized):
    path = str(tmp_path / f"idx_{quantized}")
    build_ann_index(
        clustered, "vec_id", "embedding", path, n_cells=N_CLUSTERS,
        quantized=bool(quantized),
    )
    q = _queries(clustered)
    expr = ivf_topk_many_indexed(
        spark, path, q, "qid", "qvec", k=5, n_probe=2, exclude_self=True
    )
    gemm = ivf_topk_many_indexed(
        spark, path, q, "qid", "qvec", k=5, n_probe=2, exclude_self=True,
        scorer="gemm",
    )
    assert _diff(expr, gemm) == 0
    assert gemm.count() == 6 * 5


def test_gemm_keeps_self_when_not_excluded(spark, clustered, tmp_path):
    path = str(tmp_path / "idx_self")
    build_ann_index(clustered, "vec_id", "embedding", path, n_cells=N_CLUSTERS)
    q = _queries(clustered, n=3)
    gemm = ivf_topk_many_indexed(
        spark, path, q, "qid", "qvec", k=1, n_probe=2, scorer="gemm"
    )
    assert {(r.qid, r.vec_id) for r in gemm.collect()} == {
        (i, i) for i in range(3)
    }


def test_gemm_plan_cogroups_and_prunes(spark, clustered, tmp_path):
    path = str(tmp_path / "idx_plan")
    build_ann_index(clustered, "vec_id", "embedding", path, n_cells=N_CLUSTERS)
    q = _queries(clustered, n=2)
    gemm = ivf_topk_many_indexed(
        spark, path, q, "qid", "qvec", k=3, n_probe=2, scorer="gemm"
    )
    gemm.collect()
    plan = gemm._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    # the scan carries a partition filter over the probed cells only
    # (inputFiles() reports the pre-prune listing, so gate the plan)
    import re

    m = re.search(r"PartitionFilters: \[_cell#\d+ IN \(([\d,]+)\)", plan)
    assert m, f"no cell partition filter in plan:\n{plan[:2000]}"
    assert 0 < len(m.group(1).split(",")) < N_CLUSTERS


def test_bad_scorer_raises(spark, clustered, tmp_path):
    path = str(tmp_path / "idx_bad")
    build_ann_index(clustered, "vec_id", "embedding", path, n_cells=N_CLUSTERS)
    with pytest.raises(ValueError, match="scorer"):
        ivf_topk_many_indexed(
            spark, path, _queries(clustered, 2), "qid", "qvec", scorer="nope"
        )
