"""Binned interval-overlap join tests (operators/intervals.py): exact
equivalence with the naive theta join on a randomized fixture, one-row-
per-pair emission across bin boundaries, negative/zero-crossing
coordinates, left-outer padding, and the hash-join (no cartesian /
nested-loop) plan gate that is the operator's whole reason to exist."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ensembl_database_loader_spark.operators.intervals import (
    interval_join,
    point_in_interval_join,
)


def _mk(spark, rows, name):
    return spark.createDataFrame(rows, f"{name}_id bigint, k bigint, s bigint, e bigint")


def _naive(lrows, rrows, by_key=True):
    out = set()
    for lid, lk, ls, le in lrows:
        if ls is None or le is None:
            continue
        for rid, rk, rs, re_ in rrows:
            if rs is None or re_ is None:
                continue
            if by_key and lk != rk:
                continue
            if ls <= re_ and rs <= le:
                out.add((lid, rid))
    return out


def test_matches_naive_theta_join_randomized(spark):
    rng = random.Random(7)
    lrows, rrows = [], []
    for i in range(300):
        s = rng.randint(-5000, 5000)
        lrows.append((i, rng.randint(0, 3), s, s + rng.randint(0, 800)))
    for j in range(300):
        s = rng.randint(-5000, 5000)
        rrows.append((j, rng.randint(0, 3), s, s + rng.randint(0, 800)))
    left, right = _mk(spark, lrows, "a"), _mk(spark, rrows, "b")
    for w in (10, 250, 1000, 10_000):  # correctness must not depend on w
        got = interval_join(
            left, right, left_start="s", left_end="e",
            right_start="s", right_end="e", by=("k",), bin_width=w,
        ).select("l_a_id", "r_b_id").collect()
        pairs = [(r.l_a_id, r.r_b_id) for r in got]
        assert len(pairs) == len(set(pairs)), f"duplicate pairs at w={w}"
        assert set(pairs) == _naive(lrows, rrows), f"wrong pair set at w={w}"


def test_no_by_key_and_wide_spans(spark):
    # intervals far wider than the bin width: many bins each, still one
    # output row per overlapping pair; no key columns at all
    lrows = [(1, 0, 0, 10_000), (2, 0, 20_000, 30_000)]
    rrows = [(1, 0, 9_999, 25_000), (2, 0, -100, -1)]
    got = interval_join(
        _mk(spark, lrows, "a"), _mk(spark, rrows, "b"),
        left_start="s", left_end="e", right_start="s", right_end="e",
        bin_width=100,
    ).select("l_a_id", "r_b_id").collect()
    pairs = sorted((r.l_a_id, r.r_b_id) for r in got)
    assert pairs == [(1, 1), (2, 1)]  # exactly once each, r2 matches nobody


def test_left_outer_pads_unmatched_and_null_intervals(spark):
    lrows = [(1, 0, 0, 10), (2, 0, 100, 110), (3, 0, None, 5)]
    rrows = [(7, 0, 5, 6)]
    got = interval_join(
        _mk(spark, lrows, "a"), _mk(spark, rrows, "b"),
        left_start="s", left_end="e", right_start="s", right_end="e",
        by=("k",), bin_width=16, how="left",
    ).collect()
    by_left = {r.l_a_id: r for r in got}
    assert len(got) == 3
    assert by_left[1].r_b_id == 7
    assert by_left[2].r_b_id is None and by_left[2].r_s is None
    assert by_left[3].r_b_id is None  # null interval -> never matches


def test_point_in_interval_and_plan_is_hash_join(spark):
    pts = spark.createDataFrame(
        [(i, i * 37 % 1000) for i in range(200)], "p_id bigint, pos bigint"
    )
    iv = _mk(spark, [(j, 0, j * 50, j * 50 + 120) for j in range(20)], "b")
    out = point_in_interval_join(
        pts.withColumn("k", F.lit(0)), iv,
        point="pos", start="s", end="e", by=("k",), bin_width=64,
    )
    rows = [(r.l_p_id, r.r_b_id) for r in out.collect()]
    expect = {
        (p, j)
        for p in range(200)
        for j in range(20)
        if j * 50 <= (p * 37 % 1000) <= j * 50 + 120
    }
    assert set(rows) == expect and len(rows) == len(set(rows))
    # the reason this operator exists: the physical plan must be an
    # equi (hash/SMJ) join on the bin key — never BNLJ/cartesian
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_guards(spark):
    df = _mk(spark, [(1, 0, 0, 1)], "a")
    with pytest.raises(ValueError, match="bin_width"):
        interval_join(df, df, left_start="s", left_end="e",
                      right_start="s", right_end="e", bin_width=0)
    with pytest.raises(ValueError, match="columns"):
        interval_join(df, df, left_start="nope", left_end="e",
                      right_start="s", right_end="e")
    with pytest.raises(ValueError, match="how"):
        interval_join(df, df, left_start="s", left_end="e",
                      right_start="s", right_end="e", how="full")
    with pytest.raises(ValueError, match="prefix"):
        interval_join(df, df, left_start="s", left_end="e",
                      right_start="s", right_end="e",
                      left_prefix="x_", right_prefix="x_")
