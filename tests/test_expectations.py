"""Declarative expectation suite: every rule kind exercised with known
violation counts on a synthetic frame, plus referential checks, gate
semantics, approx-unique tolerance, and the guard paths."""

from __future__ import annotations

import pytest

from ensembl_database_loader_spark.operators.expectations import (
    assert_expectations,
    expect_in_range,
    expect_mean_between,
    expect_not_null,
    expect_referential,
    expect_regex,
    expect_row_count,
    expect_unique,
    expect_values_in,
    run_expectations,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        # id, status, score, fk
        (1, "ok", 10.0, 100),
        (2, "ok", 20.0, 101),
        (2, "bad", 30.0, 102),      # duplicate id; 'bad' not accepted
        (3, None, -5.0, None),      # null status; score below range; null fk ok
        (4, "ok", 200.0, 999),      # score above range; dangling fk
        (None, "ok", 40.0, 100),    # null id (excluded from unique)
    ]
    return spark.createDataFrame(
        rows, "id int, status string, score double, fk int"
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [(100, "a"), (101, "b"), (102, "c")], "key int, label string"
    )


def _by_rule(report):
    return {r["rule"]: r for r in report.collect()}


def test_every_rule_kind(frame, dim):
    report = run_expectations(
        frame,
        [
            expect_not_null("id"),
            expect_unique("id"),
            expect_in_range("score", 0.0, 100.0),
            expect_values_in("status", ["ok", "pending"]),
            expect_regex("status", "^[a-z]+$"),
            expect_row_count(2, 10),
            expect_mean_between("score", 0.0, 100.0),
            expect_referential("fk", "dim", "key"),
        ],
        refs={"dim": dim},
    )
    assert report.columns == [
        "rule", "kind", "column", "violations", "observed", "passed",
    ]
    by = _by_rule(report)
    assert len(by) == 8

    assert by["not_null:id"]["violations"] == 1
    assert not by["not_null:id"]["passed"]

    # 5 non-null ids, 4 distinct -> surplus 1
    assert by["unique:id"]["violations"] == 1
    assert by["unique:id"]["observed"] == "4"
    assert not by["unique:id"]["passed"]

    assert by["in_range:score"]["violations"] == 2  # -5 and 200

    assert by["values_in:status"]["violations"] == 1  # 'bad'
    assert by["regex:status"]["violations"] == 0
    assert by["regex:status"]["passed"]

    assert by["row_count"]["violations"] == 0
    assert by["row_count"]["observed"] == "6"
    assert by["row_count"]["passed"]

    # mean(10,20,30,-5,200,40) = 49.1666... -> within band
    assert by["mean:score"]["observed"] == "49.1667"
    assert by["mean:score"]["passed"]

    # fk=999 dangles; null fk is NOT a violation
    assert by["fk:fk->dim.key"]["violations"] == 1
    assert not by["fk:fk->dim.key"]["passed"]


def test_multi_column_unique_and_row_count_bounds(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (None, "a")], "k int, s string"
    )
    by = _by_rule(
        run_expectations(
            df,
            [
                expect_unique("k", "s"),
                expect_row_count(10),            # under by 6
                expect_row_count(1, 2, name="rc_hi"),  # over by 2
            ],
        )
    )
    # 3 fully-non-null keys, 2 distinct pairs -> surplus 1
    assert by["unique:k,s"]["violations"] == 1
    assert by["unique:k,s"]["column"] == "k,s"
    assert by["row_count"]["violations"] == 6
    assert not by["row_count"]["passed"]
    assert by["rc_hi"]["violations"] == 2


def test_approx_unique_tolerance(spark):
    # 1000 distinct keys, zero real duplicates: the HLL band must not
    # produce a spurious failure.
    df = spark.range(1000).selectExpr("id AS k")
    by = _by_rule(
        run_expectations(df, [expect_unique("k")], approx=True)
    )
    assert by["unique:k"]["passed"]


def test_gate_raises_with_failing_rules_listed(frame):
    with pytest.raises(AssertionError, match="not_null:id"):
        assert_expectations(frame, [expect_not_null("id")])
    ok = assert_expectations(frame, [expect_row_count(1)])
    assert ok.count() == 1


def test_guards(frame, dim):
    with pytest.raises(ValueError, match="unknown column"):
        run_expectations(frame, [expect_not_null("nope")])
    with pytest.raises(ValueError, match="unknown column"):
        run_expectations(frame, [expect_unique("id", "nope")])
    with pytest.raises(ValueError, match="not in refs"):
        run_expectations(frame, [expect_referential("fk", "dim", "key")])
    with pytest.raises(ValueError, match="duplicate rule name"):
        run_expectations(
            frame, [expect_not_null("id"), expect_not_null("id")]
        )
    with pytest.raises(ValueError, match="at least one column"):
        expect_unique()


def test_single_pass_plan(frame):
    """All non-referential rules ride ONE aggregate over the input —
    the plan contains exactly one scan of the source."""
    report = run_expectations(
        frame,
        [
            expect_not_null("id"),
            expect_in_range("score", 0.0, 100.0),
            expect_values_in("status", ["ok"]),
            expect_regex("status", "^o"),
            expect_row_count(1),
            expect_mean_between("score", 0.0, 100.0),
        ],
    )
    plan = report._jdf.queryExecution().optimizedPlan().toString()
    # one LocalRelation/scan feeding one Aggregate; no union of scans
    assert plan.count("Aggregate") == 1


def test_report_counts_equal_row_tags_property(spark):
    """For every ROW-decidable rule, the suite report's violation count
    must equal the number of rows tag_violations marks — across a
    randomized grid of frames (hypothesis-lite: seeded exhaustive
    variants, kept deterministic for CI)."""
    import random

    from pyspark.sql import functions as F

    from ensembl_database_loader_spark.operators.expectations import (
        expect_in_range,
        expect_regex,
        expect_not_null,
        expect_values_in,
        run_expectations,
        tag_violations,
    )

    rng = random.Random(42)
    for trial in range(6):
        rows = [
            (
                rng.choice([None, rng.randint(-5, 30)]),
                rng.choice([None, "ok", "bad", "zz9", "Al"]),
            )
            for _ in range(rng.randint(1, 60))
        ]
        df = spark.createDataFrame(rows, "x int, s string")
        suite = [
            expect_not_null("x"),
            expect_in_range("x", 0, 20),
            expect_values_in("s", ["ok", "bad"]),
            expect_regex("s", "^[a-z]+$"),
        ]
        report = {
            r["rule"]: r["violations"]
            for r in run_expectations(df, suite).collect()
        }
        tagged = tag_violations(df, suite)
        tag_counts = {
            r["v"]: r["cnt"]
            for r in tagged.select(F.explode("violations").alias("v"))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        for e in suite:
            assert report[e.name] == tag_counts.get(e.name, 0), (
                trial, e.name, rows,
            )
