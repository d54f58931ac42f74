"""Unit tests for the distributed as-of join (union+window, no join
node): tie inclusivity, direction, tolerance, left-join null
semantics, and plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ensembl_database_loader_spark.operators.asof import asof_join


def _t(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _t(5), "a"), (1, _t(10), "b"), (2, _t(3), "c"), (3, _t(7), "d")],
        "k int, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _t(5), 100.0), (1, _t(9), 200.0), (2, _t(4), 300.0)],
        "k int, ts timestamp, v double",
    )
    return left, right


def test_backward_inclusive_ties_and_nulls(spark):
    left, right = _frames(spark)
    out = {
        r.name: r.v_r
        for r in asof_join(left, right, on="ts", by=["k"]).collect()
    }
    # a: right row at exactly ts=5 is eligible (>= semantics)
    # b: nearest prior is ts=9; c: no right <= ts=3 -> null (left join)
    # d: key 3 has no right rows at all -> null
    assert out == {"a": 100.0, "b": 200.0, "c": None, "d": None}


def test_forward_direction(spark):
    left, right = _frames(spark)
    out = {
        r.name: r.v_r
        for r in asof_join(left, right, on="ts", by=["k"], direction="forward").collect()
    }
    # a: ts=5 matches itself (inclusive); b: nothing at/after ts=10
    # c: next at ts=4 for key 2; d: no rows for key 3
    assert out == {"a": 100.0, "b": None, "c": 300.0, "d": None}


def test_tolerance_nulls_far_matches(spark):
    left, right = _frames(spark)
    out = {
        r.name: (r.v_r, r.ts_r)
        for r in asof_join(
            left, right, on="ts", by=["k"], tolerance_seconds=1.0
        ).collect()
    }
    # b's nearest prior (ts=9) is 1s away -> kept; a is 0s away -> kept;
    # nothing else matches within 1s.
    assert out["a"] == (100.0, _t(5))
    assert out["b"] == (200.0, _t(9))
    assert out["c"] == (None, None)


def test_no_join_node_in_plan(spark):
    left, right = _frames(spark)
    plan = asof_join(left, right, on="ts", by=["k"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union+window, not a range join
    assert "Window" in plan


def test_matches_sql_asof_semantics_on_events(spark):
    """Cross-check against an independent Spark formulation (range join
    + row_number keep-nearest) on real events data."""
    from ensembl_database_loader_spark.catalog import table
    from pyspark.sql import Window

    e = table(spark, "/root/testdata/sf0.001", "events")
    l = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    r = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event"),
    )
    ranged = (
        l.join(r, (l.user_id == r.r_user) & (l.ts >= F.col("r_ts")), "left")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_id").orderBy(F.desc_nulls_last("r_ts"))
            ),
        )
        .filter("rn = 1")
    )
    expect = {(x.event_id, x.r_event) for x in ranged.collect()}
    got = {
        (x.event_id, x.event_id_r)
        for x in asof_join(
            l, e.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id"),
            on="ts", by=["user_id"], value_cols=["event_id"],
        ).collect()
    }
    assert len(expect) > 0
    assert got == expect
