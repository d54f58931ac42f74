"""Event analytics operators (operators/events.py) vs pure-Python
references, including tie/edge cases, plus plan-shape gates."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ensembl_database_loader_spark.operators.events import (
    conversion_funnel,
    sessionize,
)


def _py_sessions(rows, gap):
    """rows: (user, ts, tie). Returns {(user, tie): sess}."""
    out = {}
    by_user = {}
    for u, ts, tb in rows:
        by_user.setdefault(u, []).append((ts, tb))
    for u, evs in by_user.items():
        evs.sort()
        sess, prev = 0, None
        for ts, tb in evs:
            if prev is None or ts - prev > gap:
                sess += 1
            out[(u, tb)] = sess
            prev = ts
    return out


def _py_funnel(rows, steps, within):
    """rows: (user, type, ts, tie). Returns {user: (s1..sN)}."""
    by_user = {}
    for u, ty, ts, tb in rows:
        by_user.setdefault(u, []).append((ts, tb, ty))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        firsts = [None] * len(steps)
        done = [0] * len(steps)
        for ts, _tb, ty in evs:
            for i, step in enumerate(steps):
                if ty != step:
                    continue
                if i == 0:
                    ok = True
                else:
                    prev = firsts[i - 1]
                    ok = (
                        prev is not None
                        and ts > prev
                        and (within is None or ts <= prev + within)
                    )
                if ok:
                    done[i] = 1
                    if firsts[i] is None or ts < firsts[i]:
                        firsts[i] = ts
        out[u] = tuple(done)
    return out


def test_sessionize_matches_python_reference_with_ties(spark):
    rng = random.Random(42)
    rows = []
    tb = 0
    for u in range(20):
        t = 0
        for _ in range(rng.randint(1, 40)):
            t += rng.choice([0, 1, 5, 100, 1000])  # includes exact ties
            rows.append((u, t, tb))
            tb += 1
    df = spark.createDataFrame(rows, "u bigint, ts bigint, tb bigint")
    got = {
        (r.u, r.tb): r.sess
        for r in sessionize(df, "u", "ts", "tb", gap_us=50).collect()
    }
    assert got == _py_sessions(rows, 50)
    # layout independence
    got2 = {
        (r.u, r.tb): r.sess
        for r in sessionize(df.repartition(13), "u", "ts", "tb", gap_us=50).collect()
    }
    assert got2 == got


def test_conversion_funnel_matches_python_reference(spark):
    rng = random.Random(7)
    steps = ("a", "b", "c")
    rows = []
    tb = 0
    for u in range(40):
        t = 0
        for _ in range(rng.randint(1, 30)):
            t += rng.choice([0, 1, 10, 200])
            rows.append((u, rng.choice(["a", "b", "c", "x"]), t, tb))
            tb += 1
    df = spark.createDataFrame(rows, "u bigint, ty string, ts bigint, tb bigint")
    for within in (None, 50):
        got = {
            r.u: (r.s1, r.s2, r.s3)
            for r in conversion_funnel(
                df, "u", "ty", "ts", "tb", steps, step_within_us=within
            ).collect()
        }
        assert got == _py_funnel(rows, steps, within), within


def test_funnel_strictness_and_single_shuffle(spark):
    # same-instant step-2 must NOT advance the funnel
    rows = [(1, "a", 10, 0), (1, "b", 10, 1), (1, "b", 11, 2), (1, "c", 12, 3)]
    df = spark.createDataFrame(rows, "u bigint, ty string, ts bigint, tb bigint")
    r = conversion_funnel(df, "u", "ty", "ts", "tb", ("a", "b", "c")).collect()[0]
    assert (r.s1, r.s2, r.s3) == (1, 1, 1)  # the ts=11 'b' qualifies
    r2 = conversion_funnel(
        df.filter(F.col("tb") != 2), "u", "ty", "ts", "tb", ("a", "b", "c")
    ).collect()[0]
    assert (r2.s1, r2.s2, r2.s3) == (1, 0, 0)  # only the tied 'b' left
    # N-step funnel is still ONE shuffle + one sort
    plan = (
        conversion_funnel(df, "u", "ty", "ts", "tb", ("a", "b", "c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort [") == 1


def test_events_operators_reject_column_collisions(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, "a", 10, 0, 9)], "u bigint, ty string, ts bigint, tb bigint, sess bigint"
    )
    with pytest.raises(ValueError, match="sess"):
        sessionize(df, "u", "ts", "tb", gap_us=5)
    df2 = df.withColumnRenamed("sess", "__cf_q0")
    with pytest.raises(ValueError, match="clash"):
        conversion_funnel(df2, "u", "ty", "ts", "tb", ("a",))


def test_cohort_retention_triangle(spark):
    """Hand-built retention: users u1/u2 join week 0, u3 joins week 1;
    u1 returns weeks 1 and 2, u2 never returns, u3 returns week 2."""
    from ensembl_database_loader_spark.operators.events import cohort_retention

    wk = 7 * 86_400_000_000
    rows = [
        ("u1", 0), ("u1", wk), ("u1", 2 * wk),
        ("u2", 100),
        ("u3", wk + 5), ("u3", 2 * wk + 5),
    ]
    df = spark.createDataFrame(rows, "user_id string, tsu bigint").select(
        "user_id", F.timestamp_micros("tsu").alias("ts")
    )
    got = {
        (r.cohort, r.offset): r.n_users
        for r in cohort_retention(df, "user_id", "ts").collect()
    }
    assert got == {
        (0, 0): 2,  # u1, u2
        (0, 1): 1,  # u1
        (0, 2): 1,  # u1
        (1, 0): 1,  # u3
        (1, 1): 1,  # u3
    }
    # plan: exactly two exchanges (user hash for the window, cell hash
    # for the aggregate) — no log-sized join
    plan = (
        cohort_retention(df, "user_id", "ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 3  # 2 + possible AQE final coalesce
    assert "Join" not in plan
