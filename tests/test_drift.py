"""PSI drift detection (operators/drift.py): exact equality with a
pure-python reference, the no-drift zero contract, null-bin and
new-category handling, and guards."""

from __future__ import annotations

import math

import pytest

from ensembl_database_loader_spark.operators.drift import psi_drift


def _psi_reference(ref_bins, cur_bins, s=0.5):
    keys = set(ref_bins) | set(cur_bins)
    n_ref, n_cur, b = sum(ref_bins.values()), sum(cur_bins.values()), len(keys)
    psi = 0.0
    for k in keys:
        pr = (ref_bins.get(k, 0) + s) / (n_ref + s * b)
        pc = (cur_bins.get(k, 0) + s) / (n_cur + s * b)
        psi += (pc - pr) * math.log(pc / pr)
    return round(psi, 6)


def _bin(x, mn, mx, bins=10):
    if x is None:
        return "__null__"
    if mn == mx:
        return "b000"
    return "b%03d" % min(bins - 1, max(0, math.floor((x - mn) * bins / (mx - mn))))


def test_identical_snapshots_zero_psi(spark):
    df = spark.createDataFrame(
        [(float(i), "c%d" % (i % 3)) for i in range(100)], "x double, c string"
    )
    out = {r.column: r for r in psi_drift(df, df, ("x",), ("c",)).collect()}
    assert out["x"].psi == 0.0
    assert out["c"].psi == 0.0
    assert out["c"].n_bins == 3
    assert out["x"].n_ref == out["x"].n_cur == 100


def test_numeric_shift_matches_reference_and_detects(spark):
    ref_vals = [float(i % 50) for i in range(200)]
    cur_vals = [float(i % 50) + 30.0 for i in range(200)]  # shifted right
    ref = spark.createDataFrame([(v,) for v in ref_vals], "x double")
    cur = spark.createDataFrame([(v,) for v in cur_vals], "x double")
    got = psi_drift(ref, cur, ("x",)).collect()[0]
    mn, mx = min(ref_vals), max(ref_vals)
    rb, cb = {}, {}
    for v in ref_vals:
        rb[_bin(v, mn, mx)] = rb.get(_bin(v, mn, mx), 0) + 1
    for v in cur_vals:
        cb[_bin(v, mn, mx)] = cb.get(_bin(v, mn, mx), 0) + 1
    assert got.psi == _psi_reference(rb, cb)
    assert got.psi > 0.2  # a 60% shift is a drift alarm


def test_null_spike_and_new_category_drift(spark):
    ref = spark.createDataFrame([("a",)] * 90 + [("b",)] * 10, "c string")
    cur = spark.createDataFrame(
        [("a",)] * 50 + [(None,)] * 30 + [("z",)] * 20, "c string"
    )
    got = psi_drift(ref, cur, cat_cols=("c",)).collect()[0]
    rb = {"a": 90, "b": 10}
    cb = {"a": 50, "__null__": 30, "z": 20}
    assert got.psi == _psi_reference(rb, cb)
    assert got.n_bins == 4  # a, b, z, null
    assert got.psi > 0.2


def test_degenerate_reference_and_guards(spark):
    ref = spark.createDataFrame([(5.0,)] * 20, "x double")
    cur = spark.createDataFrame([(5.0,)] * 10 + [(9.0,)] * 10, "x double")
    got = psi_drift(ref, cur, ("x",)).collect()[0]
    # mn == mx: every non-null lands in b000 on both sides -> the only
    # signal left is... none (clamped), so psi is 0
    assert got.n_bins == 1
    assert got.psi == 0.0
    with pytest.raises(ValueError, match="no columns"):
        psi_drift(ref, cur)
    with pytest.raises(ValueError, match="missing from cur"):
        psi_drift(ref, cur.selectExpr("x AS y"), ("x",))
    with pytest.raises(ValueError, match="bins"):
        psi_drift(ref, cur, ("x",), bins=1)


def test_single_scan_per_snapshot(spark, sf_dir):
    """However many columns are monitored, each snapshot is scanned
    once (melt + one aggregate) — no per-column jobs."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ref = o.where("o_orderkey % 2 = 0")
    cur = o.where("o_orderkey % 2 = 1")
    rep = psi_drift(
        ref, cur, ("o_totalprice", "o_custkey"), ("o_orderpriority",)
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation") <= 3  # ref scan, cur scan, edges agg reuse
    rows = rep.collect()
    assert len(rows) == 3 and all(r.psi is not None for r in rows)
