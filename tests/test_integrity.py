"""Distributed table integrity (operators/integrity.py): checksum
equality is layout-invariant; any row/cell/multiset difference is
detected and drill-down names the exact rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ensembl_database_loader_spark.operators.integrity import (
    checksum_diff_rows,
    checksum_mismatches,
    table_checksum,
)


def _tbl(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string")


def _cs(df, n=64):
    return sorted(
        (r.bucket, r.n_rows, r.sum_fp, r.xor_fp)
        for r in table_checksum(df, n).collect()
    )


def test_checksum_invariant_under_layout_and_column_order(spark):
    rows = [(i, f"v{i % 7}") for i in range(500)]
    a = _tbl(spark, rows).repartition(8)
    b = _tbl(spark, list(reversed(rows))).repartition(3)
    assert _cs(a) == _cs(b)
    # column order is canonicalized (sorted names)
    c = _tbl(spark, rows).select("v", "k")
    assert _cs(a) == _cs(c)
    assert checksum_mismatches(a, b, 64).count() == 0


def test_checksum_detects_single_cell_mutation(spark):
    rows = [(i, f"v{i}") for i in range(300)]
    a = _tbl(spark, rows)
    mutated = [(i, "vX" if i == 137 else f"v{i}") for i in range(300)]
    b = _tbl(spark, mutated)
    bad = checksum_mismatches(a, b, 64).collect()
    # the old and new row fingerprints land in <= 2 buckets
    assert 1 <= len(bad) <= 2
    d = checksum_diff_rows(a, b, 64).collect()
    assert {(r.side, r.k, r.v) for r in d} == {
        ("a", 137, "v137"),
        ("b", 137, "vX"),
    }


def test_checksum_detects_multiset_edit(spark):
    """Duplicate one row + drop another: counts per bucket may even
    agree, but sum+xor can't both — the case XOR alone misses."""
    rows = [(i, "x") for i in range(100)]
    a = _tbl(spark, rows)
    b = _tbl(spark, [r for r in rows if r[0] != 5] + [(7, "x")])
    assert checksum_mismatches(a, b, 4).count() >= 1
    d = checksum_diff_rows(a, b, 4).collect()
    got = sorted((r.side, r.k) for r in d)
    # multiset semantics: the extra (7, x) copy reports on side b once
    assert got == [("a", 5), ("b", 7)]


def test_checksum_missing_bucket_and_nulls(spark):
    a = spark.createDataFrame([(1, None), (2, "b")], "k bigint, v string")
    empty = a.limit(0)
    # every populated bucket mismatches against an empty table
    assert checksum_mismatches(a, empty, 8).count() == a.select(
        F.pmod(F.xxhash64("k", "v"), F.lit(8))
    ).distinct().count()
    # null cells fingerprint deterministically
    assert _cs(a, 8) == _cs(a.repartition(2), 8)


def test_checksum_diff_rows_empty_when_equal(spark):
    a = _tbl(spark, [(i, "z") for i in range(50)])
    out = checksum_diff_rows(a, a.repartition(5), 16)
    assert out.count() == 0
    assert out.columns == ["side", "k", "v"]


def test_checksum_guards(spark):
    a = _tbl(spark, [(1, "a")])
    with pytest.raises(ValueError, match="n_buckets"):
        table_checksum(a, 0)
    with pytest.raises(ValueError, match="column sets differ"):
        checksum_diff_rows(a, a.select(F.col("k").alias("kk"), "v"))


def test_snapshot_checksum_pins_maintenance_rewrites(spark, tmp_path):
    """Compaction and Z-order rewrite every file but must preserve the
    multiset of rows — checksum(head) == checksum(pre-version); a
    row-level DELETE must change it."""
    from ensembl_database_loader_spark.operators.integrity import (
        snapshot_checksum,
    )
    from ensembl_database_loader_spark.sinks import manifest as M

    tbl = str(tmp_path / "tbl")
    df = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("v")
    )
    M.write_table(df.repartition(8), tbl, stats_cols=("k",))
    v0 = M.latest_manifest(spark, tbl)["version"]

    def cs(version=None):
        return sorted(
            tuple(r) for r in snapshot_checksum(spark, tbl, version).collect()
        )

    M.compact_table(spark, tbl, sort_cols=("k",))
    assert cs() == cs(v0)  # rewrite preserved content exactly

    M.delete_rows(spark, tbl, prune=[("k", "=", 137)])
    assert cs() != cs(v0)  # a real content change is visible


def test_join_fanout_profile_exact_and_gate(spark):
    """Profile equals the actual join's cardinality on an M:N case;
    the gate passes 1:N and rejects M:N / blowup; null keys excluded."""
    import pytest

    from ensembl_database_loader_spark.operators.integrity import (
        assert_join_safe,
        join_fanout_profile,
    )

    left = spark.createDataFrame(
        [(1, "a")] * 3 + [(2, "b")] * 2 + [(3, "c")] + [(None, "n")],
        "k int, v string",
    )
    right = spark.createDataFrame(
        [(1, "x")] * 2 + [(2, "y")] + [(4, "z")] + [(None, "m")] * 5,
        "k int, w string",
    )
    prof = join_fanout_profile(left, right, ("k",)).collect()[0]
    actual = left.join(right, "k").count()
    assert prof.est_output_rows == actual == 3 * 2 + 2 * 1
    assert prof.max_pair_fanout == 6
    assert (prof.n_left, prof.n_right) == (6, 4)  # null-key rows excluded
    assert (prof.n_keys_left, prof.n_keys_right, prof.n_keys_both) == (3, 3, 2)
    assert (prof.max_left_mult, prof.max_right_mult) == (3, 2)

    # 1:N against a unique dimension passes
    dim = spark.createDataFrame([(1, "d1"), (2, "d2"), (3, "d3")], "k int, d string")
    ok = assert_join_safe(left, dim, ("k",), max_fanout=3, max_blowup=1.5)
    assert ok["est_output_rows"] == 6
    # the M:N explodes past the fanout gate
    with pytest.raises(AssertionError, match="unsafe"):
        assert_join_safe(left, right, ("k",), max_fanout=3)
    with pytest.raises(ValueError, match="at least one key"):
        join_fanout_profile(left, right, ())


def test_join_fanout_disjoint_keys(spark):
    from ensembl_database_loader_spark.operators.integrity import (
        join_fanout_profile,
    )

    a = spark.createDataFrame([(1,), (2,)], "k int")
    b = spark.createDataFrame([(3,), (4,)], "k int")
    prof = join_fanout_profile(a, b, ("k",)).collect()[0]
    assert prof.n_keys_both == 0
    assert prof.est_output_rows == 0 and prof.max_pair_fanout == 0
