"""Distributed table integrity: compare two 100 TB tables by
exchanging a few hundred rows.

The reference verifies FILE integrity before loading — a full-outer
join of expected vs computed BSD-sum16 checksums per dump file
(`LoadFiles.pm:171-199`, re-expressed in `sources/mysql_dump.py`).
This module is the ROW-LEVEL, post-load analogue: did the mirror
actually end up byte-identical to the source? Re-reading both sides
into one engine and anti-joining 100 TB against 100 TB shuffles
everything twice; instead each side independently reduces to a tiny
order-independent summary (one row per hash bucket) and only the
summaries travel.

Design:

- Row fingerprint: ``xxhash64`` over ALL columns in sorted-name order
  — null-safe, type-sensitive, whole-stage-codegen (no Python). Column
  ORDER is canonicalized so logically-equal tables with different
  physical layouts agree.
- Bucket: ``pmod(fp, n_buckets)``. Per bucket three order-independent
  aggregates: row count, modular SUM of fingerprints, and bit-XOR of
  fingerprints. Any single row/cell difference flips all three; the
  sum+xor pair also catches multiset edits XOR alone is blind to
  (duplicate row A twice, drop B) and vice versa — a simultaneous
  collision of count AND sum AND xor requires engineered input.
- Sum overflow: fingerprints fold to [0, 2^32) before summing, so the
  per-bucket bigint sum is exact (no wrap) up to 2^31 rows per bucket
  — at 100 TB pick ``n_buckets`` so buckets stay under that (the
  default 1024 holds to ~2 quadrillion rows).
- Drill-down: when summaries disagree, only the mismatched buckets'
  rows are re-read (map-side fingerprint filter pushed to both scans)
  and diffed with multiset semantics (``exceptAll``) — the expensive
  row-level compare touches 1/n_buckets of the data per bad bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FOLD = 2**32


def _fingerprint(df: DataFrame) -> tuple[DataFrame, list[str]]:
    cols = sorted(df.columns)
    fp = F.xxhash64(*[F.col(c) for c in cols])
    return df.withColumn("_fp", fp), cols


def table_checksum(df: DataFrame, n_buckets: int = 1024) -> DataFrame:
    """Order- and layout-independent content checksum of a table:
    one row per hash bucket with ``(bucket, n_rows, sum_fp, xor_fp)``.
    Equal tables (as multisets of rows, regardless of row order,
    column order, partitioning, or file layout) produce identical
    checksum frames; any differing row lands in some bucket and flips
    its aggregates. One scan, one n_buckets-row shuffle."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    with_fp, _ = _fingerprint(df)
    return (
        with_fp.groupBy(F.pmod("_fp", F.lit(n_buckets)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.pmod("_fp", F.lit(_FOLD))).alias("sum_fp"),
            F.bit_xor("_fp").alias("xor_fp"),
        )
    )


def checksum_mismatches(a: DataFrame, b: DataFrame, n_buckets: int = 1024) -> DataFrame:
    """Buckets where two tables' checksums disagree: full-outer join
    of the two tiny summary frames (a bucket missing on one side is a
    mismatch too). Empty result == tables are multiset-equal up to
    fingerprint collision. Returns ``(bucket, a_n_rows, b_n_rows)``."""
    ca = table_checksum(a, n_buckets).alias("a")
    cb = table_checksum(b, n_buckets).alias("b")
    j = ca.join(cb, F.col("a.bucket") == F.col("b.bucket"), "full_outer")
    differ = (
        F.col("a.bucket").isNull()
        | F.col("b.bucket").isNull()
        | (F.col("a.n_rows") != F.col("b.n_rows"))
        | (F.col("a.sum_fp") != F.col("b.sum_fp"))
        | (F.col("a.xor_fp") != F.col("b.xor_fp"))
    )
    return j.filter(differ).select(
        F.coalesce(F.col("a.bucket"), F.col("b.bucket")).alias("bucket"),
        F.coalesce(F.col("a.n_rows"), F.lit(0)).alias("a_n_rows"),
        F.coalesce(F.col("b.n_rows"), F.lit(0)).alias("b_n_rows"),
    )


def checksum_diff_rows(
    a: DataFrame, b: DataFrame, n_buckets: int = 1024
) -> DataFrame:
    """Row-level drill-down: the exact rows that differ between two
    tables, MULTISET semantics (a row present twice in ``a`` but once
    in ``b`` is reported once). Two stages: (1) the n_buckets-row
    summary compare names the bad buckets (tiny collect), (2) both
    sides re-scan with a map-side ``pmod(fp, n) IN (bad)`` filter —
    only mismatched buckets' rows reach the exceptAll — and diff both
    directions. Returns ``side ('a'|'b') + the table's columns``;
    empty == equal. Column sets must match (checked)."""
    if sorted(a.columns) != sorted(b.columns):
        raise ValueError(
            f"column sets differ: {sorted(a.columns)} vs {sorted(b.columns)}"
        )
    bad = [r.bucket for r in checksum_mismatches(a, b, n_buckets).collect()]
    cols = sorted(a.columns)
    if not bad:
        return a.select(F.lit("a").alias("side"), *cols).limit(0)
    # when most buckets differ the filter prunes nothing — skip the
    # giant isin() literal and diff the whole tables directly
    prune = len(bad) <= n_buckets // 2

    def slice_(df: DataFrame) -> DataFrame:
        if not prune:
            return df.select(*cols)
        with_fp, _ = _fingerprint(df)
        return (
            with_fp.filter(F.pmod("_fp", F.lit(n_buckets)).isin(bad))
            .select(*cols)
        )

    sa, sb = slice_(a), slice_(b)
    only_a = sa.exceptAll(sb).select(F.lit("a").alias("side"), *cols)
    only_b = sb.exceptAll(sa).select(F.lit("b").alias("side"), *cols)
    return only_a.unionByName(only_b)


def snapshot_checksum(
    spark, table_path: str, version: int | None = None, n_buckets: int = 1024
) -> DataFrame:
    """``table_checksum`` of a manifest table's pinned snapshot — the
    integrity layer meeting the commit layer. The operational check
    this enables: after ``compact_table`` / Z-order clustering (which
    rewrite every byte but must preserve content) compare the new
    head's checksum against the pre-maintenance version's — both
    snapshots stay readable until vacuum, so the verification needs no
    saved state, just the two version numbers. A multiset difference
    (lost/duplicated rows in a rewrite) flips some bucket row."""
    from ensembl_database_loader_spark.sinks.manifest import snapshot

    return table_checksum(snapshot(spark, table_path, version=version), n_buckets)


def join_fanout_profile(
    left: DataFrame,
    right: DataFrame,
    keys: tuple[str, ...],
) -> DataFrame:
    """Pre-flight profile of an equi-join: per-side row counts, key
    multiplicities, and the EXACT output cardinality the join would
    produce (``sum over shared keys of left_mult * right_mult``) —
    computed from two partial-aggregated key-count frames and one
    keys-sized join, i.e. at distinct-key cost instead of running the
    join. The guard a 100 TB pipeline runs before a join it believes
    is 1:N — an unexpected M:N (duplicate dimension rows, a bad merge
    key) multiplies output by the product of the duplicates and is
    the classic fan-out incident.

    One row: ``(n_left, n_right, n_keys_left, n_keys_right,
    n_keys_both, max_left_mult, max_right_mult, max_pair_fanout,
    est_output_rows)`` — all BIGINT, engine-exact. Null keys never join
    (SQL equality) and are excluded from multiplicities."""
    ks = list(keys)
    if not ks:
        raise ValueError("join_fanout_profile: at least one key required")

    def counts(df: DataFrame, side: str) -> DataFrame:
        d = df
        for k in ks:
            d = d.where(F.col(k).isNotNull())
        return d.groupBy(*ks).agg(
            F.count(F.lit(1)).cast("bigint").alias(f"c_{side}")
        )

    lc, rc = counts(left, "l"), counts(right, "r")
    both = lc.join(rc, ks)
    pair = both.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys_both"),
        F.max(F.col("c_l") * F.col("c_r")).cast("bigint").alias("max_pair_fanout"),
        F.sum(F.col("c_l") * F.col("c_r")).cast("bigint").alias("est_output_rows"),
    )
    ltot = lc.agg(
        F.sum("c_l").cast("bigint").alias("n_left"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys_left"),
        F.max("c_l").cast("bigint").alias("max_left_mult"),
    )
    rtot = rc.agg(
        F.sum("c_r").cast("bigint").alias("n_right"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys_right"),
        F.max("c_r").cast("bigint").alias("max_right_mult"),
    )
    return (
        ltot.crossJoin(rtot)
        .crossJoin(pair)
        .select(
            "n_left", "n_right", "n_keys_left", "n_keys_right",
            "n_keys_both", "max_left_mult", "max_right_mult",
            F.coalesce("max_pair_fanout", F.lit(0)).alias("max_pair_fanout"),
            F.coalesce("est_output_rows", F.lit(0)).alias("est_output_rows"),
        )
    )


def assert_join_safe(
    left: DataFrame,
    right: DataFrame,
    keys: tuple[str, ...],
    max_fanout: int = 1,
    max_blowup: float = 1.5,
) -> dict:
    """Gate form: raise if any single key pair would fan out more than
    ``max_fanout`` rows, or the join output would exceed ``max_blowup
    * max(n_left, n_right)``. Returns the profile as a dict when safe
    (one tiny collect — the profile is a single row)."""
    row = join_fanout_profile(left, right, keys).collect()[0].asDict()
    limit = max_blowup * max(row["n_left"], row["n_right"])
    if row["max_pair_fanout"] > max_fanout or row["est_output_rows"] > limit:
        raise AssertionError(
            f"join on {list(keys)} is unsafe: max pair fanout "
            f"{row['max_pair_fanout']} (allowed {max_fanout}), estimated "
            f"output {row['est_output_rows']} rows (allowed {limit:.0f}): {row}"
        )
    return row
