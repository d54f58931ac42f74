"""Mergeable distinct-count sketches (Apache DataSketches, JVM-side):
the incremental analytics layer a 100 TB pipeline needs on top of
``approx_count_distinct`` (q17), which answers one query but leaves
nothing behind.

Two capabilities the one-shot estimator can't provide:

- **Storable per-batch HLL sketches** (``distinct_sketches``): each
  corpus batch aggregates to a few-KB binary per group; sketches
  persist to parquet next to the batch. "Distinct tokens across all 40
  ingest runs" is then ``hll_union_agg`` over 40 tiny rows — NO rescan
  of 100 TB of history. DataSketches' documented merge guarantee is
  NO ERROR GROWTH: the union's estimate stays within the single
  sketch's error bound (not bit-identity — HLL_4 offset re-encoding
  and the HIP-vs-composite estimator shift the low digits; pinned
  within 2% by probe and tests).
  Reference analogue: the per-database row-count accounting
  the loader keeps per release (``Database.pm`` summaries), made
  mergeable across releases.

- **Set algebra without joins** (``corpus_overlap_estimate``): theta
  sketches estimate |A∩B| / |A∪B| / Jaccard between two corpora from
  one aggregate per side — the "how much does the new crawl overlap
  the old one" question. Exact answer costs a distinct-join shuffle of
  both corpora; the sketch costs two scans and a constant-size merge.

Everything stays in whole-stage codegen (built-in JVM aggregates, no
Python). Estimates are DETERMINISTIC functions of the input SET
(xxhash-based, order- and layout-independent), so contract booleans
(relative-error bounds, merge agreement) are stable across runs and
partitionings — DuckDB can't reproduce the sketch values themselves,
so probes gate exact quantities exactly and sketch quantities by
TRUE-declaring contracts (the established pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Per-group storable HLL sketch of distinct ``value_col`` plus its
    estimate: ``group_cols + (hll_sketch binary, distinct_est bigint)``.
    Write the sketch column to parquet with the batch; later batches
    union via ``merge_distinct_sketches`` instead of rescanning."""
    sk = F.hll_sketch_agg(F.col(value_col), F.lit(int(lg_k)))
    return df.groupBy(*group_cols).agg(
        sk.alias("hll_sketch"),
        F.hll_sketch_estimate(sk).alias("distinct_est"),
    )


def merge_distinct_sketches(
    sketches: DataFrame,
    group_cols: tuple[str, ...] = (),
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Union stored sketches and estimate. With empty ``group_cols``,
    one global row.

    What merging guarantees (and what it doesn't): the union's
    estimate carries the same error bound as a single sketch built
    over the concatenated input — merging never grows the error — but
    it is NOT bit-identical to a direct build: a fresh sketch reports
    the HIP (historical inverse probability) estimate, which unions
    cannot preserve (they report the composite estimate), and HLL_4
    offset re-encoding shifts register bytes. Incremental-vs-one-shot
    agreement is therefore a tight bound (probe pins 2%), not
    equality."""
    merged = F.hll_union_agg(F.col(sketch_col))
    aggs = [
        merged.alias("hll_sketch"),
        F.hll_sketch_estimate(merged).alias("distinct_est"),
    ]
    return (
        sketches.groupBy(*group_cols).agg(*aggs) if group_cols else sketches.agg(*aggs)
    )


def corpus_overlap_estimate(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Theta-sketch set algebra between the distinct ``value_col`` sets
    of two corpora — one row: ``est_a, est_b, est_intersection,
    est_union, est_jaccard`` — from ONE aggregate per side and a 1x1
    merge. No distinct-join of the corpora ever happens."""
    lk = F.lit(int(lg_k))
    sa = df_a.agg(F.theta_sketch_agg(F.col(value_col), lk).alias("sa"))
    sb = df_b.agg(F.theta_sketch_agg(F.col(value_col), lk).alias("sb"))
    both = sa.crossJoin(sb)  # 1 row x 1 row
    inter = F.theta_sketch_estimate(F.theta_intersection("sa", "sb"))
    union = F.theta_sketch_estimate(F.theta_union("sa", "sb"))
    return both.select(
        F.theta_sketch_estimate(F.col("sa")).alias("est_a"),
        F.theta_sketch_estimate(F.col("sb")).alias("est_b"),
        inter.alias("est_intersection"),
        union.alias("est_union"),
        (inter / F.greatest(union, F.lit(1))).alias("est_jaccard"),
    )
