"""Distributed EXACT continuous percentiles (quantile_cont semantics).

Spark's built-in ``percentile`` aggregate collects a per-group value
buffer and merges it on one reducer — at 600k rows it is already ~5×
slower than a shuffle aggregate, and at 100 TB it is a straight OOM.
This operator computes the same interpolated percentile from
VALUE COUNTS instead:

1. ``groupBy(value).count()`` — a partial-aggregated shuffle whose
   output is bounded by the number of DISTINCT values (prices, ratings,
   durations: typically orders of magnitude below row count);
2. a cumulative-count window ordered by value (partitioned by the
   group columns; for global percentiles the single-partition window
   runs over distinct values only, not rows);
3. the two straddling values per requested percentile picked by
   cumulative range, interpolated exactly like Spark ``percentile`` /
   DuckDB ``quantile_cont``: ``lo + (hi - lo) * frac`` at position
   ``(n-1)*p``.

The trade-off is explicit: this is the scale path when distinct values
are bounded; the built-in remains correct for unbounded-distinct data
small enough to buffer (and ``approx_percentile`` is the mergeable
sketch when neither holds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def percentile_cont(
    df: DataFrame,
    value_col: str,
    percentiles: dict[str, float],
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per group (one row total without groups) with a column
    per ``{alias: p}`` holding the exact interpolated percentile of
    ``value_col``. Nulls in ``value_col`` are ignored, matching the
    built-in aggregate."""
    gb = list(group_cols)
    c = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*gb, F.col(value_col).alias("_v"))
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w_cum = (
        Window.partitionBy(*gb)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_n = Window.partitionBy(*gb)
    c = c.withColumn("_cum", F.sum("_cnt").over(w_cum)).withColumn(
        "_n", F.sum("_cnt").over(w_n)
    )

    aggs = []
    combines = []
    for alias, p in percentiles.items():
        pos = (F.col("_n") - 1) * F.lit(float(p))
        lo_i, hi_i = F.floor(pos), F.ceil(pos)
        lo_row = ((F.col("_cum") - F.col("_cnt")) <= lo_i) & (lo_i < F.col("_cum"))
        hi_row = ((F.col("_cum") - F.col("_cnt")) <= hi_i) & (hi_i < F.col("_cum"))
        # Exactly one row per group matches each; sum() selects it.
        aggs.append(F.sum(F.when(lo_row, F.col("_v"))).alias(f"_{alias}_lo"))
        aggs.append(F.sum(F.when(hi_row, F.col("_v"))).alias(f"_{alias}_hi"))
        # frac is group-constant (depends only on n); max() selects it.
        aggs.append(F.max(pos - lo_i).alias(f"_{alias}_frac"))
        combines.append(
            # Same expression form as Spark percentile / DuckDB
            # quantile_cont: lo + (hi - lo) * frac — kept verbatim so
            # the float rounding matches bit-for-bit.
            (
                F.col(f"_{alias}_lo")
                + (F.col(f"_{alias}_hi") - F.col(f"_{alias}_lo"))
                * F.col(f"_{alias}_frac")
            ).alias(alias)
        )
    grouped = c.groupBy(*gb).agg(*aggs) if gb else c.agg(*aggs)
    return grouped.select(*gb, *combines)
