"""Column profiling / data-quality summary: per-column null counts,
distinct counts, min/max — the accounting every ingest run wants
before committing a batch (reference analogue: the ``ANALYZE TABLE``
step after each bulk load, ``LoadFiles.pm`` — here surfaced as data
instead of optimizer state).

Scale shape: ALL requested columns are profiled in ONE aggregate pass
over the table — never a per-column job. With ``exact=False`` (the
default, right at 100 TB) distinct counts use approx_count_distinct
(HLL++, partial-aggregated, no Expand). ``exact=True`` computes exact
distincts; Spark plans multiple exact count-distincts as an Expand
(one input replica per distinct aggregate) — fine for probe-scale
parity, documented cost at corpus scale.

Output is LONG format — one row per column — so downstream gates
(null-rate thresholds, cardinality drift) are plain filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: tuple[str, ...] | None = None,
    exact: bool = False,
) -> DataFrame:
    """One row per column: ``(column, n_rows, n_nulls, n_distinct,
    min_val, max_val)`` with min/max rendered as strings (so one long
    frame carries every dtype). ONE aggregate pass however many
    columns are profiled."""
    cols = tuple(cols) if cols is not None else tuple(df.columns)
    distinct = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__n_{c}"),
            distinct(F.col(c)).cast("bigint").alias(f"__d_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    # stack the single wide row into long format (pure projection)
    stack_args = ", ".join(
        f"'{c}', `__n_{c}`, `__d_{c}`, `__mn_{c}`, `__mx_{c}`" for c in cols
    )
    return row.selectExpr(
        "__rows AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_nulls, n_distinct, min_val, max_val)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")
