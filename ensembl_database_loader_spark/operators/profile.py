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
    # Hostile column names (quotes/backticks/dots) break EVERY named
    # reference — even df[name] and df[index] round-trip through the
    # attribute-name parser. toDF is a pure positional rename, so the
    # aggregation runs over safe names and the ORIGINAL name only ever
    # appears as a string literal in the output. First position wins
    # for duplicate names.
    idx = {}
    for i, name in enumerate(df.columns):
        idx.setdefault(name, i)
    work = df.toDF(*[f"__c{i}" for i in range(len(df.columns))])
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(cols):
        src = F.col(f"__c{idx[c]}")
        aggs += [
            F.count(F.when(src.isNull(), 1)).alias(f"__n_{i}"),
            distinct(src).cast("bigint").alias(f"__d_{i}"),
            F.min(src).cast("string").alias(f"__mn_{i}"),
            F.max(src).cast("string").alias(f"__mx_{i}"),
        ]
    row = work.agg(*aggs)
    # one struct per column, exploded into long format (pure projection)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n_{i}").alias("n_nulls"),
                F.col(f"__d_{i}").alias("n_distinct"),
                F.col(f"__mn_{i}").alias("min_val"),
                F.col(f"__mx_{i}").alias("max_val"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return row.select(
        F.col("__rows").alias("n_rows"), F.explode(entries).alias("p")
    ).select(
        "p.column", "n_rows", "p.n_nulls", "p.n_distinct", "p.min_val", "p.max_val"
    )
