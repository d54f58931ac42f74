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
from pyspark.sql import types as T

#: dtypes that can feed percentile()/percentile_approx() directly.
_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(
    df: DataFrame,
    cols: tuple[str, ...] | None = None,
    exact: bool = False,
    quantiles: tuple[float, ...] | None = None,
) -> DataFrame:
    """One row per column: ``(column, n_rows, n_nulls, n_distinct,
    min_val, max_val)`` with min/max rendered as strings (so one long
    frame carries every dtype). ONE aggregate pass however many
    columns are profiled.

    ``quantiles`` adds a ``quantiles: array<double>`` column holding
    the requested points per NUMERIC column (null for non-numeric),
    still in the same single pass — exact ``percentile`` when
    ``exact=True``, mergeable ``percentile_approx`` (GK sketch,
    partial-aggregated like HLL++) otherwise. Values are rounded to 4
    decimals so they gate cleanly. A wide-spread quantile profile is
    the input skew detection wants: a p99/p50 ratio threshold on a key
    column decides whether a downstream join needs
    ``operators.skew.salted_join``.
    """
    cols = tuple(cols) if cols is not None else tuple(df.columns)
    unknown = [c for c in cols if c not in df.columns]
    if unknown:
        raise ValueError(
            f"profile_columns: unknown column(s) {unknown!r}; "
            f"frame has {list(df.columns)!r}"
        )
    if quantiles is not None:
        bad = [q for q in quantiles if not (0.0 <= q <= 1.0)]
        if bad:
            raise ValueError(f"profile_columns: quantile points must be in [0, 1], got {bad!r}")
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
    dtypes = {name: f.dataType for name, f in zip(df.columns, df.schema.fields)}
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(cols):
        src = F.col(f"__c{idx[c]}")
        aggs += [
            F.count(F.when(src.isNull(), 1)).alias(f"__n_{i}"),
            distinct(src).cast("bigint").alias(f"__d_{i}"),
            F.min(src).cast("string").alias(f"__mn_{i}"),
            F.max(src).cast("string").alias(f"__mx_{i}"),
        ]
        if quantiles is not None:
            if isinstance(dtypes[c], _NUMERIC):
                pct = F.percentile if exact else F.percentile_approx
                q = pct(src, F.array(*[F.lit(float(p)) for p in quantiles]))
                aggs.append(
                    F.transform(q, lambda v: F.round(v.cast("double"), 4)).alias(f"__q_{i}")
                )
            else:
                aggs.append(
                    F.lit(None).cast("array<double>").alias(f"__q_{i}")
                )
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
                *([F.col(f"__q_{i}").alias("quantiles")] if quantiles is not None else []),
            )
            for i, c in enumerate(cols)
        ]
    )
    out_cols = ["p.column", "n_rows", "p.n_nulls", "p.n_distinct", "p.min_val", "p.max_val"]
    if quantiles is not None:
        out_cols.append("p.quantiles")
    return row.select(
        F.col("__rows").alias("n_rows"), F.explode(entries).alias("p")
    ).select(*out_cols)
