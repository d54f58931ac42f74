"""Distributed as-of join (nearest-timestamp lookup per key).

Spark has no ASOF JOIN operator (DuckDB/Pandas do). The naive
translation — a range join ``l.ts >= r.ts`` + row_number to keep the
nearest — is a quadratic-per-key BroadcastNestedLoop/SortMergeJoin
explosion at scale. The distributed-native formulation used here is
UNION + WINDOW: tag both sides, union them, sort each key group once
by (time, side) and carry the last-seen right payload forward with
``last(..., ignorenulls=True)``. One shuffle on the key, zero join
nodes, linear work per key group, and whole-stage-codegen'd window
evaluation. This is an extension beyond the reference inventory
(SURVEY.md §2 has no temporal join); it exists because event-stream
enrichment at 100 TB needs it.

Tie semantics match DuckDB ``ASOF JOIN ... ON l.k = r.k AND l.ts >=
r.ts``: a right row at exactly ``l.ts`` is eligible (side ordering
puts right rows before left rows within equal timestamps).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    suffix: str = "_r",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``on`` <= left's (direction='backward') or the least ``on`` >=
    left's (direction='forward'), within the same ``by`` key group.

    Returns all left columns plus ``on + suffix`` (the matched right
    timestamp) and each of ``value_cols`` renamed with ``suffix``;
    unmatched left rows keep nulls, like a left join. If
    ``tolerance_seconds`` is set, matches farther than that are
    nulled out (the nearest candidate is by construction the only
    one that could be within tolerance).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c != on and c not in by]
    matched = [on + suffix] + [c + suffix for c in value_cols]

    l2 = left.withColumn("_side", F.lit(1))
    r2 = right.select(
        *by,
        F.col(on),
        F.col(on).alias(on + suffix),
        *[F.col(c).alias(c + suffix) for c in value_cols],
    ).withColumn("_side", F.lit(0))
    u = l2.unionByName(r2, allowMissingColumns=True)

    t = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(t, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in matched:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1).drop("_side")

    if tolerance_seconds is not None:
        gap = F.abs(
            F.col(on).cast("double") - F.col(on + suffix).cast("double")
        )
        keep = F.col(on + suffix).isNotNull() & (gap <= F.lit(tolerance_seconds))
        for c in matched:
            out = out.withColumn(c, F.when(keep, F.col(c)))
    return out
