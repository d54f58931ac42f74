"""Snapshot merge (MERGE INTO for a plain-parquet lake): apply a
change batch — updates, inserts, deletes — to the current table
snapshot and produce the next snapshot.

The reference maintains its mirror by dropping and re-loading whole
databases (``Database.pm`` drop/create); at 100 TB the incremental
form is this upsert: rows in the batch replace same-key rows in the
snapshot, rows flagged on the tombstone column delete, everything
else carries over.

Scale shape: ONE left-anti join keyed on the merge key (the batch
side is the small side of a typical CDC merge — broadcast when it
fits, shuffle-hash otherwise; Spark/AQE picks per stats) plus a
union. No window, no full rewrite logic in the plan — and when the
snapshot is written with hive-style partitioning, pair this with
``spark.sql.sources.partitionOverwriteMode=dynamic`` so only the
partitions the batch touches are rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_snapshot(
    snapshot: DataFrame,
    batch: DataFrame,
    key_cols: tuple[str, ...],
    tombstone_col: str | None = None,
) -> DataFrame:
    """Next snapshot = (snapshot rows whose key is NOT in the batch)
    UNION (batch rows not flagged deleted). A key that appears in the
    batch therefore always takes the batch's version; a tombstoned key
    vanishes. The batch must carry at most one row per key (enforce
    upstream — CDC compaction — or the duplicate survives verbatim).

    Batch rows with a NULL merge key are DROPPED: a null key can never
    match the anti-join (equality, not null-safe), so such a row would
    otherwise append on every run — N merge cycles, N duplicate
    null-key rows — while replacing nothing. Null-key rows already in
    the snapshot carry over untouched."""
    keys = list(key_cols)
    for k in keys:
        batch = batch.filter(F.col(k).isNotNull())
    carried = snapshot.join(batch.select(*keys), keys, "left_anti")
    if tombstone_col is not None:
        live = batch.filter(
            ~F.coalesce(F.col(tombstone_col), F.lit(False))
        ).drop(tombstone_col)
    else:
        live = batch
    return carried.unionByName(live)


def scd2_merge(
    history: DataFrame | None,
    batch: DataFrame,
    key_cols: tuple[str, ...],
    tracked_cols: tuple[str, ...],
    version: int,
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge: fold a FULL dimension
    snapshot (``batch``, at most one row per key) into a versioned
    history that keeps every past value — the audit-grade dimension a
    warehouse joins facts against "as of" any load. History schema:
    ``key_cols + tracked_cols + (valid_from bigint, valid_to bigint)``
    with ``valid_to`` NULL on current rows.

    Semantics per key (full-snapshot feed — absence means deletion):
    - new key            -> open a row  (valid_from=version, valid_to=null)
    - present, unchanged -> current row carries over untouched
    - present, changed   -> close the current row (valid_to=version)
                            AND open the new version
    - absent from batch  -> close the current row (a deletion)
    Already-closed rows always carry over verbatim. ``version`` must be
    strictly greater than every version in the history (load-cycle
    numbers / epoch days — caller-supplied so replays are explicit).

    Scale shape: ONE full-outer join of the CURRENT slice onto the
    batch, keyed on the dimension key (dimension-sized, not
    fact-sized), plus unions; the closed slice passes through with no
    shuffle at all. Change detection is null-safe equality over
    ``tracked_cols`` (a value flipping to/from NULL is a change).

    Deterministic and engine-exact: versions are integers and the
    branch taken per key is a pure function of the two rows, so the
    DuckDB oracle replays it row for row."""
    keys, tracked = list(key_cols), list(tracked_cols)
    cols = keys + tracked
    b = batch.select(*cols)
    for k in keys:
        b = b.filter(F.col(k).isNotNull())  # the merge_snapshot rationale
    if history is None:
        return b.select(
            *cols,
            F.lit(int(version)).cast("bigint").alias("valid_from"),
            F.lit(None).cast("bigint").alias("valid_to"),
        )
    closed = history.where(F.col("valid_to").isNotNull())
    current = history.where(F.col("valid_to").isNull())

    cur = current.select(
        *[F.col(c).alias(f"_h_{c}") for c in cols], "valid_from"
    )
    # plain equality on keys: both sides are null-key-free (batch
    # filtered above; history rows all came from filtered batches)
    cond = None
    for k in keys:
        c = F.col(f"_h_{k}") == F.col(f"_b_{k}")
        cond = c if cond is None else (cond & c)
    j = cur.join(
        b.select(*[F.col(c).alias(f"_b_{c}") for c in cols]),
        cond,
        "full_outer",
    )
    in_hist = F.col(f"_h_{keys[0]}").isNotNull()
    in_batch = F.col(f"_b_{keys[0]}").isNotNull()
    unchanged = in_hist & in_batch
    for c in tracked:
        unchanged = unchanged & F.col(f"_h_{c}").eqNullSafe(F.col(f"_b_{c}"))
    v = F.lit(int(version)).cast("bigint")

    carried_current = j.where(unchanged).select(
        *[F.col(f"_h_{c}").alias(c) for c in cols],
        F.col("valid_from"),
        F.lit(None).cast("bigint").alias("valid_to"),
    )
    closed_now = j.where(in_hist & ~unchanged).select(
        *[F.col(f"_h_{c}").alias(c) for c in cols],
        F.col("valid_from"),
        v.alias("valid_to"),
    )
    opened = j.where(in_batch & ~unchanged).select(
        *[F.col(f"_b_{c}").alias(c) for c in cols],
        v.alias("valid_from"),
        F.lit(None).cast("bigint").alias("valid_to"),
    )
    return (
        closed.select(*cols, "valid_from", "valid_to")
        .unionByName(carried_current)
        .unionByName(closed_now)
        .unionByName(opened)
    )


def scd2_as_of(history: DataFrame, version: int) -> DataFrame:
    """The dimension exactly as it stood after load ``version``:
    rows with ``valid_from <= version`` and ``valid_to`` null or
    ``> version`` — a plain filter, no window."""
    v = int(version)
    return history.where(
        (F.col("valid_from") <= v)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > v))
    ).drop("valid_from", "valid_to")
