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
