"""Incremental serving-index synchronization from a manifest source.

A curation wave lands on the corpus table as ordinary lake commits
(append / ``delete_rows`` / ``update_rows``); the serving indexes built
from that corpus — the ANN index (``build_ann_index(manifest=True)``)
and the BM25 postings index (``build_bm25_index``) — must follow
WITHOUT a rebuild: at 100 TB a rebuild re-scans and re-writes the
whole index to account for one wave's delta. ``sync_ann_index`` /
``sync_bm25_index`` consume the source's row-level change feed
(``sinks.manifest.row_changes`` — O(changed files), never O(table))
and apply exactly the delta: victims delete via the indexes' id-bloom
copy-on-write paths, new/updated rows append through the indexes' own
builders, so a synced index stays ROW-IDENTICAL to one rebuilt from
the target snapshot (same centroids / same exact-integer corpus
stats; gated in tests).

Exactly-once protocol (at most two index commits per wave):

1. ENTRY GUARDS, cheapest first: the index head's txn watermark for
   app ``edls-sync`` already >= ``to_version`` (a finished wave
   replayed), or the persisted sync state already >= ``to_version``.
   Either → no-op before any Spark work.
2. DELETE commit: the change feed's delete side (deletes + update
   preimages) leaves the index via ``delete_from_*_index`` — stats
   decrement / cell scoping included. Carries NO sync state.
3. WATERMARK commit: the insert side (inserts + update postimages,
   possibly EMPTY for a delete-only wave) appends with
   ``txn=("edls-sync", to_version)`` and the sync state
   ``{"sync": {"src", "version"}}`` merged into the property map
   ATOMICALLY with the rows it accounts for.

Crash between 2 and 3, rerun: the guards fail open, the re-run delete
matches nothing (the rows already left) and commits nothing, the
watermark commit lands — converged. Crash after 3, rerun: guard 1
no-ops. Stats-bearing writers to one index must be serialized (the
standing single-maintainer contract from ``append_to_bm25_index``);
the txn watermark covers replay of the SAME wave, not two independent
concurrent syncers.

Reference analogue: the loader reloads exactly the databases a release
changed, never the whole mirror (``LoadFiles.pm:56-64``); here the
unit is one curation commit's files instead of one database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SYNC_APP = "edls-sync"


def _resolve_window(
    spark: SparkSession,
    index_path: str,
    src_path: str,
    from_version: int | None,
    to_version: int | None,
) -> tuple[int | None, int, dict]:
    """(from_v or None-if-noop, to_v, head props). Raises when the
    index has no sync state for ``src_path`` and no ``from_version``
    was given — the first sync must say which source version the
    index contents correspond to (the snapshot it was built from)."""
    from ensembl_database_loader_spark.sinks.manifest import (
        _txn_skip,
        latest_manifest,
        table_properties,
    )

    src_head = latest_manifest(spark, src_path)
    if src_head is None:
        raise ValueError(f"no manifest table at {src_path}")
    to_v = int(to_version if to_version is not None else src_head["version"])
    head = latest_manifest(spark, index_path)
    props = table_properties(spark, index_path)
    state = props.get("sync")
    if _txn_skip(head, (_SYNC_APP, to_v)):
        return None, to_v, props
    if state is not None and state.get("src") == src_path:
        if int(state["version"]) >= to_v:
            return None, to_v, props
        if from_version is None:
            from_version = int(state["version"])
    if from_version is None:
        raise ValueError(
            f"index at {index_path} has no sync state for {src_path!r} — "
            "pass from_version= the source version the index was built from"
        )
    if int(from_version) > to_v:
        raise ValueError(
            f"from_version {from_version} is newer than target {to_v}"
        )
    if int(from_version) == to_v:
        return None, to_v, props
    return int(from_version), to_v, props


def _noop(to_v: int) -> dict:
    return {
        "noop": True,
        "to_version": to_v,
        "deleted": 0,
        "appended": 0,
    }


def sync_ann_index(
    spark: SparkSession,
    index_path: str,
    src_path: str,
    from_version: int | None = None,
    to_version: int | None = None,
) -> dict:
    """Bring a manifest-backed ANN index up to date with its source
    table's version — appends, deletes, and updates all flow through
    as O(delta) index maintenance (module docstring has the protocol).

    The source must carry the index's id and vector columns (it is the
    table the index was built from). Update preimages ride the change
    feed so FLOAT-index deletes stay cell-scoped (the old vector's
    cell recomputes statelessly from the persisted centroids);
    quantized indexes delete by id stats + blooms as always. Appends
    encode through the index's own persisted centroids/codebooks, so
    synced rows are bit-identical to rebuilt ones (same-centroid
    rebuild gate in tests)."""
    from ensembl_database_loader_spark.operators.similarity import (
        append_to_ann_index,
        ann_index_meta,
        delete_from_ann_index,
    )
    from ensembl_database_loader_spark.sinks.manifest import (
        row_changes,
        snapshot,
    )

    meta = ann_index_meta(index_path, spark)
    if not meta.get("_manifest"):
        raise ValueError(
            f"index at {index_path} is bare parquet — sync needs the "
            "transaction layer (build_ann_index(..., manifest=True))"
        )
    from_v, to_v, _ = _resolve_window(
        spark, index_path, src_path, from_version, to_version
    )
    if from_v is None:
        return _noop(to_v)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    # appended rows must match the index's OWN schema: a float index
    # keeps every payload column the build frame carried (serving
    # returns them); a quantized index derives its stored codes from
    # (id, vec) inside append_to_ann_index
    if meta.get("quantized"):
        payload = [id_col, vec_col]
    else:
        idx_cols = snapshot(spark, index_path).columns
        payload = [c for c in idx_cols if c != "_cell"]
    changes = row_changes(
        spark, src_path, from_v, to_v, (id_col,), include_preimage=True
    ).persist()
    try:
        missing = sorted(set(payload) - set(changes.columns))
        if missing:
            raise ValueError(
                f"source {src_path} lacks index columns {missing} — sync "
                "needs the table the index was built from"
            )
        victims = changes.filter(
            F.col("change_type").isin("delete", "update_preimage")
        ).select(id_col, vec_col)
        arrivals = changes.filter(
            F.col("change_type").isin("insert", "update")
        ).select(*payload)
        deleted = delete_from_ann_index(spark, index_path, victims)
        n_add = arrivals.count()
        # the watermark commit: even an empty arrival side commits, so
        # the txn + sync state land atomically and a replay no-ops
        append_to_ann_index(
            arrivals,
            index_path,
            txn=(_SYNC_APP, to_v),
            extra_properties={"sync": {"src": src_path, "version": to_v}},
        )
    finally:
        changes.unpersist()
    return {
        "noop": False,
        "from_version": from_v,
        "to_version": to_v,
        "deleted": 0 if deleted is None else int(deleted["rows_affected"]),
        "appended": int(n_add),
    }


def sync_bm25_index(
    spark: SparkSession,
    index_path: str,
    src_path: str,
    from_version: int | None = None,
    to_version: int | None = None,
) -> dict:
    """Bring a BM25 postings index up to date with its source table —
    the lexical twin of ``sync_ann_index``. Victim docs leave via
    ``delete_from_bm25_index`` (id-bloom-pruned rewrite, exact-integer
    stats decrement — zero-token docs included via their sentinel
    postings), updated/new docs re-tokenize and append via
    ``append_to_bm25_index`` (stats advance in the same commit), so
    the synced index keeps serving ROW-IDENTICAL to a from-scratch
    rebuild on the target snapshot."""
    from ensembl_database_loader_spark.operators.bm25 import (
        append_to_bm25_index,
        delete_from_bm25_index,
    )
    from ensembl_database_loader_spark.sinks.manifest import (
        row_changes,
        table_properties,
    )

    meta = table_properties(spark, index_path).get("bm25")
    if not meta:
        raise ValueError(
            f"no bm25 index at {index_path} (missing properties)"
        )
    text_col = meta.get("text_col")
    if not text_col:
        raise ValueError(
            "bm25 index predates text_col metadata — rebuild with "
            "build_bm25_index to enable sync"
        )
    from_v, to_v, _ = _resolve_window(
        spark, index_path, src_path, from_version, to_version
    )
    if from_v is None:
        return _noop(to_v)
    id_col = meta["id_col"]
    changes = row_changes(
        spark, src_path, from_v, to_v, (id_col,)
    ).persist()
    try:
        # broadcast-dim by the delete API's contract: a curation
        # wave's victim list — shard wider waves into multiple syncs
        victim_ids = [
            r[0]
            for r in changes.filter(
                F.col("change_type").isin("delete", "update")
            )
            .select(id_col)
            .collect()
        ]
        arrivals = changes.filter(
            F.col("change_type").isin("insert", "update")
        ).select(id_col, text_col)
        deleted = delete_from_bm25_index(spark, index_path, victim_ids)
        n_add = arrivals.count()
        append_to_bm25_index(
            arrivals,
            text_col,
            index_path,
            txn=(_SYNC_APP, to_v),
            extra_properties={"sync": {"src": src_path, "version": to_v}},
        )
    finally:
        changes.unpersist()
    return {
        "noop": False,
        "from_version": from_v,
        "to_version": to_v,
        "deleted": len(victim_ids) if deleted is not None else 0,
        "appended": int(n_add),
    }
