"""Cross-table atomic commits: a catalog root that publishes a GROUP of
manifest-table versions in one atomic rename — so a pipeline writing
several related tables per cycle (the streaming gate's good/quarantine/
report trio, a fact + its rollup, dimension + history) exposes either
ALL of a cycle's tables or NONE of it to readers who resolve the root.

Design (one level up from sinks/manifest.py, reusing its commit loop):
- each member table is a NORMAL manifest table under ``root/<rel>`` —
  all single-table operators (scan_table, compact, time travel) keep
  working on it;
- ``commit_group`` writes the member tables first (their per-table
  heads advance immediately — invisible to group readers), then
  publishes ``root/_catalog/_manifest-<n>.json`` recording the exact
  per-table versions, via the same optimistic rename loop single-table
  commits use (single-file rename IS the atomicity);
- ``read_group`` resolves ONE root version and reads every member at
  its PINNED version (``manifest.snapshot(version=...)``) — a reader
  that resolved the root before a later cycle still sees a complete,
  mutually consistent set, the multi-table twin of the single-table
  pinned-reader guarantee;
- exactly-once: the group txn watermark lives at the ROOT. A replayed
  cycle whose txn is already recorded publishes nothing and (because
  the watermark is checked FIRST) rewrites no member table. A crash
  between member writes and root publication leaves stray per-table
  versions that no root references — invisible to group readers, and
  the replay repairs the cycle end-to-end (document: group tables are
  read through ``read_group``; per-table heads may run ahead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ensembl_database_loader_spark.sinks.manifest import (
    _commit,
    latest_manifest,
    read_manifest,
    snapshot,
    write_table,
)


def _catalog_path(root: str) -> str:
    return f"{root.rstrip('/')}/_catalog"


def _txn_done(head: dict | None, txn: tuple[str, int] | None) -> bool:
    if head is None or txn is None:
        return False
    app, ver = txn
    return int(head.get("txn", {}).get(str(app), -1)) >= int(ver)


def _version_for_txn(
    spark: SparkSession, path: str, txn: tuple[str, int] | None
) -> int:
    """The FIRST table version whose txn watermark covers ``txn`` —
    where a crashed cycle's member write actually landed."""
    from ensembl_database_loader_spark.sinks.manifest import list_manifests

    if txn is None:  # pragma: no cover — write_table never skips without txn
        raise RuntimeError(f"member write at {path} skipped without a txn")
    app, ver = str(txn[0]), int(txn[1])
    for v in list_manifests(spark, path):
        m = read_manifest(spark, path, v)
        if int(m.get("txn", {}).get(app, -1)) >= ver:
            return v
    raise RuntimeError(
        f"member write at {path} skipped txn {txn} but no manifest records it"
    )


def commit_group(
    spark: SparkSession,
    root: str,
    tables: dict[str, DataFrame],
    mode: str = "append",
    txn: tuple[str, int] | None = None,
    **write_kwargs,
) -> dict | None:
    """Write every table in ``tables`` (rel path -> DataFrame) under
    ``root/<rel>`` and atomically publish a catalog root pinning the
    resulting versions. Returns the root manifest, or None when the
    group txn was already committed (idempotent replay).

    ``write_kwargs`` forward to every member's ``write_table`` (e.g.
    ``stats_cols`` — per-table variation wants separate calls plus a
    manual root; this is the common symmetric case)."""
    if not tables:
        raise ValueError("commit_group: no tables")
    rels = sorted(tables)
    for rel in rels:
        if rel.startswith("_") or "/" in rel:
            raise ValueError(f"commit_group: invalid table rel {rel!r}")
    croot = _catalog_path(root)
    head = latest_manifest(spark, croot)
    if _txn_done(head, txn):
        return None  # the WHOLE cycle already committed — skip writes too

    # member writes carry the SAME txn: a replay after a crash between
    # member writes and root publication must NOT append the member
    # data twice — the skipped write's version is resolved from the
    # table's own history instead. The members are DISJOINT tables, so
    # their staged writes + commits run concurrently from a small
    # driver thread pool (one write's job tail back-fills with the
    # next member's work); atomicity still comes solely from the root
    # publication below.
    from concurrent.futures import ThreadPoolExecutor

    def _write_member(rel: str) -> int:
        tpath = f"{root.rstrip('/')}/{rel}"
        m = write_table(tables[rel], tpath, mode=mode, txn=txn, **write_kwargs)
        return (
            int(m["version"])
            if m is not None
            else _version_for_txn(spark, tpath, txn)
        )

    if len(rels) == 1:
        versions = {rels[0]: _write_member(rels[0])}
    else:
        with ThreadPoolExecutor(max_workers=min(4, len(rels))) as pool:
            versions = dict(zip(rels, pool.map(_write_member, rels)))

    def build(h: dict | None) -> dict | None:
        if _txn_done(h, txn):
            return None  # raced with our own replay — drop ours
        t = dict(h.get("txn", {})) if h else {}
        if txn is not None:
            t[str(txn[0])] = int(txn[1])
        return {"tables": versions, "txn": t, "files": [], "schema": None}

    return _commit(spark, croot, build, "group_commit")


def pin_group(
    spark: SparkSession,
    root: str,
    members: dict[str, int | None],
    txn: tuple[str, int] | None = None,
) -> dict | None:
    """Publish a root manifest PINNING existing member tables at their
    current (or given) versions — no member data is written. This is
    the serving-cycle publisher for members maintained by their OWN
    writers: a corpus table taking curation commits and the serving
    indexes an ``indexsync`` wave just advanced publish as one
    consistent search cycle (corpus vN + the index versions that
    reflect exactly vN), so a reader resolving the root never pairs a
    new corpus with a stale index or vice versa. ``members`` maps the
    rel path under ``root`` to a version (None = that table's current
    head). Same txn watermark semantics as ``commit_group``: a
    replayed cycle publishes nothing. Per-table heads may run ahead of
    the last pinned cycle — group readers go through ``read_group``."""
    if not members:
        raise ValueError("pin_group: no members")
    for rel in members:
        if rel.startswith("_") or "/" in rel:
            raise ValueError(f"pin_group: invalid table rel {rel!r}")
    croot = _catalog_path(root)
    if _txn_done(latest_manifest(spark, croot), txn):
        return None
    versions: dict[str, int] = {}
    for rel, v in sorted(members.items()):
        tpath = f"{root.rstrip('/')}/{rel}"
        if v is None:
            head = latest_manifest(spark, tpath)
            if head is None:
                raise ValueError(f"pin_group: no manifest table at {tpath}")
            v = int(head["version"])
        else:
            # refuse to pin a version that does not exist — a typo'd
            # pin must fail at publish, not at first read
            read_manifest(spark, tpath, int(v))
        versions[rel] = int(v)

    def build(h: dict | None) -> dict | None:
        if _txn_done(h, txn):
            return None
        t = dict(h.get("txn", {})) if h else {}
        if txn is not None:
            t[str(txn[0])] = int(txn[1])
        return {"tables": versions, "txn": t, "files": [], "schema": None}

    return _commit(spark, croot, build, "group_pin")


def read_group(
    spark: SparkSession, root: str, version: int | None = None
) -> dict[str, DataFrame]:
    """Every member table at the versions ONE root manifest pins —
    the cross-table-consistent view. ``version`` time-travels the whole
    group."""
    croot = _catalog_path(root)
    m = (
        read_manifest(spark, croot, version)
        if version is not None
        else latest_manifest(spark, croot)
    )
    if m is None:
        raise FileNotFoundError(f"no catalog root at {root} — no group commit yet")
    return {
        rel: snapshot(spark, f"{root.rstrip('/')}/{rel}", version=v)
        for rel, v in m["tables"].items()
    }


def group_row_counts(
    spark: SparkSession, root: str, version: int | None = None
) -> dict[str, int]:
    """Per-member row counts of the group's PUBLISHED state —
    metadata-only (root manifest + each member manifest's per-file row
    counts at the PINNED version, zero data files opened). Progress
    pollers use this instead of counting snapshots: a member head that
    advanced mid-commit (between member writes and root publication) is
    not visible here, exactly like ``read_group``."""
    croot = _catalog_path(root)
    m = (
        read_manifest(spark, croot, version)
        if version is not None
        else latest_manifest(spark, croot)
    )
    if m is None:
        raise FileNotFoundError(f"no catalog root at {root} — no group commit yet")
    from ensembl_database_loader_spark.sinks.manifest import table_row_count

    return {
        rel: table_row_count(spark, f"{root.rstrip('/')}/{rel}", version=v)
        for rel, v in m["tables"].items()
    }


def group_history(spark: SparkSession, root: str) -> list[dict]:
    """All root manifests, oldest first: (version, tables, txn) — the
    group's commit log."""
    from ensembl_database_loader_spark.sinks.manifest import list_manifests

    croot = _catalog_path(root)
    return [read_manifest(spark, croot, v) for v in list_manifests(spark, croot)]
