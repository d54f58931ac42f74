"""Distribution-drift detection between two table snapshots (reference
vs current): Population Stability Index per column — the monitor a
recurring ingest runs to catch a crawl source silently changing shape
(price scale shifts, a category appears/vanishes, nulls spike) before
the batch poisons the corpus. Complements operators/expectations.py:
expectations check CONTRACTS (known bounds), drift checks SHAPE against
history without needing bounds up front.

PSI = sum over bins of (p_cur - p_ref) * ln(p_cur / p_ref); the usual
reading: < 0.1 stable, 0.1-0.2 moderate shift, > 0.2 investigate.

Determinism (what makes this oracle-able cross-engine):
- numeric bins are FIXED-WIDTH over the reference's [min, max] —
  ``floor((x - mn) * bins / (mx - mn))`` clamped — the identical IEEE
  expression both engines replay exactly (quantile-edge binning would
  hinge on interpolated doubles whose last ulp differs between
  engines and can flip boundary rows); out-of-range current values
  clamp into the edge bins, nulls get their own bin (a null-rate spike
  IS drift),
- categorical bins are the value itself,
- both shares are Laplace-smoothed ((c + s) / (n + s*B), B = the
  column's observed bin count across BOTH snapshots) so new/vanished
  bins contribute a finite, replayable penalty instead of ln(0),
- the final PSI is rounded.

Scale shape: each snapshot is scanned ONCE however many columns are
monitored — a melt (posexplode of per-column (column, bin) pairs, pure
codegen) followed by ONE partial-aggregated groupBy(column, bin) per
snapshot; the bin frames are (n_cols * bins)-sized, so everything
after the two scans is broadcast-tiny. Reference min/max ride a
one-row crossJoin (no driver collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bin label for null values (kept distinct from any real bin/category)
_NULL_BIN = "__null__"


def _melt(
    df: DataFrame,
    num_cols: tuple[str, ...],
    cat_cols: tuple[str, ...],
    edges: DataFrame,
    bins: int,
) -> DataFrame:
    """(column, bin) long frame: numeric columns fixed-width-binned
    against the reference edges, categorical columns binned by value,
    nulls to the null bin. One codegen projection + posexplode."""
    pairs = []
    for c in num_cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        x = F.col(c).cast("double")
        raw = F.floor((x - mn) * bins / (mx - mn))
        bucket = F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw))
        label = F.when(x.isNull() | mn.isNull(), F.lit(_NULL_BIN)).otherwise(
            F.concat(F.lit("b"), F.format_string("%03d", bucket.cast("int")))
        )
        # degenerate reference (mn == mx): everything into bin 0
        label = F.when(
            x.isNotNull() & mn.isNotNull() & (mn == mx), F.lit("b000")
        ).otherwise(label)
        pairs.append(F.struct(F.lit(c).alias("column"), label.alias("bin")))
    for c in cat_cols:
        label = F.coalesce(F.col(c).cast("string"), F.lit(_NULL_BIN))
        pairs.append(F.struct(F.lit(c).alias("column"), label.alias("bin")))
    return (
        df.crossJoin(F.broadcast(edges))
        .select(F.explode(F.array(*pairs)).alias("p"))
        .select("p.column", "p.bin")
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    num_cols: tuple[str, ...] = (),
    cat_cols: tuple[str, ...] = (),
    bins: int = 10,
    smoothing: float = 0.5,
    ndigits: int = 6,
) -> DataFrame:
    """Per-column PSI between ``ref`` and ``cur``: ``(column, psi,
    n_ref, n_cur, n_bins)`` ordered by column. See module docstring for
    the determinism contract."""
    num_cols, cat_cols = tuple(num_cols), tuple(cat_cols)
    if not num_cols and not cat_cols:
        raise ValueError("psi_drift: no columns to monitor")
    for c in num_cols + cat_cols:
        for side, df in (("ref", ref), ("cur", cur)):
            if c not in df.columns:
                raise ValueError(
                    f"psi_drift: column {c!r} missing from {side} frame"
                )
    if bins < 2:
        raise ValueError(f"psi_drift: bins must be >= 2, got {bins}")

    edges = profile_edges(ref, num_cols)
    rbin = bin_counts(ref, num_cols, cat_cols, edges, bins, "c_ref")
    cbin = bin_counts(cur, num_cols, cat_cols, edges, bins, "c_cur")
    return psi_from_bins(rbin, cbin, smoothing=smoothing, ndigits=ndigits)


def profile_edges(ref: DataFrame, num_cols: tuple[str, ...]) -> DataFrame:
    """One-row min/max frame for the numeric columns, localCheckpointed:
    BOTH melts crossJoin it, and without the cut each reference re-runs
    the full ref scan (three scans of a 100 TB reference instead of the
    one this agg needs)."""
    return (
        ref.agg(
            *[
                f
                for c in num_cols
                for f in (
                    F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
                    F.max(F.col(c).cast("double")).alias(f"__mx_{c}"),
                )
            ]
        ).localCheckpoint()
        if num_cols
        else ref.sparkSession.range(1).select(F.lit(1).alias("__one"))
    )


def bin_counts(
    df: DataFrame,
    num_cols: tuple[str, ...],
    cat_cols: tuple[str, ...],
    edges: DataFrame,
    bins: int,
    count_col: str,
) -> DataFrame:
    """(column, bin, <count_col>) — the storable distribution profile
    (the serialized form streaming_drift pins as its reference)."""
    return (
        _melt(df, tuple(num_cols), tuple(cat_cols), edges, bins)
        .groupBy("column", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias(count_col))
    )


def psi_from_bins(
    rbin: DataFrame,
    cbin: DataFrame,
    smoothing: float = 0.5,
    ndigits: int = 6,
) -> DataFrame:
    """PSI per column from two bin-count frames ``(column, bin, c_ref)``
    and ``(column, bin, c_cur)`` — the pure-arithmetic tail, reusable
    against a STORED reference profile (no rescan of the reference
    corpus ever again)."""
    both = (
        rbin.join(cbin, ["column", "bin"], "full_outer")
        .select(
            "column",
            "bin",
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
        )
    )
    # per-column totals as a WINDOW over the tiny bin frame, not a
    # second groupBy reference — referencing `both` twice would double
    # the whole upstream subtree (each base table re-scanned; caught by
    # the plan test)
    from pyspark.sql import Window

    ndigits = int(ndigits)
    s = float(smoothing)
    w = Window.partitionBy("column")
    j = both.select(
        "column",
        "bin",
        "c_ref",
        "c_cur",
        F.sum("c_ref").over(w).cast("bigint").alias("n_ref"),
        F.sum("c_cur").over(w).cast("bigint").alias("n_cur"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_bins"),
    )
    p_ref = (F.col("c_ref") + F.lit(s)) / (
        F.col("n_ref") + F.lit(s) * F.col("n_bins")
    )
    p_cur = (F.col("c_cur") + F.lit(s)) / (
        F.col("n_cur") + F.lit(s) * F.col("n_bins")
    )
    contrib = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (
        j.groupBy("column")
        .agg(
            F.round(F.sum(contrib), ndigits).alias("psi"),
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            F.max("n_bins").alias("n_bins"),
        )
        .orderBy("column")
    )


# ---------------------------------------------------------------------------
# Stored reference profiles (the streaming monitor's pinned baseline)
# ---------------------------------------------------------------------------


def _commit_profile(
    ref: DataFrame,
    path: str,
    num_cols: tuple[str, ...],
    cat_cols: tuple[str, ...],
    bins: int,
    txn: tuple[str, int] | None,
) -> dict | None:
    """Profile ``ref`` and publish the three profile tables (``bins``,
    ``edges``, ``meta``) as ONE atomic catalog group commit under
    ``path`` — a reader resolving the profile never sees new bin counts
    against old edges, and the catalog's version log IS the baseline's
    audit history (who re-pinned, when, exactly-once under replay)."""
    num_cols, cat_cols = tuple(num_cols), tuple(cat_cols)
    if not num_cols and not cat_cols:
        raise ValueError("drift profile: no columns to monitor")
    if bins < 2:
        raise ValueError(f"drift profile: bins must be >= 2, got {bins}")
    from ensembl_database_loader_spark.sinks.catalog_commit import commit_group

    edges = profile_edges(ref, num_cols)
    rbin = bin_counts(ref, num_cols, cat_cols, edges, bins, "c_ref")
    spark = ref.sparkSession
    meta = spark.createDataFrame(
        [(",".join(num_cols), ",".join(cat_cols), int(bins))],
        "num_cols string, cat_cols string, bins int",
    )
    return commit_group(
        spark,
        path,
        {"bins": rbin, "edges": edges, "meta": meta},
        mode="overwrite",
        txn=txn,
    )


def save_drift_profile(
    ref: DataFrame,
    path: str,
    num_cols: tuple[str, ...] = (),
    cat_cols: tuple[str, ...] = (),
    bins: int = 10,
) -> None:
    """Profile the reference ONCE and persist it as three manifest
    tables under ``path`` (``/bins``, ``/edges``, ``/meta``) — every
    later drift check (batch or streaming) compares against the stored
    bin counts without ever rescanning the reference corpus. The trio
    publishes atomically as catalog-group version 0; later approved
    re-baselines (``update_drift_profile``) append versions to the same
    catalog, so the profile's full lineage stays auditable."""
    _commit_profile(ref, path, tuple(num_cols), tuple(cat_cols), bins, None)


def update_drift_profile(
    ref: DataFrame,
    path: str,
    txn: tuple[str, int],
    num_cols: tuple[str, ...] | None = None,
    cat_cols: tuple[str, ...] | None = None,
    bins: int | None = None,
) -> dict | None:
    """APPROVED re-baseline: re-profile against ``ref`` (the newly
    accepted reference — e.g. last quarter's validated feed) and
    publish it as the NEXT catalog version of the profile at ``path``.
    Monitored columns/bins are inherited from the current profile
    unless overridden. The required ``txn=(app, version)`` makes the
    re-baseline exactly-once under replay (a re-run of the approval job
    publishes nothing and returns None) and stamps the catalog's commit
    log — ``drift_profile_history`` shows every baseline the monitor
    ever compared against, in order. Running monitors pick the new
    baseline up on their next micro-batch (streaming/drift.py resolves
    the profile version per batch — a metadata-only read)."""
    if txn is None:
        raise ValueError(
            "update_drift_profile: txn is required — a re-baseline is an "
            "audited, replay-safe act (use save_drift_profile to create)"
        )
    spark = ref.sparkSession
    # Replay guard FIRST (one metadata read): commit_group would detect
    # the recorded txn anyway, but only after this function had already
    # paid load_drift_profile + the EAGER profile_edges aggregate over
    # the new reference — a replayed approval job (at-least-once
    # scheduler) should cost zero engine jobs, same as a replayed sync.
    from ensembl_database_loader_spark.sinks.catalog_commit import (
        _catalog_path,
        _txn_done,
    )
    from ensembl_database_loader_spark.sinks.manifest import latest_manifest

    if _txn_done(latest_manifest(spark, _catalog_path(path)), txn):
        return None
    if num_cols is None or cat_cols is None or bins is None:
        _, _, cur_num, cur_cat, cur_bins = load_drift_profile(spark, path)
        num_cols = cur_num if num_cols is None else tuple(num_cols)
        cat_cols = cur_cat if cat_cols is None else tuple(cat_cols)
        bins = cur_bins if bins is None else int(bins)
    return _commit_profile(ref, path, num_cols, cat_cols, bins, txn)


def drift_profile_version(spark, path: str) -> int:
    """Latest catalog version of the profile at ``path`` (-1 for a
    legacy profile saved before group commits, or none yet) — the
    one-JSON-read poll streaming monitors use to notice a re-baseline
    between micro-batches."""
    from ensembl_database_loader_spark.sinks.catalog_commit import _catalog_path
    from ensembl_database_loader_spark.sinks.manifest import latest_manifest

    head = latest_manifest(spark, _catalog_path(path))
    return -1 if head is None else int(head["version"])


def drift_profile_history(spark, path: str) -> list[dict]:
    """The profile's baseline lineage: every catalog group commit,
    oldest first — the audit trail of approved re-baselines."""
    from ensembl_database_loader_spark.sinks.catalog_commit import group_history

    return group_history(spark, path)


def load_drift_profile(spark, path: str):
    """(rbin, edges, num_cols, cat_cols, bins) from a saved profile.
    Resolved through the catalog root when one exists (all three tables
    at the versions ONE group commit pinned — never a torn trio), with
    a per-table-head fallback for legacy profiles. The edges row
    localCheckpoints (it crossJoins every batch melt)."""
    from ensembl_database_loader_spark.sinks.manifest import snapshot

    try:
        from ensembl_database_loader_spark.sinks.catalog_commit import read_group

        g = read_group(spark, path)
        meta_df, rbin, edges = g["meta"], g["bins"], g["edges"]
    except FileNotFoundError:  # legacy: saved before group commits
        meta_df = snapshot(spark, f"{path}/meta")
        rbin = snapshot(spark, f"{path}/bins")
        edges = snapshot(spark, f"{path}/edges")
    meta = meta_df.collect()[0]
    num_cols = tuple(c for c in meta["num_cols"].split(",") if c)
    cat_cols = tuple(c for c in meta["cat_cols"].split(",") if c)
    return rbin, edges.localCheckpoint(), num_cols, cat_cols, int(meta["bins"])


def psi_against_profile(
    cur: DataFrame,
    profile,
    smoothing: float = 0.5,
    ndigits: int = 6,
) -> DataFrame:
    """PSI of ``cur`` against a loaded profile tuple — the stored
    reference is never rescanned, ``cur`` is scanned once."""
    rbin, edges, num_cols, cat_cols, bins = profile
    cbin = bin_counts(cur, num_cols, cat_cols, edges, bins, "c_cur")
    return psi_from_bins(rbin, cbin, smoothing=smoothing, ndigits=ndigits)
