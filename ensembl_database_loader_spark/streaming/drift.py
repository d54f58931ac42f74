"""Streaming drift monitor: every micro-batch's per-column PSI against
a PINNED reference profile (operators/drift.save_drift_profile),
appended to a report table as exactly-once manifest commits — the live
companion of the batch PSI check, and the third leg of the streaming
quality stack (validate.py gates CONTRACTS, this watches SHAPE).

The reference profile is loaded ONCE at stream start (bin counts +
min/max edges — a few hundred rows); each micro-batch costs one scan of
the batch (melt + partial-agg bin counts) plus tiny-frame arithmetic.
The reference corpus itself is never touched again.

Report rows: (batch, column, psi, n_ref, n_cur, n_bins, drifted) with
``drifted = psi > threshold`` — the alarm a pipeline pages on when a
crawl source silently changes shape mid-stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ensembl_database_loader_spark.operators.drift import (
    drift_profile_version,
    load_drift_profile,
    psi_against_profile,
)

_TXN_APP = "streaming_drift"


def _profile_resolver(profile_path: str):
    """Per-batch profile resolution: one catalog-head JSON read per
    micro-batch; the profile tables reload only when an approved
    re-baseline (``update_drift_profile``) published a new catalog
    version — a long-running monitor picks up the new baseline on its
    NEXT batch without a restart. Legacy profiles (version -1, no
    catalog) load once and stay pinned."""
    holder: list = []  # [(version, profile)]

    def resolve(spark):
        v = drift_profile_version(spark, profile_path)
        if not holder or holder[0][0] != v:
            holder.clear()
            holder.append((v, load_drift_profile(spark, profile_path)))
        return holder[0][1]

    return resolve


def streaming_drift(
    stream_df: DataFrame,
    profile_path: str,
    report_path: str,
    checkpoint_dir: str,
    threshold: float = 0.2,
    available_now: bool = True,
):
    """Start the drift-monitor stream; returns the StreamingQuery.

    The profile version is resolved per BATCH (one catalog-head read),
    so an approved re-baseline (``update_drift_profile``) takes effect
    on the next micro-batch without a monitor restart; each batch
    appends one report row per monitored column, exactly-once under
    replay."""

    resolve = _profile_resolver(profile_path)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from ensembl_database_loader_spark.sinks.manifest import write_table

        rep = psi_against_profile(batch_df, resolve(batch_df.sparkSession))
        rep = rep.select(
            F.lit(int(batch_id)).alias("batch"),
            "column",
            "psi",
            "n_ref",
            "n_cur",
            "n_bins",
            (F.col("psi") > F.lit(float(threshold))).alias("drifted"),
        )
        write_table(rep, report_path, mode="append", txn=(_TXN_APP, batch_id))

    w = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def drift_history(spark: SparkSession, report_path: str) -> DataFrame:
    """The monitor's full report so far, ordered (batch, column) — the
    drift dashboard's input."""
    from ensembl_database_loader_spark.sinks.manifest import snapshot

    return snapshot(spark, report_path).orderBy("batch", "column")


_GATE_TXN_APP = "streaming_drift_gate"


def streaming_drift_gate(
    stream_df: DataFrame,
    profile_path: str,
    expectations,
    root: str,
    checkpoint_dir: str,
    threshold: float = 0.2,
    refs=None,
    available_now: bool = True,
):
    """The SHAPE monitor composed INTO the quality gate: every
    micro-batch is first PSI-checked against the reference profile
    (re-resolved per batch by catalog version, so an approved
    re-baseline applies from the next batch on — see
    ``update_drift_profile``); a batch where any monitored column
    drifts past
    ``threshold`` quarantines WHOLESALE (every row tagged
    ``drift:<column>`` — a batch whose distribution broke is not
    trustworthy row by row, the same whole-batch posture
    validate_batch takes for failed batch-level rules), while a
    non-drifted batch row-routes through the expectation suite exactly
    as ``streaming_validate`` does. Four tables land under ``root``
    (``good``, ``quarantine``, ``report`` — the expectation verdicts —
    and ``drift`` — the per-column PSI rows with the drifted flag) in
    ONE atomic group commit per batch (sinks/catalog_commit.py), so a
    reader never sees a cycle's routed rows without the drift verdict
    that routed them, and a replayed batch commits nothing.

    Per-batch cost: one batch scan for the PSI bin counts (the pinned
    profile is never rescanned), one aggregate pass for the
    expectation report, one codegen routing projection, one group
    commit. Probe ``ws8_streaming_drift_gate`` gates the end-to-end
    routing under a planted drift batch against a relational oracle."""
    from ensembl_database_loader_spark.streaming.validate import (
        validate_batch,
    )

    expectations = list(expectations)
    resolve = _profile_resolver(profile_path)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from ensembl_database_loader_spark.sinks.catalog_commit import (
            commit_group,
        )

        from ensembl_database_loader_spark.functions.frames import (
            literal_frame,
        )

        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint()
        psi_plan = psi_against_profile(batch_df, resolve(spark)).select(
            F.lit(int(batch_id)).alias("batch"),
            "column",
            "psi",
            "n_ref",
            "n_cur",
            "n_bins",
            (F.col("psi") > F.lit(float(threshold))).alias("drifted"),
        )
        # tiny collect: one row per monitored column. The collected
        # rows BECOME the written drift table (a literal frame with the
        # identical schema) — evaluating the psi plan again inside the
        # group commit would rescan the whole batch for the bin counts.
        # The PSI pass and the expectation pass both read the
        # checkpointed batch and share nothing: collect them from two
        # driver threads so the two aggregate jobs overlap.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            f_psi = pool.submit(psi_plan.collect)
            good, quarantine, report = validate_batch(
                batch_df, expectations, refs=refs, materialized=True
            )
            psi_rows = f_psi.result()
        drifted_cols = sorted(r["column"] for r in psi_rows if r["drifted"])
        psi = literal_frame(spark, psi_rows, psi_plan.schema)
        if drifted_cols:
            # whole-batch quarantine, keeping each row's own rule tags
            # (a drifted batch's rows carry BOTH the drift reasons and
            # any row-rule violations — the triage queue sees both)
            reasons = F.array(
                *[F.lit(f"drift:{c}") for c in drifted_cols]
            )
            quarantine = good.unionByName(quarantine).withColumn(
                "violations", F.concat(F.col("violations"), reasons)
            )
            good = good.where(F.lit(False))
        commit_group(
            spark,
            root,
            {
                "good": good,
                "quarantine": quarantine,
                "report": report.withColumn("batch", F.lit(int(batch_id))),
                "drift": psi,
            },
            mode="append",
            txn=(_GATE_TXN_APP, batch_id),
        )

    w = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
