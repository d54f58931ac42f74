"""Streaming corpus ingest with per-micro-batch incremental curation —
the live form of the recurring-crawl workload: document files land in a
directory, each micro-batch is curated against the persisted
fingerprint store (pipeline/curate.curate_increment), survivors append
to the curated corpus, and the store grows so the next batch composes.

Semantics and guarantees:
- The file-source checkpoint gives at-least-once micro-batch delivery;
  the curated-output append is therefore at-least-once too (use the
  batch-id dedup idiom or an idempotent sink path per epoch if the
  consumer needs exactly-once rows).
- The STORE append is also at-least-once, and that is SAFE for dedup
  correctness: a replayed batch's signatures anti-join to nothing new
  (exact stage) and duplicate band keys only produce redundant
  candidate pairs that verify to the same drop set.
- Batches must arrive with monotone ids (crawl-natural) — the
  curate_increment invariant.

At 100 TB this is backfill-plus-tail: curate the historical corpus
once with ``curate_corpus(store_path=...)``, then leave this stream
tailing the landing directory with bounded work per trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ensembl_database_loader_spark.pipeline.curate import (
    curate_corpus,
    curate_increment,
)


def stream_documents(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType | str = "doc_id bigint, lang string, text string",
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming read of document files (jsonl by default) landing under
    ``landing_dir``."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(landing_dir)


#: txn app id for manifest-committed streaming appends
_TXN_APP = "streaming_curate"


def write_curated_batch(
    kept: DataFrame,
    output_path: str,
    batch_id: int,
    exactly_once: bool,
    sink: str = "files",
    stats_cols: tuple[str, ...] = (),
) -> None:
    """The per-micro-batch sink.

    ``sink='files'`` (plain parquet directory):
    ``exactly_once=False`` appends (a replayed batch duplicates its
    rows — at-least-once). ``exactly_once=True`` writes each batch into
    its own ``batch=<id>`` partition directory with overwrite: a
    foreachBatch replay rewrites the SAME directory, so the output is
    idempotent under the checkpoint's batch-id replay semantics — the
    standard exactly-once idiom for file sinks. Readers see a ``batch``
    partition column (read ``output_path`` as a whole).

    ``sink='manifest'`` (manifest-committed table, sinks/manifest.py):
    every micro-batch is one ATOMIC append commit carrying
    ``txn=('streaming_curate', batch_id)`` — a replayed batch is
    detected by the stored watermark and commits nothing, so the output
    is exactly-once regardless of the ``exactly_once`` flag, and a
    reader racing the stream always resolves a complete snapshot (the
    plain-files appends expose half-written part files). Readers use
    ``manifest.snapshot(spark, output_path)``; with ``stats_cols`` each
    appended batch also records per-file [min, max] stats, so
    ``manifest.scan_table`` file skipping works on a table a stream is
    still feeding (periodic ``compact_table(sort_cols=...)`` tightens
    the ranges appends leave loose)."""
    if sink == "manifest":
        from ensembl_database_loader_spark.sinks.manifest import write_table

        # first batch bootstraps the table (manifest append == overwrite
        # on an uncommitted table, but be explicit about the schema seed)
        write_table(
            kept,
            output_path,
            mode="append",
            txn=(_TXN_APP, batch_id),
            stats_cols=stats_cols,
        )
    elif exactly_once:
        kept.write.mode("overwrite").parquet(f"{output_path}/batch={batch_id}")
    else:
        kept.write.mode("append").parquet(output_path)


def streaming_curate(
    stream_df: DataFrame,
    store_path: str,
    output_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    exactly_once: bool = False,
    sink: str = "files",
    **curate_kwargs,
):
    """Start the incremental-curation stream: every micro-batch runs
    ``curate_increment`` against ``store_path`` (bootstrapping the
    store with ``curate_corpus`` on the very first batch) and writes
    survivors to ``output_path``. Returns the StreamingQuery.

    ``curate_kwargs`` forward to curate_corpus/curate_increment
    (id_col/text_col/block_col/min_quality/jaccard_threshold).
    ``near_dup`` (a curate_corpus-only option, default 'minhash' here —
    the store-compatible band-signature path) applies to the bootstrap
    batch; curate_increment always uses the persisted band store.

    ``exactly_once=True`` switches the output sink to per-batch
    partition-directory overwrite (``write_curated_batch``): replayed
    micro-batches rewrite their own directory instead of appending
    duplicates, upgrading the output from at-least-once to
    exactly-once rows. (The STORE append stays at-least-once either
    way — provably safe for dedup, see module docstring.)

    ``sink='manifest'`` commits each micro-batch atomically to a
    manifest table at ``output_path`` with a per-batch txn watermark —
    exactly-once AND atomically visible to concurrent readers (see
    ``write_curated_batch``).
    """
    near_dup = curate_kwargs.pop("near_dup", "minhash")
    stats_cols = tuple(curate_kwargs.pop("stats_cols", ()))

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        try:
            # works on any Hadoop FS scheme — _snapshot_files raises
            # FileNotFoundError when the store isn't bootstrapped yet
            kept, _stats = curate_increment(batch_df, store_path, **curate_kwargs)
        except FileNotFoundError:
            kept, _stats = curate_corpus(
                batch_df,
                store_path=store_path,
                near_dup=near_dup,
                **curate_kwargs,
            )
        write_curated_batch(
            kept, output_path, batch_id, exactly_once, sink, stats_cols
        )

    w = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
