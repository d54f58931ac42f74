"""Table maintenance for the parquet mirror: small-file compaction.

Every incremental writer (streaming ingest micro-batches,
``curate_increment`` appends, per-release mirror loads) accretes small
files; at scale the file count — not the byte count — becomes the
bottleneck (task-per-file scheduling, namenode/listing pressure,
parquet footer overhead per file). Compaction rewrites a directory
into ~``target_bytes``-sized files.

Reference analogue: the loader's idempotent directory recreate before
each load (``LoadFiles.pm`` prepare/reload) — here the table survives
and is rewritten in place with a rename swap.

Scale notes: the rewrite is one job whose parallelism is the OUTPUT
file count (``repartition(n_out)`` — a full shuffle, the price of
perfect sizing; at 100 TB compact partition-by-partition instead, one
hive partition per job, same helper pointed at the partition dir).
The swap is two renames — not atomic as a pair; a reader racing the
swap can fail and retry, which is the standard non-transactional
parquet-lake trade-off. For tables with concurrent readers use the
manifest-committed layer instead (``sinks/manifest.py``):
``manifest.compact_table`` publishes the compacted file list as an
atomic snapshot commit, so racing readers keep reading the pre-compact
snapshot — this helper remains for plain directories no manifest ever
managed."""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory."""
    fs, hpath, _ = _fs(spark, path)
    files = [
        st
        for st in fs.listStatus(hpath)
        if st.isFile() and not st.getPath().getName().startswith(("_", "."))
    ]
    return len(files), sum(st.getLen() for st in files)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    sort_cols: tuple[str, ...] = (),
) -> dict[str, int]:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(total_bytes / target_bytes)`` files (optionally sorted
    within files by ``sort_cols`` — restores min/max-stat clustering
    that interleaved appends destroy, so scans prune row groups
    again). Returns ``{files_before, files_after, bytes}``."""
    n_before, total = _dir_stats(spark, path)
    if n_before == 0:
        # a hive-partitioned table root has only subdirectories here;
        # proceeding would read the whole tree and swap the layout for
        # one flat file — compact per partition directory instead
        raise ValueError(
            f"no data files directly under {path} — point compact_parquet "
            "at a leaf (partition) directory, not a partitioned table root"
        )
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(path)
    out = df.repartition(n_out)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)

    tmp = path.rstrip("/") + "__compact_tmp"
    out.write.mode("overwrite").parquet(tmp)

    fs, hpath, jvm = _fs(spark, path)
    bak = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__compact_bak")
    if fs.exists(bak):
        fs.delete(bak, True)
    # Hadoop rename reports most failures by RETURNING FALSE, not
    # throwing — check both renames, and never delete the backup until
    # the new data is verifiably in place (a failed swap must leave the
    # original recoverable, not silently destroyed)
    if not fs.rename(hpath, bak):
        raise IOError(f"compact_parquet: could not move {path} aside")
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), hpath):
        fs.rename(bak, hpath)  # restore the original
        raise IOError(f"compact_parquet: swap into {path} failed; original restored")
    fs.delete(bak, True)
    n_after, _ = _dir_stats(spark, path)
    return {"files_before": n_before, "files_after": n_after, "bytes": total}
