"""Structured Streaming builders (SURVEY.md §2.3 WM1–WM6).

The reference's closest analogue is its incremental per-database job
flow (one dataflow event per database, eHive branches); here the same
shapes are first-class streaming operators: watermarked tumbling /
sliding / session windows, stateful dedup, and stream-static joins.

Every builder takes a DataFrame (streaming OR batch — the window
functions are identical in both modes, which is what makes the
batch-equivalence oracle checks honest) and returns a transformed
DataFrame. ``run_available_now`` drains a streaming frame
deterministically into an in-memory table for tests/probes.

Scale notes: streaming aggs shuffle on the grouping key exactly like
batch; watermarks bound state size (without one, 100 TB of event
history accumulates in the state store); dedup state is likewise
watermark-bounded.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


#: (realpath(sf_dir), copies) -> prepared symlink dir. The file stream
#: source just lists this dir; reusing it across calls avoids per-probe
#: mkdtemp + symlink setup and keeps /tmp from accumulating one dir per
#: invocation (repeat-bench runs call stream_events many times).
_STREAM_DIR_CACHE: dict[tuple[str, int], str] = {}


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    copies: int = 1,
) -> DataFrame:
    """File-source stream over the events fixture. Schema comes from a
    batch peek (streams require an explicit schema); the timestamp
    normalization matches catalog.table. ``copies > 1`` exposes the
    fixture N times (N files in the monitored dir) — a replayed/
    at-least-once source for dedup semantics."""
    import os
    import tempfile

    from ensembl_database_loader_spark.catalog import normalize_event_ts

    # The file streaming source monitors a DIRECTORY; the fixture is a
    # single parquet file, so expose it through a symlinked temp dir
    # (cached — the links are immutable once made).
    src = os.path.join(sf_dir, "events.parquet")
    key = (os.path.realpath(src), copies)
    d = _STREAM_DIR_CACHE.get(key)

    def _cache_valid(path: str | None) -> bool:
        # Validate CONTENTS, not just dir existence: every expected link
        # must still resolve to src (a cleaned /tmp or dangling symlink
        # would otherwise feed the stream an empty/partial directory).
        if path is None or not os.path.isdir(path):
            return False
        expected = [os.path.join(path, f"events_{i}.parquet") for i in range(copies)]
        return all(
            os.path.exists(p)  # follows symlinks -> False when dangling
            and os.path.getsize(p) == os.path.getsize(src)
            for p in expected
        )

    if not _cache_valid(d):
        d = tempfile.mkdtemp(prefix="edl_stream_events_")
        for i in range(copies):
            link = os.path.join(d, f"events_{i}.parquet")
            try:
                os.symlink(src, link)
            except OSError:  # filesystems without symlink support
                import shutil

                shutil.copyfile(src, link)
        _STREAM_DIR_CACHE[key] = d

    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(src).schema
    return normalize_event_ts(reader.schema(raw_schema).parquet(d))


def tumbling_agg(events: DataFrame, width: str = "1 hour", watermark: str | None = "10 minutes") -> DataFrame:
    """WM1: watermarked tumbling window — count + sum(value) per
    (window, event_type)."""
    e = events.withWatermark("ts", watermark) if watermark and events.isStreaming else events
    return (
        e.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("wstart"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def sliding_agg(events: DataFrame, width: str = "1 hour", slide: str = "15 minutes",
                watermark: str | None = "10 minutes") -> DataFrame:
    """WM2: sliding window counts (each event lands in width/slide
    windows)."""
    e = events.withWatermark("ts", watermark) if watermark and events.isStreaming else events
    return (
        e.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.date_format("w.start", _TS_FMT).alias("wstart"), "cnt")
    )


def session_agg(events: DataFrame, gap: str = "30 minutes",
                watermark: str | None = "10 minutes") -> DataFrame:
    """WM3: session windows per user (gap-merged event-time intervals)."""
    e = events.withWatermark("ts", watermark) if watermark and events.isStreaming else events
    return e.groupBy("user_id", F.session_window("ts", gap).alias("w")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def dedup_stream(events: DataFrame, watermark: str | None = "10 minutes") -> DataFrame:
    """WM5: stateful dedup on event_id. With a watermark the dedup state
    is bounded (event_ids older than the watermark are forgotten) —
    mandatory at 100 TB."""
    if events.isStreaming and watermark:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])
    return events.dropDuplicates(["event_id"])


def user_segments(events_batch: DataFrame) -> DataFrame:
    """Static dimension derived from events: user -> segment. Small by
    construction (distinct users), so Spark broadcasts it into the
    stream side of WM6 — no shuffle on the unbounded side."""
    return events_batch.select("user_id").distinct().withColumn(
        "segment", F.col("user_id") % 5
    )


def stream_static_join(events: DataFrame, dim: DataFrame) -> DataFrame:
    """WM6: stream–static equi-join then per-segment aggregate."""
    return (
        events.join(dim, "user_id")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def stream_stream_join(
    clicks: DataFrame,
    views: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """WS2/WS4: watermarked stream-stream join on user with an
    event-time range bound — "view within ``gap`` after a click".

    Both sides carry a watermark and the join condition bounds the
    right side's event time relative to the left's, which is exactly
    what lets Structured Streaming expire buffered state on both sides
    (an unbounded condition would grow state forever). Works
    identically on batch frames (no watermark applied), so the batch
    self-join is the oracle.

    ``how='left_outer'`` is the semantics users trip on: an unmatched
    click is NOT emitted when it arrives — it sits in join state until
    the watermark passes the end of its join window (``c_ts + gap``),
    because only then can the engine prove no matching view is still
    coming. So null-padded rows trail the stream by up to
    ``gap + watermark`` of event time, and clicks inside that trailing
    band at stream end are never emitted at all (state outlives the
    run). Batch-equivalence oracles must apply that cutoff to the
    unmatched side; matched pairs stream out immediately like the
    inner join. ``right_outer`` / ``full_outer`` follow symmetrically
    and pass straight through."""
    allowed = {"inner", "left_outer", "right_outer", "full_outer", "leftOuter", "rightOuter", "fullOuter"}
    if how not in allowed:
        raise ValueError(f"stream_stream_join: how={how!r} not in {sorted(allowed)}")
    c = clicks.select(
        "user_id", F.col("ts").alias("c_ts"), F.col("value").alias("c_value")
    )
    v = views.select(
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("v_ts"),
        F.col("value").alias("v_value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", watermark)
    if views.isStreaming:
        v = v.withWatermark("v_ts", watermark)
    cond = (
        (c.user_id == v.v_user_id)
        & (v.v_ts >= c.c_ts)
        & (v.v_ts <= F.col("c_ts") + F.expr(f"INTERVAL {gap}"))
    )
    return c.join(v, cond, how)


def run_available_now(df: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Drain a streaming DataFrame with the availableNow trigger into a
    uniquely-named in-memory table; returns the resulting batch frame."""
    name = f"edl_mem_{uuid.uuid4().hex[:12]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return df.sparkSession.table(name)
