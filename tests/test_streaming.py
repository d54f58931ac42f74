"""Real Structured Streaming runs (availableNow) asserted equal to their
batch equivalents, plus the WM4 late-data-drop semantics test that needs
multi-batch input (SURVEY.md §5.2)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ensembl_database_loader_spark.catalog import table
from ensembl_database_loader_spark.streaming.windows import (
    run_available_now,
    stream_events,
    tumbling_agg,
)


@pytest.fixture(autouse=True)
def _tiny_state_partitions(spark):
    """Streaming state-store sizing for THIS module's tests: every
    stateful query here carries a handful of keys, but each of the 8
    fixture-default shuffle partitions instantiates its own state
    store(s) per micro-batch — near-pure engine overhead that made the
    stream-stream tests the slowest in the suite (59s/32s). Two
    partitions exercise the identical multi-partition semantics at a
    fraction of the per-batch cost (suite-budget item, VERDICT r12 #4);
    results are partition-count-independent by the streaming contract."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", prev)


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_stream_tumbling_equals_batch(spark, sf_dir):
    batch = tumbling_agg(table(spark, sf_dir, "events"))
    stream = tumbling_agg(stream_events(spark, sf_dir))
    got = run_available_now(stream, output_mode="complete")
    assert _rows(got, "wstart", "event_type") == _rows(batch, "wstart", "event_type")


def test_stream_dedup_equals_batch(spark, sf_dir):
    e = stream_events(spark, sf_dir)
    dedup = e.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(["event_id"])
    got = run_available_now(dedup, output_mode="append")
    n_batch = table(spark, sf_dir, "events").dropDuplicates(["event_id"]).count()
    assert got.count() == n_batch


@pytest.mark.slow
def test_watermark_drops_late_rows(spark, sf_dir):
    """Two micro-batches (maxFilesPerTrigger=1): batch 1 advances the
    watermark far past batch 2's late rows; append-mode aggregation must
    exclude the late rows from emitted windows."""
    # Watermark lifecycle (one file = one micro-batch, mtime-ordered):
    #   batch0: 10:15            -> state {10:00: 1}
    #   batch1: 12:50            -> watermark now 10:05 (from batch0)
    #   batch2: 13:30            -> watermark 12:40 > 11:00: hour-10 window
    #                               EMITTED (cnt=1) and state EVICTED
    #   batch3: 10:30 (late)     -> state gone, row below watermark: DROPPED
    schema = "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    src = tempfile.mkdtemp(prefix="edl_stream_src_") + "/f1"
    try:
        batches = [
            (1, "2024-03-01 10:15:00"),
            (2, "2024-03-01 12:50:00"),
            (3, "2024-03-01 13:30:00"),
            (4, "2024-03-01 10:30:00"),  # late for hour 10
        ]
        seen: set[str] = set()
        for i, (eid, ts) in enumerate(batches):
            df = spark.createDataFrame(
                [(eid, ts, 1, "click", 1.0, "{}")], schema
            ).withColumn("ts", F.to_timestamp("ts"))
            df.coalesce(1).write.mode("append").parquet(src)
            new = {p for p in os.listdir(src) if p.endswith(".parquet")} - seen
            assert len(new) == 1
            f = os.path.join(src, next(iter(new)))
            os.utime(f, (1_700_000_000 + i * 100,) * 2)
            seen.add(next(iter(new)))

        stream = (
            spark.readStream.option("maxFilesPerTrigger", 1)
            .schema(
                spark.createDataFrame([], schema).withColumn("ts", F.to_timestamp("ts")).schema
            )
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("ws"), "cnt")
        )
        got = run_available_now(agg, output_mode="append")
        out = {r["ws"]: r["cnt"] for r in got.collect()}
        # the late event 4 must not have reached the finalized hour-10 window
        assert out.get("2024-03-01 10:00") == 1, out
    finally:
        shutil.rmtree(os.path.dirname(src), ignore_errors=True)


@pytest.mark.slow
def test_stream_stream_join_buffers_across_batches(spark):
    """A click in micro-batch 0 must stay buffered in join state and
    match a view that only arrives in micro-batch 1 (maxFilesPerTrigger
    = 1); a view outside the 10-minute range must not match."""
    from ensembl_database_loader_spark.streaming.windows import stream_stream_join

    schema = "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    src = tempfile.mkdtemp(prefix="edl_ssj_src_") + "/f1"
    try:
        batches = [
            # batch0: the click, alone
            [(1, "2024-03-01 10:00:00", 1, "click", 1.0, "{}")],
            # batch1: in-range view (10:05), out-of-range view (10:20),
            # in-range view for a DIFFERENT user (no matching click)
            [
                (2, "2024-03-01 10:05:00", 1, "view", 2.0, "{}"),
                (3, "2024-03-01 10:20:00", 1, "view", 4.0, "{}"),
                (4, "2024-03-01 10:05:00", 2, "view", 8.0, "{}"),
            ],
        ]
        seen: set[str] = set()
        for i, rows in enumerate(batches):
            df = spark.createDataFrame(rows, schema).withColumn(
                "ts", F.to_timestamp("ts")
            )
            df.coalesce(1).write.mode("append").parquet(src)
            new = {p for p in os.listdir(src) if p.endswith(".parquet")} - seen
            assert len(new) == 1
            f = os.path.join(src, next(iter(new)))
            os.utime(f, (1_700_000_000 + i * 100,) * 2)
            seen.add(next(iter(new)))

        read_schema = (
            spark.createDataFrame([], schema)
            .withColumn("ts", F.to_timestamp("ts"))
            .schema
        )
        stream = (
            spark.readStream.option("maxFilesPerTrigger", 1)
            .schema(read_schema)
            .parquet(src)
        )
        joined = stream_stream_join(
            stream.filter(F.col("event_type") == "click"),
            stream.filter(F.col("event_type") == "view"),
        )
        got = run_available_now(
            joined.select("user_id", "c_value", "v_value"), output_mode="append"
        ).collect()
        assert [(r.user_id, r.c_value, r.v_value) for r in got] == [(1, 1.0, 2.0)]
    finally:
        shutil.rmtree(os.path.dirname(src), ignore_errors=True)


@pytest.mark.slow
def test_stream_stream_left_outer_emits_nulls_only_after_watermark(spark):
    """The left-outer trap: an unmatched click is NOT emitted when it
    arrives — it sits in join state until the GLOBAL watermark (min
    over both sides' watermarks) passes the end of its join window
    (c_ts + gap), and the null-padded row only surfaces in the
    micro-batch AFTER that watermark advance. Phase A pins the
    negative (stream ends before the watermark passes -> no null row,
    the state outlives the run); phase B pins the positive."""
    from ensembl_database_loader_spark.streaming.windows import (
        run_available_now,
        stream_stream_join,
    )

    schema = "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE, props STRING"

    def run(batches):
        src = tempfile.mkdtemp(prefix="edl_ssjo_src_") + "/f1"
        try:
            seen: set[str] = set()
            for i, rows in enumerate(batches):
                df = spark.createDataFrame(rows, schema).withColumn(
                    "ts", F.to_timestamp("ts")
                )
                df.coalesce(1).write.mode("append").parquet(src)
                new = {p for p in os.listdir(src) if p.endswith(".parquet")} - seen
                assert len(new) == 1
                os.utime(
                    os.path.join(src, next(iter(new))),
                    (1_700_000_000 + i * 100,) * 2,
                )
                seen |= new
            read_schema = (
                spark.createDataFrame([], schema)
                .withColumn("ts", F.to_timestamp("ts"))
                .schema
            )
            stream = (
                spark.readStream.option("maxFilesPerTrigger", 1)
                .schema(read_schema)
                .parquet(src)
            )
            joined = stream_stream_join(
                stream.filter(F.col("event_type") == "click"),
                stream.filter(F.col("event_type") == "view"),
                how="left_outer",
            )
            got = run_available_now(
                joined.select("user_id", "c_value", "v_value"),
                output_mode="append",
            ).collect()
            return sorted(((r.user_id, r.c_value, r.v_value) for r in got), key=str)
        finally:
            shutil.rmtree(os.path.dirname(src), ignore_errors=True)

    base = [
        # batch0: matched click (user 1) + never-matched click (user 3)
        [
            (1, "2024-03-01 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-03-01 10:00:00", 3, "click", 3.0, "{}"),
        ],
        # batch1: the matching view for user 1
        [(3, "2024-03-01 10:05:00", 1, "view", 2.0, "{}")],
    ]
    # Phase A: watermark never passes 10:10 -> only the matched pair
    assert run(base) == [(1, 1.0, 2.0)]
    # Phase B: batch2 advances BOTH sides' watermarks to 10:50 (the
    # global watermark is the MIN of the two, so a click-side stall
    # would pin it at 09:50 and nothing would ever evict); the user-3
    # null row is emitted in a LATER micro-batch once the advanced
    # watermark is in effect (batch3 here; the final no-data
    # micro-batch would also do it).
    advanced = base + [
        [
            (9, "2024-03-01 11:00:00", 7, "view", 0.5, "{}"),
            (11, "2024-03-01 11:00:00", 8, "click", 0.7, "{}"),
        ],
        [
            (10, "2024-03-01 11:00:01", 17, "view", 0.5, "{}"),
            (12, "2024-03-01 11:00:01", 18, "click", 0.7, "{}"),
        ],
    ]
    assert run(advanced) == [(1, 1.0, 2.0), (3, 3.0, None)]


def test_stream_stream_join_rejects_unknown_how(spark):
    from ensembl_database_loader_spark.streaming.windows import stream_stream_join

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "click", 1.0, "{}")],
        "event_id bigint, ts string, user_id bigint, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    with pytest.raises(ValueError, match="how="):
        stream_stream_join(df, df, how="cross")


def test_dedup_stream_batch_fallback(spark):
    """dedup_stream's batch branch (plain dropDuplicates) — kept as a
    public API path even though wm5 now fuses its own dedup+count."""
    from ensembl_database_loader_spark.streaming.windows import dedup_stream

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:00:01"), (2, "2024-01-01 00:00:02")],
        "event_id bigint, ts string",
    )
    out = dedup_stream(df)
    assert sorted(r.event_id for r in out.collect()) == [1, 2]
