"""Streaming probes WM1–WM6 (SURVEY.md §2.3), checked via their batch
equivalents: Spark's window/session_window functions compute identically
in batch and micro-batch mode, so the DuckDB oracle is the batch SQL.
WM4 runs a REAL Structured Streaming query (readStream -> watermark ->
window -> memory sink, availableNow trigger); the late-data-drop
semantics that need multi-batch input live in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ensembl_database_loader_spark.catalog import table
from ensembl_database_loader_spark.plans.registry import probe
from ensembl_database_loader_spark.session import (
    STATE_PARTITIONS,
    ensure_session_confs,
)
from ensembl_database_loader_spark.streaming.windows import (
    dedup_stream,
    run_available_now,
    session_agg,
    sliding_agg,
    stream_events,
    stream_static_join,
    stream_stream_join,
    tumbling_agg,
    user_segments,
)

_TUMBLE_ORACLE = (
    "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS wstart, "
    "event_type, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_value "
    "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
)


@probe("wm1_tumbling_window", oracle=_TUMBLE_ORACLE, tags=("streaming",))
def wm1(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-hour event-time window, keyed by event_type."""
    ensure_session_confs(spark)
    e = table(spark, sf, "events")
    return tumbling_agg(e).orderBy("wstart", "event_type")


@probe(
    "wm2_sliding_window",
    oracle=(
        "SELECT strftime(make_timestamp((CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 "
        "- k * 900) * 1000000), '%Y-%m-%d %H:%M:%S') AS wstart, COUNT(*) AS cnt "
        "FROM events, UNNEST([0, 1, 2, 3]) AS t(k) GROUP BY 1 ORDER BY 1"
    ),
    tags=("streaming",),
)
def wm2(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding 1-hour window every 15 minutes: each event belongs to 4
    windows (the oracle materializes the same 4 epoch-aligned starts)."""
    ensure_session_confs(spark)
    e = table(spark, sf, "events")
    return sliding_agg(e).orderBy("wstart")


@probe(
    "wm3_session_window",
    oracle=(
        "WITH d AS (SELECT user_id, CASE WHEN LAG(ts) OVER w IS NULL "
        "OR ts >= LAG(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
        "SELECT CAST(SUM(new_s) AS BIGINT) AS sessions, COUNT(*) AS total_events FROM d"
    ),
    tags=("streaming",),
)
def wm3(spark: SparkSession, sf: str) -> DataFrame:
    """Session windows (30-min gap) per user. Oracle is the classic
    LAG-based sessionization: a new session starts when the gap to the
    previous event is >= the gap duration (session_window's interval-
    merge semantics: [ts, ts+gap) windows merge iff they overlap)."""
    ensure_session_confs(spark)
    e = table(spark, sf, "events")
    s = session_agg(e)
    return s.agg(
        F.count(F.lit(1)).alias("sessions"),
        F.sum("cnt").cast("bigint").alias("total_events"),
    )


@probe(
    "wm4_watermark_stream",
    oracle=(
        "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS wstart, "
        "event_type, COUNT(*) AS cnt FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    tags=("streaming", "live-stream"),
)
def wm4(spark: SparkSession, sf: str) -> DataFrame:
    """REAL Structured Streaming run: readStream(parquet) -> watermark
    10 min -> tumbling window -> memory sink (availableNow). Complete
    output mode makes the single-batch result equal the batch query, so
    it stays oracle-checkable; multi-batch late-data drop semantics are
    asserted in tests/test_streaming.py."""
    ensure_session_confs(spark)
    s = stream_events(spark, sf)
    agg = (
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            "event_type",
            "cnt",
        )
    )
    return run_available_now(agg, output_mode="complete").orderBy("wstart", "event_type")


@probe(
    "wm5_stateful_dedup",
    oracle=(
        "SELECT (SELECT COUNT(*) FROM (SELECT event_id FROM events "
        "UNION ALL SELECT event_id FROM events) u) AS input_cnt, "
        "COUNT(DISTINCT event_id) AS uniq_cnt FROM events"
    ),
    tags=("streaming",),
)
def wm5(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup on event_id over a doubled (replayed) input — the batch
    equivalent of streaming dropDuplicatesWithinWatermark (wm7 probes
    the real streaming path). Formulated as the count-bearing groupBy
    (dropDuplicates without discarding multiplicity) so both the
    replayed count and the deduped count come out of ONE
    partial-aggregated shuffle. The replay is a 2-element explode over
    a single scan rather than union-of-two-scans — same doubled
    multiset reaching the aggregate, half the parquet reads (measured
    0.53 -> 0.39 s at sf0.1)."""
    ensure_session_confs(spark)
    e = table(spark, sf, "events").select("event_id")
    doubled = e.select(
        "event_id", F.explode(F.array(F.lit(0), F.lit(1))).alias("_replay")
    ).drop("_replay")
    g = doubled.groupBy("event_id").agg(F.count(F.lit(1)).alias("c"))
    return g.agg(
        F.sum("c").cast("bigint").alias("input_cnt"),
        F.count(F.lit(1)).alias("uniq_cnt"),
    )


@probe(
    "wm7_live_dedup_stream",
    oracle=(
        "SELECT COUNT(DISTINCT event_id) AS uniq_cnt, "
        "(SELECT COUNT(*) * 2 FROM events) AS replayed_cnt FROM events"
    ),
    tags=("streaming", "live-stream"),
)
def wm7(spark: SparkSession, sf: str) -> DataFrame:
    """REAL streaming dedup: the events fixture exposed TWICE to a
    file-source stream (an at-least-once replay), deduplicated with
    dropDuplicatesWithinWatermark on event_id, drained via availableNow
    into a memory sink, then counted — the live twin of wm5's batch
    equivalence."""
    ensure_session_confs(spark)
    s = stream_events(spark, sf, copies=2)
    deduped = dedup_stream(s)  # streaming path: watermark + WithinWatermark
    # state partitions sized via SPARK_GRAFT_STATE_PARTITIONS (the ws2
    # decision, same rationale; session.py documents the knob): a
    # streaming query freezes its shuffle-partition count into the
    # state layout at start, and the dedup state (~|distinct event_id|
    # entries) is sized by key cardinality, not CPU count — 32
    # state-store instances per batch on this key set measured
    # 6.0s -> 3.3s at the local default 8 (conf restored for the batch
    # aggregate below)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", STATE_PARTITIONS)
    try:
        out = run_available_now(deduped.select("event_id"), output_mode="append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    replayed = table(spark, sf, "events").agg(
        (F.count(F.lit(1)) * 2).alias("replayed_cnt")
    )
    return out.agg(F.count(F.lit(1)).alias("uniq_cnt")).crossJoin(replayed)


@probe(
    "ws1_custom_stateful_profile",
    oracle=(
        "WITH p AS (SELECT user_id, COUNT(*) AS cnt, SUM(value) AS total, "
        "MAX(ts) AS last_seen FROM events GROUP BY user_id) "
        "SELECT COUNT(*) AS users, CAST(SUM(cnt) AS BIGINT) AS total_events, "
        "ROUND(SUM(total), 2) AS sum_value, "
        "strftime(MAX(last_seen), '%Y-%m-%d %H:%M:%S') AS max_last_seen FROM p"
    ),
    tags=("streaming", "live-stream", "stateful"),
)
def ws1(spark: SparkSession, sf: str) -> DataFrame:
    """REAL custom stateful streaming operator: running_user_profile
    (applyInPandasWithState, per-user cumulative count/sum/last-seen
    with idle-timeout state expiry) over a live file-source stream,
    drained with availableNow. The memory sink may hold one row per
    user per micro-batch (update mode); the final profile per user is
    the row with the highest cumulative count — reduced here and
    checked against the batch groupBy oracle."""
    from pyspark.sql import Window

    from ensembl_database_loader_spark.streaming.stateful import (
        running_user_profile,
    )

    ensure_session_confs(spark)
    s = stream_events(spark, sf)
    prof = run_available_now(running_user_profile(s), output_mode="update")
    w = Window.partitionBy("user_id").orderBy(F.desc("cnt"))
    final = prof.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return final.agg(
        F.count(F.lit(1)).alias("users"),
        F.sum("cnt").cast("bigint").alias("total_events"),
        F.round(F.sum("total"), 2).alias("sum_value"),
        F.date_format(F.max("last_seen"), "yyyy-MM-dd HH:mm:ss").alias(
            "max_last_seen"
        ),
    )


@probe(
    "ws2_stream_stream_join",
    oracle=(
        "WITH c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'), "
        "v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view') "
        "SELECT COUNT(*) AS pair_cnt, COUNT(DISTINCT c.user_id) AS users, "
        "ROUND(SUM(c.value + v.value), 2) AS sum_value "
        "FROM c JOIN v ON c.user_id = v.user_id "
        "AND v.ts BETWEEN c.ts AND c.ts + INTERVAL 10 MINUTE"
    ),
    tags=("streaming", "live-stream"),
)
def ws2(spark: SparkSession, sf: str) -> DataFrame:
    """REAL stream-stream join: two file-source streams over the events
    fixture (clicks / views), watermarked on both sides, inner-joined
    on user with a 10-minute event-time range bound, drained with
    availableNow and aggregated. The range bound + double watermark is
    what lets the engine expire join state on both sides — the
    unbounded-state trap is the defining hazard of stream-stream
    joins. Single-batch availableNow makes the result equal the batch
    self-join, which is the DuckDB oracle.

    Both sides split ONE shared file-source stream with two filters
    (a self-join of the same source) instead of instantiating two
    independent sources — one source listing/schema setup, and the
    per-side filters prune before the join buffers state.

    State partitions are sized via SPARK_GRAFT_STATE_PARTITIONS
    (session.py documents the knob; local default 8): a streaming
    query's shuffle-partition count is frozen into its state layout at
    start, and every partition carries TWO state-store instances for a
    stream-stream join — sizing them to the key cardinality instead of
    inheriting the CPU-count default is the real-world streaming
    decision (32 -> 8 measured 6.0s -> 3.0s; the conf is restored for
    the batch aggregate that follows)."""
    ensure_session_confs(spark)
    src = stream_events(spark, sf)
    clicks = src.filter(F.col("event_type") == "click")
    views = src.filter(F.col("event_type") == "view")
    joined = stream_stream_join(clicks, views)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", STATE_PARTITIONS)
    try:
        out = run_available_now(
            joined.select("user_id", "c_value", "v_value"), output_mode="append"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out.agg(
        F.count(F.lit(1)).alias("pair_cnt"),
        F.countDistinct("user_id").alias("users"),
        F.round(F.sum(F.col("c_value") + F.col("v_value")), 2).alias("sum_value"),
    )


#: realpath(sf_dir) -> dir holding the two time-split micro-batch files
#: for ws4 (built once; mtimes order b0 before b1).
_WS4_SPLIT_CACHE: dict[str, str] = {}

_WS4_SPLIT = "2024-01-16 00:00:00"


def _ws4_split_dir(spark: SparkSession, sf: str) -> str:
    """Materialize the events fixture as TWO parquet files split at
    ``_WS4_SPLIT`` so the file stream replays it as two ordered
    micro-batches (maxFilesPerTrigger=1): the watermark computed from
    batch 0 is what evicts batch-0 state during batch 1."""
    import glob
    import os
    import shutil
    import tempfile

    src = os.path.join(sf, "events.parquet")
    key = os.path.realpath(src)
    d = _WS4_SPLIT_CACHE.get(key)
    if d and os.path.isdir(d) and len(glob.glob(os.path.join(d, "b*.parquet"))) == 2:
        return d
    d = tempfile.mkdtemp(prefix="edl_ws4_split_")
    e = table(spark, sf, "events")
    for i, pred in enumerate(
        (F.col("ts") < F.lit(_WS4_SPLIT), F.col("ts") >= F.lit(_WS4_SPLIT))
    ):
        stage = os.path.join(d, f"_stage{i}")
        e.filter(pred).coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(d, f"b{i}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(stage, ignore_errors=True)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)
    _WS4_SPLIT_CACHE[key] = d
    return d


@probe(
    "ws4_stream_stream_left_outer",
    oracle=(
        "WITH c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'), "
        "v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'), "
        # FINAL global watermark = min over both sides' max event time
        # minus the 10-minute delay (the availableNow run ends with a
        # no-data micro-batch that evicts state against this watermark)
        "wm AS (SELECT LEAST((SELECT MAX(ts) FROM c), (SELECT MAX(ts) FROM v)) "
        "- INTERVAL 10 MINUTE AS w), "
        "matched AS (SELECT c.user_id, c.value AS cv, v.value AS vv "
        "FROM c JOIN v ON c.user_id = v.user_id "
        "AND v.ts BETWEEN c.ts AND c.ts + INTERVAL 10 MINUTE), "
        # null-padded rows: unmatched clicks whose join window closed
        # strictly before the final watermark
        "unmatched AS (SELECT c.user_id, c.value FROM c "
        "WHERE c.ts + INTERVAL 10 MINUTE < (SELECT w FROM wm) "
        "AND NOT EXISTS (SELECT 1 FROM v WHERE v.user_id = c.user_id "
        "AND v.ts BETWEEN c.ts AND c.ts + INTERVAL 10 MINUTE)) "
        "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM matched) AS pair_cnt, "
        "(SELECT ROUND(SUM(cv + vv), 2) FROM matched) AS sum_matched, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM unmatched) AS null_cnt, "
        "(SELECT ROUND(SUM(value), 2) FROM unmatched) AS sum_unmatched"
    ),
    tags=("streaming", "live-stream", "outer-join"),
)
def ws4(spark: SparkSession, sf: str) -> DataFrame:
    """REAL watermarked stream-stream LEFT OUTER join
    (streaming/windows.stream_stream_join how='left_outer'): the events
    fixture replayed as two time-split micro-batches. Matched pairs
    stream out immediately; an unmatched click is held in join state
    until the GLOBAL watermark (min of both sides') passes c_ts + gap.
    The availableNow drain ends with a no-data micro-batch
    (spark.sql.streaming.noDataMicroBatches.enabled, default true)
    that evicts against the FINAL watermark, so the drained result
    contains null rows exactly for unmatched clicks whose join window
    closed strictly before min(max click ts, max view ts) - 10 min.
    The oracle recomputes that watermark relationally; clicks inside
    the trailing band stay in state past end-of-stream and are never
    emitted (the documented left-outer trap; the mid-stream next-batch
    emission timing is pinned in tests/test_streaming.py)."""
    ensure_session_confs(spark)
    d = _ws4_split_dir(spark, sf)
    schema = table(spark, sf, "events").schema
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(schema)
        .parquet(d)
    )
    joined = stream_stream_join(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "view"),
        how="left_outer",
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", STATE_PARTITIONS)
    try:
        out = run_available_now(
            joined.select("user_id", "c_value", "v_user_id", "v_value"),
            output_mode="append",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    matched = F.col("v_user_id").isNotNull()
    return out.agg(
        F.count(F.when(matched, 1)).alias("pair_cnt"),
        F.round(F.sum(F.when(matched, F.col("c_value") + F.col("v_value"))), 2).alias(
            "sum_matched"
        ),
        F.count(F.when(~matched, 1)).alias("null_cnt"),
        F.round(F.sum(F.when(~matched, F.col("c_value"))), 2).alias("sum_unmatched"),
    )


@probe(
    "ws5_stream_stream_full_outer",
    oracle=(
        "WITH c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'), "
        "v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'), "
        "wm AS (SELECT LEAST((SELECT MAX(ts) FROM c), (SELECT MAX(ts) FROM v)) "
        "- INTERVAL 10 MINUTE AS w), "
        "matched AS (SELECT c.value AS cv, v.value AS vv FROM c JOIN v "
        "ON c.user_id = v.user_id AND v.ts BETWEEN c.ts AND c.ts + INTERVAL 10 MINUTE), "
        # left padding: unmatched clicks whose join window (c_ts+gap)
        # closed strictly before the final watermark
        "lnull AS (SELECT value FROM c WHERE ts + INTERVAL 10 MINUTE < (SELECT w FROM wm) "
        "AND NOT EXISTS (SELECT 1 FROM v WHERE v.user_id = c.user_id "
        "AND v.ts BETWEEN c.ts AND c.ts + INTERVAL 10 MINUTE)), "
        # right padding: unmatched views evictable once v_ts < wm (any
        # future click would have c_ts > wm >= v_ts and cannot match a
        # condition requiring v_ts >= c_ts)
        "rnull AS (SELECT value FROM v WHERE ts < (SELECT w FROM wm) "
        "AND NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = v.user_id "
        "AND v.ts BETWEEN c.ts AND c.ts + INTERVAL 10 MINUTE)) "
        "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM matched) AS pair_cnt, "
        "(SELECT ROUND(SUM(cv + vv), 2) FROM matched) AS sum_matched, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM lnull) AS left_null_cnt, "
        "(SELECT ROUND(SUM(value), 2) FROM lnull) AS sum_left_unmatched, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM rnull) AS right_null_cnt, "
        "(SELECT ROUND(SUM(value), 2) FROM rnull) AS sum_right_unmatched"
    ),
    tags=("streaming", "live-stream", "outer-join"),
)
def ws5(spark: SparkSession, sf: str) -> DataFrame:
    """WS5: watermarked stream-stream FULL OUTER join over the same
    two-micro-batch replay as ws4. The two null-padding sides expire
    on DIFFERENT boundaries — an unmatched click pads once the
    watermark passes the END of its window (c_ts + gap), an unmatched
    view pads once the watermark passes v_ts itself (its window
    extends BACKWARD: matching clicks have c_ts <= v_ts, and clicks
    arriving after the watermark would be late) — which is precisely
    the asymmetry the oracle encodes relationally. Matched pairs
    stream out immediately on both paths."""
    ensure_session_confs(spark)
    d = _ws4_split_dir(spark, sf)
    schema = table(spark, sf, "events").schema
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(schema)
        .parquet(d)
    )
    joined = stream_stream_join(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "view"),
        how="full_outer",
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", STATE_PARTITIONS)
    try:
        out = run_available_now(
            joined.select("user_id", "c_value", "v_user_id", "v_value"),
            output_mode="append",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    m = F.col("user_id").isNotNull() & F.col("v_user_id").isNotNull()
    lo = F.col("user_id").isNotNull() & F.col("v_user_id").isNull()
    ro = F.col("user_id").isNull()
    return out.agg(
        F.count(F.when(m, 1)).alias("pair_cnt"),
        F.round(F.sum(F.when(m, F.col("c_value") + F.col("v_value"))), 2).alias("sum_matched"),
        F.count(F.when(lo, 1)).alias("left_null_cnt"),
        F.round(F.sum(F.when(lo, F.col("c_value"))), 2).alias("sum_left_unmatched"),
        F.count(F.when(ro, 1)).alias("right_null_cnt"),
        F.round(F.sum(F.when(ro, F.col("v_value"))), 2).alias("sum_right_unmatched"),
    )


@probe(
    "wm6_stream_static_join",
    oracle=(
        "WITH dim AS (SELECT DISTINCT user_id, user_id % 5 AS segment FROM events) "
        "SELECT segment, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_value "
        "FROM events e JOIN dim d ON e.user_id = d.user_id "
        "GROUP BY segment ORDER BY segment"
    ),
    tags=("streaming",),
)
def wm6(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-static join shape: events joined to a small derived user
    dimension (broadcast side), aggregated per segment."""
    ensure_session_confs(spark)
    e = table(spark, sf, "events")
    return stream_static_join(e, user_segments(e)).orderBy("segment")


_REPLAY_ORACLE = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS rp_n, "
    "CAST(COUNT(DISTINCT event_id) AS BIGINT) AS rp_distinct, "
    "CAST(SUM(event_id) AS BIGINT) AS rp_id_sum, "
    "CAST(SUM(user_id) AS BIGINT) AS rp_user_sum FROM events"
)


@probe(
    "ws6_replay_source_stream",
    oracle=_REPLAY_ORACLE,
    tags=("streaming", "source"),
)
def ws6_replay_source_stream(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming Python DataSource end-to-end (sources/
    replay_datasource.py): the parquet event log replays through a REAL
    StreamingQuery in deterministic micro-batches into a memory sink;
    the drained sink's aggregates must equal the direct relational read
    EXACTLY (every event exactly once, none invented — the offset
    bookkeeping is the thing under test). Python streaming sources
    don't support Trigger.AvailableNow, so the probe drives a
    processing-time trigger and polls the sink to the known row count.

    Batch sizing is a pure throughput knob (the replayed multiset is
    batch-independent): the probe caps the replay at ~4 micro-batches
    per SF (each batch costs a full source-planning + trigger round
    trip — 25 of them at sf0.1 measured ~8-9s of almost pure trigger
    overhead, the ws7 rationale). Many-small-batch exactness itself is
    pinned by tests/test_replay_source.py, which drives the same source
    through small fixed batches."""
    import time as _time
    import uuid as _uuid

    from ensembl_database_loader_spark.sources.replay_datasource import (
        EventReplayDataSource,
    )

    ensure_session_confs(spark)
    try:
        spark.dataSource.register(EventReplayDataSource)
    except Exception:
        pass  # already registered in this session
    path = f"{sf.rstrip('/')}/events.parquet"
    expect = spark.read.parquet(path).count()
    batch_rows = max(4000, -(-expect // 4))  # >=2 real batches at sf>=0.01
    name = f"edl_replay_{_uuid.uuid4().hex[:8]}"
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="edl_replay_ckpt_")
    q = (
        spark.readStream.format("event_replay")
        .option("path", path)
        .option("batch_rows", batch_rows)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = _time.time() + 180
        while _time.time() < deadline:
            n = spark.sql(f"SELECT COUNT(*) FROM {name}").collect()[0][0]
            if n >= expect:
                break
            _time.sleep(0.1)
    finally:
        q.stop()
        q.awaitTermination(30)
    return spark.sql(
        f"SELECT CAST(COUNT(*) AS BIGINT) AS rp_n, "
        f"CAST(COUNT(DISTINCT event_id) AS BIGINT) AS rp_distinct, "
        f"CAST(SUM(event_id) AS BIGINT) AS rp_id_sum, "
        f"CAST(SUM(user_id) AS BIGINT) AS rp_user_sum FROM {name}"
    )


_VALIDATE_ORACLE = (
    # relational recomputation of the row-routed validation: rules are
    # row-decidable, so batch boundaries cannot change the routing
    "WITH tagged AS (SELECT event_id, value, event_type, "
    "(event_type IS NOT NULL AND event_type NOT IN "
    "('click', 'purchase', 'signup', 'view')) AS v_type, "
    "(value IS NOT NULL AND (value < 0.0 OR value > 300.0)) AS v_range, "
    "(event_id IS NULL) AS v_null FROM events) "
    "SELECT CAST(COUNT(*) FILTER (WHERE NOT (v_type OR v_range OR v_null)) "
    "AS BIGINT) AS good_rows, "
    "CAST(SUM(event_id) FILTER (WHERE NOT (v_type OR v_range OR v_null)) "
    "AS BIGINT) AS good_id_sum, "
    "CAST(COUNT(*) FILTER (WHERE v_type OR v_range OR v_null) AS BIGINT) "
    "AS quarantined_rows, "
    "CAST(COUNT(*) FILTER (WHERE v_type) AS BIGINT) AS viol_event_type, "
    "CAST(COUNT(*) FILTER (WHERE v_range) AS BIGINT) AS viol_value, "
    "CAST(COUNT(*) FILTER (WHERE v_null) AS BIGINT) AS viol_event_id "
    "FROM tagged"
)


@probe(
    "ws7_streaming_validation_gate",
    oracle=_VALIDATE_ORACLE,
    tags=("streaming", "quality", "expectations", "live-stream"),
)
def ws7_streaming_validation_gate(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming expectation gate end-to-end (streaming/validate.py):
    the event log replays through the event_replay Python DataSource in
    deterministic 4000-row micro-batches; every batch is checked
    against a 3-rule suite (accepted event types, value range, non-null
    id) and row-routed — clean rows to the GOOD manifest table,
    offenders to QUARANTINE tagged with the broken rules, per-batch
    verdicts to the report table, all exactly-once manifest commits.
    Because the rules are row-decidable the routing is
    BATCH-INDEPENDENT, so the drained tables must match the oracle's
    direct relational recomputation exactly — the live data-quality
    gate provably equals its batch contract. Quarantine per-rule counts
    come from the cumulative report summary (the triage dashboard)."""
    import tempfile
    import time as _time

    from ensembl_database_loader_spark.operators.expectations import (
        expect_in_range,
        expect_not_null,
        expect_values_in,
    )
    from ensembl_database_loader_spark.sinks.manifest import (
        snapshot,
        table_row_count,
    )
    from ensembl_database_loader_spark.sources.replay_datasource import (
        EventReplayDataSource,
    )
    from ensembl_database_loader_spark.streaming.validate import (
        streaming_validate,
        validation_summary,
    )

    ensure_session_confs(spark)
    try:
        spark.dataSource.register(EventReplayDataSource)
    except Exception:
        pass  # already registered in this session
    path = f"{sf.rstrip('/')}/events.parquet"
    expect_n = spark.read.parquet(path).count()
    # row routing is batch-independent, so the batch size is a pure
    # throughput knob: cap the replay at 2 micro-batches per SF (each
    # batch costs a source materialization + three manifest commits;
    # multi-batch exactness itself is pinned by the pytest gate, which
    # drives many small batches through the same code)
    batch_rows = max(4000, -(-expect_n // 2))
    root = tempfile.mkdtemp(prefix="edl_ws7_")
    good_p, quar_p, rep_p = f"{root}/good", f"{root}/quarantine", f"{root}/report"

    suite = [
        expect_values_in("event_type", ("click", "purchase", "signup", "view")),
        expect_in_range("value", 0.0, 300.0),
        expect_not_null("event_id"),
    ]
    stream = (
        spark.readStream.format("event_replay")
        .option("path", path)
        .option("batch_rows", batch_rows)
        .load()
        .select("event_id", "user_id", "event_type", "value")
    )
    q = streaming_validate(
        stream, suite, good_p, quar_p, rep_p, f"{root}/ckpt",
        available_now=False,
    )
    # python streaming sources don't support availableNow: poll the
    # manifest row counts (metadata-only) until EVERY batch's commits
    # have landed, then stop. The report table is committed LAST per
    # batch, so gating on its row count (n_rules per non-empty batch)
    # guarantees no stop() races an in-flight commit of the final batch
    # (an early stop cancels the write and the report never appears).
    n_batches = -(-expect_n // batch_rows)  # ceil
    try:
        deadline = _time.time() + 180
        while _time.time() < deadline:
            try:
                routed = table_row_count(spark, good_p) + table_row_count(
                    spark, quar_p
                )
                reported = table_row_count(spark, rep_p)
            except FileNotFoundError:
                routed, reported = 0, 0
            if routed >= expect_n and reported >= len(suite) * n_batches:
                break
            _time.sleep(0.1)
    finally:
        q.stop()
        q.awaitTermination(30)

    good = snapshot(spark, good_p).agg(
        F.count(F.lit(1)).cast("bigint").alias("good_rows"),
        F.sum("event_id").cast("bigint").alias("good_id_sum"),
    )
    quar = snapshot(spark, quar_p).agg(
        F.count(F.lit(1)).cast("bigint").alias("quarantined_rows")
    )
    per_rule = (
        validation_summary(spark, rep_p)
        .groupBy()
        .pivot(
            "rule",
            ["values_in:event_type", "in_range:value", "not_null:event_id"],
        )
        .sum("total_violations")
        .select(
            F.col("`values_in:event_type`").cast("bigint").alias("viol_event_type"),
            F.col("`in_range:value`").cast("bigint").alias("viol_value"),
            F.col("`not_null:event_id`").cast("bigint").alias("viol_event_id"),
        )
    )
    return good.crossJoin(quar).crossJoin(per_rule)


def _drift_feed(src_path: str, feed_path: str, n_scaled: int) -> int:
    """Write the ws8/ws9 replay feed — the event log plus ``n_scaled``
    re-scaled (value*10 + 500) copies, keyed by a per-block ``seq`` —
    DRIVER-SIDE via pyarrow, zero engine jobs; returns the block size n.

    The replay source reads ONE parquet file (pq.read_table), so this
    replaces a Spark sort+union+toPandas round trip per feed write
    (~0.7-1.0 s each at sf0.1) with a direct columnar build. Rows are
    identical to the previous Spark construction: each block is a FULL
    copy of the log (seq only orders rows within a block, and block
    boundaries fall on multiples of n, so seq tie-order is
    content-neutral), and the scaled value is the same IEEE
    multiply-then-add over the same float64 inputs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(src_path, columns=["event_id", "event_type", "value"])
    t = t.take(pc.sort_indices(t, sort_keys=[("event_id", "ascending")]))
    n = t.num_rows
    evid, etype, val = t.column(0), t.column(1), t.column(2)
    scaled = pc.add(pc.multiply(val, pa.scalar(10.0)), pa.scalar(500.0))
    blocks = []
    for k in range(n_scaled + 1):
        blocks.append(
            pa.table(
                {
                    "seq": pa.array(np.arange(k * n, (k + 1) * n, dtype=np.int64)),
                    "event_id": evid,
                    "event_type": etype,
                    "value": val if k == 0 else scaled,
                }
            )
        )
    pq.write_table(pa.concat_tables(blocks), feed_path)
    return n


_DRIFT_GATE_ORACLE = (
    # relational recompute: the clean batch (the reference data itself)
    # row-routes by the 3 rules; the drifted batch (value*10 + 500)
    # quarantines wholesale, so quarantine = clean-batch offenders +
    # one full copy of the log
    "WITH base AS (SELECT event_id, event_type, value FROM events), "
    "t AS (SELECT *, (event_type IS NOT NULL AND event_type NOT IN "
    "('click', 'purchase', 'signup', 'view')) AS v_type, "
    "(value IS NOT NULL AND (value < 0.0 OR value > 300.0)) AS v_range, "
    "(event_id IS NULL) AS v_null FROM base) "
    "SELECT CAST(COUNT(*) FILTER (WHERE NOT (v_type OR v_range OR v_null)) "
    "AS BIGINT) AS gd_good_rows, "
    "CAST(SUM(event_id) FILTER (WHERE NOT (v_type OR v_range OR v_null)) "
    "AS BIGINT) AS gd_good_id_sum, "
    "CAST(COUNT(*) FILTER (WHERE v_type OR v_range OR v_null) "
    "+ (SELECT COUNT(*) FROM base) AS BIGINT) AS gd_quar_rows, "
    "TRUE AS gd_clean_batch_ok, TRUE AS gd_drift_flags_ok "
    "FROM t"
)


@probe(
    "ws8_streaming_drift_gate",
    oracle=_DRIFT_GATE_ORACLE,
    tags=("streaming", "quality", "drift", "live-stream"),
)
def ws8_streaming_drift_gate(spark: SparkSession, sf: str) -> DataFrame:
    """SHAPE monitor composed INTO the quality gate end-to-end
    (streaming/drift.streaming_drift_gate): a reference PSI profile is
    pinned from the event log; a two-batch feed replays through the
    event_replay Python DataSource — batch 0 is the log itself
    (in-distribution), batch 1 the same rows with ``value*10 + 500``
    (a silently re-scaled source). The gate PSI-checks each micro-batch
    against the pinned profile BEFORE row-routing: the clean batch
    row-routes through the 3-rule expectation suite exactly like ws7,
    the drifted batch quarantines WHOLESALE (every row tagged
    drift:value on top of its own rule tags), and each batch's four
    tables (good/quarantine/report/drift) land as ONE atomic group
    commit, exactly-once under replay.

    Hash-gated against the relational oracle: good rows/id-sum = the
    clean batch's rule-passing rows; quarantine = clean-batch offenders
    + the whole drifted batch. TRUE-gated: batch 0 drifts on NO
    monitored column (the reference data itself — PSI is exactly 0);
    batch 1 drifts on ``value`` but NOT on ``event_type`` (whose
    distribution is unchanged — the monitor localizes WHAT drifted)."""
    import tempfile
    import time as _time

    from ensembl_database_loader_spark.operators.drift import (
        save_drift_profile,
    )
    from ensembl_database_loader_spark.operators.expectations import (
        expect_in_range,
        expect_not_null,
        expect_values_in,
    )
    from ensembl_database_loader_spark.sinks.catalog_commit import read_group
    from ensembl_database_loader_spark.sources.replay_datasource import (
        EventReplayDataSource,
    )
    from ensembl_database_loader_spark.streaming.drift import (
        streaming_drift_gate,
    )

    ensure_session_confs(spark)
    try:
        spark.dataSource.register(EventReplayDataSource)
    except Exception:
        pass  # already registered in this session
    root = tempfile.mkdtemp(prefix="edl_ws8_")
    base = (
        spark.read.parquet(f"{sf.rstrip('/')}/events.parquet")
        .select("event_id", "event_type", "value")
    )
    prof_path = f"{root}/profile"
    save_drift_profile(
        base, prof_path, num_cols=("value",), cat_cols=("event_type",)
    )

    # feed = the log + one re-scaled copy, built driver-side (zero
    # engine jobs — see _drift_feed; rows identical to the previous
    # Spark sort+union+toPandas construction)
    feed_path = f"{root}/feed.parquet"
    n = _drift_feed(f"{sf.rstrip('/')}/events.parquet", feed_path, 1)

    suite = [
        expect_values_in("event_type", ("click", "purchase", "signup", "view")),
        expect_in_range("value", 0.0, 300.0),
        expect_not_null("event_id"),
    ]
    stream = (
        spark.readStream.format("event_replay")
        .option("path", feed_path)
        .option("id_col", "seq")
        .option("batch_rows", n)
        .load()
        .select("event_id", "event_type", "value")
    )
    gate_root = f"{root}/gate"
    q = streaming_drift_gate(
        stream, prof_path, suite, gate_root, f"{root}/ckpt",
        threshold=0.2, available_now=False,
    )
    # python streaming sources don't support availableNow: poll the
    # group's PUBLISHED row counts METADATA-ONLY (root manifest +
    # member manifests' per-file row counts at the pinned versions —
    # zero engine jobs per poll, so polling never competes with the
    # micro-batches for executors, and mid-commit member heads are
    # invisible exactly as with read_group) until both batches routed
    from ensembl_database_loader_spark.sinks.catalog_commit import (
        group_row_counts,
    )

    try:
        deadline = _time.time() + 180
        while _time.time() < deadline:
            try:
                c = group_row_counts(spark, gate_root)
                routed = c["good"] + c["quarantine"]
                drift_rows = c["drift"]
            except FileNotFoundError:
                routed, drift_rows = 0, 0
            if routed >= 2 * n and drift_rows >= 4:
                break
            _time.sleep(0.1)
    finally:
        q.stop()
        q.awaitTermination(30)

    g = read_group(spark, gate_root)
    flags = {
        (r["batch"], r["column"]): r["drifted"] for r in g["drift"].collect()
    }
    # key by ordinal of the distinct batch ids actually observed — a
    # checkpoint replay or an engine-inserted empty micro-batch shifts
    # literal ids, which must read as a failed gate, not a KeyError
    batch_ids = sorted({b for b, _ in flags})
    if len(batch_ids) == 2:
        b0, b1 = batch_ids
        clean_ok = not flags.get((b0, "value"), True) and not flags.get(
            (b0, "event_type"), True
        )
        drift_ok = flags.get((b1, "value"), False) and not flags.get(
            (b1, "event_type"), True
        )
    else:
        clean_ok = drift_ok = False
    good = g["good"].agg(
        F.count(F.lit(1)).cast("bigint").alias("gd_good_rows"),
        F.sum("event_id").cast("bigint").alias("gd_good_id_sum"),
    )
    quar = g["quarantine"].agg(
        F.count(F.lit(1)).cast("bigint").alias("gd_quar_rows")
    )
    return good.crossJoin(quar).select(
        "gd_good_rows",
        "gd_good_id_sum",
        "gd_quar_rows",
        F.lit(bool(clean_ok)).alias("gd_clean_batch_ok"),
        F.lit(bool(drift_ok)).alias("gd_drift_flags_ok"),
    )


_REBASELINE_ORACLE = (
    # three batches: the log (clean vs profile v0), the re-scaled log
    # (drifts, quarantines wholesale), the re-scaled log AGAIN after an
    # approved re-baseline onto the new shape (clean vs profile v1) —
    # good = batches 0 + 2 in full, quarantine = batch 1 in full
    "SELECT CAST((SELECT COUNT(*) * 2 FROM events) AS BIGINT) AS rb_good_rows, "
    "CAST((SELECT SUM(event_id) * 2 FROM events) AS BIGINT) AS rb_good_id_sum, "
    "CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS rb_quar_rows, "
    "TRUE AS rb_flags_ok, TRUE AS rb_replay_noop, TRUE AS rb_audit_ok"
)


@probe(
    "ws9_drift_rebaseline",
    oracle=_REBASELINE_ORACLE,
    tags=("streaming", "quality", "drift", "live-stream", "lake"),
)
def ws9_drift_rebaseline(spark: SparkSession, sf: str) -> DataFrame:
    """APPROVED RE-BASELINE of a running drift gate
    (operators/drift.update_drift_profile): real monitors re-pin their
    reference on an accepted cadence instead of alarming forever on a
    legitimately changed source. The same re-scaled feed that
    quarantined wholesale under profile v0 routes CLEAN after the
    re-baseline publishes profile v1 — picked up by the gate's
    per-batch catalog-version resolution, no monitor surgery.

    Mechanics: profile v0 pins the event log's shape; batch 0 (the log)
    routes clean, batch 1 (value*10 + 500) drifts and quarantines
    wholesale. The gate stops; ``update_drift_profile`` publishes the
    re-scaled shape as catalog version 1 (an atomic bins/edges/meta
    group commit, txn-stamped); the gate RESTARTS from its checkpoint
    and batch 2 — the same re-scaled distribution — now routes clean.
    TRUE-gated: the per-(batch, column) drift verdicts (clean /
    value-only / clean), the replayed re-baseline publishing nothing
    with the version unchanged (exactly-once), and the profile's
    catalog history carrying exactly the two baselines with the
    re-baseline's txn watermark (the audit trail). Row-level: good =
    batches 0+2 in full (count + id-sum), quarantine = batch 1 in
    full. The expectation suite is satisfied by every row (not_null on
    event_id), so drift is the ONLY routing discriminator."""
    import tempfile
    import time as _time

    from ensembl_database_loader_spark.operators.drift import (
        drift_profile_history,
        drift_profile_version,
        save_drift_profile,
        update_drift_profile,
    )
    from ensembl_database_loader_spark.operators.expectations import (
        expect_not_null,
    )
    from ensembl_database_loader_spark.sinks.catalog_commit import read_group
    from ensembl_database_loader_spark.sources.replay_datasource import (
        EventReplayDataSource,
    )
    from ensembl_database_loader_spark.streaming.drift import (
        streaming_drift_gate,
    )

    ensure_session_confs(spark)
    try:
        spark.dataSource.register(EventReplayDataSource)
    except Exception:
        pass  # already registered in this session
    root = tempfile.mkdtemp(prefix="edl_ws9_")
    base = (
        spark.read.parquet(f"{sf.rstrip('/')}/events.parquet")
        .select("event_id", "event_type", "value")
    )
    prof_path = f"{root}/profile"
    save_drift_profile(
        base, prof_path, num_cols=("value",), cat_cols=("event_type",)
    )

    # the re-baseline operator's input: the re-scaled distribution as a
    # Spark frame (seq is irrelevant to profiling — only the value/type
    # distribution matters to update_drift_profile)
    def _scaled_frame():
        return base.select(
            "event_id",
            "event_type",
            (F.col("value") * 10 + 500).alias("value"),
        )

    # feeds built driver-side (zero engine jobs — see _drift_feed;
    # rows identical to the previous Spark sort+union+toPandas path)
    feed_path = f"{root}/feed.parquet"
    src = f"{sf.rstrip('/')}/events.parquet"
    n = _drift_feed(src, feed_path, 1)

    suite = [expect_not_null("event_id")]
    gate_root, ckpt = f"{root}/gate", f"{root}/ckpt"

    def _run(min_routed: int, min_drift_rows: int):
        stream = (
            spark.readStream.format("event_replay")
            .option("path", feed_path)
            .option("id_col", "seq")
            .option("batch_rows", n)
            .load()
            .select("event_id", "event_type", "value")
        )
        q = streaming_drift_gate(
            stream, prof_path, suite, gate_root, ckpt,
            threshold=0.2, available_now=False,
        )
        # metadata-only poll of the group's PUBLISHED row counts (root
        # manifest + member manifests at the pinned versions): zero
        # engine jobs per poll, and mid-commit member heads stay
        # invisible exactly as with read_group
        from ensembl_database_loader_spark.sinks.catalog_commit import (
            group_row_counts,
        )

        try:
            deadline = _time.time() + 180
            while _time.time() < deadline:
                try:
                    c = group_row_counts(spark, gate_root)
                    routed = c["good"] + c["quarantine"]
                    drift_rows = c["drift"]
                except FileNotFoundError:
                    routed, drift_rows = 0, 0
                if routed >= min_routed and drift_rows >= min_drift_rows:
                    break
                _time.sleep(0.1)
        finally:
            q.stop()
            q.awaitTermination(30)

    _run(2 * n, 4)  # batches 0 (clean) + 1 (drifted, quarantined)

    # the approved re-baseline: the re-scaled shape becomes profile v1
    m1 = update_drift_profile(_scaled_frame(), prof_path, txn=("rebaseline", 1))
    v1 = drift_profile_version(spark, prof_path)
    replay = update_drift_profile(_scaled_frame(), prof_path, txn=("rebaseline", 1))
    replay_noop = (
        m1 is not None
        and replay is None
        and drift_profile_version(spark, prof_path) == v1
    )
    hist = drift_profile_history(spark, prof_path)
    audit_ok = (
        len(hist) == 2
        and int(hist[-1].get("txn", {}).get("rebaseline", -1)) == 1
    )

    # batch 2: the same re-scaled distribution, now in-baseline
    _drift_feed(src, feed_path, 2)
    _run(3 * n, 6)

    g = read_group(spark, gate_root)
    flags = {
        (r["batch"], r["column"]): r["drifted"] for r in g["drift"].collect()
    }
    batch_ids = sorted({b for b, _ in flags})
    if len(batch_ids) == 3:
        b0, b1, b2 = batch_ids
        flags_ok = (
            not flags.get((b0, "value"), True)
            and not flags.get((b0, "event_type"), True)
            and flags.get((b1, "value"), False)
            and not flags.get((b1, "event_type"), True)
            and not flags.get((b2, "value"), True)
            and not flags.get((b2, "event_type"), True)
        )
    else:
        flags_ok = False
    good = g["good"].agg(
        F.count(F.lit(1)).cast("bigint").alias("rb_good_rows"),
        F.sum("event_id").cast("bigint").alias("rb_good_id_sum"),
    )
    quar = g["quarantine"].agg(
        F.count(F.lit(1)).cast("bigint").alias("rb_quar_rows")
    )
    return good.crossJoin(quar).select(
        "rb_good_rows",
        "rb_good_id_sum",
        "rb_quar_rows",
        F.lit(bool(flags_ok)).alias("rb_flags_ok"),
        F.lit(bool(replay_noop)).alias("rb_replay_noop"),
        F.lit(bool(audit_ok)).alias("rb_audit_ok"),
    )
