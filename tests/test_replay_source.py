"""Streaming Python DataSource (sources/replay_datasource.py):
deterministic offset replay of a parquet log through a real
StreamingQuery."""

from __future__ import annotations

import time

import pytest

from ensembl_database_loader_spark.sources.replay_datasource import (
    EventReplayDataSource,
    _ReplayReader,
)

SF = "/root/testdata/sf0.001"


def _register(spark):
    try:
        spark.dataSource.register(EventReplayDataSource)
    except Exception:
        pass  # already registered in this session


def test_replay_reader_offsets_are_deterministic():
    r = _ReplayReader({"path": f"{SF}/events.parquet", "batch_rows": 100})
    assert r.initialOffset() == {"row": 0}
    rows1, off1 = r.read({"row": 0})
    rows1 = list(rows1)
    assert off1 == {"row": 100} and len(rows1) == 100
    # replay of the committed range is identical — the checkpoint
    # recovery contract
    assert list(r.readBetweenOffsets({"row": 0}, {"row": 100})) == rows1
    # event_id order makes batch boundaries a pure function of position
    ids = [row[0] for row in rows1]
    assert ids == sorted(ids)
    # drained log: empty batch at the same offset
    r2 = _ReplayReader({"path": f"{SF}/events.parquet", "batch_rows": 10**9})
    _, off = r2.read({"row": 0})
    rows, off2 = r2.read(off)
    assert list(rows) == [] and off2 == off
    with pytest.raises(ValueError, match="batch_rows"):
        _ReplayReader({"path": "x", "batch_rows": 0})


def test_replay_stream_end_to_end(spark, tmp_path):
    _register(spark)
    stream = (
        spark.readStream.format("event_replay")
        .option("path", f"{SF}/events.parquet")
        .option("batch_rows", 400)
        .load()
    )
    assert stream.isStreaming
    # python streaming sources don't support Trigger.AvailableNow
    # (Spark falls back to ONE batch) — run continuous micro-batches
    # and stop once the sink has drained the log
    q = (
        stream.writeStream.format("memory")
        .queryName("replay_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    expect = spark.read.parquet(f"{SF}/events.parquet").count()
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT COUNT(*) FROM replay_sink").collect()[0][0] >= expect:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    # more than one micro-batch actually ran (batch_rows < total rows)
    assert q.lastProgress is not None and q.lastProgress["batchId"] >= 2
    got = spark.sql(
        "SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d, "
        "CAST(SUM(event_id) AS BIGINT) AS s FROM replay_sink"
    ).collect()[0]
    ref = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "COUNT(*) AS n", "CAST(SUM(event_id) AS BIGINT) AS s"
    ).collect()[0]
    # every row exactly once, multiple micro-batches
    assert (got.n, got.d, got.s) == (ref.n, ref.n, ref.s)
