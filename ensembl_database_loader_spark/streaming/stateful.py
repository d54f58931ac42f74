"""Custom stateful streaming operator via applyInPandasWithState —
the escape hatch for semantics Spark's built-in streaming aggregations
can't express (the brief's 'custom stateful operators' surface).

The example operator is a per-user running profile: cumulative event
count, cumulative value sum, and the last-seen timestamp, emitted per
micro-batch with a processing-time timeout to expire idle users (state
size stays bounded — the watermark analogue for custom state at
100 TB of events)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "cnt BIGINT, total DOUBLE, last_seen TIMESTAMP"
OUTPUT_SCHEMA = "user_id BIGINT, cnt BIGINT, total DOUBLE, last_seen TIMESTAMP"


def _make_update_user_profile(expire_idle_ms: int):
    def _update_user_profile(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        cnt, total, last_seen = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            last_seen = batch_max if last_seen is None else max(last_seen, batch_max)
        state.update((cnt, float(total), last_seen))
        if expire_idle_ms:
            state.setTimeoutDuration(expire_idle_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "cnt": [cnt],
                "total": [total],
                "last_seen": [last_seen],
            }
        )

    return _update_user_profile


def running_user_profile(events: DataFrame, expire_idle_ms: int = 0) -> DataFrame:
    """Per-user running (count, sum(value), last ts) as a custom
    stateful operator. Input must be a STREAMING DataFrame with
    (user_id, ts, value); grouping shuffles once on user_id, state
    lives in the state store keyed by user.

    ``expire_idle_ms > 0`` enables ProcessingTimeTimeout state expiry
    (the watermark analogue for custom state — mandatory for unbounded
    production streams, or the store grows with every user ever seen).
    The default is NoTimeout because an availableNow/bounded drain with
    pending processing-time timeouts never terminates — Spark keeps the
    query alive to fire expirations (observed: a 15-user fixture ran to
    completion in seconds, then idled until awaitTermination gave up)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if expire_idle_ms
        else GroupStateTimeout.NoTimeout
    )
    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandasWithState(
        _make_update_user_profile(expire_idle_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
