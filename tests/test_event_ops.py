

def test_rolling_anomalies_flags_spike_not_baseline(spark):
    """A 10x spike after a stable week alarms; stable days don't; the
    spike day's own count never pollutes its baseline; flat baselines
    (std 0) yield null z and no alarm."""
    import datetime as dt

    import pytest

    from ensembl_database_loader_spark.operators.events import (
        rolling_anomalies,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # key 'a': days 0-7 have 10±1 events (varying), day 8 has 100
    per_day = [10, 11, 9, 10, 11, 9, 10, 11, 100]
    for d, n in enumerate(per_day):
        for _ in range(n):
            rows.append(("a", base + dt.timedelta(days=d, seconds=eid % 80000)))
            eid += 1
    # key 'b': perfectly flat 5/day -> std 0 -> never anomalous
    for d in range(9):
        for _ in range(5):
            rows.append(("b", base + dt.timedelta(days=d, seconds=eid % 80000)))
            eid += 1
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {
        (r.key, r.day): r
        for r in rolling_anomalies(df, trailing=7, z_threshold=3.0).collect()
    }
    d0 = min(d for k, d in out if k == "a")
    spike = out[("a", d0 + 8)]
    assert spike.anomalous and spike.z > 3.0
    assert spike.cnt == 100 and spike.n_base == 7
    # baseline mean excludes the spike day itself
    assert 9.0 <= spike.base_mean <= 11.5
    # a normal mid-week day is quiet
    assert not out[("a", d0 + 5)].anomalous
    # first day has no baseline at all
    assert out[("a", d0)].z is None and not out[("a", d0)].anomalous
    # flat key: std 0 -> null z, never anomalous
    assert all(
        out[(k, d)].z is None and not out[(k, d)].anomalous
        for (k, d) in out
        if k == "b"
    )
    with pytest.raises(ValueError, match="trailing"):
        rolling_anomalies(df, trailing=1)
