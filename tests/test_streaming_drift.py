"""streaming/drift.py — live PSI monitoring against a pinned profile:
an in-distribution batch stays quiet, a shifted batch alarms, replay
commits nothing twice, and the batch PSI equals psi_drift exactly."""

from __future__ import annotations

import json
import time

from ensembl_database_loader_spark.operators.drift import (
    load_drift_profile,
    psi_against_profile,
    psi_drift,
    save_drift_profile,
)
from ensembl_database_loader_spark.streaming.drift import (
    drift_history,
    streaming_drift,
)
from ensembl_database_loader_spark.streaming.ingest import stream_documents


def _rows(vals_langs):
    return [
        {"doc_id": i, "lang": lang, "text": "x", "score": float(v)}
        for i, (v, lang) in enumerate(vals_langs)
    ]


def test_profile_roundtrip_equals_direct_psi(spark, tmp_path):
    ref = spark.createDataFrame(
        [(float(i % 40), "l%d" % (i % 3)) for i in range(200)],
        "score double, lang string",
    )
    cur = spark.createDataFrame(
        [(float(i % 40) + 15.0, "l%d" % (i % 4)) for i in range(120)],
        "score double, lang string",
    )
    prof_path = str(tmp_path / "prof")
    save_drift_profile(ref, prof_path, ("score",), ("lang",), bins=10)
    prof = load_drift_profile(spark, prof_path)
    via_profile = {
        r.column: (r.psi, r.n_ref, r.n_cur)
        for r in psi_against_profile(cur, prof).collect()
    }
    direct = {
        r.column: (r.psi, r.n_ref, r.n_cur)
        for r in psi_drift(ref, cur, ("score",), ("lang",)).collect()
    }
    assert via_profile == direct


def test_streaming_drift_alarm_and_replay(spark, tmp_path):
    import shutil

    ref = spark.createDataFrame(
        [(float(i % 40), "en" if i % 2 else "de") for i in range(400)],
        "score double, lang string",
    )
    prof_path = str(tmp_path / "prof")
    save_drift_profile(ref, prof_path, ("score",), ("lang",), bins=10)

    landing = tmp_path / "landing"
    landing.mkdir()
    rep_path = str(tmp_path / "report")
    ckpt = str(tmp_path / "ckpt")

    def _run():
        s = stream_documents(
            spark,
            str(landing),
            schema="doc_id bigint, lang string, text string, score double",
        )
        q = streaming_drift(s, prof_path, rep_path, ckpt, threshold=0.2)
        q.awaitTermination(120)

    # batch 0: in-distribution
    with open(landing / "b1.jsonl", "w") as f:
        f.writelines(
            json.dumps(r) + "\n"
            for r in _rows([(i % 40, "en" if i % 2 else "de") for i in range(100)])
        )
    _run()
    # batch 1: score shifted far right, language mix collapsed
    time.sleep(1.1)
    with open(landing / "b2.jsonl", "w") as f:
        f.writelines(
            json.dumps(r) + "\n"
            for r in _rows([(i % 40 + 100, "zz") for i in range(100)])
        )
    _run()

    hist = {
        (r.batch, r.column): (r.psi, r.drifted)
        for r in drift_history(spark, rep_path).collect()
    }
    assert len(hist) == 4  # 2 batches x 2 columns
    assert not hist[(0, "score")][1] and not hist[(0, "lang")][1]
    assert hist[(1, "score")][1] and hist[(1, "lang")][1]
    assert hist[(1, "score")][0] > 0.2

    # fresh-checkpoint replay: txn watermark rejects duplicate commits
    shutil.rmtree(ckpt)
    _run()
    assert drift_history(spark, rep_path).count() == 4


def test_streaming_drift_gate_quarantines_drifted_batch(spark, tmp_path):
    """Composition gate: a clean batch row-routes by the expectation
    suite; a drifted batch quarantines WHOLESALE with drift:<col> tags
    concatenated onto each row's own rule tags; the four tables land
    atomically per batch; fresh-checkpoint replay commits nothing."""
    import shutil

    from ensembl_database_loader_spark.operators.expectations import (
        expect_in_range,
    )
    from ensembl_database_loader_spark.sinks.catalog_commit import read_group
    from ensembl_database_loader_spark.streaming.drift import (
        streaming_drift_gate,
    )

    ref = spark.createDataFrame(
        [(float(i % 40), "en" if i % 2 else "de") for i in range(400)],
        "score double, lang string",
    )
    prof_path = str(tmp_path / "prof")
    save_drift_profile(ref, prof_path, ("score",), ("lang",), bins=10)

    landing = tmp_path / "landing"
    landing.mkdir()
    root = str(tmp_path / "gate")
    ckpt = str(tmp_path / "ckpt")
    suite = [expect_in_range("score", 0.0, 40.0)]

    def _run():
        s = stream_documents(
            spark,
            str(landing),
            schema="doc_id bigint, lang string, text string, score double",
        )
        q = streaming_drift_gate(s, prof_path, suite, root, ckpt,
                                 threshold=0.2)
        q.awaitTermination(120)

    # batch 0: in-distribution, 4 rule offenders (score = -5)
    vals = [(i % 40, "en" if i % 2 else "de") for i in range(96)]
    vals += [(-5, "en")] * 4
    with open(landing / "b1.jsonl", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in _rows(vals))
    _run()
    # batch 1: shifted far right -> drift on score AND lang collapsed
    time.sleep(1.1)
    with open(landing / "b2.jsonl", "w") as f:
        f.writelines(
            json.dumps(r) + "\n"
            for r in _rows([(i % 40 + 100, "zz") for i in range(50)])
        )
    _run()

    g = read_group(spark, root)
    good = g["good"].collect()
    quar = g["quarantine"].collect()
    drift = {(r.batch, r.column): r.drifted for r in g["drift"].collect()}
    assert len(good) == 96 and all(r.violations == [] for r in good)
    assert len(quar) == 4 + 50
    tags = {tuple(sorted(r.violations)) for r in quar if r.score == -5.0}
    assert tags == {("in_range:score",)}
    drifted_rows = [r for r in quar if r.score >= 100]
    assert len(drifted_rows) == 50
    assert all(
        "drift:score" in r.violations and "drift:lang" in r.violations
        for r in drifted_rows
    )
    assert not drift[(0, "score")] and drift[(1, "score")]
    # expectation report covers both batches
    assert g["report"].count() == 2

    # fresh-checkpoint replay: the group txn rejects duplicate commits
    shutil.rmtree(ckpt)
    _run()
    g2 = read_group(spark, root)
    assert g2["good"].count() == 96 and g2["quarantine"].count() == 54


def test_update_drift_profile_rebaseline_and_audit(spark, tmp_path):
    """An approved re-baseline publishes the NEXT catalog version of
    the profile trio atomically: PSI against the profile flips from
    alarming to quiet, the replayed approval publishes nothing
    (exactly-once), and the catalog history carries both baselines."""
    from ensembl_database_loader_spark.operators.drift import (
        drift_profile_history,
        drift_profile_version,
        update_drift_profile,
    )

    ref = spark.createDataFrame(
        [(float(i % 40), "en" if i % 2 else "de") for i in range(300)],
        "score double, lang string",
    )
    shifted = ref.selectExpr("score * 10 + 500 AS score", "lang")
    prof_path = str(tmp_path / "prof")
    save_drift_profile(ref, prof_path, ("score",), ("lang",), bins=10)
    assert drift_profile_version(spark, prof_path) == 0

    def psi_of(cur):
        prof = load_drift_profile(spark, prof_path)
        return {r.column: r.psi for r in psi_against_profile(cur, prof).collect()}

    before = psi_of(shifted)
    assert before["score"] > 0.2 and before["lang"] == 0.0

    m = update_drift_profile(shifted, prof_path, txn=("approve", 7))
    assert m is not None
    assert drift_profile_version(spark, prof_path) == 1
    after = psi_of(shifted)
    assert after["score"] == 0.0 and after["lang"] == 0.0
    # monitored columns/bins were inherited from the current profile
    _, _, num_cols, cat_cols, bins = load_drift_profile(spark, prof_path)
    assert (num_cols, cat_cols, bins) == (("score",), ("lang",), 10)

    # exactly-once: the replayed approval publishes nothing
    assert update_drift_profile(shifted, prof_path, txn=("approve", 7)) is None
    assert drift_profile_version(spark, prof_path) == 1

    hist = drift_profile_history(spark, prof_path)
    assert len(hist) == 2
    assert int(hist[-1]["txn"]["approve"]) == 7
    # time travel: version 0 of the group still yields the OLD baseline
    from ensembl_database_loader_spark.sinks.catalog_commit import read_group

    g0 = read_group(spark, prof_path, version=0)
    old_total = sum(r.c_ref for r in g0["bins"].collect() if r.column == "score")
    assert old_total == 300


def test_update_drift_profile_requires_txn_and_legacy_upgrade(spark, tmp_path):
    """txn is mandatory (a re-baseline is an audited act); a LEGACY
    profile written table-by-table (no catalog root) reads fine,
    reports version -1, and an update upgrades it to a catalogued one."""
    import pytest

    from ensembl_database_loader_spark.operators.drift import (
        bin_counts,
        drift_profile_version,
        profile_edges,
        update_drift_profile,
    )
    from ensembl_database_loader_spark.sinks.manifest import write_table

    ref = spark.createDataFrame(
        [(float(i % 20),) for i in range(100)], "score double"
    )
    # hand-write the legacy (pre-catalog) layout
    prof_path = str(tmp_path / "legacy")
    edges = profile_edges(ref, ("score",))
    write_table(
        bin_counts(ref, ("score",), (), edges, 10, "c_ref"),
        f"{prof_path}/bins", mode="overwrite",
    )
    write_table(edges, f"{prof_path}/edges", mode="overwrite")
    write_table(
        spark.createDataFrame(
            [("score", "", 10)], "num_cols string, cat_cols string, bins int"
        ),
        f"{prof_path}/meta", mode="overwrite",
    )
    assert drift_profile_version(spark, prof_path) == -1
    prof = load_drift_profile(spark, prof_path)
    assert psi_against_profile(ref, prof).collect()[0].psi == 0.0

    with pytest.raises(ValueError, match="txn is required"):
        update_drift_profile(ref, prof_path, txn=None)

    assert update_drift_profile(ref, prof_path, txn=("approve", 1)) is not None
    assert drift_profile_version(spark, prof_path) == 0
