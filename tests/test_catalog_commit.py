"""Cross-table atomic commits (sinks/catalog_commit.py): group readers
see complete cycles only, pinned roots survive later commits, replay
is exactly-once for the WHOLE group, and stray member versions (a
crash between member writes and root publication) stay invisible."""

from __future__ import annotations

import pytest

from ensembl_database_loader_spark.sinks.catalog_commit import (
    commit_group,
    group_history,
    read_group,
)
from ensembl_database_loader_spark.sinks.manifest import write_table


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v int")


def test_group_commit_read_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "grp")
    m0 = commit_group(
        spark, root, {"good": _df(spark, [1, 2]), "report": _df(spark, [10])},
        txn=("cycle", 0),
    )
    assert m0["tables"] == {"good": 0, "report": 0}
    m1 = commit_group(
        spark, root, {"good": _df(spark, [3]), "report": _df(spark, [20])},
        txn=("cycle", 1),
    )
    assert m1["version"] == 1
    g = read_group(spark, root)
    assert sorted(r.v for r in g["good"].collect()) == [1, 2, 3]
    assert sorted(r.v for r in g["report"].collect()) == [10, 20]
    # time travel the WHOLE group
    g0 = read_group(spark, root, version=0)
    assert sorted(r.v for r in g0["good"].collect()) == [1, 2]
    assert sorted(r.v for r in g0["report"].collect()) == [10]
    hist = group_history(spark, root)
    assert [h["version"] for h in hist] == [0, 1]


def test_group_replay_skips_everything(spark, tmp_path):
    root = str(tmp_path / "grp")
    commit_group(spark, root, {"t": _df(spark, [1])}, txn=("c", 0))
    # replay of cycle 0: no root, AND no member-table write
    assert commit_group(spark, root, {"t": _df(spark, [1])}, txn=("c", 0)) is None
    g = read_group(spark, root)
    assert [r.v for r in g["t"].collect()] == [1]
    assert len(group_history(spark, root)) == 1


def test_stray_member_versions_invisible_and_repaired(spark, tmp_path):
    """Simulate a crash AFTER member writes, BEFORE root publication:
    the stray table version is invisible to group readers, and the
    replayed cycle repairs the group end-to-end."""
    root = str(tmp_path / "grp")
    commit_group(spark, root, {"t": _df(spark, [1])}, txn=("c", 0))
    # 'crashed cycle 1': member written WITH the cycle txn, root never
    # published
    write_table(_df(spark, [2]), f"{root}/t", mode="append", txn=("c", 1))
    g = read_group(spark, root)
    assert [r.v for r in g["t"].collect()] == [1]  # stray invisible
    # replay cycle 1: the member write SKIPS (txn watermark) and the
    # root pins the crashed write's version — exactly-once, no
    # duplicated member rows
    commit_group(spark, root, {"t": _df(spark, [2])}, txn=("c", 1))
    g = read_group(spark, root)
    assert sorted(r.v for r in g["t"].collect()) == [1, 2]


def test_group_guards(spark, tmp_path):
    root = str(tmp_path / "grp")
    with pytest.raises(ValueError, match="no tables"):
        commit_group(spark, root, {})
    with pytest.raises(ValueError, match="invalid table rel"):
        commit_group(spark, root, {"_catalog": _df(spark, [1])})
    with pytest.raises(FileNotFoundError, match="no group commit"):
        read_group(spark, root)
