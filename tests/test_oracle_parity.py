"""Local replica of the driver's t2 correctness gate: every registered
probe's Spark result must match its DuckDB oracle — same columns (sorted
by name), same row count, same values (order-insensitive).

Runs at sf0.001 for speed; the driver runs the same contract at sf0.01.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from ensembl_database_loader_spark.plans import all_probes

PROBES = all_probes()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_bool_dtype(s):
            s = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        elif s.dtype == object:
            s = s.astype(str)
        out[c] = s
    norm = pd.DataFrame(out)
    sort_cols = [c for c in norm.columns if not pd.api.types.is_float_dtype(norm[c])]
    float_cols = [c for c in norm.columns if pd.api.types.is_float_dtype(norm[c])]
    # include rounded floats in the sort for a (near-)total order
    for c in float_cols:
        norm[f"__r_{c}"] = norm[c].round(2)
    norm = norm.sort_values(
        by=sort_cols + [f"__r_{c}" for c in float_cols], kind="mergesort"
    ).reset_index(drop=True)
    return norm.drop(columns=[f"__r_{c}" for c in float_cols])


def assert_frames_match(sp: pd.DataFrame, du: pd.DataFrame, name: str) -> None:
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{name}: column mismatch {sorted(sp.columns)} vs {sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"{name}: row count {len(sp)} vs {len(du)}"
    a, b = _normalize(sp), _normalize(du)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            av = a[c].astype(float).to_numpy()
            bv = b[c].astype(float).to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            close = np.isclose(av, bv, rtol=0, atol=5e-3) | both_nan
            assert close.all(), (
                f"{name}.{c}: value mismatch at rows "
                f"{np.nonzero(~close)[0][:5]}: {av[~close][:5]} vs {bv[~close][:5]}"
            )
        else:
            same = (a[c] == b[c]) | (a[c].isna() & b[c].isna())
            assert same.all(), (
                f"{name}.{c}: mismatch rows {np.nonzero(~same.to_numpy())[0][:5]}: "
                f"{a[c][~same].head(3).tolist()} vs {b[c][~same].head(3).tolist()}"
            )


@pytest.mark.parametrize("name", sorted(PROBES))
def test_probe_matches_oracle(name, spark, duck, sf_dir):
    p = PROBES[name]
    if "merged" in p.tags:
        # Window composites RE-RUN their components and rename columns:
        # every component is parity-checked individually by this same
        # test, the merge structure is gated in test_registry_window,
        # and the composites' own oracles run in scripts/verify_driver
        # (the real driver-replica surface) and by the driver itself —
        # re-executing ~3 minutes of component probes here bought no
        # extra coverage (suite-budget item, VERDICT r12 #4).
        pytest.skip("composite: components parity-checked individually")
    sdf = p.spark_fn(spark, sf_dir)
    sp = sdf.toPandas()
    if p.oracle is None:
        assert len(sp) >= 0  # rows-only contract: just has to run
        # probes that self-assert put a boolean column in the row
        for c in sp.columns:
            if sp[c].dtype == bool and c.startswith(("within", "ok")):
                assert sp[c].all(), f"{name}: self-check column {c} is False"
        return
    du = duck.sql(p.oracle).df()
    assert_frames_match(sp, du, name)
