"""The driver's correctness harness checks exactly the first 50 probes
of all_probes() order — these tests pin that every declared SURVEY §2.3
capability and every LLM-pipeline operator probe sits inside that
window, and that the merged composites cover the probe IDs their names
claim."""

from __future__ import annotations

import re

from ensembl_database_loader_spark.plans import all_probes
from ensembl_database_loader_spark.plans.merged import MERGE_SPECS
from ensembl_database_loader_spark.plans.registry import WINDOW_50


def test_window_is_exactly_50_and_first():
    assert len(WINDOW_50) == 50
    assert len(set(WINDOW_50)) == 50
    names = list(all_probes())
    assert tuple(names[:50]) == WINDOW_50


def test_every_declared_probe_id_has_a_window_row():
    """Q01–Q40, WM1–WM6, LL1–LL5: each declared ID must appear in some
    window probe's name (directly or via a merged composite)."""
    covered = set()
    for name in WINDOW_50:
        for m in re.finditer(r"(q\d{2}|wm\d|ll\d)", name):
            covered.add(m.group(1))
    declared = (
        [f"q{i:02d}" for i in range(1, 41)]
        + [f"wm{i}" for i in range(1, 7)]
        + [f"ll{i}" for i in range(1, 6)]
    )
    missing = [d for d in declared if d not in covered]
    assert not missing, f"declared probes outside the 50-window: {missing}"


def test_llm_operator_probes_in_window():
    for name in (
        "dd_minhash_lsh",
        "dd_simhash_banded",
        "dd_simhash64_idf",
        # r7: embedding near-dup and the LSH planted-near-dup contract
        # ride the window via composites that add SemDeDup's ANN paths
        # and the clustered recall@5 gates
        "dd_embedding_neardup_semantic",
        "dd_connected_components",
        "llp_curation_funnel",
        "llp_incremental_dedup",
        "ss_ann_lsh_recall",
        "ss_ann_ivf_indexed",
        "tx_langid_lm",
        # r6: token-counts/fingerprint and the two mm probes ride the
        # window via their merged composites (components stay
        # registered and locally oracle-checked)
        "tx_tokens_fingerprint",
        "mm_decode_frames",
    ):
        assert name in WINDOW_50


def test_flagship_probes_in_window_with_oracles():
    """Round-4 rotation: the flagship composites carry HARD driver
    verification (hash-exact vs DuckDB), not just local parity."""
    probes = all_probes()
    for name in (
        "dd_simhash64_idf",
        "dd_connected_components",
        "llp_curation_funnel",
        "q49_exact_median",
        "q50_bucketed_join",
    ):
        assert name in WINDOW_50
        assert probes[name].oracle is not None


def test_merged_components_stay_registered_with_oracles():
    probes = all_probes()
    for merged_name, spec in MERGE_SPECS.items():
        assert merged_name in probes
        assert probes[merged_name].oracle is not None
        for component, _ in spec:
            assert component in probes, f"{merged_name} component {component} gone"
            assert probes[component].oracle is not None


def test_merged_output_columns_unique():
    for merged_name, spec in MERGE_SPECS.items():
        out_cols = [dst for _, cols in spec for _, dst in cols]
        assert len(out_cols) == len(set(out_cols)), merged_name
