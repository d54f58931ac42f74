"""Probe registry: the contract between the engine and the correctness
driver (__spark_entry__.queries / oracle_sql).

Each probe is a named query: a PySpark callable ``(spark, sf_dir) ->
DataFrame`` plus (usually) an equivalent ANSI-SQL string DuckDB can run
over the same parquet tables. Probes without an oracle (approximate /
sampled / genuinely non-SQL ops) get the driver's weaker rows-only check.

Determinism rules (FIXTURES.md §3): outputs are either aggregates over
unordered sets or totally ordered with a unique tie-break key; every
DOUBLE output is wrapped in ROUND(x, 2) (or coarser); integer outputs are
cast to BIGINT on both sides (DuckDB SUM(int) would otherwise widen to
HUGEINT); no raw timestamp columns are emitted (formatted strings
instead, so engine timestamp-type differences can't leak into the hash).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Probe:
    name: str
    spark_fn: SparkFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Probe] = {}

#: The first 50 probes the correctness driver checks, in order. Every
#: SURVEY §2.3-declared capability (Q01–Q40 via merged composites,
#: WM1–WM6, LL1–LL5) plus the LLM-pipeline operator probes (dd_*, tx_*,
#: mm_*, ss_ann) AND the flagship composites (weighted idf SimHash,
#: connected components, curation funnel, bucketed-sink join, exact
#: median) must sit inside this window; extension probes (q41–q48, the
#: pre-merge originals, alternate-implementation probes) register after
#: it and keep their local oracle-parity checks.
#:
#: r11 window riders (names unchanged; the composites' SPECS grew so
#: the round-10/11 flagships carry hard driver hash rows): the
#: streaming drift gate + re-baseline ride q16_q31's DQ row beside
#: dq_drift_psi; semantic decontamination rides tx_decontam_pii; DSIR
#: rides tx_langid_lm; batch-indexed ANN and the manifest-backed index
#: ride ss_ann_lsh_recall. (The wm-family slots stay pure: their names
#: are baseline-shared bench identities.)
#:
#: r12.2 riders: incremental index sync (ss_index_sync — CDC-driven
#: ANN + BM25 maintenance, one value-exact fingerprint row) rides
#: ss_ann_lsh_recall; incremental replication + the O(delta) row
#: change feed (llp_manifest_replica) rides q18_q20's lake row.
WINDOW_50: tuple[str, ...] = (
    "q01_q03_scan_projection",
    "q02_tsv_roundtrip",
    "q04_q05_q06_filter_family",
    "q07_join_broadcast",
    "q08_join_shuffle",
    "q09_q10_outer_joins",
    "q11_q12_semi_anti_join",
    "q13_q14_range_cross_join",
    "q15_tpch_q1",
    "q16_q31_distinct_date_fns",
    "q17_q37_approx_sketch",
    "q18_q20_condagg_having",
    "q19_rollup",
    "q21_sort_multikey",
    "q22_topk",
    "q23_q24_q25_window_family",
    "q26_q27_set_ops",
    "q28_q29_subqueries",
    "q30_q32_string_math_fns",
    "q33_q34_case_array_fns",
    "q35_q36_json_casts",
    "tx_decontam_pii",
    "q38_q39_udf_family",
    "llp_mix_packing",
    "q40_posexplode",
    "q49_exact_median",
    "q50_bucketed_join",
    "wm1_tumbling_window",
    "wm2_sliding_window",
    "wm3_session_window",
    "wm4_watermark_stream",
    "wm5_stateful_dedup",
    "wm6_stream_static_join",
    "ll1_exact_dedup",
    "ll2_ngram_jaccard",
    "ll3_cosine_topk",
    "ll4_token_stats",
    "ll5_quality_filter",
    "dd_minhash_lsh",
    "dd_simhash_banded",
    "dd_simhash64_idf",
    # r7 rotation: the embedding-dedup row now carries SemDeDup's exact
    # AND ANN-candidate paths; the LSH row adds the clustered-fixture
    # recall@5 gates (components stay registered + locally checked)
    "dd_embedding_neardup_semantic",
    "dd_connected_components",
    "llp_curation_funnel",
    "llp_incremental_dedup",
    "ss_ann_lsh_recall",
    "ss_ann_ivf_indexed",
    # r7: langid rides with the bigram-LM perplexity scorer
    "tx_langid_lm",
    "tx_tokens_fingerprint",
    "mm_decode_frames",
)


def probe(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a probe. ``oracle=None`` => rows-only check."""

    def deco(fn: SparkFn) -> SparkFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate probe name: {name}")
        _REGISTRY[name] = Probe(name, fn, oracle, fn.__doc__ or "", tuple(tags))
        return fn

    return deco


def all_probes() -> dict[str, Probe]:
    """Registered probes, WINDOW_50 first (in window order), then the
    rest in registration order — the dict order IS the driver's
    correctness-check order."""
    window = {n: _REGISTRY[n] for n in WINDOW_50 if n in _REGISTRY}
    rest = {n: p for n, p in _REGISTRY.items() if n not in window}
    return {**window, **rest}


def get(name: str) -> Probe:
    return _REGISTRY[name]
