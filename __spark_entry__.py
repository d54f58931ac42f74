"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape, probe
q15_tpch_q1) on sf0.001. ``queries()`` / ``oracle_sql()`` expose the
full probe registry from ensembl_database_loader_spark.plans — each
probe is a (PySpark callable, DuckDB-SQL oracle) pair; probes without
an oracle (approximate/sampled ops) get the rows-only check.

Ordering contract: the FIRST 50 entries (registry.WINDOW_50) cover the
complete declared surface — Q01–Q40 (same-shaped single-row probes
fused into composites named for the IDs they cover, e.g.
``q04_q05_q06_filter_family``; components stay individually registered
and oracle-checked after the window), WM1–WM6, LL1–LL5, the
dedup/similarity/text/multimodal operator probes, and the flagship
composites (idf SimHash, connected components, curation funnel +
incremental dedup, materialized ANN index, ANN-candidate SemDeDup +
clustered recall@5 gates, decontamination + PII scrub, data mixing +
sequence packing, bucketed-sink join, exact median). Entries after position 50 are the un-merged originals plus
extensions (q41–q48, alternate implementations, live-stream probes,
the end-to-end training pipeline, streaming incremental curation,
chunking/UDTF, and distributed BPE training).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ensembl_database_loader_spark.plans import all_probes  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    probes = all_probes()
    return probes["q15_tpch_q1"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: p.spark_fn for name, p in all_probes().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted => rows-only check)."""
    return {name: p.oracle for name, p in all_probes().items() if p.oracle is not None}
