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


def probe(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a probe. ``oracle=None`` => rows-only check."""

    def deco(fn: SparkFn) -> SparkFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate probe name: {name}")
        _REGISTRY[name] = Probe(name, fn, oracle, fn.__doc__ or "", tuple(tags))
        return fn

    return deco


def all_probes() -> dict[str, Probe]:
    return dict(_REGISTRY)


def get(name: str) -> Probe:
    return _REGISTRY[name]
