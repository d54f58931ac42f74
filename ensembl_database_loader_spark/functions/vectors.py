"""Dense-vector math over ARRAY<FLOAT> columns using Spark higher-order
functions (zip_with / aggregate) — JVM-side, no Python round-trips.

The accumulation is a sequential left fold in DOUBLE, which matches
DuckDB's list_dot_product over a DOUBLE-cast list element-for-element,
so cosine probes hash-match after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
