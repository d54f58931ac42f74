"""Int8 embedding quantization — the ANN storage-scale lever: a 100 TB
float32 embedding store quantized symmetric-per-vector to int8 is 4x
smaller (and int8 GEMM-able), at a bounded reconstruction cost.

Symmetric per-vector scheme: ``scale = max(|x|) / 127``;
``q_i = round(x_i / scale)`` in [-127, 127]; dequantize is ``q_i *
scale``. Reconstruction error is bounded by ``scale / 2`` per
component by construction — the probe's contract. All arithmetic is
built-in column expressions (codegen, no Python, no shuffle) and is
engine-replicable: Spark ROUND and DuckDB round() share
half-away-from-zero semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: guard for all-zero vectors (scale 0 would divide by zero; any
#: positive epsilon quantizes the zero vector to zeros)
_EPS = 1e-12


def _scale(vec: Column) -> Column:
    return F.greatest(
        F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double")))) / 127.0,
        F.lit(_EPS),
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str, q_col: str = "q", scale_col: str = "scale"
) -> DataFrame:
    """Adds ``q`` (array<int> in [-127, 127]) and ``scale`` (double)."""
    vec = F.col(vec_col)
    s = _scale(vec)
    return df.withColumns(
        {
            scale_col: s,
            q_col: F.transform(
                vec, lambda x: F.round(x.cast("double") / s).cast("int")
            ),
        }
    )


def dequantize(q: str | Column, scale: str | Column) -> Column:
    """array<double> reconstruction of a quantized vector."""
    qc = F.col(q) if isinstance(q, str) else q
    sc = F.col(scale) if isinstance(scale, str) else scale
    return F.transform(qc, lambda x: x.cast("double") * sc)
