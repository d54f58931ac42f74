"""Product quantization (PQ) for embedding search: vectors compressed
to ``m`` sub-space code indices (default 8 codes x 16 centroids =
8 BYTES per 64-dim vector, 32x smaller than float32, 64x than float64)
and queried by asymmetric distance computation (ADC) — the query stays
full-precision, each database vector's distance is a sum of ``m``
table lookups. This is the storage/IO lever for billion-vector corpora
(IVF prunes WHICH vectors are scanned; PQ shrinks WHAT a scan reads —
the standard composition is IVF cells over PQ codes).

Shapes and costs:
- ``pq_train``: codebooks are tiny (k x dim doubles total) and need a
  representative SAMPLE, not the corpus — training collects the first
  ``max_train`` vectors by id (deterministic) and runs Lloyd per
  sub-space driver-side in numpy. At 100 TB pass a hash-sampled frame.
- ``pq_encode``: ONE Arrow-batched pass; per row, m argmin-of-k
  distance computations (numpy GEMM per batch). No shuffle.
- ``pq_topk``: broadcast the (m x k) ADC table built from the query,
  score every code row with m gathers + a sum (numpy, Arrow-batched),
  TakeOrdered k. A scan over 8-byte codes instead of 256-byte floats.

Determinism: training input is id-ordered, Lloyd is plain numpy with
fixed iteration count, empty cells keep their previous centroid — the
same codebooks on every run/layout. Recall is gated on the clustered
fixture (probe ``ss_ann_pq_recall``), reconstruction-error contraction
and round-trip exactness on centroids are unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _split(dim: int, m: int) -> list[tuple[int, int]]:
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} sub-spaces")
    w = dim // m
    return [(s * w, (s + 1) * w) for s in range(m)]


def lloyd_codebooks(x, m: int, k: int, n_iter: int = 5) -> list:
    """Per-sub-space Lloyd on an already-prepared (n, dim) float64
    matrix (normalized vectors, or RESIDUALS for an IVF-PQ index) —
    the shared deterministic trainer of ``pq_train`` and
    ``similarity.build_ann_index(quantized='pq')``: row-0..k-1 init,
    fixed iteration count, empty cells keep their previous centroid."""
    if x.shape[0] < k:
        raise ValueError(f"need >= k={k} training vectors, got {x.shape[0]}")
    spans = _split(int(x.shape[1]), m)
    books = []
    for lo, hi in spans:
        sub = x[:, lo:hi]
        cents = sub[:k].copy()  # id-ordered init
        for _ in range(n_iter):
            d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = sub[mask].mean(axis=0)
        books.append(cents.tolist())
    return books


def pq_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    k: int = 16,
    n_iter: int = 5,
    max_train: int = 20_000,
    normalize: bool = True,
) -> list:
    """Codebooks ``[m][k][dim/m]`` trained per sub-space (Lloyd,
    deterministic first-``max_train``-by-id sample; with ``normalize``
    vectors are L2-normalized first so ADC L2 ranks like cosine)."""
    import numpy as np

    rows = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .orderBy("_id")
        .limit(int(max_train))
        .collect()
    )
    if not rows:
        raise ValueError("pq_train: empty training frame")
    x = np.array([r._v for r in rows], dtype=np.float64)
    if normalize:
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    return lloyd_codebooks(x, m, k, n_iter)


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list,
    normalize: bool = True,
) -> DataFrame:
    """(id, codes array<int>) — each vector's per-sub-space nearest
    centroid indices. One Arrow pass, no shuffle."""
    import numpy as np
    import pandas as pd

    books = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    w = books[0].shape[1]
    dim = m * w

    @F.pandas_udf("array<int>")
    def _enc(s):  # type: ignore[no-untyped-def]
        x = np.array(s.tolist(), dtype=np.float64)
        if x.ndim != 2 or x.shape[1] != dim:
            raise ValueError(f"expected {dim}-dim vectors")
        if normalize:
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        codes = np.empty((x.shape[0], m), dtype=np.int32)
        for si in range(m):
            sub = x[:, si * w : (si + 1) * w]
            d = ((sub[:, None, :] - books[si][None, :, :]) ** 2).sum(axis=2)
            codes[:, si] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return df.select(
        F.col(id_col).alias("id"), _enc(F.col(vec_col)).alias("codes")
    )


def pq_topk(
    codes_df: DataFrame,
    codebooks: list,
    query: list,
    k: int = 5,
    normalize: bool = True,
) -> DataFrame:
    """Top-k (id, adc_dist) by asymmetric distance: the (m x k_codes)
    lookup table is built from the FULL-PRECISION query once and
    broadcast inside the UDF closure; each code row costs m gathers."""
    import numpy as np
    import pandas as pd

    books = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    w = books[0].shape[1]
    q = np.array(query, dtype=np.float64)
    if q.shape != (m * w,):
        raise ValueError(f"query must be {m * w}-dim, got {q.shape}")
    if normalize:
        q = q / max(float(np.linalg.norm(q)), 1e-12)
    table = np.stack(
        [
            ((books[si] - q[si * w : (si + 1) * w][None, :]) ** 2).sum(axis=1)
            for si in range(m)
        ]
    )  # (m, k_codes)

    @F.pandas_udf("double")
    def _adc(s, _t=table):  # type: ignore[no-untyped-def]
        c = np.array(s.tolist(), dtype=np.int64)
        return pd.Series(_t[np.arange(_t.shape[0])[None, :], c].sum(axis=1))

    return (
        codes_df.withColumn("adc_dist", _adc(F.col("codes")))
        .orderBy(F.col("adc_dist").asc(), F.col("id").asc())
        .limit(int(k))
        .select("id", F.round("adc_dist", 6).alias("adc_dist"))
    )


def pq_reconstruction_mse(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list,
    normalize: bool = True,
) -> float:
    """Mean squared reconstruction error over the frame — the training
    diagnostic (more centroids / sub-spaces must not increase it).

    Computed DISTRIBUTED: one Arrow-batched pass attaches each row's
    summed min sub-space distance (the same numpy math ``pq_encode``
    runs, just keeping the min instead of the argmin) and one partial
    aggregate averages — no vector row is ever collected to the driver,
    so the diagnostic runs at encoded-corpus scale (the round-9 version
    collected the whole frame). Value is identical to the collect form
    up to float summation order in the final average."""
    import numpy as np
    import pandas as pd

    books = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    w = books[0].shape[1]
    dim = m * w

    @F.pandas_udf("double")
    def _err(s):  # type: ignore[no-untyped-def]
        x = np.array(s.tolist(), dtype=np.float64)
        if x.ndim != 2 or x.shape[1] != dim:
            raise ValueError(f"expected {dim}-dim vectors")
        if normalize:
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        e = np.zeros(x.shape[0], dtype=np.float64)
        for si in range(m):
            sub = x[:, si * w : (si + 1) * w]
            d = ((sub[:, None, :] - books[si][None, :, :]) ** 2).sum(axis=2)
            e += d.min(axis=1)
        return pd.Series(e)

    row = (
        df.select(_err(F.col(vec_col).cast("array<double>")).alias("_e"))
        .agg(F.avg("_e"))
        .first()
    )
    if row[0] is None:
        raise ValueError("pq_reconstruction_mse: empty frame")
    return float(row[0])
