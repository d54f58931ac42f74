"""DSIR-style data selection via importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling"):
score every raw document by how TARGET-like its hashed n-gram profile
is — ``log w(doc) = sum over grams of ln p_target(bucket) -
ln p_raw(bucket)`` — and select the top documents by weight. The
model-free curation stage between heuristic filters (textstats) and
model-based perplexity filtering (lm.py): it needs only a sample of
the target distribution, not a trained LM.

Spark formulation, fully DataFrame-side and oracle-replicable:

- Features are hashed n-grams: unigrams + bigrams of the normalized
  token stream, each mapped to one of ``num_buckets`` buckets by the
  repo's cross-engine polynomial fold (``functions.text.poly_hash``
  mod ``num_buckets``) — no vocabulary is ever built or broadcast.
- ``hashed_ngram_counts``: ONE narrow gram explode + one
  partial-aggregated groupBy(bucket) per corpus — the fitted
  "distribution" is a (num_buckets)-row frame.
- ``dsir_logweights``: the per-bucket log-ratio table is tiny
  (<= num_buckets rows, Laplace-smoothed so unseen buckets contribute
  a finite penalty) and BROADCASTS into the gram-level join; one
  groupBy(doc) sums the ratios. Probabilities are exact BIGINT-count
  rationals; ln() is the only double step (the lm.py contract), so
  both engines fold identical IEEE terms and the probe's rounded
  outputs hash-match.
- ``dsir_select``: deterministic top-k by (rounded log-weight desc,
  id) — reproducible across runs/layouts; ``gumbel_seed`` switches to
  DSIR's Gumbel-top-k resampling with noise derived from the Knuth
  multiplicative hash of the id (an exact 32-bit rational fed through
  ln — deterministic across engines and layouts, no RNG state).

At 100 TB: fitting is two linear scans (target is typically a small
sample anyway); scoring is linear in corpus grams with a broadcast
join; selection is one TakeOrdered. No stage shuffles more than the
gram aggregate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ensembl_database_loader_spark.functions.text import poly_hash

#: Knuth multiplicative constant (the repo's deterministic-sampling hash)
_KNUTH = 2654435761


def _grams_of(tok_col: str):
    """array<string> of unigrams (empty token dropped) + bigrams over a
    PRE-TOKENIZED array column — the DSIR feature set. Taking the token
    array (not the raw text) keeps the normalize+split to ONE
    evaluation per row; inlining it here would re-run the regex split
    five times inside the same expression (measured ~2x end-to-end)."""
    return F.expr(
        f"concat(filter({tok_col}, w -> w != ''), "
        f"CASE WHEN size({tok_col}) < 2 THEN array() ELSE "
        f"transform(sequence(1, size({tok_col}) - 1), "
        f"i -> concat(element_at({tok_col}, i), ' ', "
        f"element_at({tok_col}, i + 1))) END)"
    )


def gram_buckets(
    df: DataFrame,
    text_col: str,
    num_buckets: int,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(keep_cols..., bucket) — one hashed-bucket row per gram: ONE
    normalize+split per document, a narrow explode, the poly-hash fold
    mod ``num_buckets``. The single gram pass both fitting and scoring
    derive from."""
    if num_buckets < 2:
        raise ValueError(f"num_buckets must be >= 2, got {num_buckets}")
    toks = F.expr(
        f"split(regexp_replace(lower(trim({text_col})), '\\\\s+', ' '), ' ')"
    )
    return (
        df.select(*keep_cols, toks.alias("_t"))
        .select(*keep_cols, F.explode(_grams_of("_t")).alias("_gram"))
        .select(
            *keep_cols,
            F.pmod(poly_hash("_gram"), F.lit(int(num_buckets))).alias("bucket"),
        )
    )


def hashed_ngram_counts(
    df: DataFrame, text_col: str, num_buckets: int = 2048
) -> DataFrame:
    """(bucket, cnt) over the corpus — the fitted hashed-n-gram
    distribution (<= num_buckets rows however big the corpus)."""
    return (
        gram_buckets(df, text_col, num_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def bucket_logratios(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    num_buckets: int,
    smoothing: float = 0.5,
) -> DataFrame:
    """(bucket, lr) — ln of the Laplace-smoothed target/raw probability
    ratio per bucket: ``ln((ct + s) / (nt + s*B)) - ln((cr + s) /
    (nr + s*B))``. Buckets absent from both corpora are omitted (no
    gram can hash to them in the scored corpus either... except ones
    only the SCORED docs produce — the full-outer join below keeps any
    bucket either fitted corpus saw; a truly-unseen bucket gets the
    pure smoothing ratio via the left join's null handling in
    ``dsir_logweights``)."""
    s = float(smoothing)
    b = float(num_buckets)
    both = (
        target_counts.withColumnRenamed("cnt", "ct")
        .join(raw_counts.withColumnRenamed("cnt", "cr"), "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    j = both.select(
        "bucket",
        "ct",
        "cr",
        F.sum("ct").over(w).cast("bigint").alias("nt"),
        F.sum("cr").over(w).cast("bigint").alias("nr"),
    )
    lr = F.log(
        (F.col("ct") + F.lit(s)) / (F.col("nt") + F.lit(s * b))
    ) - F.log((F.col("cr") + F.lit(s)) / (F.col("nr") + F.lit(s * b)))
    return j.select("bucket", lr.alias("lr"), "nt", "nr")


def dsir_logweights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_counts: DataFrame,
    raw_counts: DataFrame,
    num_buckets: int = 2048,
    smoothing: float = 0.5,
    grams: DataFrame | None = None,
) -> DataFrame:
    """Attach ``logw`` (sum of per-gram log-ratios; NULL for docs with
    no grams — empty/whitespace text has no evidence) and ``n_grams``
    to every document. The log-ratio table broadcasts (<= num_buckets
    rows); docs whose grams hit a bucket NEITHER fitted corpus saw get
    that gram's ratio from pure smoothing (ln((s/(nt+sB))/(s/(nr+sB)))
    = ln((nr+sB)/(nt+sB)) — finite, not dropped). ``grams`` accepts a
    precomputed/persisted ``gram_buckets(df, text_col, num_buckets,
    (id_col,))`` frame so a caller that also fitted ``raw_counts`` from
    it pays the gram pass once (``dsir_select`` does)."""
    ratios = bucket_logratios(target_counts, raw_counts, num_buckets, smoothing)
    # the ratio table is <= num_buckets rows and is consumed twice (the
    # unseen-ratio scalar + the broadcast join): ONE collect and a
    # literal frame, not a localCheckpoint — a checkpoint here can
    # never be unpersisted (it backs the returned lineage), so it
    # leaked one cached block per call into library callers (the
    # suite-order flake in test_select_releases_gram_cache)
    rrows = ratios.collect()
    s = float(smoothing)
    b = float(num_buckets)
    nt = max((int(r["nt"] or 0) for r in rrows), default=0)
    nr = max((int(r["nr"] or 0) for r in rrows), default=0)
    unseen = F.lit(
        float(math.log((s / (nt + s * b)) / (s / (nr + s * b))))
    )
    if grams is None:
        grams = gram_buckets(df, text_col, num_buckets, (id_col,))
    spark = df.sparkSession
    lr_frame = spark.createDataFrame(
        [(int(r["bucket"]), float(r["lr"])) for r in rrows],
        "bucket bigint, lr double",
    )
    scored = (
        grams.select(F.col(id_col).alias("_id"), "bucket")
        .join(F.broadcast(lr_frame), "bucket", "left")
        .select("_id", F.coalesce("lr", unseen).alias("_lr"))
        .groupBy("_id")
        .agg(
            F.sum("_lr").alias("logw"),
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        )
    )
    return df.join(scored, df[id_col] == scored["_id"], "left").drop("_id")


def dsir_select(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: DataFrame,
    k: int,
    target_text_col: str | None = None,
    num_buckets: int = 2048,
    smoothing: float = 0.5,
    ndigits: int = 6,
    gumbel_seed: int | None = None,
) -> DataFrame:
    """Top-``k`` most target-like documents: fit target and raw hashed
    n-gram counts, score every doc, take the k best by (rounded
    ``logw`` desc, id asc) — fully deterministic. ``gumbel_seed``
    switches to DSIR's Gumbel-top-k resampling: ``logw + gumbel(id)``
    with the noise derived from the Knuth hash of (id, seed) — an
    exact 32-bit rational through ln(-ln(u)), so the SAMPLE is also
    deterministic given the seed (reproducible across engines, runs,
    and layouts). Docs with no grams (NULL logw) are never selected.
    Returns the selected rows with ``logw``/``n_grams`` (and ``key``
    when sampling) attached — MATERIALIZED (localCheckpoint of the
    <= k selected rows) so the gram cache this call persisted is
    released before returning instead of leaking across calls."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if gumbel_seed is not None:
        # the Gumbel key is an exact integer rational over the id; a
        # non-integral id would cast to NULL and silently degenerate
        # the 'sample' to first-k-by-id — fail loudly instead
        id_type = dict(df.dtypes).get(id_col)
        if id_type not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"gumbel_seed needs an integral id column; {id_col!r} is "
                f"{id_type!r} — derive one first (e.g. xxhash64(id))"
            )
    tcounts = hashed_ngram_counts(
        target.select(F.col(target_text_col or text_col).alias("_tx")), "_tx",
        num_buckets,
    )
    # ONE gram pass over the scored corpus serves both the raw fit and
    # the scoring join (persisted: (id, bucket) pairs — 16 B/gram; at
    # 100 TB drop the persist and pay a second scan instead)
    grams = gram_buckets(df, text_col, num_buckets, (id_col,)).persist()
    rcounts = grams.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    scored = dsir_logweights(
        df, id_col, text_col, tcounts, rcounts, num_buckets, smoothing,
        grams=grams,
    ).filter(F.col("logw").isNotNull())
    key = F.round("logw", ndigits)
    if gumbel_seed is not None:
        u = (
            F.pmod(
                (F.col(id_col).cast("bigint") + F.lit(int(gumbel_seed)))
                * F.lit(_KNUTH),
                F.lit(2**32),
            )
            + F.lit(0.5)
        ) / F.lit(float(2**32))
        key = F.round(F.col("logw") - F.log(-F.log(u)), ndigits)
    out = (
        scored.withColumn("key", key)
        .orderBy(F.desc("key"), F.col(id_col).asc())
        .limit(int(k))
    )
    # the selection is <= k rows: materialize it (localCheckpoint), then
    # release the gram cache — library callers must not inherit executor
    # cache they never asked for
    out = out.localCheckpoint()
    # blocking: the async default deregisters the RDD on a background
    # thread, so a caller inspecting the cache right after the call
    # (or a tight selection loop) could still see — or briefly double-
    # pay — the gram blocks; the frame is tiny, the wait is not
    grams.unpersist(blocking=True)
    return out
