"""Mergeable distinct-count sketches (Apache DataSketches, JVM-side):
the incremental analytics layer a 100 TB pipeline needs on top of
``approx_count_distinct`` (q17), which answers one query but leaves
nothing behind.

Two capabilities the one-shot estimator can't provide:

- **Storable per-batch HLL sketches** (``distinct_sketches``): each
  corpus batch aggregates to a few-KB binary per group; sketches
  persist to parquet next to the batch. "Distinct tokens across all 40
  ingest runs" is then ``hll_union_agg`` over 40 tiny rows — NO rescan
  of 100 TB of history. DataSketches' documented merge guarantee is
  NO ERROR GROWTH: the union's estimate stays within the single
  sketch's error bound (not bit-identity — HLL_4 offset re-encoding
  and the HIP-vs-composite estimator shift the low digits; pinned
  within 2% by probe and tests).
  Reference analogue: the per-database row-count accounting
  the loader keeps per release (``Database.pm`` summaries), made
  mergeable across releases.

- **Set algebra without joins** (``corpus_overlap_estimate``): theta
  sketches estimate |A∩B| / |A∪B| / Jaccard between two corpora from
  one aggregate per side — the "how much does the new crawl overlap
  the old one" question. Exact answer costs a distinct-join shuffle of
  both corpora; the sketch costs two scans and a constant-size merge.

Everything stays in whole-stage codegen (built-in JVM aggregates, no
Python). Estimates are DETERMINISTIC functions of the input SET
(xxhash-based, order- and layout-independent), so contract booleans
(relative-error bounds, merge agreement) are stable across runs and
partitionings — DuckDB can't reproduce the sketch values themselves,
so probes gate exact quantities exactly and sketch quantities by
TRUE-declaring contracts (the established pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Per-group storable HLL sketch of distinct ``value_col`` plus its
    estimate: ``group_cols + (hll_sketch binary, distinct_est bigint)``.
    Write the sketch column to parquet with the batch; later batches
    union via ``merge_distinct_sketches`` instead of rescanning."""
    sk = F.hll_sketch_agg(F.col(value_col), F.lit(int(lg_k)))
    return df.groupBy(*group_cols).agg(
        sk.alias("hll_sketch"),
        F.hll_sketch_estimate(sk).alias("distinct_est"),
    )


def merge_distinct_sketches(
    sketches: DataFrame,
    group_cols: tuple[str, ...] = (),
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Union stored sketches and estimate. With empty ``group_cols``,
    one global row.

    What merging guarantees (and what it doesn't): the union's
    estimate carries the same error bound as a single sketch built
    over the concatenated input — merging never grows the error — but
    it is NOT bit-identical to a direct build: a fresh sketch reports
    the HIP (historical inverse probability) estimate, which unions
    cannot preserve (they report the composite estimate), and HLL_4
    offset re-encoding shifts register bytes. Incremental-vs-one-shot
    agreement is therefore a tight bound (probe pins 2%), not
    equality."""
    merged = F.hll_union_agg(F.col(sketch_col))
    aggs = [
        merged.alias("hll_sketch"),
        F.hll_sketch_estimate(merged).alias("distinct_est"),
    ]
    return (
        sketches.groupBy(*group_cols).agg(*aggs) if group_cols else sketches.agg(*aggs)
    )


def corpus_overlap_estimate(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Theta-sketch set algebra between the distinct ``value_col`` sets
    of two corpora — one row: ``est_a, est_b, est_intersection,
    est_union, est_jaccard`` — from ONE aggregate per side and a 1x1
    merge. No distinct-join of the corpora ever happens."""
    lk = F.lit(int(lg_k))
    sa = df_a.agg(F.theta_sketch_agg(F.col(value_col), lk).alias("sa"))
    sb = df_b.agg(F.theta_sketch_agg(F.col(value_col), lk).alias("sb"))
    both = sa.crossJoin(sb)  # 1 row x 1 row
    inter = F.theta_sketch_estimate(F.theta_intersection("sa", "sb"))
    union = F.theta_sketch_estimate(F.theta_union("sa", "sb"))
    return both.select(
        F.theta_sketch_estimate(F.col("sa")).alias("est_a"),
        F.theta_sketch_estimate(F.col("sb")).alias("est_b"),
        inter.alias("est_intersection"),
        union.alias("est_union"),
        (inter / F.greatest(union, F.lit(1))).alias("est_jaccard"),
    )


# ---------------------------------------------------------------------------
# Frequent items (Misra-Gries) — mergeable heavy-hitters summaries
# ---------------------------------------------------------------------------

#: Summary convention: a frequent-items summary is a tiny DataFrame of
#: ``(item string nullable, weight bigint)`` with AT MOST k non-null
#: rows (lower-bound counts) and null-item rows carrying accumulated
#: ERROR mass. The null-row convention makes summaries CLOSED under
#: concatenation: union any number of stored summaries and re-combine
#: — no side-channel error scalar to thread through storage.


def _mg_combine(summaries: DataFrame, k: int) -> DataFrame:
    """Combine Misra-Gries summaries (Agarwal et al., "Mergeable
    Summaries"): sum weights per item, subtract the (k+1)-th largest
    combined weight from every counter, drop the non-positive, and add
    that subtrahend to the error row. Preserves the MG invariants —
    <= k survivors, ``true - err <= weight <= true``, total err
    <= n/(k+1). The summary frame is k x #inputs rows, so the global
    sort is a few thousand rows — the one place a single-partition
    window is the RIGHT plan."""
    from pyspark.sql import Window

    spark = summaries.sparkSession
    err_in = (
        summaries.filter(F.col("item").isNull())
        .agg(F.coalesce(F.sum("weight"), F.lit(0)).cast("bigint"))
        .first()[0]
    )
    s = (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("weight").cast("bigint").alias("weight"))
    )
    ranked = s.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("weight"), F.asc("item")))
    )
    row_k1 = ranked.filter(F.col("rn") == k + 1).select("weight").first()
    decrement = int(row_k1[0]) if row_k1 is not None else 0
    out = (
        s.select("item", (F.col("weight") - F.lit(decrement)).alias("weight"))
        .filter(F.col("weight") > 0)
    )
    err_row = spark.createDataFrame(
        [(None, int(err_in) + decrement)], "item string, weight bigint"
    )
    return out.unionByName(err_row)


def frequent_items(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """Misra-Gries heavy hitters over ``col``: a mergeable summary of
    at most ``k`` items with LOWER-BOUND counts plus an error row
    (item null) bounding the undercount.

    Guarantees (the classic MG contract, layout-independent):
    ``true - err <= weight <= true`` for every surviving item, every
    item with true frequency > err survives, and ``err <= n/(k+1)``.
    WHICH low-frequency items survive beyond the guarantee depends on
    partitioning — only the contract is deterministic, which is what
    the probe gates.

    Execution shape: one Arrow-batched pass builds a <= k-counter
    summary PER PARTITION (dict state carried across the partition's
    record batches — never more than k counters in memory, the whole
    point of MG over an exact groupBy at 100 TB), the tiny k x
    #partitions candidate frame combines in one step, and nothing
    item-granular ever shuffles. Exact heavy-hitter counting shuffles
    the full item domain; this shuffles k rows per partition.

    Pairs with ``skew.key_skew_profile``: the profile says HOW skewed a
    key column is, this names the hot keys — cheap enough to run on
    every ingest batch and store next to the HLL sketches."""
    import pandas as pd

    if k < 1:
        raise ValueError("k must be >= 1")

    src = df.select(F.col(col).cast("string").alias("item"))

    def summarize(batches):
        counters: dict[str, int] = {}
        err = 0
        for pdf in batches:
            for item, c in pdf["item"].value_counts(dropna=True).items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                vals = sorted(counters.values(), reverse=True)
                w = vals[k]  # (k+1)-th largest
                counters = {i: c - w for i, c in counters.items() if c > w}
                err += w
        yield pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "weight": list(counters.values()) + [err],
            }
        )

    summaries = src.mapInPandas(summarize, "item string, weight bigint")
    return _mg_combine(summaries, k)


def merge_frequent_items(summaries: DataFrame, k: int = 64) -> DataFrame:
    """Merge STORED frequent-items summaries (e.g. one per ingest
    batch, appended to parquet) into one — same combine as
    ``frequent_items``, so "top tokens across all 40 ingest runs" is a
    few-thousand-row job over the summaries, with NO rescan of the
    corpora, and the merged error row still bounds the undercount of
    the concatenated input."""
    return _mg_combine(summaries, k)


# ---------------------------------------------------------------------------
# Quantile histograms — mergeable log-bucket value summaries
# ---------------------------------------------------------------------------

#: Bucket-id offset: keeps positive-value magnitudes strictly positive
#: so sign(bucket) encodes sign(value) and bucket order == value order
#: (negatives < zero-bucket 0 < positives).
_QH_OFF = 2**32


def quantile_histogram(df: DataFrame, col: str, precision: int = 32) -> DataFrame:
    """Mergeable quantile summary: a log-bucket histogram ``(bucket
    bigint, n bigint)`` with ``precision`` buckets per octave —
    relative value-error ``2^(1/precision) - 1`` (~2.2% at 32).

    Why not ``percentile_approx``: its GK sketch answers one query and
    leaves nothing storable. This histogram persists to parquet next
    to the batch (a few hundred rows — buckets only exist where data
    does), and merging stored summaries is a plain ``SUM`` per bucket:
    EXACT, unlike HLL unions — a merged histogram is bit-identical to
    one built over the concatenated input, so incremental == one-shot
    is an equality gate, not a tolerance. "p99 doc length across all
    ingest runs" reads the summaries, never the corpora.

    Bucket map (pure codegen, one groupBy): x>0 →
    ``floor(log2(x)*precision) + OFF``; x<0 mirrored negative; x=0 →
    bucket 0; nulls dropped. ``sign(bucket)`` preserves value order,
    so quantiles read off the cumulative histogram."""
    if precision < 1:
        raise ValueError("precision must be >= 1")
    x = F.col(col).cast("double")
    mag = F.floor(F.log2(F.abs(x)) * F.lit(precision))
    bucket = (
        F.when(x > 0, mag + F.lit(_QH_OFF))
        .when(x < 0, -(mag + F.lit(_QH_OFF)))
        .otherwise(F.lit(0))
    )
    return (
        df.filter(x.isNotNull())
        .groupBy(bucket.cast("bigint").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_quantile_histograms(hists: DataFrame) -> DataFrame:
    """Merge stored histograms: SUM per bucket — exact, associative,
    no error growth ever (counts are counts)."""
    return hists.groupBy("bucket").agg(F.sum("n").cast("bigint").alias("n"))


def histogram_quantiles(
    hist: DataFrame, probs: tuple[float, ...] = (0.5,), precision: int = 32
) -> DataFrame:
    """Quantile estimates from a (merged) histogram: for each p in
    ``probs``, the geometric midpoint of the bucket holding rank
    ``ceil(p * n)`` — within a ``2^(1/precision)`` factor of the true
    quantile value. The cumulative window runs over the TINY bucket
    frame (hundreds of rows), the one place a single-partition window
    is the right plan — item rows never re-enter. Returns ``(p double,
    est double)``."""
    from pyspark.sql import Window

    cum = hist.withColumn(
        "_cum", F.sum("n").over(Window.orderBy("bucket"))
    ).crossJoin(hist.agg(F.sum("n").alias("_tot")))
    mag = F.abs(F.col("bucket")) - F.lit(_QH_OFF)
    rep = (
        F.when(F.col("bucket") == 0, F.lit(0.0))
        .otherwise(
            F.signum(F.col("bucket"))
            * F.pow(F.lit(2.0), (mag + F.lit(0.5)) / F.lit(precision))
        )
    )
    out = None
    for p in probs:
        rank = F.greatest(F.ceil(F.lit(float(p)) * F.col("_tot")), F.lit(1))
        row = (
            cum.filter(F.col("_cum") >= rank)
            .orderBy("bucket")
            .limit(1)
            .select(F.lit(float(p)).alias("p"), rep.alias("est"))
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out


def grouped_frequent_items(
    df: DataFrame, group_col: str, col: str, k: int = 64
) -> DataFrame:
    """Per-group Misra-Gries heavy hitters: ``frequent_items`` with an
    independent <= k-counter summary per ``group_col`` value ("top
    tokens per lang/source"). Same contract per group: weights are
    lower bounds within the group's error row of truth, any item with
    true in-group count > err survives, err <= n_group/(k+1).

    Per-partition state is k counters x #groups-in-partition — bounded
    when the group column is low-cardinality (langs, sources), which
    is the use case; for high-cardinality groups use an exact groupBy
    (the domain is then the bottleneck either way). The combine is one
    window over the (groups x k x partitions)-row summary frame,
    partitioned by group — still nothing item-granular shuffles.
    Returns ``(group, item nullable, weight)`` with null-item error
    rows per group."""
    import pandas as pd

    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    src = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.col(col).cast("string").alias("item"),
    )

    def summarize(batches):
        state: dict[str, dict[str, int]] = {}
        errs: dict[str, int] = {}
        for pdf in batches:
            pdf = pdf.dropna()
            for (g, item), c in (
                pdf.groupby(["g", "item"], sort=False).size().items()
            ):
                d = state.setdefault(g, {})
                d[item] = d.get(item, 0) + int(c)
                if len(d) > k:
                    vals = sorted(d.values(), reverse=True)
                    w = vals[k]
                    state[g] = {i: c2 - w for i, c2 in d.items() if c2 > w}
                    errs[g] = errs.get(g, 0) + w
        rows = []
        for g, d in state.items():
            rows.extend((g, i, w) for i, w in d.items())
            rows.append((g, None, errs.get(g, 0)))
        for g, e in errs.items():
            if g not in state:
                rows.append((g, None, e))
        yield pd.DataFrame(rows, columns=["g", "item", "weight"])

    summaries = src.mapInPandas(summarize, "g string, item string, weight bigint")
    err_in = (
        summaries.filter(F.col("item").isNull())
        .groupBy("g")
        .agg(F.coalesce(F.sum("weight"), F.lit(0)).cast("bigint").alias("err0"))
    )
    s = (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("g", "item")
        .agg(F.sum("weight").cast("bigint").alias("weight"))
    )
    w = Window.partitionBy("g").orderBy(F.desc("weight"), F.asc("item"))
    ranked = s.withColumn("rn", F.row_number().over(w))
    dec = (
        ranked.filter(F.col("rn") == k + 1)
        .select("g", F.col("weight").alias("dec"))
    )
    out = (
        s.join(dec, "g", "left")
        .select(
            "g",
            "item",
            (F.col("weight") - F.coalesce("dec", F.lit(0))).alias("weight"),
        )
        .filter(F.col("weight") > 0)
    )
    err_row = (
        err_in.join(dec, "g", "full_outer")
        .select(
            "g",
            F.lit(None).cast("string").alias("item"),
            (
                F.coalesce("err0", F.lit(0)) + F.coalesce("dec", F.lit(0))
            ).cast("bigint").alias("weight"),
        )
    )
    return out.unionByName(err_row).select(
        F.col("g").alias(group_col), "item", "weight"
    )
