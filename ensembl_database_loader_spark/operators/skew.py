"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but two cases still need explicit salting at 100 TB:

- a groupBy whose hot key overwhelms one reducer BEFORE AQE can help
  (partial aggregation already absorbs commutative aggs; salting is
  for the cases where per-key state is large — collect_list-ish);
- a shuffle join where one side's hot key exceeds a single task even
  after AQE splits (AQE splits partitions, not single keys' rows on
  the build side).

Both transforms are semantics-preserving and tested for equivalence
against their unsalted twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_group_count(df: DataFrame, key: str, num_salts: int = 16) -> DataFrame:
    """groupBy(key).count() in two stages: (key, salt) partial counts,
    then a tiny (num_keys x num_salts)-row final combine. The first
    shuffle spreads each hot key over ``num_salts`` reducers."""
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(num_salts)))
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").cast("bigint").alias("count"))


def salted_join(
    big: DataFrame, small: DataFrame, key: str, num_salts: int = 16
) -> DataFrame:
    """Inner equi-join with the big side's hot keys spread over
    ``num_salts`` shuffle partitions: the big side gets a random-ish
    (deterministic) salt, the small side is exploded num_salts times so
    every (key, salt) bucket finds its match. Row multiplicity is
    preserved exactly; the small side grows num_salts-fold — use for
    genuinely small-but-unbroadcastable or mid-size dimension sides."""
    big_s = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts)),
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    out = big_s.join(small_s, [key, "_salt"])
    return out.drop("_salt")


def key_skew_profile(df: DataFrame, key: str, sample_fraction: float | None = None) -> DataFrame:
    """One-row skew fingerprint of a join/groupBy key: per-key counts
    reduced to (n_keys, n_rows, p50, p90, p99, max, top_share) where
    ``top_share`` = max key frequency / total rows. ``p99/p50`` >> 1 or
    a top_share near a whole partition's capacity is the signal to
    route a join through ``hot_key_split_join`` / ``salted_join``
    instead of a plain shuffle (AQE splits skewed PARTITIONS, but a
    single key's rows all land in one task on the build side).

    Cost: one partial-aggregated count shuffle (key cardinality), then
    a single-row reduce. At 100 TB pass ``sample_fraction`` to profile
    a uniform row sample instead — per-key counts scale down ~uniformly
    so the RATIOS (p99/p50, top_share) survive sampling, which is all
    the routing decision needs; the exact path is the oracle-checked
    probe."""
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=42)
    freq = df.groupBy(key).agg(F.count(F.lit(1)).alias("_c"))
    q = F.percentile(F.col("_c"), F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return freq.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("_c").cast("bigint").alias("n_rows"),
        F.round(q[0], 2).alias("p50"),
        F.round(q[1], 2).alias("p90"),
        F.round(q[2], 2).alias("p99"),
        F.max("_c").cast("bigint").alias("max_freq"),
        F.round(F.max("_c") / F.sum("_c"), 6).alias("top_share"),
    )


def hot_key_split_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_min_rows: int = 1_000_000,
) -> DataFrame:
    """Inner equi-join with heavy-hitter isolation — the standard
    two-path skew join:

    - keys with >= ``hot_min_rows`` rows on the big side are the HOT
      set (by definition small enough to broadcast: more than ~1000
      such keys would mean the table is mostly hot and salting is the
      wrong tool anyway);
    - COLD rows take the normal shuffle join — after removing the hot
      keys their partitions are balanced, which is exactly what AQE
      assumes;
    - HOT rows join against a BROADCAST of the small side's matching
      rows — no shuffle at all on the skewed rows, so no task ever
      receives one key's entire row set.

    Row multiplicity is preserved exactly (each big row takes exactly
    one path; the hot path's broadcast side is filtered to hot keys so
    no pair is produced twice). Equivalence to the plain join is
    pinned in tests. Set ``hot_min_rows`` to a few times the rows that
    fit a healthy task (e.g. target_partition_bytes / avg_row_bytes)."""
    freq = big.groupBy(key).agg(F.count(F.lit(1)).alias("_c"))
    hot_keys = freq.filter(F.col("_c") >= hot_min_rows).select(key)
    # both paths reuse the broadcast hot-key set map-side (no shuffle
    # added to the big side's lineage by the split itself)
    b_hot = F.broadcast(hot_keys)
    big_hot = big.join(b_hot, key, "left_semi")
    big_cold = big.join(b_hot, key, "left_anti")
    small_hot = small.join(b_hot, key, "left_semi")
    cold = big_cold.join(small, key)
    hot = big_hot.join(F.broadcast(small_hot), key)
    return cold.unionByName(hot)
