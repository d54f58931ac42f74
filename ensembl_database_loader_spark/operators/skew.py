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
