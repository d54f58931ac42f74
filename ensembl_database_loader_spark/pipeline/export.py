"""Training-shard export: write the packed corpus as N shard files in a
DETERMINISTIC pseudo-random order.

Pre-training ingestion wants (a) a fixed shard count it can map to data-
loader workers, (b) documents well-mixed across shards (no source/time
locality — a shard must be an unbiased slice of the corpus), and (c)
bit-reproducible output across reruns and cluster layouts. ``rand()``
breaks (c); sorting by raw id breaks (b). The standard answer is the
same keyed hash used for mixing (operators/mixing.py): shard by
``hash(id) mod N``, order within a shard by ``(hash(id), id)`` — a
deterministic permutation that is statistically indistinguishable from
a uniform shuffle for downstream consumers.

Plan shape: one repartition-by-expression shuffle + an in-partition
sort (``sortWithinPartitions`` — no global sort/range exchange), then a
single write. At 100 TB this is the minimum possible movement for a
sharded shuffled export.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ensembl_database_loader_spark.operators.mixing import knuth32


def shuffled_export(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    fmt: str = "parquet",
) -> DataFrame:
    """Write ``df`` to ``path`` as at most ``n_shards`` files (one per
    non-empty hash partition — a partition that receives no rows
    produces no part-file) whose membership AND internal order are pure
    functions of ``id_col``. Returns the sharded frame (shuffle-key
    column dropped, matching the written schema) for
    inspection/testing."""
    h = knuth32(id_col)
    # repartition on the Knuth key: shard membership is murmur3(key) %
    # n_shards — a fixed function of the id, so reruns and input
    # layouts produce identical shards (pinned by test); hashing the
    # well-mixed key keeps shard sizes balanced.
    sharded = (
        df.withColumn("_shuffle_key", h)
        .repartition(n_shards, F.col("_shuffle_key"))
        .sortWithinPartitions("_shuffle_key", id_col)
    )
    (
        sharded.drop("_shuffle_key")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )
    return sharded.drop("_shuffle_key")
