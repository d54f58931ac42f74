"""Small-frame utilities shared across operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def literal_frame(spark: SparkSession, rows: list, schema) -> DataFrame:
    """Literal frame with a BOUNDED slice count: ``createDataFrame``
    parallelizes a Python list into defaultParallelism slices (32 on
    the local harness), so every consumer of a few-hundred-row literal
    frame pays ~32 Python-worker task round trips per action — most of
    them empty. One slice per ~256 rows keeps tasks parallel where it
    matters and removes the empty ones. (Deliberately NOT coalesce(1):
    coalescing makes ONE task chain every slice's Python-worker round
    trip SEQUENTIALLY — measured ~5 s per action on a 474-row frame.)

    ``schema`` may be a DDL string or a StructType; rows may be tuples
    or Row objects.
    """
    if not rows:
        return spark.createDataFrame([], schema)
    n_slices = min(
        spark.sparkContext.defaultParallelism, (len(rows) + 255) // 256
    )
    rdd = spark.sparkContext.parallelize(rows, n_slices)
    return spark.createDataFrame(rdd, schema)
