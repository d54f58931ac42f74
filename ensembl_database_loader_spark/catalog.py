"""Table catalog over the driver-provided parquet fixtures.

The reference's unit of work is a *database* — a directory of per-table
dump files discovered by globbing (LoadFiles.pm:187-216). Here a
"database" is a directory of parquet tables; one ``spark.read.parquet``
per table gives Catalyst a pruned, pushdown-capable scan (splittable at
row-group granularity — the 100 TB path is many files per table, which
the same glob-shaped reader handles natively).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to TIMESTAMP (with local-tz semantics),
    whatever physical form the fixture was generated with:

    - parquet TIMESTAMP(NANOS): unreadable natively by Spark — callers
      set the legacy nanosAsLong conf so it arrives as raw int64 nanos;
      truncate to microseconds with integer division (float division
      would lose precision on int64 epoch-nanos). DuckDB performs the
      same ns -> us truncation on read.
    - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
      TIMESTAMP_NTZ, which watermarks/windows reject — cast to
      TIMESTAMP. Under the engine's UTC session timezone the wall-clock
      is preserved, matching DuckDB's naive read.
    - already TIMESTAMP: pass through.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Column pruning / predicate pushdown is
    preserved because we return the raw scan, not a cached/collected copy
    (the ``ts`` normalization is a projection Catalyst pushes past).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (Spark SQL surface —
    the engine analogue of the reference's per-database MySQL schema)."""
    for t, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(t)
