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


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Column pruning / predicate pushdown is
    preserved because we return the raw scan, not a cached/collected copy.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark cannot read
    natively — we read it as raw nanos (legacy conf) and truncate to
    microseconds with integer division (float division would lose
    precision on int64 epoch-nanos). DuckDB performs the same ns -> us
    truncation on read, so both engines see identical values.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (Spark SQL surface —
    the engine analogue of the reference's per-database MySQL schema)."""
    for t, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(t)
