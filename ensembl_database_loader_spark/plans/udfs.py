"""UDF probes Q38–Q39 (SURVEY.md §2.3): row-level Python UDF and
grouped pandas UDF (Arrow exchange).

UDFs are the slow path — these probes exist to prove the plumbing
(serialization, Arrow batching, grouped apply) with deterministic,
oracle-checkable outputs. Hot-path equivalents stay JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ensembl_database_loader_spark.catalog import table
from ensembl_database_loader_spark.functions.checksums import bsd_sum16_udf
from ensembl_database_loader_spark.plans.registry import probe
from ensembl_database_loader_spark.session import ensure_session_confs

# DuckDB replica of bsd_sum16 via a list_reduce fold over code points
# (fixture strings are ASCII, so code point == UTF-8 byte).
_BSD_SUM_SQL = (
    "list_reduce(list_prepend(0, list_transform(generate_series(1, length({col})), "
    "i -> unicode(substr({col}, i, 1)))), "
    "(acc, b) -> ((acc // 2) + ((acc % 2) * 32768) + b) % 65536)"
)


@probe(
    "q38_python_udf_bsd_sum",
    oracle=(
        "SELECT CAST(SUM(c) AS BIGINT) AS sum_checksum, "
        "COUNT(DISTINCT c) AS distinct_checksums FROM "
        f"(SELECT {_BSD_SUM_SQL.format(col='p_name')} AS c FROM part) t"
    ),
    tags=("udf",),
)
def q38(spark: SparkSession, sf: str) -> DataFrame:
    """Python UDF: BSD sum16 checksum (DownloadDatabase.pm:238-251) over
    p_name bytes, aggregated. Arrow-batched row UDF on the Spark side; a
    pure-SQL fold replica on the DuckDB side."""
    ensure_session_confs(spark)
    p = table(spark, sf, "part")
    c = bsd_sum16_udf(F.col("p_name")).alias("c")
    return p.select(c).agg(
        F.sum("c").cast("bigint").alias("sum_checksum"),
        F.countDistinct("c").alias("distinct_checksums"),
    )


@probe(
    "q39_pandas_udf_zscore",
    oracle=(
        "SELECT lang, ROUND(ABS(AVG(z)), 2) AS mean_abs_z, "
        "ROUND(STDDEV_SAMP(z), 2) AS std_z, COUNT(*) AS cnt FROM "
        "(SELECT lang, (n_chars - AVG(n_chars) OVER (PARTITION BY lang)) "
        "/ STDDEV_SAMP(n_chars) OVER (PARTITION BY lang) AS z FROM documents) t "
        "GROUP BY lang ORDER BY lang"
    ),
    tags=("udf", "pandas"),
)
def q39(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped pandas UDF (applyInPandas): per-lang z-score of document
    length. The group-wise standardization is the canonical
    can't-express-in-SQL-builtins-per-group shape; verified via its
    window-function algebraic equivalent (mean≈0, sample std≈1)."""
    ensure_session_confs(spark)
    d = table(spark, sf, "documents").select("lang", "n_chars")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["n_chars"].astype("float64")
        return pd.DataFrame({"lang": pdf["lang"], "z": (x - x.mean()) / x.std(ddof=1)})

    z = d.groupBy("lang").applyInPandas(zscore, schema="lang string, z double")
    return (
        z.groupBy("lang")
        .agg(
            F.round(F.abs(F.avg("z")), 2).alias("mean_abs_z"),
            F.round(F.stddev_samp("z"), 2).alias("std_z"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("lang")
    )
