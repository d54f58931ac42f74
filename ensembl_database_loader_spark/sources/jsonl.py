"""JSONL (newline-delimited JSON) source/sink — the interchange format
LLM training corpora actually ship in (one JSON object per line,
usually gzipped shards).

Reference analogue: the loader's TSV ingest surface
(``LoadFiles.pm:138-141`` LOAD DATA dialect) generalized to the format
modern pipelines exchange; same contract (explicit schema, escape-safe
round-trip, malformed-input accounting).

Scale posture:
- **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a FULL extra pass over the data to infer one — at 100 TB
  that doubles the scan. ``read_jsonl`` therefore takes the schema as
  a required argument (DDL string or StructType).
- **One record per line** (``multiLine=False``, the default): line-
  delimited JSON is splittable, so a 1 TB uncompressed shard still
  fans out across tasks. Gzip shards are NOT splittable — one task per
  file — so the writer defaults to many shards; keep shard size ~<1 GB
  at the source.
- **PERMISSIVE + corrupt-record capture**: real web-scale dumps carry
  malformed lines; failing the job on line 3 billion is not an option.
  Bad lines land in ``corrupt_col`` (everything else null) and
  ``jsonl_quality_report`` quantifies them — the per-file accounting
  the reference keeps for checksum mismatches (``CheckSums.pm``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_col(
    schema: str | StructType, corrupt_col: str
) -> StructType:
    """Normalize a DDL-or-StructType schema and append the corrupt-
    record capture column — shared by the batch and streaming readers
    so the two dialects cannot drift."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if corrupt_col not in schema.fieldNames():
        schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType(), True)]
        )
    return schema


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Read line-delimited JSON with an EXPLICIT schema (no inference
    pass) in PERMISSIVE mode; malformed lines surface as rows with all
    data columns null and the raw line in ``corrupt_col``."""
    schema = _with_corrupt_col(schema, corrupt_col)
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    compression: str | None = None,
) -> None:
    """Write one JSON object per line. ``n_shards`` repartitions (use
    it with ``compression='gzip'`` — gzip files are unsplittable, so
    shard count fixes downstream read parallelism)."""
    if n_shards is not None:
        df = df.repartition(n_shards)
    w = df.write.mode("overwrite")
    if compression is not None:
        w = w.option("compression", compression)
    w.json(path)


def jsonl_quality_report(
    df: DataFrame, corrupt_col: str = CORRUPT_COL
) -> DataFrame:
    """One row: good/corrupt line counts for a ``read_jsonl`` frame —
    the load-accounting step (a malformed-rate gate belongs in every
    ingest job). Spark refuses queries whose referenced columns are
    ONLY the corrupt-record column (SQLSTATE 0A000), so the good count
    deliberately routes through a data column."""
    c = F.col(corrupt_col)
    data_cols = [n for n in df.columns if n != corrupt_col]
    good = (
        F.when(c.isNull(), F.coalesce(F.col(data_cols[0]).cast("string"), F.lit("")))
        if data_cols
        else F.when(c.isNull(), F.lit(""))
    )
    return df.agg(
        F.count(good).alias("n_good"),
        F.count(F.when(c.isNotNull(), 1)).alias("n_corrupt"),
    )


def stream_jsonl(
    spark: SparkSession,
    landing_dir: str,
    schema: str | StructType,
    corrupt_col: str = CORRUPT_COL,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming tail of a JSONL landing directory — the crawl-ingest
    shape: new ``*.json`` / ``*.json.gz`` shards dropped into
    ``landing_dir`` surface as micro-batches with the SAME schema,
    PERMISSIVE corrupt capture, and dialect as ``read_jsonl`` (batch
    backfill and streaming tail stay interchangeable — the
    backfill-plus-tail pattern of ``pipeline/incremental.py``).
    ``max_files_per_trigger`` bounds per-trigger work."""
    schema = _with_corrupt_col(schema, corrupt_col)
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(landing_dir)
    )
