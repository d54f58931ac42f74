"""Sinks: JDBC bulk write to a MySQL target + parquet mirror for the
Spark-internal catalog.

The reference's sink is `LOAD DATA LOCAL INFILE` bracketed by
DISABLE/ENABLE KEYS with a post-load ANALYZE (LoadFiles.pm:120-149,
218-234) and GRANT DDL (Grant.pm:76-104). Spark-native:

- ``write_jdbc``: ``df.write.format('jdbc')`` with the MySQL throughput
  options that approximate LOAD DATA (rewriteBatchedStatements turns
  row-at-a-time INSERTs into multi-row packets), sized by
  ``num_partitions`` — the reference's bounded sink concurrency
  (-hive_capacity 4, LoadDBs_conf.pm:154) becomes the number of
  concurrent JDBC connections.
- DISABLE KEYS / LOAD DATA / ANALYZE / GRANT are emitted as statement
  lists and executed over a raw JDBC connection via
  ``execute_statements`` (java.sql.DriverManager through the JVM
  gateway — the reference runs the same bracket over a raw DBI handle,
  LoadFiles.pm:120-149). No MySQL server exists in this container, so
  the end-to-end write/readback/statement tests run against the
  EMBEDDED DERBY engine that ships on Spark's classpath
  (tests/test_jdbc_roundtrip.py); the MySQL-specific statement TEXT is
  tested verbatim.
- ``write_parquet_mirror``: the internal mirror target — parquet +
  Spark catalog registration + ``ANALYZE TABLE COMPUTE STATISTICS``
  (the reference's post-load ANALYZE feeding the optimizer; here it
  feeds Catalyst CBO).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_GRANT_USERS = ("anonymous", "ensro")  # Grant.pm:64-66


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int = 4,
    isolation_level: str = "NONE",
) -> None:
    """Batched JDBC write. ``num_partitions`` bounds concurrent
    connections (coalesce, not repartition — no shuffle just to write);
    isolation NONE skips transactional overhead for bulk loads, matching
    the reference's DISABLE KEYS posture. MySQL URLs get the LOAD-DATA-
    approximating throughput params (rewriteBatchedStatements packs
    row INSERTs into multi-row packets); other engines (e.g. embedded
    Derby in tests) take the URL as-is."""
    tuned_url = url
    if url.startswith("jdbc:mysql"):
        sep = "&" if "?" in url else "?"
        tuned_url = f"{url}{sep}rewriteBatchedStatements=true&useSSL=false"
    w = (
        df.coalesce(num_partitions)
        .write.format("jdbc")
        .option("url", tuned_url)
        .option("dbtable", table)
        .option("batchsize", batch_size)
        .option("isolationLevel", isolation_level)
        .option("truncate", "true")
    )
    if user:
        w = w.option("user", user).option("password", password)
    w.mode(mode).save()


def read_jdbc(
    spark: SparkSession, url: str, table: str, user: str = "", password: str = ""
) -> DataFrame:
    """Read a JDBC table back (verification twin of ``write_jdbc``)."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if user:
        r = r.option("user", user).option("password", password)
    return r.load()


def execute_statements(spark: SparkSession, url: str, statements: list[str]) -> None:
    """Run raw SQL statements over one JDBC connection via the JVM
    gateway's java.sql.DriverManager — the passthrough seam for the
    reference's non-DataFrame DDL (DISABLE/ENABLE KEYS bracket,
    LoadFiles.pm:218-228; GRANT + FLUSH, Grant.pm:76-104). Driver-side
    and sequential by design: these are per-table DDL brackets, not
    data movement."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)  # noqa: SLF001
    try:
        stmt = conn.createStatement()
        try:
            for sql in statements:
                stmt.execute(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def bulk_load_statements(table: str, local_file: str) -> list[str]:
    """The reference's exact bulk-load bracket for a MySQL target
    (LoadFiles.pm:136-144, 218-234), for passthrough execution."""
    return [
        f"ALTER TABLE `{table}` DISABLE KEYS",
        (
            f"LOAD DATA LOCAL INFILE '{local_file}' INTO TABLE `{table}` "
            "FIELDS ESCAPED BY '\\\\'"
        ),
        f"ALTER TABLE `{table}` ENABLE KEYS",
        f"ANALYZE TABLE `{table}`",
    ]


def grant_statements(
    database: str,
    users: tuple[str, ...] = DEFAULT_GRANT_USERS,
    prerelease: bool = False,
) -> list[str]:
    """G1 grant DDL (template Grant.pm:79-80; flush Grant.pm:101).
    No Spark equivalent exists for internal tables — MySQL targets only.

    A prerelease load grants NOTHING — the reference's Grant runnable
    skips both the grant DDL and the flush when ``prerelease`` is set
    (Grant.pm:77-78, 96-97), so unreleased databases stay invisible to
    the public users until the real release load re-runs grants."""
    if prerelease:
        return []
    stmts = [
        f"GRANT SELECT, EXECUTE ON `{database}`.* TO '{user}'@'%'" for user in users
    ]
    stmts.append("FLUSH PRIVILEGES")
    return stmts


def write_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key.

    Two tables bucketed the same way join WITHOUT any Exchange — the
    shuffle is paid once at write time and amortized over every later
    join/aggregation on that key. This is the 100 TB answer to the
    reference's repeated per-load full rewrites: fact tables that join
    on orderkey land bucketed by orderkey. (Verified by
    tests/test_plan_quality.py::test_bucketed_join_has_no_exchange.)

    Idempotent across sessions: a managed table's warehouse directory
    outlives the in-memory catalog, so a fresh session's saveAsTable
    would fail with LOCATION_ALREADY_EXISTS — drop the catalog entry
    AND purge an orphaned location first."""
    import os
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    orphan = os.path.join(warehouse, table.lower())
    if os.path.exists(orphan):
        shutil.rmtree(orphan)
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def write_parquet_mirror(
    spark: SparkSession,
    df: DataFrame,
    database: str,
    table: str,
    base_path: str,
    analyze: bool = True,
    analyze_columns: bool = True,
) -> None:
    """Internal mirror sink: parquet + catalog registration + stats.

    ``ANALYZE TABLE ... COMPUTE STATISTICS`` is the Spark twin of the
    reference's post-load ANALYZE (LoadFiles.pm:230-234) — it feeds
    Catalyst's CBO instead of MySQL's planner. ``analyze_columns``
    additionally computes per-column NDV/min/max/null stats
    (``FOR ALL COLUMNS``): with ``spark.sql.cbo.enabled`` those let the
    optimizer estimate FILTER selectivity, so a filtered dimension
    whose raw table size exceeds the broadcast threshold can still be
    recognized as broadcast-small — the difference between a broadcast
    and a sort-merge join on every mirror query that filters a dim
    (gated in tests/test_plan_quality.py::
    test_cbo_column_stats_enable_broadcast_after_filter)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{database}`")
    path = f"{base_path}/{database}/{table}"
    df.write.mode("overwrite").parquet(path)
    spark.sql(f"DROP TABLE IF EXISTS `{database}`.`{table}`")
    spark.sql(
        f"CREATE TABLE `{database}`.`{table}` USING PARQUET LOCATION '{path}'"
    )
    if analyze:
        stmt = f"ANALYZE TABLE `{database}`.`{table}` COMPUTE STATISTICS"
        spark.sql(stmt)
        if analyze_columns:
            spark.sql(stmt + " FOR ALL COLUMNS")
