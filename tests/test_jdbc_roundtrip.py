"""End-to-end JDBC sink tests against EMBEDDED DERBY — the pure-Java
database that ships on Spark's classpath (derby*.jar backs the Hive
metastore), so real JDBC write/read/DDL runs with zero extra installs.

This exercises the reference's core sink path (LoadFiles.pm:120-149:
create schema -> bulk load -> post-load DDL) over a live JDBC engine;
the MySQL-specific statement TEXT (DISABLE KEYS / LOAD DATA / GRANT)
stays covered by test_mirror_pipeline.py::test_sink_statement_builders.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ensembl_database_loader_spark.sinks.jdbc import (
    execute_statements,
    read_jdbc,
    write_jdbc,
)


def _derby_url(name: str) -> str:
    return f"jdbc:derby:memory:{name};create=true"


def _have_derby(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        return True
    except Exception:
        return False


@pytest.fixture()
def derby(spark):
    if not _have_derby(spark):
        pytest.skip("Derby not on Spark classpath")
    return spark


def test_jdbc_write_read_roundtrip(derby):
    spark = derby
    url = _derby_url("edl_rt")
    df = spark.createDataFrame(
        [(1, "AFRICA", 10.5), (2, "ASIA", None), (3, None, -1.25)],
        "id INT, name STRING, score DOUBLE",
    )
    write_jdbc(df, url, "regions", user="", password="", mode="overwrite")
    back = read_jdbc(spark, url, "regions")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_jdbc_append_accumulates(derby):
    spark = derby
    url = _derby_url("edl_app")
    df = spark.createDataFrame([(1, "a")], "id INT, v STRING")
    write_jdbc(df, url, "t_app", user="", password="", mode="overwrite")
    write_jdbc(df, url, "t_app", user="", password="", mode="append")
    assert read_jdbc(spark, url, "t_app").count() == 2


def test_execute_statements_ddl_bracket(derby):
    """The raw-connection passthrough: DDL + INSERT + post-load DDL over
    one connection (the shape of the reference's LOAD DATA bracket)."""
    spark = derby
    url = _derby_url("edl_ddl")
    execute_statements(
        spark,
        url,
        [
            "CREATE TABLE bracket_t (id INT, v VARCHAR(10))",
            "INSERT INTO bracket_t VALUES (1, 'x'), (2, 'y')",
            "CREATE INDEX bracket_idx ON bracket_t (id)",
        ],
    )
    back = read_jdbc(spark, url, "bracket_t")
    assert sorted(map(tuple, back.collect())) == [(1, "x"), (2, "y")]


def test_load_pipeline_into_jdbc_target(derby, tmp_path):
    """Dump-read -> JDBC target end to end: the reference's verify ->
    load chain with a real database as the sink instead of parquet."""
    from tests.test_mysql_dump import build_dump

    from ensembl_database_loader_spark.sources import read_mysql_dump

    spark = derby
    d = build_dump(str(tmp_path), "jdbc_core_1_1")
    tables = read_mysql_dump(spark, d, verify=True)
    url = _derby_url("edl_load")
    for t, df in tables.items():
        # Derby has no unquoted-lowercase identifiers; uppercase names
        write_jdbc(df, url, t.upper(), user="", password="", mode="overwrite")
    region = read_jdbc(spark, url, "REGION")
    assert {r.r_regionkey: r.r_name for r in region.collect()} == {
        0: "AFRICA",
        1: "AMERICA",
        2: None,
    }
    orders = read_jdbc(spark, url, "ORDERS")
    assert orders.count() == 3
    assert orders.filter(F.col("o_orderdate").isNull()).count() == 1  # zero-date
