"""Spark 4 Python DataSource for MySQL dump directories — the
pluggable-source seam: ``spark.read.format("mysql_dump")`` over the
reference's on-disk dump format (``<db>.sql.gz`` DDL + per-table
``<table>[.NNN].txt[.gz]`` TSV parts; ``LoadFiles.pm:138-141``
dialect).

Where it sits next to ``mysql_dump.read_dump_table``: that function is
the FAST path (native csv / Arrow mapInArrow decode — vectorized,
pushdown-friendly) and stays the recommended reader. This DataSource is
the API-surface twin: the same decode semantics behind Spark's source
registry, so a dump directory composes with anything that speaks
``spark.read.format(...)`` — and it demonstrates the partition model
(one InputPartition per part FILE, so split tables read in parallel
with no driver involvement beyond the file listing).

Semantics matched to ``read_dump_table`` (tested equal row-for-row):
``\\N`` nulls, the full LOAD DATA escape letter map including escaped
separators/newlines (the strict path's semantics — the per-row Python
decode here is exact by construction), zero-dates -> NULL, DDL-derived
types (unsigned widening, ENUM/SET -> string, DECIMAL(p, s)).
"""

from __future__ import annotations

import datetime
import gzip
import os
import re
from decimal import Decimal

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ensembl_database_loader_spark.sources.mysql_dump import (
    ZERO_DATE_RE,
    _decode_mysql_lines,
    scan_dump_dir,
)

_ZERO_DATE = re.compile(ZERO_DATE_RE)


def _converter(simple: str):
    """Python-side cast for one DDL-derived Spark type (executor-local,
    applied after escape decoding; None passes through everywhere)."""
    if simple in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        return int
    if simple in ("float", "double"):
        return float
    if simple.startswith("decimal"):
        return Decimal

    if simple == "date":

        def to_date(s: str):
            return None if _ZERO_DATE.match(s) else datetime.date.fromisoformat(s)

        return to_date
    if simple.startswith("timestamp"):

        def to_ts(s: str):
            return (
                None
                if _ZERO_DATE.match(s)
                else datetime.datetime.fromisoformat(s)
            )

        return to_ts
    return lambda s: s  # string / enum / set / unknown


class _PartFile(InputPartition):
    def __init__(self, path: str):
        self.path = path


class MySQLDumpReader(DataSourceReader):
    def __init__(self, schema, options: dict):
        dump = scan_dump_dir(options["path"])
        table = options["table"]
        if table not in dump.schema.tables:
            raise KeyError(f"{dump.name}: table {table!r} not in DDL")
        self._paths = [
            os.path.join(dump.path, f)
            for f in dump.files_by_table.get(table, [])
        ]
        self._converters = [
            _converter(f.dataType.simpleString()) for f in schema.fields
        ]

    def partitions(self):
        # one partition per part file: split tables scan in parallel
        return [_PartFile(p) for p in self._paths] or [_PartFile("")]

    def read(self, partition):
        if not partition.path:
            return
        opener = gzip.open if partition.path.endswith(".gz") else open
        convs = self._converters
        with opener(partition.path, "rt", encoding="utf-8", newline="\n") as f:
            lines = (ln[:-1] if ln.endswith("\n") else ln for ln in f)
            for fields in _decode_mysql_lines(lines, len(convs)):
                yield tuple(
                    None if v is None else conv(v)
                    for conv, v in zip(convs, fields)
                )


class MySQLDumpDataSource(DataSource):
    """``spark.dataSource.register(MySQLDumpDataSource)`` then
    ``spark.read.format("mysql_dump").option("path", dump_dir)
    .option("table", name).load()``."""

    @classmethod
    def name(cls) -> str:
        return "mysql_dump"

    def schema(self):
        if "path" not in self.options or "table" not in self.options:
            raise ValueError(
                "mysql_dump source needs .option('path', <dump dir>) and "
                ".option('table', <table>)"
            )
        dump = scan_dump_dir(self.options["path"])
        table = self.options["table"]
        if table not in dump.schema.tables:
            raise KeyError(f"{dump.name}: table {table!r} not in DDL")
        return dump.schema.tables[table]

    def reader(self, schema) -> DataSourceReader:
        return MySQLDumpReader(schema, dict(self.options))
