"""MySQL dump DDL -> Spark StructType translation.

The reference never parses the dump DDL — it pipes the whole
``<db>.sql.gz`` to the ``mysql`` CLI (LoadFiles.pm:106-116,
Database.pm:78-89) and stays type-agnostic. A Spark-native loader has
to know column types to build typed DataFrames, so this module carries
the deliberately small grammar SURVEY.md §7.4 calls for:

- ``CREATE TABLE `name` (...)``: column name + type per line; PRIMARY
  KEY / KEY / UNIQUE / CONSTRAINT / FULLTEXT / SPATIAL lines ignored
  (Spark tables have no secondary indexes; the reference defers them
  too via DISABLE KEYS, LoadFiles.pm:218-228).
- ``CREATE VIEW `name` AS ...``: name recorded so data-file loading can
  skip it — the dump never ships rows for views (view detection in the
  reference: SHOW FULL TABLES + /view/i, Database.pm:65-76; skip at
  LoadFiles.pm:123-129).
- Everything else (SET statements, comments, /*!40101 ...*/ directives,
  DROP TABLE IF EXISTS) is passthrough noise.

Type mapping (MySQL -> Spark): ENUM/SET -> String, DECIMAL(p,s) ->
Decimal(p,s), DATETIME/TIMESTAMP -> Timestamp, unsigned INT widened to
Long (UINT32 overflows IntegerType). Nullability is parsed but fields
are emitted nullable — dumps routinely carry ``\\N`` in NOT NULL
columns that MySQL coerces on load, and a strict reader would reject
whole rows.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql.types import (
    BinaryType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_CREATE_TABLE_RE = re.compile(
    r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?`?(?P<name>\w+)`?\s*\(",
    re.IGNORECASE,
)
_CREATE_VIEW_RE = re.compile(
    r"CREATE\s+(?:OR\s+REPLACE\s+)?(?:ALGORITHM\s*=\s*\w+\s+)?(?:DEFINER\s*=\s*\S+\s+)?(?:SQL\s+SECURITY\s+\w+\s+)?VIEW\s+`?(?P<name>\w+)`?",
    re.IGNORECASE,
)
_COLUMN_RE = re.compile(
    r"^`(?P<name>[^`]+)`\s+(?P<type>\w+)(?:\((?P<args>[^)]*)\))?(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_NON_COLUMN_PREFIXES = (
    "PRIMARY",
    "UNIQUE",
    "KEY",
    "INDEX",
    "CONSTRAINT",
    "FULLTEXT",
    "SPATIAL",
    "FOREIGN",
    "CHECK",
)


@dataclass
class DumpSchema:
    """Parsed dump DDL: table schemas + view names (+ raw DDL text for
    JDBC passthrough replay, the L2 analogue)."""

    tables: dict[str, StructType] = field(default_factory=dict)
    views: list[str] = field(default_factory=list)
    raw_ddl: str = ""


def _strip_comments(sql: str) -> str:
    # Unwrap /*!NNNNN ... */ conditional (versioned) comments FIRST,
    # keeping their inner SQL: real mysqldump output wraps CREATE VIEW
    # (and its CREATE TABLE stand-in) in /*!50001 ... */, so deleting
    # them wholesale would silently lose those views. Note [^!] below:
    # plain block comments are removed, conditionals survive unwrapping.
    sql = re.sub(r"/\*!\d*\s?(.*?)\*/", r"\1", sql, flags=re.DOTALL)
    sql = re.sub(r"/\*[^!].*?\*/|/\*\*/", "", sql, flags=re.DOTALL)
    sql = re.sub(r"--[^\n]*", "", sql)
    sql = re.sub(r"^\s*#[^\n]*$", "", sql, flags=re.MULTILINE)
    return sql


def _mysql_type_to_spark(base: str, args: str | None, rest: str) -> DataType:
    t = base.lower()
    unsigned = "unsigned" in rest.lower()
    if t in ("tinyint", "smallint", "mediumint"):
        return IntegerType()
    if t in ("int", "integer"):
        return LongType() if unsigned else IntegerType()
    if t in ("bigint", "serial"):
        return LongType()  # unsigned BIGINT can overflow; dumps rarely use top bit
    if t in ("decimal", "numeric"):
        if args:
            parts = [p.strip() for p in args.split(",")]
            p = int(parts[0])
            s = int(parts[1]) if len(parts) > 1 else 0
            return DecimalType(p, s)
        return DecimalType(10, 0)
    if t == "float":
        return FloatType()
    if t in ("double", "real"):
        return DoubleType()
    if t in ("datetime", "timestamp"):
        return TimestampType()
    if t == "date":
        return DateType()
    if t == "year":
        return IntegerType()
    if t in ("blob", "tinyblob", "mediumblob", "longblob", "binary", "varbinary"):
        return BinaryType()
    # char/varchar/text family, enum, set, time, json, bit, geometry, ...
    return StringType()


def _parse_columns(body: str) -> StructType:
    fields: list[StructField] = []
    # split on commas at paren depth 0 (ENUM('a','b') contains commas)
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    for part in parts:
        line = part.strip()
        if not line or line.upper().startswith(_NON_COLUMN_PREFIXES):
            continue
        m = _COLUMN_RE.match(line)
        if not m:
            continue
        dtype = _mysql_type_to_spark(m.group("type"), m.group("args"), m.group("rest"))
        fields.append(StructField(m.group("name"), dtype, nullable=True))
    return StructType(fields)


def _body_at(sql: str, open_idx: int) -> str:
    """The text between the paren at open_idx and its matching close
    (depth scan — regex can't balance nested type parens like
    DECIMAL(12,2) against the table's own parentheses)."""
    depth = 0
    for i in range(open_idx, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return sql[open_idx + 1 : i]
    return sql[open_idx + 1 :]  # unbalanced: take the rest


def parse_mysql_ddl(sql: str) -> DumpSchema:
    """Parse a MySQL dump's DDL into table StructTypes + view names."""
    out = DumpSchema(raw_ddl=sql)
    cleaned = _strip_comments(sql)
    for m in _CREATE_TABLE_RE.finditer(cleaned):
        body = _body_at(cleaned, m.end() - 1)
        out.tables[m.group("name")] = _parse_columns(body)
    for m in _CREATE_VIEW_RE.finditer(cleaned):
        # mysqldump emits each view twice (temporary stand-in + final
        # structure, both in /*!50001 ... */ conditionals): dedupe.
        if m.group("name") not in out.views:
            out.views.append(m.group("name"))
    return out
