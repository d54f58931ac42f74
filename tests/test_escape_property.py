"""Property-based round-trip of the MySQL LOAD DATA escape dialect
(SURVEY.md §5.2): random strings containing tabs/backslashes/newlines
encode (INTO OUTFILE semantics) -> decode (strict reader) losslessly.

The encoder here mirrors what MySQL's SELECT ... INTO OUTFILE ...
FIELDS ESCAPED BY '\\' emits: backslash before the escape char, the
field separator, and the line terminator; NUL as \\0; NULL as \\N.
"""

from __future__ import annotations

import gzip
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from ensembl_database_loader_spark.sources.mysql_dump import (
    _decode_mysql_lines,
    _mysql_unescape,
)


def mysql_escape_field(v: str | None) -> str:
    if v is None:
        return "\\N"
    out = []
    for ch in v:
        if ch == "\\":
            out.append("\\\\")
        elif ch == "\t":
            out.append("\\\t")
        elif ch == "\n":
            out.append("\\\n")
        elif ch == "\0":
            out.append("\\0")
        else:
            out.append(ch)
    return "".join(out)


texts = st.text(
    alphabet=st.sampled_from(list("ab\\\t\n\0xyzéμ ")), min_size=0, max_size=40
)
fields = st.one_of(st.none(), texts)


@given(st.lists(st.tuples(fields, fields), min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_encode_decode_round_trip(rows):
    body = "".join(
        "\t".join(mysql_escape_field(v) for v in row) + "\n" for row in rows
    )
    # the decoder consumes physical lines (as spark.read.text yields them)
    physical_lines = body.split("\n")[:-1]  # drop trailing empty
    decoded = list(_decode_mysql_lines(iter(physical_lines), 2))
    assert decoded == [tuple(row) for row in rows]


@given(texts)
@settings(max_examples=200, deadline=None)
def test_unescape_inverts_escape_single_field(v):
    enc = mysql_escape_field(v)
    if "\n" in v:
        return  # newline handling is the line-joiner's job, tested above
    assert _mysql_unescape(enc) == v


def test_empty_string_vs_null_distinct():
    assert _mysql_unescape("") == ""
    assert _mysql_unescape("\\N") is None
    assert _mysql_unescape("\\\\N") == "\\N"  # escaped backslash + N is data
