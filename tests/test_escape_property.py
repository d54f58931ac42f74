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


def _run_batch_decoder(physical_lines: list[str], n_cols: int, batch_size: int):
    """Drive the Arrow batch decoder exactly as mapInArrow would: an
    iterator of Arrow record batches of the 'value' line column, one
    partition."""
    import pyarrow as pa

    from ensembl_database_loader_spark.sources.mysql_dump import _strict_batch_decoder

    cols = [f"c{i}" for i in range(n_cols)]
    batches = (
        pa.record_batch(
            [pa.array(physical_lines[i : i + batch_size], type=pa.string())],
            names=["value"],
        )
        for i in range(0, len(physical_lines), batch_size)
    )
    out = []
    for rb in _strict_batch_decoder(cols)(batches):
        pydict = rb.to_pydict()
        out.extend(zip(*(pydict[c] for c in cols)))
    return out


@given(
    st.lists(st.tuples(fields, fields), min_size=1, max_size=20),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=200, deadline=None)
def test_batch_decoder_equivalent_to_line_decoder(rows, batch_size):
    """The Arrow batch decoder must be bit-identical to the per-line
    reference decoder for ANY batch boundary placement — records spanning
    Arrow batches via escaped newlines included."""
    body = "".join(
        "\t".join(mysql_escape_field(v) for v in row) + "\n" for row in rows
    )
    physical_lines = body.split("\n")[:-1]
    expected = list(_decode_mysql_lines(iter(physical_lines), 2))
    got = _run_batch_decoder(physical_lines, 2, batch_size)
    assert got == expected


@given(
    st.lists(texts, min_size=1, max_size=12),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=200, deadline=None)
def test_batch_decoder_equivalent_on_arbitrary_garbage(raw_lines, batch_size):
    """Equivalence must hold for ARBITRARY input too (malformed escapes,
    dangling backslashes at EOF, short/long rows), not just well-formed
    OUTFILE output."""
    physical_lines = [ln.replace("\n", "") for ln in raw_lines]
    expected = list(_decode_mysql_lines(iter(physical_lines), 3))
    got = _run_batch_decoder(physical_lines, 3, batch_size)
    assert got == expected
