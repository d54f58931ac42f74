"""BSD ``sum`` checksum (16-bit right-rotating) — the integrity primitive
of the reference's download verification.

The reference shells out to Unix ``sum`` per downloaded file and
compares against the CHECKSUMS manifest (`sum` invocation:
DownloadDatabase.pm:238-251; manifest parse/compare:
DownloadDatabase.pm:148-216). We reimplement the algorithm (public BSD
sum semantics: rotate right one bit, add byte, mask to 16 bits) as a
pure-Python function + a Spark UDF.

At scale the UDF runs Arrow-batched (Spark 4 arrows Python UDFs by
default); checksum verification itself is a broadcast-able full-outer
join of two small manifests (one row per file), so the distributed cost
is reading the file bytes, not the join.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType


def bsd_sum16(data: bytes) -> int:
    """16-bit BSD checksum: for each byte, rotate the accumulator right
    one bit then add the byte, modulo 2**16."""
    c = 0
    for b in data:
        c = ((c >> 1) + ((c & 1) << 15) + b) & 0xFFFF
    return c


def bsd_sum16_blocks(data: bytes, block_size: int = 1024) -> tuple[int, int]:
    """(checksum, block count) — the two fields of a CHECKSUMS line
    (`<sum16> <blocks> <filename>`, parse regex at
    DownloadDatabase.pm:204-211)."""
    return bsd_sum16(data), (len(data) + block_size - 1) // block_size


@F.udf(returnType=IntegerType(), useArrow=True)
def bsd_sum16_udf(s: str) -> int | None:
    """BSD sum16 over a string's UTF-8 bytes (Arrow-batched Python UDF)."""
    if s is None:
        return None
    return bsd_sum16(s.encode("utf-8"))


@F.udf(returnType=LongType(), useArrow=True)
def bsd_sum16_file_udf(path: str) -> int | None:
    """BSD sum16 of a local file's bytes (runs on executors; used by the
    mirror-dump CHECKSUMS verification over a manifest of file paths)."""
    if path is None:
        return None
    with open(path, "rb") as f:
        return bsd_sum16(f.read())
