"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression bit-for-bit.

Spark evaluates ``xxhash64(c1, c2, ...)`` as a seed CHAIN starting at 42:
``h = hash_typed(c1, 42); h = hash_typed(c2, h); ...`` where each input
hashes by its PHYSICAL type (int32 and int64 of the same value hash
differently). The per-type mappings below mirror the engine:

- byte/short/int/date/boolean -> ``hash_int`` (date = epoch days,
  boolean = 0/1)
- long/timestamp -> ``hash_long``
- float -> ``hash_int(floatToIntBits)``, double ->
  ``hash_long(doubleToLongBits)`` (Java canonicalizes every NaN to the
  single quiet-NaN bit pattern)
- string/binary -> XXH64 over the UTF-8 bytes

This exists so bloom-filter PROBE positions (``pmod(xxhash64(...), bits)``
— sinks/manifest) can be computed driver-side without an engine job per
wave; bit-identity with the engine is pinned by
tests/test_manifest.py::test_bloom_positions_python_path_matches_engine
across every supported type, and unsupported types fall back to the
engine expression.
"""

from __future__ import annotations

import struct

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def hash_int(i32: int, seed: int) -> int:
    """XXH64 of one 4-byte word, Spark's ``hashInt`` specialization."""
    h = (seed + _P5 + 4) & _M64
    h ^= ((i32 & 0xFFFFFFFF) * _P1) & _M64
    h = (_rotl(h, 23) * _P2 + _P3) & _M64
    return _fmix(h)


def hash_long(i64: int, seed: int) -> int:
    """XXH64 of one 8-byte word, Spark's ``hashLong`` specialization."""
    h = (seed + _P5 + 8) & _M64
    h ^= (_rotl(((i64 & _M64) * _P2) & _M64, 31) * _P1) & _M64
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    return _fmix(h)


def _round(acc: int, word: int) -> int:
    acc = (acc + word * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def hash_bytes(data: bytes, seed: int) -> int:
    """Standard little-endian XXH64 over a byte string (Spark's
    ``hashUnsafeBytes`` for string/binary inputs)."""
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        limit = n - 32
        while off <= limit:
            w1, w2, w3, w4 = struct.unpack_from("<QQQQ", data, off)
            v1 = _round(v1, w1)
            v2 = _round(v2, w2)
            v3 = _round(v3, w3)
            v4 = _round(v4, w4)
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while off + 8 <= n:
        (w,) = struct.unpack_from("<Q", data, off)
        h = (_rotl(h ^ _round(0, w), 27) * _P1 + _P4) & _M64
        off += 8
    if off + 4 <= n:
        (w,) = struct.unpack_from("<I", data, off)
        h = (_rotl(h ^ (w * _P1) & _M64, 23) * _P2 + _P3) & _M64
        off += 4
    while off < n:
        h = (_rotl(h ^ (data[off] * _P5) & _M64, 11) * _P1) & _M64
        off += 1
    return _fmix(h)


_NAN_BITS = 0x7FF8000000000000  # Java doubleToLongBits canonical NaN


def hash_typed(value, dtype: str, seed: int):
    """Hash ``value`` exactly as Spark's xxhash64 hashes a non-null
    column of ``dtype``; returns NotImplemented for (value, dtype)
    combinations this module does not cover (caller falls back to the
    engine). The VALUE must already be of the column's logical Python
    type — no casting happens here."""
    if dtype in ("bigint", "long"):
        if type(value) is int and -(2**63) <= value < 2**63:
            return hash_long(value, seed)
    elif dtype in ("int", "integer", "smallint", "tinyint"):
        if type(value) is int:
            lo, hi = {
                "smallint": (-(2**15), 2**15),
                "tinyint": (-(2**7), 2**7),
            }.get(dtype, (-(2**31), 2**31))
            if lo <= value < hi:
                return hash_int(value, seed)
    elif dtype == "string":
        if type(value) is str:
            return hash_bytes(value.encode("utf-8"), seed)
    elif dtype == "boolean":
        if type(value) is bool:
            return hash_int(1 if value else 0, seed)
    elif dtype == "double":
        if type(value) is float:
            if value != value:
                bits = _NAN_BITS
            else:
                if value == 0.0:
                    value = 0.0  # Spark normalizes -0.0 to +0.0 pre-hash
                (bits,) = struct.unpack("<q", struct.pack("<d", value))
            return hash_long(bits, seed)
    elif dtype == "date":
        import datetime

        if type(value) is datetime.date:
            return hash_int((value - datetime.date(1970, 1, 1)).days, seed)
    return NotImplemented
