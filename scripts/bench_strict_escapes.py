#!/usr/bin/env python
"""Micro-bench: Arrow mapInArrow strict-escapes decoder vs the round-4
per-line RDD decoder, on a synthesized FIXTURES.md §2-style dump table
(8 columns, one free-text column with escaped tabs/newlines/backslashes
and \\N nulls).

The legacy path is inlined HERE (it no longer ships in the package):
``sc.textFile(...).mapPartitions(per-line decode)`` + pickled
``createDataFrame(rdd, schema)`` — exactly what
``read_dump_table(strict_escapes=True)`` did before round 5.

Measured on local[32], 6M rows x 8 cols, best-of-3 after warm-up:
scan floor 0.35s, legacy 6.9s, arrow 2.0s -> 3.4x end-to-end, 3.9x on
the decode alone (the residual is Arrow IPC + C kernels, not Python).

Usage: python scripts/bench_strict_escapes.py [--rows 400000] [--repeat 3]
Prints one JSON line with scan/legacy/arrow seconds and both speedups.
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import StringType, StructField, StructType  # noqa: E402

from ensembl_database_loader_spark.session import get_spark  # noqa: E402
from ensembl_database_loader_spark.sources.mysql_dump import (  # noqa: E402
    _decode_mysql_lines,
    _strict_batch_decoder,
)

WORDS = ["alpha", "beta\tgamma", "del\\ta", "multi\nline", "plain", "möbius"]


def mysql_escape_field(v: str | None) -> str:
    if v is None:
        return "\\N"
    return (
        v.replace("\\", "\\\\").replace("\t", "\\\t").replace("\n", "\\\n")
    )


def build_fixture(path: str, n_rows: int, n_parts: int = 8) -> list[str]:
    """n_parts gzipped TSV parts shaped like a real Ensembl table:
    8 columns (ids/coords/flags plus one free-text column), ~10% of rows
    carrying escapes in the text column and ~5% NULLs — the profile
    strict mode exists for."""
    rng = random.Random(42)
    paths = []
    per = n_rows // n_parts
    for p in range(n_parts):
        fp = os.path.join(path, f"t.{p:04d}.txt.gz")
        with gzip.open(fp, "wt", encoding="utf-8") as f:
            for i in range(per):
                rid = p * per + i
                text = (
                    rng.choice(WORDS)
                    if rng.random() < 0.10
                    else f"plain description text {rid}"
                )
                note = None if rng.random() < 0.05 else f"note {rid}"
                cells = [
                    str(rid),
                    f"ENSG{rid:011d}",
                    str(rid % 23),
                    str(rid * 37 % 1_000_000),
                    str((rid * 37 + 1000) % 1_000_000),
                    "1" if rid % 2 else "-1",
                    mysql_escape_field(text),
                    mysql_escape_field(note),
                ]
                f.write("\t".join(cells) + "\n")
        paths.append(fp)
    return paths


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="bench-strict-escapes")
    spark.sparkContext.setLogLevel("ERROR")

    schema = StructType(
        [
            StructField(c, StringType(), True)
            for c in (
                "id",
                "stable_id",
                "seq_region_id",
                "seq_start",
                "seq_end",
                "strand",
                "description",
                "note",
            )
        ]
    )
    names = [f.name for f in schema.fields]

    with tempfile.TemporaryDirectory(prefix="edl_strict_bench_") as d:
        paths = build_fixture(d, args.rows)

        def run_legacy():
            rdd = spark.sparkContext.textFile(",".join(paths)).mapPartitions(
                lambda it: _decode_mysql_lines(it, len(names))
            )
            return spark.createDataFrame(rdd, schema)

        def run_arrow():
            return spark.read.text(paths).mapInArrow(
                _strict_batch_decoder(names), schema=schema
            )

        # Equivalence gate before timing: same rows, same null count.
        agg = lambda df: df.agg(  # noqa: E731
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("note").isNull().cast("long")).alias("nulls"),
            F.sum(F.length("description")).alias("chars"),
        ).first()
        a, b = agg(run_legacy()), agg(run_arrow())
        assert (a.n, a.nulls, a.chars) == (b.n, b.nulls, b.chars), (a, b)

        def best_of(fn):
            fn().count()  # warm-up
            best = None
            for _ in range(args.repeat):
                t0 = time.perf_counter()
                fn().count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return best

        # Scan floor both paths pay: gzip decompress + line split, no
        # decoding. Subtracting it isolates the decode cost itself.
        scan = best_of(lambda: spark.read.text(paths))
        legacy = best_of(run_legacy)
        arrow = best_of(run_arrow)

    print(
        json.dumps(
            {
                "rows": args.rows,
                "scan_floor_sec": round(scan, 3),
                "legacy_sec": round(legacy, 3),
                "arrow_sec": round(arrow, 3),
                "speedup_end_to_end": round(legacy / arrow, 2),
                "speedup_decode_only": round(
                    (legacy - scan) / max(arrow - scan, 1e-9), 2
                ),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
