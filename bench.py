#!/usr/bin/env python
"""Benchmark harness: times every registered probe at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Timing is end-to-end per query: build the DataFrame plan AND consume it
(collect) — matching how the correctness driver executes probes. Warm-up
runs q01 once so JVM/session startup isn't billed to the first query.

Usage: python bench.py [--repeat N] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ensembl_database_loader_spark.plans import all_probes  # noqa: E402
from ensembl_database_loader_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--include-merged", action="store_true",
                    help="also time the window-consolidation composite probes")
    args = ap.parse_args()

    sf_dir = args.sf_dir
    # sf label from the directory name (sf0.1 -> 0.1)
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = None

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    probes = all_probes()
    # Window-consolidation composites just re-run their component probes
    # (already timed individually) — excluding them keeps the suite
    # total comparable with BASELINE.md probe-for-probe.
    if not args.include_merged:
        probes = {k: v for k, v in probes.items() if "merged" not in v.tags}
    if args.only:
        keep = set(args.only.split(","))
        probes = {k: v for k, v in probes.items() if k in keep}

    # Warm up JVM + parquet footer caches outside the timed region.
    probes_list = sorted(probes)
    if "q01_parquet_scan" in probes:
        probes["q01_parquet_scan"].spark_fn(spark, sf_dir).collect()

    times: dict[str, float] = {}
    for name in probes_list:
        p = probes[name]
        best = None
        for _ in range(max(1, args.repeat)):
            t0 = time.perf_counter()
            try:
                p.spark_fn(spark, sf_dir).collect()
            except Exception as exc:  # noqa: BLE001 - record, keep benching
                print(f"# FAIL {name}: {exc}", file=sys.stderr)
                best = None
                break
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "probe_suite_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "n_queries": len(times),
                "failed": sorted(set(probes_list) - set(times)),
            }
        )
    )
    spark.stop()
    return 0 if len(times) == len(probes_list) else 1


if __name__ == "__main__":
    raise SystemExit(main())
