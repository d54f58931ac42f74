#!/usr/bin/env python
"""Capture `.explain("formatted")` for named probes into plans/<round>/.

Usage: python scripts/capture_plans.py before|after name1,name2[,...]

Runs each probe's builder (side effects included — lifecycle probes
build their fixtures) and writes the RETURNED DataFrame's formatted
physical plan to plans/$PLANS_ROUND/<name>_<tag>.txt (PLANS_ROUND
defaults to r13).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ensembl_database_loader_spark.plans import all_probes  # noqa: E402
from ensembl_database_loader_spark.session import get_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    probes = all_probes()
    for name in names:
        df = probes[name].spark_fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
