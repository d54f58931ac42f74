"""CLI: the ``init_pipeline.pl LoadDBs_conf`` analogue (README.md:41-60
parameter table, minus FTP credentials/eHive plumbing).

    python -m ensembl_database_loader_spark \
        --work-dir /data/dumps --target-dir /data/mirror \
        --mode ensembl --databases db1 db2 \
        --priority-species homo_sapiens --priority-groups variation \
        --max-concurrent 4 --max-retry 1 --failed-tolerance 0.5

Prints the A4 report to stdout; exit code 1 if any database failed.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ensembl-database-loader-spark",
        description="Mirror MySQL dump directories into a parquet target (Spark).",
    )
    p.add_argument("--work-dir", required=True, help="directory of dump databases")
    p.add_argument("--target-dir", required=True, help="parquet mirror target")
    p.add_argument("--mode", default="all", choices=("all", "ensembl", "mart"))
    p.add_argument("--databases", nargs="*", default=None,
                   help="explicit database list (mode must be 'all')")
    p.add_argument("--priority-species", nargs="*", default=[])
    p.add_argument("--priority-groups", nargs="*", default=[])
    p.add_argument("--max-concurrent", type=int, default=4)   # -hive_capacity
    p.add_argument("--max-retry", type=int, default=1)        # -max_retry_count
    p.add_argument("--failed-tolerance", type=float, default=0.5)
    p.add_argument("--no-verify", action="store_true",
                   help="skip CHECKSUMS verification")
    p.add_argument("--master", default=None, help="spark master override")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from ensembl_database_loader_spark.pipeline import mirror, render_report
    from ensembl_database_loader_spark.session import get_spark

    spark = get_spark(app_name="mirror-cli", master=args.master)
    report = mirror(
        spark,
        work_dir=args.work_dir,
        target_dir=args.target_dir,
        mode=args.mode,
        databases=args.databases,
        priority_species=tuple(args.priority_species),
        priority_groups=tuple(args.priority_groups),
        max_concurrent=args.max_concurrent,
        failed_tolerance=args.failed_tolerance,
        max_retry=args.max_retry,
        verify=not args.no_verify,
    )
    print(render_report(report.to_df(spark)))
    return 1 if report.failed_databases else 0


if __name__ == "__main__":
    sys.exit(main())
