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
    p.add_argument("--profile", default=None, choices=("ensembl", "eg"),
                   help="named preset: the reference's LoadDBs_conf (ensembl) "
                        "or LoadDBs_EG_conf (eg) defaults; explicit flags "
                        "override the profile")
    p.add_argument("--mode", default="all", choices=("all", "ensembl", "mart"))
    p.add_argument("--databases", nargs="*", default=None,
                   help="explicit database list (mode must be 'all')")
    p.add_argument("--priority-species", nargs="*", default=None)
    p.add_argument("--priority-groups", nargs="*", default=None)
    p.add_argument("--max-concurrent", type=int, default=None)  # -hive_capacity
    p.add_argument("--max-retry", type=int, default=None)       # -max_retry_count
    p.add_argument("--failed-tolerance", type=float, default=None)
    p.add_argument("--no-verify", action="store_true",
                   help="skip CHECKSUMS verification")
    p.add_argument("--strict-escapes", action="store_true",
                   help="full LOAD DATA escape fidelity (escaped tabs/newlines, "
                        "\\0\\b\\n\\r\\t\\Z letter map) via the Arrow-native "
                        "mapInArrow decoder; use for dumps with free-text "
                        "columns")
    p.add_argument("--master", default=None, help="spark master override")
    return p


def resolve_options(args) -> dict:
    """Merge CLI flags over the selected profile's defaults (explicit
    flag always wins; without --profile the pre-profile defaults
    apply)."""
    from ensembl_database_loader_spark.profiles import get_profile

    prof = get_profile(args.profile) if args.profile else None

    def pick(flag_val, prof_val, default):
        if flag_val is not None:
            return flag_val
        if prof is not None:
            return prof_val
        return default

    return {
        "mode": args.mode,
        "databases": args.databases,
        "priority_species": tuple(
            pick(args.priority_species, list(prof.priority_species) if prof else [], [])
        ),
        "priority_groups": tuple(
            pick(args.priority_groups, list(prof.priority_groups) if prof else [], [])
        ),
        "max_concurrent": pick(
            args.max_concurrent, prof.high_priority_load_capacity if prof else None, 4
        ),
        "max_retry": pick(args.max_retry, prof.max_retry if prof else None, 1),
        "failed_tolerance": pick(
            args.failed_tolerance, prof.load_failed_tolerance if prof else None, 0.5
        ),
    }


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from ensembl_database_loader_spark.pipeline import mirror, render_report
    from ensembl_database_loader_spark.session import get_spark

    spark = get_spark(app_name="mirror-cli", master=args.master)
    opts = resolve_options(args)
    report = mirror(
        spark,
        work_dir=args.work_dir,
        target_dir=args.target_dir,
        verify=not args.no_verify,
        strict_escapes=args.strict_escapes,
        **opts,
    )
    print(render_report(report.to_df(spark)))
    return 1 if report.failed_databases else 0


if __name__ == "__main__":
    sys.exit(main())
