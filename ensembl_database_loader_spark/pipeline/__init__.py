from ensembl_database_loader_spark.pipeline.mirror import (  # noqa: F401
    CoverageError,
    MirrorReport,
    ModeError,
    assert_coverage,
    discover_local_databases,
    mirror,
    mode_filter,
    priority_branch,
    priority_score,
    render_email_summary,
    render_report,
    summarize,
)
