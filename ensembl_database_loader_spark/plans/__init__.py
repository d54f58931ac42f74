"""The declared query surface (SURVEY.md §2.3): every probe the driver's
correctness harness checks, as (spark_fn, oracle_sql) pairs."""

from ensembl_database_loader_spark.plans.registry import Probe, all_probes, probe

# Import modules for their registration side effects.
from ensembl_database_loader_spark.plans import relational  # noqa: F401

try:  # modules added incrementally; keep package importable mid-build
    from ensembl_database_loader_spark.plans import udfs  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from ensembl_database_loader_spark.plans import windows  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from ensembl_database_loader_spark.plans import llm  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from ensembl_database_loader_spark.plans import merged  # noqa: F401
except ImportError:  # pragma: no cover
    pass

__all__ = ["Probe", "all_probes", "probe"]
