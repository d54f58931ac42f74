"""ensembl_database_loader_spark — a PySpark-native ETL + analytics engine.

A from-scratch re-expression of the capabilities of
Ensembl/ensembl-database-loader (a Perl/eHive MySQL mirror pipeline;
see SURVEY.md) on top of Apache Spark:

- ``sources``   : mirror-dump reader (MySQL DDL -> StructType, TSV parts,
                  CHECKSUMS verification), table catalog helpers.
- ``sinks``     : JDBC bulk-load sink wrapper (the reference's LOAD DATA
                  LOCAL INFILE analogue).
- ``operators`` : dataflow operators (priority scoring/routing, coverage
                  asserts, job summary) + LLM-data-pipeline operators
                  (dedup, similarity search, text analysis).
- ``functions`` : column-level helpers (BSD sum checksum, text norms,
                  vector math) built on pyspark.sql.functions.
- ``plans``     : the declared, oracle-checked query surface
                  (SURVEY.md §2.3 Q01..Q40, WM1..WM6, LL1..LL5 + extras).
- ``streaming`` : Structured Streaming builders (windows, dedup,
                  stream-static join).
- ``pipeline``  : driver-side mirror orchestration (discover -> filter ->
                  prioritise -> load -> report).

Everything is expressed with the DataFrame API / Spark SQL so Catalyst
plans the physical execution (predicate pushdown, broadcast vs SMJ, AQE).
"""

from ensembl_database_loader_spark.session import get_spark
from ensembl_database_loader_spark.catalog import TABLES, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_tables", "register_views"]
__version__ = "0.1.0"
