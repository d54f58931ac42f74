from ensembl_database_loader_spark.sinks.jdbc import (  # noqa: F401
    bulk_load_statements,
    grant_statements,
    write_bucketed_table,
    write_jdbc,
    write_parquet_mirror,
)
