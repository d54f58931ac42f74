from ensembl_database_loader_spark.sources.mysql_ddl import (  # noqa: F401
    DumpSchema,
    parse_mysql_ddl,
)
from ensembl_database_loader_spark.sources.mysql_dump import (  # noqa: F401
    ChecksumError,
    DumpDirectory,
    group_part_files,
    read_mysql_dump,
    scan_dump_dir,
    verify_checksums,
)
