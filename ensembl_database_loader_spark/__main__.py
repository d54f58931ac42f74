from ensembl_database_loader_spark.cli import main

raise SystemExit(main())
