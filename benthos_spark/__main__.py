from benthos_spark.cli import main

raise SystemExit(main())
