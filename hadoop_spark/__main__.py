from hadoop_spark.cli import main

raise SystemExit(main())
