from conveyor_spark.cli import main

raise SystemExit(main())
