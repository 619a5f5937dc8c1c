from pyranges_1_x_spark.cli import main

raise SystemExit(main())
