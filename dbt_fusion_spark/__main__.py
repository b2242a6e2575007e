import sys

from dbt_fusion_spark.cli import main

sys.exit(main())
