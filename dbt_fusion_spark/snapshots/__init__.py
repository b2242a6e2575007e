from dbt_fusion_spark.snapshots.scd2 import (  # noqa: F401
    SnapshotConfig,
    snapshot_build,
    snapshot_merge,
    snapshot_run,
    snapshot_staged_changes,
)
