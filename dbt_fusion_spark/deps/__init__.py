from dbt_fusion_spark.deps.resolver import (  # noqa: F401
    PackageSpec,
    install_deps,
    load_package_specs,
    resolve_hub_version,
)
