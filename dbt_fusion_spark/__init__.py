"""dbt_fusion_spark — a PySpark-native analytics/transformation engine.

A ground-up re-expression of the capabilities of the reference engine
(`jakemarchewitz-8451/dbt-fusion`, a Rust dbt engine) on Apache Spark:

- project loading + Jinja compilation + ref/source DAG (reference crates
  dbt-loader / dbt-jinja / dbt-parser),
- materializations: view, table, incremental (append / merge /
  delete+insert / insert_overwrite / microbatch), SCD2 snapshots, seeds,
  data tests, unit tests (reference macro library under
  crates/dbt-loader/src/dbt_macro_assets/),
- the cross-database function surface (`{{ dbt.* }}` macros) emitted as
  native Spark SQL,
- adapter surface over spark.sql / spark.catalog (reference
  crates/dbt-adapter/src/base_adapter.rs),
- sampling strategies (reference crates/dbt-sample/src/plan.rs),
- plus LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing) designed for 100 TB scale.

Architecture is Spark-first: logical plans are declared via the
DataFrame/SQL API and optimized by Catalyst; nothing is hand-scheduled.
"""

__version__ = "0.1.0"

from dbt_fusion_spark.session import get_spark  # noqa: F401
