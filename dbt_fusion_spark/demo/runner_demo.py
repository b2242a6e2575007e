"""Gate query driving the FULL project runner path end-to-end.

One oracle-checked row covers four materializations at once: the
staging views, the ephemeral CTE inlining of order_lines, the
customer_revenue table CTAS, and the nation_stats_py PYTHON model
(native `def model(dbt, session)` contract, runner.py python-model
executor) — everything the fixture project's `+nation_stats_py`
selection builds. The oracle restates the whole model pipeline as one
DuckDB WITH-query.
"""

from __future__ import annotations

import uuid
from pathlib import Path

from dbt_fusion_spark.demo.registry import register

_PROJECT = str(Path(__file__).resolve().parent.parent.parent
               / "tests" / "fixtures" / "tpch_project")


@register(
    "runner_python_model_pipeline",
    oracle="""
    WITH stg_customers AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal,
             c_mktsegment AS segment
      FROM customer),
    order_lines AS (
      SELECT l_orderkey,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(8,4))) AS net_price
      FROM lineitem),
    customer_revenue AS (
      SELECT c.c_custkey,
             CAST(SUM(ol.net_price) AS DOUBLE) AS revenue
      FROM stg_customers c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN order_lines ol ON ol.l_orderkey = o.o_orderkey
      GROUP BY c.c_custkey)
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(revenue AS DECIMAL(18,6))) AS DOUBLE)
             AS nation_revenue
    FROM stg_customers JOIN customer_revenue USING (c_custkey)
    GROUP BY c_nationkey
    """,
)
def runner_python_model_pipeline(spark, sf_dir):
    """dbt-style run of `+nation_stats_py`: sources -> staging views ->
    ephemeral inline -> table CTAS -> python model table. Unique schema
    per invocation (no stale-warehouse collisions under the harness's
    vanilla session); the result is materialized driver-side so the
    schema can be dropped before returning."""
    from dbt_fusion_spark.runner import DbtSparkRunner

    # The fixture's on-run-start hook writes to a hardcoded
    # `analytics.audit_log`; ensure the schema exists, and clear a
    # STALE table location: each harness process gets a fresh derby
    # metastore, but ./spark-warehouse persists on disk, so a table
    # absent from this catalog can still own its directory
    # (LOCATION_ALREADY_EXISTS on the hook's CREATE otherwise).
    spark.sql("CREATE DATABASE IF NOT EXISTS analytics")
    if not spark.catalog.tableExists("analytics.audit_log"):
        import shutil
        wh = spark.conf.get("spark.sql.warehouse.dir")
        wh = wh.removeprefix("file:")
        shutil.rmtree(f"{wh}/analytics.db/audit_log", ignore_errors=True)
    # The fixture pins source locations to sf0.001; the gate compares
    # at the harness's sf_dir. Stage a copy with rewritten locations —
    # the project itself stays untouched.
    import shutil
    import tempfile
    proj = tempfile.mkdtemp(prefix="gate_proj_")
    shutil.copytree(_PROJECT, proj, dirs_exist_ok=True)
    shutil.rmtree(f"{proj}/target", ignore_errors=True)
    for rel in ("models/staging/schema.yml", "dbt_project.yml"):
        f = Path(proj) / rel
        f.write_text(f.read_text().replace("/root/testdata/sf0.001", sf_dir))

    schema = f"gate_run_{uuid.uuid4().hex[:8]}"
    runner = DbtSparkRunner(
        spark, proj,
        profile={"schema": schema, "threads": 1, "name": "gate"},
        vars={"sf_dir": sf_dir})
    rr = runner.run(select="+nation_stats_py")
    failures = [(r.unique_id, r.message) for r in rr.results
                if r.status not in ("success", "pass")]
    assert not failures, failures
    out = spark.table(f"`{schema}`.`nation_stats_py`")
    result = spark.createDataFrame(out.collect(), out.schema)
    spark.sql(f"DROP DATABASE IF EXISTS `{schema}` CASCADE")
    return result


@register(
    "runner_seed_typed_load",
    oracle="""
    SELECT * FROM (VALUES
      ('AUTOMOBILE', 'Automobile', CAST(1 AS BIGINT)),
      ('BUILDING',   'Building',   CAST(2 AS BIGINT)),
      ('FURNITURE',  'Furniture',  CAST(3 AS BIGINT)),
      ('HOUSEHOLD',  'Household',  CAST(4 AS BIGINT)),
      ('MACHINERY',  'Machinery',  CAST(5 AS BIGINT))
    ) AS t(segment, label, priority_rank)
    """,
)
def runner_seed_typed_load(spark, sf_dir):
    """Seed materialization through the runner: CSV -> agate-style type
    sniffing (ints land as BIGINT, dbt-spark convert_number_type) ->
    table. Oracle is the literal seed content with the expected types."""
    from dbt_fusion_spark.runner import DbtSparkRunner

    schema = f"gate_seed_{uuid.uuid4().hex[:8]}"
    spark.sql("CREATE DATABASE IF NOT EXISTS analytics")
    if not spark.catalog.tableExists("analytics.audit_log"):
        import shutil
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{wh}/analytics.db/audit_log", ignore_errors=True)
    runner = DbtSparkRunner(
        spark, _PROJECT,
        profile={"schema": schema, "threads": 1, "name": "gate"})
    rr = runner.run(select="segment_names")
    assert all(r.status in ("success", "pass") for r in rr.results), [
        (r.unique_id, r.message) for r in rr.results]
    out = spark.table(f"`{schema}`.`segment_names`")
    result = spark.createDataFrame(out.collect(), out.schema)
    spark.sql(f"DROP DATABASE IF EXISTS `{schema}` CASCADE")
    return result


def _gate_runner(spark, sf_dir, schema, extra_rewrites=None):
    """Shared staging for runner-path gate queries: analytics hook
    schema + stale-location cleanup + project copy with sf_dir
    rewritten (see runner_python_model_pipeline). `extra_rewrites`
    maps old -> new strings applied to the same staged files."""
    import shutil
    import tempfile

    from dbt_fusion_spark.runner import DbtSparkRunner

    spark.sql("CREATE DATABASE IF NOT EXISTS analytics")
    if not spark.catalog.tableExists("analytics.audit_log"):
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{wh}/analytics.db/audit_log", ignore_errors=True)
    proj = tempfile.mkdtemp(prefix="gate_proj_")
    shutil.copytree(_PROJECT, proj, dirs_exist_ok=True)
    shutil.rmtree(f"{proj}/target", ignore_errors=True)
    for rel in ("models/staging/schema.yml", "dbt_project.yml"):
        f = Path(proj) / rel
        text = f.read_text().replace("/root/testdata/sf0.001", sf_dir)
        for old, new in (extra_rewrites or {}).items():
            text = text.replace(old, new)
        f.write_text(text)
    return DbtSparkRunner(
        spark, proj,
        profile={"schema": schema, "threads": 1, "name": "gate"})


def _collect_drop(spark, schema, table):
    out = spark.table(f"`{schema}`.`{table}`")
    result = spark.createDataFrame(out.collect(), out.schema)
    spark.sql(f"DROP DATABASE IF EXISTS `{schema}` CASCADE")
    return result


@register(
    "runner_materialized_view",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def runner_materialized_view(spark, sf_dir):
    """materialized_view materialization (models/materialized_view.sql
    emulation: full recompute into the relation on refresh) driven
    through the runner."""
    schema = f"gate_mv_{uuid.uuid4().hex[:8]}"
    runner = _gate_runner(spark, sf_dir, schema)
    rr = runner.run(select="+revenue_mv")
    assert all(r.status in ("success", "pass") for r in rr.results), [
        (r.unique_id, r.message) for r in rr.results]
    return _collect_drop(spark, schema, "revenue_mv")


@register(
    "runner_clone_contents",
    oracle="""
    WITH stg_customers AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal,
             c_mktsegment AS segment
      FROM customer),
    order_lines AS (
      SELECT l_orderkey,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(8,4))) AS net_price
      FROM lineitem)
    SELECT c.c_custkey,
           ANY_VALUE(c.c_name) AS c_name,
           ANY_VALUE(c.segment) AS segment,
           CAST(SUM(ol.net_price) AS DOUBLE) AS revenue,
           COUNT(DISTINCT o.o_orderkey) AS n_orders
    FROM stg_customers c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN order_lines ol ON ol.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey
    """,
)
def runner_clone_contents(spark, sf_dir):
    """clone materialization (zero-copy pointer emulated as a view over
    the source relation): the clone's contents must equal the cloned
    table's defining query."""
    schema = f"gate_clone_{uuid.uuid4().hex[:8]}"
    runner = _gate_runner(spark, sf_dir, schema)
    rr = runner.run(select="+customer_revenue_clone")
    assert all(r.status in ("success", "pass") for r in rr.results), [
        (r.unique_id, r.message) for r in rr.results]
    return _collect_drop(spark, schema, "customer_revenue_clone")


@register(
    "runner_custom_materialization",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def runner_custom_materialization(spark, sf_dir):
    """User-defined `{% materialization ctas_sorted %}` block
    (macros/custom_materialization.sql) dispatched by the runner for
    the top_orders_custom model — the custom-materialization extension
    point end-to-end."""
    schema = f"gate_custom_{uuid.uuid4().hex[:8]}"
    runner = _gate_runner(spark, sf_dir, schema)
    rr = runner.run(select="+top_orders_custom")
    assert all(r.status in ("success", "pass") for r in rr.results), [
        (r.unique_id, r.message) for r in rr.results]
    return _collect_drop(spark, schema, "top_orders_custom")


@register(
    "runner_statement_agate_codes",
    oracle="""
    WITH stg AS (SELECT c_custkey, c_mktsegment AS segment FROM customer),
    codes AS (
      SELECT segment,
             CAST(row_number() OVER (ORDER BY segment) AS INTEGER) AS code
      FROM (SELECT DISTINCT segment FROM stg))
    SELECT s.c_custkey, s.segment, c.code AS seg_code
    FROM stg s JOIN codes c USING (segment)
    """,
)
def runner_statement_agate_codes(spark, sf_dir):
    """The statement/store_result/load_result protocol + driver-side
    agate table inside a model (segment_codes.sql): a compile-time
    query enumerates distinct segments, the Jinja loop generates a CASE
    mapping each to its ordinal. Oracle restates the generated CASE as
    a row_number join."""
    schema = f"gate_stmt_{uuid.uuid4().hex[:8]}"
    runner = _gate_runner(spark, sf_dir, schema)
    rr = runner.run(select="+segment_codes")
    assert all(r.status in ("success", "pass") for r in rr.results), [
        (r.unique_id, r.message) for r in rr.results]
    return _collect_drop(spark, schema, "segment_codes")


@register(
    "runner_incremental_schema_evolution",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
           split_part(o_orderpriority, '-', 1) AS priority_rank,
           CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                THEN o_orderstatus END AS o_orderstatus
    FROM orders
    """,
)
def runner_incremental_schema_evolution(spark, sf_dir):
    """on_schema_change='append_new_columns' through two real runs: the
    first builds recent_orders from the unmodified fixture; the model
    file then gains an o_orderstatus column and the second (incremental
    merge) run must ALTER the target to add it — matched rows (past the
    cutoff) get values, historical rows stay NULL."""
    schema = f"gate_evo_{uuid.uuid4().hex[:8]}"
    runner = _gate_runner(spark, sf_dir, schema)
    rr = runner.run(select="+recent_orders")
    assert all(r.status in ("success", "pass") for r in rr.results), [
        (r.unique_id, r.message) for r in rr.results]

    # evolve the model: a new column appears in the source query
    model = Path(runner.project.root) / "models" / "marts" / "recent_orders.sql"
    model.write_text(model.read_text().replace(
        "select o_orderkey, o_custkey, o_totalprice, o_orderdate,"
        " priority_rank",
        "select o_orderkey, o_custkey, o_totalprice, o_orderdate,"
        " priority_rank, o_orderstatus"))

    from dbt_fusion_spark.runner import DbtSparkRunner
    runner2 = DbtSparkRunner(
        spark, str(runner.project.root),
        profile={"schema": schema, "threads": 1, "name": "gate"})
    rr2 = runner2.run(select="+recent_orders")
    assert all(r.status in ("success", "pass") for r in rr2.results), [
        (r.unique_id, r.message) for r in rr2.results]
    return _collect_drop(spark, schema, "recent_orders")


@register(
    "runner_full_build_statuses",
    oracle="""
    SELECT * FROM (VALUES
      ('model.tpch_demo.customer_revenue', 'success'),
      ('model.tpch_demo.customer_revenue_clone', 'success'),
      ('model.tpch_demo.nation_stats_py', 'success'),
      ('model.tpch_demo.order_bands', 'success'),
      ('model.tpch_demo.order_lines', 'success'),
      ('model.tpch_demo.order_value_usd', 'success'),
      ('model.tpch_demo.orders_by_month', 'success'),
      ('model.tpch_demo.orders_stream', 'success'),
      ('model.tpch_demo.recent_orders', 'success'),
      ('model.tpch_demo.revenue_mv', 'success'),
      ('model.tpch_demo.segment_codes', 'success'),
      ('model.tpch_demo.stg_customers', 'success'),
      ('model.tpch_demo.stg_orders', 'success'),
      ('model.tpch_demo.top_orders_custom', 'success'),
      ('seed.tpch_demo.segment_names', 'success'),
      ('snapshot.tpch_demo.orders_snapshot', 'success'),
      ('test.tpch_demo.accepted_values_stg_orders_o_orderstatus', 'pass'),
      ('test.tpch_demo.not_null_stg_orders_o_orderkey', 'pass'),
      ('test.tpch_demo.positive_values_stg_orders_o_totalprice', 'pass'),
      ('test.tpch_demo.relationships_customer_revenue_segment', 'pass'),
      ('test.tpch_demo.unique_customer_revenue_c_custkey', 'pass'),
      ('test.tpch_demo.unique_stg_orders_o_orderkey', 'pass'),
      ('test.tpch_demo.within_range_stg_orders_o_totalprice', 'pass'),
      ('unit_test.tpch_demo.ut_stg_orders_derivations', 'pass'),
      ('unit_test.tpch_demo.ut_stg_orders_overrides', 'pass')
    ) AS t(unique_id, status)
    """,
)
def runner_full_build_statuses(spark, sf_dir):
    """The ENTIRE fixture project lifecycle in one gate row: seeds,
    views, ephemeral inlining, CTAS, incremental, python model, MV,
    clone, custom materialization, statement-protocol model, SQL UDF
    function node, streaming table, SCD-2 snapshot, all schema/data
    tests (built-in + {% test %} custom generics + relationships) and
    the fixture unit test — every node must land success/pass."""
    schema = f"gate_full_{uuid.uuid4().hex[:8]}"
    runner = _gate_runner(
        spark, sf_dir, schema,
        extra_rewrites={"`analytics`.`segment_names`":
                        f"`{schema}`.`segment_names`"})
    rr = runner.run()
    rows = [(r.unique_id, r.status)
            for r in sorted(rr.results, key=lambda r: r.unique_id)]
    spark.sql(f"DROP DATABASE IF EXISTS `{schema}` CASCADE")
    return spark.createDataFrame(rows, "unique_id string, status string")


@register(
    "runner_versioned_models",
    # deterministic summary of which version each consumer resolved to
    oracle="""
    SELECT * FROM (VALUES
      ('latest', CAST(1 AS BIGINT), 'v2'),
      ('pinned_v1', CAST(1 AS BIGINT), 'none')
    ) AS t(which, id, shape)
    """,
)
def runner_versioned_models(spark, sf_dir):
    """dbt 1.5 versioned models through the runner: `versions:` expands
    to model.<pkg>.<name>.v<N> nodes with `<name>_v<N>` aliases; an
    unversioned ref() resolves to latest_version, ref(..., v=1) pins.
    The result row set proves both resolutions built from the right
    version's code."""
    import tempfile
    from pathlib import Path as _P

    from dbt_fusion_spark.runner import DbtSparkRunner

    proj = _P(tempfile.mkdtemp(prefix="gate_vproj_"))
    (proj / "models").mkdir()
    (proj / "dbt_project.yml").write_text(
        "name: vdemo\nversion: '1.0'\nprofile: spark_local\n"
        "model-paths: ['models']\n")
    (proj / "models" / "dim_customers.sql").write_text(
        "select 1 as id, 'v2' as shape")
    (proj / "models" / "dim_customers_v1.sql").write_text(
        "select 1 as id")
    (proj / "models" / "uses_latest.sql").write_text(
        "select * from {{ ref('dim_customers') }}")
    (proj / "models" / "uses_pinned.sql").write_text(
        "select * from {{ ref('dim_customers', v=1) }}")
    (proj / "models" / "schema.yml").write_text(
        "version: 2\nmodels:\n"
        "  - name: dim_customers\n"
        "    latest_version: 2\n"
        "    versions:\n      - v: 1\n      - v: 2\n")
    schema = f"gate_ver_{uuid.uuid4().hex[:8]}"
    runner = DbtSparkRunner(
        spark, str(proj),
        profile={"schema": schema, "threads": 1, "name": "gate"})
    rr = runner.run()
    assert all(r.status in ("success", "pass") for r in rr.results), [
        (r.unique_id, r.message) for r in rr.results]
    out = spark.sql(
        f"SELECT 'latest' AS which, id, shape FROM `{schema}`.`uses_latest` "
        f"UNION ALL "
        f"SELECT 'pinned_v1', id, 'none' FROM `{schema}`.`uses_pinned`")
    result = spark.createDataFrame(out.collect(), out.schema)
    spark.sql(f"DROP DATABASE IF EXISTS `{schema}` CASCADE")
    return result
