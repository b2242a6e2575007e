"""End-to-end CLI tests: scaffold -> deps -> build -> list/show/test.

Mirrors the reference's CLI surface (dbt-sa-cli) driven through
`dbt_fusion_spark.cli.main` with an injected SparkSession (one JVM per
test session; `python -m dbt_fusion_spark` would build its own).
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from dbt_fusion_spark.cli import main
from dbt_fusion_spark.deps import install_deps, load_package_specs, resolve_hub_version
from dbt_fusion_spark.project.scaffold import init_project


@pytest.fixture(scope="module")
def jaffle(tmp_path_factory):
    return init_project(tmp_path_factory.mktemp("proj") / "jaffle_shop")


def test_init_scaffold(jaffle):
    assert (jaffle / "dbt_project.yml").exists()
    assert (jaffle / "seeds" / "raw_orders.csv").exists()


def test_cli_build_end_to_end(spark, jaffle, capsys):
    # build = seeds + models + tests in DAG order
    rc = main(["build", "--project-dir", str(jaffle)], spark=spark)
    out = capsys.readouterr().out
    assert rc == 0, out
    # all three layers ran
    assert "seed.jaffle_shop.raw_orders" in out
    assert "model.jaffle_shop.customers" in out
    assert "test.jaffle_shop" in out
    # artifacts are dbt-shaped
    rr = json.loads((jaffle / "target" / "run_results.json").read_text())
    assert all(r["status"] in ("success", "pass") for r in rr["results"])
    manifest = json.loads((jaffle / "target" / "manifest.json").read_text())
    assert "model.jaffle_shop.customers" in manifest["nodes"]
    # the marts exist and join correctly
    got = spark.sql(
        "SELECT number_of_orders FROM jaffle.customers "
        "WHERE first_name = 'Ada'").collect()
    assert got[0][0] == 2


def test_cli_run_models_only(spark, jaffle, capsys):
    rc = main(["run", "--project-dir", str(jaffle),
               "-s", "customers"], spark=spark)
    out = capsys.readouterr().out
    assert rc == 0
    assert "model.jaffle_shop.customers" in out
    assert "test." not in out


def test_cli_test_after_build(spark, jaffle, capsys):
    rc = main(["test", "--project-dir", str(jaffle)], spark=spark)
    out = capsys.readouterr().out
    assert rc == 0
    assert "PASS" in out and "model." not in out


def test_cli_list_and_show(spark, jaffle, capsys):
    rc = main(["list", "--project-dir", str(jaffle)], spark=spark)
    out = capsys.readouterr().out
    assert rc == 0 and "model.jaffle_shop.orders" in out
    rc = main(["show", "--project-dir", str(jaffle), "orders", "--limit", "3"],
              spark=spark)
    out = capsys.readouterr().out
    assert rc == 0 and "order_id" in out


def test_cli_compile_writes_sql(spark, jaffle, capsys):
    rc = main(["compile", "--project-dir", str(jaffle)], spark=spark)
    assert rc == 0
    compiled = jaffle / "target" / "compiled" / "models" / "customers.sql"
    assert compiled.exists()
    assert "{{" not in compiled.read_text()  # jinja fully rendered
    assert "jaffle" in compiled.read_text()  # refs resolved to relations


# --- deps ---------------------------------------------------------------


def _write_package(root: Path, name: str, deps: list[dict] | None = None):
    pkg = root / name
    (pkg / "macros").mkdir(parents=True)
    (pkg / "dbt_project.yml").write_text(f"name: {name}\nversion: '1.0.0'\n")
    (pkg / "macros" / f"{name}.sql").write_text(
        "{% macro " + name + "_greet() %}'hello-" + name + "'{% endmacro %}\n")
    if deps:
        import yaml
        (pkg / "packages.yml").write_text(yaml.safe_dump({"packages": deps}))
    return pkg


def test_deps_local_and_transitive(tmp_path):
    proj = init_project(tmp_path / "proj")
    # util_pkg depends on base_pkg — transitive resolution must install both
    base = _write_package(tmp_path, "base_pkg")
    _write_package(tmp_path, "util_pkg",
                   deps=[{"local": str(base)}])
    (proj / "packages.yml").write_text(
        "packages:\n  - local: ../util_pkg\n")
    installed = install_deps(proj)
    assert set(installed) == {"util_pkg", "base_pkg"}
    assert (proj / "dbt_packages" / "util_pkg" / "macros" / "util_pkg.sql").exists()
    assert (proj / "dbt_packages" / "base_pkg" / "dbt_project.yml").exists()


def test_deps_tarball(tmp_path):
    import tarfile
    proj = init_project(tmp_path / "proj")
    pkg = _write_package(tmp_path, "tar_pkg")
    tar = tmp_path / "tar_pkg.tar.gz"
    with tarfile.open(tar, "w:gz") as tf:
        tf.add(pkg, arcname="tar_pkg-1.0.0")  # github-style nesting
    (proj / "packages.yml").write_text(
        f"packages:\n  - tarball: {tar}\n    name: tar_pkg\n")
    assert install_deps(proj) == ["tar_pkg"]
    assert (proj / "dbt_packages" / "tar_pkg" / "macros" / "tar_pkg.sql").exists()


def test_deps_git(tmp_path):
    import subprocess
    proj = init_project(tmp_path / "proj")
    pkg = _write_package(tmp_path, "git_pkg")
    subprocess.run(["git", "init", "-q", "-b", "main"], cwd=pkg, check=True)
    subprocess.run(["git", "add", "-A"], cwd=pkg, check=True)
    subprocess.run(["git", "-c", "user.email=t@t", "-c", "user.name=t",
                    "commit", "-qm", "pkg"], cwd=pkg, check=True)
    (proj / "packages.yml").write_text(
        f"packages:\n  - git: file://{pkg}\n    revision: main\n")
    assert install_deps(proj) == ["git_pkg"]
    assert (proj / "dbt_packages" / "git_pkg" / "macros" / "git_pkg.sql").exists()


def test_deps_hub_offline_index(tmp_path):
    import tarfile
    proj = init_project(tmp_path / "proj")
    pkg = _write_package(tmp_path, "dbt_utils")
    tars = {}
    for ver in ("0.9.0", "1.1.1", "1.3.0", "2.0.0"):
        tar = tmp_path / f"dbt_utils-{ver}.tar.gz"
        with tarfile.open(tar, "w:gz") as tf:
            tf.add(pkg, arcname=f"dbt_utils-{ver}")
        tars[ver] = str(tar)
    index = {"dbt-labs/dbt_utils": tars}
    # range pinning picks the newest satisfying version
    ver, _ = resolve_hub_version("dbt-labs/dbt_utils",
                                 [">=1.0.0", "<2.0.0"], index)
    assert ver == "1.3.0"
    (proj / "packages.yml").write_text(
        'packages:\n  - package: dbt-labs/dbt_utils\n'
        '    version: [">=1.0.0", "<2.0.0"]\n')
    assert install_deps(proj, hub_index=index) == ["dbt_utils"]


def test_deps_package_macro_usable_in_run(spark, tmp_path, capsys):
    """A dbt deps-installed package exposes macros AND models to the
    consuming project's run — the full reference behavior."""
    proj = init_project(tmp_path / "proj")
    pkg = _write_package(tmp_path, "greet_pkg")
    (pkg / "models").mkdir()
    (pkg / "models" / "pkg_model.sql").write_text(
        "select {{ greet_pkg_greet() }} as greeting\n")
    (proj / "packages.yml").write_text(
        "packages:\n  - local: ../greet_pkg\n")
    install_deps(proj)
    # project model uses the package macro; package model also runs
    (proj / "models" / "uses_pkg.sql").write_text(
        "select {{ greet_pkg_greet() }} as g, customer_id "
        "from {{ ref('stg_customers') }}\n")
    rc = main(["build", "--project-dir", str(proj)], spark=spark)
    out = capsys.readouterr().out
    assert rc == 0, out
    assert spark.sql(
        "SELECT g FROM jaffle.uses_pkg LIMIT 1").collect()[0][0] == "hello-greet_pkg"
    assert "pkg_model" in out  # package model materialized


def test_load_package_specs_kinds(tmp_path):
    (tmp_path / "packages.yml").write_text("""\
packages:
  - package: dbt-labs/dbt_utils
    version: ">=1.0.0"
  - git: https://example.com/x.git
    revision: v2
  - local: ../pkg
  - tarball: /tmp/x.tar.gz
    name: x
""")
    specs = load_package_specs(tmp_path)
    assert [s.kind for s in specs] == ["hub", "git", "local", "tarball"]
    assert specs[0].version == [">=1.0.0"]


def test_cli_clean(jaffle, capsys):
    from dbt_fusion_spark.cli import main

    target = jaffle / "target"
    target.mkdir(exist_ok=True)
    (target / "x.json").write_text("{}")
    assert main(["clean", "--project-dir", str(jaffle)]) == 0
    assert not target.exists()


def test_cli_debug(spark, jaffle, capsys):
    assert main(["debug", "--project-dir", str(jaffle)], spark=spark) == 0
    out = capsys.readouterr().out
    assert "connection test: OK" in out and "parse OK" in out


def test_cli_typecheck(spark, jaffle, capsys):
    """`typecheck` statically validates funcsign-annotated macro calls:
    clean project exits 0; a bad call site exits 1 with a diagnostic."""
    macros = jaffle / "macros"
    macros.mkdir(exist_ok=True)
    (macros / "typed.sql").write_text(
        "{% macro add_n(col, n) %}\n"
        "-- funcsign: (string, integer) -> string\n"
        "{{ col }} + {{ n }}\n"
        "{% endmacro %}\n")
    good = jaffle / "models" / "typed_ok.sql"
    good.write_text("select {{ add_n('order_id', 1) }} as x"
                    " from {{ ref('orders') }}\n")
    rc = main(["typecheck", "--project-dir", str(jaffle)], spark=spark)
    assert rc == 0, capsys.readouterr().out
    bad = jaffle / "models" / "typed_bad.sql"
    bad.write_text("select {{ add_n('order_id', 'one') }} as x"
                   " from {{ ref('orders') }}\n")
    rc = main(["typecheck", "--project-dir", str(jaffle)], spark=spark)
    out = capsys.readouterr().out
    assert rc == 1
    assert "arg 'n' is string, expected integer" in out
    good.unlink(); bad.unlink()


def test_cli_docs_generate(spark, jaffle, capsys):
    main(["run", "--project-dir", str(jaffle)], spark=spark)
    capsys.readouterr()
    rc = main(["docs", "generate", "--project-dir", str(jaffle)], spark=spark)
    out = capsys.readouterr().out
    assert rc == 0 and "catalog.json" in out
    cat = json.loads((jaffle / "target" / "catalog.json").read_text())
    assert "model.jaffle_shop.customers" in cat["nodes"]
    cols = cat["nodes"]["model.jaffle_shop.customers"]["columns"]
    assert "number_of_orders" in cols


def test_cli_retry_reruns_only_failures(spark, jaffle, capsys):
    """`retry` re-executes exactly the error/skipped node set from the
    previous run_results.json (reference `dbt retry`)."""
    bad = jaffle / "models" / "broken.sql"
    bad.write_text("select no_such_column from {{ ref('orders') }}\n")
    dep = jaffle / "models" / "broken_child.sql"
    dep.write_text("select * from {{ ref('broken') }}\n")
    rc = main(["build", "--project-dir", str(jaffle)], spark=spark)
    capsys.readouterr()
    assert rc != 0
    rr = json.loads((jaffle / "target" / "run_results.json").read_text())
    failed = {r["unique_id"] for r in rr["results"]
              if r["status"] in ("error", "skipped")}
    assert "model.jaffle_shop.broken" in failed
    assert "model.jaffle_shop.broken_child" in failed
    # fix the model, retry: only the failed pair runs
    bad.write_text("select order_id from {{ ref('orders') }}\n")
    rc = main(["retry", "--project-dir", str(jaffle)], spark=spark)
    out = capsys.readouterr().out
    assert rc == 0, out
    rr2 = json.loads((jaffle / "target" / "run_results.json").read_text())
    ran = {r["unique_id"] for r in rr2["results"]}
    assert ran == failed
    assert all(r["status"] in ("success", "pass") for r in rr2["results"])
    # nothing left to retry
    rc = main(["retry", "--project-dir", str(jaffle)], spark=spark)
    assert rc == 0
    assert "Nothing to retry" in capsys.readouterr().out
    bad.unlink(); dep.unlink()


def test_man_schemas_validate_fixture_project(capsys):
    """`dbt man` (reference dbt_sa_clap.rs ManArgs): the emitted JSON
    Schemas must parse, and the real fixture project's config files
    must VALIDATE against them — the schemas document the loader, so a
    loader/schema drift fails here."""
    import pytest as _pytest
    import yaml as _yaml

    jsonschema = _pytest.importorskip("jsonschema")
    from dbt_fusion_spark.cli import main

    rc = main(["man"])
    assert rc == 0
    docs = json.loads(capsys.readouterr().out)
    assert set(docs) == {"project", "schema", "selector", "profile"}

    root = Path("tests/fixtures/tpch_project")
    proj = _yaml.safe_load((root / "dbt_project.yml").read_text())
    jsonschema.validate(proj, docs["project"])
    sel = _yaml.safe_load((root / "selectors.yml").read_text())
    jsonschema.validate(sel, docs["selector"])
    for props in root.glob("models/**/*.yml"):
        jsonschema.validate(_yaml.safe_load(props.read_text()),
                            docs["schema"])

    rc = main(["man", "--schema", "project"])
    assert rc == 0
    only = json.loads(capsys.readouterr().out)
    assert list(only) == ["project"]


def test_cli_lineage_after_build(spark, jaffle, capsys):
    # build first (relations must exist for the analyzer), then lineage
    assert main(["build", "--project-dir", str(jaffle)], spark=spark) == 0
    capsys.readouterr()
    rc = main(["lineage", "--project-dir", str(jaffle)], spark=spark)
    out = capsys.readouterr().out
    assert rc == 0, out
    lin = json.loads((jaffle / "target" / "lineage.json").read_text())
    assert lin, "no models in lineage"
    customers = next(v for k, v in lin.items()
                     if k.endswith(".customers"))
    assert "error" not in customers
    # every output column traces to at least one upstream (table, col),
    # and the upstream names are immediate parents, not raw files
    assert customers
    flat = [s for srcs in customers.values() for s in srcs]
    assert flat, "no sources resolved"
    assert all("table" in s and "column" in s for s in flat)
