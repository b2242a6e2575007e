from __future__ import annotations

import os
import shutil
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # smaller for test speed


@pytest.fixture(scope="session")
def spark():
    from dbt_fusion_spark.session import get_spark

    wh = tempfile.mkdtemp(prefix="dfs-warehouse-")
    s = get_spark(app_name="dbt-fusion-spark-tests", warehouse_dir=wh)
    yield s
    s.stop()
    shutil.rmtree(wh, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def sf_small() -> str:
    return "/root/testdata/sf0.001"
