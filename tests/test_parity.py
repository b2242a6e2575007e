"""Driver-gate replica: every queries() entry with an oracle must match
DuckDB on row count, schema, and canonicalized values at sf0.01."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.parity_util import compare

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    # Driver-canonicalizer contract (r6 verdict #1): the driver's pandas
    # sort_values crashes on unhashable cells, so NO registered query may
    # emit top-level array/map/struct columns (operators may return them
    # natively; the registered gate query must serialize, e.g. to_json /
    # array_join).
    from pyspark.sql import types as T
    complex_cols = [f.name for f in df.schema.fields
                    if isinstance(f.dataType,
                                  (T.ArrayType, T.MapType, T.StructType))]
    assert not complex_cols, (
        f"{name}: top-level complex columns {complex_cols} violate the "
        "driver canonicalizer contract (CORRECTNESS_r06 "
        "'unhashable type: list') — serialize them in the registered "
        "gate query")
    if name not in ORACLES:
        # rows-only check (driver's weaker gate for non-SQL-expressible ops)
        assert df.count() >= 0
        return
    errs = compare(df, ORACLES[name], sf_dir)
    assert not errs, f"{name}: " + "; ".join(errs)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert len(df.columns) > 0
    assert df.count() >= 0
