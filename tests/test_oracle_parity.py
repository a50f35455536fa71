"""The central correctness gate: every registered query with an oracle is
hash-compared against DuckDB on the same parquet tables — the local mirror
of the driver's CORRECTNESS check."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, compare_with_oracle
from ut_data_engineering_group_project_2022_spark.plans import all_queries

_SPECS = all_queries()
_WITH_ORACLE = sorted(n for n, s in _SPECS.items() if s.oracle is not None)
_ROWS_ONLY = sorted(n for n, s in _SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    spec = _SPECS[name]
    df = spec.spark(spark, SF_DIR)
    compare_with_oracle(df, duck, spec.oracle)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    spec = _SPECS[name]
    df = spec.spark(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(_SPECS)
