"""Every registry key with an oracle must match DuckDB at sf0.001
(fast inner loop; the driver re-runs the same check at sf0.01)."""

from __future__ import annotations

import pytest

from big_data_analysis_project_spark.registry import ORACLE, QUERIES

from .conftest import SF_SMOKE
from .oracle_harness import compare, duckdb_conn


@pytest.fixture(scope="module")
def conn():
    c = duckdb_conn(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("key", sorted(ORACLE))
def test_oracle_match(spark, conn, key):
    df = QUERIES[key](spark, SF_SMOKE)
    compare(df, conn, ORACLE[key])


@pytest.mark.parametrize("key", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only(spark, key):
    df = QUERIES[key](spark, SF_SMOKE)
    # non-SQL-expressible ops: schema is stable and the query runs
    assert df.columns
    assert df.count() >= 0
