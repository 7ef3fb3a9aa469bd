"""Same oracle gate at sf0.01 — the scale factor the driver actually
uses for CORRECTNESS_r{N}.json. Slower; kept separate so the inner
loop (sf0.001) stays fast."""

from __future__ import annotations

import pytest

from big_data_analysis_project_spark.registry import ORACLE, QUERIES

from .conftest import SF_CORRECT
from .oracle_harness import compare, duckdb_conn


@pytest.fixture(scope="module")
def conn():
    c = duckdb_conn(SF_CORRECT)
    yield c
    c.close()


@pytest.mark.parametrize("key", sorted(ORACLE))
def test_oracle_match_sf01(spark, conn, key):
    df = QUERIES[key](spark, SF_CORRECT)
    compare(df, conn, ORACLE[key])
