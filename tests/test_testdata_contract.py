"""Round-start testdata contract: the driver regenerates the parquet
fixtures between rounds and has already changed encodings once (round
1 shipped events.ts as TIMESTAMP(NANOS), round 2 as timestamp[us]).
These assertions fail loudly at the FIRST test run of a round if the
data drifts again, instead of surfacing as cryptic oracle mismatches
deep in the suite."""

from __future__ import annotations

import duckdb
import pytest

from big_data_analysis_project_spark.registry.similarity_q import _PQ_M
from big_data_analysis_project_spark.sources.readers import load_events

from .conftest import SF_SMOKE

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.mark.parametrize("table", TABLES)
def test_tables_present_and_nonempty(table):
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF_SMOKE}/{table}.parquet')"
    ).fetchall()[0][0]
    assert n > 0, f"{table} is empty at {SF_SMOKE}"


def test_events_ts_normalizes_to_timestamp(spark):
    """Whatever physical encoding events.ts ships with this round,
    normalize_events_ts must surface a session-tz timestamp with
    sub-second precision preserved."""
    ev = load_events(spark, SF_SMOKE)
    assert dict(ev.dtypes)["ts"] == "timestamp"
    with_us = ev.selectExpr("sum(unix_micros(ts) % 1000000) AS frac").collect()
    assert with_us[0]["frac"] > 0, "sub-second precision lost in ts decode"


def test_embedding_geometry_matches_model_constants():
    """The PQ subvector split and the Arrow kernels' reshape logic
    assume a fixed, uniform embedding dimension divisible by _PQ_M."""
    dims = duckdb.sql(
        f"SELECT DISTINCT len(embedding) FROM read_parquet('{SF_SMOKE}/embeddings.parquet')"
    ).fetchall()
    assert len(dims) == 1, f"ragged embedding dims: {dims}"
    dim = dims[0][0]
    assert dim % _PQ_M == 0, (dim, _PQ_M)


def test_key_columns_unique():
    """Oracle joins and dedup keys assume primary-key uniqueness."""
    for table, key in [
        ("orders", "o_orderkey"), ("customer", "c_custkey"),
        ("part", "p_partkey"), ("supplier", "s_suppkey"),
        ("documents", "doc_id"), ("embeddings", "vec_id"),
        ("events", "event_id"),
    ]:
        n, d = duckdb.sql(
            f"SELECT COUNT(*), COUNT(DISTINCT {key}) "
            f"FROM read_parquet('{SF_SMOKE}/{table}.parquet')"
        ).fetchall()[0]
        assert n == d, f"{table}.{key} not unique: {n} rows, {d} distinct"
