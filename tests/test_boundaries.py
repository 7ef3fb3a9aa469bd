"""Deterministic edge-case tests for boundary semantics the sf-scale
oracles only hit by luck.

The sessionize sub-second bug (unix_timestamp truncation merged a
session exactly gap+0.7s apart — caught at sf0.1 only) motivates
pinning the boundary contract explicitly: a gap of exactly
SESSION_GAP is the same session, one microsecond more splits it, in
BOTH engines."""

from __future__ import annotations

import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from big_data_analysis_project_spark.operators.graphs import connected_components
from big_data_analysis_project_spark.registry import ORACLE, QUERIES
from big_data_analysis_project_spark.registry.streaming_q import SESSION_GAP_MIN

GAP_US = SESSION_GAP_MIN * 60 * 1_000_000


def _write_events(tmpdir, rows):
    """rows: (event_id, ts_ns, user_id, value). Written as
    TIMESTAMP(NANOS) parquet — the driver testdata's physical type."""
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, f"{tmpdir}/events.parquet", store_schema=False)


def test_sessionize_exact_gap_boundary(spark, tmp_path):
    """Events exactly GAP apart stay in one session (strict >); one
    microsecond beyond splits. Spark and the DuckDB oracle must agree
    on both sides of the boundary."""
    t0 = 1_700_000_000_000_000_000  # ns epoch
    rows = [
        (1, t0, 42, 1.0),
        (2, t0 + GAP_US * 1000, 42, 2.0),  # exactly GAP after e1 -> same session
        (3, t0 + GAP_US * 1000 * 2 + 1000, 42, 4.0),  # GAP + 1us after e2 -> new session
    ]
    _write_events(tmp_path, rows)
    sdf = QUERIES["sessionize"](spark, str(tmp_path))
    got = sorted((r.n_events, r.total_value) for r in sdf.collect())
    assert got == [(1, 4.0), (2, 3.0)], got

    conn = duckdb.connect()
    conn.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    oracle = sorted((r[2], r[3]) for r in conn.execute(ORACLE["sessionize"]).fetchall())
    assert oracle == got


def test_window_tumbling_epoch_alignment(spark, tmp_path):
    """An event exactly on an hour boundary belongs to the window it
    starts ([start, end) semantics) in both engines."""
    hour_ns = 3_600 * 1_000_000_000
    t0 = (1_700_000_000_000_000_000 // hour_ns) * hour_ns  # aligned hour
    rows = [
        (1, t0 - 1000, 1, 1.0),  # 1us before the boundary -> prev window
        (2, t0, 1, 2.0),  # exactly on it -> next window
        (3, t0 + 1000, 1, 4.0),
    ]
    _write_events(tmp_path, rows)
    sdf = QUERIES["window_tumbling"](spark, str(tmp_path))
    got = sorted((r.n_events, r.total_value) for r in sdf.collect())
    assert got == [(1, 1.0), (2, 6.0)], got
    conn = duckdb.connect()
    conn.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    oracle = sorted((r[2], r[3]) for r in conn.execute(ORACLE["window_tumbling"]).fetchall())
    assert oracle == got


def _uf_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in list(parent)}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_distributed_cc_random_graphs(spark, seed):
    """The fully-distributed CC path (driver_edge_limit=0: min-label
    propagation + pointer jumping) must match an independent union-find
    on adversarial graphs: a 60-vertex chain (worst-case diameter for
    label propagation), a star, random cliques, and noise edges."""
    rng = random.Random(seed)
    edges = [(i, i + 1) for i in range(1000, 1060)]  # long chain
    edges += [(2000, 2000 + i) for i in range(1, 20)]  # star
    base = 3000
    for _ in range(5):  # small cliques
        size = rng.randint(3, 6)
        ids = [base + i for i in range(size)]
        edges += [(a, b) for a in ids for b in ids if a < b]
        base += 10
    edges += [
        (rng.randint(0, 500), rng.randint(0, 500)) for _ in range(50)
    ]  # noise (self-loops possible — must not wedge the algorithm)
    rng.shuffle(edges)
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r.vertex: r.component
        for r in connected_components(df, driver_edge_limit=0).collect()
    }
    want = _uf_components([e for e in edges])
    assert got == want
