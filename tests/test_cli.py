"""E3: the thin CLI orchestrator, smoke-tested as a real subprocess
(the driver-facing contract is the command line, not the functions).
ref: main_orchestrator.py:599-708."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_cli_full_pipeline(tmp_path):
    env = dict(os.environ, PYTHONPATH=str(REPO), SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [sys.executable, "-m", "big_data_analysis_project_spark", "full",
         "--data", str(tmp_path / "data")],
        env=env, cwd=str(tmp_path), capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
    by_mode = {d["mode"]: d for d in lines}
    assert set(by_mode) == {"collect", "process", "serve"}

    assert by_mode["collect"]["rows"] == {"tb_raw": 120, "population_raw": 60}
    assert by_mode["process"]["rows"] == {
        "tb_final": 60, "country_summary": 10,
        "yearly_trends": 6, "country_trends": 60,
    }
    endpoints = by_mode["serve"]["endpoints"]
    assert set(endpoints) == {
        "health", "countries", "stats", "map_data", "comparison",
        "trends", "yearly_trends", "rankings",
    }
    assert endpoints["health"] == [{"status": "healthy", "service": "TB Data API"}]
    assert endpoints["stats"][0]["total_records"] == 10
    assert len(endpoints["rankings"]) == 9  # 3 metrics x top-3
    # stash the payloads for the registry cross-check test (module-level
    # so the expensive subprocess run happens once)
    _PAYLOADS.update(endpoints)
    # parquet + csv marts landed on disk
    for mart in ("tb_final", "country_summary", "yearly_trends", "country_trends"):
        assert (tmp_path / "data" / "processed" / f"{mart}.parquet").exists()
        assert (tmp_path / "data" / "processed" / f"{mart}.csv").is_file()


def test_cli_serve_requires_process(tmp_path):
    env = dict(os.environ, PYTHONPATH=str(REPO), SPARK_GRAFT_CPUS="2")
    proc = subprocess.run(
        [sys.executable, "-m", "big_data_analysis_project_spark", "serve",
         "--data", str(tmp_path / "empty")],
        env=env, cwd=str(tmp_path), capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode != 0
    assert "run process first" in proc.stderr


_PAYLOADS: dict = {}


def test_cli_serve_matches_registry_serving(spark):
    """The CLI ENDPOINTS SQL and the registry's serve_* keys are two
    surfaces over the SAME marts; this pins them together so an edit
    to one cannot silently drift from the other (both derive from the
    synthetic pipeline, so values must agree row-for-row)."""
    import pytest

    from big_data_analysis_project_spark.registry import QUERIES

    from .conftest import SF_SMOKE

    if not _PAYLOADS:
        pytest.skip("test_cli_full_pipeline did not run first")
    cli = {d["iso3"]: d for d in _PAYLOADS["comparison"]}
    reg = {
        r.iso3: r.asDict()
        for r in QUERIES["serve_comparison"](spark, SF_SMOKE).collect()
    }
    assert set(cli) == set(reg)
    for iso3, r in reg.items():
        c = cli[iso3]
        for k in ("total_cases", "new_cases", "deaths", "population"):
            assert float(c[k]) == float(r[k]), (iso3, k, c[k], r[k])
        for k in ("total_cases_per_100k", "deaths_per_100k", "case_fatality_rate"):
            assert abs(float(c[k]) - float(r[k])) < 0.005, (iso3, k, c[k], r[k])
    cli_rank = {(d["ranking"], d["rank"]): d["iso3"] for d in _PAYLOADS["rankings"]}
    reg_rank = {
        (r.ranking, r.rank): r.iso3
        for r in QUERIES["serve_rankings"](spark, SF_SMOKE).collect()
    }
    assert cli_rank == reg_rank


def test_cli_route_passthrough(tmp_path):
    """route mode: at driver scale no guard fires, so the requested
    key runs as-is and the JSON payload carries plan + provenance."""
    env = dict(os.environ, PYTHONPATH=str(REPO), SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [sys.executable, "-m", "big_data_analysis_project_spark", "route",
         "--key", "graph_triangles", "--sf-dir", "/root/testdata/sf0.001",
         "--limit", "5"],
        env=env, cwd=str(tmp_path), capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
    (r,) = out
    assert r["mode"] == "route"
    assert r["plan"] == [
        "graph_triangles", "graph_triangles_capped", "graph_triangles_lsh",
    ]
    assert r["ran"] == "graph_triangles" and r["rerouted"] is False
    assert r["hops"] == [{"key": "graph_triangles", "outcome": "ran"}]
    assert r["columns"] == ["n_triangles"]
    assert r["sample"][0]["n_triangles"] >= 0


def test_cli_route_requires_key(tmp_path):
    env = dict(os.environ, PYTHONPATH=str(REPO), SPARK_GRAFT_CPUS="2")
    proc = subprocess.run(
        [sys.executable, "-m", "big_data_analysis_project_spark", "route"],
        env=env, cwd=str(tmp_path), capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode != 0
    assert "--key" in proc.stderr


def test_cli_route_unknown_key_structured_error(spark):
    """ADVICE r10: an unknown --key must produce a structured error
    payload (with near-miss hints), never a KeyError traceback out of
    run_routed. In-process (cmd_route) — the subprocess path is the
    same function behind the argparse shim."""
    from big_data_analysis_project_spark.__main__ import cmd_route

    r = cmd_route(spark, "dedup_nope", "/root/testdata/sf0.001", 5)
    assert r["error"] == "unknown_key"
    assert r["requested"] == "dedup_nope"
    assert "ran" not in r
    r2 = cmd_route(spark, "triangles", "/root/testdata/sf0.001", 5)
    assert r2["error"] == "unknown_key"
    assert "graph_triangles" in r2["hint"]  # near-miss suggestion
