"""Unit tests for the round-13 data-derived streaming partition
sizing (``streaming_q._stream_partitions``): state-store-bound drains
size to source bytes (floor 2, cap cores), Python-kernel drains size
to worker parallelism, and the env override wins everywhere. Pure
logic — the function touches only ``defaultParallelism`` and the
filesystem, so a stub session suffices (no JVM)."""

from __future__ import annotations

import types

import pytest

from big_data_analysis_project_spark.registry.streaming_q import (
    _STATE_PARTITION_TARGET_BYTES,
    _stream_partitions,
)


def _stub_spark(cores: int):
    sc = types.SimpleNamespace(defaultParallelism=cores)
    return types.SimpleNamespace(sparkContext=sc)


@pytest.fixture(autouse=True)
def _no_env_override(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_STREAM_STATE_PARTITIONS", raising=False)


def test_small_source_hits_the_floor(tmp_path):
    (tmp_path / "events.parquet").write_bytes(b"x" * 1024)
    assert _stream_partitions(_stub_spark(32), str(tmp_path)) == 2


def test_large_source_scales_and_caps_at_cores(tmp_path):
    # a directory table of two part files, ~5 stores' worth of bytes
    d = tmp_path / "events.parquet"
    d.mkdir()
    half = (5 * _STATE_PARTITION_TARGET_BYTES) // 2
    for i in range(2):
        f = d / f"part-{i}.parquet"
        with f.open("wb") as fh:
            fh.truncate(half)  # sparse: size without writing 160 MB
    assert _stream_partitions(_stub_spark(32), str(tmp_path)) == 5
    # a small cluster caps at its core count
    assert _stream_partitions(_stub_spark(3), str(tmp_path)) == 3


def test_missing_source_falls_to_floor(tmp_path):
    assert _stream_partitions(_stub_spark(32), str(tmp_path)) == 2


def test_kernel_parallel_sizes_to_workers_not_state(tmp_path):
    (tmp_path / "events.parquet").write_bytes(b"x" * 1024)
    # tiny state, but the per-group Python kernel wants parallelism
    assert (
        _stream_partitions(_stub_spark(32), str(tmp_path), kernel_parallel=True)
        == 16
    )
    assert (
        _stream_partitions(_stub_spark(4), str(tmp_path), kernel_parallel=True)
        == 4
    )


def test_env_override_wins_both_regimes(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "7")
    assert _stream_partitions(_stub_spark(32), str(tmp_path)) == 7
    assert (
        _stream_partitions(_stub_spark(32), str(tmp_path), kernel_parallel=True)
        == 7
    )


def test_typoed_env_override_falls_back(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "lots")
    (tmp_path / "events.parquet").write_bytes(b"x" * 1024)
    assert _stream_partitions(_stub_spark(32), str(tmp_path)) == 2
