"""snapshot_memo contract (ADVICE r5 #4): rewriting the parquet files
under a memoized sf_dir within one Spark application must invalidate
the cached artifact instead of serving the stale one."""

from __future__ import annotations

import time

from big_data_analysis_project_spark.registry._memo import (
    session_memo,
    snapshot_fingerprint,
    snapshot_memo,
)


def _write_parquet(spark, path, n):
    spark.range(n).write.mode("overwrite").parquet(str(path / "t.parquet"))


def test_snapshot_memo_invalidates_on_rewrite(spark, tmp_path):
    _write_parquet(spark, tmp_path, 5)
    cache: dict = {}
    builds = []

    def build():
        builds.append(1)
        return len(builds)

    assert snapshot_memo(cache, spark, str(tmp_path), build) == 1
    assert snapshot_memo(cache, spark, str(tmp_path), build) == 1  # cache hit
    time.sleep(0.01)  # ensure mtime_ns moves even on coarse filesystems
    _write_parquet(spark, tmp_path, 7)
    assert snapshot_memo(cache, spark, str(tmp_path), build) == 2  # rebuilt
    # stale-fingerprint entry evicted, not accumulated
    assert len([k for k in cache if k[1][0] == str(tmp_path)]) == 1


def test_snapshot_memo_extra_key_separates_models(spark, tmp_path):
    _write_parquet(spark, tmp_path, 3)
    cache: dict = {}
    a = snapshot_memo(cache, spark, str(tmp_path), lambda: "a", extra=(1,))
    b = snapshot_memo(cache, spark, str(tmp_path), lambda: "b", extra=(2,))
    assert (a, b) == ("a", "b")
    assert len(cache) == 2


def test_snapshot_fingerprint_missing_dir():
    assert snapshot_fingerprint("/nonexistent/path/xyz") == ("<missing>",)


def test_session_memo_still_keyed_per_application(spark):
    cache: dict = {}
    assert session_memo(cache, spark, "k", lambda: 42) == 42
    app = spark.sparkContext.applicationId
    assert (app, "k") in cache
