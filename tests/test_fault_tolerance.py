"""Mid-query fault recovery: on a real cluster tasks die (preemption,
OOM kills, flaky nodes) and the engine's correctness story depends on
Spark re-running them. Local mode defaults to maxFailures=1 (first
failure kills the job), so this runs as a subprocess on local[4,3]
and injects a one-shot task failure — the job must retry the task and
produce the exact result, proving every operator in the repo rides a
retry-safe (deterministic, side-effect-free) execution path."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = textwrap.dedent(
    """
    import json
    from pyspark import TaskContext
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4,3]")
        .appName("fault-tolerance")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    def flaky(batches):
        tc = TaskContext.get()
        first_attempt = tc.attemptNumber() == 0
        for pdf in batches:
            if tc.partitionId() == 0 and first_attempt:
                raise RuntimeError("injected transient task failure")
            yield pdf

    df = spark.range(0, 1000, 1, 4).toDF("id")
    out = df.mapInPandas(flaky, "id long")
    total = out.agg(F.sum("id").alias("s")).collect()[0]["s"]
    n = out.count()
    print(json.dumps({"sum": int(total), "n": int(n)}))
    """
)


def test_task_retry_recovers_exact_result(tmp_path):
    env = dict(os.environ, PYTHONPATH=str(REPO))
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        env=env, cwd=str(tmp_path), capture_output=True, text=True, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # the injected failure must have actually fired (and been retried)
    assert "injected transient task failure" in proc.stderr
    result = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert result == {"sum": 999 * 1000 // 2, "n": 1000}
