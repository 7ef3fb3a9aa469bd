"""Per-round benchmark: run every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line:

    {"metric": "registry_total", "value": <total sec>, "unit": "sec",
     "queries": {key: sec, ...}, "sf": <scale factor>, "rows": {...}}

Each query is timed to full materialization (``df.count()`` — the same
work the driver's correctness gate forces). Stderr carries progress;
stdout carries exactly the one JSON line so the driver's parser never
sees noise.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from big_data_analysis_project_spark.session import get_spark

    spark = get_spark(app_name="bdap-bench", master=f"local[{cpus}]")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    failures: dict[str, str] = {}
    # warm the JVM + parquet footers once so per-query numbers measure
    # the query, not session startup
    t0 = time.perf_counter()
    try:
        spark.read.parquet(str(Path(sf_dir) / "lineitem.parquet")).count()
        print(f"[bench] warmup scan {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001 — still emit the JSON line below
        print(f"[bench] warmup failed: {exc}", file=sys.stderr)

    for key in sorted(queries):
        t0 = time.perf_counter()
        try:
            n = queries[key](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            timings[key] = round(dt, 3)
            rows[key] = n
            print(f"[bench] {key}: {dt:.2f}s rows={n}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — report, don't abort the suite
            failures[key] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"[bench] {key}: FAILED {failures[key]}", file=sys.stderr)

    out = {
        "metric": "registry_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "rows": rows,
    }
    if failures:
        out["failures"] = failures
    print(json.dumps(out))


if __name__ == "__main__":
    main()
