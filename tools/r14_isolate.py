"""Round-14 isolation harness: time named registry keys with the noop
sink (guide §1.4) and dump .explain('formatted') per key.

Usage: python tools/r14_isolate.py KEY [KEY...] [--runs N] [--plan DIR]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Isolation numbers quoted in OPTIMIZATION_r14.md come from here; the
reported bench numbers stay bench.py's unchanged .count() protocol.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan", default=None, help="dir for <key>.txt explain dumps")
    ap.add_argument("--count", action="store_true",
                    help="time .count() instead of the noop sink")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from big_data_analysis_project_spark.session import get_spark

    spark = get_spark(app_name="bdap-r14-isolate", master=f"local[{cpus}]")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    # warm shared artifacts so per-key numbers measure the key
    from big_data_analysis_project_spark.registry import warm_shared_artifacts

    t0 = time.perf_counter()
    warm_shared_artifacts(spark, sf_dir)
    print(f"[isolate] warm {time.perf_counter() - t0:.2f}s", file=sys.stderr)

    for key in args.keys:
        fn = queries[key]
        times = []
        for r in range(args.runs):
            spark.sparkContext.setJobDescription(f"r14 isolate: {key} run{r}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if args.count:
                n = df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        if args.plan:
            Path(args.plan).mkdir(parents=True, exist_ok=True)
            df = fn(spark, sf_dir)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (Path(args.plan) / f"{key}.txt").write_text(txt)
        print(
            f"[isolate] {key}: min={min(times):.3f}s "
            f"runs={[round(t, 3) for t in times]} rows={n}"
        )


if __name__ == "__main__":
    main()
