"""Per-round benchmark: run every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line:

    {"metric": "registry_total", "value": <total sec>, "unit": "sec",
     "queries": {headline key: sec, ...}, "sf": <scale factor>, ...}

Each query is timed to full materialization (``df.count()`` — the same
work the driver's correctness gate forces). Stderr carries progress;
stdout carries exactly the one JSON line, printed LAST and kept well
under 2 KB — rounds 1-2 proved the driver parses only a bounded stdout
tail, so the stdout ``queries`` map holds just the headline subset
(plus totals and failure counts) while the complete per-key timing and
row-count detail goes to ``bench_full.json`` next to this script.
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
    m = re.search(r"sf(\d+(?:\.\d+)?)", sf_dir)
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

    # full detail (all keys, rows, failures) for the judge
    full = {
        "metric": "registry_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "rows": rows,
        "failures": failures,
    }
    full_path = Path(__file__).resolve().parent / "bench_full.json"
    try:
        full_path.write_text(json.dumps(full, indent=1, sort_keys=True) + "\n")
        print(f"[bench] full detail -> {full_path}", file=sys.stderr)
    except OSError as exc:  # read-only dir / full disk must not cost the stdout line
        print(f"[bench] full-detail write failed: {exc}", file=sys.stderr)

    # the stdout line stays small (< ~1.5 KB): headline queries only,
    # 2-dp timings, nothing printed after it
    headline = [
        "tb_pipeline", "flagship", "sql_tpch_q3", "quality_report",
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
        "ann_cosine_topk", "ann_ivf", "ann_lsh_bucketed", "ann_pq",
        "sql_tpch_q1", "sql_tpch_q5", "sql_tpch_q18",
        "dedup_containment", "graph_triangles",
        "text_tokens", "corpus_prep_report", "text_contamination",
        "mm_feature_extract", "udf_pandas_tokens", "window_rank",
        "embed_gram", "embed_pca", "dedup_spans", "stats_linreg",
        "ann_ivf_pq", "text_gopher_rules",
        "groupby_agg", "join_broadcast", "topk", "pivot_first",
        "asof_join", "window_tumbling",
        "sql_tpch_q2", "join_bloom_runtime_filter", "ann_knn_join",
    ]
    out = {
        "metric": "registry_total",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "queries": {k: round(timings[k], 2) for k in headline if k in timings},
        "sf": sf,
        "n_queries": len(timings),
        "n_failures": len(failures),
    }
    sys.stderr.flush()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
