"""Audit-only correctness check on a scale corpus.

Runs each pricing audit (the oracle-checked pre-flights that price
every guarded super-linear path: shingle pairs, embedding blocks,
incremental probes, stream-join state, exact-kNN bills) on Spark AND
its registered DuckDB oracle over the SAME parquet tables, then
applies the driver-grade comparison from ``tests.oracle_harness``
(row count + name-sorted columns + order-insensitive values + the
type-strict pandas canon the driver hashes). Rounds 12-13 ran this
check ad-hoc at sf30skew/sf30; this tool makes it repeatable and
emits one JSON line so the result can be committed next to the
``bench_scale_*`` artifact it validates.

Usage:
    python tools/audit_check.py --sf-dir scale_data/sf100skew \
        [--keys shingle_df_audit,...] [--out audit_check.json]

The audits are cheap by design (a pre-flight must be paid before
every byte of the guarded plan shuffles), so this runs in minutes
even on multi-GB corpora — the expensive part is DuckDB re-deriving
the same bounds exactly, which is the point: the guard arithmetic
(int64 + float64-shadow) is verified value-grade at the decade where
the guards actually refuse.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from big_data_analysis_project_spark.registry import ORACLE, QUERIES  # noqa: E402
from big_data_analysis_project_spark.session import get_spark, run_config  # noqa: E402
from tests.oracle_harness import compare, duckdb_conn  # noqa: E402

# the five pricing audits every guarded path routes through; each is
# oracle-backed, so ORACLE[key] exists by the registry's own
# import-time coverage assert
DEFAULT_AUDITS = [
    "shingle_df_audit",
    "embedding_block_audit",
    "incremental_probe_audit",
    "stream_pair_audit",
    "knn_exact_audit",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--keys", default=",".join(DEFAULT_AUDITS))
    ap.add_argument("--out", default=None, help="also write the JSON here")
    args = ap.parse_args()

    spark = get_spark()
    conn = duckdb_conn(args.sf_dir)
    result: dict = {"sf_dir": args.sf_dir, "config": run_config(spark), "keys": {}}
    failed = False
    for key in [k for k in args.keys.split(",") if k]:
        t0 = time.time()
        try:
            compare(QUERIES[key](spark, args.sf_dir), conn, ORACLE[key])
            row = {"hash_match": True, "sec": round(time.time() - t0, 2)}
        except AssertionError as exc:
            row = {"hash_match": False, "err": str(exc)[:300]}
            failed = True
        result["keys"][key] = row
        print(f"[audit] {key}: {row}", file=sys.stderr)
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1, sort_keys=True))
    print(json.dumps(result, sort_keys=True))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
