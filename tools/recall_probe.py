"""Measure the QUALITY curve of the constant-cell-population quantizer
at the probe scales (VERDICT r6 #1): round 6 measured that growing the
cell count with the corpus holds ann_knn_join's COST flat, but conceded
in BENCH_SCALE.md that probing a shrinking corpus fraction at fixed
probe count costs recall on isotropic data — without a number. This
probe produces the number.

Per sf dir (bench sf0.1, scale_data/sf1, scale_data/sf3):

* ``ann_knn_join`` — mean recall@KNN_K vs the EXACT kNN graph over a
  deterministic ~200-query sample, at n_probe in {4, 8, 16}, with the
  wall-clock of the full batch join next to each recall so the
  recall-vs-cost dial is one table. The exact baseline uses the SAME
  1e-6 fixed-point scoring as the blocked kernel (apples-to-apples:
  rank differences from quantization cancel out).
* ``dedup_semantic`` — drop-set recall/precision vs the EXACT
  single-block greedy prune (the corpus-wide SemDeDup answer, computed
  driver-side in numpy over the collected unit matrix — 60k x 64
  doubles = 30 MB at sf3, bounded by construction of the probe).

Writes bench_scale_recall_raw.json (committed); the BENCH_SCALE.md
recall section is authored from it. Never run concurrently with
bench.py (two local[32] JVMs starve each other).

Usage: python tools/recall_probe.py [--dirs a,b,c] [--n-queries 200]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def exact_knn_sets(x, ids, q_rows, k):
    """Exact top-k neighbor id sets for the sampled query rows, fixed-
    point (floor 1e-6 int64) like the blocked kernel, ties to lowest id
    (ids are pre-sorted ascending, stable argsort keeps that order)."""
    import numpy as np

    xe6 = np.floor(x * 1_000_000).astype(np.int64)
    out = {}
    for r in q_rows:
        s = xe6[r] @ xe6.T // 1_000_000  # int64, engine-identical
        # min+1, NOT min: np.argsort(-s) negates, and -int64_min
        # overflows back to int64_min — the self row then sorts FIRST
        # and every "true" top-k contains the query itself, silently
        # capping measured recall at (k-1)/k. This bug deflated every
        # round-7 recall number (the flat 0.800 rows); found when the
        # clustered corpus pinned recall at exactly 4/5 at every
        # probe setting. -(min+1) == max: self sorts last, excluded.
        s[r] = np.iinfo(np.int64).min + 1
        top = np.argsort(-s, kind="stable")[:k]
        out[ids[r]] = {int(ids[j]) for j in top}
    return out


def exact_semantic_drops(x, ids, tau):
    """The corpus-wide greedy prune (one global block, ascending
    vec_id order — exactly dedup_semantic's contract minus blocking):
    returns {vec_id: keep_id} for DROPPED vectors only."""
    import numpy as np

    n, dim = x.shape
    kept = np.empty((n, dim))
    kept_ids: list[int] = []
    m = 0
    drops = {}
    for i in range(n):
        if m:
            sims = kept[:m] @ x[i]
            hit = np.nonzero(sims >= tau)[0]
        else:
            hit = []
        if len(hit):
            drops[int(ids[i])] = int(kept_ids[hit[0]])
        else:
            kept[m] = x[i]
            kept_ids.append(int(ids[i]))
            m += 1
    return drops


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dirs",
        default=",".join(
            [
                "/root/testdata/sf0.1",
                str(REPO / "scale_data/sf1"),
                str(REPO / "scale_data/sf3"),
            ]
        ),
    )
    ap.add_argument("--n-queries", type=int, default=200)
    ap.add_argument(
        "--probes",
        default="4,8,16",
        help="comma-separated probe counts; the token 'auto' runs the "
        "engine's own pre-flight selection (knn_probe_cached — VERDICT "
        "r9 #1) and records the selected count next to its measured "
        "recall, keyed 'auto:<selected>'",
    )
    ap.add_argument(
        "--out",
        default=str(REPO / "bench_scale_recall_raw.json"),
        help="output json (give a different path for a different "
        "corpus family so runs don't clobber each other's evidence)",
    )
    args = ap.parse_args()

    import numpy as np

    from big_data_analysis_project_spark.registry import QUERIES
    from big_data_analysis_project_spark.registry.dedup_q import SEMANTIC_TAU
    from big_data_analysis_project_spark.registry.similarity_q import (
        KNN_K,
        batch_centroids_cached,
        knn_join_blocked,
        knn_probe_cached,
        unit_vectors_cached,
    )
    from big_data_analysis_project_spark.session import get_spark

    # maxResultSize raised PROBE-ONLY (as in quantizer_probe): the
    # exact baselines need the full unit matrix driver-side, and a
    # 200 k-vector corpus exceeds the 1g default through collect.
    # The library itself never collects corpus-sized data.
    spark = get_spark(
        app_name="recall-probe",
        master="local[32]",
        extra_conf={"spark.driver.maxResultSize": "8g"},
    )
    probes = [p if p == "auto" else int(p) for p in args.probes.split(",")]
    result: dict = {"n_queries": args.n_queries, "k": KNN_K, "dirs": {}}

    for sf_dir in args.dirs.split(","):
        tag = Path(sf_dir).name
        unit = unit_vectors_cached(spark, sf_dir)
        # Arrow toPandas, not collect(): Row-object materialization of
        # a 200k-row frame costs GBs; one columnar transfer instead
        pdf_u = unit.toPandas().sort_values("vec_id").reset_index(drop=True)
        ids = pdf_u["vec_id"].to_numpy(dtype=np.int64)
        x = np.stack(pdf_u["v"].to_numpy())
        del pdf_u
        n = len(ids)
        step = max(1, n // args.n_queries)
        q_rows = list(range(0, n, step))[: args.n_queries]
        print(f"[recall] {tag}: n={n}, {len(q_rows)} queries", file=sys.stderr)

        model = batch_centroids_cached(spark, sf_dir)
        true = exact_knn_sets(x, ids, q_rows, KNN_K)
        entry: dict = {"n_vec": n, "cells": len(model), "knn": {}}

        for p in probes:
            if p == "auto":
                # the engine's own pre-flight (includes its one-time
                # exact-sample scan — timed separately as selection
                # cost, since it memoizes per snapshot)
                t0 = time.perf_counter()
                n_probe = knn_probe_cached(spark, sf_dir)
                sel_sec = round(time.perf_counter() - t0, 2)
                label = f"auto:{n_probe}"
            else:
                # label as str: json sort_keys can't mix int and str
                n_probe, sel_sec, label = p, None, str(p)
            t0 = time.perf_counter()
            pdf = knn_join_blocked(unit, model, n_probe=n_probe).toPandas()
            sec = round(time.perf_counter() - t0, 2)
            got: dict[int, set] = {}
            for r in pdf.itertuples():
                got.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
            recall = float(
                np.mean([len(got.get(q, set()) & true[q]) / KNN_K for q in true])
            )
            entry["knn"][label] = {"recall": round(recall, 4), "sec": sec}
            if sel_sec is not None:
                entry["knn"][label]["select_sec"] = sel_sec
            print(
                f"[recall] {tag} knn n_probe={label}: recall@{KNN_K}="
                f"{recall:.3f} in {sec}s",
                file=sys.stderr,
            )

        # dedup_semantic: blocked greedy vs the corpus-wide greedy
        t0 = time.perf_counter()
        sem = QUERIES["dedup_semantic"](spark, sf_dir).toPandas()
        sem_sec = round(time.perf_counter() - t0, 2)
        approx_drops = {
            int(r.vec_id): int(r.keep_id)
            for r in sem.itertuples()
            if r.vec_id != r.keep_id
        }
        t0 = time.perf_counter()
        true_drops = exact_semantic_drops(x, ids, SEMANTIC_TAU)
        exact_sec = round(time.perf_counter() - t0, 2)
        inter = set(approx_drops) & set(true_drops)
        entry["semantic"] = {
            "true_drops": len(true_drops),
            "blocked_drops": len(approx_drops),
            "drop_recall": round(len(inter) / max(1, len(true_drops)), 4),
            "drop_precision": round(len(inter) / max(1, len(approx_drops)), 4),
            "sec": sem_sec,
            "exact_driver_sec": exact_sec,
        }
        print(f"[recall] {tag} semantic: {entry['semantic']}", file=sys.stderr)
        result["dirs"][tag] = entry

    out = Path(args.out)
    out.write_text(json.dumps(result, indent=1, sort_keys=True) + "\n")
    print(json.dumps(result, sort_keys=True))
    print(f"[recall] raw -> {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
