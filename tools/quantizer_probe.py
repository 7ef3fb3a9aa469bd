"""Measure the DISTRIBUTED quantizer path (train_ivf_centroids_mllib)
in a real probe run (VERDICT r7 #2): until round 8 the MLlib handoff
was exercised only via an artificially-lowered cap in
tests/test_batch_quantizer.py — its natural engagement threshold
(4 points/cell > 50 k driver sample => n > ~1.56 M vectors) sits above
every probe corpus (max 60 k). This probe forces the handoff with
SPARK_GRAFT_DRIVER_SAMPLE_CAP and records, on the SAME corpus and the
SAME grown-k cell count:

* training wall-clock: driver-Lloyd (hash-sample + numpy) vs MLlib
  k-means|| (distributed Lloyd over the full unit frame);
* ann_knn_join batch cost under each model;
* recall@KNN_K vs the exact kNN graph under each model — the recall
  parity claim of tests/test_batch_quantizer.py, now at probe scale.

The env var must be set BEFORE importing the registry (the cap is
read at module import); this script sets it itself inside main(),
before the registry import:

    python tools/quantizer_probe.py [--dir scale_data/sf3]
    python tools/quantizer_probe.py --dir scale_data/big_emb --cap natural

``--cap natural`` (round 9, VERDICT r8 #4) sets NOTHING: the library
default (50 k) stays in force, so on a >1.5625 M-vector corpus
(tools/gen_big_embeddings.py) the distributed handoff engages ON ITS
OWN — the un-forced crossover measurement.

Writes bench_scale_quantizer_raw.json (committed); the BENCH_SCALE.md
distributed-trainer section is authored from it. Never run
concurrently with bench.py (two local[32] JVMs starve each other).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from recall_probe import exact_knn_sets  # noqa: E402  (same tools dir)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=str(REPO / "scale_data/sf3"))
    ap.add_argument("--n-queries", type=int, default=200)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--cap",
        default="1000",
        help="SPARK_GRAFT_DRIVER_SAMPLE_CAP to force the handoff with "
        "(default 1000), or 'natural' to leave the library default in "
        "force and measure the UN-forced crossover",
    )
    args = ap.parse_args()

    # the cap is read at registry-module import — set (or leave) it
    # BEFORE the import below. setdefault semantics when --cap is left
    # at its default (ADVICE r9): an operator who exported the cap in
    # the shell expects it honored, not silently clobbered by the
    # default '1000' — an explicit --cap still wins over the env.
    if args.cap != "natural":
        explicit = any(a.startswith("--cap") for a in sys.argv[1:])
        if explicit:
            os.environ["SPARK_GRAFT_DRIVER_SAMPLE_CAP"] = args.cap
        else:
            prior = os.environ.get("SPARK_GRAFT_DRIVER_SAMPLE_CAP")
            if prior is not None and prior != args.cap:
                print(
                    f"[quant] honoring pre-set SPARK_GRAFT_DRIVER_SAMPLE_CAP="
                    f"{prior} over the --cap default {args.cap} (pass --cap "
                    "explicitly to override)",
                    file=sys.stderr,
                )
            os.environ.setdefault("SPARK_GRAFT_DRIVER_SAMPLE_CAP", args.cap)

    import numpy as np

    from big_data_analysis_project_spark.registry.similarity_q import (
        _DRIVER_SAMPLE_CAP,
        BATCH_CELL_TARGET,
        KNN_K,
        KNN_PROBE,
        knn_join_blocked,
        train_ivf_centroids,
        train_ivf_centroids_mllib,
        unit_vectors_cached,
    )
    from big_data_analysis_project_spark.session import get_spark

    # maxResultSize raised PROBE-ONLY: the exact ground-truth kNN needs
    # the full unit matrix driver-side (1.7 M x 64 doubles ~ 870 MB >
    # the 1g default). The library itself never collects corpus-sized
    # data — this is measurement harness, not engine discipline.
    spark = get_spark(
        app_name="quantizer-probe",
        master="local[32]",
        extra_conf={"spark.driver.maxResultSize": "8g"},
    )
    sf_dir = args.dir
    unit = unit_vectors_cached(spark, sf_dir)
    # Arrow toPandas, not collect(): Row-object materialization of a
    # million-row frame costs several GB and minutes; the Arrow path
    # is one columnar transfer
    pdf = unit.toPandas().sort_values("vec_id").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    x = np.stack(pdf["v"].to_numpy())
    del pdf
    n = len(ids)
    k = max(16, round(n / BATCH_CELL_TARGET))
    assert 4 * k > _DRIVER_SAMPLE_CAP, (
        f"cap {_DRIVER_SAMPLE_CAP} does not force the MLlib handoff at "
        f"k={k} — set SPARK_GRAFT_DRIVER_SAMPLE_CAP lower"
    )
    step = max(1, n // args.n_queries)
    q_rows = list(range(0, n, step))[: args.n_queries]
    true = exact_knn_sets(x, ids, q_rows, KNN_K)
    print(
        f"[quant] {sf_dir}: n={n}, k={k}, cap={_DRIVER_SAMPLE_CAP}, "
        f"{len(q_rows)} queries",
        file=sys.stderr,
    )

    def measure(tag: str, train):
        t0 = time.perf_counter()
        model = train()
        fit_sec = round(time.perf_counter() - t0, 2)
        best = float("inf")
        pdf = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            pdf = knn_join_blocked(unit, model, n_probe=KNN_PROBE).toPandas()
            best = min(best, time.perf_counter() - t0)
        got: dict[int, set] = {}
        for r in pdf.itertuples():
            got.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
        recall = float(
            np.mean([len(got.get(q, set()) & true[q]) / KNN_K for q in true])
        )
        entry = {
            "fit_sec": fit_sec,
            "join_sec": round(best, 2),
            "recall": round(recall, 4),
            "cells": len(model),
        }
        print(f"[quant] {tag}: {entry}", file=sys.stderr)
        return entry

    result = {
        "dir": sf_dir,
        "n_vec": n,
        "k": k,
        "cap_mode": args.cap,
        "driver_sample_cap": _DRIVER_SAMPLE_CAP,
        "n_probe": KNN_PROBE,
        "knn_k": KNN_K,
        # driver-Lloyd twin trained at the UNCAPPED default sample
        # budget (what production would use below the handoff), MLlib
        # trained distributed over the full frame — same k, same
        # assignment/probe kernels downstream
        "driver_lloyd": measure(
            "driver_lloyd",
            lambda: train_ivf_centroids(unit, k=k, sample_target=4 * k),
        ),
        "mllib": measure(
            "mllib", lambda: train_ivf_centroids_mllib(unit, k=k)
        ),
    }

    # the forced-cap artifact and the natural-crossover artifact are
    # different measurements — never overwrite one with the other
    out = REPO / (
        "bench_scale_quantizer_natural.json"
        if args.cap == "natural"
        else "bench_scale_quantizer_raw.json"
    )
    out.write_text(json.dumps(result, indent=1, sort_keys=True) + "\n")
    print(json.dumps(result, sort_keys=True))
    print(f"[quant] raw -> {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
