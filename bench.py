"""Per-round benchmark: run every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line:

    {"metric": "registry_total", "value": <total sec>, "unit": "sec",
     "queries": {headline key: sec, ...}, "sf": <scale factor>, ...}

Each query is timed to full materialization (``df.count()`` — the same
work the driver's correctness gate forces). Shared memoized artifacts
(shingles, LSH edge lists, unit vectors, IVF model, TB marts) are
pre-built in an explicitly timed "shared setup" phase so no key absorbs
first-touch build cost, and every key is timed ``SPARK_GRAFT_BENCH_RUNS``
times (default 2) with the per-key MIN reported — host-noise spikes hit
one run, not both. The reported total = shared setup + sum of per-key
mins. Stderr carries progress;
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


def _equivalent_rerun(path: Path, full: dict) -> bool:
    """True iff ``path`` already holds a content-equal-modulo-timings
    artifact of this run: identical key set, row counts, failure /
    refusal / flaky key sets and sf, with the total within 20% — i.e.
    the same code re-measured, differing only by host noise. Timing
    keys are deliberately NOT compared beyond the total: the per-key
    min-of-2 protocol still moves ±10% on tenancy noise."""
    if os.environ.get("SPARK_GRAFT_BENCH_FORCE"):
        return False
    try:
        old = json.loads(path.read_text())
    except (OSError, ValueError):
        return False
    for field in ("rows", "sf", "runs"):
        if old.get(field) != full.get(field):
            return False
    # a config change (heap, partitions, AQE, cpu count) makes two
    # artifacts non-comparable BY DEFINITION (VERDICT r12 #4) even if
    # the totals happen to land within noise — never keep an
    # old-config artifact over a new-config run
    if old.get("config") != full.get("config"):
        return False
    for bucket in (
        "failures",
        "refusals",
        "flaky",
        "route_hops",
        "facade_passthrough",
    ):
        if set(old.get(bucket, {})) != set(full.get(bucket, {})):
            return False
    # provenance buckets compare by CONTENT, not key set (round-13
    # review): a shipped-tier flip (warn-ship -> exact upgrade) or an
    # n_probe dial change keeps the same keys but makes the artifacts
    # describe different runs — these fields are deterministic per
    # corpus/model (no timing noise inside), so exact equality is safe
    for bucket in ("quality_refusals", "knn_probe"):
        if old.get(bucket) != full.get(bucket):
            return False
    if set(old.get("queries", {})) != set(full.get("queries", {})):
        return False
    old_total, new_total = old.get("value"), full.get("value")
    if not isinstance(old_total, (int, float)) or old_total <= 0:
        return False
    return abs(new_total - old_total) / old_total <= 0.20


def bucketize(
    per_run: dict[str, list[float]],
    fail_runs: dict[str, dict[int, str]],
    refusal_runs: dict[str, dict],
) -> tuple[dict, dict, dict, dict]:
    """Fold the raw per-run outcomes into the four artifact buckets:
    (timings, failures, refusals, flaky). Factored out of main so the
    accounting edges are unit-testable without a Spark session
    (VERDICT r10 #2). The rules:

    * a key with any successful run gets its MIN timing (host-noise
      spikes hit one run, not both);
    * FAILED = no run succeeded and no run refused — a genuine error;
    * REFUSED = a probe-and-refuse guard declined the bill and no run
      succeeded — designed behavior, carrying the structured payload;
    * FLAKY = a key with a failed run that ALSO succeeded or refused
      elsewhere — the error must stay visible (previously a
      refuses-in-run-1-fails-in-run-2 key was recorded nowhere), so it
      lands in `flaky` AND, for refusal-bucket keys, in the refusal
      entry's `also_failed` field."""
    timings = {k: min(v) for k, v in per_run.items()}
    failures = {
        k: "; ".join(f"run{r}: {m}" for r, m in sorted(v.items()))
        for k, v in fail_runs.items()
        if k not in per_run and k not in refusal_runs
    }
    refusals = {k: dict(v) for k, v in refusal_runs.items() if k not in per_run}
    flaky = {
        k: "; ".join(f"run{r}: {m}" for r, m in sorted(v.items()))
        for k, v in fail_runs.items()
        if k in per_run or k in refusal_runs
    }
    for k in refusals:
        if k in fail_runs:
            refusals[k]["also_failed"] = flaky[k]
    return timings, failures, refusals, flaky


def facade_passthroughs(timings: dict, last_route: dict) -> dict:
    """The facade double-pay, made legible (VERDICT r11 #6): a routed_*
    facade re-runs, in full, whichever tier its route lands on — the
    head as a passthrough at no-guard scales, the bounded tier at
    guarded scales — and EITHER WAY the tier it ran is a registered
    key the bench times separately (every KEY_FALLBACKS target is
    registered; asserted at registry import), so the facade's seconds
    are always duplicates of an already-counted row (round-12 review:
    the first cut excluded rerouted facades, leaving the duplication
    in place at exactly the guarded scales the field exists for).
    Returns {facade_key: sec} for every facade the loop timed; the
    artifact carries it plus the derived
    ``value_ex_facade_passthrough`` so the headline total is
    comparable round-over-round without commit archaeology. (``value``
    itself stays the honest inclusive total — changing its meaning
    mid-series would be the same misread in the other direction.)"""
    return {k: timings[k] for k in sorted(last_route) if k in timings}


def quality_bucket(
    refusals: dict, knn_rec: dict | None, target: float | None
) -> dict:
    """Fold QUALITY degradation into its own artifact bucket (VERDICT
    r11 #7) so quality and cost refusals read uniformly. Three
    sources, each entry carrying ``shipped``:

    * a loop refusal whose payload is the quality kind (strict-mode
      ann_knn_join) — refused, nothing shipped;
    * a routed dead-end (NoBoundedTier) whose hop list contains a
      quality refusal (routed_knn's double refusal) — ditto;
    * the kNN ship decision in NON-strict mode reporting a sub-target
      predicted recall: either the blocked join SHIPPED behind the
      loud warning, or (VERDICT r12 #3) the mid-scale policy UPGRADED
      to the affordable exact tier — both shipped, both named via
      ``tier`` so the artifact says what actually ran.

    ``target`` is None only when KNN_TARGET_RECALL itself could not be
    imported (VERDICT r12 #6): the sub-target check is SKIPPED then —
    grading against a stale hard-coded bar would misclassify ships
    whenever the constant moves."""
    out = {}
    for k, v in refusals.items():
        if v.get("kind") == "quality" or any(
            (h.get("refusal") or {}).get("kind") == "quality"
            for h in v.get("hops", [])
        ):
            out[k] = dict(v, shipped=False)
    if knn_rec and target is not None:
        pr = knn_rec.get("predicted_recall")
        if (
            knn_rec.get("mode") == "preflight"
            and pr is not None
            and pr < target
            and not knn_rec.get("strict")
        ):
            tier = knn_rec.get("tier", "ann_knn_join")
            if tier == "ann_knn_exact":
                note = (
                    "sub-target sample recall: upgraded to the "
                    "affordable exact tier (recall 1.0 by "
                    "construction) per the mid-scale quality policy"
                )
            elif knn_rec.get("exact_budget") == 0:
                # budget 0 = the SPARK_GRAFT_KNN_EXACT_CAP=0 override:
                # the exact tier was not over budget — auto-upgrade is
                # declined because budget-0 is a deliberate guard
                # override, not a standing upgrade instruction
                note = (
                    "sub-target sample recall shipped behind the "
                    "non-strict warning (exact-tier auto-upgrade "
                    "declined under the deliberate "
                    "SPARK_GRAFT_KNN_EXACT_CAP=0 override); "
                    "SPARK_GRAFT_KNN_STRICT=1 turns this into a "
                    "routed refusal"
                )
            else:
                note = (
                    "sub-target sample recall shipped behind the "
                    "non-strict warning (exact tier over budget); "
                    "SPARK_GRAFT_KNN_STRICT=1 turns this into a "
                    "routed refusal"
                )
            out["ann_knn_join"] = {
                "kind": "quality",
                "shipped": True,
                "tier": tier,
                "predicted_recall": pr,
                "target_recall": target,
                "note": note,
            }
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf(\d+(?:\.\d+)?)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from big_data_analysis_project_spark.session import get_spark

    spark = get_spark(app_name="bdap-bench", master=f"local[{cpus}]")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    rows: dict[str, int] = {}
    # warm the JVM + parquet footers once so per-query numbers measure
    # the query, not session startup
    t0 = time.perf_counter()
    try:
        spark.read.parquet(str(Path(sf_dir) / "lineitem.parquet")).count()
        print(f"[bench] warmup scan {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001 — still emit the JSON line below
        print(f"[bench] warmup failed: {exc}", file=sys.stderr)

    # shared-artifact setup, timed as its OWN phase (VERDICT r5 #2):
    # memoized corpus-snapshot artifacts (shingles, LSH edges, unit
    # vectors, IVF model, marts) were previously charged to whichever
    # key the alphabetical loop hit first, making per-key deltas
    # un-diagnosable round-over-round. Charging them here means every
    # per-key number below measures the QUERY against a warm snapshot.
    shared: dict[str, float] = {}
    t_warm = time.perf_counter()
    try:
        from big_data_analysis_project_spark.registry import warm_shared_artifacts

        shared = warm_shared_artifacts(spark, sf_dir)
        print(f"[bench] shared setup {shared}", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        print(f"[bench] shared setup failed: {exc}", file=sys.stderr)
    # WALL time of the phase, not sum(shared.values()): the warm phase
    # runs independent builder chains concurrently (guide §2.6), so
    # per-artifact seconds overlap and their sum would overstate the
    # real elapsed setup the way double-counting facade seconds did.
    # Before r13 the builders ran sequentially and the two numbers were
    # equal, so totals stay round-over-round comparable; the per-entry
    # detail (now contended wall times) stays in `shared_setup` for
    # attribution.
    shared_total = round(time.perf_counter() - t_warm, 3)

    # quiet-host protocol (VERDICT r5 #7): every key timed N times
    # back-to-back (default 2), report the per-key MIN — host-noise
    # spikes hit one run, not both, so round-over-round totals stop
    # moving ±10% on tenancy noise. SPARK_GRAFT_BENCH_RUNS=1 restores
    # the old single-pass behavior.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    from big_data_analysis_project_spark.errors import ScaleRefusal

    per_run: dict[str, list[float]] = {}
    fail_runs: dict[str, dict[int, str]] = {}
    # intended refusals (VERDICT r8 #5): a probe-and-refuse guard
    # declining to pay a measured over-budget bill is DESIGNED
    # behavior, not a regression — recorded in its own bucket so the
    # artifact is self-describing (previously graph_triangles'
    # refusal at sf1skew landed in `failures` and read as a bug).
    # Each entry is a dict carrying the guard's machine-readable
    # payload (VERDICT r9 #8: measured bound, budget, the bounded
    # alternative key, the override env var) next to the human
    # message, so a pipeline reading the artifact can ROUTE to the
    # alternative instead of parsing prose.
    refusal_runs: dict[str, dict] = {}
    for run in range(n_runs):
        for key in sorted(queries):
            t0 = time.perf_counter()
            try:
                n = queries[key](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                per_run.setdefault(key, []).append(round(dt, 3))
                rows[key] = n
                print(f"[bench] r{run} {key}: {dt:.2f}s rows={n}", file=sys.stderr)
            except ScaleRefusal as exc:
                refusal_runs[key] = {"message": str(exc)[:300], **exc.payload()}
                print(f"[bench] r{run} {key}: REFUSED (guard) {exc}", file=sys.stderr)
            except Exception as exc:  # noqa: BLE001 — report, don't abort
                msg = f"{type(exc).__name__}: {exc}"[:200]
                fail_runs.setdefault(key, {})[run] = msg
                print(f"[bench] r{run} {key}: FAILED {msg}", file=sys.stderr)
    # failure accounting per run (ADVICE r6 #3 / r9; rules documented
    # on bucketize, which is unit-tested in tests/test_memo.py)
    timings, failures, refusals, flaky = bucketize(
        per_run, fail_runs, refusal_runs
    )
    if flaky:
        print(f"[bench] flaky keys: {sorted(flaky)}", file=sys.stderr)

    # route provenance (VERDICT r10 #8): when a routed_* facade
    # rerouted during the timing loop, persist WHICH tier produced its
    # number (requested / ran / hops incl. each refusal payload) the
    # way refusals are persisted — artifact readers should not need
    # stderr to interpret a bounded-tier row. Passthrough routes are
    # omitted: "ran == requested, one hop" is the uninteresting case.
    route_hops: dict[str, dict] = {}
    facade_pass: dict[str, float] = {}
    try:
        from big_data_analysis_project_spark.registry.routed_q import LAST_ROUTE

        route_hops = {k: v for k, v in sorted(LAST_ROUTE.items()) if v["rerouted"]}
        facade_pass = facade_passthroughs(timings, LAST_ROUTE)
    except Exception as exc:  # noqa: BLE001
        print(f"[bench] route provenance unavailable: {exc}", file=sys.stderr)
    if route_hops:
        print(f"[bench] rerouted: { {k: v['ran'] for k, v in route_hops.items()} }",
              file=sys.stderr)
    if facade_pass:
        print(
            f"[bench] facade passthrough (head re-run, duplicate seconds): "
            f"{round(sum(facade_pass.values()), 2)}s over {len(facade_pass)} facades",
            file=sys.stderr,
        )

    # kNN ship decision (VERDICT r10 #1; r12 #3): in the grown-k
    # regime the pre-flight picks the dial and the mid-scale policy
    # may upgrade a sub-target selection to the affordable exact tier
    # — record (n_probe, predicted_recall, mode, tier) so a scale
    # artifact names the dial AND the tier its ann_knn_join row ran
    # with. Fixed-k scales (every driver/bench corpus) are omitted.
    # The quality bar is read FIRST, in its own tight try (VERDICT r12
    # #6): the generic provenance except previously hard-coded 0.95,
    # so a failed import would silently grade against a stale bar if
    # KNN_TARGET_RECALL ever moved; None now means "bar unavailable,
    # skip the sub-target-ship classification".
    knn_target: float | None
    try:
        from big_data_analysis_project_spark.registry.similarity_q import (
            KNN_TARGET_RECALL as knn_target,
        )
    except Exception as exc:  # noqa: BLE001
        knn_target = None
        print(f"[bench] knn quality bar unavailable: {exc}", file=sys.stderr)
    knn_probe: dict = {}
    knn_rec: dict | None = None
    try:
        from big_data_analysis_project_spark.registry.similarity_q import (
            knn_ship_decision,
        )

        knn_rec = knn_ship_decision(spark, sf_dir)
        if knn_rec.get("mode") != "fixed_k_default":
            knn_probe = knn_rec
    except ScaleRefusal as exc:
        # strict mode: the pre-flight itself refuses — the loop already
        # bucketed ann_knn_join/routed_knn; record the probe payload so
        # the quality story is complete even without those keys
        knn_rec = {"mode": "preflight", "strict": True, **exc.payload()}
        knn_probe = knn_rec
        print(f"[bench] knn probe pre-flight refused (strict): {exc}",
              file=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        print(f"[bench] knn ship decision unavailable: {exc}", file=sys.stderr)

    # quality refusals in their own bucket (VERDICT r11 #7), uniform
    # with the cost refusals bucket — strict-mode refusals, routed
    # double refusals, and non-strict sub-target ships all land here
    quality_refusals = quality_bucket(refusals, knn_rec, knn_target)
    if quality_refusals:
        print(f"[bench] quality refusals: {sorted(quality_refusals)}",
              file=sys.stderr)

    # run config in the artifact (VERDICT r12 #4): the sf30skew probe
    # initially ran on the 16g default heap and overstated α (1.48 vs
    # the heap-matched 0.76) — caught by hand. Recording heap /
    # partitions / CPUs in every artifact makes a mismatched-config
    # comparison visible in the artifacts themselves. jvm_max_heap_gb
    # is the ACTUAL live heap (Runtime.maxMemory), not the requested
    # conf — heap is launch-time-only, so a pre-existing JVM can
    # silently ignore spark.driver.memory.
    config: dict = {}
    try:
        from big_data_analysis_project_spark.session import run_config

        config = dict(run_config(spark), bench_runs=n_runs)
    except Exception as exc:  # noqa: BLE001 — config is metadata, never fatal
        print(f"[bench] config capture failed: {exc}", file=sys.stderr)

    # full detail (all keys, rows, failures) for the judge. "value"
    # stays the HONEST total: shared setup is real work the keys need,
    # so it is included — only the attribution moved.
    full = {
        "metric": "registry_total",
        "value": round(sum(timings.values()) + shared_total, 3),
        "unit": "sec",
        "queries": timings,
        "queries_per_run": per_run,
        "runs": n_runs,
        "shared_setup": shared,
        "shared_setup_sec": shared_total,
        "sf": sf,
        "rows": rows,
        "failures": failures,
        "refusals": refusals,
        "flaky": flaky,
    }
    if config:
        full["config"] = config
    if route_hops:
        full["route_hops"] = route_hops
    if knn_probe:
        full["knn_probe"] = knn_probe
    if quality_refusals:
        full["quality_refusals"] = quality_refusals
    if facade_pass:
        full["facade_passthrough"] = facade_pass
        full["facade_passthrough_sec"] = round(sum(facade_pass.values()), 3)
        full["value_ex_facade_passthrough"] = round(
            full["value"] - sum(facade_pass.values()), 3
        )
    # SPARK_GRAFT_BENCH_OUT routes per-scale runs to their own artifact
    # (bench_full_sf3skew.json etc.) so they can't clobber the canonical
    # sf0.1 bench_full.json — previously every off-scale run overwrote
    # it and the committed artifact had to be `git show`n back.
    out_name = os.environ.get("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    full_path = Path(__file__).resolve().parent / out_name
    try:
        if _equivalent_rerun(full_path, full):
            # round-boundary hygiene (VERDICT r9 #5): the driver re-runs
            # this script on unchanged code every round, and the only
            # diff is timing noise — rewriting dirties the tree with a
            # content-equal artifact three rounds running. Same key set,
            # same rows/failures/refusals, totals within noise => keep
            # the committed artifact. SPARK_GRAFT_BENCH_FORCE=1 forces
            # the rewrite for a deliberate refresh.
            print(
                f"[bench] full detail UNCHANGED modulo timing noise — "
                f"keeping {full_path} (SPARK_GRAFT_BENCH_FORCE=1 to rewrite)",
                file=sys.stderr,
            )
        else:
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
        "value": round(sum(timings.values()) + shared_total, 2),
        "unit": "sec",
        "queries": {k: round(timings[k], 2) for k in headline if k in timings},
        "sf": sf,
        "n_queries": len(timings),
        "n_failures": len(failures),
        "n_refusals": len(refusals),
        "n_quality_refusals": len(quality_refusals),
        "n_flaky": len(flaky),
        "runs": n_runs,
        "shared_setup_sec": round(shared_total, 2),
    }
    if facade_pass:
        out["facade_passthrough_sec"] = round(sum(facade_pass.values()), 2)
    sys.stderr.flush()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
