"""Registry-side artifact-dependency declarations (VERDICT r9 #6):
every @q registration declares the session-memoized shared artifacts
its query lazily consumes (`artifacts={...}`), and
``registry.key_artifact_deps`` closes the set over the build-order
parents. tools/scale_probe.py derives its --skip-warm drop list from
these declarations, so an UNDER-declaration would let a probe lazily
trigger a skipped (possibly quadratic-by-contract) build inside a
timed run — the failure class the old hand-maintained map only
warned about. This test makes under-declaration a suite failure: it
AST-derives, for each registered key, the cached-artifact accessors
actually reachable from the key's function (transitively through
module-level helpers), and asserts the declared closure covers the
derived closure. No Spark session needed — pure source analysis."""

from __future__ import annotations

import ast
from pathlib import Path

REG_DIR = (
    Path(__file__).resolve().parents[1]
    / "big_data_analysis_project_spark"
    / "registry"
)

# accessor function -> warmable artifact name (the names
# warm_shared_artifacts builds)
ACCESSORS = {
    "shingles_cached": "shingles",
    "shingle_evidence_cached": "shingle_evidence",
    "capped_evidence_cached": "capped_evidence",
    "minhash_pairs_cached": "minhash_pairs",
    "simhash_pairs_cached": "simhash_pairs",
    "mllib_model_cached": "mllib_model",
    "ngram_pairs_cached": "ngram_pairs",
    "unit_vectors_cached": "unit_vectors",
    "query_unit_cached": "query_vec",
    "ivf_centroids_cached": "ivf_model",
    "pq_codebooks_cached": "pq_codebooks",
    "batch_centroids_cached": "batch_model",
    "knn_probe_cached": "knn_probe",
    "pca_model_cached": "pca_model",
    "synthetic_marts": "tb_marts",
}


def _closure(arts, parents):
    out: set[str] = set()
    frontier = list(arts)
    while frontier:
        a = frontier.pop()
        if a in out:
            continue
        out.add(a)
        frontier.extend(parents.get(a, ()))
    return out


def _derive_key_artifacts():
    """key -> set of accessor-artifacts reachable from its function,
    following helper calls by name across registry modules (names are
    module-unique; an accessor call terminates recursion — its own
    deps are the parent closure's job)."""
    fn_calls: dict[str, set[str]] = {}
    key_fn: dict[str, str] = {}
    for mod in REG_DIR.glob("*.py"):
        if mod.name.startswith("_"):
            continue
        tree = ast.parse(mod.read_text())
        for node in ast.walk(tree):
            if not isinstance(node, ast.FunctionDef):
                continue
            calls = set()
            for sub in ast.walk(node):
                if isinstance(sub, ast.Call):
                    name = getattr(sub.func, "id", None) or getattr(
                        sub.func, "attr", None
                    )
                    if name:
                        calls.add(name)
            fn_calls.setdefault(node.name, set()).update(calls)
            for dec in node.decorator_list:
                if (
                    isinstance(dec, ast.Call)
                    and getattr(dec.func, "id", "") == "q"
                    and dec.args
                    and isinstance(dec.args[0], ast.Constant)
                ):
                    key_fn[dec.args[0].value] = node.name

    def reachable(fname: str, seen: set[str]) -> set[str]:
        if fname in seen:
            return set()
        seen.add(fname)
        out: set[str] = set()
        for c in fn_calls.get(fname, ()):
            if c in ACCESSORS:
                out.add(ACCESSORS[c])
            elif c in fn_calls and c != fname:
                out |= reachable(c, seen)
        return out

    return {k: reachable(f, set()) for k, f in key_fn.items()}


def test_declared_artifacts_cover_actual_consumption():
    from big_data_analysis_project_spark.registry import (
        ARTIFACT_PARENTS,
        KEY_ARTIFACTS,
        QUERIES,
        key_artifact_deps,
    )

    derived = _derive_key_artifacts()
    # every registry key is mapped (the @q decorator records even the
    # empty default) — the unmapped-key warning class is closed
    assert set(QUERIES) <= set(KEY_ARTIFACTS)

    missing = {}
    for key in QUERIES:
        want = _closure(derived.get(key, set()), ARTIFACT_PARENTS)
        have = set(key_artifact_deps(key))
        if not want <= have:
            missing[key] = sorted(want - have)
    assert not missing, (
        f"under-declared @q artifacts (code reaches an accessor the "
        f"registration omits): {missing}"
    )


def test_declared_artifacts_are_known_names():
    """Over-declaration guard: a typo'd artifact name would silently
    never match a --skip-warm set. Every declared name must be one
    warm_shared_artifacts can build (= an ACCESSORS value)."""
    from big_data_analysis_project_spark.registry import (
        ARTIFACT_PARENTS,
        KEY_ARTIFACTS,
    )

    known = set(ACCESSORS.values())
    for key, arts in KEY_ARTIFACTS.items():
        unknown = set(arts) - known
        assert not unknown, f"{key} declares unknown artifact(s) {unknown}"
    for art, parents in ARTIFACT_PARENTS.items():
        assert art in known, art
        assert set(parents) <= known, (art, parents)


def test_closure_is_transitive():
    from big_data_analysis_project_spark.registry import key_artifact_deps

    deps = key_artifact_deps("dedup_ngram_jaccard")
    # ngram_pairs is built from shingle_evidence, built from shingles
    assert {"ngram_pairs", "shingle_evidence", "shingles"} <= set(deps)
    # a key with no declarations closes to the empty set
    assert key_artifact_deps("dedup_exact") == frozenset()


def test_warm_scheduler_respects_parents_and_overlaps(spark, monkeypatch):
    """r13 optimization (guide §2.6): warm_shared_artifacts runs
    independent builder chains concurrently but must never start a
    child before its ARTIFACT_PARENTS finish — a child racing its
    parent's memoized build would double-build the checkpoint. Fakes
    with deliberate sleeps record (start, end) per builder; the
    parallel run must (a) order every present (child, parent) edge and
    (b) actually overlap (wall well under the serial sum)."""
    import time
    import types

    import big_data_analysis_project_spark.registry as R

    spans: dict[str, tuple[float, float]] = {}

    def fake(name, dt=0.15):
        def _f(*a, **k):
            t0 = time.perf_counter()
            time.sleep(dt)
            spans[name] = (t0, time.perf_counter())
            return types.SimpleNamespace(count=lambda: 0)

        return _f

    monkeypatch.setattr(R.dedup_q, "shingles_cached", fake("shingles"))
    monkeypatch.setattr(
        R.dedup_q, "shingle_evidence_cached", fake("shingle_evidence")
    )
    monkeypatch.setattr(
        R.dedup_q, "capped_evidence_cached", fake("capped_evidence")
    )
    monkeypatch.setattr(R.dedup_q, "minhash_pairs_cached", fake("minhash_pairs"))
    monkeypatch.setattr(R.dedup_q, "simhash_pairs_cached", fake("simhash_pairs"))
    monkeypatch.setattr(R.dedup_q, "warm_mllib_model", fake("mllib_model"))
    monkeypatch.setattr(R.dedup_q, "ngram_pairs_cached", fake("ngram_pairs"))
    monkeypatch.setattr(
        R.similarity_q, "unit_vectors_cached", fake("unit_vectors")
    )
    monkeypatch.setattr(R.similarity_q, "ivf_centroids_cached", fake("ivf_model"))
    monkeypatch.setattr(R.similarity_q, "query_unit_cached", fake("query_vec"))
    monkeypatch.setattr(R.similarity_q, "warm_pq_codebooks", fake("pq_codebooks"))
    monkeypatch.setattr(
        R.similarity_q, "batch_centroids_cached", fake("batch_model")
    )
    monkeypatch.setattr(R.similarity_q, "knn_probe_cached", fake("knn_probe"))
    monkeypatch.setattr(R.training_q, "pca_model_cached", fake("pca_model"))
    monkeypatch.setattr(R.pipeline_q, "synthetic_marts", fake("tb_marts"))

    t0 = time.perf_counter()
    out = R.warm_shared_artifacts(spark, "/nonexistent", parallel=4)
    wall = time.perf_counter() - t0

    assert set(spans) == set(out) == {
        "shingles", "shingle_evidence", "capped_evidence", "minhash_pairs",
        "simhash_pairs", "mllib_model", "ngram_pairs", "unit_vectors",
        "ivf_model", "query_vec", "pq_codebooks", "batch_model",
        "knn_probe", "pca_model", "tb_marts",
    }
    for child, parents in R.ARTIFACT_PARENTS.items():
        for parent in parents:
            assert spans[child][0] >= spans[parent][1], (
                f"{child} started before parent {parent} finished"
            )
    serial = sum(e - s for s, e in spans.values())
    assert wall < 0.8 * serial, (wall, serial)

    # parallel=1 is the sequential attribution mode: declared order
    spans.clear()
    R.warm_shared_artifacts(spark, "/nonexistent", parallel=1)
    starts = sorted(spans, key=lambda n: spans[n][0])
    assert starts == [
        "shingles", "shingle_evidence", "capped_evidence", "minhash_pairs",
        "simhash_pairs", "mllib_model", "ngram_pairs", "unit_vectors",
        "ivf_model", "query_vec", "pq_codebooks", "batch_model",
        "knn_probe", "pca_model", "tb_marts",
    ]
