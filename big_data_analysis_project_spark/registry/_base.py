"""Shared registry plumbing: every query module declares its
(QUERIES, ORACLE, q) triple through one factory so registration
semantics (key -> callable, optional DuckDB oracle SQL) live in
exactly one place."""

from __future__ import annotations

from ..errors import ScaleRefusal

__all__ = [
    "KEY_ARTIFACTS",
    "KEY_FALLBACKS",
    "KEY_ORACLES",
    "ScaleRefusal",
    "make_registry",
]

# key -> frozenset of session-memoized shared-artifact names the key's
# query lazily consumes (the names warm_shared_artifacts builds:
# shingles, shingle_evidence, minhash_pairs, ngram_pairs, unit_vectors,
# ivf_model, pq_codebooks, batch_model, knn_probe, tb_marts).
# Declared AT REGISTRATION via ``@q(key, artifacts={...})`` so the
# dependency lives next to the code that creates it — VERDICT r9 #6:
# tools/scale_probe.py previously hand-maintained a parallel copy of
# this map, and an unmapped key probing with --skip-warm would lazily
# trigger the skipped (possibly quadratic-by-contract) build inside
# its timed run. TRANSITIVE closure is the declarer's responsibility:
# ngram_pairs is built FROM shingle_evidence, which is built from
# shingles — a consumer of ngram_pairs declares all three. Global
# across modules (keys are globally unique, asserted in __init__).
KEY_ARTIFACTS: dict[str, frozenset] = {}

# key -> the registry key of the BOUNDED tier of the same question,
# declared at registration via ``@q(key, fallback="...")`` (round 10).
# This is the routing table ``router.run_routed`` walks when a guard
# raises ScaleRefusal: the exact twin names the tier a 100 TB pipeline
# should pay instead, next to the code whose refusal message already
# names it in prose. Declared ONLY where the fallback answers the same
# question under a documented one-sided contract (lower-bound Jaccard,
# subset edges, refinement clustering) — a key with no honest bounded
# tier declares nothing and the router dead-ends loudly
# (errors.NoBoundedTier) instead of substituting a wrong answer; the
# bar is CONTRACT fit, not mechanism reuse (banding may not stand in
# for containment, but df-capped exact evidence may — see
# dedup_containment_dfcap). Chains compose (graph_triangles -> _capped -> _lsh); the
# registry __init__ asserts every value is a registered key and every
# chain is acyclic.
KEY_FALLBACKS: dict[str, str] = {}

# key -> its DuckDB oracle SQL, global across modules (keys are
# globally unique). Filled by the same ``@q`` call that fills the
# module-local ORACLE map — ADVICE r11: the routed-facade factory
# previously resolved a ladder head's oracle by consulting a
# hand-picked module list (_dedup / _extended), so a head registered
# with an oracle in any OTHER module would silently get a rows-only
# facade. Resolving from the registration record can't go stale.
KEY_ORACLES: dict[str, str] = {}


def make_registry():
    """Return (QUERIES, ORACLE, q): the module's key->fn map, its
    key->oracle-SQL map, and the ``@q(key, oracle_sql=None,
    artifacts=(), fallback=None)`` decorator that fills both (plus the
    module-shared ``KEY_ARTIFACTS`` / ``KEY_FALLBACKS`` maps when the
    key consumes memoized artifacts / declares a bounded tier)."""
    queries: dict = {}
    oracle: dict = {}

    def q(
        key: str,
        oracle_sql: str | None = None,
        artifacts=(),
        fallback: str | None = None,
    ):
        def deco(fn):
            queries[key] = fn
            if oracle_sql is not None:
                oracle[key] = oracle_sql
                KEY_ORACLES[key] = oracle_sql
            KEY_ARTIFACTS[key] = frozenset(artifacts)
            if fallback is not None:
                assert fallback != key, f"{key}: self-fallback"
                KEY_FALLBACKS[key] = fallback
            return fn

        return deco

    return queries, oracle, q
