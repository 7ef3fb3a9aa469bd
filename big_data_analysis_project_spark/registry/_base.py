"""Shared registry plumbing: every query module declares its
(QUERIES, ORACLE, q) triple through one factory so registration
semantics (key -> callable, optional DuckDB oracle SQL) live in
exactly one place."""

from __future__ import annotations

from ..errors import ScaleRefusal

__all__ = ["KEY_ARTIFACTS", "ScaleRefusal", "make_registry"]

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


def make_registry():
    """Return (QUERIES, ORACLE, q): the module's key->fn map, its
    key->oracle-SQL map, and the ``@q(key, oracle_sql=None,
    artifacts=())`` decorator that fills both (plus the module-shared
    ``KEY_ARTIFACTS`` map when the key consumes memoized artifacts)."""
    queries: dict = {}
    oracle: dict = {}

    def q(key: str, oracle_sql: str | None = None, artifacts=()):
        def deco(fn):
            queries[key] = fn
            if oracle_sql is not None:
                oracle[key] = oracle_sql
            KEY_ARTIFACTS[key] = frozenset(artifacts)
            return fn

        return deco

    return queries, oracle, q
