"""Scale-adaptive registry keys (round 10; factory round 11): the
routing facade (``big_data_analysis_project_spark.router``) exposed as
first-class queries, so the driver's correctness gate exercises the
route itself.

Each key asks the EXACT question and lets ``run_routed`` walk the
declared fallback ladder when a guard refuses. At driver/oracle scale
(sf0.01) no guard fires, the exact tier runs, and the key
hash-matches the exact twin's DuckDB oracle — so the routing plumbing
(not just the tiers it lands on) is oracle-checked. At adversarial
scale (sf3skew, where the exact evidence lineage refuses at 6.9e8
pairs_bound) the same key stays GREEN by landing on the bounded tier,
which the whole-registry artifacts record (bench_full_sf3skew.json:
these keys run where their exact twins sit in the refusals bucket).

Round 11 (VERDICT r10 #6): every ladder head gets a facade, DERIVED
from the registry's own fallback declarations instead of hand-copied
per key — ``_FACADES`` maps head -> facade name, the oracle is the
head's oracle where one exists, and the artifact set is the union
over the whole ladder (any tier on the chain may be the one that
runs). Adding a new ladder = declaring ``fallback=`` at registration
plus one name here; the chain walk, provenance, and artifact closure
come for free.

ORACLE VALIDITY CAVEAT (ADVICE r10; STRUCTURAL since round 12): a
facade registers the EXACT twin's oracle SQL, which is the right
answer only where no guard fires (every driver/oracle scale — the
gate runs at sf0.01). On a corpus where routing reroutes, the facade
returns the BOUNDED tier's schema and row set under its one-sided
contract (lower-bound Jaccard, subset edges, refinement clustering),
and an oracle/hash comparison there would report a false mismatch.
The local harness now enforces this structurally
(tests/oracle_harness.py::resolve_oracle consults ``LAST_ROUTE``
after running the key and swaps to the ran tier's oracle or
skips-with-note; forced-reroute pytest in test_registry_oracle.py);
any external harness comparing at a guarded scale should do the
same before trusting a facade mismatch.

Provenance (VERDICT r10 #8): each facade records its latest
``RouteResult`` in ``LAST_ROUTE[facade_key]`` — requested key, the
tier that ran, and the full hop list with each refusal payload — so a
harness (bench.py's ``route_hops`` bucket) can persist WHICH tier
produced each number without stderr archaeology. A dict write per
call; the route itself is a passthrough (one dict lookup) when no
guard fires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ._base import KEY_ARTIFACTS, KEY_FALLBACKS, KEY_ORACLES, make_registry

QUERIES, ORACLE, q = make_registry()

# facade key -> latest route provenance:
#   {"requested", "ran", "rerouted", "hops": [RouteHop.as_dict()]}
# Latest-wins per facade; bench.py snapshots it after the timing loop.
LAST_ROUTE: dict[str, dict] = {}

# Ladder head -> facade name. Every key that DECLARES a fallback and
# is not itself a fallback target (i.e. the top of a chain) must
# appear here — asserted below, so declaring a new ladder without
# naming its facade fails at import, not in review.
_FACADES: dict[str, str] = {
    "dedup_ngram_jaccard": "routed_neardup",
    "dedup_containment": "routed_containment",
    "dedup_clusters": "routed_clusters",
    "dedup_keep_best": "routed_keep_best",
    "dedup_incremental": "routed_incremental",
    "dedup_embedding": "routed_embedding",
    "dedup_mllib_minhash": "routed_mllib_minhash",
    "graph_triangles": "routed_triangles",
    "graph_degree": "routed_degree",
    "graph_pagerank": "routed_pagerank",
    "graph_wedge_audit": "routed_wedge_audit",
    # the round-11 stream-join replay guards: at guarded scale the
    # route lands on the BATCH twin (identical rows for the inner
    # join; matched-identical + null-superset for the outer) — the
    # batch-backfill-plus-streaming-tail architecture as one callable
    "stream_pair_join": "routed_pair_join",
    "stream_outer_join": "routed_outer_join",
    # the backfill+tail composition (round 13, VERDICT r12 #2): its
    # tail-over-budget refusal routes to the batch twin — which is
    # row-IDENTICAL by the key's own equivalence contract, so this is
    # the one ladder whose facade oracle stays exact on every corpus
    # whichever tier runs
    "stream_backfill_tail": "routed_backfill_tail",
    # the QUALITY ladder (round 12, VERDICT r11 #1) — the one ladder
    # that walks UP in cost: a strict-mode probe pre-flight refusal
    # ("cannot reach the recall bar within the probe budget") routes
    # to the exact tier, whose own n*(n-1) guard decides whether
    # exactness is affordable; both refusing = NoBoundedTier carrying
    # both payloads, the honest double refusal
    "ann_knn_join": "routed_knn",
}


def _ladder_artifacts(head: str) -> frozenset:
    """Union of the declared artifact deps over the whole chain: the
    route may land on ANY tier, so the facade's pre-warm set is the
    closure, not the head's own set."""
    from ..router import route_plan

    arts: set = set()
    for k in route_plan(head):
        arts |= KEY_ARTIFACTS.get(k, frozenset())
    return frozenset(arts)


def _make_facade(head: str, name: str):
    from ..router import route_plan

    chain = route_plan(head)

    def facade(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..router import run_routed

        r = run_routed(spark, sf_dir, head)
        LAST_ROUTE[name] = {
            "requested": r.requested,
            "ran": r.key,
            "rerouted": r.rerouted,
            "hops": [h.as_dict() for h in r.hops],
        }
        return r.df

    facade.__name__ = name
    facade.__doc__ = (
        f"{head!r} at whatever tier is affordable: the declared ladder "
        f"{' -> '.join(chain)}, walked by router.run_routed past "
        "ScaleRefusals — the decision the engine's guards already "
        "make, surfaced as one callable a pipeline schedules without "
        "a try/except ladder. Output schema is the schema of the tier "
        "that RAN; at guarded scales the bounded tiers' one-sided "
        "contracts apply and the exact twin's oracle no longer "
        "describes the rows (see module docstring) — provenance in "
        f"LAST_ROUTE[{name!r}]."
    )
    # the head's oracle from the GLOBAL registration record (ADVICE
    # r11): a hand-picked module list would silently register a future
    # ladder head from any other module as rows-only
    oracle_sql = KEY_ORACLES.get(head)
    return q(name, oracle_sql, artifacts=_ladder_artifacts(head))(facade)


for _head, _name in _FACADES.items():
    _make_facade(_head, _name)

# a ladder declared without a facade is a silent coverage hole — the
# driver gate would never exercise its route end-to-end. An explicit
# raise, not `assert` (ADVICE r11): the fail-at-import guarantee must
# survive `python -O`.
_heads = set(KEY_FALLBACKS) - set(KEY_FALLBACKS.values())
if not _heads <= set(_FACADES):
    raise RuntimeError(
        f"ladder heads without a routed facade: {sorted(_heads - set(_FACADES))}"
    )
