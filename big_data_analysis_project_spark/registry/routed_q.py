"""Scale-adaptive registry keys (round 10): the routing facade
(``big_data_analysis_project_spark.router``) exposed as first-class
queries, so the driver's correctness gate exercises the route itself.

Each key asks the EXACT question and lets ``run_routed`` walk the
declared fallback ladder when a guard refuses. At driver/oracle scale
(sf0.01) no guard fires, the exact tier runs, and the key
hash-matches the exact twin's DuckDB oracle — so the routing plumbing
(not just the tiers it lands on) is oracle-checked. At adversarial
scale (sf3skew, where the exact evidence lineage refuses at 6.9e8
pairs_bound) the same key stays GREEN by landing on the bounded tier,
which the whole-registry artifacts record (bench_full_sf3skew.json:
these keys run where their exact twins sit in the refusals bucket).

The output schema is the schema of the tier that RAN — at scale the
bounded tiers' one-sided contracts (lower-bound jaccard_lb, subset
edges) apply, and a caller that persists routed output should persist
``RouteResult.key`` alongside; these registry surfaces return only
the DataFrame because the driver contract is (spark, sf_dir) -> DF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ._base import make_registry
from . import dedup_q as _dedup
from . import extended_q as _extended

QUERIES, ORACLE, q = make_registry()


@q(
    "routed_neardup",
    _dedup.ORACLE["dedup_ngram_jaccard"],
    artifacts={"ngram_pairs", "shingles"},
)
def routed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at whatever tier is affordable: exact n-gram
    Jaccard (``dedup_ngram_jaccard``) when the corpus df-audit prices
    the evidence join under budget, else the df-capped lower-bound
    tier (``dedup_ngram_dfcap``) — the decision the engine's guards
    already make, surfaced as one callable a pipeline schedules
    without a try/except ladder."""
    from ..router import run_routed

    return run_routed(spark, sf_dir, "dedup_ngram_jaccard").df


@q(
    "routed_triangles",
    _extended.ORACLE["graph_triangles"],
    artifacts={"ngram_pairs", "minhash_pairs"},
)
def routed_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count at whatever tier is affordable — the registry's
    longest declared ladder: exact wedge join -> degree-ordered capped
    count -> banded-minhash capped count. At sf1skew the first hop
    refuses on the wedge budget and the capped tier runs; at sf3skew
    the evidence artifact itself refuses so BOTH exact-edge tiers
    decline and the LSH tier serves — one key, green at every measured
    scale, provenance on stderr."""
    from ..router import run_routed

    return run_routed(spark, sf_dir, "graph_triangles").df
