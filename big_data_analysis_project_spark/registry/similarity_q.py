"""Similarity search over the embeddings table (Phase E): brute-force
cosine top-k as the exactness baseline, and a random-hyperplane
LSH-bucketed variant as the scale path.

The dot products are pure JVM higher-order functions
(zip_with/aggregate) — no Python in the hot path; at real scale the
same plan shape applies with the query side broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

QUERIES = {}
ORACLE = {}


def q(key: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[key] = fn
        if oracle is not None:
            ORACLE[key] = oracle
        return fn

    return deco


TOP_K = 10
QUERY_VEC_ID = 0

# deterministic hyperplanes for LSH bucketing (fixed LCG, seed 7)
_DIM = 64
_N_PLANES = 8


def _planes(n: int = _N_PLANES, dim: int = _DIM, seed: int = 7) -> list[list[float]]:
    state = seed
    planes = []
    for _ in range(n):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


@q(
    "ann_cosine_topk",
    f"""WITH query AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
       SELECT vec_id, ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 4) AS cosine
       FROM embeddings, query
       WHERE vec_id <> {QUERY_VEC_ID}
       ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) DESC, vec_id
       LIMIT {TOP_K}""",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for one query vector: broadcast the
    query, one narrow pass over the corpus, TakeOrderedAndProject for
    the top-k (per-partition heaps, no global sort). This is the
    exact baseline every ANN variant is measured against."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    query = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    scored = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(query))
        .withColumn(
            "cosine_raw", _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
        )
    )
    return (
        scored.orderBy(F.desc("cosine_raw"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", F.round("cosine_raw", 4).alias("cosine"))
    )


@q("ann_lsh_bucketed")  # approximate: rows-only driver check + pytest recall test
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: random-hyperplane signature buckets. Corpus and
    query are hashed with the same fixed hyperplanes; search touches
    only buckets within hamming<=1 of the query signature (bucket
    probing), so the scan cost is a fraction of brute force and the
    bucketing is a plain equi-join — shuffle keyed on small ints.

    Returns top-k among probed buckets; recall vs the exact baseline
    is asserted in tests (probing radius trades recall for cost)."""
    planes = _planes()
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    def signature(vcol: Column) -> Column:
        sig = F.lit(0)
        for i, p in enumerate(planes):
            plane = F.array(*[F.lit(x) for x in p])
            sig = sig + F.when(_dot(vcol, plane) > 0, F.lit(1 << i)).otherwise(0)
        return sig

    corpus = e.withColumn("bucket", signature(F.col("v")))
    qrow = corpus.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    # probe the query bucket plus all hamming-1 neighbors
    probe_buckets = F.array(
        F.col("qbucket"), *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(_N_PLANES)]
    )
    probes = qrow.select("qv", F.explode(probe_buckets).alias("bucket"))
    scored = (
        corpus.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(probes), "bucket")
        .withColumn(
            "cosine_raw", _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
        )
    )
    return (
        scored.orderBy(F.desc("cosine_raw"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", F.round("cosine_raw", 4).alias("cosine"))
    )
