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

# deterministic hyperplanes for LSH bucketing (fixed LCG). Multi-table
# LSH: N_TABLES independent plane sets; a corpus vector is a candidate
# if it collides with the query (within hamming<=1) in ANY table —
# union-of-tables recall compounds (miss prob = prod of per-table miss)
# while per-table probe cost stays 9/2^8 of the corpus.
_DIM = 64
_N_PLANES = 8
_N_TABLES = 4


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
    # query norm precomputed into the 1-row broadcast frame: inside the
    # scored expression it would be re-evaluated for every corpus row
    query = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), _norm(F.col("v")).alias("qn")
    )
    scored = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(query))
        .withColumn(
            "cosine_raw", _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * F.col("qn"))
        )
    )
    return (
        scored.orderBy(F.desc("cosine_raw"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", F.round("cosine_raw", 4).alias("cosine"))
    )


N_CENTROIDS = 16
N_PROBE = 4
_LLOYD_ITERS = 2


def assign_cells(unit: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(vec_id, v) -> (vec_id, v, cell): nearest-centroid (max-dot)
    assignment with the MODEL AS BROADCAST DATA, not literals. An
    inline k x dim literal-array argmax expression costs seconds of
    codegen per compile and grows with k*dim (hopeless at real
    embedding dims like 1024); this is one posexplode + broadcast
    join on pos + two narrow aggregations — constant compile cost at
    any k/dim, and the same shape you'd use when the model lives in a
    table instead of the driver. Ties break to the LOWEST cell id
    (the struct-max's negated-cell tiebreak), matching argmax-first
    semantics.

    Determinism caveat (inherent to this shape): the per-(vec, cell)
    dot is an F.sum over shuffled partials, so float accumulation
    order — and therefore a near-tie centroid assignment — can vary
    between runs, unlike a single-expression fold. Acceptable for ANN
    (assignment quality is unchanged, recall tests bound the effect);
    if exact run-to-run stability ever matters, sort by pos and fold
    per-vector with aggregate() instead."""
    cent_rows = [
        (ci, pos, float(m))
        for ci, c in enumerate(centroids)
        for pos, m in enumerate(c)
    ]
    cdf = unit.sparkSession.createDataFrame(cent_rows, "cell int, pos int, m double")
    ex = unit.select("vec_id", F.posexplode("v").alias("pos", "x"))
    dots = (
        ex.join(F.broadcast(cdf), "pos")
        .groupBy("vec_id", "cell")
        .agg(F.sum(F.col("x") * F.col("m")).alias("dot"))
    )
    best = (
        dots.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("dot"), (-F.col("cell")).cast("int").alias("nc"))
            ).alias("b")
        )
        .select("vec_id", (-F.col("b.nc")).cast("int").alias("cell"))
    )
    return unit.join(best, "vec_id")


_TRAIN_SAMPLE_TARGET = 2_000


def train_ivf_centroids(
    unit: DataFrame,
    k: int = N_CENTROIDS,
    iters: int = _LLOYD_ITERS,
    sample_target: int = _TRAIN_SAMPLE_TARGET,
) -> list[list[float]]:
    """Spherical k-means over a frame of unit vectors (``vec_id``,
    ``v``): seeds are the k smallest-id vectors (deterministic — no
    runtime RNG), then ``iters`` distributed Lloyd passes. Each pass is
    one narrow assignment scan plus a (cell, pos) average aggregation;
    only the kxdim centroid matrix is ever collected — model state,
    not data.

    Training runs on a deterministic modulus sample of ~``sample_target``
    vectors when the corpus is larger (``vec_id % m == 0`` — no RNG, so
    centroids are reproducible): the coarse quantizer needs cluster
    STRUCTURE, not every row, so training cost is independent of corpus
    size — the exact discipline the 100 TB deployment uses (train on a
    ~1e6-row sample, assign the full corpus once). Below the target the
    full frame trains, keeping small-SF recall tests deterministic."""
    n = unit.count()  # count over a checkpointed frame: metadata-cheap
    train = unit
    if sample_target and n > sample_target:
        m = n // sample_target
        train = unit.filter((F.col("vec_id") % m) == 0).localCheckpoint(eager=True)
    seeds = train.orderBy("vec_id").limit(k).select("v").collect()
    centroids = [list(r.v) for r in seeds]
    for _ in range(iters):
        assigned = assign_cells(train, centroids)
        means = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r.cell, {})[r.pos] = r.m
        for ci, comp in by_cell.items():
            vec = [comp[p] for p in range(len(comp))]
            n = sum(x * x for x in vec) ** 0.5
            if n > 0:  # renormalize the mean back onto the sphere
                centroids[ci] = [x / n for x in vec]
    return centroids


@q("ann_ivf")  # approximate: rows-only driver check + pytest recall test
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: spherical-k-means coarse quantizer,
    every vector assigned to its nearest of N_CENTROIDS cells, query
    probes its N_PROBE nearest cells, exact cosine re-rank inside the
    probed cells only.

    Scale shape — the complement of the LSH path above: the cell id is
    a data-layout key. Stored partitioned-by-cell (as sink_partitioned
    does for dates), the probe filter becomes partition PRUNING — the
    scan touches N_PROBE/N_CENTROIDS of the corpus and the plan is
    scan -> filter -> TakeOrderedAndProject with no join or shuffle at
    query time. The query vector and the kxdim centroid matrix are the
    only driver-side values (the search argument and the model —
    constant-size, not data). Recall@10 vs ann_cosine_topk is asserted
    in tests/test_recall.py."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("raw")
    )
    unit = e.withColumn("n", _norm(F.col("raw"))).select(
        "vec_id", F.transform("raw", lambda x: x / F.col("n")).alias("v")
    )
    # referenced by training passes AND the final probe scan within
    # separate actions — eager checkpoint materializes the normalize
    # once (dim doubles per vector, same row count)
    unit = unit.localCheckpoint(eager=True)
    centroids = train_ivf_centroids(unit)
    qv = unit.filter(F.col("vec_id") == QUERY_VEC_ID).select("v").collect()[0].v
    # probe-cell selection is pure python over the kxdim model matrix
    qdots = [sum(a * b for a, b in zip(qv, c)) for c in centroids]
    probe_cells = sorted(range(len(qdots)), key=lambda i: -qdots[i])[:N_PROBE]
    assigned = assign_cells(unit, centroids)
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    scored = (
        assigned.filter(F.col("cell").isin(probe_cells))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        # unit vectors: cosine IS the dot product, no norms at probe time
        .withColumn("cosine_raw", _dot(F.col("v"), qlit))
    )
    return (
        scored.orderBy(F.desc("cosine_raw"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", F.round("cosine_raw", 4).alias("cosine"))
    )


@q("ann_lsh_bucketed")  # approximate: rows-only driver check + pytest recall test
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: multi-table random-hyperplane LSH. Each of
    _N_TABLES plane sets hashes every vector to an 8-bit bucket; the
    query probes its own bucket plus all hamming-1 neighbors in EVERY
    table, candidates are the union (deduped by vec_id), then exact
    cosine + top-k over candidates only.

    Scale shape: corpus bucketing is one narrow pass emitting
    _N_TABLES small-int keys per vector; the probe join is an
    equi-join on (table, bucket) against a broadcast ~36-row probe
    list, so the shuffle is O(candidates) and the full corpus is
    never scored. Recall@10 vs the exact baseline is asserted in
    tests/test_recall.py (union of tables compounds recall;
    single-table hamming<=1 probing measured ~0.3 on the testdata,
    multi-table ~0.7+)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    def signature(vcol: Column, planes: list[list[float]]) -> Column:
        sig = F.lit(0)
        for i, p in enumerate(planes):
            plane = F.array(*[F.lit(x) for x in p])
            sig = sig + F.when(_dot(vcol, plane) > 0, F.lit(1 << i)).otherwise(0)
        return sig

    tables = [_planes(seed=7 + t) for t in range(_N_TABLES)]
    corpus = (
        e.select(
            "vec_id",
            "v",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"), signature(F.col("v"), tables[t]).alias("bucket")
                        )
                        for t in range(_N_TABLES)
                    ]
                )
            ).alias("tb"),
        )
        .select("vec_id", "v", "tb.tbl", "tb.bucket")
        # referenced twice (query-row filter + probe join) within ONE
        # action: eager checkpoint instead of .cache() — concurrent
        # stages of a single action race past a lazy cache and both
        # recompute the 32 hyperplane dot products per vector
        .localCheckpoint(eager=True)
    )
    qrow = corpus.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"),
        _norm(F.col("v")).alias("qn"),
        "tbl",
        F.col("bucket").alias("qbucket"),
    )
    # per table: the query bucket plus all hamming-1 neighbors
    probe_buckets = F.array(
        F.col("qbucket"), *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(_N_PLANES)]
    )
    probes = qrow.select("qv", "qn", "tbl", F.explode(probe_buckets).alias("bucket"))
    candidates = (
        corpus.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(probes), ["tbl", "bucket"])
        .select("vec_id", "v", "qv", "qn")
        .dropDuplicates(["vec_id"])
    )
    scored = candidates.withColumn(
        "cosine_raw", _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * F.col("qn"))
    )
    return (
        scored.orderBy(F.desc("cosine_raw"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", F.round("cosine_raw", 4).alias("cosine"))
    )


@q("ann_mllib_lsh")  # approximate: rows-only driver check + pytest recall test
def ann_mllib_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MLlib-interop ANN path: ``BucketedRandomProjectionLSH``
    (pyspark.ml) over unit-normalized vectors — on the unit sphere
    euclidean NN ordering IS cosine NN ordering (cos = 1 - d^2/2), so
    the fitted model's ``approxNearestNeighbors`` answers the same
    query as ann_cosine_topk and the hand-rolled LSH/IVF keys, but
    with the library estimator/model machinery (persistable model,
    approxSimilarityJoin for the pair-join form) instead of
    hand-built signatures. Kept alongside the hand-rolled paths
    deliberately: the library owns amplification/probing internals,
    the custom keys expose them — an engine should offer both.
    Recall vs the exact top-k asserted in tests/test_recall.py."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("raw")
    )
    unit = (
        e.withColumn("n", _norm(F.col("raw")))
        .select(
            "vec_id",
            array_to_vector(
                F.transform("raw", lambda x: x / F.col("n"))
            ).alias("features"),
        )
        .localCheckpoint(eager=True)  # model fit + query + knn reuse it
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=0.5,  # ~unit-vector scale; knee of the recall curve
        numHashTables=4,
        seed=7,
    ).fit(unit)
    qv = unit.filter(F.col("vec_id") == QUERY_VEC_ID).collect()[0].features
    knn = model.approxNearestNeighbors(
        unit.filter(F.col("vec_id") != QUERY_VEC_ID), qv, TOP_K
    )
    return knn.select(
        "vec_id",
        F.round(1 - (F.col("distCol") * F.col("distCol")) / 2, 4).alias("cosine"),
    )


# --- product quantization ----------------------------------------------

_PQ_M = 8       # subvectors per vector (64-dim -> 8x8)
_PQ_K = 16      # centroids per sub-codebook (4-bit codes)
_PQ_ITERS = 2
_PQ_SHORTLIST = 50  # ADC candidates re-ranked exactly


def _pq_subvectors(unit: DataFrame, dim: int, m: int = _PQ_M) -> DataFrame:
    """(vec_id, v[dim]) -> (vec_id, sub, sv[dim/m]): slice every
    vector into m contiguous subvectors. One narrow pass; the
    (vec_id, sub) row key is what lets ALL m codebooks train in a
    single distributed aggregation instead of m sequential jobs."""
    d = dim // m
    return unit.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.slice("v", s * d + 1, d).alias("sv"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("x"),
    ).select("vec_id", F.col("x.sub").alias("sub"), F.col("x.sv").alias("sv"))


def _pq_assign(subs: DataFrame, codebooks: dict[int, list[list[float]]]) -> DataFrame:
    """(vec_id, sub, sv) -> (vec_id, sub, cell): nearest-centroid (L2)
    per subspace, model as broadcast DATA keyed on (sub, pos) — the
    same constant-compile-cost shape as assign_cells, with ||c||^2
    precomputed driver-side so the distributed side only needs the
    cross term (argmin ||x-c||^2 = argmin ||c||^2 - 2 x.c)."""
    spark = subs.sparkSession
    rows = [
        (s, ci, pos, float(mv))
        for s, cents in codebooks.items()
        for ci, c in enumerate(cents)
        for pos, mv in enumerate(c)
    ]
    cdf = spark.createDataFrame(rows, "sub int, cell int, pos int, m double")
    c2 = [
        (s, ci, float(sum(x * x for x in c)))
        for s, cents in codebooks.items()
        for ci, c in enumerate(cents)
    ]
    c2df = spark.createDataFrame(c2, "sub int, cell int, c2 double")
    ex = subs.select("vec_id", "sub", F.posexplode("sv").alias("pos", "x"))
    scores = (
        ex.join(F.broadcast(cdf), ["sub", "pos"])
        .groupBy("vec_id", "sub", "cell")
        .agg(F.sum(F.col("x") * F.col("m")).alias("dot"))
        .join(F.broadcast(c2df), ["sub", "cell"])
        .withColumn("dist2", F.col("c2") - 2 * F.col("dot"))
    )
    return (
        scores.groupBy("vec_id", "sub")
        .agg(F.min(F.struct(F.col("dist2"), F.col("cell"))).alias("b"))
        .select("vec_id", "sub", F.col("b.cell").alias("cell"))
    )


def train_pq_codebooks(
    unit: DataFrame,
    dim: int,
    m: int = _PQ_M,
    k: int = _PQ_K,
    iters: int = _PQ_ITERS,
    sample_target: int = _TRAIN_SAMPLE_TARGET,
) -> dict[int, list[list[float]]]:
    """All m sub-codebooks trained TOGETHER: the (vec_id, sub) keying
    makes each Lloyd pass one assignment aggregation + one
    (sub, cell, pos) mean aggregation for every codebook at once —
    m-way training parallelism for free instead of m driver-sequenced
    jobs. Same deterministic modulus sampling and smallest-id seeding
    as train_ivf_centroids; only the m*k*(dim/m) codebook matrix is
    ever collected."""
    n = unit.count()
    train = unit
    if sample_target and n > sample_target:
        mod = n // sample_target
        train = unit.filter((F.col("vec_id") % mod) == 0).localCheckpoint(eager=True)
    subs = _pq_subvectors(train, dim, m).localCheckpoint(eager=True)
    seed_rows = (
        subs.filter(F.col("vec_id").isin(
            [r.vec_id for r in train.orderBy("vec_id").limit(k).select("vec_id").collect()]
        ))
        .orderBy("vec_id")
        .collect()
    )
    codebooks: dict[int, list[list[float]]] = {s: [] for s in range(m)}
    for r in sorted(seed_rows, key=lambda r: (r.sub, r.vec_id)):
        if len(codebooks[r.sub]) < k:
            codebooks[r.sub].append(list(r.sv))
    for _ in range(iters):
        assigned = _pq_assign(subs, codebooks).join(subs, ["vec_id", "sub"])
        means = (
            assigned.select("sub", "cell", F.posexplode("sv").alias("pos", "x"))
            .groupBy("sub", "cell", "pos")
            .agg(F.avg("x").alias("mn"))
            .collect()
        )
        acc: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            acc.setdefault((r.sub, r.cell), {})[r.pos] = r.mn
        for (s, ci), comp in acc.items():
            codebooks[s][ci] = [comp[p] for p in range(len(comp))]
    return codebooks


@q("ann_pq")  # approximate: rows-only driver check + pytest recall test
def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN — the memory-bound scale path: every
    unit vector compresses to m={_PQ_M} 4-bit codes (16x smaller than
    float32, 32x smaller than the double working form), the query
    scores the WHOLE corpus from a broadcast m x k lookup table of
    precomputed subspace distances (ADC — one small-int join + sum,
    never touching raw vectors), and only the {_PQ_SHORTLIST}-row ADC
    shortlist is re-ranked with exact cosine against raw vectors.

    At 100 TB this is the decisive trade: the code table is ~2 bytes/
    vector so the ADC scan is RAM/cache-resident where raw vectors are
    not, and exact math is confined to shortlist-row lookups. On unit
    vectors L2 ordering IS cosine ordering (d^2 = 2 - 2cos), so the
    ADC shortlist chases the same neighbors as ann_cosine_topk;
    recall@10 vs that exact baseline is asserted in
    tests/test_recall.py."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("raw")
    )
    dim = len(e.select("raw").first().raw)
    unit = (
        e.withColumn("n", _norm(F.col("raw")))
        .select("vec_id", F.transform("raw", lambda x: x / F.col("n")).alias("v"))
        .localCheckpoint(eager=True)
    )
    codebooks = train_pq_codebooks(unit, dim)
    # encode the corpus: m 4-bit codes per vector (stored form)
    codes = _pq_assign(_pq_subvectors(unit, dim), codebooks).localCheckpoint(eager=True)

    qv = unit.filter(F.col("vec_id") == QUERY_VEC_ID).select("v").collect()[0].v
    d = dim // _PQ_M
    # ADC lookup table: ||q_s - c||^2 for every (sub, cell) — m*k
    # doubles computed driver-side from the model, broadcast as data
    lut = [
        (
            s,
            ci,
            float(sum((qv[s * d + p] - c[p]) ** 2 for p in range(d))),
        )
        for s, cents in codebooks.items()
        for ci, c in enumerate(cents)
    ]
    lutdf = spark.createDataFrame(lut, "sub int, cell int, dist double")
    shortlist = (
        codes.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(lutdf), ["sub", "cell"])
        .groupBy("vec_id")
        .agg(F.sum("dist").alias("adc"))
        .orderBy(F.asc("adc"), F.asc("vec_id"))
        .limit(_PQ_SHORTLIST)
    )
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    rerank = (
        unit.join(shortlist.select("vec_id"), "vec_id")
        .withColumn("cosine_raw", _dot(F.col("v"), qlit))
    )
    return (
        rerank.orderBy(F.desc("cosine_raw"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", F.round("cosine_raw", 4).alias("cosine"))
    )
