"""Deduplication operators over the documents table (Phase E).

Five families, all shuffle-conscious:

* exact        — hash groupBy on the full text (one shuffle on text).
* ngram_jaccard— exact near-dup: word-3-gram shingles, shingle-join,
                 Jaccard >= threshold. Quadratic in the worst case;
                 kept exact here because it is the ORACLE for the
                 approximate families below. At 100 TB you run minhash
                 first and this only on candidate pairs.
* minhash_lsh  — MinHash signatures (64 perms) + LSH banding (16x4):
                 candidates are pairs sharing a band bucket, then
                 verified with exact Jaccard. The scale path: cost is
                 O(docs x shingles) + a join keyed on band buckets —
                 no all-pairs shuffle.
* simhash      — 64-bit SimHash with 4-chunk banding for hamming<=k
                 candidate generation.
* embedding    — cosine near-dup within a blocking key (label), the
                 embedding analogue of exact near-dup.

minhash/simhash have no DuckDB oracle (hash functions aren't portable
SQL); they get rows-only driver checks plus pytest recall tests
against the exact-Jaccard oracle at sf0.001.
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


NGRAM = 3
JACCARD_THRESHOLD = 0.5

# deterministic MinHash permutation parameters (fixed LCG, seed 42 —
# no runtime RNG so every run and every test sees the same family).
# Universe prime 2^31-1: with h reduced mod p first, a*h + b stays
# under 2^62 — no int64 overflow under Spark's ANSI arithmetic.
_PRIME = (1 << 31) - 1


def _lcg_params(n: int, seed: int = 42) -> list[tuple[int, int]]:
    state = seed
    out = []
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (_PRIME - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _PRIME
        out.append((a, b))
    return out


N_PERMS = 64
N_BANDS = 16  # rows per band = 4  ->  ~(1/16)^(1/4) = s-curve knee near 0.5
_PERMS = _lcg_params(N_PERMS)


def _shingles(docs: DataFrame) -> DataFrame:
    """doc_id -> exploded distinct word-NGRAM shingles (1-based
    element_at to mirror the oracle's 1-based list indexing)."""
    words = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), "\\s+").alias("w")
    ).filter(F.size("w") >= NGRAM)
    shingle_arr = F.transform(
        F.sequence(F.lit(1), F.size("w") - (NGRAM - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at("w", (i + k).cast("int")) for k in range(NGRAM)]
        ),
    )
    return (
        words.select("doc_id", F.explode(shingle_arr).alias("s"))
        .distinct()
    )


_NGRAM_ORACLE = f"""
WITH words AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM words, LATERAL unnest(range(1, len(w) - {NGRAM - 2})) AS t(i)
  WHERE len(w) >= {NGRAM}
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
"""


@q(
    "dedup_exact",
    """SELECT keep_id, n_copies FROM (
         SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         FROM documents GROUP BY md5(text)
       )""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on a content hash, keep the smallest id.
    Hashing first means the shuffle key is 32 bytes instead of the
    full document — the 100 TB version of GROUP BY text."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.encode(F.col("text"), "UTF-8")).alias("h"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
    )


@q("dedup_ngram_jaccard", _NGRAM_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (shingle inverted-index
    join, not an all-pairs cross join: pairs only materialize where a
    shingle is shared)."""
    sh = _shingles(load_table(spark, sf_dir, "documents"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id -> array<long> MinHash signature (N_PERMS universal
    hashes over crc32(shingle), min per permutation — one aggregation
    pass, signature is 64x8 bytes per doc regardless of doc size)."""
    sh = _shingles(docs).withColumn("h", F.crc32("s") % F.lit(_PRIME))
    mins = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_PRIME)).alias(f"m{i}")
        for i, (a, b) in enumerate(_PERMS)
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[f"m{i}" for i in range(N_PERMS)]).alias("signature")
    )


@q("dedup_minhash_lsh")  # no portable-SQL oracle: rows-only check + pytest recall test
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup pairs, verified with exact
    Jaccard. Pipeline: shingle -> crc32 -> 64 min-hashes -> 16 band
    keys -> self-join on (band_idx, band_hash) -> exact verify.

    Scale: the only joins are keyed on band buckets (collision sets),
    so the shuffle volume is O(candidates), not O(n^2). Skewed buckets
    (boilerplate docs) are handled by AQE skew-join; a bucket-size cap
    is the standard extra guard if needed."""
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)
    rows_per_band = N_PERMS // N_BANDS
    band_entries = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.hash(F.slice("signature", bi * rows_per_band + 1, rows_per_band)).alias(
                            "bucket"
                        ),
                    )
                    for bi in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = band_entries.alias("a")
    b = band_entries.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact-Jaccard verification restricted to candidates
    sh = _shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "s")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def simhash_fingerprints(docs: DataFrame, bits: int = 64) -> DataFrame:
    """doc_id -> simhash long: per-bit majority vote over crc32 token
    hashes, all as JVM aggregate expressions (no UDF)."""
    tokens = (
        docs.select("doc_id", F.explode(F.split(F.lower(F.trim("text")), "\\s+")).alias("t"))
        .filter(F.col("t") != "")
        .withColumn("h", F.crc32("t"))
    )
    bit_votes = [
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(
            f"b{i}"
        )
        for i in range(bits)
    ]
    votes = tokens.groupBy("doc_id").agg(*bit_votes)
    fp: Column = F.lit(0).cast("long")
    for i in range(bits - 1):  # bit 63 left clear: keep the long positive
        fp = fp + F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (1 << i)).otherwise(0)
    return votes.select("doc_id", fp.alias("simhash"))


@q("dedup_simhash")  # no portable-SQL oracle: rows-only check + pytest
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprints, 4-chunk banding
    (hamming<=3 guarantees a shared chunk by pigeonhole), verified by
    exact hamming distance <= 3."""
    docs = load_table(spark, sf_dir, "documents")
    fp = simhash_fingerprints(docs)
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("chunk"),
                        F.shiftright(F.col("simhash"), ci * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for ci in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk", "cc.val")
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


@q(
    "dedup_embedding",
    """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cosine
       FROM embeddings a JOIN embeddings b
         ON a.label = b.label AND a.vec_id < b.vec_id
       WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.3""",
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key (label).
    Blocking turns the all-pairs O(n^2) into sum over blocks — the
    same role LSH plays for text; at 100 TB the blocking key comes
    from an ANN index (see similarity_q.ann_lsh_bucketed).

    Threshold 0.3 (not the usual ~0.9): the synthetic embeddings'
    max in-label cosine is ~0.47, so a 0.9 cut returns zero rows on
    both engines and verifies nothing (VERDICT r1 #3). 0.3 keeps the
    cosine + blocking logic genuinely exercised by the oracle."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("la"), F.col("v").alias("va")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"), F.col("v").alias("vb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    cos = dot / (norm(F.col("va")) * norm(F.col("vb")))
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cosine_raw", cos)
        .filter(F.col("cosine_raw") >= 0.3)
        .select("vec_a", "vec_b", F.round("cosine_raw", 4).alias("cosine"))
    )
