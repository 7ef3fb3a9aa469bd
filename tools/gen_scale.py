"""Deterministic scale-up generator: replicate an existing sf dir R
times (default 10 — sf0.1 -> an sf1-equivalent) so the 100 TB design
claims can be MEASURED instead of only plan-asserted (VERDICT r5 #1).

Replication is Spark-native (a union of R per-replica projections —
no driver loop over rows, no collect) and STRUCTURE-PRESERVING, which
is the part that matters for honest scaling numbers:

- fact tables (lineitem/orders/customer/events) shift their keys by a
  per-replica stride, so key cardinality grows linearly and per-key
  group sizes stay constant — the TPC-H scaling model;
- documents get a per-replica token salt (every non-space run suffixed
  ``_r{i}``; replica 0 is the original corpus verbatim). Token counts
  per doc are unchanged, but shingle sets across replicas are fully
  DISJOINT, so the near-dup pair/edge count grows linearly with the
  corpus instead of quadratically exploding on cross-replica
  self-matches — naive text replication would measure the blow-up of
  the generator, not the scaling of the operator. n_chars is
  recomputed to stay consistent with the salted text;
- embeddings get a per-replica circular rotation of the vector (norms
  and within-replica geometry exactly preserved; cross-replica cosines
  decorrelate), with vec_id strided and label kept, so ANN cell sizes
  scale linearly and recall structure per replica is identical; past
  ``dim`` replicas (where rotation wraps to identity) each replica
  additionally applies a deterministic hash-derived coordinate
  SIGN-FLIP pattern — same exactness properties, no wrap duplicates,
  so replicas is no longer capped at dim (round 10, for the 100x
  uniform corpus);
- dimension tables (region/nation/part/supplier) are copied verbatim —
  dims grow sublinearly in real deployments, and keeping them fixed
  makes fact-side per-key densities grow, the conservative direction
  for join/agg scaling.

Everything is a deterministic column expression (no rand), so two runs
produce identical ROW CONTENT (parquet part filenames embed writer
UUIDs, so files are not byte-identical) and probe timings are
reproducible.

``--skew`` (VERDICT r6 #4) layers deterministic ADVERSARIAL skew on
top of the same replication, producing the hostile-key-distribution
twin of the uniform scale-up (out dir default scale_data/sf1skew):

- fact keys go zipf(1): orders.o_custkey and events.user_id are
  remapped to ``floor(n_keys ** u)`` with ``u`` a per-row hash uniform
  in (0,1) — frequency of rank k is ~1/k, so key 1 alone carries
  ~1/ln(n) of the fact table (hot-key joins, hot window partitions);
- one hot near-dup FAMILY: 1-in-20 documents (by doc_id hash, across
  ALL replicas — deliberately unsalted) become one shared 30-word
  template plus a tiny per-doc unique tail, so ~5% of the corpus is
  pairwise near-identical: the hot shingles' document frequency is
  ~corpus/20 (the exact hazard the shingle-df audit warns about) and
  the minhash/simhash buckets for the family blow past BUCKET_CAP;
- one DENSE embedding cluster: 1-in-4 vectors are pulled toward a
  fixed direction (0.2*v + 0.8*ones/dim before normalization), giving
  pairwise cosines ~0.95 — one hot IVF cell family and a dense
  semantic-dedup block.

All transforms are hash-derived column expressions — deterministic,
no RNG, same reproducibility contract as the uniform generator.

``--clustered`` (VERDICT r7 #5) replaces the embedding distribution
with the regime IVF actually assumes: EVERY vector is pulled toward
one of ``_N_PLANTED`` planted unit directions (coordinate basis
vectors — exactly orthogonal, so inter-cluster cosine ~ 0 while
within-cluster cosine ~ 0.94), cluster assigned by vec_id hash. The
previous recall floors were pinned either on isotropic corpora (no
structure — recall necessarily tracks the probed fraction) or a
24 %-cluster skew corpus; this mode produces a FULLY clustered corpus
at scale so recall_probe can measure the clustered-regime floor at
>= 20 k vectors. Only the embeddings table differs from the uniform
scale-up; mutually exclusive with --skew (one adversary per corpus,
or the measurement explains nothing).

Usage: python tools/gen_scale.py [--base /root/testdata/sf0.1]
           [--out scale_data/sf1] [--replicas 10] [--skew|--clustered]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COPY_TABLES = ("region", "nation", "part", "supplier")


def _stride(df: DataFrame, key: str) -> int:
    """Replica key offset: one above the max existing id, so replica
    key ranges never collide and replica 0 keeps the original ids."""
    return int(df.agg(F.max(key)).collect()[0][0]) + 1


def _union_replicas(base: DataFrame, r: int, project) -> DataFrame:
    return functools.reduce(
        DataFrame.unionByName, [project(base, i) for i in range(r)]
    )


def _zipf_key(src: F.Column, n_keys: int) -> F.Column:
    """Deterministic zipf(1) rank in [1, n_keys]: u = hash-uniform in
    (0,1), rank = floor(n^u) — log-uniform ranks, frequency ~ 1/k."""
    u = (F.pmod(F.xxhash64(src), F.lit(1_000_000)) + 0.5) / 1_000_000.0
    return F.least(
        F.lit(n_keys).cast("bigint"),
        F.floor(F.pow(F.lit(float(n_keys)), u)).cast("bigint"),
    )


# the hot near-dup template: 30 shared words -> 28 shared 3-gram
# shingles per hot doc, document frequency ~ corpus/20
_HOT_TEMPLATE = (
    "this content is provided as is without warranty of any kind either "
    "express or implied including but not limited to fitness for a "
    "particular purpose and"
)

# planted cluster count for --clustered: <= embedding dim (centers are
# coordinate basis vectors, pairwise-orthogonal by construction); 48
# of 64 keeps centers exactly orthogonal while giving ~n/48 members
# per cluster (~417 at sf1 — far above KNN_K, the regime where a
# query's true neighbors all share its cluster)
_N_PLANTED = 48


def clustered_pull(vec: F.Column, new_id: F.Column, n_planted: int) -> F.Column:
    """The --clustered embedding transform, factored out so its
    adversary PROPERTIES are pytest-pinned (round-7 rule: validate
    generator adversaries black-box before trusting probe conclusions
    — the r6 dense-cluster pull was silently fake). Every vector is
    pulled toward its planted basis direction e_c (c = vec_id hash mod
    n_planted): v = 0.2*x + 0.8*e_c. |v|^2 ~ 0.68, so within-cluster
    cos ~ 0.64/0.68 ~ 0.94 and inter-cluster cos ~ 0.04*x.y/0.68 ~ 0
    (centers exactly orthogonal). A pure column expression —
    deterministic, no RNG, like every other generator transform."""
    cid = F.pmod(F.xxhash64(new_id), F.lit(n_planted))
    return F.transform(
        vec,
        lambda x, i: (
            x * 0.2 + F.when(i == cid, F.lit(0.8)).otherwise(F.lit(0.0))
        ).cast("float"),
    )


def generate(
    spark: SparkSession,
    base_dir: str,
    out_dir: str,
    replicas: int,
    skew: bool = False,
    clustered: bool = False,
) -> None:
    if skew and clustered:
        raise ValueError(
            "--skew and --clustered are mutually exclusive: one "
            "adversarial distribution per corpus, or the probe cannot "
            "attribute what it measures"
        )
    base = Path(base_dir)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rd = lambda t: spark.read.parquet(str(base / f"{t}.parquet"))  # noqa: E731
    wr = lambda df, t, parts: df.repartition(parts).write.mode(  # noqa: E731
        "overwrite"
    ).parquet(str(out / f"{t}.parquet"))

    # validate replicas against the embedding dim BEFORE writing any
    # table (ADVICE r7): the rotation-wrap refusal used to fire only
    # when the embeddings table was reached, after six tables had
    # already been written — leaving a partially generated out dir
    dim = len(rd("embeddings").select("embedding").first()[0])
    # Rotation is circular, so replica i and i+dim would carry
    # byte-identical vectors — cross-replica EXACT duplicates that
    # quadratically inflate ANN/dedup pair counts (the probe would
    # measure the generator's blow-up, not the operator's scaling;
    # ADVICE r6 #2 — this used to be a hard refusal at replicas > dim).
    # Round 10 (VERDICT r9 #7 needs a 100-replica uniform corpus):
    # replicas past the rotation period compose a SECOND transform — a
    # deterministic per-replica coordinate sign-flip pattern
    # (xxhash64(replica, position) parity). Sign flips preserve norms
    # and all WITHIN-replica pairwise dots exactly (s_p^2 = 1), while
    # two replicas sharing a rotation class differ by an independent
    # 64-bit pattern, so their cross cosines are a random signed sum
    # ~N(0, sum v_p^4) instead of 1. Replicas < dim keep the original
    # rotation-only form — existing corpora regenerate bit-identically.

    for t in COPY_TABLES:
        rd(t).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
        print(f"[gen_scale] copied {t}")

    cust = rd("customer")
    cust_stride = _stride(cust, "c_custkey")
    wr(
        _union_replicas(
            cust,
            replicas,
            lambda d, i: d.withColumn(
                "c_custkey", F.col("c_custkey") + F.lit(i * cust_stride)
            ),
        ),
        "customer",
        4,
    )
    print(f"[gen_scale] customer x{replicas} (stride {cust_stride})")

    orders = rd("orders")
    okey_stride = _stride(orders, "o_orderkey")
    orders_big = _union_replicas(
        orders,
        replicas,
        lambda d, i: d.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * okey_stride)
        ).withColumn("o_custkey", F.col("o_custkey") + F.lit(i * cust_stride)),
    )
    if skew:
        # zipf the FK side only: o_orderkey keeps its stride (lineitem
        # FK integrity), o_custkey concentrates on low ranks
        orders_big = orders_big.withColumn(
            "o_custkey", _zipf_key(F.col("o_orderkey"), cust_stride * replicas)
        )
    wr(orders_big, "orders", 8)
    print(f"[gen_scale] orders x{replicas} (stride {okey_stride}, skew={skew})")

    wr(
        _union_replicas(
            rd("lineitem"),
            replicas,
            lambda d, i: d.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * okey_stride)
            ),
        ),
        "lineitem",
        32,
    )
    print(f"[gen_scale] lineitem x{replicas}")

    ev = rd("events")
    ev_stride = _stride(ev, "event_id")
    user_stride = _stride(ev, "user_id")
    ev_big = _union_replicas(
        ev,
        replicas,
        lambda d, i: d.withColumn(
            "event_id", F.col("event_id") + F.lit(i * ev_stride)
        ).withColumn("user_id", F.col("user_id") + F.lit(i * user_stride)),
    )
    if skew:
        # hot users: sessionize/window state concentrates on rank 1
        ev_big = ev_big.withColumn(
            "user_id", _zipf_key(F.col("event_id"), user_stride * replicas)
        )
    wr(ev_big, "events", 8)
    print(f"[gen_scale] events x{replicas} (skew={skew})")

    docs = rd("documents")
    doc_stride = _stride(docs, "doc_id")

    def doc_replica(d: DataFrame, i: int) -> DataFrame:
        text = (
            F.col("text")
            if i == 0
            else F.regexp_replace("text", r"(\S+)", rf"$1_r{i}")
        )
        new_id = F.col("doc_id") + F.lit(i * doc_stride)
        if skew:
            # hot family by FINAL doc_id, template deliberately
            # UNSALTED: members share it across replicas, so the hot
            # shingles' df grows with the corpus — the adversarial
            # case BUCKET_CAP and the df audit exist for. The per-doc
            # tail keeps members near- (not exact-) duplicates.
            text = F.when(
                F.pmod(F.xxhash64(new_id), F.lit(20)) == 0,
                F.concat(
                    F.lit(_HOT_TEMPLATE),
                    F.lit(" tail"),
                    new_id.cast("string"),
                    F.lit(" t"),
                    new_id.cast("string"),
                    F.lit(" end"),
                ),
            ).otherwise(text)
        return d.select(
            new_id.alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
        ).withColumn("n_chars", F.length("text"))

    wr(_union_replicas(docs, replicas, doc_replica), "documents", 8)
    print(f"[gen_scale] documents x{replicas} (token-salted, skew={skew})")

    emb = rd("embeddings")
    vec_stride = _stride(emb, "vec_id")

    def emb_replica(d: DataFrame, i: int) -> DataFrame:
        rot = i % dim
        vec = (
            F.col("embedding")
            if rot == 0
            else F.concat(
                F.slice("embedding", rot + 1, dim - rot),
                F.slice("embedding", 1, rot),
            )
        )
        if i >= dim:
            # past the rotation period: compose the per-replica sign
            # flip (see the dim note above) so wrapped replicas are
            # decorrelated instead of exact duplicates
            vec = F.transform(
                vec,
                lambda x, pos: F.when(
                    F.pmod(F.xxhash64(F.lit(i), pos), F.lit(2)) == 1, -x
                )
                .otherwise(x)
                .cast("float"),
            )
        new_id = F.col("vec_id") + F.lit(i * vec_stride)
        if skew:
            # dense cluster: 1-in-4 vectors pulled toward the all-ones
            # DIRECTION: v = 0.2*x + 0.8*(1/sqrt(dim))*ones. Source
            # embeddings are zero-centered unit vectors, so pairwise
            # cos among pulled ~ 0.8^2/(0.2^2+0.8^2) ~ 0.94 — one hot
            # cell family for the IVF quantizer and a dense block for
            # semantic dedup. (0.8/dim — a constant, not the unit
            # direction — gave cos ~0.2: no adversary at all.)
            vec = F.when(
                F.pmod(F.xxhash64(new_id), F.lit(4)) == 0,
                F.transform(
                    vec, lambda x: (x * 0.2 + 0.8 * dim**-0.5).cast("float")
                ),
            ).otherwise(vec)
        if clustered:
            # the fully clustered regime: see clustered_pull above
            # (properties pinned in tests/test_gen_scale_adversaries.py)
            vec = clustered_pull(vec, new_id, _N_PLANTED)
        return d.select(
            new_id.alias("vec_id"),
            vec.alias("embedding"),
            "label",
        )

    wr(_union_replicas(emb, replicas, emb_replica), "embeddings", 4)
    print(f"[gen_scale] embeddings x{replicas} (rotated, dim={dim}, skew={skew})")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--skew", action="store_true")
    ap.add_argument("--clustered", action="store_true")
    args = ap.parse_args()
    if args.out is None:
        name = "sf1skew" if args.skew else (
            "sf1clustered" if args.clustered else "sf1"
        )
        args.out = str(Path(__file__).resolve().parents[1] / "scale_data" / name)

    from big_data_analysis_project_spark.session import get_spark

    spark = get_spark(app_name="gen-scale", master="local[32]")
    t0 = time.perf_counter()
    generate(spark, args.base, args.out, args.replicas, skew=args.skew,
             clustered=args.clustered)
    print(f"[gen_scale] done in {time.perf_counter() - t0:.1f}s -> {args.out}")


if __name__ == "__main__":
    main()
