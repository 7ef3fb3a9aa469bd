"""Generate an embeddings-ONLY corpus big enough that the MLlib
quantizer handoff fires at its NATURAL threshold (VERDICT r8 #4).

``batch_centroids_cached`` hands training to the distributed trainer
when the driver sample a k-cell model needs exceeds the 50 k cap:
4 points/cell * k > 50_000  =>  k > 12_500  =>  n > 12_500 * 125
(BATCH_CELL_TARGET) = 1.5625 M vectors. Every prior measurement FORCED
the handoff with SPARK_GRAFT_DRIVER_SAMPLE_CAP because the probe
corpora topped out at 60 k vectors; this tool writes a 1.7 M-vector
corpus (defaults) where the cap fires on its own.

Why not ``gen_scale.py``: its embedding scaling is a circular
coordinate rotation of the 2 000-vector base, which wraps to identity
at ``replicas > dim=64`` — 128 k vectors max before cross-replica
exact duplicates corrupt the measurement (the rotation-wrap refusal).
This tool synthesizes fresh vectors instead, with the SAME validated
clustered geometry as ``gen_scale --clustered`` (the regime IVF
assumes): unit noise pulled 0.8 toward one of ``--clusters`` one-hot
directions, within-cluster cosine ~0.94, cross-cluster ~0 — the
black-box properties pinned for the sf*clustered corpora in
tests/test_gen_scale_adversaries.py.

Determinism, no RNG: every coordinate derives from
xxhash64(vec_id, coordinate_salt) — uniform over any id set (the
round-8 postmortem showed (id*p mod small_prime) lattices collapse to
~31 distinct vectors; hashes don't), reproducible bit-for-bit.

Writes ONLY embeddings.parquet: the quantizer probe consumes nothing
else, and the other nine tables at this scale would cost ~10 GB of
disk for zero measurement value. Registry keys that need the full
table set refuse on the missing files loudly, not silently.

    python tools/gen_big_embeddings.py [--n 1700000] [--out ...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DIM = 64


def gen_embeddings(spark, n: int, n_clusters: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    if not (0 < n_clusters <= DIM):
        raise ValueError(
            f"n_clusters={n_clusters} must be in (0, {DIM}]: cluster "
            "directions are one-hot coordinate axes"
        )
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    # raw noise: one xxhash64 per coordinate, scaled to [-1, 1)
    raw = F.array(
        *[
            (
                F.xxhash64(F.col("vec_id"), F.lit(100 + j)).cast("double")
                / F.lit(float(2**63))
            )
            for j in range(DIM)
        ]
    )
    df = base.withColumn("u", raw).withColumn(
        "cid", F.pmod(F.xxhash64(F.col("vec_id"), F.lit(1)), F.lit(n_clusters))
    )
    # normalize the noise, then pull 0.8 toward the cluster's one-hot
    # axis — identical geometry to gen_scale._cluster_pull, validated
    # black-box at ~0.94 within-cluster cosine
    nrm = F.sqrt(
        F.aggregate(
            F.transform("u", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    df = df.withColumn(
        "embedding",
        F.transform(
            F.col("u"),
            lambda x, i: (
                x / nrm * 0.2
                + F.when(i == F.col("cid"), F.lit(0.8)).otherwise(F.lit(0.0))
            ).cast("float"),
        ),
    ).select("vec_id", "embedding", F.col("cid").cast("int").alias("label"))
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    df.repartition(32).write.mode("overwrite").parquet(
        str(out / "embeddings.parquet")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_700_000)
    ap.add_argument("--clusters", type=int, default=64)
    ap.add_argument("--out", default=str(REPO / "scale_data" / "big_emb"))
    args = ap.parse_args()

    from big_data_analysis_project_spark.session import get_spark

    spark = get_spark(app_name="gen-big-embeddings", master="local[32]")
    t0 = time.perf_counter()
    gen_embeddings(spark, args.n, args.clusters, args.out)
    print(
        f"[gen_big_emb] {args.n} vectors x dim {DIM}, "
        f"{args.clusters} clusters in {time.perf_counter() - t0:.1f}s "
        f"-> {args.out}"
    )


if __name__ == "__main__":
    main()
