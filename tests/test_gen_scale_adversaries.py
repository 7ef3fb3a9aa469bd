"""Black-box property pins for the scale-generator adversaries.

Round-7 rule (learned the hard way: the round-6 "dense cluster" pull
was silently fake — cos ~0.2 instead of ~0.94 — and the skew probe
validated against no adversary at all): a generated adversary's
DEFINING PROPERTY must be measured on the generator's actual output,
not assumed from its formula. These tests pin the --clustered
transform the round-8 recall row depends on; if someone retunes the
pull strength or cluster count, the probe's premise breaks here first,
not three rounds later in an unexplained recall table.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from gen_scale import _N_PLANTED, clustered_pull  # noqa: E402
from gen_big_embeddings import gen_embeddings  # noqa: E402


def test_clustered_pull_properties(spark):
    """Within-cluster cosine high (>= 0.85), cross-cluster low
    (<= 0.35), every planted direction populated — measured on the
    transform's actual output over hash-pseudorandom base vectors,
    exactly how the sf1clustered corpus is produced."""
    n, dim = 1200, 64
    # zero-centered hash coordinates (no lattice period — the round-8
    # lesson from the degenerate mod-97 test corpus), scaled so the
    # vector norm is ~1 like the real corpus's unit embeddings: the
    # pull contract (0.2*x + 0.8*e_c dominates) assumes |x| ~ 1, and
    # uniform[-1,1] coords give |x| ~ sqrt(dim/3) ~ 4.6, which would
    # swamp the pull — the property being pinned is ABOUT that ratio
    scale = 1000.0 * (dim / 3.0) ** 0.5
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda p: (
                (F.pmod(F.xxhash64(F.col("id"), p), F.lit(2001)) - 1000)
                / scale
            ).cast("float"),
        ).alias("embedding"),
    )
    pulled = base.select(
        "vec_id",
        clustered_pull(F.col("embedding"), F.col("vec_id"), _N_PLANTED).alias(
            "v"
        ),
    )
    rows = sorted(pulled.collect(), key=lambda r: r.vec_id)
    x = np.asarray([r.v for r in rows], dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    # cluster id recovered black-box from the data itself (argmax
    # coordinate), NOT from re-deriving the generator's hash — the
    # validation must not share code with the thing it validates
    cid = np.argmax(x, axis=1)
    assert len(set(cid.tolist())) == _N_PLANTED  # every cluster populated
    s = x @ x.T
    same = s[(cid[:, None] == cid[None, :]) & ~np.eye(len(x), dtype=bool)]
    diff = s[cid[:, None] != cid[None, :]]
    assert same.min() >= 0.85, f"within-cluster cos min {same.min():.3f}"
    assert abs(diff.mean()) <= 0.05, f"cross-cluster cos mean {diff.mean():.3f}"
    assert diff.max() <= 0.35, f"cross-cluster cos max {diff.max():.3f}"


def test_clustered_pull_deterministic(spark):
    """Same corpus, two evaluations -> identical vectors (pure column
    expression, no RNG — the generator's reproducibility contract)."""
    base = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda p: (
                (F.pmod(F.xxhash64(F.col("id"), p), F.lit(101)) - 50) / 50.0
            ).cast("float"),
        ).alias("embedding"),
    )
    pull = lambda: sorted(  # noqa: E731
        base.select(
            "vec_id",
            clustered_pull(F.col("embedding"), F.col("vec_id"), 8).alias("v"),
        ).collect(),
        key=lambda r: r.vec_id,
    )
    a, b = pull(), pull()
    assert [r.v for r in a] == [r.v for r in b]


def test_gen_big_embeddings_properties(spark, tmp_path):
    """The round-9 natural-scale generator (hash-fresh vectors, not
    rotation replicas) must exhibit the SAME validated clustered
    geometry as gen_scale --clustered: high within-cluster cosine,
    ~orthogonal cross-cluster, every cluster populated, no duplicate
    vectors (the rotation-wrap/lattice failure classes), and be
    deterministic. Pinned at small n — the 1.7 M / 200 k corpora the
    natural-handoff and sf10clustered measurements used are this
    generator at bigger --n."""
    import pyspark.sql.functions as SF

    out = str(tmp_path / "bigemb")
    gen_embeddings(spark, n=3000, n_clusters=16, out_dir=out)
    df = spark.read.parquet(f"{out}/embeddings.parquet")
    rows = sorted(df.collect(), key=lambda r: r.vec_id)
    x = np.asarray([r.embedding for r in rows], dtype=np.float64)
    lab = np.asarray([r.label for r in rows])
    assert len(np.unique(x.round(6), axis=0)) == len(x)  # no duplicates
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    # cluster id recovered black-box (argmax coordinate), not from the
    # generator's own hash
    cid = np.argmax(xn, axis=1)
    assert len(set(lab.tolist())) == 16  # every cluster populated
    s = xn @ xn.T
    same = s[(cid[:, None] == cid[None, :]) & ~np.eye(len(x), dtype=bool)]
    diff = s[cid[:, None] != cid[None, :]]
    assert same.min() >= 0.85, f"within-cluster cos min {same.min():.3f}"
    assert abs(diff.mean()) <= 0.05, f"cross-cluster cos mean {diff.mean():.3f}"
    # determinism: regenerate into a second dir, identical content
    out2 = str(tmp_path / "bigemb2")
    gen_embeddings(spark, n=3000, n_clusters=16, out_dir=out2)
    rows2 = sorted(
        spark.read.parquet(f"{out2}/embeddings.parquet").collect(),
        key=lambda r: r.vec_id,
    )
    assert [r.embedding for r in rows] == [r.embedding for r in rows2]
    # guard: cluster directions are coordinate axes, so > DIM refuses
    import pytest

    with pytest.raises(ValueError, match="one-hot"):
        gen_embeddings(spark, n=10, n_clusters=65, out_dir=str(tmp_path / "x"))
