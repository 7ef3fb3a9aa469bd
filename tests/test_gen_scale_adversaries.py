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


def test_wrapped_replica_sign_flip_decorrelates(spark, tmp_path):
    """Round 10 (the 100-replica uniform corpus for VERDICT r9 #7):
    past dim replicas the circular rotation wraps to identity, and
    replica i and i+dim used to be refused because they would carry
    byte-identical vectors (cross-replica exact duplicates — the probe
    would measure the generator's blow-up). The composed per-replica
    sign-flip must (a) preserve every norm and all WITHIN-replica
    pairwise dots exactly — sign flips square away — and (b)
    decorrelate wrapped pairs: at dim=64 a random flip pattern zeroes
    the expected cross cosine with std ~ sqrt(sum v_p^4) ~ 1/8, so the
    systematic wrap-twin population must sit near 0, never near 1.
    Measured black-box on the generator's actual output over the REAL
    dim-64 sf0.001 base (500 vectors x 66 replicas — the first two
    wrapped rotation classes)."""
    import shutil

    from gen_scale import generate

    src = Path("/root/testdata/sf0.001")
    (tmp_path / "base").mkdir()
    for t in (
        "region", "nation", "part", "supplier", "customer", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        p = src / f"{t}.parquet"
        if p.is_dir():
            shutil.copytree(p, tmp_path / "base" / f"{t}.parquet")
        else:
            shutil.copy(p, tmp_path / "base" / f"{t}.parquet")

    dim, n = 64, 500
    replicas = dim + 2  # replicas 64,65 share rotations 0,1 — wrapped
    generate(spark, str(tmp_path / "base"), str(tmp_path / "out"), replicas)
    emb = spark.read.parquet(str(tmp_path / "out/embeddings.parquet"))
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    assert len(x) == n * replicas

    base = x[:n]  # replica 0 is verbatim
    # (a) norms preserved across every replica (same multiset per block)
    base_norms = np.sort(np.linalg.norm(base, axis=1))
    for i in (1, dim - 1, dim, dim + 1):
        blk = np.linalg.norm(x[i * n : (i + 1) * n], axis=1)
        assert np.allclose(np.sort(blk), base_norms, atol=1e-5)
    # within-replica pairwise dots preserved for a wrapped replica
    wrapped = x[dim * n : (dim + 1) * n]  # replica 64: rotation 0 + flips
    assert np.allclose(base @ base.T, wrapped @ wrapped.T, atol=1e-4)
    # (b) wrap twins decorrelated: same source vector in replica 0 vs
    # 64 — the pairs that were EXACT duplicates before the fix. The
    # whole population must hug 0 (|mean| small, max far from 1).
    un = base / np.linalg.norm(base, axis=1, keepdims=True)
    uw = wrapped / np.linalg.norm(wrapped, axis=1, keepdims=True)
    diag = np.einsum("ij,ij->i", un, uw)
    assert np.max(np.abs(diag)) < 0.75, f"wrap twin cos {np.max(np.abs(diag))}"
    assert abs(float(np.mean(diag))) < 0.1, f"wrap twin mean {np.mean(diag)}"
    # replicas below dim regenerate bit-identically to the old
    # rotation-only form: replica 1 is an exact rotation of the base
    rot1 = x[n : 2 * n]
    assert np.allclose(np.roll(base, -1, axis=1), rot1, atol=1e-7)
