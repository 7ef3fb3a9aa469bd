"""batch_centroids_cached contract (round 6): the batch-consumer
quantizer must be BIT-IDENTICAL to the shared fixed-k model at every
driver-checked scale (<= BATCH_CELL_TARGET * N_CENTROIDS vectors) and
grow its cell count in proportion to the corpus above that — the
measured linearity lever of BENCH_SCALE.md."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_project_spark.registry.similarity_q import (
    BATCH_CELL_TARGET,
    N_CENTROIDS,
    batch_centroids_cached,
    ivf_centroids_cached,
)


def _write_embeddings(spark, path, n, dim=8):
    spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            # +1 keeps every vector nonzero (a zero vector has no unit
            # form and ANSI division errors on the normalize)
            lambda p: ((F.pmod(F.col("id") * p, F.lit(97)) + 1) / 98.0).cast(
                "float"
            ),
        ).alias("embedding"),
        F.lit(0).alias("label"),
    ).write.mode("overwrite").parquet(str(path / "embeddings.parquet"))


def test_delegates_to_shared_model_at_driver_scales(spark, tmp_path):
    _write_embeddings(spark, tmp_path, 400)
    got = batch_centroids_cached(spark, str(tmp_path))
    shared = ivf_centroids_cached(spark, str(tmp_path))
    assert got == shared  # same object contract: k == N_CENTROIDS
    assert len(got) == N_CENTROIDS


def test_cells_grow_with_corpus(spark, tmp_path):
    n = BATCH_CELL_TARGET * N_CENTROIDS + 1000  # past the delegation bound
    _write_embeddings(spark, tmp_path, n)
    got = batch_centroids_cached(spark, str(tmp_path))
    assert len(got) == max(N_CENTROIDS, round(n / BATCH_CELL_TARGET))
    assert len(got) > N_CENTROIDS
    # deterministic: a second call returns the memoized identical model
    assert batch_centroids_cached(spark, str(tmp_path)) == got


def test_mllib_path_engages_past_driver_cap(spark, tmp_path, monkeypatch):
    """VERDICT r6 #2: past _DRIVER_SAMPLE_CAP the quantizer trains
    DISTRIBUTED (MLlib KMeans) behind the same interface. Cap lowered
    so the handoff fires at test scale; the returned model must honor
    the full model contract (k cells, unit-sphere centers, sorted for
    stable cell ids, memo-stable)."""
    import big_data_analysis_project_spark.registry.similarity_q as S

    n = BATCH_CELL_TARGET * N_CENTROIDS + 1000
    k = round(n / BATCH_CELL_TARGET)
    _write_embeddings(spark, tmp_path, n)
    monkeypatch.setattr(S, "_DRIVER_SAMPLE_CAP", 4 * k - 1)
    got = S.batch_centroids_cached(spark, str(tmp_path))
    assert len(got) == k
    for c in got:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-9  # unit sphere
    assert got == sorted(got)  # init-order-independent cell ids
    assert S.batch_centroids_cached(spark, str(tmp_path)) == got


def test_mllib_retrain_deterministic_across_input_partitioning(spark, tmp_path):
    """ADVICE r7 + r8, made load-bearing r10 (VERDICT r9 #3):
    k-means|| init samples per partition IN ROW ORDER with per-
    partition RNG, so seed alone pins the model only given identical
    partitioning AND identical intra-partition order. The trainer
    hash-repartitions by vec_id (pins membership) and
    sortWithinPartitions by vec_id (pins order) before the fit, so the
    same corpus arriving with ANY upstream split count or row order
    must train the IDENTICAL model.

    Construction notes (what it took to make the sort load-bearing):
    (a) the corpus is isotropic xxhash vectors, not the periodic
    (id*p mod 97) lattice — on ~97 distinct duplicated vectors every
    init converges to the same optimum and nothing can fail (the r8
    degenerate-corpus lesson applies to determinism tests too);
    (b) a bare ``orderBy`` upstream of the trainer is NOT a
    perturbation — Catalyst's EliminateSorts drops a sort feeding a
    repartition, so the physical plan never sees it; checkpointing
    AFTER the orderBy materializes the permuted order so the
    trainer's own shuffle reads physically reordered blocks, the
    local-mode stand-in for a real cluster's nondeterministic
    shuffle-fetch interleaving. Verified by removing
    sortWithinPartitions (similarity_q trainer): both permutation
    legs then train different models and this test fails."""
    from pyspark.sql import functions as F

    from big_data_analysis_project_spark.registry.similarity_q import (
        train_ivf_centroids_mllib,
    )

    unit = (
        spark.range(600)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda p: (
                    (F.pmod(F.xxhash64(F.col("id"), p), F.lit(2001)) - 1000)
                    / 1000.0
                ),
            ).alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    a = train_ivf_centroids_mllib(unit.repartition(7), k=8)
    b = train_ivf_centroids_mllib(unit.repartition(13), k=8)
    assert a == b
    # row-ORDER permutations, physically materialized (see docstring):
    # reversed ids and a deterministic hash scramble
    rev = unit.orderBy(F.desc("vec_id")).localCheckpoint(eager=True)
    scr = unit.orderBy(F.xxhash64("vec_id")).localCheckpoint(eager=True)
    assert train_ivf_centroids_mllib(rev, k=8) == a
    assert train_ivf_centroids_mllib(scr, k=8) == a


def test_mllib_model_matches_driver_lloyd_recall_class(spark, tmp_path):
    """Equivalence at a checked scale: the SAME corpus quantized by
    driver-Lloyd and by the distributed MLlib trainer must put
    knn_join_blocked in the same recall class vs the exact kNN graph
    (models differ bit-wise by init — that's why the distributed path
    only engages where driver-Lloyd cannot go)."""
    import numpy as np

    from big_data_analysis_project_spark.registry.similarity_q import (
        KNN_K,
        knn_join_blocked,
        train_ivf_centroids,
        train_ivf_centroids_mllib,
        unit_vectors_cached,
    )

    n, k = 3000, 24
    _write_embeddings(spark, tmp_path, n)
    unit = unit_vectors_cached(spark, str(tmp_path))

    rows = sorted(unit.collect(), key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    x = np.asarray([r.v for r in rows], dtype=np.float64)
    s = x @ x.T
    np.fill_diagonal(s, -np.inf)
    true = {
        ids[i]: {ids[j] for j in np.argsort(-s[i], kind="stable")[:KNN_K]}
        for i in range(len(ids))
    }

    def recall(model) -> float:
        pdf = knn_join_blocked(unit, model).toPandas()
        got: dict[int, set] = {}
        for r in pdf.itertuples():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return float(
            np.mean([len(got.get(q, set()) & true[q]) / KNN_K for q in true])
        )

    r_lloyd = recall(train_ivf_centroids(unit, k=k, sample_target=4 * k))
    r_mllib = recall(train_ivf_centroids_mllib(unit, k=k))
    # same recall class: the distributed fit may differ by init but
    # must not be categorically worse than the driver fit it replaces
    assert r_mllib >= r_lloyd - 0.05, (r_mllib, r_lloyd)
    assert r_mllib >= 0.5, r_mllib
