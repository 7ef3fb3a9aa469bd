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
