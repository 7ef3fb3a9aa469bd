"""S12: RDD smoke test — the reference's `sc.parallelize` sanity check
(ref: test_spark.py). The engine is DataFrame-first, so this is the
only RDD touchpoint: prove the SparkContext under our session factory
distributes a computation and agrees with the driver-side result."""

from __future__ import annotations


def test_rdd_parallelize_sum(spark):
    sc = spark.sparkContext
    rdd = sc.parallelize(range(1000), numSlices=8)
    assert rdd.getNumPartitions() == 8
    assert rdd.sum() == sum(range(1000))
    assert rdd.map(lambda x: x * 2).filter(lambda x: x % 4 == 0).count() == 500


def test_rdd_dataframe_roundtrip(spark):
    df = spark.range(100).toDF("n")
    assert df.rdd.map(lambda r: r.n).sum() == 4950
