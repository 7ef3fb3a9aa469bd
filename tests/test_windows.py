"""Unit tests for the scale-safe window operators (operators/windows.py):
the two-level global rank / prefix sum must agree exactly with their
single-task restatements, and the mart-only ``rank_by`` must refuse
data-sized inputs (VERDICT r4 #6) instead of silently planning a
one-task global sort.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_analysis_project_spark.operators.windows import (
    global_prefix_sum,
    global_rank,
    rank_by,
)
from big_data_analysis_project_spark.sources.readers import load_table

from .conftest import SF_SMOKE


def test_global_rank_matches_single_task_rank(spark):
    """Two-level rank == RANK() OVER (ORDER BY ...) bit-for-bit,
    including ties (o_totalprice collides at sf0.001)."""
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    got = {
        (r["o_orderkey"], r["rank"])
        for r in global_rank(orders, "o_totalprice", desc=True).collect()
    }
    want = {
        (r["o_orderkey"], r["rank"])
        for r in orders.withColumn(
            "rank", F.rank().over(Window.orderBy(F.desc("o_totalprice")))
        ).collect()
    }
    assert got == want


def test_global_rank_empty_input(spark):
    orders = load_table(spark, SF_SMOKE, "orders").filter(F.lit(False))
    assert global_rank(orders, "o_totalprice").count() == 0


def test_global_prefix_sum_matches_single_task_scan(spark):
    """Two-level exclusive prefix sum == SUM() OVER (ORDER BY ... ROWS
    UNBOUNDED PRECEDING TO -1) on a unique order key."""
    orders = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", F.col("o_custkey").alias("v"))
    )
    got = {
        (r["o_orderkey"], r["start_off"])
        for r in global_prefix_sum(orders, ["o_orderkey"], "v").collect()
    }
    w = Window.orderBy("o_orderkey").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        (r["o_orderkey"], r["start_off"])
        for r in orders.withColumn(
            "start_off", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("bigint")
        ).collect()
    }
    assert got == want


def test_global_prefix_sum_empty_input(spark):
    orders = load_table(spark, SF_SMOKE, "orders").filter(F.lit(False))
    assert global_prefix_sum(orders, ["o_orderkey"], "o_custkey").count() == 0


@pytest.mark.parametrize("nparts", [1, 3, 64])
def test_global_rank_invariant_to_partition_count(spark, nparts):
    """THE scale property: the result is a pure function of the data,
    not of the parallelism — 1, 3, or 64 range partitions must produce
    identical ranks (ties crossing partition boundaries included)."""
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    got = {
        (r["o_orderkey"], r["rank"])
        for r in global_rank(
            orders, "o_totalprice", desc=True, num_partitions=nparts
        ).collect()
    }
    want = {
        (r["o_orderkey"], r["rank"])
        for r in orders.withColumn(
            "rank", F.rank().over(Window.orderBy(F.desc("o_totalprice")))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("nparts", [1, 3, 64])
def test_global_prefix_sum_invariant_to_partition_count(spark, nparts):
    orders = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", F.col("o_custkey").alias("v"))
    )
    got = {
        (r["o_orderkey"], r["start_off"])
        for r in global_prefix_sum(
            orders, ["o_orderkey"], "v", num_partitions=nparts
        ).collect()
    }
    w = Window.orderBy("o_orderkey").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        (r["o_orderkey"], r["start_off"])
        for r in orders.withColumn(
            "start_off", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("bigint")
        ).collect()
    }
    assert got == want


def test_rank_by_guard_refuses_large_input(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    with pytest.raises(ValueError, match="global_rank"):
        rank_by(orders, "o_totalprice", max_rows=10)


def test_rank_by_allows_mart_sized_input(spark):
    mart = load_table(spark, SF_SMOKE, "orders").limit(5)
    out = rank_by(mart, "o_totalprice", max_rows=10)
    assert out.count() == 5
    assert "rank" in out.columns


def test_global_prefix_sum_rejects_fractional_val(spark):
    """ADVICE r5 #3: a float val_col must raise, not silently
    floor-truncate every value into the offsets."""
    orders = load_table(spark, SF_SMOKE, "orders")
    with pytest.raises(TypeError, match="exact-integer"):
        global_prefix_sum(orders, ["o_orderkey"], "o_totalprice")
    # explicit cast at the call site is the documented opt-in
    ok = global_prefix_sum(
        orders.withColumn("v", F.col("o_totalprice").cast("bigint")),
        ["o_orderkey"],
        "v",
    )
    assert ok.count() == orders.count()


def test_rank_by_single_scan_guard_ranks_admitted_rows(spark):
    """ADVICE r5 #2: the guard materializes limit(max_rows+1) once and
    ranks over the SAME admitted rows — an input at exactly max_rows
    passes and produces a complete ranking."""
    mart = load_table(spark, SF_SMOKE, "orders").limit(10)
    out = rank_by(mart, "o_totalprice", max_rows=10)
    assert out.count() == 10
    assert {r["rank"] for r in out.collect()} <= set(range(1, 11))
