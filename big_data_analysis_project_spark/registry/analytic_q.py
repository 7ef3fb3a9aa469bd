"""Analytic engine additions beyond the reference's surface: rollup
hierarchies, approximate aggregates (the 100 TB variants of A5/A7),
frame-spec windows (moving average), and lag-based trend direction
(the computation the reference's frontend does client-side,
ref: TrendsChart.jsx:195-197). Each has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@q(
    "agg_rollup",
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
              COALESCE(l_linestatus, 'ALL') AS linestatus,
              COUNT(*) AS n,
              ROUND(SUM(l_quantity), 2) AS sum_qty
       FROM lineitem
       GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (flag -> flag+status -> grand total) in one
    pass — at scale this is one shuffle producing every level of the
    hierarchy, vs. three separate groupBys."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


@q(
    "agg_approx",
    """SELECT 'n_parts' AS metric, TRUE AS within_5pct
       UNION ALL SELECT 'n_suppliers', TRUE
       UNION ALL SELECT 'p50_quantity', TRUE""",
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — approx_count_distinct (HyperLogLog++)
    and percentile_approx — asserted within 5% of their own exact
    twins, computed in the same query. The oracle is the literal
    expectation (every metric within tolerance), so the driver hash
    gate verifies the sketches' accuracy, which no exact-value oracle
    could. At 100 TB these replace count_distinct/median: one pass, a
    few KB of sketch per group, no giant exact-distinct shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    # three separate 1-row aggs cross-joined: mixing 2 countDistinct +
    # a median + 2 sketches in ONE agg makes Catalyst plan a
    # multi-distinct Expand that costs ~4x the sum of the parts
    # (measured 6.5s vs 2.7s at sf0.1); each agg below is a single
    # clean pass and the cross joins are 1-row x 1-row
    apx = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("apx_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("apx_supp"),
        F.percentile_approx("l_quantity", 0.5, 10000).alias("apx_p50"),
    )
    ext_cd = li.agg(
        F.countDistinct("l_partkey").alias("ext_parts"),
        F.countDistinct("l_suppkey").alias("ext_supp"),
    )
    ext_med = li.agg(F.median("l_quantity").alias("ext_p50"))
    stats = apx.crossJoin(ext_cd).crossJoin(ext_med)

    def ok(apx, ext):
        return (F.abs(F.col(apx) - F.col(ext)) / F.col(ext)) < 0.05

    return stats.select(
        F.explode(
            F.array(
                F.struct(F.lit("n_parts").alias("metric"), ok("apx_parts", "ext_parts").alias("within_5pct")),
                F.struct(F.lit("n_suppliers").alias("metric"), ok("apx_supp", "ext_supp").alias("within_5pct")),
                F.struct(F.lit("p50_quantity").alias("metric"), ok("apx_p50", "ext_p50").alias("within_5pct")),
            )
        ).alias("m")
    ).select("m.metric", "m.within_5pct")


@q(
    "moving_avg",
    """SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
              ROUND(SUM(o_totalprice) OVER w, 2) AS sum3,
              COUNT(*) OVER w AS n3
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
)
def moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec window: per-customer trailing-3-order rolling sum +
    count (the moving average is sum3/n3 — emitted as the exact pair
    because ROUND(avg, 2) lands on x.xx5 rounding-mode boundaries
    where Spark HALF_UPs and DuckDB half-evens double values).
    Partitioned window — scales horizontally; the frame keeps state
    bounded at 3 rows per step."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return o.select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum3"),
        F.count(F.lit(1)).over(w).alias("n3"),
    )


@q(
    "trend_direction",
    """WITH yearly AS (
         SELECT o_custkey, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS year,
                SUM(o_totalprice) AS spend
         FROM orders GROUP BY 1, 2
       ),
       with_prev AS (
         SELECT o_custkey, year, spend,
                LAG(spend) OVER (PARTITION BY o_custkey ORDER BY year) AS prev
         FROM yearly
       )
       SELECT o_custkey, year,
              CASE WHEN prev IS NULL THEN 'na'
                   WHEN spend > prev THEN 'up'
                   WHEN spend < prev THEN 'down'
                   ELSE 'flat' END AS direction
       FROM with_prev""",
)
def trend_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-based trend direction per key-year — the computation the
    reference's frontend runs client-side on the last two points
    (ref: TrendsChart.jsx:195-197), server-side over every year."""
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        "o_custkey", F.year("o_orderdate").alias("year")
    ).agg(F.sum("o_totalprice").alias("spend"))
    w = Window.partitionBy("o_custkey").orderBy("year")
    prev = F.lag("spend").over(w)
    return yearly.select(
        "o_custkey",
        "year",
        F.when(prev.isNull(), "na")
        .when(F.col("spend") > prev, "up")
        .when(F.col("spend") < prev, "down")
        .otherwise("flat")
        .alias("direction"),
    )
