"""Flagship query: revenue by nation over the TPC-H-ish star schema.

This is the sf-testdata analogue of the reference's E1 pipeline shape
(SURVEY.md §3, §7 phase 1): scan -> filter -> join chain -> grouped
multi-agg -> derived rate -> ordered top-k. One deferred plan.

Scale design:
* lineitem revenue is **pre-aggregated per order key before the join**
  (map-side combine on the shuffle), so the orders join moves one row
  per order, not one per line item — at 100 TB this cuts the shuffle
  roughly 4x;
* nation (25 rows, and any realistic nation dimension) is broadcast;
* customer is joined on its key; AQE picks broadcast vs sort-merge by
  actual size at runtime;
* final ordering is orderBy+limit-free here (the mart is 25 rows), the
  caller tops-k if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    rev_per_order = lineitem.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("order_revenue")
    )

    joined = (
        rev_per_order.join(orders, rev_per_order["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
    )

    return (
        joined.groupBy("n_name")
        .agg(
            F.round(F.sum("order_revenue"), 2).alias("revenue"),
            F.count("o_orderkey").alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
        .withColumn(
            "revenue_per_customer",
            F.round(F.col("revenue") / F.col("n_customers"), 2),
        )
        .withColumnRenamed("n_name", "nation")
        .orderBy(F.desc("revenue"), "nation")
    )


FLAGSHIP_ORACLE_SQL = """
WITH rev_per_order AS (
    SELECT l_orderkey, SUM(l_extendedprice * (1 - l_discount)) AS order_revenue
    FROM lineitem GROUP BY l_orderkey
)
SELECT n_name AS nation,
       ROUND(SUM(order_revenue), 2) AS revenue,
       COUNT(o_orderkey) AS n_orders,
       COUNT(DISTINCT c_custkey) AS n_customers,
       ROUND(ROUND(SUM(order_revenue), 2) / COUNT(DISTINCT c_custkey), 2) AS revenue_per_customer
FROM rev_per_order
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, nation
"""
