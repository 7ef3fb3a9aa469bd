"""Serving-endpoint parity (SURVEY.md §7 Phase 4; VERDICT r1 #6): the
reference's seven REST query shapes re-expressed as Spark queries over
the TB marts, each with a DuckDB oracle.

ref: flask_api_server.py:539-783 —
  /api/map-data       -> serve_map_data      (:539-597, coords join)
  /api/trends/<iso3>  -> serve_trends        (:599-624)
  /api/comparison     -> serve_comparison    (:626-640)
  /api/yearly-trends  -> serve_yearly_trends (:643-662)
  /api/countries      -> serve_countries     (:746-754)
  /api/stats          -> serve_stats         (:765-783)
  /api/health         -> serve_health        (:756-763)
plus serve_rankings — the frontend-declared top-3-per-metric surface
the reference never implemented server-side (ComparisonTable.jsx:42-64).

Marts come from the synthetic pipeline (pipeline_q.synthetic_marts) so
every key is oracle-reproducible. JSON shaping (dict nesting, cache
TTLs, error envelopes) is serving-transport concern and stays out of
the engine; each key returns the flat relational payload the endpoint
would jsonify. Timestamps (datetime.now in health/stats) are excluded
as nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.windows import topk_per_group
from ..schemas import COUNTRY_COORDS
from ..sources.readers import load_table
from .pipeline_q import synthetic_marts
from .relational import _SYN_DIM

from ._base import local_values_df, make_registry

QUERIES, ORACLE, q = make_registry()


_COORDS_VALUES = ", ".join(
    f"('{iso3}', '{name}', {lat}, {lon})" for iso3, (name, lat, lon) in COUNTRY_COORDS.items()
)

# shared oracle prelude: synthetic grid -> syn facts -> latest-year
# summary, mirroring pipeline_q.ORACLE_TB_PIPELINE's arithmetic
_RATE = "base_rate * power(0.98, year - 2018) * noise"
_CTE = f"""
WITH dim(iso3, base_rate, population) AS (VALUES {_SYN_DIM}),
coords AS (
  SELECT iso3, country, CAST(lat AS DOUBLE) AS lat, CAST(lon AS DOUBLE) AS lon
  FROM (VALUES {_COORDS_VALUES}) AS t(iso3, country, lat, lon)
),
years AS (SELECT UNNEST(range(2018, 2024)) AS year),
grid AS (
  SELECT iso3, base_rate, population, CAST(year AS INT) AS year,
         0.9 + ((year * 37 + ascii(substr(iso3, 1, 1)) * 11 + ascii(substr(iso3, 3, 1)) * 5) % 200) / 1000.0 AS noise
  FROM dim, years
),
syn AS (
  SELECT iso3, year, population,
         ROUND({_RATE} * population / 100000.0, 0) AS total_cases,
         ROUND({_RATE} * population / 100000.0 * 0.12, 0) AS deaths
  FROM grid
),
summary AS (SELECT * FROM syn WHERE year = (SELECT MAX(year) FROM syn))
"""

_CASES_100K = """ROUND(CAST(CASE WHEN population > 0
    THEN CAST(total_cases * 100000 / population AS DECIMAL(12,2))
    ELSE 0 END AS DOUBLE), 2)"""
_DEATHS_100K = """ROUND(CAST(CASE WHEN population > 0
    THEN CAST(deaths * 100000 / population AS DECIMAL(12,2))
    ELSE 0 END AS DOUBLE), 2)"""
_CFR = """ROUND(CAST(CASE WHEN total_cases > 0
    THEN CAST(deaths * 100 / total_cases AS DECIMAL(12,2))
    ELSE 0 END AS DOUBLE), 2)"""


def _coords_dim(spark: SparkSession) -> DataFrame:
    # pure-JVM VALUES literal, not createDataFrame: the pickled-row
    # conversion job cost ~0.5 s per CALL (serve_map_data and
    # serve_countries both build this inline) — see local_values_df
    return local_values_df(
        spark,
        [(iso3, name, lat, lon) for iso3, (name, lat, lon) in COUNTRY_COORDS.items()],
        "iso3 string, country string, lat double, lon double",
    )


def _summary_payload(spark: SparkSession) -> DataFrame:
    """country_summary with counts as BIGINT and rates as DOUBLE — the
    oracle-surface typing every serving key shares."""
    cs = synthetic_marts(spark).country_summary
    return cs.select(
        "iso3",
        "year",
        F.col("total_cases").cast("bigint").alias("total_cases"),
        F.col("new_cases").cast("bigint").alias("new_cases"),
        F.col("deaths").cast("bigint").alias("deaths"),
        F.col("population").cast("bigint").alias("population"),
        F.round(F.col("total_cases_per_100k").cast("double"), 2).alias("total_cases_per_100k"),
        F.round(F.col("new_cases_per_100k").cast("double"), 2).alias("new_cases_per_100k"),
        F.round(F.col("deaths_per_100k").cast("double"), 2).alias("deaths_per_100k"),
        F.round(F.col("case_fatality_rate").cast("double"), 2).alias("case_fatality_rate"),
    )


@q(
    "serve_map_data",
    _CTE
    + f"""
SELECT s.iso3, c.country, c.lat, c.lon, s.year,
       CAST(total_cases AS BIGINT) AS total_cases,
       CAST(0 AS BIGINT) AS new_cases,
       CAST(deaths AS BIGINT) AS deaths,
       CAST(population AS BIGINT) AS population,
       {_CASES_100K} AS total_cases_per_100k,
       CAST(0.0 AS DOUBLE) AS new_cases_per_100k,
       {_DEATHS_100K} AS deaths_per_100k,
       {_CFR} AS case_fatality_rate
FROM summary s JOIN coords c USING (iso3)""",
    artifacts={"tb_marts"},
)
def serve_map_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /api/map-data: latest-year summary x broadcast coords join
    (the reference's driver-side iso3->coords dict lookup, J2, done as
    a real broadcast join). ref: flask_api_server.py:539-597."""
    payload = _summary_payload(spark)
    coords = _coords_dim(spark)
    return payload.join(F.broadcast(coords), "iso3").select(
        "iso3", "country", "lat", "lon", "year",
        "total_cases", "new_cases", "deaths", "population",
        "total_cases_per_100k", "new_cases_per_100k", "deaths_per_100k",
        "case_fatality_rate",
    )


@q(
    "serve_trends",
    _CTE
    + f"""
SELECT year,
       CAST(total_cases AS BIGINT) AS total_cases,
       CAST(0 AS BIGINT) AS new_cases,
       CAST(deaths AS BIGINT) AS deaths,
       {_CASES_100K} AS total_cases_per_100k,
       CAST(0.0 AS DOUBLE) AS new_cases_per_100k,
       {_DEATHS_100K} AS deaths_per_100k
FROM syn WHERE iso3 = 'IDN' AND year BETWEEN 2019 AND 2023""",
    artifacts={"tb_marts"},
)
def serve_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /api/trends/IDN?start_year=2019&end_year=2023: per-country
    time series with a year-range filter. (The reference also emits
    case_fatality_rate here, but its country_trends table has no such
    column, so the endpoint always serves 0.0 — a reference bug not
    reproduced.) ref: flask_api_server.py:599-624."""
    ct = synthetic_marts(spark).country_trends
    return (
        ct.filter((F.col("iso3") == "IDN") & F.col("year").between(2019, 2023))
        .select(
            "year",
            F.col("total_cases").cast("bigint").alias("total_cases"),
            F.col("new_cases").cast("bigint").alias("new_cases"),
            F.col("deaths").cast("bigint").alias("deaths"),
            F.round(F.col("total_cases_per_100k").cast("double"), 2).alias(
                "total_cases_per_100k"
            ),
            F.round(F.col("new_cases_per_100k").cast("double"), 2).alias("new_cases_per_100k"),
            F.round(F.col("deaths_per_100k").cast("double"), 2).alias("deaths_per_100k"),
        )
        .orderBy("year")
    )


@q(
    "serve_comparison",
    _CTE
    + f"""
SELECT iso3, iso3 AS country,
       CAST(total_cases AS BIGINT) AS total_cases,
       CAST(0 AS BIGINT) AS new_cases,
       CAST(deaths AS BIGINT) AS deaths,
       CAST(population AS BIGINT) AS population,
       {_CASES_100K} AS total_cases_per_100k,
       CAST(0.0 AS DOUBLE) AS new_cases_per_100k,
       {_DEATHS_100K} AS deaths_per_100k,
       {_CFR} AS case_fatality_rate
FROM summary""",
    artifacts={"tb_marts"},
)
def serve_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /api/comparison: the latest-year cross-country payload
    (fillna(0) projection of country_summary).
    ref: flask_api_server.py:626-640."""
    return _summary_payload(spark).withColumn("country", F.col("iso3")).select(
        "iso3", "country",
        "total_cases", "new_cases", "deaths", "population",
        "total_cases_per_100k", "new_cases_per_100k", "deaths_per_100k",
        "case_fatality_rate",
    )


@q(
    "serve_yearly_trends",
    _CTE
    + f"""
SELECT year,
       CAST(SUM(total_cases) AS BIGINT) AS total_cases,
       CAST(0 AS BIGINT) AS new_cases,
       CAST(SUM(deaths) AS BIGINT) AS deaths,
       CAST(SUM(population) AS BIGINT) AS population,
       ROUND(CAST(AVG({_CASES_100K.replace(chr(10), ' ')}) AS DOUBLE), 4) AS avg_cases_per_100k,
       ROUND(CAST(AVG({_CFR.replace(chr(10), ' ')}) AS DOUBLE), 4) AS avg_case_fatality_rate
FROM syn GROUP BY year""",
    artifacts={"tb_marts"},
)
def serve_yearly_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /api/yearly-trends: the yearly_trends mart under the
    endpoint's field names. ref: flask_api_server.py:643-662."""
    yt = synthetic_marts(spark).yearly_trends
    return yt.select(
        "year",
        F.col("total_cases_region").cast("bigint").alias("total_cases"),
        F.col("new_cases_region").cast("bigint").alias("new_cases"),
        F.col("deaths_region").cast("bigint").alias("deaths"),
        F.col("total_population").cast("bigint").alias("population"),
        F.round(F.col("avg_cases_per_100k").cast("double"), 4).alias("avg_cases_per_100k"),
        F.round(F.col("avg_case_fatality_rate").cast("double"), 4).alias(
            "avg_case_fatality_rate"
        ),
    )


@q(
    "serve_countries",
    f"""SELECT iso3, country, CAST(lat AS DOUBLE) AS lat, CAST(lon AS DOUBLE) AS lon
       FROM (VALUES {_COORDS_VALUES}) AS t(iso3, country, lat, lon)""",
)
def serve_countries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /api/countries: the static coords dimension.
    ref: flask_api_server.py:746-754 (hardcoded dict :306-317)."""
    return _coords_dim(spark)


@q(
    "serve_stats",
    _CTE
    + """
SELECT CAST(COUNT(*) AS BIGINT) AS total_records,
       CAST(MIN(year) AS VARCHAR) || '-' || CAST(MAX(year) AS VARCHAR) AS year_range,
       CAST(COUNT(DISTINCT iso3) AS BIGINT) AS countries_count
FROM summary""",
    artifacts={"tb_marts"},
)
def serve_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /api/stats: scalar aggregates over the summary mart (A6).
    ref: flask_api_server.py:765-783."""
    cs = synthetic_marts(spark).country_summary
    return cs.agg(
        F.count(F.lit(1)).alias("total_records"),
        F.concat_ws("-", F.min("year"), F.max("year")).alias("year_range"),
        F.countDistinct("iso3").alias("countries_count"),
    )


@q("serve_health", "SELECT 'healthy' AS status, 'TB Data API' AS service")
def serve_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /api/health (timestamp excluded: nondeterministic).
    ref: flask_api_server.py:756-763."""
    return local_values_df(
        spark, [("healthy", "TB Data API")], "status string, service string"
    )


@q(
    "serve_rankings",
    _CTE
    + f"""
, metrics AS (
  SELECT iso3, 'highest_cases' AS ranking, CAST(total_cases AS DOUBLE) AS value FROM summary
  UNION ALL
  SELECT iso3, 'highest_deaths', CAST(deaths AS DOUBLE) FROM summary
  UNION ALL
  SELECT iso3, 'highest_rate', {_CASES_100K} FROM summary
)
SELECT ranking, rank, iso3, value FROM (
  SELECT ranking, iso3, value,
         CAST(ROW_NUMBER() OVER (PARTITION BY ranking ORDER BY value DESC, iso3) AS INT) AS rank
  FROM metrics
) WHERE rank <= 3""",
    artifacts={"tb_marts"},
)
def serve_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frontend's declared-but-never-served rankings: top-3
    countries per metric over the latest-year summary (O4 over a melt
    of three metric columns). ref: ComparisonTable.jsx:42-64."""
    payload = _summary_payload(spark)
    metrics = payload.select(
        "iso3",
        F.col("total_cases").cast("double").alias("highest_cases"),
        F.col("deaths").cast("double").alias("highest_deaths"),
        F.col("total_cases_per_100k").alias("highest_rate"),
    ).melt(
        ids=["iso3"],
        values=["highest_cases", "highest_deaths", "highest_rate"],
        variableColumnName="ranking",
        valueColumnName="value",
    )
    ranked = topk_per_group(
        metrics,
        group_cols=("ranking",),
        order_col="value",
        k=3,
        alias="rank",
        tiebreak_cols=("iso3",),
    )
    return ranked.select("ranking", "rank", "iso3", "value")


@q(
    "serve_cached_mart",
    """SELECT c_mktsegment,
              COUNT(*) AS n_customers,
              CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                  AS acctbal_e2
       FROM customer GROUP BY c_mktsegment""",
)
def serve_cached_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving layer's hot-path cache — ``spark.catalog
    .cacheTable``: the AGGREGATED mart is pinned in the in-memory
    COLUMNAR cache (compressed batches, JVM-side) so every endpoint
    hit after the first scans memory, not parquet. This is the
    engine-level answer to the reference's flask-caching TTL dict
    (ref: flask_api_server.py:36-39, which caches serialized HTTP
    responses per URL): one cached relation serves every query shape
    over the mart, and Catalyst prunes cached COLUMNS as it would
    parquet ones. What gets cached matters twice over: at 100 TB you
    cache the serving marts (GB), never the fact tables — and
    Spark's CacheManager substitutes a cached relation into ANY query
    whose plan contains it, so caching a raw-table scan would
    silently rewrite every other query over that table (pin the
    derived mart and only the mart's own plan matches).
    tests/test_plans.py asserts the second read scans the in-memory
    table; eviction is LRU per executor and ``uncacheTable`` is the
    explicit drop."""
    mart = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.floor(F.col("c_acctbal") * 100).cast("bigint")).alias(
                "acctbal_e2"
            ),
        )
    )
    mart.createOrReplaceTempView("bdap_served_segments")
    spark.catalog.cacheTable("bdap_served_segments")
    return spark.table("bdap_served_segments")
