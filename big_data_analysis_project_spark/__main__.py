"""Thin CLI orchestrator: ``python -m big_data_analysis_project_spark``.

E3 parity with the reference's ``main_orchestrator.py:599-708``, which
wires a 700-line orchestrator class around collect / process / api /
schedule modes (plus Docker lifecycle — deployment concern, out of
engine scope). Here the orchestrator IS a thin CLI, as SURVEY.md §3
promised: every mode drives the already-tested engine pieces over one
long-lived SparkSession and exits; state between modes lives in parquet
under ``--data``, not in a resident process.

    collect  synthetic source -> {data}/raw/*.parquet
    process  {data}/raw -> run_tb_pipeline -> {data}/processed/*.parquet
    serve    register serving views over the marts and answer endpoint
             queries as JSON lines (--endpoint to pick one)
    full     collect + process + serve in one session
    route    run one registry key scale-adaptively (--key, --sf-dir):
             walks the declared fallback ladder past guard refusals and
             prints the tier that ran + full hop provenance as JSON; a
             dead end (no honest bounded tier) prints the structured
             refusal and exits 3

At cluster scale the same three verbs run unchanged under
``spark-submit``: sources/sinks are path-based, the session factory
(``session.get_spark``) defers master/conf to the submitter, and the
serving views are plain catalog objects any JDBC/Thrift front end can
query instead of the bundled JSON printer.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

from pyspark.sql import SparkSession

RAW_TABLES = ("tb_raw", "population_raw")
MART_TABLES = ("tb_final", "country_summary", "yearly_trends", "country_trends")


def cmd_collect(spark: SparkSession, data_dir: Path) -> dict:
    """Synthetic source -> raw zone (S4; ref run_data_collection).

    The reference pulls WHO/World-Bank JSON over HTTP; this sandbox has
    no network, so the deterministic synthetic generator stands in —
    same long (entity, year, indicator, value) shape the cleaning
    stage expects from the real feeds.
    """
    from .registry.pipeline_q import synthetic_tb_inputs

    raw = data_dir / "raw"
    tb_raw, pop_raw = synthetic_tb_inputs(spark)
    counts = {}
    for name, df in zip(RAW_TABLES, (tb_raw, pop_raw)):
        df.write.mode("overwrite").parquet(str(raw / f"{name}.parquet"))
        counts[name] = spark.read.parquet(str(raw / f"{name}.parquet")).count()
    return {"mode": "collect", "out": str(raw), "rows": counts}


def cmd_process(spark: SparkSession, data_dir: Path) -> dict:
    """Raw zone -> the four TB marts (E1; ref run_fixed_data_processing).

    One deferred DAG: each mart materializes as exactly one job at sink
    time. CSV twins are written next to the parquet because the
    reference's downstream consumers read data/processed/*.csv.
    """
    from .plans.tb_pipeline import run_tb_pipeline

    raw, processed = data_dir / "raw", data_dir / "processed"
    for name in RAW_TABLES:
        if not (raw / f"{name}.parquet").exists():
            raise SystemExit(f"missing {raw / name}.parquet — run collect first")
    tb_raw = spark.read.parquet(str(raw / "tb_raw.parquet"))
    pop_raw = spark.read.parquet(str(raw / "population_raw.parquet"))
    marts = run_tb_pipeline(tb_raw, pop_raw, reference_parity=True, repair_swap=False)
    named = dict(zip(MART_TABLES, (marts.final, marts.country_summary,
                                   marts.yearly_trends, marts.country_trends)))
    import shutil

    counts = {}
    for name, df in named.items():
        df.write.mode("overwrite").parquet(str(processed / f"{name}.parquet"))
        # single-FILE csv at data/processed/<name>.csv — the layout the
        # reference's downstream consumers actually open (a part-file
        # directory would match none of their paths)
        tmp = processed / f"_{name}_csv"
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(str(tmp))
        part = next(tmp.glob("part-*.csv"))
        shutil.move(str(part), processed / f"{name}.csv")
        shutil.rmtree(tmp)
        counts[name] = spark.read.parquet(str(processed / f"{name}.parquet")).count()
    return {"mode": "process", "out": str(processed), "rows": counts}


def register_serving_views(spark: SparkSession, data_dir: Path) -> None:
    """Marts + coords dim as temp views — the serving catalog."""
    from .registry.serving_q import _coords_dim

    processed = data_dir / "processed"
    for name in MART_TABLES:
        p = processed / f"{name}.parquet"
        if not p.exists():
            raise SystemExit(f"missing {p} — run process first")
        spark.read.parquet(str(p)).createOrReplaceTempView(name)
    _coords_dim(spark).createOrReplaceTempView("coords")


# Endpoint payloads as SQL over the serving views (transport-free twins
# of the flask routes; the registry's serve_* keys carry the oracles).
# ref: flask_api_server.py:539-783 + ComparisonTable.jsx:42-64.
ENDPOINTS: dict[str, str] = {
    "health": "SELECT 'healthy' AS status, 'TB Data API' AS service",
    "countries": "SELECT iso3, country, lat, lon FROM coords ORDER BY iso3",
    "stats": """
        SELECT COUNT(*) AS total_records,
               CONCAT(MIN(year), '-', MAX(year)) AS year_range,
               COUNT(DISTINCT iso3) AS countries_count
        FROM country_summary""",
    "map_data": """
        SELECT s.iso3, c.country, c.lat, c.lon, s.year,
               s.total_cases, s.new_cases, s.deaths, s.population,
               s.total_cases_per_100k, s.new_cases_per_100k,
               s.deaths_per_100k, s.case_fatality_rate
        FROM country_summary s JOIN coords c USING (iso3)
        ORDER BY s.total_cases DESC""",
    "comparison": """
        SELECT iso3, country, total_cases, new_cases, deaths,
               population, total_cases_per_100k, new_cases_per_100k,
               deaths_per_100k, case_fatality_rate
        FROM country_summary ORDER BY total_cases DESC""",
    "trends": """
        SELECT year, total_cases, new_cases, deaths,
               total_cases_per_100k, new_cases_per_100k, deaths_per_100k
        FROM country_trends
        WHERE iso3 = '{iso3}' AND year BETWEEN {start_year} AND {end_year}
        ORDER BY year""",
    "yearly_trends": """
        SELECT year, total_cases_region AS total_cases,
               new_cases_region AS new_cases, deaths_region AS deaths,
               total_population AS population,
               ROUND(avg_cases_per_100k, 4) AS avg_cases_per_100k,
               ROUND(avg_case_fatality_rate, 4) AS avg_case_fatality_rate
        FROM yearly_trends ORDER BY year""",
    "rankings": """
        SELECT ranking, rank, iso3, value FROM (
          SELECT ranking, iso3, value,
                 ROW_NUMBER() OVER (PARTITION BY ranking
                                    ORDER BY value DESC, iso3) AS rank
          FROM (
            SELECT iso3, 'highest_cases' AS ranking,
                   CAST(total_cases AS DOUBLE) AS value FROM country_summary
            UNION ALL
            SELECT iso3, 'highest_deaths', CAST(deaths AS DOUBLE)
            FROM country_summary
            UNION ALL
            SELECT iso3, 'highest_rate', CAST(total_cases_per_100k AS DOUBLE)
            FROM country_summary
          )
        ) WHERE rank <= 3 ORDER BY ranking, rank""",
}


def cmd_serve(spark: SparkSession, data_dir: Path, endpoint: str | None,
              iso3: str, start_year: int, end_year: int) -> dict:
    register_serving_views(spark, data_dir)
    wanted = [endpoint] if endpoint else list(ENDPOINTS)
    payloads = {}
    for name in wanted:
        sql = ENDPOINTS[name].format(
            iso3=iso3, start_year=start_year, end_year=end_year
        )
        payloads[name] = [r.asDict() for r in spark.sql(sql).collect()]
    return {"mode": "serve", "endpoints": payloads}


def cmd_route(spark: SparkSession, key: str, sf_dir: str, limit: int) -> dict:
    """Scale-adaptive single-key run: the router walks the declared
    fallback ladder (see ``router.run_routed``) and the payload carries
    the provenance a pipeline needs to interpret the output — which
    tier ran, whether it was rerouted, and every refusal on the way."""
    from .errors import NoBoundedTier
    from .registry import QUERIES
    from .router import route_plan, run_routed

    # an unknown --key must come back as a structured payload, not a
    # KeyError traceback out of run_routed (ADVICE r10)
    if key not in QUERIES:
        close = sorted(k for k in QUERIES if key.lower() in k.lower())[:8]
        return {
            "mode": "route",
            "requested": key,
            "error": "unknown_key",
            "hint": close or "see registry (python -c 'import __spark_entry__ as E; print(sorted(E.queries()))')",
        }
    plan = route_plan(key)
    try:
        r = run_routed(spark, sf_dir, key)
    except NoBoundedTier as exc:
        return {
            "mode": "route",
            "requested": key,
            "plan": plan,
            "error": "no_bounded_tier",
            **exc.payload(),
        }
    df = r.df.limit(limit)
    return {
        "mode": "route",
        "requested": key,
        "plan": plan,
        "ran": r.key,
        "rerouted": r.rerouted,
        "hops": [h.as_dict() for h in r.hops],
        "columns": r.df.columns,
        # sample rows may carry timestamps/decimals/arrays — stringify
        # anything JSON has no native type for
        "sample": [
            {
                k: v if isinstance(v, (int, float, str, bool, type(None))) else str(v)
                for k, v in row.asDict().items()
            }
            for row in df.collect()
        ],
    }


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(
        prog="python -m big_data_analysis_project_spark",
        description="Thin orchestrator over the PySpark TB analytics engine",
    )
    parser.add_argument(
        "mode", choices=["collect", "process", "serve", "full", "route"]
    )
    parser.add_argument("--data", default="data", help="data zone root (default ./data)")
    parser.add_argument("--endpoint", choices=sorted(ENDPOINTS), default=None,
                        help="serve mode: emit one endpoint instead of all")
    def _iso3(v: str) -> str:
        # interpolated into endpoint SQL — pin the shape so a stray
        # quote can neither crash the parser nor widen the filter
        if not (len(v) == 3 and v.isalpha()):
            raise argparse.ArgumentTypeError("iso3 must be three letters")
        return v.upper()

    parser.add_argument("--iso3", type=_iso3, default="IDN",
                        help="trends endpoint country (three-letter code)")
    parser.add_argument("--start-year", type=int, default=2019)
    parser.add_argument("--end-year", type=int, default=2023)
    parser.add_argument("--master", default=None,
                        help="override Spark master (default local[n cpus])")
    parser.add_argument("--key", default=None,
                        help="route mode: the registry key to run")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                        help="route mode: parquet snapshot directory")
    parser.add_argument("--limit", type=int, default=10,
                        help="route mode: sample rows to print")
    args = parser.parse_args(argv)
    if args.mode == "route" and not args.key:
        parser.error("route mode requires --key")

    from .session import get_spark

    data_dir = Path(args.data)
    spark = get_spark(app_name=f"bdap-{args.mode}", master=args.master)
    try:
        steps = []
        if args.mode == "route":
            steps.append(
                lambda: cmd_route(spark, args.key, args.sf_dir, args.limit)
            )
        if args.mode in ("collect", "full"):
            steps.append(lambda: cmd_collect(spark, data_dir))
        if args.mode in ("process", "full"):
            steps.append(lambda: cmd_process(spark, data_dir))
        if args.mode in ("serve", "full"):
            steps.append(
                lambda: cmd_serve(spark, data_dir, args.endpoint,
                                  args.iso3, args.start_year, args.end_year)
            )
        dead_end = False
        for step in steps:
            t0 = time.perf_counter()
            r = step()
            r["sec"] = round(time.perf_counter() - t0, 2)
            dead_end = dead_end or r.get("error") == "no_bounded_tier"
            # marts carry decimal(12,2) rate columns (reference parity);
            # JSON has no decimal, serve them as numbers
            print(json.dumps(r, default=float))
    finally:
        spark.stop()
    if dead_end:
        sys.exit(3)


if __name__ == "__main__":
    main()
