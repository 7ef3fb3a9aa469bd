"""Local twin of the driver's t2 correctness gate: run a registry
query on Spark and its oracle SQL on DuckDB over the same parquet
tables, compare row count + (name-sorted) columns + order-insensitive
values. Two passes: a TOLERANT one (coercion + 6dp rounding) whose
only job is readable value diffs when something breaks, then the
driver's exact TYPE-STRICT canonical form — which is what actually
gates: a key must match bitwise (type name + string), not within
tolerance."""

from __future__ import annotations

import math
from pathlib import Path

import duckdb

from big_data_analysis_project_spark.schemas import TESTDATA_TABLES as TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            conn.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return conn


def _normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_cell(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 6)
        if isinstance(v, int):
            return float(v) if abs(v) < 2**52 else v
        if isinstance(v, str):
            # never coerce strings: float('NaN') would turn the
            # literal token 'NaN' into a float nan that compares
            # unequal to itself and false-fails identical results
            return v
        # Decimal and friends -> float where possible
        try:
            return round(float(v), 6)
        except (TypeError, ValueError):
            return str(v)

    return sorted(
        (tuple(norm_cell(row[i]) for i in order) for row in rows),
        key=lambda r: tuple((x is None, str(x)) for x in r),
    )


def _strict(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    """The driver's canonical form: (type-name, str(value)) per cell,
    name-sorted columns, sorted rows — no coercion, no tolerance."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        tuple((type(row[i]).__name__, str(row[i])) for i in order)
        for row in rows
    )


def compare(spark_df, conn: duckdb.DuckDBPyConnection, sql: str) -> None:
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]
    rel = conn.execute(sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns = _normalize(spark_rows, spark_cols)
    nd = _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[:3]}"

    # the driver's hash is TYPE-strict (type name + str) — the tolerant
    # pass above localizes value bugs, this pass catches type-class
    # drift (Decimal vs float, int vs float, HUGEINT) that coercion
    # masks but the driver's CORRECTNESS gate fails on
    ss = _strict(spark_rows, spark_cols)
    sd = _strict(duck_rows, duck_cols)
    strict_mism = [(a, b) for a, b in zip(ss, sd) if a != b]
    assert not strict_mism, (
        f"type-strict mismatch ({len(strict_mism)} rows), "
        f"first: {strict_mism[:3]}"
    )
