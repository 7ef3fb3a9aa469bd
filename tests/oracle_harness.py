"""Local twin of the driver's t2 correctness gate: run a registry
query on Spark and its oracle SQL on DuckDB over the same parquet
tables, compare row count + (name-sorted) columns + order-insensitive
values. Two passes: a TOLERANT one (coercion + 6dp rounding) whose
only job is readable value diffs when something breaks, then the
driver's exact TYPE-STRICT canonical form — which is what actually
gates: a key must match bitwise (type name + string), not within
tolerance.

The strict pass materializes BOTH sides through pandas, because that
is demonstrably what the driver does (the embed_pca ERR traceback in
CORRECTNESS_r03.json shows pandas ``sort_values`` inside the driver's
``_canon``). This matters for exactly one failure class that round 3
shipped: DuckDB SUM(BIGINT) returns HUGEINT, which ``fetchall()``
renders as Python int (matches Spark) but pandas renders as float64
(``-25.0`` != ``-25`` under str()) — an uncast integer-SUM oracle
passes a fetchall-based strict check and fails the driver. The
meta-test in tests/test_registry_oracle.py pins that an uncast
SUM(BIGINT) oracle FAILS this harness."""

from __future__ import annotations

import math
from pathlib import Path

import duckdb

from big_data_analysis_project_spark.schemas import TESTDATA_TABLES as TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    # Spark's session tz is pinned to UTC (session.py); DuckDB defaults
    # to the HOST zone, so any oracle touching TIMESTAMPTZ rendering
    # (to_timestamp/strftime) would shift on a non-UTC machine. Oracles
    # are written tz-naive (make_timestamp) anyway — this pin is the
    # backstop for future oracles and non-UTC dev hosts.
    conn.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            # Spark-written tables are DIRECTORIES of part files;
            # DuckDB's read_parquet needs the glob for those
            src = f"{p}/*.parquet" if p.is_dir() else str(p)
            conn.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return conn


def _normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_cell(v):
        if v is None:
            return None
        # unwrap numpy SCALARS (rows come from a pandas
        # materialization): np.int64 is NOT a Python int instance and
        # would otherwise fall through to the float fallback. Guarded
        # to 0-d values — .item() on an np.ndarray cell (array column)
        # raises, and arrays should fall through to the str() fallback
        # (symmetric on both engines)
        if type(v).__module__ == "numpy" and getattr(v, "ndim", 1) == 0:
            v = v.item()
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


def driver_canon(pdf) -> list[tuple]:
    """The driver's canonical form, reproduced over a PANDAS
    materialization: name-sorted columns, a pandas ``sort_values``
    over all columns (which raises TypeError on unhashable cells —
    the embed_pca ERR class, so any query whose output would abort
    the driver's rows-only check aborts here too), then
    (type-name, str(value)) per cell, rows sorted — no coercion, no
    tolerance. Under pandas, DuckDB HUGEINT becomes float64 while
    Spark BIGINT stays int64, so uncast integer-SUM oracles fail
    here exactly as they fail the driver."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        # reproduces the driver's crash surface for unhashable cells
        pdf = pdf.sort_values(by=cols).reset_index(drop=True)
    return sorted(
        tuple((type(v).__name__, str(v)) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )


def compare(spark_df, conn: duckdb.DuckDBPyConnection, sql: str) -> None:
    # ONE materialization per engine (ADVICE r4: the previous
    # collect+toPandas / double-execute pair roughly doubled suite
    # runtime, and a nondeterministic query could present different
    # rows to the two passes) — both the tolerant and the strict pass
    # below derive from these two pandas frames
    sp = spark_df.toPandas()
    dp = conn.execute(sql).df()
    spark_cols, duck_cols = list(sp.columns), list(dp.columns)
    spark_rows = list(sp.itertuples(index=False, name=None))
    duck_rows = list(dp.itertuples(index=False, name=None))

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

    # the driver's hash is TYPE-strict (type name + str) over PANDAS
    # materializations — the tolerant pass above localizes value bugs,
    # this pass catches type-class drift (Decimal vs float, int vs
    # float, and DuckDB HUGEINT→float64) that coercion masks but the
    # driver's CORRECTNESS gate fails on
    ss = driver_canon(sp)
    sd = driver_canon(dp)
    strict_mism = [(a, b) for a, b in zip(ss, sd) if a != b]
    assert not strict_mism, (
        f"type-strict (pandas-canon) mismatch ({len(strict_mism)} rows), "
        f"first: {strict_mism[:3]}"
    )


def resolve_oracle(key: str, sql: str) -> tuple[str | None, str | None]:
    """Make the routed-facade oracle caveat STRUCTURAL (VERDICT r11
    #2): a facade registers its ladder HEAD's oracle, which describes
    the rows only where no guard fires. When the facade's latest route
    REROUTED, comparing against that oracle would false-fail by
    construction — so the harness consults ``LAST_ROUTE`` after
    running the query and either swaps to the RAN tier's own oracle
    (where one exists: the tier is itself an oracle-checked key, e.g.
    dedup_ngram_dfcap) or declares the comparison invalid.

    Returns ``(sql_to_compare, note)``: the registered SQL and no note
    for the unrouted/non-facade case; the ran tier's SQL plus a note
    when swapped; ``(None, note)`` when the ran tier has no oracle and
    the caller must skip-with-note instead of comparing. Call AFTER
    invoking the query callable — the route record is written at
    plan-build time."""
    try:
        from big_data_analysis_project_spark.registry.routed_q import LAST_ROUTE
    except Exception:  # registry unavailable: nothing to consult
        return sql, None
    rec = LAST_ROUTE.get(key)
    if not rec or not rec.get("rerouted"):
        return sql, None
    from big_data_analysis_project_spark.registry._base import KEY_ORACLES

    ran = rec["ran"]
    ran_sql = KEY_ORACLES.get(ran)
    if ran_sql is not None:
        return ran_sql, (
            f"{key} rerouted to {ran}: comparing against the ran "
            "tier's own oracle (the head's oracle no longer describes "
            "the rows)"
        )
    return None, (
        f"{key} rerouted to {ran}, which has no oracle (one-sided "
        "bounded-tier contract): the facade's registered oracle is "
        "invalid by construction here — skipping the compare, per the "
        "route provenance in LAST_ROUTE"
    )
