"""Golden-parity test (SURVEY.md §5.3, §7 Phase 5; VERDICT r1 #2):
run the re-expressed TB pipeline over the reference's committed raw
CSVs and require value-equality against its committed processed CSVs.

Fixtures (read-only, from /root/reference):
  in : data/raw/who_tb_data_20250923_041355.csv          (240 rows)
       data/raw/worldbank_population_20250923_041355.csv  (60 rows)
  out: data/processed/country_summary.csv (10), yearly_trends.csv (6),
       country_trends.csv (60)

Two reference behaviors are reproduced on purpose:
* TB_RAW_SCHEMA orders (indicator, year) while the CSV header orders
  (year, indicator) — Spark assigns CSV columns by position, so the
  read swaps them and the F12 swap-repair must put them back
  (ref: spark_data_processor.py:396-403 vs 437-451).
* reference_parity=True widens every rate to decimal(12,2) via the
  integer-0 else branch (ref parquet footers; functions/rates.py).
"""

from __future__ import annotations

import csv
from pathlib import Path

import pytest

from big_data_analysis_project_spark.plans.tb_pipeline import run_tb_pipeline
from big_data_analysis_project_spark.schemas import POPULATION_RAW_SCHEMA, TB_RAW_SCHEMA

RAW = Path("/root/reference/data/raw")
GOLD = Path("/root/reference/data/processed")
TB_CSV = RAW / "who_tb_data_20250923_041355.csv"
POP_CSV = RAW / "worldbank_population_20250923_041355.csv"

pytestmark = pytest.mark.skipif(
    not TB_CSV.exists(), reason="reference fixtures not present"
)


def _gold_rows(name: str, key_cols: tuple[str, ...]) -> dict[tuple, dict]:
    with open(GOLD / name, newline="") as f:
        rows = list(csv.DictReader(f))
    return {tuple(r[k] for k in key_cols): r for r in rows}


def _spark_rows(df, key_cols: tuple[str, ...]) -> dict[tuple, dict]:
    return {tuple(str(r[k]) for k in key_cols): r.asDict() for r in df.collect()}


def _assert_mart_equal(df, gold_name: str, key_cols: tuple[str, ...]) -> None:
    gold = _gold_rows(gold_name, key_cols)
    got = _spark_rows(df, key_cols)
    # dict keying below collapses duplicate-key rows — pin cardinality
    # first so a join fan-out cannot slip through
    n = df.count()
    assert n == len(gold), f"{gold_name}: {n} rows, golden has {len(gold)}"
    assert set(df.columns) == set(next(iter(gold.values())).keys()), (
        f"{gold_name}: column mismatch {sorted(df.columns)} vs "
        f"{sorted(next(iter(gold.values())).keys())}"
    )
    assert sorted(got) == sorted(gold), (
        f"{gold_name}: key mismatch missing={sorted(set(gold) - set(got))[:3]} "
        f"extra={sorted(set(got) - set(gold))[:3]}"
    )
    for key, grow in gold.items():
        srow = got[key]
        for col, gval in grow.items():
            sval = srow[col]
            try:
                assert abs(float(gval) - float(sval)) < 1e-6, (
                    f"{gold_name}{key}.{col}: golden={gval} spark={sval}"
                )
            except (TypeError, ValueError):  # TypeError: float(None) on a NULL cell
                assert str(sval) == gval, f"{gold_name}{key}.{col}: {gval!r} != {sval!r}"


@pytest.fixture(scope="module")
def marts(spark):
    tb_raw = spark.read.csv(str(TB_CSV), header=True, schema=TB_RAW_SCHEMA)
    pop_raw = spark.read.csv(str(POP_CSV), header=True, schema=POPULATION_RAW_SCHEMA)
    return run_tb_pipeline(tb_raw, pop_raw, reference_parity=True, repair_swap=True)


def test_country_summary_matches_golden(marts):
    _assert_mart_equal(marts.country_summary, "country_summary.csv", ("iso3",))


def test_yearly_trends_matches_golden(marts):
    _assert_mart_equal(marts.yearly_trends, "yearly_trends.csv", ("year",))


def test_country_trends_matches_golden(marts):
    _assert_mart_equal(marts.country_trends, "country_trends.csv", ("iso3", "year"))


def test_final_table_shape(marts):
    # 10 countries x 6 years, decimal(12,2) rate columns as shipped in
    # the reference parquet footers
    assert marts.final.count() == 60
    types = dict(marts.final.dtypes)
    for rate in (
        "total_cases_per_100k",
        "new_cases_per_100k",
        "deaths_per_100k",
        "case_fatality_rate",
        "new_case_rate",
    ):
        assert types[rate] == "decimal(12,2)", f"{rate}: {types[rate]}"
