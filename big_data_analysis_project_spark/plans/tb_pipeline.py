"""E1: the flagship batch analytics pipeline, as one deferred plan.

Re-expresses ``FixedTBDataProcessor.process_complete_pipeline``
(``spark_data_processor.py:756-795``) as pure DataFrame composition:

    clean -> pivot -> join -> derive -> summarize

The reference fragments this into eight ``count()``-punctuated jobs
with pandas staging on both ends; here Catalyst sees the whole tree
and each mart is exactly one job at sink time. That is most of the
464 s -> sub-second difference at reference scale, and at 100 TB it is
the difference between one shuffle per mart and eight full re-scans.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rates import derive_rates
from ..operators.cleaning import (
    cast_year_to_int,
    filter_indicator_whitelist,
    filter_positive,
    filter_valid_observations,
    filter_year_range,
    repair_swapped_columns,
    standardize_country_names,
)
from ..operators.joins import left_join_population
from ..operators.reshape import pivot_indicators
from ..schemas import INDICATOR_RENAMES, REQUIRED_MEASURES, VALID_INDICATORS


@dataclass
class TBMarts:
    """The three serving marts plus the full analytical table."""

    final: DataFrame
    country_summary: DataFrame
    yearly_trends: DataFrame
    country_trends: DataFrame


def clean_tb(tb_raw: DataFrame, repair_swap: bool = True) -> DataFrame:
    """F1 validity -> F12 swap repair -> F6 cast -> F2 range -> F3 whitelist.
    ref: spark_data_processor.py:419-490."""
    df = filter_valid_observations(tb_raw)
    if repair_swap:
        df = repair_swapped_columns(df)
    df = cast_year_to_int(df)
    df = filter_year_range(df)
    df = filter_indicator_whitelist(df, VALID_INDICATORS)
    return df


def clean_population(pop_raw: DataFrame) -> DataFrame:
    """F4 positivity -> F6 cast -> F7 name standardization.
    ref: spark_data_processor.py:492-516. The raw feed may carry float
    populations (``281190067.0``); round-cast to long mirrors the
    reference's pandas pre-coercion (:354) without leaving the JVM.
    """
    df = pop_raw.withColumn("population", F.round(F.col("population")).cast("long"))
    df = filter_positive(df, "population", required_cols=("year", "iso3"))
    df = df.withColumn("year", F.col("year").cast("int"))
    df = standardize_country_names(df)
    return df


def pivot_tb(tb_clean: DataFrame) -> DataFrame:
    """P1 pivot + rename + backfill of absent measures.
    ref: spark_data_processor.py:518-546. Explicit pivot value list
    keeps the plan static (no value-discovery job)."""
    wide = pivot_indicators(
        tb_clean,
        group_cols=("country", "iso3", "year"),
        pivot_col="indicator",
        values=VALID_INDICATORS,
    )
    for old, new in INDICATOR_RENAMES.items():
        if old in wide.columns:
            wide = wide.withColumnRenamed(old, new)
    for required in REQUIRED_MEASURES:
        if required not in wide.columns:
            wide = wide.withColumn(required, F.lit(0))
    return wide


def summarize(final_df: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """A1+F2 latest-year slice, A2 yearly aggregate, F5 projection.
    ref: spark_data_processor.py:596-629. The latest-year selector is a
    window-free scalar subquery (max over year) so the whole mart stays
    one deferred plan — no collect() on the driver.
    """
    latest = final_df.select(F.max("year").alias("y"))
    country_summary = (
        final_df.join(F.broadcast(latest), final_df["year"] == latest["y"]).drop("y")
        .select(
            "country", "iso3", "year",
            "total_cases", "new_cases", "deaths", "prevalence", "population",
            "total_cases_per_100k", "new_cases_per_100k", "deaths_per_100k",
            "case_fatality_rate", "new_case_rate",
        )
        .orderBy(F.desc("total_cases"))
    )
    yearly_trends = (
        final_df.groupBy("year")
        .agg(
            F.sum("total_cases").alias("total_cases_region"),
            F.sum("new_cases").alias("new_cases_region"),
            F.sum("deaths").alias("deaths_region"),
            F.sum("population").alias("total_population"),
            F.avg("total_cases_per_100k").alias("avg_cases_per_100k"),
            F.avg("case_fatality_rate").alias("avg_case_fatality_rate"),
        )
        .orderBy("year")
    )
    country_trends = final_df.select(
        "country", "iso3", "year",
        "total_cases", "new_cases", "deaths",
        "total_cases_per_100k", "new_cases_per_100k", "deaths_per_100k",
    ).orderBy("iso3", "year")
    return country_summary, yearly_trends, country_trends


def run_tb_pipeline(
    tb_raw: DataFrame,
    pop_raw: DataFrame,
    reference_parity: bool = True,
    repair_swap: bool = True,
) -> TBMarts:
    """The full E1 DAG as deferred DataFrames (no actions inside)."""
    tb_clean = clean_tb(tb_raw, repair_swap=repair_swap)
    pop_clean = clean_population(pop_raw)
    wide = pivot_tb(tb_clean)
    combined = left_join_population(wide, pop_clean)
    final_df = derive_rates(combined, reference_parity=reference_parity)
    country_summary, yearly_trends, country_trends = summarize(final_df)
    return TBMarts(
        final=final_df,
        country_summary=country_summary,
        yearly_trends=yearly_trends,
        country_trends=country_trends,
    )
