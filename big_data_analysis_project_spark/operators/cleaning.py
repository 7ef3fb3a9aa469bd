"""Cleaning operators F1-F13 (SURVEY.md §2.2), as pure DataFrame -> DataFrame
functions.

Each function is a narrow transformation: Catalyst folds the whole
chain into one scan with pushed-down predicates, so at 100 TB the
entire cleaning stage is a single pass over the files with no shuffle.
Reference semantics cited per function.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_valid_observations(
    df: DataFrame,
    value_col: str = "value",
    required_cols: Sequence[str] = ("year", "iso3", "indicator"),
) -> DataFrame:
    """F1: multi-predicate validity filter.

    ref: spark_data_processor.py:424-430 — value non-null & >= 0,
    key columns non-null.
    """
    cond: Column = F.col(value_col).isNotNull() & (F.col(value_col) >= 0)
    for c in required_cols:
        cond = cond & F.col(c).isNotNull()
    return df.filter(cond)


def filter_year_range(df: DataFrame, col: str = "year", lo: int = 2000, hi: int = 2030) -> DataFrame:
    """F2: null-safe range filter. ref: spark_data_processor.py:460-464."""
    return df.filter(F.col(col).isNotNull() & F.col(col).between(lo, hi))


def filter_indicator_whitelist(df: DataFrame, valid: Sequence[str], col: str = "indicator") -> DataFrame:
    """F3: set-membership filter. ref: spark_data_processor.py:471-479."""
    return df.filter(F.col(col).isin(list(valid)))


def filter_positive(df: DataFrame, col: str, required_cols: Sequence[str] = ()) -> DataFrame:
    """F4: positivity filter. ref: spark_data_processor.py:496-501."""
    cond: Column = F.col(col).isNotNull() & (F.col(col) > 0)
    for c in required_cols:
        cond = cond & F.col(c).isNotNull()
    return df.filter(cond)


def cast_year_to_int(df: DataFrame, col: str = "year") -> DataFrame:
    """F6: junk-tolerant string->int cast (non-numeric -> null, dropped
    by the following range filter). ref: spark_data_processor.py:454-457.
    """
    return df.withColumn(col, F.col(col).try_cast("int"))


def standardize_country_names(
    df: DataFrame,
    mapping: Mapping[str, str] | None = None,
    col: str = "country",
) -> DataFrame:
    """F7: CASE WHEN value standardization.

    ref: spark_data_processor.py:509-514 — Lao naming variants -> 'Laos'.
    """
    mapping = mapping or {
        "Lao People's Democratic Republic": "Laos",
        "Lao PDR": "Laos",
    }
    expr: Column | None = None
    for src, dst in mapping.items():
        expr = F.when(F.col(col) == src, dst) if expr is None else expr.when(F.col(col) == src, dst)
    assert expr is not None
    return df.withColumn(col, expr.otherwise(F.col(col)))


def repair_swapped_columns(
    df: DataFrame,
    col_a: str = "year",
    col_b: str = "indicator",
    marker: str = "e_",
    sample_n: int = 5,
) -> DataFrame:
    """F12: data-driven column-swap repair.

    ref: spark_data_processor.py:437-451 — sample a handful of rows; if
    ``year`` cells carry indicator-looking values (contain ``e_``),
    swap year<->indicator. The probe is a deliberately non-lazy,
    capped driver-side action (``limit(sample_n)``); the repair itself
    stays a zero-cost aliased projection.
    """
    sample = df.select(col_a).limit(sample_n).collect()
    if any(marker in str(row[0]) for row in sample):
        # swap IN PLACE so repaired and clean frames stay positionally
        # identical — positional consumers (CSV, unionAll) must not see
        # a different layout depending on whether the probe fired
        swapped = {col_a: col_b, col_b: col_a}
        return df.select(
            *[
                F.col(swapped[c]).alias(c) if c in swapped else F.col(c)
                for c in df.columns
            ]
        )
    return df
