"""Reshape operators: pivot (P1) and unpivot/melt (P2). SURVEY.md §2.3."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_indicators(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    values: Sequence[str] | None = None,
    value_col: str = "value",
    fill: float | int | None = 0,
) -> DataFrame:
    """P1: long -> wide pivot.

    ref: spark_data_processor.py:523-526 — groupBy + pivot(indicator) +
    first(value) + na.fill(0).

    Departures for scale/determinism:
    * the pivot value list should be passed explicitly (``values``) so
      the plan is static — no extra distinct-scan job to discover
      pivot values, and the schema is stable at 100 TB;
    * aggregate with ``first(value, ignorenulls=True)`` under a
      documented uniqueness precondition (one row per group x pivot
      value); duplicates would make ``first`` order-dependent, so
      upstream dedup is the caller's contract (FIXTURES.md A1).
    """
    grouped = df.groupBy(*group_cols)
    piv = grouped.pivot(pivot_col, list(values)) if values else grouped.pivot(pivot_col)
    wide = piv.agg(F.first(value_col, ignorenulls=True))
    if fill is not None:
        wide = wide.na.fill(fill)
    return wide


def unpivot(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    var_name: str = "indicator",
    value_name: str = "value",
) -> DataFrame:
    """P2: wide -> long melt.

    ref: tb_data_collection.py:92-95,111-114 (pd.melt of both TME CSV
    shapes). Spark >= 3.4 has a native ``melt``; it is a narrow op (no
    shuffle), just a row-expansion projection.
    """
    return df.melt(
        ids=list(ids),
        values=list(values),
        variableColumnName=var_name,
        valueColumnName=value_name,
    )
