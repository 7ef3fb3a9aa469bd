"""F8: arithmetic rate derivation with decimal typing. SURVEY.md §2.2.

ref: spark_data_processor.py:567-592 — per-100k rates cast to
DECIMAL(10,2) and percentage rates to DECIMAL(5,2), each inside
``when(guard, cast).otherwise(0)``.

Type-parity quirk (SURVEY.md §1.3): the reference's integer-0 else
branch widens every rate to the least-common decimal, DECIMAL(12,2) —
confirmed in its shipped parquet footers. ``derive_rates`` reproduces
that widening bit-for-bit when ``reference_parity=True`` (the golden
test needs it); with ``reference_parity=False`` the else branch is a
typed decimal zero so the declared precision is authoritative.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _guarded(expr: Column, guard: Column, precision: int, scale: int, reference_parity: bool) -> Column:
    cast = expr.cast(f"decimal({precision},{scale})")
    if reference_parity:
        # integer-0 else branch -> Spark widens to decimal(12,2), as the
        # reference's artifacts do
        return F.when(guard, cast).otherwise(0)
    zero = F.lit(0).cast(f"decimal({precision},{scale})")
    return F.when(guard, cast).otherwise(zero)


def per_100k(
    numerator: str | Column,
    population: str | Column = "population",
    precision: int = 10,
    scale: int = 2,
    reference_parity: bool = True,
) -> Column:
    num = F.col(numerator) if isinstance(numerator, str) else numerator
    pop = F.col(population) if isinstance(population, str) else population
    return _guarded(num * 100_000 / pop, pop > 0, precision, scale, reference_parity)


def percentage_rate(
    numerator: str | Column,
    denominator: str | Column,
    precision: int = 5,
    scale: int = 2,
    reference_parity: bool = True,
) -> Column:
    num = F.col(numerator) if isinstance(numerator, str) else numerator
    den = F.col(denominator) if isinstance(denominator, str) else denominator
    return _guarded(num * 100 / den, den > 0, precision, scale, reference_parity)


def derive_rates(df: DataFrame, reference_parity: bool = True) -> DataFrame:
    """The reference's five rate columns over the combined wide table.
    ref: spark_data_processor.py:567-592. Pure narrow map — no shuffle.
    """
    return (
        df.withColumn("total_cases_per_100k", per_100k("total_cases", reference_parity=reference_parity))
        .withColumn("new_cases_per_100k", per_100k("new_cases", reference_parity=reference_parity))
        .withColumn("deaths_per_100k", per_100k("deaths", reference_parity=reference_parity))
        .withColumn(
            "case_fatality_rate",
            percentage_rate("deaths", "total_cases", reference_parity=reference_parity),
        )
        .withColumn(
            "new_case_rate",
            percentage_rate("new_cases", "total_cases", reference_parity=reference_parity),
        )
    )
