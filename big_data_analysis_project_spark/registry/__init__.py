"""Query registry: every implemented operator from SURVEY.md §2 (and
Phase-E extensions) exposed as (spark, sf_dir) -> DataFrame callables,
paired with DuckDB-runnable oracle SQL.

The driver's correctness harness (t2) runs each QUERIES[key] and the
matching ORACLE[key] side by side at sf0.01 and compares row count +
schema + order-insensitive value hash. Keys without oracle SQL get a
weaker rows-only check (only non-SQL-expressible ops: LSH-based dedup,
structured streaming).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    analytic_q,
    dedup_q,
    extended_q,
    multimodal_q,
    pipeline_q,
    relational,
    serving_q,
    similarity_q,
    streaming_q,
    text_q,
    udf_q,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

for mod in (
    relational,
    pipeline_q,
    serving_q,
    analytic_q,
    extended_q,
    text_q,
    dedup_q,
    similarity_q,
    streaming_q,
    multimodal_q,
    udf_q,
):
    overlap = set(QUERIES) & set(mod.QUERIES)
    assert not overlap, f"duplicate query keys: {overlap}"
    QUERIES.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)

# every oracle key must have a query
assert set(ORACLE) <= set(QUERIES), set(ORACLE) - set(QUERIES)
