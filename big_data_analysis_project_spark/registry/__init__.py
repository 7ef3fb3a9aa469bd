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
    tpch_q,
    training_q,
    udf_q,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

for mod in (
    relational,
    tpch_q,
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
    training_q,
):
    overlap = set(QUERIES) & set(mod.QUERIES)
    assert not overlap, f"duplicate query keys: {overlap}"
    QUERIES.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)

# every oracle key must have a query
assert set(ORACLE) <= set(QUERIES), set(ORACLE) - set(QUERIES)

# Driver-evidence rotation, self-managing: the driver's correctness
# harness checks only the FIRST 50 keys of queries() each round, so the
# registry orders itself least-evidenced-first — keys with the fewest
# banked driver rows (counted from the CORRECTNESS_r*.json files the
# driver leaves at the repo root) lead, name order breaking ties. Every
# round therefore banks up to 50 NEW driver rows with no manual window
# edits, sweeping the whole registry in ceil(n/50) rounds. Order only
# affects which keys the driver samples; the local oracle suite checks
# every key every run.


def _driver_row_counts() -> dict[str, int]:
    import json
    from pathlib import Path

    counts: dict[str, int] = {}
    root = Path(__file__).resolve().parents[2]
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        for key in rows:
            counts[key] = counts.get(key, 0) + 1
    return counts


_BANKED = _driver_row_counts()
QUERIES = {
    k: QUERIES[k]
    for k in sorted(QUERIES, key=lambda k: (_BANKED.get(k, 0), k))
}
