"""Session-scoped memoization for corpus-snapshot artifacts (LSH pair
lists, marts) that several registry keys share.

Keys on ``spark.sparkContext.applicationId`` — unique per SparkSession
for the JVM's lifetime — NOT ``id(spark)``: Python recycles object ids,
so an id-keyed cache can serve localCheckpoint DataFrames bound to a
stopped session after its id is reused. Entries from any other
application are evicted on access, so a restarted session cannot grow
the cache without bound or pin a dead session's checkpoint blocks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession


def session_memo(
    cache: dict,
    spark: SparkSession,
    extra_key,
    build: Callable[[], object],
):
    """Return ``cache[(app_id, extra_key)]``, building it on first use;
    evicts entries belonging to other (stopped) applications."""
    app = spark.sparkContext.applicationId
    for stale in [k for k in cache if k[0] != app]:
        del cache[stale]
    key = (app, extra_key)
    if key not in cache:
        cache[key] = build()
    return cache[key]
