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

import threading
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import SparkSession

# Guards cache BOOKKEEPING (eviction scans + lookup/insert), never the
# builds themselves: warm_shared_artifacts runs independent builders
# from a thread pool (guide §2.6), and an unguarded eviction
# comprehension can hit "dict changed size during iteration" against a
# concurrent insert. Builds stay outside the lock so independent
# artifacts actually overlap; two racing builds of the SAME key (which
# the warm DAG prevents) resolve first-write-wins via setdefault.
_MEMO_LOCK = threading.RLock()

_REGISTERED_CACHES: list[dict] = []


def register_cache(cache: dict) -> dict:
    """Register a module-level memo dict so :func:`release_snapshot`
    can sweep it. Declared as ``_X_CACHE = register_cache({})`` at
    module scope; returns the dict unchanged."""
    _REGISTERED_CACHES.append(cache)
    return cache


def release_snapshot(sf_dir: str) -> int:
    """Drop every memoized artifact built from ``sf_dir`` across all
    registered caches, then GC so the freed DataFrames' pinned
    localCheckpoint blocks can actually leave the unified memory pool
    (localCheckpoint blocks are NOT evictable under pressure — they
    only release when the owning RDD is garbage-collected and the
    ContextCleaner drops its blocks).

    Why this exists: a multi-corpus session (tools/scale_probe.py
    timing a base and a big corpus back to back) otherwise carries the
    base corpus's checkpointed shingle/minhash/unit-vector frames as
    dead weight while the big corpus's shared artifacts build — at
    sf30skew base + sf100skew big that cross-side pinning exhausted a
    64 g pool mid-build ([UNABLE_TO_ACQUIRE_MEMORY] in the minhash
    localCheckpoint) even though each side alone fits comfortably.
    Returns the number of entries dropped. Single-corpus sessions
    (bench.py, the driver gate, pytest) never need to call this."""
    import gc

    dropped = 0
    with _MEMO_LOCK:
        for cache in _REGISTERED_CACHES:
            for k in [
                k
                for k in cache
                if isinstance(k[1], tuple) and len(k[1]) == 3 and k[1][0] == sf_dir
            ]:
                del cache[k]
                dropped += 1
    if dropped:
        # Python-side refs gone; collect so py4j finalizers enqueue the
        # JVM-side DataFrame/RDD releases that let the ContextCleaner
        # unpin the checkpoint blocks
        gc.collect()
    return dropped


def snapshot_fingerprint(sf_dir: str) -> tuple:
    """Cheap content fingerprint of a corpus snapshot directory:
    sorted (relative name, size, mtime_ns) of every parquet file under
    it — a pure-metadata stat walk, no data read. Folding this into a
    memo key means a REWRITE of the parquet tables within one Spark
    application invalidates the cached checkpoint/model instead of
    silently serving the stale artifact (ADVICE r5 #4)."""
    root = Path(sf_dir)
    if not root.exists():
        return ("<missing>",)
    return tuple(
        sorted(
            (str(p.relative_to(root)), p.stat().st_size, p.stat().st_mtime_ns)
            for p in root.rglob("*.parquet")
            if p.is_file()
        )
    )


def snapshot_memo(
    cache: dict,
    spark: SparkSession,
    sf_dir: str,
    build: Callable[[], object],
    extra=(),
):
    """``session_memo`` keyed additionally on the snapshot fingerprint
    of ``sf_dir``. ALL entries for the same ``sf_dir`` under an older
    fingerprint are evicted first — deliberately ignoring ``extra``
    (ADVICE r6 #5): callers like ``batch_centroids_cached`` derive
    parts of ``extra`` from the snapshot's CONTENT (e.g. a row-count-
    proportional k), so a rewritten snapshot changes the extra and an
    extra-exact eviction would leave the old entry pinned for the
    application's lifetime. Stale-fingerprint artifacts are useless to
    every consumer regardless of their hyperparameters, so the wider
    sweep cannot evict anything still servable."""
    fp = snapshot_fingerprint(sf_dir)
    app = spark.sparkContext.applicationId
    with _MEMO_LOCK:
        for stale in [
            k
            for k in cache
            if k[0] == app
            and isinstance(k[1], tuple)
            and len(k[1]) == 3
            and k[1][0] == sf_dir
            and k[1][1] != fp
        ]:
            del cache[stale]
    return session_memo(cache, spark, (sf_dir, fp, extra), build)


def session_memo(
    cache: dict,
    spark: SparkSession,
    extra_key,
    build: Callable[[], object],
):
    """Return ``cache[(app_id, extra_key)]``, building it on first use;
    evicts entries belonging to other (stopped) applications."""
    app = spark.sparkContext.applicationId
    key = (app, extra_key)
    with _MEMO_LOCK:
        for stale in [k for k in cache if k[0] != app]:
            del cache[stale]
        if key in cache:
            return cache[key]
    val = build()
    with _MEMO_LOCK:
        return cache.setdefault(key, val)
