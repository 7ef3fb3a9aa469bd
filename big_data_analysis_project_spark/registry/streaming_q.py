"""Event-stream queries (Phase E / SURVEY.md §2.10).

The reference has no streaming (batch + a 30-day scheduler loop,
``tb_data_collection.py:352-393``); these are the engine additions a
stream-shaped events table implies:

* ``window_tumbling`` — hourly tumbling-window aggregate expressed in
  batch (oracle-checkable; identical groupBy(window(...)) semantics).
* ``stream_hourly`` — the same aggregate run through a REAL
  Structured Streaming query (readStream + watermark + availableNow
  trigger + memory sink). No SQL oracle: streaming semantics aren't
  DuckDB-expressible; rows-only driver check + pytest equivalence
  against the batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_events, load_table

QUERIES = {}
ORACLE = {}


def q(key: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[key] = fn
        if oracle is not None:
            ORACLE[key] = oracle
        return fn

    return deco


@q(
    "window_tumbling",
    """SELECT strftime(to_timestamp(floor(epoch(ts) / 3600) * 3600), '%Y-%m-%d %H:%M:%S') AS window_start,
              event_type,
              COUNT(*) AS n_events,
              ROUND(SUM(value), 2) AS total_value
       FROM events
       GROUP BY 1, 2""",
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling window aggregate (batch form). Spark's
    window() is epoch-aligned, matching the oracle's floor(epoch/3600)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@q("stream_hourly")  # rows-only: true streaming, not SQL-expressible
def stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same hourly aggregate as a genuine Structured Streaming
    job: file source -> watermark -> windowed agg -> memory sink,
    driven to completion with availableNow (the batch-of-files
    trigger). At scale the source swaps to kafka/files-on-arrival and
    the sink to a table — the query body is unchanged."""
    # ts arrives as TIMESTAMP(NANOS) parquet; stream it as long and
    # floor-convert to a micros timestamp (same as load_events)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = (
        "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string"
    )
    # FileStreamSource needs a directory; expose the single events file
    # through a symlinked staging dir (at scale this IS the arrival dir)
    import os
    import tempfile
    from pathlib import Path

    stage = Path(tempfile.gettempdir()) / "bdap_stream_src" / Path(sf_dir).name
    stage.mkdir(parents=True, exist_ok=True)
    link = stage / "events.parquet"
    if not link.exists():
        os.symlink(f"{sf_dir}/events.parquet", link)
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .load(str(stage))
        .withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("bdap_stream_hourly")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table("bdap_stream_hourly")
