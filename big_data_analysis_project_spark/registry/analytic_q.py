"""Analytic engine additions beyond the reference's surface: rollup
hierarchies, approximate aggregates (the 100 TB variants of A5/A7),
frame-spec windows (moving average), and lag-based trend direction
(the computation the reference's frontend does client-side,
ref: TrendsChart.jsx:195-197). Each has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table

from ._base import make_registry

QUERIES, ORACLE, q = make_registry()


@q(
    "agg_rollup",
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
              COALESCE(l_linestatus, 'ALL') AS linestatus,
              COUNT(*) AS n,
              ROUND(SUM(l_quantity), 2) AS sum_qty
       FROM lineitem
       GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (flag -> flag+status -> grand total) in one
    pass — at scale this is one shuffle producing every level of the
    hierarchy, vs. three separate groupBys."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


@q(
    "agg_approx",
    """SELECT 'n_parts' AS metric, TRUE AS within_5pct
       UNION ALL SELECT 'n_suppliers', TRUE
       UNION ALL SELECT 'p50_quantity', TRUE""",
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — approx_count_distinct (HyperLogLog++)
    and percentile_approx — asserted within 5% of their own exact
    twins, computed in the same query. The oracle is the literal
    expectation (every metric within tolerance), so the driver hash
    gate verifies the sketches' accuracy, which no exact-value oracle
    could. At 100 TB these replace count_distinct/median: one pass, a
    few KB of sketch per group, no giant exact-distinct shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    # three separate 1-row aggs cross-joined: mixing 2 countDistinct +
    # a median + 2 sketches in ONE agg makes Catalyst plan a
    # multi-distinct Expand that costs ~4x the sum of the parts
    # (measured 6.5s vs 2.7s at sf0.1); each agg below is a single
    # clean pass and the cross joins are 1-row x 1-row
    apx = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("apx_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("apx_supp"),
        F.percentile_approx("l_quantity", 0.5, 10000).alias("apx_p50"),
    )
    ext_cd = li.agg(
        F.countDistinct("l_partkey").alias("ext_parts"),
        F.countDistinct("l_suppkey").alias("ext_supp"),
    )
    ext_med = li.agg(F.median("l_quantity").alias("ext_p50"))
    stats = apx.crossJoin(ext_cd).crossJoin(ext_med)

    def ok(apx, ext):
        return (F.abs(F.col(apx) - F.col(ext)) / F.col(ext)) < 0.05

    return stats.select(
        F.explode(
            F.array(
                F.struct(F.lit("n_parts").alias("metric"), ok("apx_parts", "ext_parts").alias("within_5pct")),
                F.struct(F.lit("n_suppliers").alias("metric"), ok("apx_supp", "ext_supp").alias("within_5pct")),
                F.struct(F.lit("p50_quantity").alias("metric"), ok("apx_p50", "ext_p50").alias("within_5pct")),
            )
        ).alias("m")
    ).select("m.metric", "m.within_5pct")


@q(
    "moving_avg",
    """SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
              ROUND(SUM(o_totalprice) OVER w, 2) AS sum3,
              COUNT(*) OVER w AS n3
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
)
def moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec window: per-customer trailing-3-order rolling sum +
    count (the moving average is sum3/n3 — emitted as the exact pair
    because ROUND(avg, 2) lands on x.xx5 rounding-mode boundaries
    where Spark HALF_UPs and DuckDB half-evens double values).
    Partitioned window — scales horizontally; the frame keeps state
    bounded at 3 rows per step."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return o.select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum3"),
        F.count(F.lit(1)).over(w).alias("n3"),
    )


@q(
    "trend_direction",
    """WITH yearly AS (
         SELECT o_custkey, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS year,
                SUM(o_totalprice) AS spend
         FROM orders GROUP BY 1, 2
       ),
       with_prev AS (
         SELECT o_custkey, year, spend,
                LAG(spend) OVER (PARTITION BY o_custkey ORDER BY year) AS prev
         FROM yearly
       )
       SELECT o_custkey, year,
              CASE WHEN prev IS NULL THEN 'na'
                   WHEN spend > prev THEN 'up'
                   WHEN spend < prev THEN 'down'
                   ELSE 'flat' END AS direction
       FROM with_prev""",
)
def trend_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-based trend direction per key-year — the computation the
    reference's frontend runs client-side on the last two points
    (ref: TrendsChart.jsx:195-197), server-side over every year."""
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        "o_custkey", F.year("o_orderdate").alias("year")
    ).agg(F.sum("o_totalprice").alias("spend"))
    w = Window.partitionBy("o_custkey").orderBy("year")
    prev = F.lag("spend").over(w)
    return yearly.select(
        "o_custkey",
        "year",
        F.when(prev.isNull(), "na")
        .when(F.col("spend") > prev, "up")
        .when(F.col("spend") < prev, "down")
        .otherwise("flat")
        .alias("direction"),
    )


@q(
    "events_funnel",
    """WITH v AS (
         SELECT user_id, MIN(ts) AS v_ts FROM events
         WHERE event_type = 'view' GROUP BY user_id
       ),
       c AS (
         SELECT e.user_id, MIN(e.ts) AS c_ts
         FROM events e JOIN v ON e.user_id = v.user_id
         WHERE e.event_type = 'click'
           AND e.ts > v.v_ts AND e.ts <= v.v_ts + INTERVAL 12 HOUR
         GROUP BY e.user_id
       ),
       p AS (
         SELECT e.user_id, MIN(e.ts) AS p_ts
         FROM events e JOIN c ON e.user_id = c.user_id
         WHERE e.event_type = 'purchase'
           AND e.ts > c.c_ts AND e.ts <= c.c_ts + INTERVAL 12 HOUR
         GROUP BY e.user_id
       )
       SELECT 'view' AS stage, COUNT(*) AS n_users FROM v
       UNION ALL SELECT 'click', COUNT(*) FROM c
       UNION ALL SELECT 'purchase', COUNT(*) FROM p""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel with conversion windows: first view -> click
    within 12 h -> purchase within 12 h of that click. (Unwindowed, all
    150 testdata users complete every stage — the counts only
    discriminate with the deadline; 12 h yields 150/37/7 at sf0.01.) Three aggregate passes joined on
    user_id — each stage's frame is tiny (one row per surviving
    user), so at 100 TB the joins after stage 1 are broadcast-able
    and the heavy table is scanned once per stage with the event_type
    filter pushed down.

    The per-stage frames are eager-localCheckpointed (optimization
    r14, guide §2.4/§3.3 — the capped-triangle discipline): without
    it, the three-count union re-planned each stage's WHOLE upstream
    subtree per leg (v's lineage in all three legs, c's in two — six
    events scans for a three-stage funnel), and that duplicated
    corpus-scan term grows with the corpus. The checkpointed frames
    are one row per surviving user — bounded — and each events scan
    now happens exactly once per stage."""
    from ..sources.readers import load_events

    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    ).localCheckpoint(eager=True)
    hour = F.expr("INTERVAL 12 HOUR")
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("v_ts")) & (F.col("ts") <= F.col("v_ts") + hour))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    ).localCheckpoint(eager=True)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("c_ts")) & (F.col("ts") <= F.col("c_ts") + hour))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    counts = [
        v.agg(F.count(F.lit(1))).withColumn("stage", F.lit("view")),
        c.agg(F.count(F.lit(1))).withColumn("stage", F.lit("click")),
        p.agg(F.count(F.lit(1))).withColumn("stage", F.lit("purchase")),
    ]
    out = counts[0].unionAll(counts[1]).unionAll(counts[2])
    return out.select("stage", F.col(out.columns[0]).alias("n_users"))


@q(
    "retention_cohort",
    """WITH firstday AS (
         SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
       )
       SELECT strftime(f.d0, '%Y-%m-%d') AS cohort_day,
              CAST(datediff('day', f.d0, CAST(e.ts AS DATE)) AS INT) AS day_offset,
              COUNT(DISTINCT e.user_id) AS n_active
       FROM events e JOIN firstday f ON e.user_id = f.user_id
       GROUP BY 1, 2""",
)
def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day,
    counted distinct on each later activity day. Two shuffles (first-
    day agg keyed on user, matrix agg keyed on cohort x offset); the
    firstday frame is one row per user — broadcast-able at mart scale,
    shuffle-join at 100 TB with the same plan shape."""
    from ..sources.readers import load_events

    ev = load_events(spark, sf_dir).select("user_id", F.to_date("ts").alias("day"))
    firstday = ev.groupBy("user_id").agg(F.min("day").alias("d0"))
    return (
        ev.join(firstday, "user_id")
        .groupBy(
            F.date_format("d0", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "d0").cast("int").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@q(
    "agg_sketch_merge",
    """SELECT scope, TRUE AS within_5pct FROM (
         SELECT DISTINCT l_returnflag AS scope FROM lineitem
         UNION ALL
         SELECT 'ALL'
       )""",
)
def agg_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches — the capability that makes
    approximate aggregation composable at 100 TB: build one
    HyperLogLog sketch per group (hll_sketch_agg), estimate per group,
    then hll_union_agg the group sketches into a global estimate
    WITHOUT rescanning the fact table. That re-aggregation step is
    exactly what a pre-aggregated daily-sketch table does at scale
    (store sketches, merge across days at query time). Every estimate
    is gated within 5% of its exact twin, so the oracle (the literal
    expectation) verifies sketch accuracy AND merge correctness.

    Two clean aggregation passes joined on the 3-row group key —
    mixing countDistinct with sketches in one agg plans a
    multi-distinct Expand (see agg_approx's note)."""
    li = load_table(spark, sf_dir, "lineitem")
    sketches = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("ex")
    )
    ok = (
        F.abs(F.hll_sketch_estimate("sk").cast("double") - F.col("ex")) / F.col("ex")
        < 0.05
    )
    per_group = sketches.join(exact, "l_returnflag").select(
        F.col("l_returnflag").alias("scope"), ok.alias("within_5pct")
    )
    merged = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact_all = li.agg(F.countDistinct("l_partkey").alias("ex"))
    all_row = merged.crossJoin(exact_all).select(
        F.lit("ALL").alias("scope"),
        (F.abs(F.col("est").cast("double") - F.col("ex")) / F.col("ex") < 0.05).alias(
            "within_5pct"
        ),
    )
    return per_group.unionByName(all_row)


@q(
    "date_spine",
    """WITH bounds AS (
         SELECT MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi FROM orders
       ),
       spine AS (
         SELECT CAST(UNNEST(generate_series((SELECT lo FROM bounds),
                                            (SELECT hi FROM bounds),
                                            INTERVAL 1 DAY)) AS DATE) AS day
       ),
       daily AS (
         SELECT o_orderdate AS day, CAST(COUNT(*) AS BIGINT) AS n_orders
         FROM orders GROUP BY 1
       )
       SELECT strftime(s.day, '%Y-%m-%d') AS day,
              CAST(COALESCE(d.n_orders, 0) AS BIGINT) AS n_orders
       FROM spine s LEFT JOIN daily d ON s.day = d.day""",
)
def date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine generation + coverage join: a gapless daily
    spine from min to max order date (F.sequence over an interval),
    left-joined to per-day order counts so zero-activity days surface
    as explicit 0 rows — the standard completeness check before any
    time-series computation. The fact table aggregates to #days rows
    BEFORE the join, so the join is tiny-vs-tiny at any input scale
    (the spine is broadcast; days grow with time, not data volume)."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return spine.join(F.broadcast(daily), "day", "left").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
    )


@q(
    "gapfill_ffill",
    """WITH daily AS (
         SELECT n.n_name, o.o_orderdate AS day, MAX(o.o_totalprice) AS day_max
         FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY 1, 2
       ),
       bounds AS (
         SELECT MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi FROM orders
       ),
       spine AS (
         SELECT CAST(UNNEST(generate_series((SELECT lo FROM bounds),
                                            (SELECT hi FROM bounds),
                                            INTERVAL 1 DAY)) AS DATE) AS day
       ),
       grid AS (SELECT n_name, day FROM (SELECT DISTINCT n_name FROM nation), spine)
       SELECT g.n_name,
              strftime(g.day, '%Y-%m-%d') AS day,
              LAST_VALUE(d.day_max IGNORE NULLS)
                OVER (PARTITION BY g.n_name ORDER BY g.day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_max
       FROM grid g LEFT JOIN daily d ON g.n_name = d.n_name AND g.day = d.day""",
)
def gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill with forward fill (the hypertable
    interpolation primitive): per-nation daily grid (nation x spine
    cross join — both sides tiny), left-joined to per-nation daily
    maxima, then last-non-null carried forward with a key-partitioned
    window. MAX (order-independent) rather than SUM keeps the double
    surface bit-exact across engines. The expensive input aggregates
    down to (#nations x #days) before any window; the window
    partitions by nation, so no global ordering exists anywhere."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.col("o_orderdate").alias("day"))
        .agg(F.max("o_totalprice").alias("day_max"))
    )
    bounds = o.agg(F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    grid = n.select("n_name").distinct().crossJoin(spine)
    w = (
        Window.partitionBy("n_name")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(F.broadcast(daily), ["n_name", "day"], "left")
        .withColumn("ffill_max", F.last("day_max", ignorenulls=True).over(w))
        .select(
            "n_name",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "ffill_max",
        )
    )


_PROFILE_NUM = ["o_orderkey", "o_custkey", "o_totalprice"]
_PROFILE_STR = ["o_orderstatus", "o_orderpriority"]
_PROFILE_TS = ["o_orderdate"]

_PROFILE_ORACLE = " UNION ALL ".join(
    f"""SELECT '{c}' AS col_name,
               (SELECT COUNT(*) FROM orders) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               {f"CAST(MIN({c}) AS DOUBLE)" if c in _PROFILE_NUM else "CAST(NULL AS DOUBLE)"} AS min_num,
               {f"CAST(MAX({c}) AS DOUBLE)" if c in _PROFILE_NUM else "CAST(NULL AS DOUBLE)"} AS max_num,
               {f"strftime(MIN({c}), '%Y-%m-%d')" if c in _PROFILE_TS else (f"MIN({c})" if c in _PROFILE_STR else "CAST(NULL AS VARCHAR)")} AS min_str,
               {f"strftime(MAX({c}), '%Y-%m-%d')" if c in _PROFILE_TS else (f"MAX({c})" if c in _PROFILE_STR else "CAST(NULL AS VARCHAR)")} AS max_str
        FROM orders"""
    for c in _PROFILE_NUM + _PROFILE_STR + _PROFILE_TS
)


@q("profile_table", _PROFILE_ORACLE)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column table profiler (Deequ-style data quality
    snapshot): row count, null count, exact distinct count, and
    min/max for every column of `orders`, emitted one row per column.

    Scale shape: a SINGLE wide aggregation pass computes every
    statistic (the per-column rows are exploded from the one agg row
    in-plan — no collect, no per-column scans). The exact
    COUNT(DISTINCT) over several columns expands the input via
    Spark's Expand operator (one replica per distinct agg); at 100 TB
    swap count_distinct -> approx_count_distinct (HLL, single pass,
    no expand) — exact kept here so the DuckDB oracle can match
    bit-for-bit. Mirrors the profiling the reference does per-load in
    pandas (ref: spark_data_processor.py quality checks) as one
    distributed pass."""
    o = load_table(spark, sf_dir, "orders")
    cols = _PROFILE_NUM + _PROFILE_STR + _PROFILE_TS
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__nd"))
    for c in _PROFILE_NUM:
        aggs.append(F.min(c).cast("double").alias(f"{c}__min_num"))
        aggs.append(F.max(c).cast("double").alias(f"{c}__max_num"))
    for c in _PROFILE_STR:
        aggs.append(F.min(c).alias(f"{c}__min_str"))
        aggs.append(F.max(c).alias(f"{c}__max_str"))
    for c in _PROFILE_TS:
        aggs.append(F.date_format(F.min(c), "yyyy-MM-dd").alias(f"{c}__min_str"))
        aggs.append(F.date_format(F.max(c), "yyyy-MM-dd").alias(f"{c}__max_str"))
    one = o.agg(*aggs)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__nulls").alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            (F.col(f"{c}__min_num") if c in _PROFILE_NUM else null_d).alias("min_num"),
            (F.col(f"{c}__max_num") if c in _PROFILE_NUM else null_d).alias("max_num"),
            (null_s if c in _PROFILE_NUM else F.col(f"{c}__min_str")).alias("min_str"),
            (null_s if c in _PROFILE_NUM else F.col(f"{c}__max_str")).alias("max_str"),
        )
        for c in cols
    ]
    return one.select(
        F.col("n_rows"), F.explode(F.array(*structs)).alias("p")
    ).select(
        "p.col_name", "n_rows", "p.n_null", "p.n_distinct",
        "p.min_num", "p.max_num", "p.min_str", "p.max_str",
    )


_RANGE_30D_US = 30 * 86400 * 1_000_000


@q(
    "window_range_30d",
    """SELECT o_orderkey, o_custkey,
              strftime(o_orderdate, '%Y-%m-%d') AS order_day,
              CAST(COUNT(*) OVER w AS BIGINT) AS n_30d,
              CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_30d
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)""",
)
def window_range_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE rolling window: per customer, the count and total
    (exact integer cents) of their orders in the trailing 30 days of
    each order — the interval-based frame ``window_rolling``'s
    rows-based frame can't express (a customer with 5 orders in one
    week vs 5 in a year gets very different frames here).

    Scale shape: partitioned by customer, ordered by exact epoch
    micros (``unix_micros`` — ``unix_timestamp`` truncates sub-second
    parts), so frames are per-customer and the window never
    single-tasks. Money stays exact: FLOOR to integer cents on both
    engines BEFORE summing (double sums over sliding frames differ in
    accumulation order between engines; bigint sums can't — and
    CAST(double AS BIGINT) alone truncates in Spark but rounds in
    DuckDB, hence FLOOR first)."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "cents", F.floor(F.col("o_totalprice") * 100).cast("bigint")
    ).withColumn(
        # parquet TIMESTAMP may surface as TIMESTAMP_NTZ; unix_micros
        # requires TIMESTAMP — cast is offset-free (session tz is UTC)
        "us",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("us")
        .rangeBetween(-_RANGE_30D_US, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.count(F.lit(1)).over(w).alias("n_30d"),
        F.sum("cents").over(w).alias("cents_30d"),
    )


@q(
    "events_transitions",
    """SELECT prev_type, event_type AS next_type, COUNT(*) AS n
       FROM (SELECT event_type,
                    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
             FROM events)
       WHERE prev_type IS NOT NULL
       GROUP BY prev_type, next_type""",
)
def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's
    event-type sequence (the sequence-mining primitive behind
    next-action models and funnel discovery). One user-partitioned
    lag window + one small groupBy — the window never single-tasks
    (per-user frames) and the output is bounded by |event_type|^2
    regardless of corpus size."""
    from ..sources.readers import load_events

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q(
    "observe_audit",
    """SELECT l_returnflag, COUNT(*) AS n,
              CAST(FLOOR(SUM(l_quantity)) AS BIGINT) AS qty_floor
       FROM lineitem GROUP BY l_returnflag""",
)
def observe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``observe()`` metrics API: audit counters (rows seen, null
    values seen) ride ALONG the query as observed metrics — no second
    pass over the data, which is the only affordable way to audit a
    100 TB pipeline run. The returned aggregate is oracle-checked; the
    observation itself (rows_seen == table count, consistent with the
    aggregate) is asserted in tests/test_boundaries.py via
    ``Observation.get`` after the action."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("bdap_audit")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("l_quantity").isNull().cast("bigint")).alias("null_qty_seen"),
    )
    result = observed.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.sum("l_quantity")).cast("bigint").alias("qty_floor"),
    )
    # stash the live Observation so callers (tests) can read the
    # metrics after they materialize the frame
    result._bdap_observation = obs  # type: ignore[attr-defined]
    return result


@q(
    "stats_corr",
    """WITH m AS (
         SELECT l_returnflag,
                CAST(FLOOR(l_quantity * 100) AS BIGINT) AS x,
                CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS y
         FROM lineitem
       ),
       s AS (
         SELECT l_returnflag,
                COUNT(*) AS n,
                CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
                CAST(SUM(x * x) AS DOUBLE) AS sxx,
                CAST(SUM(y * y) AS DOUBLE) AS syy,
                CAST(SUM(x * y) AS DOUBLE) AS sxy
         FROM m GROUP BY l_returnflag
       )
       SELECT l_returnflag, n, sx, sy,
              CAST(FLOOR(
                (CAST(n AS DOUBLE) * sxy - sx * sy)
                / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                       * (CAST(n AS DOUBLE) * syy - sy * sy))
                * 1000000) AS BIGINT) AS corr_e6
       FROM s""",
)
def stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlation (quantity vs extended price) as
    single-pass MOMENT SUMS — the only correlation shape that scales:
    five exact accumulators per group (sum x, y, x2, y2, xy over
    fixed-point cents), combined into r by one closed-form expression
    AFTER aggregation. No second centering pass, no per-group collect.

    Overflow discipline: the quadratic moments are summed as
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — y*y is ~1.1e14 per row,
    so a plain BIGINT sum passes 2^63 at roughly 250k rows per group
    (sf ~0.13!) and ANSI Spark would raise where DuckDB's HUGEINT
    silently kept going. The exact 128-bit sums then convert to DOUBLE
    on BOTH engines — round-to-nearest of the same integer is
    bit-identical, so the compare surface stays hash-exact while the
    accumulator has ~1e38 of headroom (about 1e24 rows per group)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_quantity") * 100).cast("bigint").alias("x"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    dec = "decimal(38,0)"
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).cast("double").alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).cast("double").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    cov = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        "l_returnflag",
        "n",
        "sx",
        "sy",
        F.floor(cov / F.sqrt(vx * vy) * 1000000).cast("bigint").alias("corr_e6"),
    )


@q(
    "stats_linreg",
    """SELECT event_type,
              COUNT(*) AS n,
              CAST(SUM(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT))
                   AS BIGINT) AS sx,
              CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sy_e2,
              CAST(SUM(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                       * CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sxy_e2,
              CAST(SUM(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                       * CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT))
                   AS BIGINT) AS sxx
       FROM events
       GROUP BY event_type""",
)
def stats_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend fit as a single-pass aggregation — "is this
    event type's value drifting over time?". Emits the five sufficient
    statistics (n, Σx, Σy, Σxy, Σx²) with x = epoch day and y = exact
    cents, all BIGINT so the surface is order-independent and
    hash-exact; the caller derives slope = (nΣxy - ΣxΣy)/(nΣx² - (Σx)²)
    and intercept in one float step. This is the distributed-ML
    pattern that matters at 100 TB: closed-form model fits reduce to
    map-side-combined integer aggregations — one shuffle of G groups,
    no iteration, no driver data. Companion to ``stats_corr`` (same
    machinery, correlation surface) and the gradient-free end of the
    spectrum whose other end is ``embed_pca``'s two-stage fit."""
    from ..sources.readers import load_events

    ev = load_events(spark, sf_dir).select("event_type", "ts", "value")
    x = F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("1970-01-01"))).cast(
        "bigint"
    )
    y = F.floor(F.col("value") * 100).cast("bigint")
    return (
        ev.select("event_type", x.alias("x"), y.alias("y"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy_e2"),
            F.sum(F.col("x") * F.col("y")).alias("sxy_e2"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )


@q(
    "window_stats_suite",
    """SELECT o_orderkey,
              o_custkey,
              CAST(FLOOR(PERCENT_RANK() OVER w * 1000000) AS BIGINT) AS prank_e6,
              CAST(FLOOR(CUME_DIST() OVER w * 1000000) AS BIGINT) AS cume_e6,
              NTH_VALUE(o_orderkey, 2) OVER
                  (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                  AS second_key,
              FIRST_VALUE(o_orderkey) OVER w AS top_key,
              LAST_VALUE(o_orderkey) OVER
                  (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                  AS bottom_key
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""",
)
def window_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking/navigation window surface in one key:
    percent_rank, cume_dist (both emitted as FLOOR(x*1e6) fixed point —
    the ratios are exact small-integer divisions, identical IEEE on
    both engines, and the floor keeps the compare surface BIGINT),
    nth_value(2), first_value, last_value — the latter two over the
    full-partition frame, since the default RANGE-to-current frame
    makes last_value a footgun this key deliberately documents. All
    six functions share ONE hash partitioning on o_custkey (one
    shuffle, one sort) — Catalyst collapses same-spec windows into a
    single Window operator."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.percent_rank().over(w) * 1000000).cast("bigint").alias("prank_e6"),
        F.floor(F.cume_dist().over(w) * 1000000).cast("bigint").alias("cume_e6"),
        F.nth_value("o_orderkey", 2).over(full).alias("second_key"),
        F.first("o_orderkey").over(w).alias("top_key"),
        F.last("o_orderkey").over(full).alias("bottom_key"),
    )
