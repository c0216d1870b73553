"""Window functions (SURVEY.md §2.6).

Scale notes: every window here partitions by a key (custkey / user_id),
so WindowExec shuffles once on the partition key and sorts within
partitions — the same cost shape as a groupBy. Unpartitioned windows
(single global ordering) are avoided except via cheap pre-aggregated
inputs, because a global window funnels all rows through one task.

Determinism: ordering keys always end in a unique column, and every
windowed SUM/AVG over doubles decimal-casts its operand (Spark rescans
frames, DuckDB uses segment trees — different accumulation order, same
exact decimal result).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deltasink_spark.registry import query
from deltasink_spark.tables import load


@query(
    "win_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER()   OVER w AS rn,
           RANK()         OVER w AS rk,
           DENSE_RANK()   OVER w AS drk,
           ROUND(PERCENT_RANK() OVER w, 8) AS prk,
           NTILE(4)       OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_rank(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.round(F.percent_rank().over(w), 8).alias("prk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           LAG(value, 1, 0.0)  OVER w AS prev_value,
           LEAD(value, 1)      OVER w AS next_value,
           CAST(COALESCE(date_diff('second', LAG(ts) OVER w, ts), -1) AS BIGINT) AS gap_sec
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("value", 1, 0.0).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.coalesce(
            (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)), F.lit(-1)
        ).cast("bigint").alias("gap_sec"),
    )


@query(
    "win_frame_rows",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(30,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum3,
           CAST(SUM(CAST(value AS DECIMAL(30,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
    FROM events
    """,
)
def win_frame_rows(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dec = F.col("value").cast("decimal(30,6)")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec).over(w.rowsBetween(-2, 0)).cast("double").alias("mov_sum3"),
        F.sum(dec).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double").alias("run_sum"),
    )


@query(
    "win_frame_range",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(30,6)))
                OVER (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_1h
    FROM events
    """,
)
def win_frame_range(spark, sf_dir):
    """Trailing 1-hour sum per user: RANGE frame over unix seconds.
    The frame key is WHOLE seconds on both sides (Spark unix_timestamp
    truncates; the oracle floors epoch()): with fractional seconds the
    two engines disagree on rows sitting exactly at the 3600s boundary."""
    ev = load(spark, sf_dir, "events").withColumn("ts_sec", F.unix_timestamp("ts"))
    w = Window.partitionBy("user_id").orderBy("ts_sec").rangeBetween(-3600, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(30,6)")).over(w).cast("double").alias("sum_1h"),
    )


@query(
    "win_first_last",
    oracle="""
    SELECT event_id, user_id,
           FIRST_VALUE(value) OVER w AS first_v,
           LAST_VALUE(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING) AS last_v,
           NTH_VALUE(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS second_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_first_last(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w_full).alias("last_v"),
        F.nth_value("value", 2).over(w_full).alias("second_v"),
    )


@query(
    "win_cume",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(CUME_DIST() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice, o_orderkey), 8) AS cd,
           ROUND(o_totalprice /
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
                      OVER (PARTITION BY o_custkey) AS DOUBLE), 8) AS share
    FROM orders
    """,
)
def win_cume(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w_ord = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_all = Window.partitionBy("o_custkey")
    total = F.sum(F.col("o_totalprice").cast("decimal(30,2)")).over(w_all).cast("double")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.cume_dist().over(w_ord), 8).alias("cd"),
        F.round(F.col("o_totalprice") / total, 8).alias("share"),
    )


@query(
    "win_ntile",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(NTILE(4) OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal, c_custkey) AS INT) AS quartile
    FROM customer
    """,
)
def win_ntile(spark, sf_dir):
    """Equal-frequency bucketing per partition (quartiles of customers
    by balance within each nation). Both engines assign remainder rows
    to the leading buckets; the (c_acctbal, c_custkey) order makes the
    assignment fully deterministic."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey", "c_nationkey", F.ntile(4).over(w).alias("quartile")
    )


@query(
    "win_running_distinct",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                            ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first_seen
        FROM events)
    SELECT user_id, ts, event_id,
           CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS distinct_types_so_far
    FROM flagged
    """,
)
def win_running_distinct(spark, sf_dir):
    """Running COUNT(DISTINCT) over an ordered stream — the classic
    "how many distinct event types has this user produced so far"
    measure. A naive collect_set-over-window holds every seen value in
    window state (unbounded memory per row at 100 TB); instead the
    first occurrence of each (user, value) is flagged with one
    row_number window and the running distinct count is a running SUM
    of flags — two window passes, state bounded to a counter, exact.
    Ties order by (ts, event_id) so both engines agree row-for-row."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "first_seen",
        F.when(F.row_number().over(w_first) == 1, F.lit(1)).otherwise(F.lit(0)),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return flagged.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("first_seen").over(w_run).cast("long").alias("distinct_types_so_far"),
    )


def merge_islands(iv):
    """Gaps-and-islands core: ``iv`` carries (key, s, e, tb) — integer
    interval bounds (inclusive) plus a unique tie-break column.
    Returns one row per maximal overlapping island: (key, island_id,
    island_start, island_end). An interval joins the running island
    when its start is <= the RUNNING MAX of previous ends (a plain lag
    misses swallowed intervals); both windows partition by key and
    order by (s, tb) so peers are never ambiguous. Property-tested
    against a sequential reference on swallow/touch/duplicate
    adversarial inputs."""
    w_prev = (
        Window.partitionBy("key")
        .orderBy("s", "tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    f = iv.select(
        "key",
        "s",
        "e",
        "tb",
        F.when(F.max("e").over(w_prev) >= F.col("s"), 0).otherwise(1).alias(
            "new_island"
        ),
    )
    w_run = (
        Window.partitionBy("key")
        .orderBy("s", "tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = f.select(
        "key", "s", "e", F.sum("new_island").over(w_run).alias("island_id")
    )
    return isl.groupBy("key", "island_id").agg(
        F.min("s").alias("island_start"), F.max("e").alias("island_end")
    )


@query(
    "intervals_merge_islands",
    oracle="""
    WITH iv AS (
        SELECT o_custkey,
               CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS s,
               CAST(epoch(o_orderdate) AS BIGINT) // 86400 + 3 AS e,
               o_orderkey
        FROM orders),
    f AS (
        SELECT o_custkey, s, e, o_orderkey,
               CASE WHEN MAX(e) OVER (PARTITION BY o_custkey ORDER BY s, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        >= s
                    THEN 0 ELSE 1 END AS new_island
        FROM iv),
    isl AS (
        SELECT o_custkey, s, e,
               SUM(new_island) OVER (PARTITION BY o_custkey
                   ORDER BY s, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
        FROM f),
    g AS (
        SELECT o_custkey, island_id,
               MIN(s) AS island_start, MAX(e) AS island_end
        FROM isl GROUP BY o_custkey, island_id)
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(island_end - island_start + 1) AS BIGINT) AS covered_days,
           CAST(MAX(island_end - island_start + 1) AS BIGINT) AS longest_days
    FROM g GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def intervals_merge_islands(spark, sf_dir):
    """Gaps-and-islands: merge each customer's overlapping 4-day order
    activity windows [day, day+3] into maximal islands and report per
    customer how many islands, how many distinct covered days, and the
    longest streak — the canonical sessionization-over-intervals
    pattern (uptime stitching, coverage reporting, contiguous-visit
    merging) that needs a RUNNING MAX, not a plain lag: an interval
    can be swallowed by an earlier long interval that is not its
    immediate predecessor.

    Determinism: all arithmetic is epoch-day BIGINTs; the island
    boundary flag and its running sum depend only on the (s,
    o_orderkey) order, spelled identically in both engines.

    Scale: both windows partition by o_custkey — one shuffle on the
    customer key, per-customer sorted scans (the same cost shape as a
    groupBy), never a global ordering. The island aggregation is a
    hash agg on (custkey, island_id)."""
    o = load(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_custkey").alias("key"),
        F.expr("unix_timestamp(o_orderdate) div 86400").alias("s"),
        (F.expr("unix_timestamp(o_orderdate) div 86400") + 3).alias("e"),
        F.col("o_orderkey").alias("tb"),
    )
    g = merge_islands(iv).withColumnRenamed("key", "o_custkey")
    span = F.col("island_end") - F.col("island_start") + 1
    return (
        g.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.sum(span).cast("long").alias("covered_days"),
            F.max(span).cast("long").alias("longest_days"),
        )
        .orderBy("o_custkey")
    )
