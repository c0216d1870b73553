"""Event-time windowing + dedup + dead-letter ops (SURVEY.md §2.10),
batch-emulated over `events` for the DuckDB oracle. The identical
column expressions run on the readStream path (streaming/pipeline.py);
the batch emulation pins the SEMANTICS (window assignment, session
merge, dedup) against ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from deltasink_spark.registry import query
from deltasink_spark.tables import load


@query(
    "win_tumbling",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total
    FROM events GROUP BY 1, 2
    """,
)
def win_tumbling(spark, sf_dir):
    """Fixed 1h event-time windows. Epoch-aligned window() assignment ==
    date_trunc('hour') for hour-width windows."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "total")
    )


@query(
    "win_sliding",
    oracle="""
    WITH hit AS (
        SELECT make_timestamp(((CAST(FLOOR(epoch(ts) / 900) AS BIGINT) - k) * 900)
                              * 1000000) AS win_start
        FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k))
    SELECT win_start, COUNT(*) AS n
    FROM hit GROUP BY win_start
    """,
)
def win_sliding(spark, sf_dir):
    """Overlapping 1h windows sliding every 15m: each event lands in
    exactly 4 windows (oracle enumerates the 4 aligned starts)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "n")
    )


@query(
    "win_session",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked)
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, sid
    """,
)
def win_session(spark, sf_dir):
    """Gap-based session windows (30m): session_window() in Spark vs the
    classic lag-gap/cumsum sessionization in SQL — same partitions."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sess.start").alias("session_start"), "n_events")
    )


@query(
    "stream_dedup",
    oracle="""
    SELECT DISTINCT event_id, user_id, event_type FROM
        (SELECT * FROM events UNION ALL SELECT * FROM events)
    """,
)
def stream_dedup(spark, sf_dir):
    """Duplicate repair of an at-least-once source, batch-emulated: the
    doubled input collapses back to one row per event_id. Streaming
    variant: dropDuplicatesWithinWatermark (tests/test_streaming.py)."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    doubled = ev.unionAll(ev)
    return doubled.dropDuplicates(["event_id"])


@query(
    "sink_deadletter",
    oracle="""
    WITH corrupted AS (
        SELECT event_id,
               CASE WHEN event_id % 97 = 0 THEN '{bad json' || props ELSE props END AS props
        FROM events)
    SELECT event_id, props AS raw_payload, 'malformed_json' AS reason
    FROM corrupted WHERE props IS NULL OR NOT json_valid(props)
    """,
)
def sink_deadletter(spark, sf_dir):
    """Dead-letter routing, batch-emulated: deterministically corrupt
    ~1% of payloads, parse PERMISSIVE, quarantine rows whose parse
    failed. The streaming sink writes both sides in one foreachBatch."""
    ev = load(spark, sf_dir, "events")
    corrupted = ev.withColumn(
        "props",
        F.when(F.col("event_id") % 97 == 0, F.concat(F.lit("{bad json"), F.col("props")))
        .otherwise(F.col("props")),
    )
    parsed = corrupted.withColumn("payload", F.from_json("props", "k INT"))
    bad = parsed.filter(F.col("payload").isNull() | F.col("payload.k").isNull())
    return bad.select(
        "event_id", F.col("props").alias("raw_payload"), F.lit("malformed_json").alias("reason")
    )
