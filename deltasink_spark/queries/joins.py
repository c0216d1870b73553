"""Join operators (SURVEY.md §2.4).

Physical strategy notes (the 100 TB story):
- fact x fact equi-joins (lineitem x orders) -> sort-merge join on the
  shuffled key; AQE switches to broadcast when a side is small and
  splits skewed partitions.
- dim joins (nation/region/supplier) -> explicit broadcast() so the
  fact side never shuffles.
- the range/theta join broadcasts the tiny band table (nested-loop
  against a broadcast side is linear, not quadratic).
- the as-of join uses the union + carry-forward window from
  operators/asof.py: one shuffle, no pair explosion.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deltasink_spark.operators.asof import asof_join
from deltasink_spark.registry import query
from deltasink_spark.tables import load


@query(
    "join_inner_hash",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus,
           l.l_extendedprice * (1 - l.l_discount) AS disc_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def join_inner_hash(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return li.join(o, li.l_orderkey == o.o_orderkey, "inner").select(
        "l_orderkey",
        "l_linenumber",
        "o_custkey",
        "o_orderstatus",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_broadcast(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@query(
    "join_left",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def join_left(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@query(
    "join_right",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_right(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "c_custkey", "c_mktsegment"
    )


@query(
    "join_full",
    oracle="""
    SELECT f.o_custkey AS fkey, s.o_custkey AS okey,
           f.n_f, s.n_o
    FROM (SELECT o_custkey, COUNT(*) AS n_f FROM orders
          WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
    FULL JOIN (SELECT o_custkey, COUNT(*) AS n_o FROM orders
               WHERE o_orderstatus = 'O' GROUP BY o_custkey) s
      ON f.o_custkey = s.o_custkey
    """,
)
def join_full(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    f = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("fkey"))
        .agg(F.count(F.lit(1)).alias("n_f"))
    )
    s = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("okey"))
        .agg(F.count(F.lit(1)).alias("n_o"))
    )
    return f.join(s, f.fkey == s.okey, "full").select("fkey", "okey", "n_f", "n_o")


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
)
def join_semi(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
    SELECT n.n_name, r.r_name,
           CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS same_region
    FROM nation n CROSS JOIN region r
    """,
)
def join_cross(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.crossJoin(F.broadcast(r)).select(
        "n_name",
        "r_name",
        F.when(F.col("n_regionkey") == F.col("r_regionkey"), 1).otherwise(0).alias("same_region"),
    )


@query(
    "join_theta_range",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, b.band
    FROM part p
    JOIN (VALUES ('budget', 0.0, 900.0),
                 ('mid', 900.0, 1400.0),
                 ('premium', 1400.0, 1000000.0)) AS b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    """,
)
def join_theta_range(spark, sf_dir):
    """Non-equi band join: broadcast the tiny band table so the fact
    side streams through a BroadcastNestedLoopJoin (linear scan)."""
    p = load(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 900.0), ("mid", 900.0, 1400.0), ("premium", 1400.0, 1000000.0)],
        "band string, lo double, hi double",
    )
    return p.join(
        F.broadcast(bands),
        (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
    ).select("p_partkey", "p_retailprice", "band")


@query(
    "join_asof",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS asof_orderkey,
           o.o_orderdate AS asof_orderdate
    FROM events e
    LEFT JOIN LATERAL (
        SELECT o_orderkey, o_orderdate FROM orders o
        WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
    ) o ON TRUE
    """,
)
def join_asof_q(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_id", F.col("user_id"), "ts"
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderkey",
        "o_orderdate",
    )
    out = asof_join(
        ev,
        o,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
        tiebreak="o_orderkey",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_orderdate").alias("asof_orderdate"),
    )


@query(
    "join_bucketed",
    oracle="""
    SELECT l.l_orderkey, COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS total_qty,
           MAX(o.o_orderpriority) AS priority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F' AND l.l_orderkey < 5000
    GROUP BY l.l_orderkey
    """,
)
def join_bucketed(spark, sf_dir):
    """Co-located (bucketed) fact-fact join: both tables are written
    bucketBy(orderkey) + sortBy into the session catalog, so the join
    needs NO shuffle on either side — the SortMergeJoin reads bucket i
    of each table on the same task. At 100 TB this turns the biggest
    recurring cost of a star-schema workload (re-shuffling the fact
    table for every join) into a one-time layout decision, exactly like
    the reference connector partitioning its Delta output for readers.
    The plan is asserted shuffle-free in tests/test_plans.py."""
    import hashlib
    import re
    import tempfile

    # the key becomes an UNQUOTED catalog identifier: every non-word
    # character must go (audit fixtures live under hyphenated pytest
    # tmp dirs — "b_lineitem_..pytest-of-root.." is a ParseException).
    # The md5 suffix keeps distinct dirs distinct after sanitizing —
    # without it, /x/sf0.1 and /x/sf0-1 would alias to one table and
    # the tableExists guard would silently serve the first dir's data.
    key = (
        re.sub(r"[^A-Za-z0-9_]", "_", sf_dir.strip("/"))
        + "_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    )
    base = os.path.join(tempfile.gettempdir(), "ds_bucketed")
    lt, ot = f"b_lineitem_{key}", f"b_orders_{key}"
    if not spark.catalog.tableExists(lt):
        (
            load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_quantity")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", os.path.join(base, lt))  # external: no ./spark-warehouse
            .mode("overwrite")
            .saveAsTable(lt)
        )
    if not spark.catalog.tableExists(ot):
        (
            load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_orderpriority")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", os.path.join(base, ot))
            .mode("overwrite")
            .saveAsTable(ot)
        )
    li = spark.table(lt).filter(F.col("l_orderkey") < 5000)
    od = spark.table(ot).filter(F.col("o_orderstatus") == "F")
    joined = li.hint("merge").join(od, li.l_orderkey == od.o_orderkey)
    return (
        joined.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(30,2)")).cast("double").alias("total_qty"),
            F.max("o_orderpriority").alias("priority"),
        )
    )


@query(
    "join_skew_salted",
    oracle="""
    SELECT e.event_type, d.weight, COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE) AS total
    FROM events e
    JOIN (SELECT DISTINCT event_type,
                 length(event_type) * 1.5 AS weight
          FROM events) d ON e.event_type = d.event_type
    GROUP BY 1, 2
    """,
)
def join_skew_salted(spark, sf_dir):
    """Skew-safe join via explicit salting: events.event_type has a
    handful of hot keys, so a plain equi-join shuffles every hot-key
    row to ONE reducer. Salting fans each hot key across SALT reducers:
    the fact side gets salt = pmod(hash(event_id), SALT); the dim side
    is exploded SALT ways (tiny). Same result as the plain join —
    verified by the unsalted oracle — but no reducer ever sees more
    than 1/SALT of a hot key. (AQE skew-join handles moderate skew at
    runtime; explicit salting is the deterministic-layout variant that
    also works for stateful/streaming joins where AQE cannot replan.)"""
    SALT = 16
    ev = load(spark, sf_dir, "events")
    dim = (
        ev.select("event_type").distinct()
        .withColumn("weight", F.length("event_type") * 1.5)
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT)]))
    )
    fact = ev.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT)).cast("int"))
    joined = fact.join(dim_salted, ["event_type", "salt"])
    return (
        joined.groupBy("event_type", "weight")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total"),
        )
    )


@query(
    "join_range_bucketed",
    oracle="""
    SELECT e.event_id AS err_id, p.event_id AS purch_id, e.user_id,
           date_diff('second', e.ts, p.ts) AS gap_s
    FROM events e JOIN events p
      ON p.user_id = e.user_id
     AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR
    WHERE e.event_type = 'error' AND p.event_type = 'purchase'
    """,
)
def join_range_bucketed(spark, sf_dir):
    """Interval join at scale: pair every error event with the same
    user's purchases in the following hour. The naive plan is a theta
    join (per-user cross product + range filter) — quadratic in events
    per user. Instead both sides are bucketed to the hour; an error in
    bucket b can only match purchases in buckets {b, b+1} (the window
    spans at most one boundary), so candidates come from an EQUI-join
    on (user_id, bucket) — one shuffle, prunable, AQE-skew-handled —
    followed by the exact range predicate. The 2x explode on the
    (smaller) error side is the whole overhead; the oracle runs the
    plain range join, proving the rewrite lossless."""
    ev = load(spark, sf_dir, "events")
    bkt = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    err = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            "user_id",
            F.col("ts").alias("ets"),
            bkt.alias("b0"),
        )
        .withColumn("bkt", F.explode(F.array(F.col("b0"), F.col("b0") + 1)))
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purch_id"),
        "user_id",
        F.col("ts").alias("pts"),
        bkt.alias("bkt"),
    )
    cand = err.join(pur, ["user_id", "bkt"])
    return cand.filter(
        (F.col("pts") > F.col("ets"))
        & (F.col("pts") <= F.col("ets") + F.expr("INTERVAL 1 HOUR"))
    ).select(
        "err_id",
        "purch_id",
        "user_id",
        (F.unix_timestamp("pts") - F.unix_timestamp("ets")).alias("gap_s"),
    )


@query(
    "join_null_safe",
    oracle="""
    WITH l AS (SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS st FROM orders
               WHERE o_orderkey < 2000),
    r AS (SELECT NULLIF(s, 'P') AS st, code FROM (VALUES ('F', 10), ('O', 20),
               ('P', 30)) AS v(s, code))
    SELECT l.o_orderkey, l.st, r.code
    FROM l JOIN r ON l.st IS NOT DISTINCT FROM r.st
    """,
)
def join_null_safe(spark, sf_dir):
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics dimension
    sync jobs need when 'unknown' is itself a join key. Catalyst still
    plans a hash join (the null-safe comparison hashes NULL to a
    bucket), so no fallback to nested-loop; nulls are synthesized
    deterministically via NULLIF since the fixture has none."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select("o_orderkey", F.nullif("o_orderstatus", F.lit("P")).alias("st"))
    )
    r = spark.createDataFrame(
        [("F", 10), ("O", 20), ("P", 30)], "s string, code int"
    ).select(F.nullif("s", F.lit("P")).alias("st"), "code")
    return o.join(F.broadcast(r), o.st.eqNullSafe(r.st)).select(
        o.o_orderkey, o.st, r.code
    )


# --- join_temporal_lookup (r4): point-in-interval dimension lookup ----


@query(
    "join_temporal_lookup",
    oracle="""
    WITH iv AS (
        SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
               LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey)
                 AS valid_to
        FROM orders)
    SELECT e.event_id, e.user_id, e.ts, iv.o_orderkey, iv.valid_from
    FROM events e JOIN iv
      ON iv.o_custkey = e.user_id
     AND iv.valid_from <= e.ts
     AND (iv.valid_to IS NULL OR e.ts < iv.valid_to)
    """,
)
def join_temporal_lookup(spark, sf_dir):
    """Point-in-interval lookup: each event fetches the SCD2 interval
    (scd2_intervals shape over orders) valid at its timestamp — the
    "which version of the dimension row governed this fact" join every
    warehouse backfill runs.

    The naive plan is a theta join (per-key cross product + range
    filter). Instead the interval set splits by openness: CLOSED
    intervals explode to the months they cover and events join on
    (key, month) — an equi-join Catalyst hash-partitions — with the
    exact validity predicate as a post-filter; the OPEN (current)
    interval is one row per key, so events join it directly on the
    key. Same rewrite family as join_range_bucketed, but for point-
    in-INTERVAL rather than point-in-window; the oracle runs the
    plain theta join, proving the rewrite lossless. At 100 TB pick
    the bucket granularity so the per-interval explode factor stays
    O(expected validity span / bucket)."""
    ev = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    iv = o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    month = lambda c: F.date_trunc("month", c)  # noqa: E731
    pts = ev.select("event_id", "user_id", "ts", month(F.col("ts")).alias("em"))
    out_cols = ["event_id", "user_id", "ts", "o_orderkey", "valid_from"]
    closed_m = (
        iv.filter(F.col("valid_to").isNotNull())
        .withColumn(
            "m",
            F.explode(
                F.sequence(
                    month(F.col("valid_from")),
                    month(F.col("valid_to")),
                    F.expr("INTERVAL 1 MONTH"),
                )
            ),
        )
    )
    closed_hits = (
        pts.join(
            closed_m,
            (F.col("user_id") == F.col("o_custkey")) & (F.col("em") == F.col("m")),
        )
        .filter(
            (F.col("valid_from") <= F.col("ts")) & (F.col("ts") < F.col("valid_to"))
        )
        .select(*out_cols)
    )
    current = iv.filter(F.col("valid_to").isNull())
    open_hits = (
        pts.join(current, F.col("user_id") == F.col("o_custkey"))
        .filter(F.col("valid_from") <= F.col("ts"))
        .select(*out_cols)
    )
    return closed_hits.unionByName(open_hits)


@query(
    "join_lateral",
    oracle="""
    SELECT r.r_name, t.n_name, t.n_nationkey
    FROM region r, LATERAL (
        SELECT n_name, n_nationkey FROM nation n
        WHERE n.n_regionkey = r.r_regionkey
        ORDER BY n_nationkey LIMIT 2
    ) t
    """,
)
def join_lateral(spark, sf_dir):
    """LATERAL correlated subquery (ANSI lateral join): for each outer
    row, a per-row subquery with its own ORDER BY ... LIMIT — the SQL
    spelling of top-k-per-group that Catalyst de-correlates into a
    window/rank plan rather than executing per-row. Exercises the SQL
    surface; the DataFrame equivalent is topk_per_group."""
    from deltasink_spark.tables import load as _load

    _load(spark, sf_dir, "region").createOrReplaceTempView("v_lat_region")
    _load(spark, sf_dir, "nation").createOrReplaceTempView("v_lat_nation")
    return spark.sql("""
        SELECT r.r_name, t.n_name, t.n_nationkey
        FROM v_lat_region r, LATERAL (
            SELECT n_name, n_nationkey FROM v_lat_nation n
            WHERE n.n_regionkey = r.r_regionkey
            ORDER BY n_nationkey LIMIT 2
        ) t
    """)


@query(
    "join_asof_forward",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS next_orderkey,
           o.o_orderdate AS next_orderdate
    FROM events e
    LEFT JOIN LATERAL (
        SELECT o_orderkey, o_orderdate FROM orders o
        WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
        ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 1
    ) o ON TRUE
    """,
)
def join_asof_forward_q(spark, sf_dir):
    """Forward as-of join (merge_asof direction='forward'): each event
    gets the user's NEXT order at-or-after the event — the "time to
    next action" primitive behind conversion-lag and lead-time
    analyses. Same union + single-window shape as join_asof
    (operators/asof.py::asof_join_forward, mirrored window frame), so
    no inequality-pair explosion: one shuffle by key, linear per
    partition, AQE-skew-safe."""
    from deltasink_spark.operators.asof import asof_join_forward

    ev = load(spark, sf_dir, "events").select("event_id", F.col("user_id"), "ts")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    out = asof_join_forward(
        ev,
        o,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
        tiebreak="o_orderkey",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_orderdate").alias("next_orderdate"),
    )


_ASOF_TOL_DAYS = 30


@query(
    "join_asof_tolerance",
    oracle=f"""
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS asof_orderkey,
           o.o_orderdate AS asof_orderdate
    FROM events e
    LEFT JOIN LATERAL (
        SELECT o_orderkey, o_orderdate FROM orders o
        WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
          AND o.o_orderdate >= e.ts - INTERVAL {_ASOF_TOL_DAYS} DAY
        ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
    ) o ON TRUE
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """Backward as-of join with a TOLERANCE bound (pandas
    merge_asof(tolerance=...)): the latest order at-or-before each
    event counts only if it is within {_ASOF_TOL_DAYS} days — a stale
    quote/price older than the tolerance must surface as NULL, not as
    a silently wrong match. Implemented as the standard union +
    one-window as-of (operators/asof.py) followed by a codegen
    tolerance predicate that nulls out-of-window payloads; same single
    shuffle on the key as join_asof, no extra joins."""
    from deltasink_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events").select("event_id", F.col("user_id"), "ts")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderkey",
        "o_orderdate",
    )
    out = asof_join(
        ev,
        o,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
        tiebreak="o_orderkey",
    )
    within = F.col("o_orderdate") >= F.col("ts") - F.expr(
        f"INTERVAL {_ASOF_TOL_DAYS} DAY"
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.when(within, F.col("o_orderkey")).alias("asof_orderkey"),
        F.when(within, F.col("o_orderdate")).alias("asof_orderdate"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS nearest_orderkey,
           o.o_orderdate AS nearest_orderdate
    FROM events e
    LEFT JOIN LATERAL (
        SELECT o_orderkey, o_orderdate FROM orders o
        WHERE o.o_custkey = e.user_id
        ORDER BY abs(epoch_us(e.ts) - epoch_us(o.o_orderdate)) ASC,
                 (o.o_orderdate > e.ts) ASC,
                 CASE WHEN o.o_orderdate <= e.ts THEN -o_orderkey
                      ELSE o_orderkey END ASC
        LIMIT 1
    ) o ON TRUE
    """,
)
def join_asof_nearest(spark, sf_dir):
    """Nearest as-of join (pandas merge_asof direction='nearest'):
    each event gets the user's order closest in time, either side.
    Composed from the two shuffle-once as-of primitives — backward
    (operators/asof.py::asof_join) then forward (asof_join_forward,
    which carries the backward payload through as plain left columns)
    — followed by a codegen nearest-pick: min |ts delta| in exact
    epoch MICROseconds, ties preferring the backward match, then the
    per-side deterministic key tie-break each primitive already
    guarantees (backward: greatest key; forward: smallest key). Two
    shuffles on the join key total, zero pair explosion — the naive
    inequality-join form would materialize every (event, order) pair
    per user before ranking."""
    from deltasink_spark.operators.asof import asof_join, asof_join_forward

    ev = load(spark, sf_dir, "events").select("event_id", F.col("user_id"), "ts")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    b = asof_join(
        ev, o, on="user_id", left_ts="ts", right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"], tiebreak="o_orderkey",
    ).select(
        "event_id", "user_id", "ts",
        F.col("o_orderkey").alias("bk_key"),
        F.col("o_orderdate").alias("bk_date"),
    )
    both = asof_join_forward(
        b, o, on="user_id", left_ts="ts", right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"], tiebreak="o_orderkey",
    ).select(
        "event_id", "user_id", "ts", "bk_key", "bk_date",
        F.col("o_orderkey").alias("fw_key"),
        F.col("o_orderdate").alias("fw_date"),
    )
    # fixture dates load as TIMESTAMP_NTZ; unix_micros requires TIMESTAMP
    # (session TZ is pinned UTC, so the cast is value-preserving)
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    d_b = us("ts") - us("bk_date")
    d_f = us("fw_date") - us("ts")
    take_backward = F.col("bk_date").isNotNull() & (
        F.col("fw_date").isNull() | (d_b <= d_f)
    )
    return both.select(
        "event_id",
        "user_id",
        "ts",
        F.when(take_backward, F.col("bk_key"))
        .otherwise(F.col("fw_key"))
        .alias("nearest_orderkey"),
        F.when(take_backward, F.col("bk_date"))
        .otherwise(F.col("fw_date"))
        .alias("nearest_orderdate"),
    )


def interval_overlap_pairs(a, b, width: int):
    """Distributed interval-overlap join core: ``a`` carries (a_key,
    a_s, a_e), ``b`` carries (b_key, b_s, b_e) — integer interval
    bounds, inclusive. Each side explodes into the width-sized buckets
    its interval touches, the join is an EQUI-join on the bucket id,
    the exact overlap predicate (a_s <= b_e AND b_s <= a_e) runs as a
    residual filter, and the count-once rule bk ==
    bucket(greatest(a_s, b_s)) emits every matching pair exactly once
    with no distinct: the overlap start lies inside both intervals, so
    exactly one bucket is claimed and both explosions cover it.

    Inverted rows (s > e: empty intervals) are dropped up front —
    without the guard, Spark's sequence() steps DOWNWARD for
    start > stop (the sequence trap operators/text.py also guards)
    and an empty interval would still explode into buckets and match.

    Fan-out is len/width + 1 copies per row: pick width on the order
    of the TYPICAL interval length (the published distributed
    interval-join tradeoff — smaller widths mean more copies of long
    intervals, larger widths mean denser buckets). A pathological
    interval of length L still explodes into L/width rows, so bound
    interval lengths upstream or raise width accordingly.
    Property-tested against a cross-join reference on
    boundary-adversarial synthetic intervals for widths 1..50."""
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    ax = a.filter(F.col("a_s") <= F.col("a_e")).withColumn(
        "bk", F.explode(F.expr(f"sequence(a_s div {width}, a_e div {width})"))
    )
    bx = b.filter(F.col("b_s") <= F.col("b_e")).withColumn(
        "bk", F.explode(F.expr(f"sequence(b_s div {width}, b_e div {width})"))
    )
    return ax.join(bx, "bk").filter(
        (F.col("a_s") <= F.col("b_e"))
        & (F.col("b_s") <= F.col("a_e"))
        & (F.col("bk") == F.expr(f"greatest(a_s, b_s) div {width}"))
    )


@query(
    "join_interval_overlap",
    oracle="""
    WITH a AS (
        SELECT o_orderkey AS a_key,
               CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS s
        FROM orders WHERE o_orderpriority = '1-URGENT'),
    b AS (
        SELECT o_orderkey AS b_key,
               CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS s
        FROM orders WHERE o_orderpriority = '5-LOW')
    SELECT a.a_key AS o_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(SUM(LEAST(a.s + 3, b.s + 3) - GREATEST(a.s, b.s) + 1)
                AS BIGINT) AS sum_overlap_days
    FROM a JOIN b ON a.s <= b.s + 3 AND b.s <= a.s + 3
    GROUP BY a.a_key
    ORDER BY o_orderkey
    """,
)
def join_interval_overlap(spark, sf_dir):
    """Interval-overlap join — BOTH sides are intervals (urgent-order
    vs low-priority-order 4-day activity windows [day, day+3]; match
    when the windows intersect), the join shape neither the as-of
    family (point vs history) nor join_theta_range / join_range_
    bucketed (point vs a broadcastable band table) covers: here both
    sides are fact-sized, so nothing can be broadcast.

    Distributed strategy: fixed-width bucket decomposition. Each
    interval explodes into the 7-day buckets it touches (width >=
    interval length, so <= 2 buckets per row), the join is a plain
    EQUI-join on the bucket id with the exact overlap predicate as a
    residual filter, and each matching pair is counted exactly once —
    not via distinct, but by the count-once predicate bk ==
    bucket(overlap start): the overlap start greatest(a.s, b.s) lies
    in both intervals, so exactly one shared bucket claims the pair.
    The oracle is the plain theta join — proving the decomposition
    IS the theta join is the point of the op.

    Output is aggregated per left interval (count + total overlap
    days, exact BIGINTs) so the result stays |A|-sized while the join
    itself is exercised at pair grain. At 100 TB: shuffle is keyed on
    time buckets — naturally balanced for event-time data, and W
    trades fan-out (interval_len/W + 1 copies) against per-bucket
    density exactly like every published distributed interval join."""
    o = load(spark, sf_dir, "orders")

    def side(prio, key):
        d = F.expr("unix_timestamp(o_orderdate) div 86400")
        return o.filter(F.col("o_orderpriority") == prio).select(
            F.col("o_orderkey").alias(key),
            d.alias(f"{key[0]}_s"),
            (d + 3).alias(f"{key[0]}_e"),
        )

    j = interval_overlap_pairs(
        side("1-URGENT", "a_key"), side("5-LOW", "b_key"), width=7
    )
    return (
        j.groupBy(F.col("a_key").alias("o_orderkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_overlaps"),
            F.sum(
                F.least(F.col("a_e"), F.col("b_e"))
                - F.greatest(F.col("a_s"), F.col("b_s"))
                + 1
            )
            .cast("long")
            .alias("sum_overlap_days"),
        )
        .orderBy("o_orderkey")
    )
