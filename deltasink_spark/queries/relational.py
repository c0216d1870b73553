"""Projection / filter / conditional ops (§2.3), sort / limit / top-k /
sample (§2.7), set operations + exact dedup (§2.8).

All hot-path expressions are built-in Catalyst expressions: filters and
column pruning push into the parquet scan (verified via .explain —
PushedFilters / ReadSchema), and every query stays inside whole-stage
codegen. Raw double arithmetic (no aggregation) is IEEE-deterministic,
so outputs hash-match DuckDB without decimal games.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deltasink_spark.registry import query
from deltasink_spark.tables import load

# --- §2.3 projection / filters ------------------------------------------


@query(
    "project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           upper(l_returnflag) AS flag_uc
    FROM lineitem
    """,
)
def project(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        F.upper("l_returnflag").alias("flag_uc"),
    )


@query(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 45
      AND l_returnflag IN ('A', 'R')
      AND (l_discount > 0.05 OR l_tax < 0.02)
      AND NOT (l_linestatus LIKE 'O%')
    """,
)
def filter_pred(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(5, 45)
        & F.col("l_returnflag").isin("A", "R")
        & ((F.col("l_discount") > 0.05) | (F.col("l_tax") < 0.02))
        & ~F.col("l_linestatus").like("O%")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@query(
    "filter_null",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_norm,
           CASE WHEN NULLIF(o_totalprice, 0.0) IS NULL THEN -1.0
                ELSE o_totalprice END AS price_nz
    FROM orders
    WHERE NULLIF(o_orderpriority, 'none') IS NOT NULL
    """,
)
def filter_null(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.nullif(F.col("o_orderpriority"), F.lit("none")).isNotNull())
        .select(
            "o_orderkey",
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
                "status_norm"
            ),
            F.when(F.nullif(F.col("o_totalprice"), F.lit(0.0)).isNull(), F.lit(-1.0))
            .otherwise(F.col("o_totalprice"))
            .alias("price_nz"),
        )
    )


@query(
    "case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'jumbo'
                WHEN o_totalprice >= 150000 THEN 'large'
                WHEN o_totalprice >= 50000  THEN 'medium'
                ELSE 'small' END AS size_band,
           CASE o_orderstatus WHEN 'F' THEN 'final' WHEN 'O' THEN 'open'
                ELSE 'other' END AS status_word
    FROM orders
    """,
)
def case_when(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "jumbo")
        .when(F.col("o_totalprice") >= 150000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
        .alias("size_band"),
        F.when(F.col("o_orderstatus") == "F", "final")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_word"),
    )


# --- §2.7 sort / limit / top-k / sample ---------------------------------


@query(
    "sort_order",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer
    ORDER BY c_mktsegment ASC, c_acctbal DESC NULLS LAST, c_custkey
    """,
)
def sort_order(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment").orderBy(
        F.col("c_mktsegment").asc(),
        F.col("c_acctbal").desc_nulls_last(),
        F.col("c_custkey"),
    )


@query(
    "limit_n",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def limit_n(spark, sf_dir):
    """orderBy().limit() plans TakeOrderedAndProject: each task keeps a
    local top-10 heap, the driver merges — no global sort at scale.
    Tie-break on the unique key keeps the result deterministic."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rk
    FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rk")
    )


@query(
    "sample_frac",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE CAST(CONCAT('0x', substr(md5(l_orderkey || '-' || l_linenumber), 1, 8))
               AS BIGINT) % 10 = 0
    """,
)
def sample_frac(spark, sf_dir):
    """Deterministic ~10% hash-sample: keep rows whose md5-prefix bucket
    (mod 10) is 0. Unlike rng-seeded .sample() this is reproducible
    across engines, runs, AND repartitions — the property a 100 TB
    training-data pipeline actually needs from sampling (stable holdout
    sets, resumable jobs). The rng variant stays as df.sample() in
    tests/test_properties.py."""
    li = load(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    bucket = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % 10
    return li.filter(bucket == 0).select("l_orderkey", "l_linenumber")


# --- §2.8 set operations -------------------------------------------------


@query(
    "set_union",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000
    """,
)
def set_union(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_mktsegment")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_mktsegment")
    return a.unionByName(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    """,
)
def set_intersect(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_except(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.subtract(o)


@query(
    "dedup_exact",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def dedup_exact(spark, sf_dir):
    """Key-subset dedup, deterministic: keep the min-orderkey row per
    customer (dropDuplicates keeps an arbitrary row — useless under a
    value-hash oracle, and non-reproducible in production)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "unpivot_melt",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
           l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def unpivot_melt(spark, sf_dir):
    """Wide->long reshape (DataFrame.unpivot / melt): each row fans out
    to one row per measure column — the inverse of agg_pivot. Narrow
    Expand node, no shuffle; the oracle spells it as UNION ALL."""
    li = load(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="value",
    )


def _z_spark(x: str, y: str, bits: int) -> str:
    terms = []
    for j in range(bits):
        terms.append(f"(shiftleft(shiftright({x}, {j}) & 1, {2 * j}))")
        terms.append(f"(shiftleft(shiftright({y}, {j}) & 1, {2 * j + 1}))")
    return " + ".join(terms)


def _z_duck(x: str, y: str, bits: int) -> str:
    terms = []
    for j in range(bits):
        terms.append(f"((({x} >> {j}) & 1) << {2 * j})")
        terms.append(f"((({y} >> {j}) & 1) << {2 * j + 1})")
    return " + ".join(terms)


_Z_BITS = 10


@query(
    "zorder_cluster",
    oracle=f"""
    WITH b AS (SELECT l_orderkey, l_linenumber,
                      l_partkey % 1024 AS pk_bucket,
                      l_suppkey % 1024 AS sk_bucket
               FROM lineitem)
    SELECT l_orderkey, l_linenumber, pk_bucket, sk_bucket,
           CAST({_z_duck('pk_bucket', 'sk_bucket', _Z_BITS)} AS BIGINT) AS zkey
    FROM b
    """,
)
def zorder_cluster(spark, sf_dir):
    """Z-order (Morton) clustering key: the bits of two join/filter
    dimensions interleaved into one sort key, then a range-repartition
    + in-partition sort on it — the layout step behind multi-dimension
    data skipping (Delta OPTIMIZE ZORDER BY): after clustering, a range
    predicate on EITHER dimension touches a small band of files instead
    of all of them, because z-locality keeps both dimensions' nearby
    values in nearby rows.

    Scale shape: the z-key is pure codegen bit arithmetic; the
    clustering itself is repartitionByRange (sampled range boundaries,
    one shuffle) + sortWithinPartitions (no global sort). The oracle
    verifies the interleave bit-for-bit; the physical ordering is
    asserted in tests/test_plans.py."""
    li = load(spark, sf_dir, "lineitem")
    b = li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey") % 1024).alias("pk_bucket"),
        (F.col("l_suppkey") % 1024).alias("sk_bucket"),
    ).withColumn(
        "zkey", F.expr(_z_spark("pk_bucket", "sk_bucket", _Z_BITS)).cast("long")
    )
    return b.repartitionByRange(32, "zkey").sortWithinPartitions("zkey")


# --- hilbert_cluster: Hilbert-curve layout key (r8) --------------------

_H_BITS = 10
_H_N = 1 << _H_BITS


def _hilbert_exprs(s: int) -> tuple[str, str, str]:
    """One unrolled level of the standard xy2d walk (state columns hx,
    hy, hd): returns (new_hx, new_hy, hd_increment) SQL valid in BOTH
    engines (CASE + & + arithmetic only — no engine-specific xor)."""
    rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
    quad = (
        f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
        f"WHEN {rx} = 0 AND {ry} = 1 THEN 1 "
        f"WHEN {rx} = 1 AND {ry} = 1 THEN 2 ELSE 3 END)"
    )
    xn = f"(CASE WHEN {ry} = 1 THEN hx WHEN {rx} = 1 THEN {_H_N - 1} - hy ELSE hy END)"
    yn = f"(CASE WHEN {ry} = 1 THEN hy WHEN {rx} = 1 THEN {_H_N - 1} - hx ELSE hx END)"
    return xn, yn, f"{s * s} * {quad}"


def _hilbert_duck_ctes() -> tuple[str, str]:
    ctes = [
        "h0 AS (SELECT l_orderkey, l_linenumber, pk_bucket, sk_bucket, "
        "CAST(pk_bucket AS BIGINT) AS hx, CAST(sk_bucket AS BIGINT) AS hy, "
        "CAST(0 AS BIGINT) AS hd FROM b)"
    ]
    lvl, s = 0, _H_N // 2
    while s > 0:
        lvl += 1
        xn, yn, dinc = _hilbert_exprs(s)
        ctes.append(
            f"h{lvl} AS (SELECT l_orderkey, l_linenumber, pk_bucket, sk_bucket, "
            f"{xn} AS hx, {yn} AS hy, hd + {dinc} AS hd FROM h{lvl - 1})"
        )
        s //= 2
    return ",\n    ".join(ctes), f"h{lvl}"


_H_CTES, _H_LAST = _hilbert_duck_ctes()


@query(
    "hilbert_cluster",
    oracle=f"""
    WITH b AS (SELECT l_orderkey, l_linenumber,
                      l_partkey % {_H_N} AS pk_bucket,
                      l_suppkey % {_H_N} AS sk_bucket
               FROM lineitem),
    {_H_CTES}
    SELECT l_orderkey, l_linenumber, pk_bucket, sk_bucket, hd AS hkey
    FROM {_H_LAST}
    """,
)
def hilbert_cluster(spark, sf_dir):
    """Hilbert-curve clustering key — the layout Delta Lake's liquid
    clustering uses in place of Z-order: unlike Morton interleave
    (zorder_cluster), every step along a Hilbert curve moves to an
    ADJACENT cell, so a range predicate on either dimension touches
    strictly fewer file bands (no Z-shape diagonal jumps across the
    key space). Key = the standard xy2d walk over 10 bits/dimension,
    unrolled into 10 chained codegen projections carrying the
    (x, y, d) state columns — validated bit-for-bit against the
    textbook recursive form; the oracle replays the identical unroll
    as chained CTEs.

    Scale shape identical to zorder_cluster: pure per-row bit/CASE
    arithmetic (no shuffle) for the key, then repartitionByRange
    (sampled boundaries, one shuffle) + sortWithinPartitions — never a
    global sort."""
    li = load(spark, sf_dir, "lineitem")
    df = li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey") % _H_N).alias("pk_bucket"),
        (F.col("l_suppkey") % _H_N).alias("sk_bucket"),
    ).select(
        "*",
        F.col("pk_bucket").cast("long").alias("hx"),
        F.col("sk_bucket").cast("long").alias("hy"),
        F.lit(0).cast("long").alias("hd"),
    )
    s = _H_N // 2
    while s > 0:
        xn, yn, dinc = _hilbert_exprs(s)
        df = df.select(
            "l_orderkey",
            "l_linenumber",
            "pk_bucket",
            "sk_bucket",
            F.expr(xn).alias("hx"),
            F.expr(yn).alias("hy"),
            F.expr(f"hd + {dinc}").alias("hd"),
        )
        s //= 2
    keyed = df.select(
        "l_orderkey", "l_linenumber", "pk_bucket", "sk_bucket", F.col("hd").alias("hkey")
    )
    return keyed.repartitionByRange(32, "hkey").sortWithinPartitions("hkey")


# --- sql_interface (r4): the same SQL text on both engines ------------

# Written in the ANSI intersection of Spark SQL and DuckDB SQL: the
# ONE string below is what spark.sql() executes AND what the oracle
# hands DuckDB — dialect-portability proof for SQL-first users of the
# engine (every other op pairs DataFrame code with mirrored SQL; this
# one has nothing to mirror).
_SQL_INTERFACE = """
SELECT r.r_name AS region,
       EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(30,6))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY r.r_name, EXTRACT(YEAR FROM o.o_orderdate)
ORDER BY region, o_year
"""


@query("sql_interface", oracle=_SQL_INTERFACE)
def sql_interface(spark, sf_dir):
    """spark.sql() entry point over the registered fixture views: the
    IDENTICAL SQL string runs on Spark and on DuckDB, so a SQL-first
    user can bring their text queries unchanged. Catalyst receives the
    same logical plan as the DataFrame API would (views are lazy scans
    with pushdown intact; EXTRACT stays in codegen; the revenue sum is
    the exact-decimal convention)."""
    from deltasink_spark.tables import register_views

    register_views(
        spark, sf_dir, ("lineitem", "orders", "supplier", "nation", "region")
    )
    return spark.sql(_SQL_INTERFACE)


# --- sample_bottom_k (r4): deterministic distributed uniform sample ----

BOTTOM_K = 200


@query(
    "sample_bottom_k",
    oracle=f"""
    SELECT o_orderkey FROM (
        SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS hk
        FROM orders ORDER BY hk, o_orderkey LIMIT {BOTTOM_K})
    ORDER BY o_orderkey
    """,
)
def sample_bottom_k(spark, sf_dir):
    """Uniform sample without replacement as bottom-k-by-hash: keep the
    k keys with the smallest md5(key). This is the distributed,
    deterministic stand-in for reservoir sampling — each partition
    keeps a local bottom-k heap and the driver merges k-sized heaps
    (TakeOrderedAndProject), so one pass, no RNG state, no shuffle of
    the data, and the SAME sample whatever the partitioning or engine.
    Bottom-k hash sketches also compose: the union of two tables'
    samples is the sample of the union (merge + re-truncate), which
    true reservoirs don't do without weights.

    Scale: the only cross-partition traffic is k rows per partition;
    at 100 TB this is the primitive behind "give me 1M uniformly
    random documents" without a full shuffle or a seed-vs-partitioning
    dependence (df.sample changes with partition layout; this never
    does)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey")
    hk = F.md5(F.col("o_orderkey").cast("string"))
    return (
        o.withColumn("hk", hk)
        .orderBy("hk", "o_orderkey")
        .limit(BOTTOM_K)
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


@query(
    "sql_parameterized",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 150000 AND o_orderstatus = 'O'
    ORDER BY o_orderkey LIMIT 50
    """,
)
def sql_parameterized(spark, sf_dir):
    """Parameterized SQL (named-marker binding): values bind as typed
    literals through the engine, never by string concatenation — the
    injection-safe form every SQL-facing service should use, and
    parameter markers keep the plan cache keyed on the template. The
    Catalyst plan is identical to the literal query's (constant
    folding sees the bound literal), so pushdown still works."""
    from deltasink_spark.tables import load as _load

    _load(spark, sf_dir, "orders").createOrReplaceTempView("v_param_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM v_param_orders
        WHERE o_totalprice > :min_price AND o_orderstatus = :status
        ORDER BY o_orderkey LIMIT 50
        """,
        args={"min_price": 150000, "status": "O"},
    )


# --- sql_pipe_syntax (r6): Spark 4 SQL pipe operators ------------------

# The |> form Spark executes; the oracle is its exact ANSI equivalent
# (DuckDB has no pipe syntax — the REWRITE is what's verified).
_PIPE_SQL = """
FROM lineitem
|> WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
|> EXTEND CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS disc_price
|> AGGREGATE COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(disc_price) AS DOUBLE) AS revenue
   GROUP BY l_returnflag, l_linestatus
|> ORDER BY l_returnflag, l_linestatus
"""


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax(spark, sf_dir):
    """Spark 4's SQL pipe syntax (|> operators, SPARK-49555): the
    linear FROM -> WHERE -> EXTEND -> AGGREGATE -> ORDER BY form of a
    Q1-shaped pricing summary. Pipe stages compile to the SAME
    Catalyst logical plan as the ANSI form — pushdown, partial aggs,
    and codegen all intact — which the oracle proves by running the
    ANSI rewrite on DuckDB and hash-matching. Exact-decimal sums per
    the repo convention."""
    from deltasink_spark.tables import register_views

    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_PIPE_SQL)


# --- sql_recursive_cte (r6): WITH RECURSIVE on both engines ------------

# Identical text on both engines (sql_interface policy): a recursive
# month spine 1..12 joined against orders — the shape every calendar /
# hierarchy walk uses, in the ANSI intersection of the two dialects.
_RECURSIVE_SQL = """
WITH RECURSIVE months(m) AS (
    SELECT 1
    UNION ALL
    SELECT m + 1 FROM months WHERE m < 12
)
SELECT m,
       COUNT(o_orderkey) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
FROM months
LEFT JOIN orders ON CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) = m
GROUP BY m
ORDER BY m
"""


@query("sql_recursive_cte", oracle=_RECURSIVE_SQL)
def sql_recursive_cte(spark, sf_dir):
    """WITH RECURSIVE (landed in Spark 4.x): a recursive month spine
    joined against the fact table — the calendar/hierarchy-walk shape.
    The IDENTICAL SQL text runs on Spark and DuckDB (the sql_interface
    dialect-portability policy), so recursion semantics — anchor,
    iterate, UNION ALL termination — are differentially verified, not
    just syntax-checked. The recursion is driver-bounded (12 rows)
    and the join side is a broadcast of the spine; the fact scan
    stays a single pushdown-pruned pass."""
    from deltasink_spark.tables import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_RECURSIVE_SQL)


@query(
    "sql_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1.0 -
                 CASE WHEN l_discount < 0.0 THEN 0.0
                      WHEN l_discount > 0.08 THEN 0.08
                      ELSE l_discount END), 4) AS eff_price
    FROM lineitem WHERE l_orderkey < 2000
    """,
)
def sql_udf(spark, sf_dir):
    """SQL-defined scalar functions (Spark 4 `CREATE FUNCTION ...
    RETURNS ... RETURN <expr>`, SPARK-44747) — the UDF surface where
    the body is pure SQL, so Catalyst INLINES it into the calling plan:
    no Python worker, no serialization boundary, full whole-stage
    codegen and predicate pushdown — the polar opposite of the
    udf_scalar_py slow path, and the form a SQL-first team should
    reach for first. Two functions are created, one calling the other,
    proving nested inlining; the oracle is the hand-inlined expression
    (DuckDB's CREATE MACRO is the same concept but the oracle must be
    a single SELECT).

    Scale: indistinguishable from writing the expression inline —
    zero per-row overhead at any corpus size."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("v_sqludf_lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ds_clamp_disc(d DOUBLE) "
        "RETURNS DOUBLE RETURN CASE WHEN d < 0.0 THEN 0.0 "
        "WHEN d > 0.08 THEN 0.08 ELSE d END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ds_eff_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN ROUND(p * (1.0 - ds_clamp_disc(d)), 4)"
    )
    return spark.sql(
        "SELECT l_orderkey, l_linenumber, "
        "ds_eff_price(l_extendedprice, l_discount) AS eff_price "
        "FROM v_sqludf_lineitem WHERE l_orderkey < 2000"
    )


@query(
    "sql_session_variables",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderstatus = 'F'
      AND o_totalprice > (SELECT MAX(o_totalprice) / 2 FROM orders)
      AND o_orderkey > 0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql_session_variables(spark, sf_dir):
    """SQL scripting / session variables (Spark 4: `DECLARE VARIABLE`,
    `SET VAR`, `EXECUTE IMMEDIATE ... USING`, SPARK-46908/SPARK-44838)
    — the state-carrying SQL surface next to [sql_pipe_syntax] /
    [sql_recursive_cte] / [sql_parameterized]: a script declares typed
    session variables, SETs one from a scalar subquery over the data
    (the "compute a threshold, then use it" pattern every SQL runbook
    has), and runs a dynamically-assembled statement via EXECUTE
    IMMEDIATE that mixes variable references with a positional USING
    parameter. The oracle is the literal-substituted replay (variables
    inlined as the scalar subquery / literal they hold), proving the
    variable indirection changes nothing about the result.

    Scale: variables are session-scoped scalars resolved at analysis
    time — the executed plan is identical to the literal query's
    (pushdown, partial aggs, codegen intact); EXECUTE IMMEDIATE costs
    one extra parse on the driver, nothing per-row. The threshold
    subquery is its own 1-row broadcast-subquery stage, exactly as if
    written inline."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_sv_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE sv_status STRING DEFAULT 'F'")
    spark.sql("DECLARE OR REPLACE VARIABLE sv_minprice DOUBLE DEFAULT 0.0")
    spark.sql("SET VAR sv_minprice = (SELECT MAX(o_totalprice) / 2 FROM v_sv_orders)")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
         'SELECT o_orderpriority, COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
          FROM v_sv_orders
          WHERE o_orderstatus = sv_status
            AND o_totalprice > sv_minprice AND o_orderkey > ?
          GROUP BY o_orderpriority ORDER BY o_orderpriority'
         USING 0
        """
    )
