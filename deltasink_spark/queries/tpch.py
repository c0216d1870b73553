"""TPC-H-adapted composite query suite (SURVEY.md §2.15).

The reference publishes no query set of its own (its tree is README +
LICENSE only, /root/reference/README.md:1-2), so the canonical OLAP
composites are expressed over the driver's TPC-H-ish star schema as the
"a user could run every query they run today" proof: multi-way joins,
correlated EXISTS, scalar subqueries, OR-of-ANDs predicates, top-k with
deterministic tie-breaks — each an end-to-end plan Catalyst must get
right, not a single operator in isolation.

Adaptations (the fixtures are TPC-H-ish, not TPC-H — FIXTURES.md):
- no ``partsupp`` table -> Q2/Q9/Q11/Q16/Q20 run against the derived
  supply relation DISTINCT(l_partkey, l_suppkey) with documented
  stand-ins for the partsupp measures (see the r4 completions note
  further down);
- no ``l_commitdate``/``l_receiptdate`` -> Q4/Q12's "late" predicate is
  re-expressed as ``l_shipdate > o_orderdate + N days``, and Q21's
  lateness becomes "strictly latest ship date in the order";
- no ``c_phone``/``o_comment`` -> Q13 excludes urgent orders instead of
  comment-regex orders; Q22 groups by ``c_nationkey`` and its "no
  orders" anti-join (vacuous here: every customer has orders) becomes
  "no URGENT orders";
- date constants sit inside the fixtures' 1995-2001 range.

Determinism: every money sum goes through the exact-decimal helpers
(aggregates.dsum / sql_dsum) so partial-aggregate merge order cannot
flip the last ulp; every LIMIT is preceded by a total order (unique key
as final tie-break); ratios are a single double division of two
deterministic operands on both engines.

Scale notes (100 TB): region/nation are broadcast explicitly — they are
bounded small. supplier/part/customer are left to AQE: at bench scale
they broadcast, at warehouse scale they shuffle-hash-join on their keys,
which is the correct plan both times and needs no code change. Every
join is an equi-join on a key column (the Q4 semi-join carries its range
predicate alongside an equi-key), so all of them hash-partition cleanly;
no query below contains a cartesian product or a driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deltasink_spark.registry import query
from deltasink_spark.tables import fanout, load

from deltasink_spark.queries.aggregates import davg, dsum, sql_davg, sql_dsum

REVENUE = "l_extendedprice * (1 - l_discount)"


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --- Q3: shipping priority --------------------------------------------

Q3_DATE = "1998-03-15 00:00:00"


@query(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum(REVENUE, 6)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{Q3_DATE}'
      AND l_shipdate > TIMESTAMP '{Q3_DATE}'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 unshipped orders by revenue for one market segment.

    Plan: both filters push into their scans; two equi-joins on the
    star keys; hash-agg per order; distributed TakeOrderedAndProject
    for the LIMIT (each partition keeps its local top-10, the driver
    merges 32 heaps — never a global sort at 100 TB)."""
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev(), 6, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --- Q4: order-priority checking (EXISTS semi-join) -------------------

Q4_LO, Q4_HI = "1997-01-01 00:00:00", "1997-04-01 00:00:00"


@query(
    "tpch_q4",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{Q4_LO}'
      AND o_orderdate < TIMESTAMP '{Q4_HI}'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many orders in a quarter had a line shipped >90 days late.

    TPC-H Q4's ``l_commitdate < l_receiptdate`` is re-expressed on the
    available columns (module docstring). The EXISTS compiles to a
    LEFT SEMI hash join on ``l_orderkey`` — one shuffle each side,
    de-dup for free, and the 90-day range predicate rides along as the
    join's residual condition instead of exploding pairs."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_HI).cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAY")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- Q5: local-supplier volume (6-way join) ---------------------------

Q5_LO, Q5_HI = "1996-01-01 00:00:00", "1997-01-01 00:00:00"


@query(
    "tpch_q5",
    oracle=f"""
    SELECT n_name, {sql_dsum(REVENUE, 6)} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '{Q5_LO}'
      AND o_orderdate < TIMESTAMP '{Q5_HI}'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from intra-nation trade per Asian nation, one year.

    The classic 6-way star join. nation⨝region broadcast (bounded
    small); customer/orders/lineitem/supplier equi-join on keys with
    the extra ``c_nationkey = s_nationkey`` carried as a residual on
    the supplier join, not a separate shuffle."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(Q5_LO).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(Q5_HI).cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = F.broadcast(
        load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    )
    reg = F.broadcast(
        load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(sup, (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey))
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_rev(), 6, "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --- Q6: forecasting revenue change (scan-only agg) -------------------


@query(
    "tpch_q6",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 6)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q5_LO}'
      AND l_shipdate < TIMESTAMP '{Q5_HI}'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to small discounts — the pure scan benchmark.

    All three predicates push to the parquet reader as min/max
    row-group filters; the plan is scan -> codegen filter -> one
    partial+final agg row per task. At 100 TB this is I/O bound by
    construction, which is the point."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(Q5_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q5_HI).cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .groupBy()
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 6, "revenue"))
    )


# --- Q7: volume shipping between two nations --------------------------

Q7_N1, Q7_N2 = "NATION_1", "NATION_2"


@query(
    "tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum('volume', 6)} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               {REVENUE} AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = '{Q7_N1}' AND n2.n_name = '{Q7_N2}')
            OR (n1.n_name = '{Q7_N2}' AND n2.n_name = '{Q7_N1}'))
          AND l_shipdate >= TIMESTAMP '{Q5_LO}'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume per year between two nations.

    The nation table joins twice under different roles — aliased
    broadcasts, so the OR-pair filter runs map-side and the only
    shuffles are the three fact-key joins."""
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q5_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == Q7_N1) & (F.col("cust_nation") == Q7_N2)
    ) | ((F.col("supp_nation") == Q7_N2) & (F.col("cust_nation") == Q7_N1))
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            _rev().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume"), 6, "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- Q8: national market share ----------------------------------------


@query(
    "tpch_q8",
    oracle=f"""
    SELECT o_year,
           {sql_dsum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END", 6)}
             / {sql_dsum('volume', 6)} AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               {REVENUE} AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND o_orderdate BETWEEN TIMESTAMP '{Q5_LO}'
                              AND TIMESTAMP '1997-12-31 00:00:00'
          AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's share of a region's market for one part type.

    The share is two exact-decimal sums and ONE double division per
    year group, so the ratio is bit-deterministic at any parallelism.
    part joins pre-filtered on p_type (column-pruned scan); both
    nation roles + region broadcast."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q5_LO).cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31 00:00:00").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
        )
    )
    reg = F.broadcast(
        load(spark, sf_dir, "region")
        .filter(F.col("r_name") == "AMERICA")
        .select("r_regionkey")
    )
    n2 = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
        )
    )
    vol = _rev()
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(reg, F.col("n1_region") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            (
                dsum(
                    F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                        F.lit(0.0)
                    ),
                    6,
                )
                / dsum(F.col("volume"), 6)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --- Q10: returned-item reporting -------------------------------------

Q10_LO, Q10_HI = "1997-10-01 00:00:00", "1998-01-01 00:00:00"


@query(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, {sql_dsum(REVENUE, 6)} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '{Q10_LO}'
      AND o_orderdate < TIMESTAMP '{Q10_HI}'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in one quarter."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_HI).cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = F.broadcast(load(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev(), 6, "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --- Q13: customer order-count distribution ---------------------------


@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of non-urgent orders per customer (incl. zero bucket).

    TPC-H Q13's comment-regex exclusion becomes a priority exclusion
    (no o_comment column). The filter lives in the LEFT JOIN's ON
    clause — pushed below the join as a scan filter on orders, while
    customers with no surviving orders still emit c_count = 0.
    Integer counts only: no fp determinism surface at all."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )
    return (
        cust.join(o, cust.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --- Q14: promotion effect --------------------------------------------


@query(
    "tpch_q14",
    oracle=f"""
    SELECT 100.00 * {sql_dsum(f"CASE WHEN p_type = 'PROMO' THEN {REVENUE} ELSE 0 END", 6)}
                 / {sql_dsum(REVENUE, 6)} AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '{Q5_LO}'
      AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent of one month's revenue from promotional parts."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q5_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy()
        .agg(
            (F.lit(100.00) * dsum(promo, 6) / dsum(_rev(), 6)).alias("promo_revenue")
        )
    )


# --- Q17: small-quantity-order revenue --------------------------------


@query(
    "tpch_q17",
    oracle=f"""
    WITH part_avg AS (
        SELECT l_partkey AS pa_partkey,
               {sql_davg('l_quantity', 6)} AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {sql_dsum('l_extendedprice', 6)} / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON pa_partkey = l_partkey
    WHERE p_brand = 'Brand#12'
      AND l_quantity < 0.2 * avg_qty
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost if small-quantity orders were not taken.

    TPC-H's correlated scalar subquery (per-part average quantity)
    de-correlates into one hash-agg over lineitem joined back on
    l_partkey — exactly what a 100 TB plan wants: the avg table has
    |part| rows, not |lineitem|, and the threshold comparison
    (one double multiply) is identical on both engines."""
    li = load(spark, sf_dir, "lineitem")
    part_avg = (
        li.groupBy(F.col("l_partkey").alias("pa_partkey"))
        .agg(davg(F.col("l_quantity")).alias("avg_qty"))
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(part_avg, li.l_partkey == part_avg.pa_partkey)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .groupBy()
        .agg((dsum(F.col("l_extendedprice"), 6) / F.lit(7.0)).alias("avg_yearly"))
    )


# --- Q18: large-volume customers --------------------------------------

Q18_QTY = 250


@query(
    "tpch_q18",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey AS b_orderkey,
               {sql_dsum('l_quantity')} AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING {sql_dsum('l_quantity')} > {Q18_QTY}
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders ON o_orderkey = b_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who placed orders above a total-quantity threshold.

    The HAVING pre-aggregation shrinks lineitem to ~1% of its orders
    BEFORE any join touches orders/customer — the decisive move at
    scale (threshold 250 ~ the fixtures' 99th percentile; TPC-H's 300
    sits above this generator's max)."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("b_orderkey"))
        .agg(dsum(F.col("l_quantity"), 2, "sum_qty"))
        .filter(F.col("sum_qty") > Q18_QTY)
    )
    o = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.b_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


# --- Q19: discounted revenue (OR-of-ANDs) -----------------------------


@query(
    "tpch_q19",
    oracle=f"""
    SELECT {sql_dsum(REVENUE, 6)} AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three brand/size/quantity corridors.

    The OR-of-ANDs predicate straddles both tables; Catalyst derives
    the single-table prefilters (brand IN (...), size <= 15,
    quantity <= 30) and pushes them into each scan, so the join sees
    only corridor-plausible rows. (TPC-H's shipmode/container legs
    don't exist in this schema — brand/size/quantity carry the same
    plan shape.)"""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, s, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    corridor = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(corridor)
        .groupBy()
        .agg(dsum(_rev(), 6, "revenue"))
    )


# --- Q22: global sales opportunity (anti-join + scalar subquery) ------


@query(
    "tpch_q22",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*) AS ab
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich customers who never placed an urgent order, per nation.

    TPC-H Q22 adapted (module docstring): phone-prefix grouping ->
    c_nationkey; "no orders" -> "no URGENT orders" (every fixture
    customer has orders, so the original anti-join is vacuous). The
    scalar average broadcasts as a 1-row frame; the NOT EXISTS is a
    LEFT ANTI hash join on o_custkey over the pre-filtered urgent
    slice of orders."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .groupBy()
        .agg(davg(F.col("c_acctbal")).alias("ab"))
    )
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), 6, "totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# --- r4 completions: the remaining 9 queries of the 22-query suite ----
#
# Q2/Q9/Q11/Q16/Q20 need a part-supplier relation; the fixtures ship no
# partsupp table, but lineitem's DISTINCT (l_partkey, l_suppkey) pairs
# ARE one (who actually supplied what), so those five run against that
# derived relation with documented stand-ins for the missing partsupp
# measures: ps_supplycost -> s_acctbal preference (Q2) / 0.6 *
# p_retailprice unit-cost proxy (Q9), ps_availqty*ps_supplycost value ->
# shipped l_extendedprice value (Q11), the complaints-regex supplier
# exclusion -> s_acctbal < 0 (Q16), and ps_availqty > half-of-shipped ->
# above-average shipped share (Q20). Q12/Q21's l_commitdate/
# l_receiptdate lateness follows Q4's adaptation (shipdate vs orderdate
# + N days); Q12 groups by l_returnflag for the missing l_shipmode.


def _supply(spark, sf_dir):
    """The derived part-supplier relation: who ever supplied what."""
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )


_SUPPLY_SQL = "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem"


# --- Q1: pricing summary report ---------------------------------------

Q1_DATE = "2001-09-02 00:00:00"


@query(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice', 6)} AS sum_base_price,
           {sql_dsum(REVENUE, 6)} AS sum_disc_price,
           {sql_dsum(f'{REVENUE} * (1 + l_tax)', 6)} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_DATE}'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical pricing summary: one scan, eight aggregates, a
    6-group hash agg. Partial aggregation does ~all the work map-side
    (6 groups x 32 tasks of partials), so the shuffle carries a few
    hundred rows whatever the corpus size; every sum/avg goes through
    the exact-decimal helpers so merge order can't flip a ulp.
    (agg_hash is the abridged flagship; this is the full 8-column Q1.)"""
    # fanout: the single-row-group fixture scans as ONE task, which
    # serializes the 8-decimal-aggregate partial agg (local profile
    # only; no-op on clusters). Median 1.50 -> 0.92 s at sf0.1.
    li = fanout(
        load(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") <= F.lit(Q1_DATE).cast("timestamp")
        )
    )
    charge = _rev() * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), 2, "sum_qty"),
            dsum(F.col("l_extendedprice"), 6, "sum_base_price"),
            dsum(_rev(), 6, "sum_disc_price"),
            dsum(charge, 6, "sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Q2: best supplier per part (adapted) -----------------------------


@query(
    "tpch_q2",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL}),
    cand AS (
        SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name
        FROM part
        JOIN supply ON l_partkey = p_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_size = 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'),
    best AS (SELECT p_partkey AS b_partkey, MAX(s_acctbal) AS best_bal
             FROM cand GROUP BY p_partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM cand JOIN best ON p_partkey = b_partkey AND s_acctbal = best_bal
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best available supplier per qualifying part in a region.

    TPC-H Q2's correlated MIN(ps_supplycost) subquery, with the
    supplycost preference adapted to MAX(s_acctbal) over the derived
    supply relation (module r4 note). Same plan shape as canon after
    de-correlation: filter part -> join supply -> join supplier/nation/
    region dims (broadcast) -> per-part max -> self-join back on the
    (part, max) pair. Both sides of the double-equality join are the
    same IEEE value computed the same way, so the match is exact."""
    p = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_brand")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cand = (
        _supply(spark, sf_dir)
        .join(p, F.col("l_partkey") == p.p_partkey)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
        # two consumers (the per-part max and the self-join back) —
        # without the cut the whole 4-way dim join ran twice per
        # action (r15, guide §2.4)
        .localCheckpoint(eager=False)
    )
    best = cand.groupBy(F.col("p_partkey").alias("b_partkey")).agg(
        F.max("s_acctbal").alias("best_bal")
    )
    return (
        cand.join(
            best,
            (cand.p_partkey == best.b_partkey) & (cand.s_acctbal == best.best_bal),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --- Q9: product-type profit by nation and year (adapted) -------------

Q9_COST_RATIO = 0.6  # unit-cost proxy: 60% of retail (no ps_supplycost)


@query(
    "tpch_q9",
    oracle=f"""
    SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
           {sql_dsum(f"{REVENUE} - {Q9_COST_RATIO} * p_retailprice * l_quantity", 6)}
             AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE 'red%'
    GROUP BY n_name, YEAR(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on one product line per supplier nation per year.

    ps_supplycost * l_quantity is adapted to a constant cost ratio of
    retail price (module r4 note) — the 5-way join shape, the
    name-prefix part prefilter, and the (nation, year) rollup are
    canon. The part filter cuts lineitem by ~8/9 before the wide joins;
    supplier/nation broadcast; orders joins on its key."""
    li = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _rev() - Q9_COST_RATIO * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(profit, 6, "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# --- Q11: important inbound value per part (adapted) ------------------

Q11_NATION = "NATION_7"
Q11_FRACTION = 0.001


@query(
    "tpch_q11",
    oracle=f"""
    WITH val AS (
        SELECT l_partkey AS partkey, {sql_dsum('l_extendedprice', 6)} AS value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = '{Q11_NATION}'
        GROUP BY l_partkey),
    tot AS (SELECT CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
                     * {Q11_FRACTION} AS thresh FROM val)
    SELECT partkey, value
    FROM val, tot
    WHERE value > thresh
    ORDER BY value DESC, partkey
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose inbound value from one nation's suppliers exceeds a
    fraction of that nation's total (ps_availqty*ps_supplycost value
    adapted to shipped l_extendedprice value, module r4 note).

    The Q11 trap is the global-total scalar: it broadcasts as a 1-row
    frame joined onto the per-part aggregate — never a driver collect.
    Both levels of the sum go through exact decimal so the threshold
    is the same IEEE double on both engines."""
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name") == Q11_NATION)
        .select("n_nationkey")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(dsum(F.col("l_extendedprice"), 6, "value"))
        # NO checkpoint: A/B'd +0.5 s (r15) — cutting the aggregated
        # frame materializes every column and blocks the pipeline,
        # costing more than the duplicate threshold-side agg saves
    )
    tot = val.groupBy().agg(
        (dsum(F.col("value"), 6) * Q11_FRACTION).alias("thresh")
    )
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("value") > F.col("thresh"))
        .select("partkey", "value")
        .orderBy(F.desc("value"), "partkey")
    )


# --- Q12: late lines by priority class (adapted) ----------------------

Q12_LO, Q12_HI = "1997-01-01 00:00:00", "1998-01-01 00:00:00"


@query(
    "tpch_q12",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '{Q12_LO}'
      AND o_orderdate < TIMESTAMP '{Q12_HI}'
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did late-shipped lines concentrate in high-priority orders?

    Adapted per module r4 note: the missing l_shipmode group becomes
    l_returnflag, and l_commitdate/l_receiptdate lateness becomes
    shipdate > orderdate + 60 days (Q4's convention). The pivoted
    conditional counts are one hash agg after the fact-fact equi-join;
    the lateness range predicate rides the join as a residual."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q12_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q12_HI).cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAY")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --- Q15: top supplier by quarterly revenue ---------------------------

Q15_LO, Q15_HI = "1997-01-01 00:00:00", "1997-04-01 00:00:00"


@query(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {sql_dsum(REVENUE, 6)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q15_LO}'
          AND l_shipdate < TIMESTAMP '{Q15_HI}'
        GROUP BY l_suppkey),
    m AS (SELECT MAX(total_revenue) AS mx FROM revenue)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    JOIN m ON total_revenue = mx
    ORDER BY s_suppkey
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier(s) with the maximum revenue in one quarter — Q15
    with the revenue view inlined as a CTE. The MAX scalar broadcasts
    as a 1-row frame (like Q11's threshold and Q22's average); ties
    all surface, exactly as canon specifies. The equality join on the
    double is safe: both sides are the identical decimal-summed value."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_HI).cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev(), 6, "total_revenue")
        # NO checkpoint: A/B'd +0.5 s (r15) — same finding as Q11's
        # threshold frame; the duplicate max-side agg is cheaper than
        # materializing the cut
    )
    m = revenue.groupBy().agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(m), F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --- Q16: supplier count by part attributes (adapted) -----------------

Q16_SIZES = (1, 4, 9, 16, 25, 36, 49)


@query(
    "tpch_q16",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL})
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN supply ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'MEDIUM'
      AND p_size IN {Q16_SIZES}
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many suppliers can furnish each niche part profile.

    partsupp is the derived supply relation and the complaints-regex
    supplier exclusion becomes s_acctbal < 0 (module r4 note);
    everything else is canon Q16: negated part prefilters push to the
    part scan, the exclusion list is a broadcast LEFT ANTI join (the
    NOT IN is null-safe here — s_suppkey is a non-null key), and
    COUNT(DISTINCT) expands to a two-level hash agg."""
    p = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "MEDIUM")
            & F.col("p_size").isin(*Q16_SIZES)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    return (
        _supply(spark, sf_dir)
        .join(p, F.col("l_partkey") == p.p_partkey)
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("bad_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --- Q20: above-average suppliers of one product line (adapted) -------

Q20_LO, Q20_HI = "1997-01-01 00:00:00", "1998-01-01 00:00:00"
Q20_SHARE = 0.8


@query(
    "tpch_q20",
    oracle=f"""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey, {sql_dsum('l_quantity')} AS qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '{Q20_LO}'
          AND l_shipdate < TIMESTAMP '{Q20_HI}'
        GROUP BY l_partkey, l_suppkey),
    part_avg AS (
        SELECT l_partkey AS ap,
               CAST(SUM(CAST(qty AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*) AS aq
        FROM shipped GROUP BY l_partkey)
    SELECT DISTINCT s_suppkey, s_name, s_acctbal
    FROM shipped
    JOIN part_avg ON ap = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE qty > {Q20_SHARE} * aq AND r_name = 'ASIA'
    ORDER BY s_suppkey
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in one region who shipped an above-average share of
    some part in a product line — Q20's "who has excess stock to
    sell" with ps_availqty adapted to shipped-quantity share (module
    r4 note; one nation -> one region so the 4-supplier-per-nation
    fixtures keep a meaningful result).

    Same nested-subquery shape as canon after de-correlation: the
    per-(part, supplier) aggregate joins the per-part average (|part|
    rows, tiny) and the dims broadcast; the EXISTS against qualifying
    parts is the DISTINCT at the end."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q20_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q20_HI).cast("timestamp"))
    )
    shipped = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum(F.col("l_quantity"), 2, "qty"))
    )
    part_avg = shipped.groupBy(F.col("l_partkey").alias("ap")).agg(
        (dsum(F.col("qty"), 2) / F.count(F.lit(1))).alias("aq")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        shipped.join(part_avg, F.col("l_partkey") == F.col("ap"))
        .filter(F.col("qty") > Q20_SHARE * F.col("aq"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal")
        .distinct()
        .orderBy("s_suppkey")
    )


# --- Q21: the one supplier who held up the order (adapted) ------------


@query(
    "tpch_q21",
    oracle="""
    WITH ps AS (
        SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS smax
        FROM lineitem GROUP BY l_orderkey, l_suppkey),
    om AS (
        SELECT l_orderkey AS ok, MAX(smax) AS mx, COUNT(*) AS nsupp
        FROM ps GROUP BY l_orderkey),
    achieved AS (
        SELECT ps.l_orderkey, ps.l_suppkey, om.nsupp
        FROM ps JOIN om ON om.ok = ps.l_orderkey AND ps.smax = om.mx),
    nm AS (
        SELECT l_orderkey AS ok2, COUNT(*) AS nmax
        FROM achieved GROUP BY l_orderkey)
    SELECT s_name, COUNT(*) AS numwait
    FROM achieved
    JOIN nm ON ok2 = l_orderkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE nsupp >= 2 AND nmax = 1 AND o_orderstatus = 'F'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the sole last shipper of multi-supplier
    failed orders — Q21's blame query, with the commit/receipt
    lateness adapted to "strictly latest ship date in the order"
    (module r4 note).

    Canon Q21 is EXISTS (another supplier in the order) AND NOT EXISTS
    (another supplier also late) — a triple self-join of the fact. Both
    correlations de-correlate into per-order aggregates: supplier count
    and latest-shipper count per order (|orders| rows each), joined
    back on the order key. Three hash aggs + equi-joins instead of
    three fact-fact theta joins; at 100 TB that is the difference
    between one shuffle chain and a blow-up."""
    li = load(spark, sf_dir, "lineitem")
    # NO checkpoints on ps/achieved: A/B'd 1.65 -> 3.26 s (r15) —
    # cutting the aggregated frames materializes them and blocks the
    # pipeline for more than the duplicate agg subtrees cost
    ps = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("l_shipdate").alias("smax"))
    om = ps.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.max("smax").alias("mx"), F.count(F.lit(1)).alias("nsupp")
    )
    achieved = ps.join(
        om, (F.col("ok") == ps.l_orderkey) & (ps.smax == F.col("mx"))
    ).select("l_orderkey", "l_suppkey", "nsupp")
    nm = achieved.groupBy(F.col("l_orderkey").alias("ok2")).agg(
        F.count(F.lit(1)).alias("nmax")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        achieved.filter(F.col("nsupp") >= 2)
        .join(nm, F.col("ok2") == F.col("l_orderkey"))
        .filter(F.col("nmax") == 1)
        .join(o, F.col("l_orderkey") == o.o_orderkey, "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
