"""Aggregation operators (SURVEY.md §2.5) + the flagship query.

Determinism policy for the DuckDB differential oracle: double sums are
order-sensitive in the last ulp, and Spark's partial-aggregate merge
order is nondeterministic. Every money-sum therefore casts to decimal
INSIDE the aggregate (exact, associative, order-insensitive) and casts
the result back to double. Both engines run the identical expression, so
values hash-match bit-for-bit. Averages are expressed as exact-decimal
sum divided by count (one deterministic double division).

Scale note: all of these compile to HashAggregateExec with map-side
partial aggregation — the shuffle carries one row per (group, partition)
not per input row, which is exactly what survives a 100 TB scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deltasink_spark.registry import query
from deltasink_spark.tables import fanout, load

# --- shared exact-aggregation helpers -----------------------------------


# Input casts use precision 18: Spark decimals with <= 18 digits are
# Long-backed (UnsafeRow inline), while higher precisions go through
# Int128/BigDecimal — measured 21% faster on the Q1 agg stage at
# sf0.1. Range analysis: the cast applies PER VALUE (business amounts
# ~1e5, far under the 10^(18-scale) cap — precision never changes
# rounding, only range), and Spark's SUM widens the accumulator to
# decimal(28,scale), which holds 1e22 — safe past 100 TB row counts.
# The DuckDB oracles keep DECIMAL(30,s): identical values, since both
# engines round the same doubles at the same scale and neither
# accumulator can overflow.
def dsum(col, scale: int = 2, alias: str | None = None):
    """Order-insensitive sum of a double column via exact decimal."""
    c = F.sum(col.cast(f"decimal(18,{scale})")).cast("double")
    return c.alias(alias) if alias else c


def davg(col, count_col="*", scale: int = 6):
    """Deterministic average: exact decimal sum / count, one double div."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double") / F.count(F.lit(1))


SQL_DSUM = "CAST(SUM(CAST({expr} AS DECIMAL(30,{scale}))) AS DOUBLE)"


def sql_dsum(expr: str, scale: int = 2) -> str:
    return SQL_DSUM.format(expr=expr, scale=scale)


def sql_davg(expr: str, scale: int = 6) -> str:
    return f"{sql_dsum(expr, scale)} / COUNT(*)"


# --- flagship: TPC-H Q1-shaped pricing summary --------------------------

Q1_CUTOFF = "1998-09-02 00:00:00"


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan -> filter -> project -> partial+final hash agg -> sort.

    The minimum end-to-end slice: the shipdate filter is pushed into the
    parquet scan, only 7 of 11 lineitem columns are read, and the agg
    shuffles one row per (returnflag, linestatus) group per map task.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        # fanout: the single-row-group fixture file scans as ONE task,
        # which serializes the 8-decimal-aggregate partial agg (local
        # profile only — a real multi-row-group table scans parallel
        # and fanout is a no-op). Measured 2.0 -> 1.2 s at sf0.1.
        fanout(li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), 2, "sum_qty"),
            dsum(F.col("l_extendedprice"), 2, "sum_base_price"),
            dsum(disc_price, 6, "sum_disc_price"),
            dsum(charge, 6, "sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


query(
    "agg_hash",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 6)} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)(pricing_summary)


# --- §2.5 the rest of the aggregation surface ---------------------------


@query(
    "agg_global",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           {sql_dsum('l_extendedprice')} AS total_price,
           {sql_dsum('l_quantity')} AS total_qty,
           MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
    FROM lineitem
    """,
)
def agg_global(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum(F.col("l_extendedprice"), 2, "total_price"),
        dsum(F.col("l_quantity"), 2, "total_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_dist_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.sum_distinct(F.col("l_quantity").cast("decimal(30,2)"))
        .cast("double")
        .alias("sum_dist_qty"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS within_band
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark, sf_dir):
    """HLL++ cardinality, one partial-merged pass. Deliberately NOT
    combined with an exact countDistinct in the same agg: mixing
    distinct and non-distinct aggregates makes Spark plan the Expand
    path (input rows duplicated per aggregate family + an extra
    shuffle, measured ~3x slower) — the exact count runs as its own
    agg and joins back on the 3-row key. The raw estimate is
    engine-specific, so the driver-facing output is the exact count
    plus a `within_band` proof that the estimate landed inside its
    3-sigma rsd envelope (rsd 0.02 -> 6%); the oracle asserts TRUE."""
    li = load(spark, sf_dir, "lineitem")
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    return approx.join(exact, "l_returnflag").select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            / F.col("exact_orders")
            <= 0.06
        ).alias("within_band"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT n_nationkey,
           list_aggregate(list_sort(list(c_mktsegment)), 'string_agg', ',') AS segs,
           list_aggregate(list_sort(list(DISTINCT c_mktsegment)), 'string_agg', ',') AS seg_set
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
)
def agg_collect(spark, sf_dir):
    """collect_list/collect_set per group. Driver-facing output is the
    sorted list joined to one string: the harness canonicalizer
    (pandas sort_values/factorize) cannot hash array cells, so arrays
    are stringified identically on both engines. The raw
    array-returning variant stays covered by tests/test_properties.py."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("c_mktsegment"))).alias("segs"),
            F.concat_ws(",", F.sort_array(F.collect_set("c_mktsegment"))).alias("seg_set"),
        )
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
           ROUND(covar_samp(l_extendedprice, l_quantity), 2) AS cov_pq,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
           ROUND(quantile_cont(l_extendedprice, 0.9), 2) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark, sf_dir):
    """Moment stats are merge-order-sensitive in the last ulp -> round
    to a tolerance far above fp noise but far below data resolution."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("cov_pq"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("med_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 2).alias("p90_price"),
    )


_ROLLUP_ORACLE = f"""
    SELECT r_name, n_name,
           COUNT(*) AS n_cust,
           {sql_dsum('c_acctbal', 2)} AS total_bal,
           CAST(GROUPING(r_name) AS INT) AS g_r,
           CAST(GROUPING(n_name) AS INT) AS g_n
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
"""


@query("agg_rollup", oracle=_ROLLUP_ORACLE)
def agg_rollup(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        dsum(F.col("c_acctbal"), 2, "total_bal"),
        F.grouping("r_name").cast("int").alias("g_r"),
        F.grouping("n_name").cast("int").alias("g_n"),
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty,
           CAST(GROUPING(l_returnflag) AS INT) AS g_f,
           CAST(GROUPING(l_linestatus) AS INT) AS g_s
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("l_quantity"), 2, "sum_qty"),
        F.grouping("l_returnflag").cast("int").alias("g_f"),
        F.grouping("l_linestatus").cast("int").alias("g_s"),
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, {sql_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n, {sql_dsum('o_totalprice')} AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_pivot",
    oracle=f"""
    SELECT user_id,
           COALESCE({sql_dsum("CASE WHEN event_type = 'purchase' THEN value END", 6)}, 0.0) AS purchase_v,
           COALESCE({sql_dsum("CASE WHEN event_type = 'click' THEN value END", 6)}, 0.0) AS click_v,
           COALESCE({sql_dsum("CASE WHEN event_type = 'error' THEN value END", 6)}, 0.0) AS error_v
    FROM events GROUP BY user_id
    """,
)
def agg_pivot(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    pv = (
        ev.groupBy("user_id")
        .pivot("event_type", ["purchase", "click", "error"])
        .agg(F.sum(F.col("value").cast("decimal(30,6)")).cast("double"))
    )
    return pv.select(
        "user_id",
        F.coalesce(F.col("purchase"), F.lit(0.0)).alias("purchase_v"),
        F.coalesce(F.col("click"), F.lit(0.0)).alias("click_v"),
        F.coalesce(F.col("error"), F.lit(0.0)).alias("error_v"),
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 50.0) * 50 AS DOUBLE) AS bucket,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def agg_histogram(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket", (F.floor(F.col("value") / 50.0) * 50).cast("double"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_quantile",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE), 4) AS p25,
           ROUND(CAST(quantile_cont(l_quantity, 0.50) AS DOUBLE), 4) AS p50,
           ROUND(CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE), 4) AS p75,
           ROUND(CAST(quantile_cont(l_quantity, 0.99) AS DOUBLE), 4) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_quantile(spark, sf_dir):
    """EXACT continuous percentiles per group (linear interpolation —
    both engines implement the same lower+frac*(upper-lower) rule, so
    ROUND(_, 4) compares exactly). percentile() sorts per group; at
    100 TB the skew-safe path is approx_percentile (t-digest partial
    merge) — exact here because the oracle must be exact."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(F.percentile("l_quantity", F.lit(q)), 4).alias(name)
            for q, name in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.99, "p99")]
        ]
    )


@query(
    "agg_approx_quantile",
    oracle="""
    SELECT l_linestatus,
           quantile_disc(l_quantity, 0.25) AS q25,
           quantile_disc(l_quantity, 0.50) AS q50,
           quantile_disc(l_quantity, 0.75) AS q75,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_linestatus
    """,
)
def agg_approx_quantile(spark, sf_dir):
    """approx_percentile — the DISTRIBUTED quantile path: per-partition
    Greenwald-Khanna sketches merged at the reducer, never a per-group
    sort. At the test scale the accuracy parameter (1e6) exceeds the
    group sizes, so the rank error is < 1 row and the sketch answer
    equals DuckDB's exact discrete quantile — the same
    verify-the-approx-path-exactly trick as sim_ann_lsh. At 100 TB the
    identical plan runs at accuracy 1e4 with bounded memory; contrast
    agg_quantile, whose exact percentile() must sort each group."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.percentile_approx("l_quantity", F.lit(0.25), F.lit(1_000_000)).alias("q25"),
        F.percentile_approx("l_quantity", F.lit(0.50), F.lit(1_000_000)).alias("q50"),
        F.percentile_approx("l_quantity", F.lit(0.75), F.lit(1_000_000)).alias("q75"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@query(
    "agg_argmax",
    oracle="""
    SELECT c_nationkey, c_acctbal AS top_acctbal, c_custkey AS top_custkey
    FROM (
        SELECT c_nationkey, c_acctbal, c_custkey,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey DESC) AS rk
        FROM customer
    ) WHERE rk = 1
    """,
)
def agg_argmax(spark, sf_dir):
    """Argmax as ONE aggregate: max over a (value, key) struct compares
    lexicographically, so the group's top balance AND the customer
    holding it come out of a single partial+final agg — no per-group
    window, no second join; the custkey field doubles as the
    deterministic tie-break. Spark plans a struct-typed max as
    SortAggregate (structs have no mutable hash-agg buffer), which
    still combines map-side; packing the pair into one primitive (e.g.
    cents*2^40+key when value precision and key range allow) upgrades
    it to a pure HashAggregate. Either way beats the window-rank idiom
    the oracle spells — a window shuffles and sorts every group's full
    row set, the agg merges one struct per group per partition."""
    c = load(spark, sf_dir, "customer")
    m = F.max(F.struct("c_acctbal", "c_custkey"))
    return (
        c.groupBy("c_nationkey")
        .agg(m.alias("m"))
        .select(
            "c_nationkey",
            F.col("m.c_acctbal").alias("top_acctbal"),
            F.col("m.c_custkey").alias("top_custkey"),
        )
    )


# Exact-decimal moment sums: corr from raw moments is deterministic
# only if every sum is order-insensitive; doubles are not, DECIMAL is.
_D = "DECIMAL(38,6)"


@query(
    "agg_corr",
    oracle=f"""
    WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(l_quantity AS {_D})) AS sx,
               SUM(CAST(l_extendedprice AS {_D})) AS sy,
               SUM(CAST(l_quantity AS {_D}) * CAST(l_quantity AS {_D})) AS sxx,
               SUM(CAST(l_extendedprice AS {_D}) * CAST(l_extendedprice AS {_D})) AS syy,
               SUM(CAST(l_quantity AS {_D}) * CAST(l_extendedprice AS {_D})) AS sxy
        FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS corr_qty_price
    FROM m
    """,
)
def agg_corr(spark, sf_dir):
    """Pearson correlation per group WITHOUT the builtin corr(): the
    builtin accumulates IEEE doubles, so its low bits depend on
    partition merge order — rerun the same query, get a different 15th
    decimal, and a value-hash differential test flips. Instead the five
    raw moments are summed in exact DECIMAL (associative, order-
    insensitive — the same dsum trick as the flagship agg), and the
    correlation is assembled from them in one deterministic double
    expression. Same single hash-agg shape and map-side combine as
    corr(); bit-stable at any parallelism."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast(_D.lower())
    y = F.col("l_extendedprice").cast(_D.lower())
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return m.select(
        "l_returnflag", "n", F.round(num / den, 6).alias("corr_qty_price")
    )


@query(
    "agg_bool_family",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT)
             AS n_big,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'P') AS any_pending,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_status
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_bool_family(spark, sf_dir):
    """Predicate-aggregate family: count_if / every / any — the
    data-quality assertion shape (SLA checks, validation dashboards).
    All fold to single-bit partial states, so the map-side combine
    carries one boolean/long per group regardless of input size."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 100000).cast("long").alias("n_big"),
        F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.some(F.col("o_orderstatus") == "P").alias("any_pending"),
        F.countDistinct("o_orderstatus").cast("long").alias("n_status"),
    )


@query(
    "agg_listagg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names,
           string_agg(DISTINCT substr(n_name, 1, 1), ',' ORDER BY substr(n_name, 1, 1))
             AS initials
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_listagg(spark, sf_dir):
    """ANSI LISTAGG ... WITHIN GROUP (ORDER BY ...) — ordered string
    aggregation with an explicit in-group sort (the deterministic form;
    bare listagg order is undefined), plus the DISTINCT variant. The
    within-group ordering is what makes the result hashable by the
    oracle at any parallelism."""
    n = load(spark, sf_dir, "nation")
    n.createOrReplaceTempView("v_nation_listagg")
    return spark.sql("""
        SELECT n_regionkey,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names,
               listagg(DISTINCT substr(n_name, 1, 1), ',')
                 WITHIN GROUP (ORDER BY substr(n_name, 1, 1)) AS initials
        FROM v_nation_listagg GROUP BY n_regionkey
    """)


@query(
    "agg_percentile_disc",
    oracle="""
    WITH n AS (SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1),
    r AS (SELECT l.l_returnflag, l.l_quantity,
                 ROW_NUMBER() OVER (PARTITION BY l.l_returnflag
                                    ORDER BY l.l_quantity) AS rnk,
                 n.n
          FROM lineitem l JOIN n USING (l_returnflag))
    SELECT l_returnflag,
           MAX(CASE WHEN rnk = CAST(CEIL(n * 0.25) AS BIGINT)
                    THEN l_quantity END) AS p25,
           MAX(CASE WHEN rnk = CAST(CEIL(n * 0.50) AS BIGINT)
                    THEN l_quantity END) AS p50,
           MAX(CASE WHEN rnk = CAST(CEIL(n * 0.75) AS BIGINT)
                    THEN l_quantity END) AS p75
    FROM r GROUP BY l_returnflag
    """,
)
def agg_percentile_disc(spark, sf_dir):
    """DISCRETE percentiles (type-1 order statistics: the value AT
    rank ceil(p*n), always an actual data value — what percentile_disc
    / quantile_disc return, vs agg_quantile's interpolated continuous
    form). Engines disagree on quantile_disc's rank convention, so
    BOTH sides build the identical rank construction explicitly: count
    per group (broadcast), row_number over (group, value), pick the
    three target ranks in one conditional-max hash agg. The per-group
    sort is the inherent cost of any exact order statistic (same class
    as agg_quantile); ties on value are harmless because rank
    selection returns the value, not the row."""
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    n = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    r = li.join(F.broadcast(n), "l_returnflag").withColumn(
        "rnk", F.row_number().over(w)
    )
    def at(p, name):
        return F.max(
            F.when(F.col("rnk") == F.ceil(F.col("n") * p).cast("bigint"), F.col("l_quantity"))
        ).alias(name)
    return r.groupBy("l_returnflag").agg(at(0.25, "p25"), at(0.50, "p50"), at(0.75, "p75"))


@query(
    "agg_regression",
    oracle=f"""
    WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(l_quantity AS {_D})) AS sx,
               SUM(CAST(l_extendedprice AS {_D})) AS sy,
               SUM(CAST(l_quantity AS {_D}) * CAST(l_quantity AS {_D})) AS sxx,
               SUM(CAST(l_extendedprice AS {_D}) * CAST(l_extendedprice AS {_D})) AS syy,
               SUM(CAST(l_quantity AS {_D}) * CAST(l_extendedprice AS {_D})) AS sxy
        FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           ROUND((CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                 / n, 6) AS intercept,
           ROUND((CAST(n * sxy - sx * sy AS DOUBLE)
                  * CAST(n * sxy - sx * sy AS DOUBLE))
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
    FROM m
    """,
)
def agg_regression(spark, sf_dir):
    """Linear-regression aggregate family (REGR_SLOPE / REGR_INTERCEPT
    / r^2) per group, WITHOUT the builtin regr_* functions — like
    agg_corr, the builtins accumulate IEEE doubles whose low bits
    depend on partition merge order. The five raw moments sum in exact
    DECIMAL (associative, order-insensitive); slope, intercept and r^2
    are assembled from them in deterministic double expressions. One
    map-side-combining hash agg — the same cost as the builtin at any
    scale."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast(_D.lower())
    y = F.col("l_extendedprice").cast(_D.lower())
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    den_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = num / den_x
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n")
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(num * num / (den_x * den_y), 6).alias("r2"),
    )


@query(
    "agg_exact_median_twopass",
    oracle="""
    WITH c AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v FROM orders)
    SELECT v AS median_cents, n FROM (
        SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM c) t
    WHERE rn = (n + 1) // 2
    """,
)
def agg_exact_median_twopass(spark, sf_dir):
    """EXACT global median (lower median, rank (n+1) div 2) without
    ever sorting the data: the two-pass bucket-histogram selection
    every engine uses when an exact order statistic is demanded at
    scale. Pass 1 collapses the table to a per-bucket histogram
    (1e6-cent buckets, one combining hash agg); a serial prefix over
    the |buckets|-sized frame locates the bucket holding the target
    rank and the residual rank within it. Pass 2 re-scans ONLY that
    bucket's rows (broadcast 1-row target joins as the filter),
    histograms per distinct value, and a prefix over that bounded
    frame picks the value at the residual rank.

    The oracle is the textbook global ROW_NUMBER construction —
    proving the bucket selection IS the order statistic. Contrast
    [agg_quantile] (per-group percentile(), a per-group sort) and
    [agg_approx_quantile]: this is the exact-answer scale path. At
    100 TB the only serial work is the |buckets| prefix and the
    inside-one-bucket prefix; recurse the bucketing if a single
    bucket's distinct values ever outgrow one task."""
    o = load(spark, sf_dir, "orders")
    v = F.round(F.col("o_totalprice") * 100).cast("long")
    c = o.select(v.alias("v")).withColumn(
        "b", F.expr("v div 1000000").cast("long")
    )
    bk = c.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("k"))
    wall = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    wtot = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pref = bk.select(
        "b",
        "k",
        F.sum("k").over(wall).cast("long").alias("cum"),
        F.sum("k").over(wtot).cast("long").alias("n"),
    ).withColumn("rank", F.expr("(n + 1) div 2").cast("long"))
    tb = pref.filter(
        (F.col("cum") >= F.col("rank")) & (F.col("cum") - F.col("k") < F.col("rank"))
    ).select("b", (F.col("rank") - (F.col("cum") - F.col("k"))).alias("r"), "n")
    inb = (
        c.join(F.broadcast(tb), "b")
        .groupBy("v", "r", "n")
        .agg(F.count(F.lit(1)).cast("long").alias("k2"))
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    picked = inb.select(
        "v",
        "r",
        "n",
        "k2",
        F.sum("k2").over(wv).cast("long").alias("cum2"),
    ).filter(
        (F.col("cum2") >= F.col("r")) & (F.col("cum2") - F.col("k2") < F.col("r"))
    )
    return picked.select(F.col("v").alias("median_cents"), "n")


@query(
    "agg_exact_percentiles_multiprobe",
    oracle="""
    WITH c AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v FROM orders),
    t AS (SELECT p FROM (VALUES (0.25), (0.5), (0.75), (0.99)) AS t(p)),
    r AS (
        SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM c)
    SELECT t.p, r.v AS value_cents, r.n
    FROM t JOIN r
      ON r.rn = GREATEST(CAST(1 AS BIGINT),
                         CAST(CEIL(t.p * r.n) AS BIGINT))
    ORDER BY t.p
    """,
)
def agg_exact_percentiles_multiprobe(spark, sf_dir):
    """EXACT percentile VECTOR (p25/p50/p75/p99, type-1 / value at
    rank ceil(p*n)) with NO global sort — [agg_exact_median_twopass]'s
    bucket-histogram selection generalized to every target in the SAME
    two passes: pass 1 builds ONE 1e6-cent bucket histogram and the
    tiny-frame prefix locates all four (bucket, residual rank) targets
    at once (the 4-row target frame cross-joins the |buckets| prefix);
    pass 2 re-scans only the union of target buckets (broadcast,
    tagged by p), histograms per (p, value), and a per-p prefix picks
    each value. This is what an engine's exact-quantile path actually
    does — one histogram amortized across the whole quantile vector.

    Oracle: the textbook global ROW_NUMBER construction per target.
    Both engines compute rank = greatest(1, ceil(p*n)) from the SAME
    IEEE doubles, so the rank choice cannot diverge.

    Scale: two fact scans total (not two per quantile), windows only
    on the |buckets| / in-target-bucket frames."""
    o = load(spark, sf_dir, "orders")
    v = F.round(F.col("o_totalprice") * 100).cast("long")
    c = o.select(v.alias("v")).withColumn(
        "b", F.expr("v div 1000000").cast("long")
    )
    bk = c.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("k"))
    wall = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    wtot = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pref = bk.select(
        "b",
        "k",
        F.sum("k").over(wall).cast("long").alias("cum"),
        F.sum("k").over(wtot).cast("long").alias("n"),
    )
    t = spark.createDataFrame([(0.25,), (0.5,), (0.75,), (0.99,)], "p double")
    targets = (
        pref.crossJoin(F.broadcast(t))
        .withColumn(
            "rank",
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.col("p") * F.col("n")).cast("long"),
            ),
        )
        .filter(
            (F.col("cum") >= F.col("rank"))
            & (F.col("cum") - F.col("k") < F.col("rank"))
        )
        .select(
            "p", "b", (F.col("rank") - (F.col("cum") - F.col("k"))).alias("r"), "n"
        )
    )
    inb = (
        c.join(F.broadcast(targets), "b")
        .groupBy("p", "v", "r", "n")
        .agg(F.count(F.lit(1)).cast("long").alias("k2"))
    )
    wv = (
        Window.partitionBy("p")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    picked = inb.withColumn("cum2", F.sum("k2").over(wv).cast("long")).filter(
        (F.col("cum2") >= F.col("r")) & (F.col("cum2") - F.col("k2") < F.col("r"))
    )
    return picked.select(
        "p", F.col("v").alias("value_cents"), "n"
    ).orderBy("p")
