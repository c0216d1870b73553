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

from deltasink_spark.registry import query
from deltasink_spark.tables import load

# --- shared exact-aggregation helpers -----------------------------------


def dsum(col, scale: int = 2, alias: str | None = None):
    """Order-insensitive sum of a double column via exact decimal."""
    c = F.sum(col.cast(f"decimal(30,{scale})")).cast("double")
    return c.alias(alias) if alias else c


def davg(col, count_col="*", scale: int = 6):
    """Deterministic average: exact decimal sum / count, one double div."""
    return F.sum(col.cast(f"decimal(30,{scale})")).cast("double") / F.count(F.lit(1))


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
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
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
