"""Fixture table access (see /root/repo/FIXTURES.md for schemas).

All queries take an ``sf_dir`` (e.g. /root/testdata/sf0.01) holding one
parquet file per table. ``load`` returns a lazy DataFrame — Catalyst
prunes columns and pushes predicates into the parquet scan, so loading
"the whole table" costs nothing until an action runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects. Read nanos as long (runtime-settable legacy
        # conf) and rebuild a microsecond timestamp; the fixture has no
        # sub-microsecond precision, so the integer div is lossless and
        # matches DuckDB's ns->datetime truncation exactly.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views for spark.sql queries."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
