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


def fanout(df: DataFrame, *by: str) -> DataFrame:
    """Spread a small DataFrame across all cores before a per-row
    EXPENSIVE stage (the streamed side of a broadcast pair join, a
    tokenize/explode over docs read from one coarse row group).
    Post-aggregate frames land on 1 partition after AQE coalescing,
    and a single-row-group file scans as 1 task — either way the
    expensive stage serializes. The shuffle moves only the small input
    table, never the downstream blow-up.

    Pass a key column when one exists: hash repartition streams rows
    straight to the shuffle writer, while round-robin (no key) first
    LOCALLY SORTS every partition for retry-determinism — measurably
    slower on wide text rows.

    This is a LOCAL-PROFILE tuning (single-row-group fixture files scan
    as one task). On a cluster (``DS_LOCAL_PROFILE=0``) the scan is
    already split across executors and AQE balances downstream stages,
    so fanout becomes a no-op rather than an extra shuffle."""
    from deltasink_spark.session import local_profile

    if not local_profile():
        return df
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *by) if by else df.repartition(n)


# Catalog-style schema memo: spark.read.parquet() re-infers the schema
# from the footer on EVERY call (~80 ms driver-side at r15 measurement),
# and ops call load() 1-4x per invocation — across the 160-op bench
# that is tens of seconds of pure metadata latency. Real warehouses
# keep table schemas in a catalog; mirror that by inferring once per
# (path, mtime) and passing the schema explicitly afterwards (~15 ms).
# METADATA ONLY: no rows or plan fragments are cached — every action
# still lists and scans the parquet files, and a regenerated fixture
# (new mtime) re-infers.
_SCHEMA_CACHE: dict = {}


def _cached_schema_read(spark: SparkSession, path: str):
    import os

    try:
        key = (path, os.path.getmtime(path))
    except OSError:
        key = None
    if key is not None and key in _SCHEMA_CACHE:
        return spark.read.schema(_SCHEMA_CACHE[key]).parquet(path)
    df = spark.read.parquet(path)
    if key is not None:
        _SCHEMA_CACHE[key] = df.schema
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, f"{sf_dir}/{name}.parquet")
    return _cached_schema_read(spark, f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Load events with a ``ts`` column that is always a (UTC-naive)
    timestamp, whatever physical type the fixture was written with.

    The fixture generator has shipped ``ts`` both as parquet
    TIMESTAMP(NANOS) (which Spark's vectorized reader rejects unless
    read as a raw long) and as plain TIMESTAMP(MICROS) (which reads
    natively as TIMESTAMP_NTZ). Branch on the *loaded* dtype instead of
    assuming either: schema inspection only, no per-row cost, and the
    resulting values match DuckDB's ns->datetime truncation exactly in
    both cases.
    """
    from pyspark.sql.types import LongType, TimestampNTZType

    try:
        df = _cached_schema_read(spark, path)
    except Exception:
        # TIMESTAMP(NANOS) footer with nanosAsLong unset: schema
        # conversion fails at read time. Retry reading nanos as long.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _cached_schema_read(spark, path)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # nanos-as-long: rebuild a microsecond timestamp. The fixture
        # has no sub-microsecond precision, so the integer div is
        # lossless.
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, TimestampNTZType):
        # Downstream ops (unix_micros, window RANGE frames, watermark
        # emulation) expect the instant type; under the UTC session
        # timezone this cast is value-identical to the NTZ reading and
        # to DuckDB's naive-timestamp view of the same file.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views for spark.sql queries."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def md5_long(col) -> "F.Column":
    """Portable 32-bit hash as a BIGINT: the first 8 hex chars of
    md5(CAST(col AS STRING)). The ONE deterministic-sampling hash the
    engine uses (bottom-k samples, A-Res keys, KMV sketches,
    correlated join-size sampling) — md5 because both Spark and DuckDB
    compute it identically, so sampled/sketched ops keep exact
    oracles. SQL twin: sql_md5_long."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def sql_md5_long(expr: str) -> str:
    """DuckDB twin of md5_long over a SQL expression string."""
    return (
        f"CAST(CONCAT('0x', substr(md5(CAST({expr} AS VARCHAR)), 1, 8)) "
        "AS BIGINT)"
    )
