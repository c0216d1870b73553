"""Ingest transforms (SURVEY.md §2.2) — the connector's per-record
pipeline, batch-emulated over events.props (the stand-in for a Kafka
JSON payload; the streaming path in deltasink_spark/streaming reuses
these same column expressions on the readStream DataFrame).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deltasink_spark.registry import query
from deltasink_spark.tables import load

PROPS_SCHEMA = "k INT"


@query(
    "json_parse",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k,
           json_extract(props, '$.k') IS NOT NULL AS parse_ok
    FROM events
    """,
)
def json_parse(spark, sf_dir):
    """bytes/string -> struct with declared schema; malformed -> null
    (PERMISSIVE mode — the dead-letter filter keys off parse_ok)."""
    ev = load(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), PROPS_SCHEMA)
    return ev.select(
        "event_id",
        parsed["k"].alias("k"),
        parsed["k"].isNotNull().alias("parse_ok"),
    )


@query(
    "json_extract_path",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_raw,
           CAST(json_extract(props, '$.k') AS INT) + 1 AS k_next
    FROM events
    """,
)
def json_extract_path(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_raw"),
        (F.get_json_object("props", "$.k").cast("int") + 1).alias("k_next"),
    )


_CANON_TYPES = {
    # Spark schema_of_json names          # DuckDB json_structure names
    "bigint": "int", "int": "int", "smallint": "int", "tinyint": "int",
    "ubigint": "int", "uinteger": "int", "integer": "int",
    "string": "str", "varchar": "str",
    "double": "float", "float": "float",
    "boolean": "bool",
}


@query(
    "json_infer_schema",
    oracle="""
    WITH s AS (SELECT json_structure(props) AS j FROM events LIMIT 1)
    SELECT array_to_string(list_sort(list_transform(json_keys(j),
             k -> k || ':' || CASE lower(json_extract_string(j, '$.' || k))
                    WHEN 'ubigint' THEN 'int' WHEN 'bigint' THEN 'int'
                    WHEN 'integer' THEN 'int' WHEN 'uinteger' THEN 'int'
                    WHEN 'varchar' THEN 'str' WHEN 'double' THEN 'float'
                    WHEN 'boolean' THEN 'bool'
                    ELSE lower(json_extract_string(j, '$.' || k)) END)),
           ',') AS schema_canon
    FROM s
    """,
)
def json_infer_schema(spark, sf_dir):
    """Schema inference over a sampled JSON payload, normalized to a
    canonical sorted `name:type` list so two engines' inferred-schema
    spellings (STRUCT<k: BIGINT> vs {"k":"UBIGINT"}) compare exactly.
    Inference itself is driver-side by nature (one sampled record);
    the full-corpus inference path is spark.read.json's sampler."""
    ev = load(spark, sf_dir, "events")
    row = ev.select("props").first()
    if row is None:  # empty feed: no record to sample -> empty result,
        # matching the oracle's zero rows (r8 empty-corpus audit)
        return ev.limit(0).select(F.lit("").alias("schema_canon"))
    sample = row[0]
    schema_txt = (
        ev.limit(1).select(F.schema_of_json(F.lit(sample)).alias("s")).first()[0]
    )
    inner = schema_txt.strip()
    if inner.upper().startswith("STRUCT<") and inner.endswith(">"):
        inner = inner[len("STRUCT<"):-1]
    pairs = []
    for part in inner.split(","):
        name, _, typ = part.strip().partition(":")
        typ = typ.strip().lower()
        pairs.append(f"{name.strip()}:{_CANON_TYPES.get(typ, typ)}")
    canon = ",".join(sorted(pairs))
    return ev.limit(1).select(F.lit(canon).alias("schema_canon"))


@query(
    "flatten_struct",
    oracle="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k
    FROM events
    """,
)
def flatten_struct(spark, sf_dir):
    """Promote nested struct fields to top-level columns (select parsed.*)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("parsed", F.from_json(F.col("props"), PROPS_SCHEMA))
        .select("event_id", "parsed.*")
    )


@query(
    "meta_columns",
    oracle="""
    SELECT event_id,
           'events' AS topic,
           CAST(user_id % 8 AS INT) AS partition,
           event_id AS offset,
           ts AS ingest_ts
    FROM events
    """,
)
def meta_columns(spark, sf_dir):
    """Attach ingest metadata columns. On the Kafka path these are the
    real topic/partition/offset/timestamp columns of the source schema;
    the batch emulation derives deterministic stand-ins."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.lit("events").alias("topic"),
        F.pmod(F.col("user_id"), F.lit(8)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("ingest_ts"),
    )


@query(
    "ts_derive_partition",
    oracle="""
    SELECT event_id, CAST(date_trunc('day', ts) AS DATE) AS dt,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr
    FROM events
    """,
)
def ts_derive_partition(spark, sf_dir):
    """Standard ingest partitioning column (dt) derived from event time;
    sinks partitionBy(dt) so readers get partition pruning for free."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_date(F.date_trunc("day", "ts")).alias("dt"),
        F.date_trunc("hour", "ts").alias("hr"),
    )


@query(
    "cast_coerce",
    oracle="""
    SELECT event_id,
           CAST(FLOOR(value) AS BIGINT) AS value_int,
           CAST(user_id AS VARCHAR) AS uid_str,
           CAST(CAST(user_id AS SMALLINT) AS INT) AS uid_small,
           CAST(value AS VARCHAR) AS value_str
    FROM events
    """,
)
def cast_coerce(spark, sf_dir):
    """Schema coercion to the sink schema. Spark casts double->int by
    truncation while DuckDB rounds, so coercion goes through FLOOR;
    double->string uses the shortest-roundtrip repr in both engines."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.floor(F.col("value")).cast("bigint").alias("value_int"),
        F.col("user_id").cast("string").alias("uid_str"),
        F.col("user_id").cast("smallint").cast("int").alias("uid_small"),
        F.col("value").cast("string").alias("value_str"),
    )


@query(
    "scd2_intervals",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS valid_to,
           CASE WHEN LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey)
                     IS NULL THEN 1 ELSE 0 END AS is_current
    FROM orders
    """,
)
def scd2_intervals(spark, sf_dir):
    """Slowly-changing-dimension type-2 build: each customer's order
    history becomes half-open validity intervals [valid_from, valid_to)
    with the latest row flagged current — the standard warehouse shape
    for as-of lookups (join_asof consumes exactly this layout). One
    window per natural key, deterministic (orderdate, orderkey) order;
    the per-key window shuffles once on the key, never globally."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@query(
    "event_sessionize",
    oracle="""
    WITH g AS (
        SELECT event_id, user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events)
    SELECT event_id, user_id, ts,
           CAST(SUM(is_start) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_seq
    FROM g
    """,
)
def event_sessionize(spark, sf_dir):
    """Batch sessionization: a 30-minute inactivity gap starts a new
    session; the session sequence number is the running count of gap
    flags per user (lag + cumsum — the classic two-window idiom over
    ONE per-user shuffle; both windows share the same partitioning so
    Catalyst plans a single Exchange+Sort). The streaming counterpart
    is win_session; this is the backfill/batch shape of the same
    semantics."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # exact microsecond gap — a seconds cast would truncate and disagree
    # with the oracle's full-precision interval comparison on fractional
    # gaps (e.g. 1800.5 s)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(prev)
    is_start = F.when(prev.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.select("event_id", "user_id", "ts", is_start.alias("is_start"))
        .withColumn("session_seq", F.sum("is_start").over(wc).cast("long"))
        .select("event_id", "user_id", "ts", "session_seq")
    )


@query(
    "xml_parse",
    oracle="""
    SELECT event_id,
           event_id AS id_attr,
           event_type AS ty,
           user_id AS uid
    FROM events
    """,
)
def xml_parse(spark, sf_dir):
    """XML payload -> struct with declared schema (from_xml, the
    json_parse sibling for XML-bearing feeds; native in Spark 4's
    StaxXmlParser — JVM-side, no Python). The document is composed
    deterministically from the events fixture (attribute + two child
    elements), then parsed back through the real XML parse path:
    attribute `id` surfaces under the default `_` attribute prefix,
    typed element extraction casts ty/uid. The oracle verifies the
    round-trip against the fixture columns directly."""
    ev = load(spark, sf_dir, "events")
    xml = F.concat(
        F.lit('<ev id="'),
        F.col("event_id").cast("string"),
        F.lit('"><ty>'),
        F.col("event_type"),
        F.lit("</ty><uid>"),
        F.col("user_id").cast("string"),
        F.lit("</uid></ev>"),
    )
    parsed = F.from_xml(xml, "`_id` BIGINT, ty STRING, uid BIGINT")
    return ev.select(
        "event_id",
        parsed["_id"].alias("id_attr"),
        parsed["ty"].alias("ty"),
        parsed["uid"].alias("uid"),
    )


@query(
    "json_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k,
           CAST(json_extract(props, '$.k') AS DOUBLE) AS k_dbl,
           json_extract(props, '$.missing') IS NOT NULL AS has_missing
    FROM events
    """,
)
def json_variant(spark, sf_dir):
    """Semi-structured ingest through the VARIANT type (Spark 4's
    binary JSON encoding — the open-format answer to schemaless
    columns): parse_json lands the payload as VARIANT once, then
    typed paths are extracted with variant_get (shredded access into
    the binary encoding, no re-parse per field) and absent paths probe
    as null via try_variant_get. At scale this is the point: one
    parse, many cheap typed extractions, columnar-friendly storage."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k"),
        F.variant_get(v, "$.k", "double").alias("k_dbl"),
        F.try_variant_get(v, "$.missing", "string").isNotNull().alias("has_missing"),
    )
