"""Scalar function families (SURVEY.md §2.9).

Each op exercises one family end-to-end through Catalyst built-ins (all
JVM-side, whole-stage-codegen'd — no Python in any of these paths).
Engine-parity traps handled explicitly:
- Spark floor/ceil(double) return LONG, DuckDB return DOUBLE -> cast.
- Spark cast(double AS int) truncates, DuckDB rounds -> floor first.
- Spark dayofweek is Sunday=1; use weekday() (Monday=0) == isodow-1.
- DuckDB lacks initcap/months_between; families test the common core.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from deltasink_spark.registry import query
from deltasink_spark.tables import load


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS name_lc,
           upper(c_mktsegment) AS seg_uc,
           length(c_name) AS name_len,
           substr(c_name, 1, 8) AS name_pfx,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_pad,
           concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
           replace(c_name, '#', '_') AS name_repl,
           instr(c_name, '#') AS hash_pos,
           trim('  pad  ') AS trimmed
    FROM customer
    """,
)
def fn_string(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lc"),
        F.upper("c_mktsegment").alias("seg_uc"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_pfx"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_pad"),
        F.concat_ws("-", "c_mktsegment", F.col("c_custkey").cast("string")).alias("seg_key"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("_")).alias("name_repl"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           regexp_matches(p_name, '^[a-z]+ ') AS starts_word,
           len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels
    FROM part
    """,
)
def fn_regex(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.col("p_name").rlike("^[a-z]+ ").alias("starts_word"),
        F.regexp_count("p_name", F.lit("[aeiou]")).cast("bigint").alias("n_vowels"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(isodow(o_orderdate) - 1 AS INT) AS wd,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INT)
               AS days_to_99,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           CAST(o_orderdate AS DATE) AS odate
    FROM orders
    """,
)
def fn_date(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.weekday("o_orderdate").cast("int").alias("wd"),
        F.datediff(F.lit("1999-01-01").cast("date"), F.to_date("o_orderdate"))
        .cast("int")
        .alias("days_to_99"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.to_date("o_orderdate").alias("odate"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           CAST(FLOOR(l_discount * 100) AS BIGINT) AS disc_pct,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_up,
           ABS(l_quantity - 25.0) AS dist25,
           POW(l_discount, 2) AS disc_sq,
           SQRT(l_quantity) AS qty_sqrt,
           ROUND(EXP(l_discount), 6) AS disc_exp,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           ROUND(LOG10(l_extendedprice), 6) AS price_log10,
           CAST(SIGN(l_quantity - 25.0) AS INT) AS sgn,
           MOD(CAST(l_orderkey AS BIGINT), 7) AS key_mod,
           GREATEST(l_quantity, 25.0) AS hi,
           LEAST(l_quantity, 25.0) AS lo
    FROM lineitem
    """,
)
def fn_math(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    q, d, p = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(p, 1).alias("price_r1"),
        F.floor(d * 100).cast("bigint").alias("disc_pct"),
        F.ceil(q).cast("bigint").alias("qty_up"),
        F.abs(q - 25.0).alias("dist25"),
        F.pow(d, 2).alias("disc_sq"),
        F.sqrt(q).alias("qty_sqrt"),
        F.round(F.exp(d), 6).alias("disc_exp"),
        F.round(F.log(p), 6).alias("price_ln"),
        F.round(F.log10(p), 6).alias("price_log10"),
        F.signum(q - 25.0).cast("int").alias("sgn"),
        F.pmod(F.col("l_orderkey").cast("bigint"), F.lit(7)).alias("key_mod"),
        F.greatest(q, F.lit(25.0)).alias("hi"),
        F.least(q, F.lit(25.0)).alias("lo"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           sha256(text) AS sha_hex,
           md5(text) AS md5_hex,
           length(sha256(text)) AS sha_len
    FROM documents
    """,
)
def fn_hash(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.sha2("text", 256).alias("sha_hex"),
        F.md5("text").alias("md5_hex"),
        F.length(F.sha2("text", 256)).alias("sha_len"),
    )


@query(
    "fn_array",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
               WHERE text IS NOT NULL)
    SELECT doc_id,
           len(toks) AS n_toks,
           list_contains(toks, 'scan') AS has_scan,
           len(list_distinct(toks)) AS n_uniq,
           array_to_string(list_sort(toks)[1:3], ',') AS first3_sorted,
           array_to_string(list_transform(toks[1:5], x -> upper(x)), ',') AS head_uc,
           len(list_filter(toks, x -> length(x) > 4)) AS n_long,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars
    FROM t
    """,
)
def fn_array(spark, sf_dir):
    """Array-valued outputs stringified (concat_ws / array_to_string on
    both engines) — the harness canonicalizer cannot hash array cells.
    Raw-array behavior covered by tests/test_properties.py."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())  # NULL-text contract (r8 null audit): drop at ingest, mirrored in oracle
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.array_contains(toks, "scan").alias("has_scan"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.concat_ws(",", F.slice(F.sort_array(toks), 1, 3)).alias("first3_sorted"),
        F.concat_ws(
            ",", F.transform(F.slice(toks, 1, 5), lambda x: F.upper(x))
        ).alias("head_uc"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
        ).cast("bigint").alias("total_chars"),
    )


@query(
    "fn_map",
    oracle="""
    WITH t AS (SELECT event_id,
                      MAP(['uid', 'eid'], [user_id, event_id]) AS m
               FROM events)
    SELECT event_id,
           m['uid'][1] AS uid_val,
           CAST(cardinality(m) AS BIGINT) AS m_size,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
           array_to_string(list_sort(map_values(m)), ',') AS vals_sorted
    FROM t
    """,
)
def fn_map(spark, sf_dir):
    """Map key/value lists stringified for the harness canonicalizer
    (array cells are unhashable in its pandas sort); raw map surface
    covered by tests/test_properties.py::test_raw_array_surfaces."""
    ev = load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("uid"), F.col("user_id"), F.lit("eid"), F.col("event_id")
    )
    return ev.select(
        "event_id",
        F.element_at(m, "uid").alias("uid_val"),
        F.size(m).cast("bigint").alias("m_size"),
        F.concat_ws(",", F.sort_array(F.map_keys(m))).alias("keys_sorted"),
        F.concat_ws(",", F.sort_array(F.map_values(m))).alias("vals_sorted"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
           json_valid(props) AS is_json
    FROM events
    """,
)
def fn_json(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    # NULL props -> NULL is_json (SQL NULL propagation, as DuckDB's
    # json_valid; from_json's struct-isNotNull would say False) — r8
    # null audit
    return ev.select(
        "event_id",
        parsed["k"].alias("k_val"),
        F.get_json_object(F.col("props"), "$.k").alias("k_str"),
        F.when(F.col("props").isNull(), F.lit(None).cast("boolean"))
        .otherwise(parsed.isNotNull())
        .alias("is_json"),
    )


@query(
    "fn_conv",
    oracle="""
    SELECT s_suppkey,
           CAST(s_suppkey AS VARCHAR) AS key_str,
           CAST(FLOOR(s_acctbal) AS BIGINT) AS bal_int,
           upper(to_hex(s_suppkey)) AS key_hex,
           bin(s_suppkey) AS key_bin,
           ascii(substr(s_name, 1, 1)) AS first_ascii,
           chr(65 + CAST(s_suppkey % 26 AS INT)) AS letter
    FROM supplier
    """,
)
def fn_conv(spark, sf_dir):
    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.col("s_suppkey").cast("string").alias("key_str"),
        F.floor(F.col("s_acctbal")).cast("bigint").alias("bal_int"),
        F.upper(F.hex(F.col("s_suppkey"))).alias("key_hex"),
        F.bin(F.col("s_suppkey")).alias("key_bin"),
        F.ascii(F.substring("s_name", 1, 1)).alias("first_ascii"),
        F.chr(F.lit(65) + F.pmod(F.col("s_suppkey"), F.lit(26)).cast("int")).alias("letter"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS lo_byte,
           l_orderkey | 15 AS with_flags,
           xor(l_orderkey, l_partkey) AS key_mix,
           CAST(l_linenumber AS BIGINT) << 3 AS shifted,
           CAST(bit_count(l_orderkey) AS INT) AS popcount
    FROM lineitem WHERE l_orderkey < 400
    """,
)
def fn_bitwise(spark, sf_dir):
    """Bitwise scalar family: AND/OR/XOR, shifts, popcount — the
    primitives behind bitmap indexes, bloom-filter probes, and the
    z-order interleave. All pure codegen; note DuckDB's ^ is
    exponentiation, so the oracle spells xor() explicitly."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 400)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_orderkey").bitwiseAND(F.lit(255))).alias("lo_byte"),
        (F.col("l_orderkey").bitwiseOR(F.lit(15))).alias("with_flags"),
        (F.col("l_orderkey").bitwiseXOR(F.col("l_partkey"))).alias("key_mix"),
        F.shiftleft(F.col("l_linenumber").cast("long"), 3).alias("shifted"),
        F.bit_count("l_orderkey").alias("popcount"),
    )


@query(
    "fn_posexplode",
    oracle="""
    SELECT n_nationkey,
           CAST(generate_subscripts(chars, 1) - 1 AS INT) AS pos,
           unnest(chars) AS token
    FROM (SELECT n_nationkey, string_split(n_name, '') AS chars FROM nation) t
    """,
)
def fn_posexplode(spark, sf_dir):
    """Ordinal-preserving explode (posexplode / UNNEST WITH
    ORDINALITY): each array element carries its position — required
    whenever downstream must reconstruct order after a shuffle
    (chunk ids, token positions). Narrow generator, no shuffle."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.posexplode(F.split(F.col("n_name"), "")),
    ).select("n_nationkey", "pos", F.col("col").alias("token"))


@query(
    "fn_url",
    oracle="""
    WITH u AS (
        SELECT c_custkey,
               'https://ex-' || lower(c_mktsegment) || '.example.com/seg/'
                   || c_custkey || '?id=' || c_custkey || '&lim=10#frag' AS url
        FROM customer)
    SELECT c_custkey,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '://([^/]+)/', 1) AS host,
           regexp_extract(url, '://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS qry,
           regexp_extract(url, '#(.*)$', 1) AS ref,
           regexp_extract(url, '[?&]id=([^&#]*)', 1) AS id_param
    FROM u
    """,
)
def fn_url(spark, sf_dir):
    """URL component extraction (parse_url family): protocol, host,
    path, query string, fragment, and a named query parameter — the
    scalar surface behind web-corpus ingest (host-level dedup, URL
    canonicalization, robots filtering). The URL is composed
    deterministically from the customer fixture so the DuckDB oracle
    (which lacks parse_url) can verify the SAME components via regex
    over the same composed string. All JVM codegen, no Python."""
    c = load(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://ex-"),
        F.lower("c_mktsegment"),
        F.lit(".example.com/seg/"),
        F.col("c_custkey").cast("string"),
        F.lit("?id="),
        F.col("c_custkey").cast("string"),
        F.lit("&lim=10#frag"),
    )
    u = c.select("c_custkey", url.alias("url"))
    return u.select(
        "c_custkey",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("qry"),
        F.parse_url("url", F.lit("REF")).alias("ref"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("id_param"),
    )


@query(
    "fn_try",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE l_orderkey / (l_linenumber - 1) END AS safe_div,
           TRY_CAST(CASE WHEN l_orderkey % 3 = 0 THEN 'x' ELSE CAST(l_orderkey AS VARCHAR) END
                    AS BIGINT) AS maybe_int,
           CASE WHEN l_linenumber >= 3 THEN NULL ELSE l_linenumber END AS maybe_elem
    FROM lineitem WHERE l_orderkey < 500
    """,
)
def fn_try(spark, sf_dir):
    """ANSI-safe error-handling family (try_divide / try_cast /
    try_element_at): under ANSI SQL mode these return NULL where the
    strict form would raise (divide-by-zero, malformed cast,
    out-of-bounds index) — the difference between a 100 TB job dying
    at hour 9 on one bad record and a null routed to the dead-letter
    filter. All codegen; oracle replays each null-producing condition
    explicitly."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    arr = F.array(F.lit(1), F.lit(2))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_orderkey"), F.col("l_linenumber") - 1).alias("safe_div"),
        F.when(F.col("l_orderkey") % 3 == 0, F.lit("x"))
        .otherwise(F.col("l_orderkey").cast("string"))
        .try_cast("bigint")
        .alias("maybe_int"),
        F.try_element_at(arr, F.col("l_linenumber").cast("int")).alias("maybe_elem"),
    )


@query(
    "fn_collate",
    oracle="""
    SELECT c_custkey,
           lower(c_mktsegment) = lower('BUILDING') AS seg_ci_eq,
           CASE WHEN lower(c_name) < lower(c_mktsegment)
                THEN c_name ELSE c_mktsegment END AS ci_min
    FROM customer
    """,
)
def fn_collate(spark, sf_dir):
    """Collation-aware comparison (Spark 4 collations): strings cast
    to UTF8_LCASE compare case-insensitively IN THE OPERATOR — no
    lower() rewrite at every call site, and the collation travels
    with the column through joins/groupBys. The oracle replays the
    semantics with explicit lower() (DuckDB has no collation cast)."""
    c = load(spark, sf_dir, "customer")
    seg_ci = F.collate(F.col("c_mktsegment"), "UTF8_LCASE")
    name_ci = F.collate(F.col("c_name"), "UTF8_LCASE")
    return c.select(
        "c_custkey",
        (seg_ci == F.collate(F.lit("BUILDING"), "UTF8_LCASE")).alias("seg_ci_eq"),
        F.when(name_ci < seg_ci, F.col("c_name"))
        .otherwise(F.col("c_mktsegment"))
        .alias("ci_min"),
    )


@query(
    "fn_struct",
    oracle="""
    SELECT n_nationkey,
           n_name AS s_name,
           n_regionkey * 10 AS s_scaled,
           'tagged' AS s_tag,
           n_regionkey = 2 AS in_region_2
    FROM nation
    """,
)
def fn_struct(spark, sf_dir):
    """Struct-column manipulation family: build a struct, evolve it
    with withField (update an existing field + add a new one), prune
    with dropFields, then project the result — the column-level
    mirror of schema evolution, used wherever nested payloads are
    massaged without exploding them. All codegen; the oracle verifies
    the flattened end state (struct cells themselves render
    differently across engines, so the contract is on extracted
    fields)."""
    n = load(spark, sf_dir, "nation")
    s = F.struct(
        F.col("n_name").alias("name"),
        F.col("n_regionkey").alias("rk"),
        F.lit("drop-me").alias("scratch"),
    )
    evolved = (
        F.col("s")
        .withField("rk", F.col("s.rk") * 10)
        .withField("tag", F.lit("tagged"))
        .dropFields("scratch")
    )
    return (
        n.select("n_nationkey", "n_regionkey", s.alias("s"))
        .select("n_nationkey", "n_regionkey", evolved.alias("s"))
        .select(
            "n_nationkey",
            F.col("s.name").alias("s_name"),
            F.col("s.rk").alias("s_scaled"),
            F.col("s.tag").alias("s_tag"),
            (F.col("n_regionkey") == 2).alias("in_region_2"),
        )
    )


_AES_KEY = "0123456789abcdef"  # 16-byte test key (AES-128)


@query(
    "fn_crypto",
    oracle="""
    SELECT c_custkey,
           c_name AS name_rt,
           CAST((octet_length(encode(c_name)) // 16 + 1) * 16 AS BIGINT) AS ct_len
    FROM customer
    """,
)
def fn_crypto(spark, sf_dir):
    """Column-level AES encryption (aes_encrypt/aes_decrypt) — the
    governance surface for PII columns at rest. ECB mode here because
    it is DETERMINISTIC (verifiable ciphertext length + exact
    round-trip in the oracle); production uses the default GCM whose
    random IV breaks replay-verification by design. The oracle proves
    (a) decrypt(encrypt(x)) == x exactly and (b) the PKCS#7-padded
    ciphertext length is 16*(floor(len/16)+1). JVM codegen; the key
    would come from a KMS-backed secret in production, never a
    literal."""
    c = load(spark, sf_dir, "customer")
    ct = F.aes_encrypt(F.col("c_name"), F.lit(_AES_KEY), F.lit("ECB"))
    return c.select(
        "c_custkey",
        F.aes_decrypt(ct, F.lit(_AES_KEY), F.lit("ECB"))
        .cast("string")
        .alias("name_rt"),
        F.length(ct).cast("long").alias("ct_len"),
    )
