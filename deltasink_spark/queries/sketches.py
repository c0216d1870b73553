"""Sketch aggregates (SURVEY.md §2.5 approximate family, extended):
HyperLogLog distinct sketches with distributed merge — the cardinality
path that survives 100 TB because partial sketches merge associatively
across partitions (a few KB per group crosses the shuffle, never rows).

Rows-only checks: sketch estimates are engine-specific (DuckDB's HLL
differs), so exact-match oracles are impossible by construction; the
accuracy and merge-consistency properties are asserted in
tests/test_properties.py instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deltasink_spark.registry import query
from deltasink_spark.tables import load


@query(
    "agg_hll_sketch",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS within_band
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def agg_hll_sketch(spark, sf_dir):
    """Per-segment distinct-customer estimates from HLL sketches
    (lgConfigK=14 ~ 0.8% rsd). The sketch is built with one map-side-
    combined aggregation; only the sketch binary shuffles. The raw
    estimate is engine-specific, so the driver-facing row carries the
    exact count plus a `within_band` proof the estimate sits inside a
    3-sigma envelope (2.5%); the oracle asserts TRUE. Raw estimates
    stay covered by tests/test_properties.py."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", F.lit(14))).alias(
                "approx_customers"
            ),
            F.count_distinct("o_custkey").alias("exact_customers"),
        )
        .select(
            "c_mktsegment",
            "exact_customers",
            (
                F.abs(F.col("approx_customers") - F.col("exact_customers"))
                / F.col("exact_customers")
                <= 0.025
            ).alias("within_band"),
        )
    )


@query(
    "agg_hll_union",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_exact,
           TRUE AS merged_close_to_whole,
           TRUE AS merged_within_band
    FROM orders
    """,
)
def agg_hll_union(spark, sf_dir):
    """The distributed-merge property made visible: sketches built
    independently on disjoint halves of orders are hll_union_agg-merged
    and estimated — at cluster scale this is exactly how per-partition
    partial sketches combine. The union gadget does NOT guarantee
    bit-identical registers to the single-pass sketch (mode/target-type
    transitions; observed equal at sf0.01 but ~0.1% apart at sf0.1), so
    the driver row asserts the merged estimate is within 1% of the
    whole-table estimate AND within the 3-sigma band of the exact
    count (oracle: TRUE/TRUE)."""
    o = load(spark, sf_dir, "orders")
    halves = (
        o.withColumn("half", (F.col("o_orderkey") % 2).cast("int"))
        .groupBy("half")
        .agg(F.hll_sketch_agg("o_custkey", F.lit(14)).alias("sk"))
    )
    merged = halves.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_estimate")
    )
    whole = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", F.lit(14))).alias(
            "whole_estimate"
        )
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("n_exact"))
    # zero guards: on an empty feed both estimates are NULL/0 and the
    # exact count 0 — the invariants hold trivially instead of dividing
    # by zero (r8 empty-corpus audit)
    me = F.coalesce(F.col("merged_estimate"), F.lit(0.0))
    we = F.coalesce(F.col("whole_estimate"), F.lit(0.0))
    return (
        merged.crossJoin(whole)
        .crossJoin(exact)
        .select(
            "n_exact",
            F.when(we == 0, me == 0)
            .otherwise(F.abs(me - we) / we <= 0.01)
            .alias("merged_close_to_whole"),
            F.when(F.col("n_exact") == 0, me == 0)
            .otherwise(F.abs(me - F.col("n_exact")) / F.col("n_exact") <= 0.025)
            .alias("merged_within_band"),
        )
    )


@query(
    "agg_hll_intersect",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersection, TRUE AS within_band
    FROM (
        SELECT o_custkey FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_custkey IS NOT NULL
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE o_orderpriority = '2-HIGH' AND o_custkey IS NOT NULL
    ) t
    """,
)
def agg_hll_intersect(spark, sf_dir):
    """Set-INTERSECTION cardinality from HLL sketches by
    inclusion-exclusion: |A ∩ B| ≈ E(A) + E(B) − E(A ∪ B), where the
    union estimate comes from hll_union_agg of the two per-group
    sketches — the audience-overlap question ("customers with both an
    URGENT and a HIGH order") answered from THREE mergeable KB-sized
    sketches instead of a distinct-pair join, the composition
    [agg_hll_sketch]/[agg_hll_union] stop short of. Error compounds
    across the three estimates (each ~0.8% rsd at lgConfigK=14), so the
    proof band is 10% of the exact intersection with an absolute floor
    of 5 for tiny inputs — generous for the estimator, fatal for any
    logic error (a sign flip or double count lands hundreds off). The
    exact intersection rides along (one distinct semi-join, SQL
    INTERSECT in the oracle); within_band must be TRUE.

    Scale: per-group sketches build with map-side combine (bytes cross
    the shuffle, never custkeys); the union is a 2-row agg. The exact
    side exists only for the proof."""
    o = load(spark, sf_dir, "orders")
    pri = F.col("o_orderpriority")
    sk = (
        o.filter(pri.isin("1-URGENT", "2-HIGH"))
        .groupBy(pri.alias("p"))
        .agg(F.hll_sketch_agg("o_custkey", F.lit(14)).alias("sk"))
    )
    per = sk.select("p", F.hll_sketch_estimate("sk").alias("e"))
    ea = per.filter(F.col("p") == "1-URGENT").select(F.col("e").alias("ea"))
    eb = per.filter(F.col("p") == "2-HIGH").select(F.col("e").alias("eb"))
    eu = sk.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("eu"))
    # NULL keys excluded on BOTH sides: the sketches skip NULLs, the
    # semi-join never matches them, and SQL INTERSECT would COUNT them
    # (set-op NULL equality) — the one place the two engines' NULL
    # semantics would silently diverge
    exact = (
        o.filter((pri == "1-URGENT") & F.col("o_custkey").isNotNull())
        .select("o_custkey")
        .distinct()
        .join(
            o.filter((pri == "2-HIGH") & F.col("o_custkey").isNotNull())
            .select("o_custkey")
            .distinct(),
            "o_custkey",
            "left_semi",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersection"))
    )
    # empty-corpus guards: missing groups yield EMPTY 1-col frames, so
    # the joins below are LEFT (the exact frame always has one row) and
    # the estimates coalesce to 0 (r8 audit discipline)
    est = (
        F.coalesce(F.col("ea"), F.lit(0.0))
        + F.coalesce(F.col("eb"), F.lit(0.0))
        - F.coalesce(F.col("eu"), F.lit(0.0))
    )
    return (
        exact.join(F.broadcast(ea), F.lit(True), "left")
        .join(F.broadcast(eb), F.lit(True), "left")
        .join(F.broadcast(eu), F.lit(True), "left")
        .select(
            "exact_intersection",
            (
                F.abs(est - F.col("exact_intersection"))
                <= F.greatest(
                    F.col("exact_intersection") * 0.10, F.lit(5.0)
                )
            ).alias("within_band"),
        )
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitmap_distinct(spark, sf_dir):
    """EXACT distinct counting via bitmap aggregation (Spark 3.5+
    bitmap functions): keys are bucketed into 32k-bit bitmaps, each
    bucket's bitmap ORs together with map-side combine, and the final
    count sums per-bucket popcounts. Unlike count(DISTINCT x) this
    never plans Expand or reshuffles raw keys — only fixed-size bitmap
    binaries cross the wire — while staying exact (hence the exact
    COUNT(DISTINCT) oracle)."""
    li = load(spark, sf_dir, "lineitem")
    per_bucket = (
        li.groupBy(
            "l_returnflag", F.bitmap_bucket_number(F.col("l_orderkey")).alias("bucket")
        )
        .agg(
            F.bitmap_construct_agg(F.bitmap_bit_position(F.col("l_orderkey"))).alias("bm")
        )
    )
    return (
        per_bucket.groupBy("l_returnflag")
        .agg(F.sum(F.bitmap_count(F.col("bm"))).alias("n_orders"))
    )


# --- count-min sketch (r4) --------------------------------------------

CM_DEPTH = 4     # hash rows
CM_WIDTH = 256   # buckets per row
CM_QUERY_KEYS = 20  # frequencies estimated for user_id < this

_CM_HASH = (
    "CAST(CONCAT('0x', substr(md5(CONCAT(CAST({i} AS VARCHAR), ':', "
    "CAST({k} AS VARCHAR))), 1, 8)) AS BIGINT) % {w}"
)


def _cm_hash_sql(i: str, k: str) -> str:
    return _CM_HASH.format(i=i, k=k, w=CM_WIDTH)


@query(
    "agg_count_min",
    oracle=f"""
    WITH rows_ AS (SELECT unnest(range({CM_DEPTH})) AS i),
    cms AS (
        SELECT i, {_cm_hash_sql('i', 'user_id')} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events CROSS JOIN rows_
        GROUP BY 1, 2),
    keys AS (SELECT DISTINCT user_id FROM events
             WHERE user_id < {CM_QUERY_KEYS}),
    est AS (
        SELECT k.user_id, MIN(c.cnt) AS cm_est
        FROM keys k CROSS JOIN rows_ r
        JOIN cms c ON c.i = r.i
                  AND c.bucket = {_cm_hash_sql('r.i', 'k.user_id')}
        GROUP BY k.user_id),
    truth AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt
              FROM events GROUP BY user_id)
    SELECT e.user_id, e.cm_est, t.true_cnt,
           e.cm_est >= t.true_cnt AS never_undercounts
    FROM est e JOIN truth t USING (user_id)
    ORDER BY e.user_id
    """,
)
def agg_count_min(spark, sf_dir):
    """Count-min sketch frequency estimation (Cormode & Muthukrishnan
    2005): d=4 portable md5 hash rows x w=256 buckets over
    events.user_id, queried for the first 20 keys. Unlike the HLL ops
    the whole sketch is REPLAYABLE (same md5 trick as dedup_simhash),
    so the driver hash-verifies the sketch itself, the estimates, and
    the canonical CMS invariant est >= true per key.

    Scale shape: the sketch build is one hash agg whose result is
    d x w = 1024 rows whatever the corpus size — the textbook
    mergeable-summary contract (per-partition partial counters merge
    by +). Estimation joins the broadcast sketch; nothing corpus-sized
    shuffles."""
    ev = load(spark, sf_dir, "events").select("user_id")
    rows_ = F.explode(F.sequence(F.lit(0), F.lit(CM_DEPTH - 1))).alias("i")

    def cm_bucket(i_col, key_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", i_col.cast("string"), key_col.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % CM_WIDTH
        )

    cms = (
        ev.select("user_id", rows_)
        .select("i", cm_bucket(F.col("i"), F.col("user_id")).alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    keys = (
        ev.filter(F.col("user_id") < CM_QUERY_KEYS)
        .select("user_id")
        .distinct()
        .select("user_id", rows_)
        .withColumn("bucket", cm_bucket(F.col("i"), F.col("user_id")))
    )
    est = (
        keys.join(F.broadcast(cms), ["i", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("cm_est"))
    )
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    return (
        est.join(truth, "user_id")
        .select(
            "user_id", "cm_est", "true_cnt",
            (F.col("cm_est") >= F.col("true_cnt")).alias("never_undercounts"),
        )
        .orderBy("user_id")
    )


@query(
    "agg_bitmap_native",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT o_custkey % 4096) AS BIGINT) AS n_buckets
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_bitmap_native(spark, sf_dir):
    """Exact distinct counting through Spark's NATIVE bitmap aggregate
    family (bitmap_bit_position -> bitmap_construct_agg ->
    bitmap_count) — the engine-provided form of what
    agg_bitmap_distinct hand-builds from 64-bit words: per-partition
    partial bitmaps OR-merge (mergeable-summary contract, constant
    state per group per 32k-value segment), so exact NDV costs one
    map-side-combinable agg instead of an Expand or a two-level
    shuffle. The second measure counts distinct hash buckets (the
    segment-local form a rollup store persists). Both replay as plain
    COUNT(DISTINCT ...) in the oracle."""
    o = load(spark, sf_dir, "orders")
    # bitmap_construct_agg covers one 32k-position segment; fixture
    # custkeys exceed that, so segment with the MATCHING
    # bitmap_bucket_number (bit_position is (x-1) % 32768, so a
    # hand-rolled x/32768 segment would collide across boundaries):
    # distinct = sum over segments of per-segment counts.
    seg = F.bitmap_bucket_number(F.col("o_custkey"))
    per_seg = (
        o.select(
            "o_orderstatus",
            seg.alias("seg"),
            F.bitmap_bit_position(F.col("o_custkey")).alias("pos"),
            # +1 keeps the bucket-hash values inside ONE 32k segment
            # (bit_position is (x-1) % 32768 with bucket ceil(x/32768),
            # so 0 and 1 both land at position 0 of different buckets)
            F.bitmap_bit_position(F.col("o_custkey") % 4096 + 1).alias("bpos"),
        )
        .groupBy("o_orderstatus", "seg")
        .agg(
            F.bitmap_count(F.bitmap_construct_agg(F.col("pos"))).alias("n_in_seg"),
            F.bitmap_construct_agg(F.col("bpos")).alias("bucket_bm"),
        )
    )
    return per_seg.groupBy("o_orderstatus").agg(
        F.sum("n_in_seg").cast("long").alias("n_customers"),
        F.bitmap_count(F.bitmap_or_agg(F.col("bucket_bm"))).cast("long").alias("n_buckets"),
    )


# --- agg_kmv_intersect: KMV/theta sketch set intersection -----------------

_KMV_K = 128


def _kmv_frame(spark, sf_dir, null_filter: bool = False, checkpoint: bool = True):
    """Per-event-type KMV/theta sketch: the K smallest DISTINCT 32-bit
    hashes of user_id (one distinct + per-type top-K rank). Every
    family op consumes this frame 3x (theta + a-side + b-side), so it
    is built once and lazily checkpointed: AQE reuses the identical
    distinct Exchange at runtime, but each window consumer re-SORTS
    the distinct set — the cut makes the shuffle AND the sort run once
    per action (guide §2.4). ``checkpoint=False`` exposes the raw
    build plan (plan-assertion tests pin the window shape there)."""
    from deltasink_spark.tables import md5_long

    e = load(spark, sf_dir, "events")
    if null_filter:
        e = e.filter(F.col("user_id").isNotNull())
    h = e.select("event_type", md5_long(F.col("user_id")).alias("h")).distinct()
    w = Window.partitionBy("event_type").orderBy(F.asc("h"))
    kmv = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .select("event_type", "h")
    )
    return kmv.localCheckpoint(eager=False) if checkpoint else kmv


@query(
    "agg_kmv_intersect",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) AS h
        FROM events),
    kmv AS (
        SELECT event_type, h FROM (
            SELECT event_type, h,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM h
        ) WHERE rn <= {_KMV_K}),
    theta AS (SELECT event_type, MAX(h) AS th, COUNT(*) AS n_sk
              FROM kmv GROUP BY event_type),
    pairs AS (
        SELECT ta.event_type AS type_a, tb.event_type AS type_b,
               LEAST(ta.th, tb.th) AS theta
        FROM theta ta JOIN theta tb ON ta.event_type < tb.event_type),
    common AS (
        SELECT p.type_a, p.type_b, p.theta,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM pairs p
        JOIN kmv a ON a.event_type = p.type_a AND a.h < p.theta
        JOIN kmv b ON b.event_type = p.type_b AND b.h = a.h
        GROUP BY p.type_a, p.type_b, p.theta)
    SELECT p.type_a, p.type_b, p.theta,
           COALESCE(c.n_common, 0) AS n_common,
           COALESCE(c.n_common, 0) * 4294967296.0 / p.theta AS est_intersection
    FROM pairs p LEFT JOIN common c
      ON c.type_a = p.type_a AND c.type_b = p.type_b
    ORDER BY p.type_a, p.type_b
    """,
)
def agg_kmv_intersect(spark, sf_dir):
    """K-minimum-values (theta) sketch INTERSECTION — the set operation
    the HLL family cannot do (HLL unions losslessly but has no
    intersection; the standard answer is the KMV/theta sketch, as in
    the DataSketches library): per event_type keep the K=128
    smallest distinct 32-bit hashes of user_id, and for every type
    pair estimate the overlapping-user count as
    n_common * 2^32 / theta, where theta = min of the two sketches'
    K-th minima and n_common counts shared hashes below theta. Every
    component (hashes, K-minima, theta, n_common) is an exact integer
    and the one estimate division is correctly-rounded IEEE on exact
    inputs — bit-identical cross-engine, so an approximate sketch gets
    an EXACT oracle.

    Scale shape: the sketch build is one distinct + one per-type top-K
    window (shuffle on event_type); everything after operates on
    |types| x K rows — broadcastable, mergeable (union two KMV sets,
    re-truncate to K), the same algebra minhash_union proves. At
    100 TB the sketches are the only thing that crosses the shuffle."""
    kmv = _kmv_frame(spark, sf_dir)
    theta = kmv.groupBy("event_type").agg(
        F.max("h").alias("th"), F.count(F.lit(1)).alias("n_sk")
    )
    ta = theta.select(F.col("event_type").alias("type_a"), F.col("th").alias("th_a"))
    tb = theta.select(F.col("event_type").alias("type_b"), F.col("th").alias("th_b"))
    pairs = (
        ta.join(tb, F.col("type_a") < F.col("type_b"))
        .select("type_a", "type_b", F.least("th_a", "th_b").alias("theta"))
    )
    ka = kmv.select(F.col("event_type").alias("type_a"), "h")
    kb = kmv.select(F.col("event_type").alias("kb_type"), F.col("h").alias("hb"))
    common = (
        pairs.join(ka, "type_a")
        .filter(F.col("h") < F.col("theta"))
        .join(kb, (F.col("type_b") == F.col("kb_type")) & (F.col("h") == F.col("hb")))
        .groupBy("type_a", "type_b", "theta")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        pairs.join(common.select("type_a", "type_b", "n_common"), ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "theta",
            F.coalesce(F.col("n_common"), F.lit(0).cast("long")).alias("n_common"),
            (
                F.coalesce(F.col("n_common"), F.lit(0).cast("long"))
                * F.lit(4294967296.0)
                / F.col("theta")
            ).alias("est_intersection"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "agg_kmv_difference",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) AS h
        FROM events),
    kmv AS (
        SELECT event_type, h FROM (
            SELECT event_type, h,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM h
        ) WHERE rn <= {_KMV_K}),
    theta AS (SELECT event_type, MAX(h) AS th FROM kmv GROUP BY event_type),
    pairs AS (
        SELECT ta.event_type AS type_a, tb.event_type AS type_b,
               LEAST(ta.th, tb.th) AS theta
        FROM theta ta JOIN theta tb ON ta.event_type < tb.event_type),
    only_a AS (
        SELECT p.type_a, p.type_b, p.theta,
               CAST(COUNT(*) AS BIGINT) AS n_a_only
        FROM pairs p
        JOIN kmv a ON a.event_type = p.type_a AND a.h < p.theta
        WHERE NOT EXISTS (
            SELECT 1 FROM kmv b
            WHERE b.event_type = p.type_b AND b.h = a.h)
        GROUP BY p.type_a, p.type_b, p.theta)
    SELECT p.type_a, p.type_b, p.theta,
           COALESCE(o.n_a_only, 0) AS n_a_only,
           COALESCE(o.n_a_only, 0) * 4294967296.0 / p.theta AS est_difference
    FROM pairs p LEFT JOIN only_a o
      ON o.type_a = p.type_a AND o.type_b = p.type_b
    ORDER BY p.type_a, p.type_b
    """,
)
def agg_kmv_difference(spark, sf_dir):
    """K-minimum-values (theta) sketch set DIFFERENCE — the A-NOT-B
    estimate completing [agg_kmv_intersect]'s set algebra (the
    DataSketches AnotB operation): below the common theta, every
    a-sketch hash is a uniform sample of A, so the ones ABSENT from
    b's sketch sample A\\B at the same rate — |A\\B| ≈ n_a_only *
    2^32 / theta. "Which users click but never purchase" from two
    KB-sized sketches, no distinct anti-join over the fact table.
    Every component is an exact integer and the single estimate
    division is IEEE on exact inputs — the approximate sketch carries
    an EXACT oracle (the agg_kmv_intersect discipline).

    Scale shape: identical to the intersect — one distinct + per-type
    top-K window builds the sketches; everything after runs on
    |types| x K rows (broadcastable, mergeable)."""
    kmv = _kmv_frame(spark, sf_dir)
    theta = kmv.groupBy("event_type").agg(F.max("h").alias("th"))
    ta = theta.select(F.col("event_type").alias("type_a"), F.col("th").alias("th_a"))
    tb = theta.select(F.col("event_type").alias("type_b"), F.col("th").alias("th_b"))
    pairs = (
        ta.join(tb, F.col("type_a") < F.col("type_b"))
        .select("type_a", "type_b", F.least("th_a", "th_b").alias("theta"))
    )
    ka = kmv.select(F.col("event_type").alias("type_a"), "h")
    kb = kmv.select(F.col("event_type").alias("kb_type"), F.col("h").alias("hb"))
    only_a = (
        pairs.join(ka, "type_a")
        .filter(F.col("h") < F.col("theta"))
        .join(
            kb,
            (F.col("type_b") == F.col("kb_type")) & (F.col("h") == F.col("hb")),
            "left_anti",
        )
        .groupBy("type_a", "type_b", "theta")
        .agg(F.count(F.lit(1)).cast("long").alias("n_a_only"))
    )
    return (
        pairs.join(
            only_a.select("type_a", "type_b", "n_a_only"),
            ["type_a", "type_b"],
            "left",
        )
        .select(
            "type_a",
            "type_b",
            "theta",
            F.coalesce(F.col("n_a_only"), F.lit(0).cast("long")).alias("n_a_only"),
            (
                F.coalesce(F.col("n_a_only"), F.lit(0).cast("long"))
                * F.lit(4294967296.0)
                / F.col("theta")
            ).alias("est_difference"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "agg_kmv_union",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) AS h
        FROM events WHERE user_id IS NOT NULL),
    kmv AS (
        SELECT event_type, h FROM (
            SELECT event_type, h,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM h
        ) WHERE rn <= {_KMV_K}),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b
        FROM (SELECT DISTINCT event_type FROM kmv) a
        JOIN (SELECT DISTINCT event_type FROM kmv) b
          ON a.event_type < b.event_type),
    pooled AS (
        SELECT DISTINCT p.type_a, p.type_b, k.h
        FROM pairs p
        JOIN kmv k ON k.event_type = p.type_a OR k.event_type = p.type_b),
    merged AS (
        SELECT type_a, type_b, h FROM (
            SELECT type_a, type_b, h,
                   ROW_NUMBER() OVER (
                       PARTITION BY type_a, type_b ORDER BY h
                   ) AS rn
            FROM pooled
        ) WHERE rn <= {_KMV_K}),
    est AS (
        SELECT type_a, type_b, MAX(h) AS theta,
               CAST(COUNT(*) - 1 AS BIGINT) AS n_below
        FROM merged GROUP BY type_a, type_b)
    SELECT type_a, type_b, theta, n_below,
           n_below * 4294967296.0 / theta AS est_union
    FROM est
    ORDER BY type_a, type_b
    """,
)
def agg_kmv_union(spark, sf_dir):
    """KMV/theta sketch UNION — the MERGEABILITY leg completing the
    family ([agg_kmv_intersect], [agg_kmv_difference]): two sketches
    union by pooling their hash samples, deduping, and re-truncating
    to the K smallest — the result IS the KMV sketch of A ∪ B
    restricted to already-sampled hashes, which is why theta sketches
    compose across partitions/days/tables without touching raw data
    (the DataSketches union set-operation; at 100 TB, per-day KB
    sketches roll up to any window). Estimate is the classic KMV
    estimator in the family's convention: theta = the merged sketch's
    max, n_below = members strictly below it (= K-1 when full), |A∪B|
    ≈ n_below * 2^32 / theta. All-integer components ⇒ exact oracle.

    Scale shape: sketch build = one distinct + per-type top-K window;
    the merge + re-truncate runs on |types|² x K rows — tiny,
    broadcastable; nothing corpus-sized crosses the pair join."""
    kmv = _kmv_frame(spark, sf_dir, null_filter=True)
    types = kmv.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            types.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
    )
    # pool both sides' samples per pair, dedupe shared hashes, keep the
    # K smallest (the union sketch), then the classic KMV estimate
    ka = kmv.select(F.col("event_type").alias("type_a"), "h")
    kb = kmv.select(F.col("event_type").alias("type_b"), "h")
    pooled = (
        pairs.join(ka, "type_a")
        .select("type_a", "type_b", "h")
        .unionByName(pairs.join(kb, "type_b").select("type_a", "type_b", "h"))
        .distinct()
    )
    wu = Window.partitionBy("type_a", "type_b").orderBy(F.asc("h"))
    merged = (
        pooled.withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= _KMV_K)
    )
    return (
        merged.groupBy("type_a", "type_b")
        .agg(
            F.max("h").alias("theta"),
            (F.count(F.lit(1)) - 1).cast("long").alias("n_below"),
        )
        .select(
            "type_a",
            "type_b",
            "theta",
            "n_below",
            (F.col("n_below") * F.lit(4294967296.0) / F.col("theta")).alias(
                "est_union"
            ),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "agg_theta_jaccard",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) AS h
        FROM events WHERE user_id IS NOT NULL),
    kmv AS (
        SELECT event_type, h FROM (
            SELECT event_type, h,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM h
        ) WHERE rn <= {_KMV_K}),
    theta AS (SELECT event_type, MAX(h) AS th FROM kmv GROUP BY event_type),
    pairs AS (
        SELECT ta.event_type AS type_a, tb.event_type AS type_b,
               LEAST(ta.th, tb.th) AS theta
        FROM theta ta JOIN theta tb ON ta.event_type < tb.event_type),
    below AS (
        SELECT p.type_a, p.type_b, p.theta, k.h,
               MAX(CASE WHEN k.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN k.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
        FROM pairs p
        JOIN kmv k ON k.event_type IN (p.type_a, p.type_b) AND k.h < p.theta
        GROUP BY p.type_a, p.type_b, p.theta, k.h),
    counts AS (
        SELECT type_a, type_b, theta,
               CAST(COUNT(*) AS BIGINT) AS n_either,
               CAST(SUM(in_a * in_b) AS BIGINT) AS n_common
        FROM below GROUP BY type_a, type_b, theta)
    SELECT p.type_a, p.type_b, p.theta,
           COALESCE(c.n_common, 0) AS n_common,
           COALESCE(c.n_either, 0) AS n_either,
           CASE WHEN COALESCE(c.n_either, 0) = 0 THEN 0.0
                ELSE COALESCE(c.n_common, 0) * 1.0 / c.n_either
           END AS jaccard_est
    FROM pairs p LEFT JOIN counts c
      ON c.type_a = p.type_a AND c.type_b = p.type_b
    ORDER BY p.type_a, p.type_b
    """,
)
def agg_theta_jaccard(spark, sf_dir):
    """Theta-sketch JACCARD similarity — the composite the KMV family
    exists for ([agg_kmv_intersect] ∩ over [agg_kmv_union] ∪ in one
    estimator): below the common theta BOTH sketches are complete
    uniform samples of their sets, so J(A,B) ≈ n_common / n_either
    where n_either counts distinct hashes below theta present in
    either sketch — the standard KMV Jaccard estimator (how
    DataSketches compares audiences without raw data). Both counts are
    exact integers and the one division is correctly-rounded IEEE ⇒
    the approximate sketch carries an EXACT oracle; the zero-overlap
    guard (n_either = 0) returns 0.0 in both engines.

    Scale shape: identical to the family — sketch build is one
    distinct + per-type top-K window; the pair arithmetic runs on
    |types|² x K rows, nothing corpus-sized crosses the pair join."""
    kmv = _kmv_frame(spark, sf_dir, null_filter=True)
    theta = kmv.groupBy("event_type").agg(F.max("h").alias("th"))
    ta = theta.select(F.col("event_type").alias("type_a"), F.col("th").alias("th_a"))
    tb = theta.select(F.col("event_type").alias("type_b"), F.col("th").alias("th_b"))
    pairs = (
        ta.join(tb, F.col("type_a") < F.col("type_b"))
        .select("type_a", "type_b", F.least("th_a", "th_b").alias("theta"))
    )
    ka = kmv.select(F.col("event_type").alias("type_a"), "h")
    kb = kmv.select(F.col("event_type").alias("type_b"), "h")
    below = (
        pairs.join(ka, "type_a")
        .filter(F.col("h") < F.col("theta"))
        .select("type_a", "type_b", "theta", "h", F.lit(1).alias("in_a"),
                F.lit(0).alias("in_b"))
        .unionByName(
            pairs.join(kb, "type_b")
            .filter(F.col("h") < F.col("theta"))
            .select("type_a", "type_b", "theta", "h", F.lit(0).alias("in_a"),
                    F.lit(1).alias("in_b"))
        )
        .groupBy("type_a", "type_b", "theta", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    counts = below.groupBy("type_a", "type_b", "theta").agg(
        F.count(F.lit(1)).cast("long").alias("n_either"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_common"),
    )
    zero = F.lit(0).cast("long")
    return (
        pairs.join(
            counts.select("type_a", "type_b", "n_either", "n_common"),
            ["type_a", "type_b"],
            "left",
        )
        .select(
            "type_a",
            "type_b",
            "theta",
            F.coalesce(F.col("n_common"), zero).alias("n_common"),
            F.coalesce(F.col("n_either"), zero).alias("n_either"),
            F.when(F.coalesce(F.col("n_either"), zero) == 0, F.lit(0.0))
            .otherwise(
                F.coalesce(F.col("n_common"), zero)
                * F.lit(1.0)
                / F.col("n_either")
            )
            .alias("jaccard_est"),
        )
        .orderBy("type_a", "type_b")
    )


# --- join_size_estimate_sampled: correlated-sampling cardinality ---------

_JS_P_INV = 16  # sampling rate p = 1/16
_JS_TAU = 2**32 // _JS_P_INV


@query(
    "join_size_estimate_sampled",
    oracle=f"""
    WITH se AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS ce
                FROM events
                WHERE CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)),
                                               1, 8)) AS BIGINT) < {_JS_TAU}
                GROUP BY 1),
    so AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS co
           FROM orders
           WHERE CAST(CONCAT('0x', substr(md5(CAST(o_custkey AS VARCHAR)),
                                          1, 8)) AS BIGINT) < {_JS_TAU}
           GROUP BY 1),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled_keys,
                 CAST(COALESCE(SUM(ce * co), 0) AS BIGINT) AS s
          FROM se JOIN so USING (k)),
    fe AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS ce
           FROM events GROUP BY 1),
    fo AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS co
           FROM orders GROUP BY 1),
    t AS (SELECT CAST(COALESCE(SUM(ce * co), 0) AS BIGINT) AS true_size
          FROM fe JOIN fo USING (k))
    SELECT n_sampled_keys,
           CAST(s * {_JS_P_INV} AS BIGINT) AS est_join_size,
           true_size,
           ROUND((CAST(s * {_JS_P_INV} AS DOUBLE) - true_size)
                 / true_size, 6) AS rel_error
    FROM m, t
    """,
)
def join_size_estimate_sampled(spark, sf_dir):
    """Join-cardinality estimation by CORRELATED SAMPLING (Vengerov et
    al., VLDB 2015) — the planning-time question every optimizer asks
    before picking a join strategy: how big is events ⋈ orders on the
    customer key, WITHOUT running the join? Both sides keep only rows
    whose key hashes below τ = 2³²/16 — the SAME hash on both sides,
    so a surviving key is sampled on both (probability p, not p²,
    which is what makes Σ ce·co / p unbiased where independent
    Bernoulli samples need 1/p²). The op also computes the true
    Σ ce·co join size and the relative error — the eval an estimator
    needs before a planner trusts it (the [ann_recall_at_k] pattern
    applied to cardinality estimation).

    Determinism: md5-prefix hashing makes the sample itself
    reproducible cross-engine (the [sample_bottom_k] trick), so the
    APPROXIMATE estimator carries an EXACT oracle: counts and Σ ce·co
    are exact BIGINTs, the only double is the final rel_error tree.

    Scale: the sample path — the part a planner runs — filters at
    scan time and shuffles only ~1/16 of the DISTINCT KEYS (two tiny
    hash aggs + one sample-sized join); the full-side aggs here exist
    only to score the estimate. try_divide-free: an empty join gives
    true_size 0 and DuckDB/Spark both NULL the 0/0 rel_error via
    round(x/0) semantics mirrored with try_divide."""
    from deltasink_spark.tables import md5_long as hk

    e = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    se = (
        e.filter(hk(F.col("user_id")) < _JS_TAU)
        .groupBy(F.col("user_id").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("ce"))
    )
    so = (
        o.filter(hk(F.col("o_custkey")) < _JS_TAU)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("co"))
    )
    m = (
        se.join(so, "k")
        .groupBy()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled_keys"),
            F.coalesce(F.sum(F.col("ce") * F.col("co")), F.lit(0))
            .cast("long")
            .alias("s"),
        )
    )
    fe = e.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("ce")
    )
    fo = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("co")
    )
    t = (
        fe.join(fo, "k")
        .groupBy()
        .agg(
            F.coalesce(F.sum(F.col("ce") * F.col("co")), F.lit(0))
            .cast("long")
            .alias("true_size")
        )
    )
    est = (F.col("s") * _JS_P_INV).cast("long")
    return m.join(F.broadcast(t)).select(
        "n_sampled_keys",
        est.alias("est_join_size"),
        "true_size",
        F.round(
            F.try_divide(
                est.cast("double") - F.col("true_size"), F.col("true_size")
            ),
            6,
        ).alias("rel_error"),
    )
