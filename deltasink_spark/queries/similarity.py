"""Similarity search (SURVEY.md §2.11): exact cosine pair scoring,
top-k nearest-neighbor search, k-NN join, and time-series similarity.

Scale shapes:
- sim_topk_search: score-all + TakeOrderedAndProject (distributed heap
  top-k, no global sort) — the brute-force baseline that is also the
  per-bucket scorer of an IVF/LSH layout.
- sim_topk_join: broadcast the (small) query set, score, per-query
  window top-k. At 100 TB the band-bucket equi-join of
  operators/minhash.py replaces the broadcast crossJoin as pre-filter.
- ts_similarity / sim_cosine_pairs: full-table pairwise stages run on
  sign-LSH bucket-mate candidates (shuffled equi-join on
  (table, bucket), lsh_bits()-parameterized geometry), never a
  full-table broadcast or cross join.

All pairwise scoring runs on vectors quantized once per row to longs
(operators/vectors.py QSCALE): the per-pair dot is exact long
arithmetic, identical in both engines, ~3x faster than a decimal
accumulator and immune to summation-order nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deltasink_spark.operators.vectors import (
    QSCALE,
    qdot_arrow,
    hyperplanes,
    lsh_bits,
    lsh_candidate_pairs,
    lsh_tall_frame,
    qdot,
    qnorm,
    quantized,
    sql_bucket,
    sql_lsh_tall,
    sql_qdot,
    sql_qnorm,
    sql_quantized,
)
from deltasink_spark.registry import query
from deltasink_spark.tables import fanout, load

# Shared oracle CTE: embeddings quantized to longs with precomputed norms.
_QN_CTE = f"""
    qv AS (SELECT vec_id, label, {sql_quantized('embedding')} AS iv FROM embeddings),
    qn AS (SELECT vec_id, label, iv, {sql_qnorm('iv')} AS nrm FROM qv)
"""
_QCOS_AB = f"ROUND({sql_qdot('a.iv', 'b.iv')} / (a.nrm * b.nrm), 6)"


def _qn_frame(spark, sf_dir):
    """Embeddings with quantized vectors + norms (Spark mirror of _QN_CTE)."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", "label", quantized(F.col("embedding")).alias("iv")
    ).withColumn("nrm", qnorm(F.col("iv")))


# Full-table pairwise candidate geometry (shared with
# dedup_embedding_cosine in queries/dedup.py): L hash tables x K
# random-hyperplane bits over the 64-dim embeddings. K comes from
# lsh_bits() pinned at the fixture corpus estimate so the oracle plane
# literals are import-time constants (= the 8-bit r5 geometry); a
# production deployment passes its real corpus size and K grows to
# keep expected bucket occupancy bounded.
_PAIR_L = 4
_PAIR_K = lsh_bits(2_000)
_PAIR_PLANES = hyperplanes(64, _PAIR_L * _PAIR_K, seed=777)
_PAIR_TALL = sql_lsh_tall("qn", "vec_id", "iv", _PAIR_PLANES, _PAIR_L)
_PAIR_CAND = """
    cand AS (
        SELECT DISTINCT ta.pid AS id_a, tb.pid AS id_b
        FROM tall ta JOIN tall tb
          ON ta.t = tb.t AND ta.bucket = tb.bucket AND ta.pid < tb.pid)
"""


@query(
    "sim_cosine_pairs",
    oracle=f"""
    WITH {_QN_CTE},
    tall AS ({_PAIR_TALL}),
    {_PAIR_CAND}
    SELECT c.id_a, c.id_b, a.label AS label_a, b.label AS label_b,
           {_QCOS_AB} AS cos
    FROM cand c JOIN qn a ON a.vec_id = c.id_a JOIN qn b ON b.vec_id = c.id_b
    WHERE {_QCOS_AB} >= 0.35
    """,
)
def sim_cosine_pairs(spark, sf_dir):
    """Pairwise cosine scoring over sign-LSH bucket-mate candidates.

    The 100 TB shape (the r5 all-pairs broadcast is gone): candidate
    generation is a shuffled self-EQUI-join on (table, bucket) — L=4
    tables x K=8 hyperplane bits, K parameterized by lsh_bits() so
    expected bucket occupancy stays bounded as the corpus grows — and
    only candidates are scored, exactly, with the fused long dot. The
    hyperplanes are deterministic literals mirrored into the oracle
    SQL, so the bucketed (approximate-recall) semantics are still
    differentially verified bit-for-bit."""
    qn = _qn_frame(spark, sf_dir)
    # label/vector/norm ride THROUGH the candidate self-join (carry=),
    # so scoring needs no join-back: tall-build -> self-equi-join ->
    # distinct -> score, 2 shuffles total.
    pairs = lsh_candidate_pairs(
        qn, "vec_id", "iv", _PAIR_PLANES, _PAIR_L, carry=("label", "iv", "nrm"),
        distinct=False,
    )
    cos = F.round(
        qdot_arrow()(F.col("iv_a"), F.col("iv_b")).cast("double")
        / (F.col("nrm_a") * F.col("nrm_b")),
        6,
    )
    return (
        pairs.withColumn("cos", cos)
        .filter(F.col("cos") >= 0.35)
        .select("id_a", "id_b", "label_a", "label_b", "cos")
        .distinct()
    )


@query(
    "sim_topk_search",
    oracle=f"""
    WITH {_QN_CTE}
    SELECT b.vec_id, b.label,
           ROUND({sql_qdot('a.iv', 'b.iv')} / (a.nrm * b.nrm), 6) AS cos
    FROM qn b CROSS JOIN (SELECT iv, nrm FROM qn WHERE vec_id = 0) a
    WHERE b.vec_id <> 0
    ORDER BY cos DESC, b.vec_id
    LIMIT 10
    """,
)
def sim_topk_search(spark, sf_dir):
    """Top-10 neighbors of the vec_id=0 query vector. orderBy+limit
    plans TakeOrderedAndProject: per-partition heaps, driver merge."""
    qn = _qn_frame(spark, sf_dir)
    q = qn.filter(F.col("vec_id") == 0).select(
        F.col("iv").alias("qi"), F.col("nrm").alias("qn")
    )
    cos = F.round(qdot(F.col("qi"), F.col("iv")) / (F.col("qn") * F.col("nrm")), 6)
    return (
        qn.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn("cos", cos)
        .select("vec_id", "label", "cos")
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(10)
    )


@query(
    "sim_topk_join",
    oracle=f"""
    WITH {_QN_CTE}
    SELECT qid, vec_id, cos, rk FROM (
        SELECT a.vec_id AS qid, b.vec_id AS vec_id, {_QCOS_AB} AS cos,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_QCOS_AB} DESC, b.vec_id) AS rk
        FROM qn a JOIN qn b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < 5
    ) WHERE rk <= 3
    """,
)
def sim_topk_join(spark, sf_dir):
    """k-NN join: 5 query vectors each get their top-3 neighbors.
    Query side broadcast; ranking via per-query window top-k."""
    qn = _qn_frame(spark, sf_dir)
    q = qn.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("iv").alias("qi"), F.col("nrm").alias("qnm")
    )
    cos = F.round(qdot(F.col("qi"), F.col("iv")) / (F.col("qnm") * F.col("nrm")), 6)
    scored = (
        fanout(qn)
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("cos", cos)
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("qid", "vec_id", "cos", "rk")
    )


# --- sim_ann_lsh: LSH-bucketed approximate nearest neighbors ------------

_ANN_L = 2  # hash tables
# Bits per table from lsh_bits() pinned at the fixture corpus estimate
# (2k embeddings -> the floor of 8 bits, identical to the r5 geometry,
# so the oracle plane literals are unchanged). At a 100x corpus the
# same call returns 12+ bits, keeping expected bucket occupancy — and
# with it bucket-mate candidate growth — bounded instead of O(N).
_ANN_K = lsh_bits(2_000)
_ANN_PLANES = hyperplanes(64, _ANN_L * _ANN_K, seed=2024)


def _ann_oracle() -> str:
    b0 = sql_bucket("iv", _ANN_PLANES[:_ANN_K])
    b1 = sql_bucket("iv", _ANN_PLANES[_ANN_K:])
    score = f"ROUND({sql_qdot('a.iv', 'b.iv')} / (a.nrm * b.nrm), 6)"
    return f"""
    WITH {_QN_CTE},
    bk AS (SELECT vec_id, iv, nrm, {b0} AS b0, {b1} AS b1 FROM qn),
    tall AS (
        SELECT vec_id, 0 AS t, b0 AS bucket FROM bk
        UNION ALL
        SELECT vec_id, 1 AS t, b1 AS bucket FROM bk),
    cand AS (
        SELECT DISTINCT q.vec_id AS qid, d.vec_id AS vec_id
        FROM tall q JOIN tall d ON q.t = d.t AND q.bucket = d.bucket
                                AND d.vec_id <> q.vec_id
        WHERE q.vec_id < 5),
    scored AS (
        SELECT c.qid, c.vec_id, {score} AS cos
        FROM cand c JOIN qn a ON a.vec_id = c.qid JOIN qn b ON b.vec_id = c.vec_id)
    SELECT qid, vec_id, cos, rk FROM (
        SELECT qid, vec_id, cos,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
        FROM scored
    ) WHERE rk <= 3
    """


@query("sim_ann_lsh", oracle=_ann_oracle())
def sim_ann_lsh(spark, sf_dir):
    """Approximate top-3 neighbors for 5 query vectors via sign-LSH:
    L=2 hash tables x K=8 random-hyperplane bits bucket every vector;
    only bucket-mates are scored exactly, then ranked per query.

    This is the 100 TB similarity path: candidate generation is a plain
    equi-join on (table, bucket) — one shuffle, prunable, skew-handled
    by AQE — instead of a quadratic cross-join. The hyperplanes are
    deterministic literals mirrored into the oracle SQL, so the
    APPROXIMATE result is still differentially verified exactly."""
    qn = _qn_frame(spark, sf_dir).select("vec_id", "iv", "nrm")
    # Arrow-vectorized signatures (identical int64 buckets, same
    # oracle literals) — see operators/vectors.py::_lsh_signatures
    tall = lsh_tall_frame(qn, "vec_id", "iv", _ANN_PLANES, _ANN_L)
    qside = tall.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "t", "bucket"
    )
    cand = (
        tall.join(F.broadcast(qside), ["t", "bucket"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
    )
    a = qn.select(F.col("vec_id").alias("qid"), F.col("iv").alias("qi"), F.col("nrm").alias("qnm"))
    b = qn.select("vec_id", F.col("iv").alias("di"), F.col("nrm").alias("dn"))
    scored = (
        cand.join(F.broadcast(a), "qid")
        .join(b, "vec_id")
        .withColumn(
            "cos", F.round(qdot(F.col("qi"), F.col("di")) / (F.col("qnm") * F.col("dn")), 6)
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("qid", "vec_id", "cos", "rk")
    )


_TS_SCALE = 100_000  # fixed-point scale: max |v| ~1e3 -> products ~1e16, x24 terms stays < 2^63
_TS_DOT = "CAST(list_sum(list_transform(list_zip(a.ivec, b.ivec), p -> p[1] * p[2])) AS DOUBLE)"


# ts_similarity pair geometry: 24-dim hour profiles, L=2 tables x
# K=lsh_bits(1_500)=8 bits (fixture user-count estimate; a production
# deployment passes its real user count and K grows). L=2 because the
# synthetic hour profiles cluster hard (few activity archetypes):
# candidate volume is occupancy-bound, so extra tables buy little
# recall per candidate here — L is the recall/cost dial, K the
# occupancy dial.
_TS_L = 2
_TS_K = lsh_bits(1_500)
_TS_PLANES = hyperplanes(24, _TS_L * _TS_K, seed=424)


@query(
    "ts_similarity",
    oracle=f"""
    WITH prof AS (
        SELECT user_id, CAST(hour(ts) AS INT) AS hr,
               CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
    maps AS (
        SELECT user_id, map(list(hr), list(v)) AS m FROM prof GROUP BY user_id),
    dense AS (
        SELECT user_id,
               list_transform(range(0, 24), h -> COALESCE(map_extract(m, h)[1], 0.0)) AS vec
        FROM maps),
    vecs AS (
        SELECT user_id,
               list_transform(vec, x -> CAST(ROUND(x * {_TS_SCALE}) AS BIGINT)) AS ivec
        FROM dense),
    nrms AS (
        SELECT user_id, ivec,
               SQRT(CAST(list_sum(list_transform(ivec, x -> x * x)) AS DOUBLE)) AS nrm
        FROM vecs),
    tall AS ({sql_lsh_tall('nrms', 'user_id', 'ivec', _TS_PLANES, _TS_L)}),
    cand AS (
        SELECT DISTINCT ta.pid AS user_a, tb.pid AS user_b
        FROM tall ta JOIN tall tb
          ON ta.t = tb.t AND ta.bucket = tb.bucket AND ta.pid < tb.pid)
    SELECT c.user_a, c.user_b,
           ROUND({_TS_DOT} / (a.nrm * b.nrm), 6) AS cos_sim
    FROM cand c JOIN nrms a ON a.user_id = c.user_a JOIN nrms b ON b.user_id = c.user_b
    WHERE ROUND({_TS_DOT} / (a.nrm * b.nrm), 6) >= 0.8
    """,
)
def ts_similarity(spark, sf_dir):
    """Per-user hour-of-day activity profiles compared pairwise by
    cosine (EDBT-2019 time-series-similarity shape).

    Scale design: each user's sparse (hour, value) profile is densified
    into a fixed 24-slot fixed-point array FIRST (one hash-agg
    shuffle). The pairwise stage is sign-LSH bucketed (L=2 tables x
    K=8 bits over the 24-dim profiles, K from lsh_bits()): candidates
    reach Catalyst as a shuffled self-equi-join on (table, bucket),
    never a full-table broadcast — the r5 broadcast all-pairs shape is
    gone, so the op survives a user count that outgrows a broadcast.
    The naive alternative — equi-joining the sparse profiles on the
    hour key — has only 24 distinct join keys, so at any scale it
    degenerates to ~U^2 x 24 shuffled rows on 24-way parallelism
    (measured 16x slower at sf0.1).

    Determinism: profiles are quantized once per user to fixed-point
    longs (scale 1e5 — exact, identical in both engines), so the
    per-pair dot is pure long arithmetic: associative, order-
    insensitive, and ~3x faster than a decimal-accumulator dot."""
    ev = load(spark, sf_dir, "events")
    prof = (
        ev.groupBy("user_id", F.hour("ts").cast("int").alias("hr"))
        .agg(F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("v"))
    )
    zero_l = F.lit(0).cast("long")
    vecs = (
        prof.groupBy("user_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("hr", "v"))).alias("m"))
        .select(
            "user_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(23)),
                lambda h: F.round(
                    F.coalesce(F.element_at(F.col("m"), h), F.lit(0.0)) * _TS_SCALE
                ).cast("long"),
            ).alias("ivec"),
        )
        .withColumn(
            "nrm",
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("ivec"), lambda x: x * x), zero_l, lambda a, x: a + x
                ).cast("double")
            ),
        )
    )
    # profiles ride through the candidate self-join (carry=): no
    # join-back, 2 shuffles beyond the profile build; pair scoring is
    # the Arrow einsum dot (exact int64, see qdot_arrow), and the
    # cross-table dedup runs AFTER scoring on narrow rows
    pairs = lsh_candidate_pairs(
        vecs, "user_id", "ivec", _TS_PLANES, _TS_L, carry=("ivec", "nrm"), distinct=False
    )
    dot = qdot_arrow()(F.col("ivec_a"), F.col("ivec_b")).cast("double")
    cos = F.round(dot / (F.col("nrm_a") * F.col("nrm_b")), 6)
    return (
        pairs.select(
            F.col("id_a").alias("user_a"), F.col("id_b").alias("user_b"), cos.alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= 0.8)
        .distinct()
    )


# --- ann_ivf: inverted-file (IVF) approximate nearest neighbors ---------

_IVF_K = 16  # centroids (inverted lists)
_IVF_NPROBE = 4  # lists probed per query


def _ivf_oracle() -> str:
    score_ac = f"ROUND({sql_qdot('v.iv', 'c.iv')} / (v.nrm * c.nrm), 6)"
    score_ab = f"ROUND({sql_qdot('a.iv', 'b.iv')} / (a.nrm * b.nrm), 6)"
    return f"""
    WITH {_QN_CTE},
    cent AS (SELECT vec_id AS cid, iv, nrm FROM qn WHERE vec_id < {_IVF_K}),
    assign AS (
        SELECT vec_id, cid FROM (
            SELECT v.vec_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {score_ac} DESC, c.cid) AS rk
            FROM qn v CROSS JOIN cent c
        ) WHERE rk = 1),
    probes AS (
        SELECT qid, cid FROM (
            SELECT v.vec_id AS qid, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {score_ac} DESC, c.cid) AS rk
            FROM qn v CROSS JOIN cent c
            WHERE v.vec_id < 5
        ) WHERE rk <= {_IVF_NPROBE}),
    cand AS (
        SELECT DISTINCT p.qid, a.vec_id
        FROM probes p JOIN assign a USING (cid)
        WHERE a.vec_id <> p.qid),
    scored AS (
        SELECT c.qid, c.vec_id, {score_ab} AS cos
        FROM cand c JOIN qn a ON a.vec_id = c.qid JOIN qn b ON b.vec_id = c.vec_id)
    SELECT qid, vec_id, cos, rk FROM (
        SELECT qid, vec_id, cos,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
        FROM scored
    ) WHERE rk <= 3
    """


@query("ann_ivf", oracle=_ivf_oracle())
def ann_ivf(spark, sf_dir):
    """Approximate top-3 neighbors for 5 query vectors via an IVF
    (inverted-file) index — the clustering-based counterpart to
    sim_ann_lsh's hashing: every vector is assigned to its nearest of
    K=16 deterministic centroids (the lowest-K vec_ids stand in for a
    k-means codebook — the assignment/probe machinery is identical and
    exactly replayable), queries probe their NPROBE=4 nearest lists,
    and only vectors in probed lists are scored exactly.

    Scale shape: centroid assignment is a broadcast join against the
    K-row codebook (one linear pass, map-side only); candidate
    generation is an equi-join on the list id — one shuffle, AQE-
    skew-handled, no cross-join anywhere. Real k-means centroids would
    drop in via Lloyd iterations (each = the same broadcast-assign +
    hash-agg re-center) without touching the query path; the fixed
    codebook keeps the op differentially verifiable bit-for-bit."""
    qn = _qn_frame(spark, sf_dir).select("vec_id", "iv", "nrm")
    cent = qn.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cid"), F.col("iv").alias("civ"), F.col("nrm").alias("cnrm")
    )
    cscore = F.round(
        qdot(F.col("iv"), F.col("civ")) / (F.col("nrm") * F.col("cnrm")), 6
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cid"))
    assign = (
        fanout(qn)
        .crossJoin(F.broadcast(cent))
        .withColumn("cs", cscore)
        .withColumn("rk", F.row_number().over(w_assign))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cid")
    )
    probes = (
        qn.filter(F.col("vec_id") < 5)
        .crossJoin(F.broadcast(cent))
        .withColumn("cs", cscore)
        .withColumn("rk", F.row_number().over(w_assign))
        .filter(F.col("rk") <= _IVF_NPROBE)
        .select(F.col("vec_id").alias("qid"), "cid")
    )
    cand = (
        assign.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        # no distinct (r15): assign carries exactly ONE cid per vec_id
        # (rk == 1) and probes has unique (qid, cid) rows, so the join
        # cannot emit a (qid, vec_id) pair twice — the oracle's
        # DISTINCT is a no-op and the dedup exchange bought nothing
        # (guide §2.4: a distinct on data that is already unique)
    )
    a = qn.select(F.col("vec_id").alias("qid"), F.col("iv").alias("qi"), F.col("nrm").alias("qnm"))
    b = qn.select("vec_id", F.col("iv").alias("di"), F.col("nrm").alias("dn"))
    scored = (
        cand.join(F.broadcast(a), "qid")
        .join(b, "vec_id")
        .withColumn(
            "cos", F.round(qdot(F.col("qi"), F.col("di")) / (F.col("qnm") * F.col("dn")), 6)
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("qid", "vec_id", "cos", "rk")
    )


# --- dedup_semantic: SemDeDup-style centroid-blocked embedding dedup ----

_SEM_THRESH = 0.30  # ~p98 of the fixtures' within-cluster cosine


def _sem_oracle() -> str:
    score_vc = f"ROUND({sql_qdot('v.iv', 'c.civ')} / (v.nrm * c.cnrm), 6)"
    return f"""
    WITH {_QN_CTE},
    cent AS (SELECT vec_id AS cid, iv AS civ, nrm AS cnrm FROM qn
             WHERE vec_id < {_IVF_K}),
    assign AS (
        SELECT vec_id, cid FROM (
            SELECT v.vec_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {score_vc} DESC, c.cid) AS rk
            FROM qn v CROSS JOIN cent c
        ) WHERE rk = 1),
    pairs AS (
        SELECT x.cid, y.vec_id AS dup_id, {_QCOS_AB} AS cos
        FROM assign x JOIN assign y ON x.cid = y.cid AND x.vec_id < y.vec_id
        JOIN qn a ON a.vec_id = x.vec_id
        JOIN qn b ON b.vec_id = y.vec_id
        WHERE {_QCOS_AB} >= {_SEM_THRESH})
    SELECT dup_id, cid, MAX(cos) AS best_cos
    FROM pairs GROUP BY dup_id, cid ORDER BY dup_id
    """


@query("dedup_semantic", oracle=_sem_oracle())
def dedup_semantic(spark, sf_dir):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023 shape):
    embeddings are bucketed by nearest centroid, and a vector is a
    removable duplicate iff some LOWER-id vector in the SAME cluster
    has cosine >= threshold — the pair search never leaves a cluster.
    Returns each removed vec with its cluster and best duplicate score.

    This is the missing middle of the dedup ladder: cheaper than
    dedup_embedding_cosine's all-pairs scan (pairs only form inside
    clusters — with K balanced clusters that is ~1/K of all pairs) and
    semantically stronger than MinHash (catches paraphrases with zero
    n-gram overlap). The deterministic low-id codebook stands in for
    k-means exactly as in ann_ivf, keeping the op bit-replayable; the
    per-cluster pair join is an equi-join on cid, so 100 TB scaling is
    the familiar blocked-join shape (skewed clusters are AQE's
    problem, and ivf_train_step shows how the codebook would be
    refined in place)."""
    qn = _qn_frame(spark, sf_dir).select("vec_id", "iv", "nrm")
    cent = qn.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cid"), F.col("iv").alias("civ"), F.col("nrm").alias("cnrm")
    )
    cscore = F.round(
        qdot(F.col("iv"), F.col("civ")) / (F.col("nrm") * F.col("cnrm")), 6
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cid"))
    assign = (
        fanout(qn)
        .crossJoin(F.broadcast(cent))
        .withColumn("cs", cscore)
        .withColumn("rk", F.row_number().over(w_assign))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cid", "iv", "nrm")
    )
    lo = assign.select(
        "cid", F.col("vec_id").alias("keep_id"),
        F.col("iv").alias("ia"), F.col("nrm").alias("na"),
    )
    hi = assign.select(
        "cid", F.col("vec_id").alias("dup_id"),
        F.col("iv").alias("ib"), F.col("nrm").alias("nb"),
    )
    cos = F.round(qdot(F.col("ia"), F.col("ib")) / (F.col("na") * F.col("nb")), 6)
    return (
        lo.join(hi, "cid")
        .filter(F.col("keep_id") < F.col("dup_id"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= _SEM_THRESH)
        .groupBy("dup_id", "cid")
        .agg(F.max("cos").alias("best_cos"))
        .orderBy("dup_id")
    )


# --- ivf_train_step: one Lloyd iteration over the IVF codebook ----------


def _lloyd_oracle() -> str:
    score_vc = f"ROUND({sql_qdot('v.iv', 'c.civ')} / (v.nrm * c.cnrm), 6)"
    return f"""
    WITH {_QN_CTE},
    cent AS (SELECT vec_id AS cid, iv AS civ, nrm AS cnrm FROM qn
             WHERE vec_id < {_IVF_K}),
    assign AS (
        SELECT vec_id, cid FROM (
            SELECT v.vec_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {score_vc} DESC, c.cid) AS rk
            FROM qn v CROSS JOIN cent c
        ) WHERE rk = 1),
    flat AS (
        -- WITH ORDINALITY is unimplemented in DuckDB 1.0; a lateral
        -- generate_series over the array length + 1-based indexing is
        -- the portable equivalent.
        SELECT a.cid, u.pos - 1 AS pos, v.iv[u.pos] AS val
        FROM assign a JOIN qn v ON v.vec_id = a.vec_id,
        UNNEST(generate_series(1, len(v.iv))) AS u(pos))
    SELECT cid, CAST(pos AS INT) AS pos,
           CAST(COUNT(*) AS BIGINT) AS member_dims,
           ROUND(CAST(SUM(val) AS DOUBLE) / COUNT(*) / {QSCALE}, 6) AS new_val
    FROM flat GROUP BY cid, pos ORDER BY cid, pos
    """


@query("ivf_train_step", oracle=_lloyd_oracle())
def ivf_train_step(spark, sf_dir):
    """One Lloyd (k-means) iteration over the IVF codebook: broadcast-
    assign every vector to its nearest centroid, then re-center each
    centroid as the elementwise mean of its members. This is the
    training loop ann_ivf's docstring promises, materialized as a
    DataFrame op: posexplode flattens (vector, dim) pairs, one hash
    agg per (cluster, dim) computes the mean — exact BIGINT sums over
    quantized components, one double division, so the refined codebook
    is bit-identical at any parallelism (builtin fp means are not).

    Per-iteration cost at 100 TB: one broadcast join (K rows) + one
    map-side-combined agg whose shuffle carries K x dim rows total —
    independent of corpus size. Iterating is a driver-side loop of
    this op with localCheckpoint, exactly like graph_pagerank's."""
    qn = _qn_frame(spark, sf_dir).select("vec_id", "iv", "nrm")
    cent = qn.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cid"), F.col("iv").alias("civ"), F.col("nrm").alias("cnrm")
    )
    cscore = F.round(
        qdot(F.col("iv"), F.col("civ")) / (F.col("nrm") * F.col("cnrm")), 6
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cid"))
    assign = (
        fanout(qn)
        .crossJoin(F.broadcast(cent))
        .withColumn("cs", cscore)
        .withColumn("rk", F.row_number().over(w_assign))
        .filter(F.col("rk") == 1)
        .select("cid", "iv")
    )
    flat = assign.select("cid", F.posexplode("iv").alias("pos", "val"))
    return (
        flat.groupBy("cid", "pos")
        .agg(
            F.count(F.lit(1)).alias("member_dims"),
            F.round(
                F.sum("val").cast("double") / F.count(F.lit(1)) / F.lit(QSCALE), 6
            ).alias("new_val"),
        )
        .select(
            "cid", F.col("pos").cast("int").alias("pos"), "member_dims", "new_val"
        )
        .orderBy("cid", "pos")
    )


# --- product quantization (PQ) ------------------------------------------

_PQ_M = 8  # subspaces
_PQ_SUB = 8  # dims per subspace (8 x 8 = the 64-dim embedding)
_PQ_K = 4  # centroids per subspace codebook


def _pq_key_sql(m: int) -> str:
    """BIGINT key = subspace-m squared distance * K + cid. MIN over the
    key is simultaneously the argmin (key % K, ties to smaller cid)
    and the min distance (key // K) — one plain MIN agg per subspace
    instead of a window per subspace, identical in both engines."""
    lo, hi = m * _PQ_SUB + 1, (m + 1) * _PQ_SUB
    d = (
        f"CAST(list_sum(list_transform("
        f"list_zip(list_slice(v.iv, {lo}, {hi}), list_slice(c.iv, {lo}, {hi})),"
        f" p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT)"
    )
    return f"({d} * {_PQ_K} + c.cid)"


def _pq_dist_expr(m: int, a: str = "iv", b: str = "civ") -> str:
    """Spark-SQL text for subspace-m's exact squared distance — built
    once at import and parsed JVM-side in ONE call per subspace
    (guide §1 / the change-3 pattern: the Column-object form issued
    ~10 py4j round trips per subspace per DataFrame BUILD, and the
    bench pays the build on every timed run)."""
    lo = m * _PQ_SUB + 1
    return (
        f"aggregate(zip_with(slice({a}, {lo}, {_PQ_SUB}), "
        f"slice({b}, {lo}, {_PQ_SUB}), (x, y) -> (x - y) * (x - y)), "
        f"0L, (acc, x) -> acc + x)"
    )


_PQ_KEY_EXPRS = [f"({_pq_dist_expr(m)}) * {_PQ_K} + cid" for m in range(_PQ_M)]
_PQ_DIST_EXPRS = [_pq_dist_expr(m) for m in range(_PQ_M)]


def _pq_codes_cte() -> str:
    keys = ", ".join(f"MIN({_pq_key_sql(m)}) AS k{m}" for m in range(_PQ_M))
    codes = ", ".join(f"k{m} % {_PQ_K} AS code_{m}" for m in range(_PQ_M))
    err = " + ".join(f"k{m} // {_PQ_K}" for m in range(_PQ_M))
    return f"""
    qv AS (SELECT vec_id, {sql_quantized('embedding')} AS iv FROM embeddings),
    cent AS (SELECT vec_id AS cid, iv FROM qv WHERE vec_id < {_PQ_K}),
    keys AS (SELECT v.vec_id, {keys} FROM qv v CROSS JOIN cent c GROUP BY v.vec_id),
    codes AS (SELECT vec_id, {codes}, {err} AS recon_err FROM keys)
"""


def _pq_codes_frame(spark, sf_dir):
    """(vec_id, code_0..code_{{M-1}}, recon_err): each subspace coded as
    the argmin-distance centroid of a K-entry codebook (the lowest-K
    vec_ids' sub-vectors stand in for a trained codebook, as in
    ann_ivf). All arithmetic is exact longs over quantized vectors, so
    codes AND total squared reconstruction error replay bit-for-bit in
    the oracle. Plan: one broadcast cross-join against the K-row
    codebook, 8 min-keyed aggs in ONE map-side-combined hash agg."""
    e = load(spark, sf_dir, "embeddings")
    qv = e.select("vec_id", quantized(F.col("embedding")).alias("iv"))
    cent = qv.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("cid"), F.col("iv").alias("civ")
    )
    keys = (
        fanout(qv)
        .crossJoin(F.broadcast(cent))
        .groupBy("vec_id")
        # import-time expression text, one JVM parse per subspace
        # (see _pq_dist_expr) — the Column-object zip_with/aggregate
        # loop here dominated this frame's per-call build latency
        .agg(*[F.min(F.expr(_PQ_KEY_EXPRS[m])).alias(f"k{m}") for m in range(_PQ_M)])
    )
    # exact floor-div by _PQ_K via bit shift: `/` would round-trip
    # through double and corrupt keys past 2^53 (squared quantized
    # distances get there). The shift is DERIVED from _PQ_K — a
    # hardcoded `2` would silently break recon_err if K changed.
    assert _PQ_K & (_PQ_K - 1) == 0, "_PQ_K must stay a power of two"
    k_bits = _PQ_K.bit_length() - 1
    err = None
    for m in range(_PQ_M):
        term = F.shiftright(F.col(f"k{m}"), k_bits)
        err = term if err is None else err + term
    return keys.select(
        "vec_id",
        *[(F.col(f"k{m}") % _PQ_K).alias(f"code_{m}") for m in range(_PQ_M)],
        err.alias("recon_err"),
    )


@query(
    "embedding_pq",
    oracle=f"""
    WITH {_pq_codes_cte()}
    SELECT * FROM codes ORDER BY vec_id
    """,
)
def embedding_pq(spark, sf_dir):
    """Product quantization — the ANN storage path at scale (Jégou et
    al.'s PQ: split the 64-dim vector into M=8 subspaces, code each
    against a K=4-entry subspace codebook): 64 floats compress to 8
    2-bit codes, and the total squared reconstruction error is
    reported per vector for quantization audits (the same role
    embedding_quantize's int8 path plays, one compression tier down).

    100 TB shape: the codebook is K rows broadcast once; coding is a
    single linear pass (cross join against the broadcast + one
    map-side-combined 8-aggregate hash agg keyed on vec_id) — no
    all-pairs stage anywhere. Integer-exact: quantized longs in,
    min-keyed (dist * K + cid) BIGINT aggs out, so the oracle matches
    bit-for-bit including tie-breaks (smaller cid wins)."""
    return _pq_codes_frame(spark, sf_dir).orderBy("vec_id")


def _pq_adc_oracle() -> str:
    tall_codes = " UNION ALL ".join(
        f"SELECT vec_id, {m} AS m, code_{m} AS code FROM codes"
        for m in range(_PQ_M)
    )
    lut_dist = ", ".join(f"{_pq_key_sql(m)} // {_PQ_K} AS d{m}" for m in range(_PQ_M))
    tall_lut = " UNION ALL ".join(
        f"SELECT qid, cid, {m} AS m, d{m} AS pd FROM lut" for m in range(_PQ_M)
    )
    return f"""
    WITH {_pq_codes_cte()},
    lut AS (SELECT v.vec_id AS qid, c.cid, {lut_dist}
            FROM qv v CROSS JOIN cent c WHERE v.vec_id < 5),
    tcodes AS ({tall_codes}),
    tlut AS ({tall_lut}),
    adc AS (SELECT t.qid, x.vec_id, CAST(SUM(t.pd) AS BIGINT) AS adc
            FROM tcodes x JOIN tlut t ON t.m = x.m AND t.cid = x.code
            WHERE x.vec_id <> t.qid
            GROUP BY t.qid, x.vec_id)
    SELECT qid, vec_id, adc, rk FROM (
        SELECT qid, vec_id, adc,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, vec_id) AS rk
        FROM adc
    ) WHERE rk <= 3
    """


@query("sim_pq_adc", oracle=_pq_adc_oracle())
def sim_pq_adc(spark, sf_dir):
    """Asymmetric distance computation (ADC) top-3 over PQ codes: each
    of 5 query vectors precomputes a (subspace, centroid) -> partial-
    distance lookup table against the codebook (5 x 8 x 4 = 160 tiny
    rows), and every database vector's approximate distance is the sum
    of 8 LUT entries selected by its stored codes — the scan never
    touches the original vectors, which is the entire point of PQ at
    100 TB: the index is 2 bits per subspace per vector.

    Plan: codes melt to (vec_id, m, code) via posexplode (narrow), the
    LUT broadcasts, the per-pair partial distances hash-agg on
    (qid, vec_id), and the top-3 is a per-query window — broadcast
    equi-joins and aggs only, no cross join on the scan side, all
    arithmetic exact longs."""
    codes = _pq_codes_frame(spark, sf_dir)
    tcodes = codes.select(
        "vec_id",
        F.posexplode(F.array(*[F.col(f"code_{m}") for m in range(_PQ_M)])).alias(
            "m", "code"
        ),
    )

    e = load(spark, sf_dir, "embeddings")
    qv = e.select("vec_id", quantized(F.col("embedding")).alias("iv"))
    cent = qv.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("cid"), F.col("iv").alias("civ")
    )
    # import-time expression text, one JVM parse per subspace (see
    # _pq_dist_expr) — the Column-object zip_with/aggregate loop here
    # dominated the LUT's per-call build latency
    lut_wide = (
        qv.filter(F.col("vec_id") < 5)
        .crossJoin(F.broadcast(cent))
        .select(
            F.col("vec_id").alias("qid"),
            "cid",
            *[F.expr(_PQ_DIST_EXPRS[m]).alias(f"d{m}") for m in range(_PQ_M)],
        )
    )
    tlut = lut_wide.select(
        "qid",
        "cid",
        F.posexplode(F.array(*[F.col(f"d{m}") for m in range(_PQ_M)])).alias("m", "pd"),
    )
    adc = (
        tcodes.alias("x")
        .join(
            F.broadcast(tlut.alias("t")),
            (F.col("x.m") == F.col("t.m")) & (F.col("x.code") == F.col("t.cid")),
        )
        .filter(F.col("x.vec_id") != F.col("t.qid"))
        .groupBy(F.col("t.qid").alias("qid"), F.col("x.vec_id").alias("vec_id"))
        .agg(F.sum("t.pd").alias("adc"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adc"), F.asc("vec_id"))
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("qid", "vec_id", "adc", "rk")
    )


def _knn_graph_oracle() -> str:
    b0 = sql_bucket("iv", _ANN_PLANES[:_ANN_K])
    b1 = sql_bucket("iv", _ANN_PLANES[_ANN_K:])
    score = f"ROUND({sql_qdot('a.iv', 'b.iv')} / (a.nrm * b.nrm), 6)"
    return f"""
    WITH {_QN_CTE},
    bk AS (SELECT vec_id, iv, nrm, {b0} AS b0, {b1} AS b1 FROM qn),
    tall AS (
        SELECT vec_id, 0 AS t, b0 AS bucket FROM bk
        UNION ALL
        SELECT vec_id, 1 AS t, b1 AS bucket FROM bk),
    cand AS (
        SELECT DISTINCT s.vec_id AS src, d.vec_id AS dst
        FROM tall s JOIN tall d ON s.t = d.t AND s.bucket = d.bucket
                                AND d.vec_id <> s.vec_id),
    scored AS (
        SELECT c.src, c.dst, {score} AS cos
        FROM cand c JOIN qn a ON a.vec_id = c.src JOIN qn b ON b.vec_id = c.dst)
    SELECT src, dst, cos, rk FROM (
        SELECT src, dst, cos,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rk
        FROM scored
    ) WHERE rk <= 3
    """


@query("knn_graph", oracle=_knn_graph_oracle())
def knn_graph(spark, sf_dir):
    """Approximate k-NN GRAPH over the whole embedding table (every
    node gets its top-3 bucket-mate neighbors) — the backbone of
    graph-based semantic dedup, SemDeDup-style cluster refinement,
    and kNN-graph ANN indexes. Unlike sim_ann_lsh (5 broadcast query
    vectors), BOTH sides here are the full table, so candidate
    generation is a plain shuffled self-equi-join on (table, bucket):
    no broadcast, no cross join, AQE splits skewed buckets. Scoring
    joins the candidate edge list back to the quantized vectors by id
    (two shuffled equi-joins at 100 TB; sort-merge-friendly), and
    ranking is a per-source window over ≤ bucket-size candidates.
    The deterministic hyperplane literals are mirrored into the
    oracle, so the approximate result is verified exactly."""
    qn = _qn_frame(spark, sf_dir).select("vec_id", "iv", "nrm")
    # Arrow-vectorized signatures (identical int64 buckets, same
    # oracle literals) — see operators/vectors.py::_lsh_signatures
    tall = lsh_tall_frame(qn, "vec_id", "iv", _ANN_PLANES, _ANN_L)
    dst = tall.select(F.col("vec_id").alias("dst"), "t", "bucket")
    cand = (
        tall.select(F.col("vec_id").alias("src"), "t", "bucket")
        .join(dst, ["t", "bucket"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    a = qn.select(F.col("vec_id").alias("src"), F.col("iv").alias("si"), F.col("nrm").alias("sn"))
    b = qn.select(F.col("vec_id").alias("dst"), F.col("iv").alias("di"), F.col("nrm").alias("dn"))
    scored = (
        cand.join(a, "src")
        .join(b, "dst")
        .withColumn(
            "cos", F.round(qdot(F.col("si"), F.col("di")) / (F.col("sn") * F.col("dn")), 6)
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("src", "dst", "cos", "rk")
    )


# --- ann_ivf_pq_query: the composed IVF->ADC serving query ---------------


def _ivf_pq_oracle() -> str:
    score_vc = f"ROUND({sql_qdot('v.iv', 'c.iv')} / (v.nrm * c.nrm), 6)"
    lut_dist = ", ".join(f"{_pq_key_sql(m)} // {_PQ_K} AS d{m}" for m in range(_PQ_M))
    tall_codes = " UNION ALL ".join(
        f"SELECT vec_id, {m} AS m, code_{m} AS code FROM codes"
        for m in range(_PQ_M)
    )
    tall_lut = " UNION ALL ".join(
        f"SELECT qid, cid, {m} AS m, d{m} AS pd FROM lut" for m in range(_PQ_M)
    )
    return f"""
    WITH {_pq_codes_cte()},
    qn AS (SELECT vec_id, iv, {sql_qnorm('iv')} AS nrm FROM qv),
    ccent AS (SELECT vec_id AS cid, iv, nrm FROM qn WHERE vec_id < {_IVF_K}),
    assign AS (
        SELECT vec_id, cid FROM (
            SELECT v.vec_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {score_vc} DESC, c.cid) AS rk
            FROM qn v CROSS JOIN ccent c
        ) WHERE rk = 1),
    probes AS (
        SELECT qid, cid FROM (
            SELECT v.vec_id AS qid, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {score_vc} DESC, c.cid) AS rk
            FROM qn v CROSS JOIN ccent c
            WHERE v.vec_id < 5
        ) WHERE rk <= {_IVF_NPROBE}),
    cnd AS (
        SELECT DISTINCT p.qid, a.vec_id
        FROM probes p JOIN assign a USING (cid)
        WHERE a.vec_id <> p.qid),
    lut AS (SELECT v.vec_id AS qid, c.cid, {lut_dist}
            FROM qv v CROSS JOIN cent c WHERE v.vec_id < 5),
    tcodes AS ({tall_codes}),
    tlut AS ({tall_lut}),
    adc AS (SELECT cd.qid, cd.vec_id, CAST(SUM(t.pd) AS BIGINT) AS adc
            FROM cnd cd
            JOIN tcodes x ON x.vec_id = cd.vec_id
            JOIN tlut t ON t.qid = cd.qid AND t.m = x.m AND t.cid = x.code
            GROUP BY cd.qid, cd.vec_id)
    SELECT qid, vec_id, adc, rk FROM (
        SELECT qid, vec_id, adc,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, vec_id) AS rk
        FROM adc
    ) WHERE rk <= 3
    """


@query("ann_ivf_pq_query", oracle=_ivf_pq_oracle())
def ann_ivf_pq_query(spark, sf_dir):
    """The query a vector-search user actually serves: IVF coarse
    probing COMPOSED with PQ/ADC fine scoring (the IVFADC pipeline of
    Jégou et al.) — probe the NPROBE=4 nearest of 16 inverted lists
    per query, then ADC-score ONLY the vectors in probed lists via
    the 8-subspace LUT, never touching original vectors at scan
    time. ann_ivf (coarse tier) and sim_pq_adc (fine tier) are each
    oracle-exact on their own; this op proves the two index tiers
    compose, which is what an end-to-end serving path needs.

    Plan: coarse assignment and probes are broadcast cross-joins
    against the 16-row centroid table (map-side); candidates are one
    equi-join on the list id; the LUT (5 x 16 x 8 rows) broadcasts;
    ADC is one combining hash agg on (qid, vec_id); top-3 is a
    per-query window over candidate rows only. No cross join touches
    the table side, and the scan reads 2-bit codes, not vectors — the
    100 TB property that makes IVFADC the standard billion-vector
    layout. All arithmetic exact longs over quantized vectors."""
    qn = _qn_frame(spark, sf_dir).select("vec_id", "iv", "nrm")
    ccent = qn.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cid"), F.col("iv").alias("civ"), F.col("nrm").alias("cnrm")
    )
    cscore = F.round(
        qdot(F.col("iv"), F.col("civ")) / (F.col("nrm") * F.col("cnrm")), 6
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cid"))
    assign = (
        fanout(qn)
        .crossJoin(F.broadcast(ccent))
        .withColumn("cs", cscore)
        .withColumn("rk", F.row_number().over(w_assign))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cid")
    )
    probes = (
        qn.filter(F.col("vec_id") < 5)
        .crossJoin(F.broadcast(ccent))
        .withColumn("cs", cscore)
        .withColumn("rk", F.row_number().over(w_assign))
        .filter(F.col("rk") <= _IVF_NPROBE)
        .select(F.col("vec_id").alias("qid"), "cid")
    )
    cand = (
        assign.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        # no distinct (r15): assign carries exactly ONE cid per vec_id
        # (rk == 1) and probes has unique (qid, cid) rows, so the join
        # cannot emit a (qid, vec_id) pair twice — the oracle's
        # DISTINCT is a no-op and the dedup exchange bought nothing
        # (guide §2.4: a distinct on data that is already unique)
    )

    codes = _pq_codes_frame(spark, sf_dir)
    tcodes = codes.select(
        "vec_id",
        F.posexplode(F.array(*[F.col(f"code_{m}") for m in range(_PQ_M)])).alias(
            "m", "code"
        ),
    )
    e = load(spark, sf_dir, "embeddings")
    qv = e.select("vec_id", quantized(F.col("embedding")).alias("iv"))
    pcent = qv.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("cid"), F.col("iv").alias("civ")
    )
    # import-time expression text, one JVM parse per subspace (see
    # _pq_dist_expr) — the Column-object zip_with/aggregate loop here
    # dominated the LUT's per-call build latency
    lut_wide = (
        qv.filter(F.col("vec_id") < 5)
        .crossJoin(F.broadcast(pcent))
        .select(
            F.col("vec_id").alias("qid"),
            "cid",
            *[F.expr(_PQ_DIST_EXPRS[m]).alias(f"d{m}") for m in range(_PQ_M)],
        )
    )
    tlut = lut_wide.select(
        "qid",
        "cid",
        F.posexplode(F.array(*[F.col(f"d{m}") for m in range(_PQ_M)])).alias("m", "pd"),
    )
    adc = (
        cand.join(tcodes, "vec_id")
        .join(
            F.broadcast(tlut.select(F.col("qid").alias("lqid"), "cid", F.col("m").alias("lm"), "pd")),
            (F.col("qid") == F.col("lqid"))
            & (F.col("m") == F.col("lm"))
            & (F.col("code") == F.col("cid")),
        )
        .groupBy("qid", "vec_id")
        .agg(F.sum("pd").alias("adc"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adc"), F.asc("vec_id"))
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("qid", "vec_id", "adc", "rk")
    )


# --------------------------------------------------------------------------
# rank_fusion_rrf — reciprocal-rank fusion of two retrievers
# --------------------------------------------------------------------------

# The BM25 retriever half: reuse text_bm25's registered oracle verbatim
# as a CTE so the fused oracle can never drift from the component op.
from deltasink_spark.queries import trainprep as _tp  # noqa: E402
from deltasink_spark.registry import ORACLES as _ORACLES  # noqa: E402


@query(
    "rank_fusion_rrf",
    oracle=f"""
    WITH bm AS ({_ORACLES["text_bm25"]}),
    bmr AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
                 AS r_bm25
        FROM bm),
    {_QN_CTE},
    cs AS (
        SELECT b.vec_id AS doc_id, {_QCOS_AB} AS cos
        FROM qn b CROSS JOIN (SELECT iv, nrm FROM qn WHERE vec_id = 0) a
        WHERE b.vec_id <> 0
        ORDER BY cos DESC, b.vec_id LIMIT 50),
    csr AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS BIGINT)
                 AS r_cos
        FROM cs),
    f AS (
        SELECT COALESCE(bmr.doc_id, csr.doc_id) AS doc_id, r_bm25, r_cos,
               ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + r_bm25), 0)
                     + COALESCE(CAST(1 AS DOUBLE) / (60 + r_cos), 0), 6)
                 AS rrf
        FROM bmr FULL OUTER JOIN csr ON bmr.doc_id = csr.doc_id)
    SELECT doc_id, r_bm25, r_cos, rrf FROM f
    ORDER BY rrf DESC, doc_id LIMIT 20
    """,
)
def rank_fusion_rrf(spark, sf_dir):
    """Reciprocal-rank fusion (k=60) of the two retrievers the engine
    already ships — lexical BM25 ([text_bm25]'s fixed query terms over
    documents) and dense cosine ([sim_topk_search]'s vec_id=0 probe
    over the aligned embeddings) — the standard hybrid-search merge:
    rrf = sum_i 1/(60 + rank_i), ranks missing from a list contribute
    0. Emits the fused top-20 with both component ranks (NULL where a
    doc appears in only one list).

    Determinism: both component scores are already 6dp-rounded exact
    values with doc_id tie-breaks, so each top-50 SET and its ranks
    are engine-independent; the fusion is one identical IEEE tree
    rounded 6dp, final ties broken by doc_id.

    Scale: each retriever ends in a TakeOrderedAndProject top-50
    (per-partition heaps, driver merge) — the only global windows run
    on those <=50-row frames; the fusion is a full outer join of two
    50-row lists. At 100 TB the retrievers are the scans; the fusion
    cost is constant."""
    bm = _tp.text_bm25(spark, sf_dir)
    wb = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    bmr = bm.select(
        "doc_id", F.row_number().over(wb).cast("long").alias("r_bm25")
    )
    qn = _qn_frame(spark, sf_dir)
    probe = qn.filter(F.col("vec_id") == 0).select(
        F.col("iv").alias("qi"), F.col("nrm").alias("qn")
    )
    cos = F.round(
        qdot(F.col("qi"), F.col("iv")) / (F.col("qn") * F.col("nrm")), 6
    )
    cs = (
        qn.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(F.col("vec_id").alias("doc_id"), cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc("doc_id"))
        .limit(50)
    )
    wc = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    csr = cs.select(
        "doc_id", F.row_number().over(wc).cast("long").alias("r_cos")
    )
    one = F.lit(1).cast("double")
    f = bmr.join(csr, "doc_id", "full").select(
        "doc_id",
        "r_bm25",
        "r_cos",
        F.round(
            F.coalesce(one / (60 + F.col("r_bm25")), F.lit(0.0))
            + F.coalesce(one / (60 + F.col("r_cos")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return f.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(20)


@query(
    "ann_recall_at_k",
    oracle=f"""
    WITH {_QN_CTE},
    ann AS ({_ann_oracle()}),
    gt AS (
        SELECT qid, vec_id FROM (
            SELECT q.vec_id AS qid, b.vec_id AS vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY ROUND({sql_qdot('q.iv', 'b.iv')}
                                      / (q.nrm * b.nrm), 6) DESC,
                                b.vec_id) AS rk
            FROM qn q JOIN qn b ON b.vec_id <> q.vec_id
            WHERE q.vec_id < 5) t
        WHERE rk <= 3),
    hits AS (
        SELECT g.qid, CAST(COUNT(a.vec_id) AS BIGINT) AS n_hits
        FROM gt g LEFT JOIN ann a
            ON a.qid = g.qid AND a.vec_id = g.vec_id
        GROUP BY g.qid)
    SELECT qid, n_hits,
           ROUND(CAST(n_hits AS DOUBLE) / 3, 6) AS recall_at_3
    FROM hits ORDER BY qid
    """,
)
def ann_recall_at_k(spark, sf_dir):
    """Recall@3 of the sign-LSH ANN index ([sim_ann_lsh]) against the
    exact brute-force top-3 — the index-quality eval every vector
    platform runs before trusting an approximate index (tune K/L until
    recall clears the bar). Emits per-query hit counts and recall.

    Both component rankings are deterministic (6dp-rounded exact
    int64 cosines, vec_id tie-breaks), so an APPROXIMATE index gets an
    EXACT differential oracle — the ann CTE embeds sim_ann_lsh's
    registered oracle text verbatim, so the eval can never drift from
    the op it evaluates.

    Scale: ground truth is brute force per PROBE (a broadcast of the
    5-query panel against one corpus scan — recall eval always runs on
    a sampled query panel, never all-pairs); the ANN side is the
    bucket equi-join path being evaluated; the final compare joins two
    15-row lists."""
    ann = sim_ann_lsh(spark, sf_dir).select("qid", "vec_id")
    qn = _qn_frame(spark, sf_dir).select("vec_id", "iv", "nrm")
    qs = qn.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("iv").alias("qi"),
        F.col("nrm").alias("qnm"),
    )
    scored = (
        qn.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn(
            "cos",
            F.round(
                qdot(F.col("qi"), F.col("iv")) / (F.col("qnm") * F.col("nrm")), 6
            ),
        )
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    gt = (
        scored.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= 3)
        .select("qid", "vec_id")
    )
    hits = (
        gt.join(ann.withColumn("hit", F.lit(1)), ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(F.count(F.col("hit")).cast("long").alias("n_hits"))
    )
    return hits.select(
        "qid",
        "n_hits",
        F.round(F.col("n_hits").cast("double") / 3, 6).alias("recall_at_3"),
    ).orderBy("qid")


def _ann_incremental_oracle() -> str:
    b0 = sql_bucket("iv", _ANN_PLANES[:_ANN_K])
    b1 = sql_bucket("iv", _ANN_PLANES[_ANN_K:])
    score = f"ROUND({sql_qdot('a.iv', 'b.iv')} / (a.nrm * b.nrm), 6)"
    return f"""
    WITH {_QN_CTE},
    bk AS (SELECT vec_id, iv, nrm, {b0} AS b0, {b1} AS b1 FROM qn),
    tall AS (
        SELECT vec_id, 0 AS t, b0 AS bucket FROM bk
        UNION ALL
        SELECT vec_id, 1 AS t, b1 AS bucket FROM bk),
    cand AS (
        SELECT DISTINCT q.vec_id AS qid, d.vec_id AS vec_id
        FROM tall q JOIN tall d ON q.t = d.t AND q.bucket = d.bucket
                                AND d.vec_id <> q.vec_id
        WHERE q.vec_id % 10 = 0),
    scored AS (
        SELECT c.qid, c.vec_id, {score} AS cos
        FROM cand c JOIN qn a ON a.vec_id = c.qid JOIN qn b ON b.vec_id = c.vec_id)
    SELECT qid, vec_id, cos, rk FROM (
        SELECT qid, vec_id, cos,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
        FROM scored
    ) WHERE rk <= 3
    """


@query("ann_index_incremental", oracle=_ann_incremental_oracle())
def ann_index_incremental(spark, sf_dir):
    """INCREMENTAL ANN index maintenance (the r12 verdict's missing
    #6) — the shape a continuously-ingesting vector store actually
    runs: the sign-LSH band index for the EXISTING corpus (vec_id %
    10 != 0) is PERSISTED as a Delta table of (vec_id, t, bucket)
    rows — built once, when those vectors arrived — and a NEW batch
    (vec_id % 10 == 0) is served by probing delta-bands x index with
    one equi-join on (t, bucket), plus delta x delta for intra-batch
    neighbors. Per-batch cost is O(|delta| x bucket occupancy), never
    O(|corpus|): the corpus is touched only through the index table
    (band-bucket metadata, prunable/bucketable at 100 TB), not
    re-hashed or re-paired. After serving, the delta bands APPEND
    into the index (one Delta commit) and the op asserts the
    maintained index now equals a from-scratch rebuild — convergence,
    the invariant that lets the daemon run forever. The oracle is the
    FULL-REBUILD answer restricted to delta-probing queries: same
    plane literals, same buckets, exact quantized cosine, top-3 per
    new vector."""
    import shutil
    import tempfile

    from deltasink_spark.delta_log import DeltaLogTable

    # one quantize pass, pinned: corpus index build, delta probe,
    # scoring and the convergence proof all reuse it
    qn = (
        _qn_frame(spark, sf_dir)
        .select("vec_id", "iv", "nrm")
        .localCheckpoint(eager=False)
    )
    is_delta = F.col("vec_id") % 10 == 0
    corpus = qn.filter(~is_delta)
    delta = qn.filter(is_delta)
    # scratch index table, removed after the convergence proof (the
    # returned frame is eagerly checkpointed, so nothing downstream
    # reads the index dir) — a bench run must not leak a table per run
    idx_root = tempfile.mkdtemp(prefix="ds_annidx_")
    idx = DeltaLogTable(idx_root)
    try:
        tall_corpus = lsh_tall_frame(
            corpus, "vec_id", "iv", _ANN_PLANES, _ANN_L
        ).select("vec_id", "t", "bucket")
        idx.append(tall_corpus)
        tall_delta = (
            lsh_tall_frame(delta, "vec_id", "iv", _ANN_PLANES, _ANN_L)
            .select("vec_id", "t", "bucket")
            .localCheckpoint(eager=False)
        )
        probe = tall_delta.select(
            F.col("vec_id").alias("qid"), "t", "bucket"
        )
        searchable = idx.read(spark).unionByName(tall_delta)
        cand = (
            probe.join(searchable, ["t", "bucket"])
            .filter(F.col("vec_id") != F.col("qid"))
            .select("qid", "vec_id")
            .distinct()
        )
        a = qn.select(
            F.col("vec_id").alias("qid"),
            F.col("iv").alias("qi"),
            F.col("nrm").alias("qnm"),
        )
        b = qn.select(
            "vec_id", F.col("iv").alias("di"), F.col("nrm").alias("dn")
        )
        # no broadcast HINT on the delta side: a batch is usually small
        # enough that AQE broadcasts it anyway, but a backfill-sized
        # batch must degrade to a shuffle join, not OOM the driver
        scored = (
            cand.join(a, "qid")
            .join(b, "vec_id")
            .withColumn(
                "cos",
                F.round(
                    qdot(F.col("qi"), F.col("di"))
                    / (F.col("qnm") * F.col("dn")),
                    6,
                ),
            )
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("cos").desc(), F.col("vec_id")
        )
        out = (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("qid", "vec_id", "cos", "rk")
            .localCheckpoint()
        )
        # index MAINTENANCE: the delta bands join the persisted index
        # in one commit; the maintained index must equal a full rebuild
        # (corpus bands ∪ delta bands — the rebuild is exactly that
        # union because banding is per-row, so no third LSH pass is
        # needed)
        idx.append(tall_delta)
        rebuilt = tall_corpus.unionByName(tall_delta)
        maintained = idx.read(spark)
        # multiset equality as ONE signed-union aggregation (the
        # min_label_components convergence-check move): both
        # directional exceptAll().isEmpty() probes always ran on the
        # (converged) happy path — two shuffle-heavy jobs where one
        # hash-agg suffices; limit(1) stops at the first difference
        diverged = (
            maintained.select("vec_id", "t", "bucket", F.lit(1).alias("w"))
            .unionByName(rebuilt.select("vec_id", "t", "bucket", F.lit(-1).alias("w")))
            .groupBy("vec_id", "t", "bucket")
            .agg(F.sum("w").alias("w"))
            .filter(F.col("w") != 0)
            .limit(1)
            .count()
        )
        if diverged:
            raise AssertionError(
                "maintained ANN index diverged from a full rebuild"
            )
        return out
    finally:
        shutil.rmtree(idx_root, ignore_errors=True)
