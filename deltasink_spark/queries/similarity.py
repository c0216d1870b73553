"""Similarity search (SURVEY.md §2.11): exact cosine pair scoring,
top-k nearest-neighbor search, k-NN join, and time-series similarity.

Scale shapes:
- sim_topk_search: score-all + TakeOrderedAndProject (distributed heap
  top-k, no global sort) — the brute-force baseline that is also the
  per-bucket scorer of an IVF/LSH layout.
- sim_topk_join: broadcast the (small) query set, score, per-query
  window top-k. At 100 TB the band-bucket equi-join of
  operators/minhash.py replaces the broadcast crossJoin as pre-filter.
- ts_similarity: users become sparse hour-profile vectors; the pair dot
  product is an equi-join on the hour key — no dense vectors shipped.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deltasink_spark.operators.vectors import cosine, sql_cosine
from deltasink_spark.registry import query
from deltasink_spark.tables import load

_COS_AB = sql_cosine("CAST(a.embedding AS DOUBLE[])", "CAST(b.embedding AS DOUBLE[])")


@query(
    "sim_cosine_pairs",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label_a, b.label AS label_b,
           {_COS_AB} AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_COS_AB} >= 0.35
    """,
)
def sim_cosine_pairs(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("label_a"), F.col("embedding").alias("ea")
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("label_b"), F.col("embedding").alias("eb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cos") >= 0.35)
        .select("id_a", "id_b", "label_a", "label_b", "cos")
    )


@query(
    "sim_topk_search",
    oracle=f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
    SELECT b.vec_id, b.label,
           {sql_cosine('CAST(q.embedding AS DOUBLE[])', 'CAST(b.embedding AS DOUBLE[])')} AS cos
    FROM embeddings b CROSS JOIN q
    WHERE b.vec_id <> 0
    ORDER BY cos DESC, b.vec_id
    LIMIT 10
    """,
)
def sim_topk_search(spark, sf_dir):
    """Top-10 neighbors of the vec_id=0 query vector. orderBy+limit
    plans TakeOrderedAndProject: per-partition heaps, driver merge."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn("cos", cosine(F.col("qe"), F.col("embedding")))
        .select("vec_id", "label", "cos")
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(10)
    )


@query(
    "sim_topk_join",
    oracle=f"""
    SELECT qid, vec_id, cos, rk FROM (
        SELECT a.vec_id AS qid, b.vec_id AS vec_id, {_COS_AB} AS cos,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_COS_AB} DESC, b.vec_id) AS rk
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < 5
    ) WHERE rk <= 3
    """,
)
def sim_topk_join(spark, sf_dir):
    """k-NN join: 5 query vectors each get their top-3 neighbors.
    Query side broadcast; ranking via per-query window top-k."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("cos", cosine(F.col("qe"), F.col("embedding")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("qid", "vec_id", "cos", "rk")
    )


@query(
    "ts_similarity",
    oracle="""
    WITH prof AS (
        SELECT user_id, CAST(hour(ts) AS INT) AS hr,
               CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
    nrm AS (
        SELECT user_id,
               SQRT(CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
        FROM prof GROUP BY 1),
    dots AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               CAST(SUM(CAST(a.v * b.v AS DECIMAL(38,12))) AS DOUBLE) AS dot
        FROM prof a JOIN prof b ON a.hr = b.hr AND a.user_id < b.user_id
        GROUP BY 1, 2)
    SELECT user_a, user_b,
           ROUND(dot / (x.nrm * y.nrm), 6) AS cos_sim
    FROM dots JOIN nrm x ON x.user_id = user_a JOIN nrm y ON y.user_id = user_b
    WHERE ROUND(dot / (x.nrm * y.nrm), 6) >= 0.8
    """,
)
def ts_similarity(spark, sf_dir):
    """Per-user hour-of-day activity profiles compared pairwise by
    cosine (EDBT-2019 time-series-similarity shape). The dot product is
    an equi-join on the hour key — sparse vectors never materialize."""
    ev = load(spark, sf_dir, "events")
    prof = (
        ev.groupBy("user_id", F.hour("ts").cast("int").alias("hr"))
        .agg(F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("v"))
    )
    nrm = prof.groupBy("user_id").agg(
        F.sqrt(F.sum((F.col("v") * F.col("v")).cast("decimal(38,12)")).cast("double")).alias("nrm")
    )
    a = prof.select(F.col("user_id").alias("user_a"), "hr", F.col("v").alias("va"))
    b = prof.select(F.col("user_id").alias("user_b"), "hr", F.col("v").alias("vb"))
    dots = (
        a.join(b, "hr")
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.sum((F.col("va") * F.col("vb")).cast("decimal(38,12)")).cast("double").alias("dot"))
    )
    na = nrm.select(F.col("user_id").alias("user_a"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("user_id").alias("user_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "user_a")
        .join(nb, "user_b")
        .select(
            "user_a",
            "user_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.8)
    )
