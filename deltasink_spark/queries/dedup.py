"""Deduplication operators (SURVEY.md §2.11): exact hash dedup,
MinHash+LSH near-dup, n-gram Jaccard baseline, SimHash, and
embedding-cosine near-dup.

Oracle policy: the MinHash op's OUTPUT (Jaccard-verified pairs) is
exactly SQL-expressible — the oracle computes all-pairs exact Jaccard
over pairs sharing >=1 shingle; LSH at b=32/r=2 misses a J>=0.6 pair
with p < 1e-6, so the sets agree on the fixtures (verified). SimHash
values hash differently per engine -> rows-only + property tests.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from deltasink_spark.operators.minhash import (
    minhash_dedup_pairs,
    minhash_pairs_cached,
    sql_df_capped_cte,
)
from deltasink_spark.operators.text import word_ngrams
from deltasink_spark.operators.vectors import (
    lsh_candidate_pairs,
    qdot_arrow,
    qdot,
    qnorm,
    quantized,
    sql_lsh_tall,
    sql_qdot,
    sql_qnorm,
    sql_quantized,
)
from deltasink_spark.queries.similarity import _PAIR_L, _PAIR_PLANES
from deltasink_spark.registry import query
from deltasink_spark.tables import fanout, load

_SHINGLE_CTE = """
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, GREATEST(len(toks) - 1, 1)),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
           FROM t),
    sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)
"""


@query(
    "dedup_exact_hash",
    oracle="""
    SELECT doc_id, content_sha FROM (
        SELECT doc_id, sha256(text) AS content_sha,
               ROW_NUMBER() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
)
def dedup_exact_hash(spark, sf_dir):
    """Exact content dedup: hash text, keep the min-doc_id row per hash.
    One hash-agg shuffle on the 32-byte digest; keep-first is
    MIN(doc_id), map-side combinable — a 10^6-way boilerplate cluster
    collapses to one row per map task before the shuffle, where the
    former row_number() window sorted the whole cluster in one task."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.sha2("text", 256).alias("content_sha"))
        .groupBy("content_sha")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "content_sha")
    )


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    j AS (
        SELECT id_a, id_b,
               ROUND(n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter), 6) AS jaccard
        FROM inter JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b)
    SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.6
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    """Near-dup pair frame (see operators/minhash.py). NOTE: under
    bucket-cap skew (never on fixtures — max bucket 13 vs cap 64) the
    output may include star pairs with jaccard in [0.3, 0.6), the
    lowered connectivity bar; the oracle is the uncapped all-pairs
    Jaccard, identical whenever the cap does not fire."""
    return minhash_pairs_cached(spark, sf_dir)


JACCARD_DF_CAP = 64  # stop-shingle cap: bounds the self-join at cap^2/shingle

# single source of truth for the cap CTE: operators/minhash.py, the
# same module whose df_capped_shingles the Spark side runs — the SQL
# and Spark shapes must never drift apart independently.
_JACCARD_CAP_CTE = sql_df_capped_cte(JACCARD_DF_CAP)


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    {_JACCARD_CAP_CTE},
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT id_a, id_b,
           ROUND(n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter), 6) AS jaccard
    FROM inter JOIN ksz x ON x.doc_id = id_a JOIN ksz y ON y.doc_id = id_b
    WHERE n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter) >= 0.3
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard over discriminative shingles: every pair
    sharing a kept shingle is scored (no LSH pruning). Correctness
    reference for the MinHash op.

    Shape note: intersections are counted DIRECTLY off the shared-
    shingle self-join (join rows = sum over shingles of freq^2, ~2.8M
    at sf0.1) — routing through an explicit candidate-pair list and
    jaccard_verify would re-join every candidate against its full
    shingle set (~58M intermediate rows, measured 8x slower). The
    quadratic term of ultra-common shingles is bounded by the same
    df-cap dedup_containment uses (operators/minhash.py::
    df_capped_shingles, mirrored exactly in the oracle): shingles in
    more than JACCARD_DF_CAP docs are non-discriminative boilerplate
    and are dropped before the join, so the join is at most cap^2 rows
    per shingle — linear in corpus size. The LSH variant remains the
    production path for resemblance; this op is the exact baseline."""
    d = load(spark, sf_dir, "documents")
    from deltasink_spark.operators.minhash import df_capped_shingles, shingle_table

    raw = shingle_table(fanout(d, "doc_id"), "doc_id", "text", 3)
    sh = df_capped_shingles(raw, "doc_id", JACCARD_DF_CAP).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        sa.join(sb, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6)
    return (
        inter.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.3)
    )


# SimHash over a PORTABLE 60-bit token hash (first 15 hex chars of md5
# -> bigint) so the bit-vote is reproducible in any engine and the
# driver can hash-verify it exactly — the same mirrored-determinism
# trick sim_ann_lsh uses for its hyperplanes. xxhash64 would be ~2x
# cheaper per token but is Spark-specific; at 100 TB you'd flip to it
# (or to hash()) once cross-engine verification is no longer needed.
_SIMHASH_BITS = 60

_SIMHASH_ORACLE = """
    WITH tok AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
                 FROM documents),
    h AS (SELECT doc_id,
                 CAST(CONCAT('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
          FROM tok),
    bits AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id)
    SELECT doc_id, {assemble} AS simhash FROM bits
""".format(
    sums=", ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(_SIMHASH_BITS)
    ),
    assemble=" + ".join(
        f"(CASE WHEN b{i} >= 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(_SIMHASH_BITS)
    ),
)


# Expression TEXT built once at import: per-call Column-object loops
# (60 sums x ~7 py4j round trips each, then a 60-deep shiftleft/xor
# fold) cost ~1.3 s of pure driver latency PER INVOCATION (r15
# measurement) for a tree Catalyst immediately re-linearizes. One
# F.expr per projection parses the same algebra JVM-side in ~ms.
# Assembly uses + over disjoint bit terms == the old xor of shiftlefts.
_SIMHASH_SUMS_EXPR = "struct(" + ", ".join(
    f"sum(case when shiftright(h, {i}) & 1 = 1 then 1 else -1 end) as b{i}"
    for i in range(_SIMHASH_BITS)
) + ")"
_SIMHASH_ASSEMBLE_EXPR = "(" + " + ".join(
    f"(case when bs.b{i} >= 0 then cast({1 << i} as bigint) else cast(0 as bigint) end)"
    for i in range(_SIMHASH_BITS)
) + ") as simhash"


@query("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark, sf_dir):
    """60-bit SimHash: per bit, sum +1/-1 over distinct tokens, sign ->
    bit. Pure Catalyst (explode + 60 conditional sums + bit reassembly);
    near-dups land within small Hamming radius. Token hash is the
    md5-prefix bigint (portable across engines -> exact oracle)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("tok")
    ).withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long"))
    sums = tok.groupBy("doc_id").agg(F.expr(_SIMHASH_SUMS_EXPR).alias("bs"))
    return sums.selectExpr("doc_id", _SIMHASH_ASSEMBLE_EXPR)


_QCOS = f"ROUND({sql_qdot('a.iv', 'b.iv')} / (a.nrm * b.nrm), 6)"


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH qv AS (SELECT vec_id, {sql_quantized('embedding')} AS iv FROM embeddings),
    qn AS (SELECT vec_id, iv, {sql_qnorm('iv')} AS nrm FROM qv),
    tall AS ({sql_lsh_tall('qn', 'vec_id', 'iv', _PAIR_PLANES, _PAIR_L)}),
    cand AS (
        SELECT DISTINCT ta.pid AS keep_id, tb.pid AS dup_id
        FROM tall ta JOIN tall tb
          ON ta.t = tb.t AND ta.bucket = tb.bucket AND ta.pid < tb.pid)
    SELECT c.keep_id, c.dup_id, {_QCOS} AS cos
    FROM cand c JOIN qn a ON a.vec_id = c.keep_id JOIN qn b ON b.vec_id = c.dup_id
    WHERE {_QCOS} >= 0.4
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs over sign-LSH bucket-mate
    candidates (same L=4 x K=8 geometry as sim_cosine_pairs, K from
    lsh_bits()). The r5 full-table broadcast all-pairs join is gone:
    candidates reach Catalyst as a shuffled self-equi-join on
    (table, bucket), then only candidates are scored exactly with the
    fused long dot — the deterministic plane literals are mirrored
    into the oracle SQL so the bucketed semantics stay differentially
    verified bit-for-bit."""
    e = load(spark, sf_dir, "embeddings")
    qn = e.select("vec_id", quantized(F.col("embedding")).alias("iv")).withColumn(
        "nrm", qnorm(F.col("iv"))
    )
    # vectors/norms ride through the candidate self-join (carry=): no
    # join-back; cross-table dedup runs AFTER the Arrow-dot scoring on
    # narrow (id, id, cos) rows
    pairs = lsh_candidate_pairs(
        qn, "vec_id", "iv", _PAIR_PLANES, _PAIR_L, carry=("iv", "nrm"), distinct=False
    )
    cos = F.round(
        qdot_arrow()(F.col("iv_a"), F.col("iv_b")).cast("double")
        / (F.col("nrm_a") * F.col("nrm_b")),
        6,
    )
    return (
        pairs.select(
            F.col("id_a").alias("keep_id"), F.col("id_b").alias("dup_id"), cos.alias("cos")
        )
        .filter(F.col("cos") >= 0.4)
        .distinct()
    )


@query(
    "dedup_blocked_levenshtein",
    oracle="""
    WITH k AS (SELECT p_partkey, p_name, substr(p_name, 1, 8) AS blk
               FROM part),
    cand AS (SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
                    a.p_name AS name_a, b.p_name AS name_b
             FROM k a JOIN k b ON a.blk = b.blk AND a.p_partkey < b.p_partkey)
    SELECT id_a, id_b, CAST(levenshtein(name_a, name_b) AS INT) AS edit_dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 8
    """,
)
def dedup_blocked_levenshtein(spark, sf_dir):
    """Fuzzy (edit-distance) dedup with blocking — the record-linkage
    archetype: candidate pairs come from an EQUI-join on a cheap
    blocking key (8-char name prefix), then the quadratic-per-pair
    levenshtein runs only inside blocks. The O(n²) comparison never
    touches Catalyst — same candidate-generation discipline as
    MinHash banding, with edit distance instead of Jaccard as the
    verifier. Skewed blocks are AQE's problem, not a crossJoin."""
    p = load(spark, sf_dir, "part").select(
        "p_partkey", "p_name", F.substring("p_name", 1, 8).alias("blk")
    )
    a = p.select(
        F.col("p_partkey").alias("id_a"), F.col("p_name").alias("name_a"), "blk"
    )
    b = p.select(
        F.col("p_partkey").alias("id_b"), F.col("p_name").alias("name_b"), "blk"
    )
    cand = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    return (
        cand.withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 8)
        .select("id_a", "id_b", "edit_dist")
    )


@query(
    "dedup_url_canonical",
    oracle="""
    WITH v AS (
        SELECT doc_id, source, u.vid,
               CASE u.vid
                 WHEN 0 THEN 'https://Ex-' || source || '.Example.COM:443/d/' || doc_id
                 WHEN 1 THEN 'https://ex-' || source || '.example.com/d/' || doc_id
                             || '?utm_source=feed&utm_campaign=x'
                 ELSE 'https://ex-' || source || '.example.com/d/' || doc_id
                      || '#section'
               END AS url
        FROM documents, UNNEST(range(0, 3)) AS u(vid)),
    c AS (
        SELECT doc_id, vid,
               lower(replace(regexp_replace(regexp_replace(url, '#.*$', ''),
                                            '[?&]utm_[^&#]*', '', 'g'),
                             ':443/', '/')) AS canonical
        FROM v)
    SELECT canonical,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           CAST(MIN(doc_id) AS BIGINT) AS doc_id,
           CAST(MIN(vid) AS BIGINT) AS kept_variant
    FROM c GROUP BY canonical
    """,
)
def dedup_url_canonical(spark, sf_dir):
    """URL canonicalization dedup — the first pass of every web-corpus
    pipeline: the same page arrives under tracking-parameter, default-
    port, host-case, and fragment variants, and naive exact-URL dedup
    misses all of them. Three deterministic variants per document are
    composed from the fixture (mixed-case host + :443, utm_* params,
    #fragment), canonicalized (strip fragment, strip utm_* params,
    drop the default port, case-fold — production canonicalizers fold
    scheme+host only; this corpus's paths are already lowercase), and
    collapsed by canonical form keeping the lowest variant. Every
    group must collapse 3 -> 1. Pure codegen regexp projection + one
    hash agg; no shuffle beyond the groupBy."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    d = F.col("doc_id").cast("string")
    variants = F.array(
        F.concat(F.lit("https://Ex-"), F.col("source"), F.lit(".Example.COM:443/d/"), d),
        F.concat(
            F.lit("https://ex-"),
            F.col("source"),
            F.lit(".example.com/d/"),
            d,
            F.lit("?utm_source=feed&utm_campaign=x"),
        ),
        F.concat(
            F.lit("https://ex-"), F.col("source"), F.lit(".example.com/d/"), d,
            F.lit("#section"),
        ),
    )
    v = docs.select("doc_id", F.posexplode(variants).alias("vid", "url"))
    canonical = F.lower(
        F.replace(
            F.regexp_replace(
                F.regexp_replace(F.col("url"), "#.*$", ""), r"[?&]utm_[^&#]*", ""
            ),
            F.lit(":443/"),
            F.lit("/"),
        )
    )
    return (
        v.select("doc_id", "vid", canonical.alias("canonical"))
        .groupBy("canonical")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("doc_id"),
            F.min("vid").cast("long").alias("kept_variant"),
        )
    )


# --- minhash_union: mergeable MinHash sketches ---------------------------

_MU_PERMS = 8
# Affine permutation constants: h_i = (h0 * A_i + B_i) % (2^61 - 1).
# A_i < 2^31 so h0 (< 2^32) * A_i stays under 2^63 — exact BIGINT
# arithmetic in BOTH engines, no overflow, no float.
_MU_A = [1779033703, 1013904242, 1359893119, 1367130551,
         528734635, 1541459225, 666307205, 773529912]
_MU_B = [1, 7, 13, 19, 29, 37, 43, 53]
_MU_M = (1 << 61) - 1
_MU_PERM_VALUES = ", ".join(
    f"({i}, {_MU_A[i]}, {_MU_B[i]})" for i in range(_MU_PERMS)
)


@query(
    "minhash_union",
    oracle=f"""
    WITH sh AS (
        SELECT source,
               toks[u.i] || ' ' || toks[u.i+1] || ' ' || toks[u.i+2] AS shingle
        FROM (SELECT source, string_split(text, ' ') AS toks FROM documents) t,
             UNNEST(range(1, len(toks) - 1)) AS u(i)
        WHERE len(toks) >= 3),
    hs AS (
        SELECT source,
               CAST(CONCAT('0x', substr(md5(shingle), 1, 8)) AS BIGINT) AS h0
        FROM sh),
    tall AS (
        SELECT source, p.perm AS perm,
               (h0 * p.a + p.b) % {_MU_M} AS h
        FROM hs, (VALUES {_MU_PERM_VALUES}) AS p(perm, a, b)),
    per AS (SELECT CAST(perm AS BIGINT) AS perm, source, MIN(h) AS sig
            FROM tall GROUP BY perm, source),
    merged AS (SELECT perm, '__merged__' AS source, MIN(sig) AS sig
               FROM per GROUP BY perm),
    direct AS (SELECT CAST(perm AS BIGINT) AS perm, '__direct__' AS source,
                      MIN(h) AS sig
               FROM tall GROUP BY perm)
    SELECT perm, source, sig FROM per
    UNION ALL SELECT perm, source, sig FROM merged
    UNION ALL SELECT perm, source, sig FROM direct
    ORDER BY perm, source
    """,
)
def minhash_union(spark, sf_dir):
    """MERGEABLE MinHash sketches — the property that makes MinHash a
    distributed-aggregation citizen rather than a per-table pass: the
    per-source sketches (MIN per permutation) merged by element-wise
    MIN must equal the sketch computed directly over the union. The op
    emits all three (per-source rows, '__merged__' = min-of-sketches,
    '__direct__' = min-over-all-rows); the oracle recomputes each, so
    merged != direct would hash-fail — the same union-algebra proof
    the HLL family carries (agg_hll_union). A 100 TB corpus builds
    per-partition/per-day sketches with ONE combining hash agg and
    merges them for any ad-hoc slice, never rescanning.

    Portable permutations: the shingle is md5-hashed ONCE to a 32-bit
    BIGINT h0 (DuckDB-mirrorable); each permutation is then the affine
    map (h0 * A_i + B_i) % (2^61-1) in exact BIGINT arithmetic shared
    by both engines — the same hash-once/permute-cheap trick the
    xxhash64 production path (operators/minhash.py:82-87) uses. r7
    shipped 8 FULL md5 string hashes per shingle and paid 5.97 s at
    sf0.1 for it (the most expensive bench op); this form hashes each
    shingle once."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # fanout first: the fixture parquet is a single row group, so
    # without it the shingle explode + md5 runs on ONE task (measured
    # 3.9 s of the op's 4.5 s at sf0.1; 0.5 s spread across cores).
    sh = fanout(d, "doc_id").select(
        "source", F.explode(word_ngrams(toks, 3)).alias("shingle")
    )
    hs = sh.select(
        "source",
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10)
        .cast("long")
        .alias("h0"),
    )
    # Sketches as WIDE 8-column MIN aggs over the 1x-rows hashed frame —
    # never explode the corpus 8-fold (the r7 tall form materialized
    # 8x|shingle| checkpoint rows and paid ~2.5 s for it at sf0.1).
    # The sketch frames that DO reshape to tall (perm, source, sig)
    # rows are vocabulary-sized: |sources| x 8 and 1 x 8.
    hs = hs.localCheckpoint(eager=False)  # feeds per-source AND direct aggs
    aggs = [
        F.min((F.col("h0") * F.lit(_MU_A[i]) + F.lit(_MU_B[i])) % F.lit(_MU_M)).alias(f"s{i}")
        for i in range(_MU_PERMS)
    ]

    def to_tall(df):
        arr = F.array(
            *[
                F.struct(F.lit(i).cast("long").alias("perm"), F.col(f"s{i}").alias("sig"))
                for i in range(_MU_PERMS)
            ]
        )
        return df.select("source", F.explode(arr).alias("p")).select(
            F.col("p.perm").alias("perm"), "source", F.col("p.sig").alias("sig")
        )

    per = to_tall(hs.groupBy("source").agg(*aggs))
    # direct is computed INDEPENDENTLY from the hashed rows (not folded
    # from per) so merged == direct stays a real union-algebra check.
    # The global agg emits one all-NULL row on an EMPTY corpus (grouped
    # aggs emit zero) — filter it so the empty case matches the
    # oracle's GROUP BY form; sig is never NULL otherwise (r8 review).
    direct = to_tall(
        hs.agg(*aggs).select(F.lit("__direct__").alias("source"), "*")
    ).filter(F.col("sig").isNotNull())
    merged = per.groupBy("perm").agg(F.min("sig").alias("sig")).select(
        "perm", F.lit("__merged__").alias("source"), "sig"
    )
    return per.unionByName(merged).unionByName(direct).orderBy("perm", "source")


# --- dedup_image_phash: perceptual-hash near-dup over media payloads -----

_PH_ROWS, _PH_COLS = 8, 8
_PH_BITS = _PH_ROWS * (_PH_COLS - 1)  # 56 difference bits (sign-safe in int64)
_PH_BANDS = 4
_PH_BAND_BITS = _PH_BITS // _PH_BANDS  # 14
_PH_BAND_MASK = (1 << _PH_BAND_BITS) - 1
_PH_HAM_MAX = 13


def _phash_sql(px) -> str:
    """dHash bit assembly: sample an 8x8 grid of payload bytes, set bit
    r*7+c when grid[r][c] > grid[r][c+1]. ``px(i)`` renders the i-th
    grid sample in the target engine's SQL."""
    terms = []
    for r in range(_PH_ROWS):
        for c in range(_PH_COLS - 1):
            k = r * (_PH_COLS - 1) + c
            i0 = r * _PH_COLS + c
            terms.append(
                f"(CASE WHEN {px(i0)} > {px(i0 + 1)} "
                f"THEN CAST({1 << k} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            )
    return " + ".join(terms)


def _ph_px_spark(i: int) -> str:
    return (
        f"ascii(substr(text, CAST(({i} * CAST(length(text) AS BIGINT)) DIV "
        f"{_PH_ROWS * _PH_COLS} AS INT) + 1, 1))"
    )


def _ph_px_duck(i: int) -> str:
    return f"ord(substr(text, ({i} * length(text)) // {_PH_ROWS * _PH_COLS} + 1, 1))"


@query(
    "dedup_image_phash",
    oracle=f"""
    WITH ph AS (SELECT doc_id, {_phash_sql(_ph_px_duck)} AS phash
                FROM documents WHERE n_chars > 0),
    tall AS (SELECT doc_id, phash, u.j AS j,
                    (phash >> ({_PH_BAND_BITS} * u.j)) & {_PH_BAND_MASK} AS bv
             FROM ph, UNNEST(range(0, {_PH_BANDS})) AS u(j)),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                    CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
             FROM tall a JOIN tall b
               ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, hamming FROM cand WHERE hamming <= {_PH_HAM_MAX}
    """,
)
def dedup_image_phash(spark, sf_dir):
    """Perceptual-hash (dHash) near-duplicate detection over media
    payloads — the multimodal dedup stage an image-bearing crawl runs:
    sample the decoded payload down to an 8x8 intensity grid, hash the
    HORIZONTAL GRADIENT (bit = left pixel > right pixel, 56 bits), and
    pair documents whose hashes agree on at least one of 4 14-bit bands
    and lie within Hamming distance 13. dHash is
    crop/scale/brightness-robust because it encodes gradient signs,
    not absolute values. (With a real decoder the production threshold
    is ~6-10 of 64 bits; the fixture corpus has no true visual
    duplicates — its near-dups are text edits, which shift the
    positional grid — so the demo threshold sits at the top of the
    fixtures' near-dup Hamming range, 13 of 56.)

    The "decode" is this repo's deterministic multimodal stub
    (operators/multimodal.py: payload = the document's UTF-8 bytes,
    intensity = byte value — fixtures are pure ASCII so ord == byte),
    which makes the full pipeline bit-exactly oracle-verifiable in any
    environment; a real image decoder drops in at the grid-sampling
    step (PIL resize to 8x8 greyscale) behind the same 56-bit shape.

    Scale shape: the hash is ONE codegen projection per doc (no
    shuffle, no Python); banding explodes to 4 narrow rows/doc; the
    band-bucket self equi-join is the only shuffle, exactly
    sim_ann_lsh's geometry; the exact bit_count(xor) filter runs on
    candidate rows only. Adversarial-skew bound: a mono-color crawl
    (every blank page hashing to 0) collapses a band to ONE bucket, so
    buckets over _PH_BUCKET_CAP expand as a STAR on the bucket's min
    doc (the minhash.py::lsh_candidates move) — O(n) candidates, and
    true duplicates keep hamming 0 through the hub so connectivity
    survives. Phash star pairs keep the FULL exact
    Hamming filter (minhash star pairs get a halved Jaccard bar, see
    operators/minhash.py): in both schemes one shared band — 14 phash
    bits here, r=2 minhashes there — is weak evidence on its own, so
    bucket membership alone is never treated as the duplicate signal;
    the exact verify on the candidate rows is. The cap never fires on fixtures (max
    observed bucket: 16 at sf0.1 vs cap 64 — oracle byte-identical);
    the bound is exercised on a synthetic mono-payload mega-cluster in
    tests/test_properties.py."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    ph = d.select("doc_id", F.expr(_phash_sql(_ph_px_spark)).alias("phash"))
    return _phash_pairs(ph)


# one skew bound for every banding op: minhash.BUCKET_CAP is the
# single source of truth (r9 review: three local 64s invited drift)
from deltasink_spark.operators.minhash import BUCKET_CAP as _PH_BUCKET_CAP  # noqa: E402


def _phash_pairs(ph, bucket_cap: int = _PH_BUCKET_CAP):
    """(id_a < id_b, hamming <= _PH_HAM_MAX) pairs from a (doc_id,
    phash) frame via banded buckets with star-capped expansion."""
    bands = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("j"),
                F.shiftright(F.col("phash"), _PH_BAND_BITS * j)
                .bitwiseAND(F.lit(_PH_BAND_MASK))
                .alias("bv"),
            )
            for j in range(_PH_BANDS)
        ]
    )
    tall = ph.select("doc_id", "phash", F.explode(bands).alias("b")).select(
        "doc_id", "phash", F.col("b.j").alias("j"), F.col("b.bv").alias("bv")
        # four consumers (bucket stats, the tagged join probe, and the
        # a/b self-join sides) — without the cut each re-runs the
        # 64-sample gradient hash projection (with a real decoder: the
        # image decode) over the corpus; 4 narrow rows/doc is the
        # cheapest thing in the op to materialize (guide §4/§2.4)
    ).localCheckpoint(eager=False)
    # min(struct) carries the hub's phash alongside its id in ONE agg
    stats = tall.groupBy("j", "bv").agg(
        F.count(F.lit(1)).alias("bkt_n"),
        F.min(F.struct("doc_id", "phash")).alias("mn"),
    )
    tagged = tall.join(stats, ["j", "bv"])
    small = tagged.filter(F.col("bkt_n") <= bucket_cap)
    a = small.select(F.col("doc_id").alias("id_a"), F.col("phash").alias("ph_a"), "j", "bv")
    b = small.select(F.col("doc_id").alias("id_b"), F.col("phash").alias("ph_b"), "j", "bv")
    all_pairs = (
        a.join(b, ["j", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
    )
    star_pairs = (
        tagged.filter((F.col("bkt_n") > bucket_cap) & (F.col("doc_id") != F.col("mn.doc_id")))
        .select(
            F.col("mn.doc_id").alias("id_a"),
            F.col("doc_id").alias("id_b"),
            F.col("mn.phash").alias("ph_a"),
            F.col("phash").alias("ph_b"),
        )
    )
    return (
        all_pairs.unionByName(star_pairs)
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= _PH_HAM_MAX)
    )


from deltasink_spark.registry import ORACLES as _ORACLES  # noqa: E402


_SB_BUCKET_CAP = _PH_BUCKET_CAP  # shared skew bound (see _PH_BUCKET_CAP)


@query(
    "eval_simhash_banding",
    oracle=f"""
    WITH sh AS ({_SIMHASH_ORACLE}),
    bands AS (
        SELECT doc_id, u.i AS band, (simhash >> (u.i * 15)) & 32767 AS bv
        FROM sh, UNNEST(range(0, 4)) AS u(i)),
    bstats AS (
        SELECT band, bv, CAST(COUNT(*) AS BIGINT) AS bkt_n,
               MIN(doc_id) AS bkt_min
        FROM bands GROUP BY band, bv),
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a
        JOIN bstats s ON s.band = a.band AND s.bv = a.bv
        JOIN bands b ON b.band = a.band AND b.bv = a.bv
                    AND a.doc_id < b.doc_id
        WHERE s.bkt_n <= {_SB_BUCKET_CAP}
        UNION
        SELECT s.bkt_min AS id_a, b.doc_id AS id_b
        FROM bands b JOIN bstats s ON s.band = b.band AND s.bv = b.bv
        WHERE s.bkt_n > {_SB_BUCKET_CAP} AND b.doc_id <> s.bkt_min),
    pred AS (
        SELECT c.id_a, c.id_b
        FROM cand c JOIN sh x ON x.doc_id = c.id_a
                    JOIN sh y ON y.doc_id = c.id_b
        WHERE bit_count(xor(x.simhash, y.simhash)) <= 4),
    truth AS (
        SELECT id_a, id_b FROM ({_ORACLES["dedup_ngram_jaccard"]}) t),
    s AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pred) AS n_pred,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM pred p JOIN truth t
                  ON t.id_a = p.id_a AND t.id_b = p.id_b) AS n_hit)
    SELECT n_pred, n_truth, n_hit,
           ROUND(CAST(n_hit AS DOUBLE) / n_pred, 6) AS precision,
           ROUND(CAST(n_hit AS DOUBLE) / n_truth, 6) AS recall
    FROM s
    """,
)
def eval_simhash_banding(spark, sf_dir):
    """Precision/recall of SimHash band-bucket candidate pairs
    (4x15-bit bands over [dedup_simhash]'s 60-bit hashes, verified to
    Hamming <= 4) against the exact n-gram-Jaccard >= 0.3 ground truth
    ([dedup_ngram_jaccard]) — the index-quality eval for the HEURISTIC
    dedup signal, sibling of [ann_recall_at_k]. Both the per-doc hash
    CTE and the ground-truth CTE are the ops' registered oracle texts
    verbatim, so the eval cannot drift from what it measures.

    The expected finding on this synthetic corpus is itself the
    lesson: short lorem-like docs drive token-sign agreement way above
    chance, so SimHash bands over-collide and precision lands near
    zero while MinHash-LSH (whose candidates are verified by exact
    Jaccard in-op) stays exact — the quantified reason the production
    dedup path is MinHash, not SimHash.

    Scale: banding is the standard equi-join candidate generation,
    and — precisely because SimHash buckets over-collide on
    boilerplate-heavy corpora — the band buckets carry the same
    star-expansion cap as minhash/phash (_SB_BUCKET_CAP=64,
    _simhash_band_pairs): a hot (band, bv) bucket emits O(n) hub
    edges, never within-bucket all-pairs, so the eval measures the
    CAPPED index production would run (the oracle mirrors the cap
    bucket-for-bucket). Star pairs keep the full exact Hamming <= 4
    verify. The Hamming verify touches only candidate rows; the truth
    side is the df-capped shingle join. Linearity under a synthetic
    sign-agreement mega-cluster is property-tested
    (test_simhash_megabucket_skew_candidates_linear)."""
    sh = (
        dedup_simhash(spark, sf_dir)
        .select("doc_id", "simhash")
        # two consumers inside the band machinery (bucket stats + the
        # tagged probe): without the checkpoint the 60-sum agg runs
        # more than once per action
        .localCheckpoint(eager=False)
    )
    pred = _simhash_band_pairs(sh)
    truth = dedup_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    # ONE tagged-union aggregation replaces the former three branches
    # (count(pred), count(truth), count(pred JOIN truth)) + two
    # broadcast glue joins + two checkpoints (r15): both sides are
    # distinct pair SETS, so after max-merging the tags per pair,
    # n_pred / n_truth / n_hit are three sums over the SAME frame —
    # pred and truth are each computed once with a single consumer, so
    # the checkpoints that existed to stop re-execution go away too
    # (guide §1.4 job count, §2.4 shared shuffles).
    m = (
        pred.select("id_a", "id_b", F.lit(1).alias("p"), F.lit(0).alias("t"))
        .unionByName(
            truth.select("id_a", "id_b", F.lit(0).alias("p"), F.lit(1).alias("t"))
        )
        .groupBy("id_a", "id_b")
        .agg(F.max("p").alias("p"), F.max("t").alias("t"))
    )
    return (
        m.groupBy()
        .agg(
            # empty corpus: ungrouped SUM is NULL where the oracle's
            # COUNTs are 0 — coalesce (the r8 global-agg-on-empty class)
            F.coalesce(F.sum("p"), F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("n_truth"),
            F.coalesce(F.sum(F.col("p") * F.col("t")), F.lit(0))
            .cast("long")
            .alias("n_hit"),
        )
        .select(
            "n_pred",
            "n_truth",
            "n_hit",
            # try_divide: zero predictions / zero truth pairs (empty
            # corpus) must yield NULL like the oracle, not an ANSI
            # DIVIDE_BY_ZERO crash
            F.round(
                F.try_divide(F.col("n_hit").cast("double"), F.col("n_pred")), 6
            ).alias("precision"),
            F.round(
                F.try_divide(F.col("n_hit").cast("double"), F.col("n_truth")), 6
            ).alias("recall"),
        )
    )


def _simhash_band_pairs(sh, bucket_cap: int = _SB_BUCKET_CAP):
    """Hamming-verified (id_a < id_b) pairs from a (doc_id, simhash)
    frame via 4x15-bit band buckets with star-capped expansion — the
    same skew geometry as minhash.py::lsh_candidates / _phash_pairs:
    buckets over ``bucket_cap`` emit hub edges on the bucket's min doc
    (O(n), connectivity-preserving) instead of within-bucket
    all-pairs (O(n^2)). The simhash rides along in the band rows so
    the exact bit_count verify needs no join back to the hash frame;
    star pairs keep the FULL Hamming bar (one shared 15-bit band is
    weak evidence on sign-correlated corpora — the over-collision this
    op exists to measure).

    CONTRACT: the returned frame is a DISTINCT (id_a < id_b) pair SET
    — the trailing .distinct() is load-bearing beyond dedup. The
    eval_simhash_banding tagged-union aggregation counts n_pred as
    SUM over max-merged pair tags, which equals the oracle's
    COUNT(*) over ``pred`` only because both sides are sets; dropping
    the distinct here would silently turn n_pred into a distinct
    count while the oracle counts rows. Pinned by
    tests/test_properties.py::test_simhash_band_pairs_distinct."""
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.expr("sequence(0, 3)")).alias("band"),
    ).select(
        "doc_id",
        "simhash",
        "band",
        F.expr("shiftright(simhash, band * 15) & 32767").alias("bv"),
    )
    # min(struct) carries the hub's simhash alongside its id in ONE agg
    stats = bands.groupBy("band", "bv").agg(
        F.count(F.lit(1)).alias("bkt_n"),
        F.min(F.struct("doc_id", "simhash")).alias("mn"),
    )
    tagged = bands.join(stats, ["band", "bv"])
    small = tagged.filter(F.col("bkt_n") <= bucket_cap)
    a = small.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("h_a"), "band", "bv"
    )
    b = small.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("h_b"), "band", "bv"
    )
    all_pairs = (
        a.join(b, ["band", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
    )
    star_pairs = (
        tagged.filter(
            (F.col("bkt_n") > bucket_cap) & (F.col("doc_id") != F.col("mn.doc_id"))
        )
        .select(
            F.col("mn.doc_id").alias("id_a"),
            F.col("doc_id").alias("id_b"),
            F.col("mn.simhash").alias("h_a"),
            F.col("simhash").alias("h_b"),
        )
    )
    return (
        all_pairs.unionByName(star_pairs)
        .filter(F.expr("bit_count(h_a ^ h_b) <= 4"))
        .select("id_a", "id_b")
        .distinct()
    )


@query(
    "dedup_minhash_incremental",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        WHERE a.doc_id % 10 = 0 OR b.doc_id % 10 = 0
        GROUP BY 1, 2),
    j AS (
        SELECT id_a, id_b,
               ROUND(n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter), 6) AS jaccard
        FROM inter JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b)
    SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.6
    """,
)
def dedup_minhash_incremental(spark, sf_dir):
    """Incremental near-dup detection — the shape a CONTINUOUSLY
    ingesting dedup daemon actually runs: a new batch (docs with
    doc_id % 10 == 0 here) is checked against the existing corpus
    index AND against itself, WITHOUT re-pairing the existing corpus
    against itself (that work was done when those docs arrived). The
    candidate join is delta-bands x all-bands — its output is
    O(|delta| x bucket density), not O(|corpus|^2), so steady-state
    dedup cost tracks the ingest rate, not the corpus size; at 100 TB
    the all-side band table is the persisted index the daemon keeps
    sorted/bucketed on (band_id, band_hash). Oversized buckets
    star-expand exactly like [dedup_minhash_lsh] — hub edges for
    every delta member AND (when the hub itself is new) for the
    hub's corpus-mates — verified at the family's threshold/2 star
    bar; exact Jaccard verification runs on all candidate pairs.
    Oracle: all-pairs exact Jaccard >= 0.6 restricted to pairs
    touching the delta — LSH at b=32/r=2 misses a J>=0.6 pair with
    p < 1e-6, and (as for dedup_minhash_lsh itself, whose oracle is
    the same uncapped all-pairs form) the star cap is the documented
    recall-for-linearity tradeoff the oracle deliberately does NOT
    model: the cap never fires on the fixtures (max bucket 13 at
    sf0.1 vs 64), so the differential check is exact there, and the
    capped behavior under skew is pinned by the mega-cluster
    property tests instead."""
    from deltasink_spark.operators.minhash import (
        BUCKET_CAP,
        _BANDS_ARRAY_EXPR,
        jaccard_verify,
        minhash_signatures,
        shingle_table,
    )

    d = load(spark, sf_dir, "documents")
    is_delta = F.col("doc_id") % 10 == 0
    sh = shingle_table(fanout(d, "doc_id"), "doc_id", "text", 3).localCheckpoint(
        eager=False
    )
    sigs = minhash_signatures(sh, "doc_id")
    tall = (
        sigs.select("doc_id", F.explode(F.expr(_BANDS_ARRAY_EXPR)).alias("b"))
        .select(
            "doc_id",
            F.col("b.band_id").alias("band_id"),
            F.col("b.band_hash").alias("band_hash"),
            is_delta.alias("is_delta"),
        )
        .localCheckpoint(eager=False)
    )
    stats = tall.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("bkt_n"), F.min("doc_id").alias("bkt_min")
    )
    tagged = tall.join(stats, ["band_id", "band_hash"])
    small = tagged.filter(F.col("bkt_n") <= BUCKET_CAP)
    # delta side probes the full band table (the persisted index)
    probe = small.filter("is_delta").select(
        F.col("doc_id").alias("id_p"), "band_id", "band_hash"
    )
    index = small.select(F.col("doc_id").alias("id_i"), "band_id", "band_hash")
    all_pairs = (
        probe.join(index, ["band_id", "band_hash"])
        .filter(F.col("id_p") != F.col("id_i"))
        .select(
            F.least("id_p", "id_i").alias("id_a"),
            F.greatest("id_p", "id_i").alias("id_b"),
        )
    )
    # star edges must TOUCH the delta: either the member is new, or
    # the hub itself is (a delta hub still needs its corpus edges —
    # hub delta-ness recomputes the same predicate on bkt_min)
    hub_is_delta = F.col("bkt_min") % 10 == 0
    star_pairs = (
        tagged.filter(
            (F.col("bkt_n") > BUCKET_CAP)
            & (F.col("is_delta") | hub_is_delta)
            & (F.col("doc_id") != F.col("bkt_min"))
        )
        .select(
            F.col("bkt_min").alias("id_a"), F.col("doc_id").alias("id_b")
        )
    )
    cand = (
        all_pairs.withColumn("is_star", F.lit(False))
        .unionByName(star_pairs.withColumn("is_star", F.lit(True)))
        .groupBy("id_a", "id_b")
        .agg(F.max("is_star").alias("is_star"))
    )
    return jaccard_verify(cand, sh, "doc_id", 0.6)
