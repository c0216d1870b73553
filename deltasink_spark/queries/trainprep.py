"""Training-data preparation depth ops (r4 batch, beyond-survey).

Operators a 100 TB pretraining pipeline runs between raw corpus
and tokenizer that the existing §2.11/§2.13/§2.14 inventory did not
yet cover:

- ``text_bm25``           — sparse retrieval scoring (quality probes,
                            decontamination lookups)
- ``text_unigram_logprob``— perplexity-proxy quality score from a
                            corpus unigram LM (the public CCNet recipe
                            uses a KenLM 5-gram; the unigram variant is
                            the same shape with an exactly-SQL oracle)
- ``text_boilerplate_ngrams`` — per-doc fraction of shingles shared
                            with many other docs (header/footer and
                            template detection)
- ``dedup_containment``   — asymmetric near-dup: one doc (nearly)
                            contained in another, which symmetric
                            Jaccard under-scores for length-skewed
                            pairs
- ``embedding_quantize``  — per-vector int8 scalar quantization with
                            reconstruction-error audit (the storage
                            path for ANN at scale)
- ``sample_temperature``  — temperature-based source re-weighting
                            (multilingual-sampling alpha, as in public
                            mBERT/XLM-R recipes) as a deterministic
                            hash filter
- ``embedding_standardize``— per-dimension z-score scaling ahead of
                            k-means/IVF training, integer-exact
- ``text_entropy``        — per-doc token Shannon entropy (low =
                            templated text, a Gopher-style signal)

Every op is pure DataFrame algebra (no Python UDFs); global scalars
(corpus size, average doc length, source minima) broadcast as 1-row
frames, never driver collects; candidate generation is always an
equi-join.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deltasink_spark.operators.minhash import sql_df_capped_cte
from deltasink_spark.operators.unigram import sql_train_ctes as _ug_ctes
from deltasink_spark.registry import query
from deltasink_spark.tables import fanout, load

# --- text_bm25 ---------------------------------------------------------

BM25_TERMS = ("spark", "query", "join")
BM25_K1 = 1.2
BM25_B = 0.75

_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)


@query(
    "text_bm25",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT CAST(SUM(CAST(dl AS DECIMAL(30,2))) AS DOUBLE)
                       / COUNT(*) AS avgdl,
                     COUNT(*) AS n_docs
              FROM dl),
    tf AS (SELECT doc_id, tok AS term, COUNT(*) AS tf
           FROM tok WHERE tok IN ({_TERMS_SQL}) GROUP BY doc_id, tok),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               ROUND(ROUND(LN(1 + (n_docs - df + 0.5) / (df + 0.5)), 6)
                     * tf * ({BM25_K1} + 1)
                     / (tf + {BM25_K1}
                        * (1 - {BM25_B} + {BM25_B} * dl.dl / avgdl)),
                     6) AS term_score
        FROM tf
        JOIN df USING (term)
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN stats)
    SELECT doc_id,
           CAST(SUM(CAST(term_score AS DECIMAL(30,6))) AS DOUBLE) AS bm25
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 50
    """,
)
def text_bm25(spark, sf_dir):
    """BM25 (k1=1.2, b=0.75) of every document against a fixed query
    term set, top-50. The pipeline is the production retrieval-scoring
    shape: one tokenize pass feeds doc lengths and term frequencies,
    the df/idf table is vocabulary-sized and broadcasts, the (avgdl,
    N) scalars broadcast as a 1-row frame, and per-term scores sum in
    exact decimal so partial-agg order can't flip a ulp. At 100 TB the
    only corpus-sized shuffles are the two token hash-aggs."""
    d = load(spark, sf_dir, "documents")
    tok = fanout(d, "doc_id").select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).localCheckpoint(eager=False)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.groupBy().agg(
        (
            F.sum(F.col("dl").cast("decimal(30,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    tf = (
        tok.filter(F.col("tok").isin(*BM25_TERMS))
        .groupBy("doc_id", F.col("tok").alias("term"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.round(
        F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)), 6
    )
    term_score = F.round(
        idf
        * F.col("tf")
        * (BM25_K1 + 1)
        / (
            F.col("tf")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        ),
        6,
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .select("doc_id", term_score.alias("term_score"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("term_score").cast("decimal(30,6)"))
            .cast("double")
            .alias("bm25")
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(50)
    )


# --- text_unigram_logprob ---------------------------------------------


@query(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    tot AS (SELECT COUNT(*) AS n_total FROM tok),
    lm AS (SELECT tok, ROUND(-LOG2(COUNT(*) * 1.0 / ANY_VALUE(n_total)), 6)
                         AS bits
           FROM tok CROSS JOIN tot GROUP BY tok)
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(CAST(bits AS DECIMAL(30,6))) AS DOUBLE)
             / COUNT(*) AS bits_per_token
    FROM tok JOIN lm USING (tok)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_unigram_logprob(spark, sf_dir):
    """Perplexity-proxy quality score: average -log2 p(token) under
    the corpus's own unigram LM. The public CCNet recipe scores docs
    with a KenLM 5-gram; the unigram variant keeps the identical
    pipeline shape — train (one token hash-agg -> vocab-sized model,
    broadcast), score (join model onto doc tokens, per-doc mean) —
    with an exactly-SQL-checkable result. High bits_per_token = rare-
    token soup (drop candidates); low = repetitive boilerplate.

    100 TB: the LM table is |vocab| rows (tiny, broadcast); the corpus
    is touched by exactly two token-level hash aggs; the per-token
    cost rounds before the exact-decimal mean so the score is
    engine-independent."""
    d = load(spark, sf_dir, "documents")
    tok = fanout(d, "doc_id").select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).localCheckpoint(eager=False)
    tot = tok.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    lm = (
        tok.join(F.broadcast(tot))
        .groupBy("tok")
        .agg(
            F.round(
                -F.log2(F.count(F.lit(1)) / F.first("n_total")), 6
            ).alias("bits")
        )
    )
    return (
        tok.join(F.broadcast(lm), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # exact decimal sum -> one IEEE division; NOT re-rounded:
            # round-after-divide can land on a .5e-7 tie that Spark
            # (BigDecimal HALF_UP) and DuckDB (scaled nearbyint)
            # resolve differently — 3/5000 docs flipped at sf0.1.
            (
                F.sum(F.col("bits").cast("decimal(30,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("bits_per_token"),
        )
        .orderBy("doc_id")
    )


# --- text_boilerplate_ngrams ------------------------------------------

BOILER_DF = 5  # a shingle in >= this many docs is "boilerplate"

_SHINGLE_CTE = """
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, GREATEST(len(toks) - 1, 1)),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                    AS shingle
           FROM t)
"""


@query(
    "text_boilerplate_ngrams",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    gdf AS (SELECT shingle, COUNT(*) AS gdf FROM sh GROUP BY shingle)
    SELECT doc_id, COUNT(*) AS n_grams,
           COUNT(CASE WHEN gdf >= {BOILER_DF} THEN 1 END) AS n_boiler,
           ROUND(COUNT(CASE WHEN gdf >= {BOILER_DF} THEN 1 END) * 1.0
                   / COUNT(*), 6) AS boiler_frac
    FROM sh JOIN gdf USING (shingle)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_boilerplate_ngrams(spark, sf_dir):
    """Template/boilerplate detection: per doc, the fraction of its
    distinct trigram shingles that appear in >= BOILER_DF documents
    (headers, footers, nav chrome repeat across a crawl; prose does
    not). The shingle document-frequency table plays the role the line
    -frequency table plays in the public CCNet/Gopher recipes — the
    fixtures' docs are single-line, so the shingle is the dedup unit.

    Shape: one explode -> distinct, one shingle-level hash agg
    (vocabulary-sized result, broadcast back), one per-doc agg — no
    self-join, so unlike pairwise dedup this stays strictly linear in
    corpus size."""
    from deltasink_spark.operators.minhash import shingle_table

    d = load(spark, sf_dir, "documents")
    sh = shingle_table(fanout(d, "doc_id"), "doc_id", "text", 3).localCheckpoint(
        eager=False
    )
    gdf = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("gdf"))
    is_boiler = F.col("gdf") >= BOILER_DF
    return (
        sh.join(gdf, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.when(is_boiler, 1)).alias("n_boiler"),
            F.round(
                F.count(F.when(is_boiler, 1)) / F.count(F.lit(1)), 6
            ).alias("boiler_frac"),
        )
        .orderBy("doc_id")
    )


# --- dedup_containment -------------------------------------------------

CONTAIN_THRESH = 0.5
CONTAIN_DF_CAP = 64  # stop-shingle cap: bounds self-join at cap^2/shingle

# single source of truth for the cap CTE: operators/minhash.py (see
# dedup.py note) — SQL and Spark shapes must not drift independently.
_CONTAIN_CAP_CTE = sql_df_capped_cte(CONTAIN_DF_CAP)


@query(
    "dedup_containment",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    {_CONTAIN_CAP_CTE},
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT id_a, id_b,
           ROUND(n_inter * 1.0 / LEAST(x.n_sh, y.n_sh), 6) AS containment
    FROM inter JOIN ksz x ON x.doc_id = id_a JOIN ksz y ON y.doc_id = id_b
    WHERE n_inter * 1.0 / LEAST(x.n_sh, y.n_sh) >= {CONTAIN_THRESH}
    ORDER BY id_a, id_b
    """,
)
def dedup_containment(spark, sf_dir):
    """Asymmetric near-dup detection: max-containment |A∩B| /
    min(|A|, |B|) over pairs sharing a discriminative shingle. A
    50-line doc pasted into a 5000-line doc scores Jaccard ~0.01
    (invisible to dedup_ngram_jaccard / MinHash) but containment 1.0 —
    the quote/excerpt/aggregator-page case every crawl dedup needs
    (Broder's original resemblance-vs-containment distinction).

    Scale bound (the r4 verdict's flagged fix): shingles with document
    frequency > CONTAIN_DF_CAP are dropped BEFORE the self equi-join
    (operators/minhash.py::df_capped_shingles), so join output is at
    most cap^2 rows per shingle — linear in corpus size instead of
    quadratic in per-shingle df. The dropped stop-shingles are the
    boilerplate population text_boilerplate_ngrams measures; scores
    over the kept shingles are computed against kept-set sizes, so
    containment stays a true ratio in [0, 1]. The oracle applies the
    identical cap, keeping the match exact."""
    from deltasink_spark.operators.minhash import df_capped_shingles, shingle_table

    d = load(spark, sf_dir, "documents")
    raw = shingle_table(fanout(d, "doc_id"), "doc_id", "text", 3)
    sh = df_capped_shingles(raw, "doc_id", CONTAIN_DF_CAP).localCheckpoint(
        eager=False
    )
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
    containment = F.round(
        F.col("n_inter") / F.least(F.col("n_a"), F.col("n_b")), 6
    )
    return (
        inter.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .select("id_a", "id_b", containment.alias("containment"))
        .filter(F.col("containment") >= CONTAIN_THRESH)
        .orderBy("id_a", "id_b")
    )


# --- embedding_quantize ------------------------------------------------


@query(
    "embedding_quantize",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               list_max(list_transform(embedding,
                        x -> ABS(CAST(x AS DOUBLE)))) / 127.0 AS scale,
               embedding
        FROM embeddings)
    SELECT vec_id, ROUND(scale, 9) AS q_scale,
           ROUND(CAST(list_sum(list_transform(embedding,
                 x -> CAST(ROUND(CASE WHEN scale = 0 THEN 0
                           ELSE ABS(CAST(x AS DOUBLE)
                                    - ROUND(CAST(x AS DOUBLE) / scale)
                                      * scale) END, 12)
                           AS DECIMAL(30,12))))
                 AS DOUBLE) / len(embedding), 9) AS mean_abs_err
    FROM q
    ORDER BY vec_id
    """,
)
def embedding_quantize(spark, sf_dir):
    """Per-vector int8 scalar quantization audit: symmetric scale
    max|x|/127, elementwise q = round(x/scale), and the mean absolute
    reconstruction error — the storage/transport codec every
    billion-vector ANN index uses (4x smaller than fp32, dot products
    in integer SIMD). The op returns the audit columns a pipeline
    gates on before switching its index to int8.

    Pure higher-order-function codegen (transform/aggregate), one row
    in -> one row out, no shuffle at all; per-element errors round to
    fixed decimals before the exact-decimal mean so both engines
    agree bit-for-bit. The zero-vector guard keeps the codec total."""
    e = load(spark, sf_dir, "embeddings")
    x = lambda c: c.cast("double")  # noqa: E731
    scale = (
        F.array_max(F.transform(F.col("embedding"), lambda v: F.abs(x(v)))) / 127.0
    )
    err_elem = lambda v: F.round(  # noqa: E731
        F.when(F.col("scale") == 0, 0.0).otherwise(
            F.abs(x(v) - F.round(x(v) / F.col("scale")) * F.col("scale"))
        ),
        12,
    ).cast("decimal(30,12)")
    mean_err = (
        F.aggregate(
            F.transform(F.col("embedding"), err_elem),
            F.lit(0).cast("decimal(30,12)"),
            lambda acc, v: (acc + v).cast("decimal(30,12)"),
        ).cast("double")
        / F.size("embedding")
    )
    return (
        e.withColumn("scale", scale)
        .select(
            "vec_id",
            F.round(F.col("scale"), 9).alias("q_scale"),
            F.round(mean_err, 9).alias("mean_abs_err"),
        )
        .orderBy("vec_id")
    )


# --- sample_temperature ------------------------------------------------

TEMP_ALPHA = 0.7  # multilingual-sampling temperature exponent


@query(
    "sample_temperature",
    oracle=f"""
    WITH counts AS (SELECT source, COUNT(*) AS n_s FROM documents
                    GROUP BY source),
    mn AS (SELECT MIN(n_s) AS n_min FROM counts),
    rates AS (SELECT source,
                     ROUND(POW(n_s * 1.0 / n_min, {TEMP_ALPHA} - 1.0), 6)
                       AS keep_rate
              FROM counts CROSS JOIN mn)
    SELECT d.doc_id, d.source, r.keep_rate
    FROM documents d JOIN rates r USING (source)
    WHERE CAST(CONCAT('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 1000000 < keep_rate * 1000000
    ORDER BY d.doc_id
    """,
)
def sample_temperature(spark, sf_dir):
    """Temperature-based source re-balancing: keep rate (n_s/n_min)^
    (alpha-1) per source — alpha<1 keeps all of the smallest source
    and down-samples large ones toward uniform, the multilingual
    sampling rule published with mBERT/XLM-R and standard for mixing
    pretraining sources. Selection is the same deterministic md5
    bucket as sample_stratified: reproducible across engines, runs,
    and repartitions, no RNG state.

    100 TB: per-source counts are a tiny agg broadcast back; the keep
    decision is a pure filter computed row-local — the op adds zero
    shuffles to a pipeline that scans anyway."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    mn = counts.groupBy().agg(F.min("n_s").alias("n_min"))
    rates = (
        counts.join(F.broadcast(mn))
        .select(
            "source",
            F.round(
                F.pow(F.col("n_s") / F.col("n_min"), TEMP_ALPHA - 1.0), 6
            ).alias("keep_rate"),
        )
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000000
    )
    return (
        d.join(F.broadcast(rates), "source")
        .filter(bucket < F.col("keep_rate") * 1000000)
        .select("doc_id", "source", "keep_rate")
        .orderBy("doc_id")
    )


# --- embedding_standardize --------------------------------------------


def _std_oracle() -> str:
    from deltasink_spark.operators.vectors import QSCALE

    return f"""
    WITH q AS (
        SELECT vec_id, u.pos - 1 AS pos,
               CAST(ROUND(CAST(embedding[u.pos] AS DOUBLE) * {QSCALE})
                    AS BIGINT) AS iv
        FROM embeddings,
        UNNEST(generate_series(1, len(embedding))) AS u(pos)),
    stats AS (
        SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(iv) AS BIGINT) AS s1,
               SUM(CAST(iv AS HUGEINT) * iv) AS s2
        FROM q GROUP BY pos),
    z AS (
        SELECT q.vec_id, q.pos,
               CAST(ROUND(CAST(n * q.iv - s1 AS DOUBLE)
                     / SQRT(CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE))
                     * 1000000) AS BIGINT) AS z_micro
        FROM q JOIN stats USING (pos))
    SELECT vec_id,
           list_aggregate(list(CAST(z_micro AS VARCHAR) ORDER BY pos),
                          'string_agg', ',') AS zvec
    FROM z GROUP BY vec_id ORDER BY vec_id
    """


@query("embedding_standardize", oracle=_std_oracle())
def embedding_standardize(spark, sf_dir):
    """Per-dimension z-score standardization of the embedding corpus —
    the feature-scaling pass before k-means/IVF training or distance
    comparisons across dimensions of different variance.

    Integer-exact to the last step: values quantize once to longs,
    per-dimension count/sum/sum-of-squares accumulate exactly (the
    square sums in decimal — long would overflow past ~1e3 vectors),
    and z = (n*x - S1) / sqrt(n*S2 - S1^2) algebraically avoids ever
    materializing mean or sigma as intermediate doubles: one division
    against one sqrt of exactly-computed integers, identical in both
    engines. The 64-row stats table broadcasts; the corpus is touched
    by one posexplode + one hash agg, and arrays reassemble with an
    order-insensitive struct sort (never a collect_list order
    assumption)."""
    from deltasink_spark.operators.vectors import quantized

    e = load(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id", F.posexplode(quantized(F.col("embedding"))).alias("pos", "iv")
    )
    stats = q.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("iv").alias("s1"),
        F.sum((F.col("iv") * F.col("iv")).cast("decimal(38,0)")).alias("s2"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    z_micro = F.round(
        (F.col("n") * F.col("iv") - F.col("s1")).cast("double")
        / F.sqrt(
            (dec(F.col("n")) * F.col("s2") - dec(F.col("s1")) * dec(F.col("s1")))
            .cast("double")
        )
        * 1_000_000
    ).cast("long")
    # z values ship as comma-joined micro-z integers: the driver
    # canonicalizer can't sort array cells, and double stringification
    # differs between engines — integer strings are exact in both.
    return (
        q.join(F.broadcast(stats), "pos")
        .select("vec_id", F.struct("pos", z_micro.alias("zm")).alias("pz"))
        .groupBy("vec_id")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("pz")),
                    lambda s: s.zm.cast("string"),
                ),
            ).alias("zvec")
        )
        .orderBy("vec_id")
    )


# --- text_entropy ------------------------------------------------------


@query(
    "text_entropy",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tok
           GROUP BY doc_id),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok
           GROUP BY doc_id, tok),
    terms AS (
        SELECT tf.doc_id,
               cnt * ROUND(-LOG2(cnt * 1.0 / n), 6) AS plogp
        FROM tf JOIN dl USING (doc_id))
    SELECT t.doc_id, dl.n AS n_tokens,
           CAST(SUM(CAST(plogp AS DECIMAL(30,6))) AS DOUBLE) / dl.n
             AS entropy_bits
    FROM terms t JOIN dl ON dl.doc_id = t.doc_id
    GROUP BY t.doc_id, dl.n
    ORDER BY t.doc_id
    """,
)
def text_entropy(spark, sf_dir):
    """Per-document token-level Shannon entropy, H = Σ (c/n)·(-log2
    c/n) — low entropy = repetitive/templated text, high = diverse
    vocabulary; a standard Gopher-style quality-filter signal next to
    repetition_filter's explicit ratios.

    Determinism follows text_unigram_logprob's recipe: each term's
    -log2(c/n) rounds to 6 places (an irrational, so a rounding tie is
    measure-zero), the per-doc sum runs in exact decimal, and the
    final division is one IEEE op. Two per-doc hash aggs, no joins
    beyond the doc-keyed broadcast-sized merges — strictly linear in
    corpus size."""
    d = load(spark, sf_dir, "documents")
    tok = fanout(d, "doc_id").select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    dl = tf.groupBy("doc_id").agg(F.sum("cnt").alias("n"))
    plogp = F.col("cnt") * F.round(-F.log2(F.col("cnt") / F.col("n")), 6)
    return (
        tf.join(dl, "doc_id")
        .select("doc_id", "n", plogp.alias("plogp"))
        .groupBy("doc_id", "n")
        .agg(
            (
                F.sum(F.col("plogp").cast("decimal(30,6)")).cast("double")
                / F.col("n")
            ).alias("entropy_bits")
        )
        .select("doc_id", F.col("n").alias("n_tokens"), "entropy_bits")
        .orderBy("doc_id")
    )


_SPAN_G = 16  # tokens per duplicated-substring probe gram


@query(
    "dedup_substring_span",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    n AS (SELECT doc_id, toks, len(toks) AS nt FROM t),
    g AS (SELECT doc_id, u.i AS pos,
                 array_to_string(toks[u.i + 1 : u.i + {_SPAN_G}], ' ') AS gram
          FROM n, UNNEST(range(0, GREATEST(nt - {_SPAN_G} + 1, 0))) AS u(i)),
    f AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
    d AS (SELECT g.doc_id, g.pos FROM g JOIN f USING (gram)),
    isl AS (SELECT doc_id, pos,
                   CASE WHEN lag(pos) OVER w IS NULL
                          OR pos - lag(pos) OVER w > {_SPAN_G}
                        THEN 1 ELSE 0 END AS ns
            FROM d WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    iid AS (SELECT doc_id, pos,
                   SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS island
            FROM isl),
    sp AS (SELECT doc_id, island, MIN(pos) AS p0, MAX(pos) AS p1
           FROM iid GROUP BY doc_id, island),
    agg AS (SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
                   CAST(SUM(p1 - p0 + {_SPAN_G}) AS BIGINT) AS dup_tokens
            FROM sp GROUP BY doc_id)
    SELECT n.doc_id, CAST(nt AS BIGINT) AS n_tokens,
           COALESCE(agg.n_dup_spans, 0) AS n_dup_spans,
           COALESCE(agg.dup_tokens, 0) AS dup_tokens,
           ROUND(COALESCE(agg.dup_tokens, 0) / CAST(nt AS DOUBLE), 6) AS dup_frac
    FROM n LEFT JOIN agg USING (doc_id)
    """,
)
def dedup_substring_span(spark, sf_dir):
    """Duplicated-SUBSTRING detection (the suffix-array dedup result of
    Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", approximated with fixed 16-token probe grams):
    every 16-token window repeated ANYWHERE in the corpus (including
    within the same document) marks its tokens as duplicated; per
    document, overlapping marked windows merge into maximal spans and
    the op reports span count, duplicated-token count, and the
    duplicated fraction — the signal used to clip or drop documents.

    Scale shape: gram frequency is one hash agg (map-side combinable);
    marking is a semi-join of the positioned grams against the
    frequent-gram set (equi-join on the gram, AQE-skew-safe even for
    mega-df boilerplate grams because the semi-join never multiplies
    rows). Span merge exploits fixed-length intervals: sorted by
    start, a span breaks exactly when the gap exceeds the gram length,
    so it is one per-document window pass (LAG + running sum), no
    interval tree. Every document returns via the left-join spine."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return substring_span_frame(docs)


def substring_span_frame(docs):
    """Core of dedup_substring_span over any (doc_id, text) frame —
    also the dup-span filter stage of pipeline_web_prep."""
    toks = F.split(F.col("text"), " ")
    n = docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("nt"))
    g = (
        fanout(n)
        .filter(F.col("nt") >= _SPAN_G)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), (F.col("nt") - _SPAN_G).cast("int")),
                    lambda i: F.array_join(F.slice(F.col("toks"), i + 1, _SPAN_G), " "),
                )
            ).alias("pos", "gram"),
        )
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "gram")
    )
    freq = g.groupBy("gram").agg(F.count(F.lit(1)).alias("ct")).filter(F.col("ct") >= 2)
    d = g.join(freq.select("gram"), "gram", "left_semi").select("doc_id", "pos")
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    ns = F.when(
        F.lag("pos").over(w).isNull() | (F.col("pos") - F.lag("pos").over(w) > _SPAN_G),
        F.lit(1),
    ).otherwise(F.lit(0))
    iid = d.withColumn("ns", ns).withColumn(
        "island",
        F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    sp = iid.groupBy("doc_id", "island").agg(
        F.min("pos").alias("p0"), F.max("pos").alias("p1")
    )
    agg = sp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("p1") - F.col("p0") + _SPAN_G).alias("dup_tokens"),
    )
    return (
        n.select("doc_id", F.col("nt").cast("long").alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_dup_spans"), F.lit(0)).alias("n_dup_spans"),
            F.coalesce(F.col("dup_tokens"), F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce(F.col("dup_tokens"), F.lit(0)) / F.col("n_tokens").cast("double"), 6
            ).alias("dup_frac"),
        )
    )


@query(
    "bpe_merge_step",
    oracle="""
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    wf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS wf FROM w
           WHERE word <> '' GROUP BY word),
    ch AS (SELECT word, wf, string_split(word, '') AS chars FROM wf),
    p AS (SELECT chars[u.i] || ' ' || chars[u.i + 1] AS pair, wf
          FROM ch, UNNEST(range(1, len(chars))) AS u(i)),
    pc AS (SELECT pair, SUM(wf) AS cnt FROM p GROUP BY pair),
    top AS (SELECT pair, CAST(cnt AS BIGINT) AS pair_count
            FROM pc ORDER BY cnt DESC, pair LIMIT 1),
    s AS (SELECT word, wf, array_to_string(string_split(word, ''), ' ') AS sym
          FROM wf)
    SELECT s.word, s.wf,
           top.pair AS merged_pair, top.pair_count,
           replace(s.sym, top.pair, replace(top.pair, ' ', '')) AS merged,
           CAST(len(string_split(replace(s.sym, top.pair, replace(top.pair, ' ', '')),
                                 ' ')) AS BIGINT) AS n_syms
    FROM s, top
    """,
)
def bpe_merge_step(spark, sf_dir):
    """One BPE tokenizer-training iteration (Sennrich et al. 2016),
    corpus-wide and fully distributed: count adjacent symbol pairs
    weighted by word frequency, pick the most frequent pair
    (deterministic count-then-lexicographic tie-break), and merge it
    in every word. This is the inner loop a tokenizer trainer runs
    ~50k times; expressing one step in DataFrame algebra is what lets
    vocabulary training run where the corpus lives instead of
    sampling it down to one machine.

    Scale shape: pair counting is explode + ONE map-side-combinable
    hash agg over the vocabulary (distinct words, not corpus
    positions — the groupBy(word) front-end collapses a 100 TB corpus
    to its vocabulary first, exactly like the real algorithm's word
    -frequency preprocessing). The winning pair is a 1-row broadcast;
    the merge is a codegen string replace per vocabulary entry.
    Left-to-right non-overlapping replace() matches BPE's standard
    merge semantics and is identical in both engines."""
    docs = load(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    chars = F.split(F.col("word"), "")
    pairs = wf.select(
        "wf",
        F.explode(
            F.zip_with(
                F.slice(chars, 1, F.size(chars) - 1),
                F.slice(chars, 2, F.size(chars) - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("pair"),
    )
    top = (
        pairs.groupBy("pair")
        .agg(F.sum("wf").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(1)
        .select(
            F.col("pair").alias("merged_pair"),
            F.col("pair_count").cast("long").alias("pair_count"),
        )
    )
    sym = F.array_join(F.split(F.col("word"), ""), " ")
    merged = F.replace(
        sym, F.col("merged_pair"), F.replace(F.col("merged_pair"), F.lit(" "), F.lit(""))
    )
    return (
        wf.crossJoin(F.broadcast(top))
        .select(
            "word",
            "wf",
            "merged_pair",
            "pair_count",
            merged.alias("merged"),
            F.size(F.split(merged, " ")).cast("long").alias("n_syms"),
        )
    )


# --- dsir_select: hashed n-gram importance sampling ----------------------

_DSIR_BUCKETS = 256
_DSIR_TOPK = 50
# portable bucket of a bigram string: first 8 md5 hex chars -> bigint % B
_DSIR_BUCKET_SQL = (
    f"CAST(CONCAT('0x', substr(md5(bg), 1, 8)) AS BIGINT) % {_DSIR_BUCKETS}"
)


@query(
    "dsir_select",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    bg AS (SELECT doc_id, lang,
                  unnest(list_transform(range(1, len(toks)),
                         i -> toks[i] || ' ' || toks[i+1])) AS bg
           FROM t),
    hb AS (SELECT doc_id, lang, {_DSIR_BUCKET_SQL} AS b FROM bg),
    cnt AS (SELECT b,
                   CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tc,
                   CAST(COUNT(*) AS BIGINT) AS rc
            FROM hb GROUP BY b),
    tot AS (SELECT SUM(tc) AS tt, SUM(rc) AS rt FROM cnt),
    lr AS (SELECT b,
                  CAST(ROUND(LN(((tc + 1.0) / (tt + {_DSIR_BUCKETS})) /
                                ((rc + 1.0) / (rt + {_DSIR_BUCKETS}))), 6)
                       AS DECIMAL(30,6)) AS logratio
           FROM cnt, tot),
    w AS (SELECT hb.doc_id, ANY_VALUE(hb.lang) AS lang,
                 CAST(SUM(lr.logratio) AS DOUBLE) / COUNT(*) AS weight
          FROM hb JOIN lr ON hb.b = lr.b GROUP BY hb.doc_id)
    SELECT doc_id, lang, weight FROM w
    ORDER BY weight DESC, doc_id LIMIT {_DSIR_TOPK}
    """,
)
def dsir_select(spark, sf_dir):
    """DSIR-style data selection (Xie et al. 2023): score every
    document by the average log-ratio of hashed-bigram probabilities
    under a target distribution (here: the lang='en' slice) vs the raw
    corpus, then keep the top-K — the importance-resampling recipe for
    steering a 100 TB crawl toward a target domain.

    Scale shape: bigrams explode once; bucket stats collapse to a
    {_DSIR_BUCKETS}-row frame (map-side-combining conditional-sum hash
    agg) whose log-ratios BROADCAST back onto the bigram stream; the
    per-doc score is another combining hash agg; the final top-K is
    TakeOrderedAndProject (distributed heap), never a global sort.
    Bucket hashing is the portable md5-prefix idiom, so both engines
    select identical documents."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    tk = F.col("toks")
    # single-token docs emit NO bigrams (empty array -> explode drops
    # the row) — mirrored by the oracle's range(1, len(toks)), which is
    # empty for len < 2; a guard here because sequence(1, 0) would
    # generate a DESCENDING range, and toks[i+1] past the end would be
    # a null-hash divergence between engines
    bigrams = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.concat_ws(" ", F.element_at(tk, i), F.element_at(tk, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hb = fanout(
        d.select("doc_id", "lang", F.split(F.col("text"), " ").alias("toks"))
    ).select(
        "doc_id",
        "lang",
        F.explode(bigrams).alias("bg"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5(F.col("bg")), 1, 8), 16, 10).cast("long")
            % _DSIR_BUCKETS
        ).alias("b"),
    ).localCheckpoint(eager=False)  # feeds bucket stats AND the probe side
    cnt = hb.groupBy("b").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("bigint").alias("tc"),
        F.count(F.lit(1)).cast("bigint").alias("rc"),
    )
    tot = cnt.agg(F.sum("tc").alias("tt"), F.sum("rc").alias("rt"))
    # per-bucket logratio is rounded to a fixed 6-dp scale BEFORE the
    # per-doc average so the sum is an exact decimal (order-independent
    # across Spark partial aggregation / DuckDB); the single final IEEE
    # division sum/count is exactly specified, so no re-round after it
    # (the quality_ccnet_bins determinism pattern)
    lr = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            F.log(
                ((F.col("tc") + 1.0) / (F.col("tt") + _DSIR_BUCKETS))
                / ((F.col("rc") + 1.0) / (F.col("rt") + _DSIR_BUCKETS))
            ),
            6,
        ).cast("decimal(30,6)").alias("logratio"),
    )
    w = (
        hb.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.first("lang").alias("lang"),
            (
                F.sum("logratio").cast("double") / F.count(F.lit(1))
            ).alias("weight"),
        )
    )
    return w.orderBy(F.desc("weight"), F.asc("doc_id")).limit(_DSIR_TOPK).select(
        "doc_id", "lang", "weight"
    )


# --- cdc_chunk: content-defined chunking (FastCDC shape) -----------------

_CDC_MOD = 16  # expected chunk length in tokens


@query(
    "cdc_chunk",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    tok AS (SELECT doc_id, u.i AS pos, toks[u.i + 1] AS tok
            FROM t, UNNEST(range(0, len(toks))) AS u(i)),
    fl AS (SELECT doc_id, pos, tok,
                  CASE WHEN pos = 0 OR
                       CAST(CONCAT('0x', substr(md5(tok), 1, 8)) AS BIGINT)
                       % {_CDC_MOD} = 0
                       THEN 1 ELSE 0 END AS boundary
           FROM tok),
    ch AS (SELECT doc_id, pos, tok,
                  SUM(boundary) OVER (PARTITION BY doc_id ORDER BY pos) AS chunk_id
           FROM fl)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CONCAT('0x', substr(md5(string_agg(tok, ' ' ORDER BY pos)), 1, 15))
             AS chunk_fp
    FROM ch GROUP BY doc_id, chunk_id
    """,
)
def cdc_chunk(spark, sf_dir):
    """Content-defined chunking (the FastCDC/rsync shape on token
    streams): a chunk boundary falls wherever the rolling token hash
    is 0 mod {_CDC_MOD}, so chunk boundaries are CONTENT-anchored —
    insert one word at the head of a document and every fixed-size
    chunk shifts, but CDC chunks re-align after the edit, which is
    what makes chunk-fingerprint dedup robust to small edits at
    100 TB. Emits each chunk's token count and md5 fingerprint.

    Scale shape: one explode; the boundary flag is codegen md5
    arithmetic; chunk assignment is a running sum windowed PER
    DOCUMENT (bounded partitions — never a corpus-wide sort); chunk
    reassembly is a combining hash agg with the ordered
    array_sort(collect_list(struct(pos, tok))) trick."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    tok = fanout(d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))).select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    )
    boundary = F.when(
        (F.col("pos") == 0)
        | (F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % _CDC_MOD == 0),
        1,
    ).otherwise(0)
    w = Window.partitionBy("doc_id").orderBy("pos")
    ch = tok.select(
        "doc_id", "pos", "tok", F.sum(boundary).over(w).alias("chunk_id")
    )
    return ch.groupBy("doc_id", F.col("chunk_id").cast("bigint").alias("chunk_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.concat(
            F.lit("0x"),
            F.substring(
                F.md5(
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                            lambda x: x["tok"],
                        ),
                        " ",
                    )
                ),
                1,
                15,
            ),
        ).alias("chunk_fp"),
    )


# --- text_hashing_vectorizer: feature hashing (hashing trick) ------------

_HV_DIM = 32


@query(
    "text_hashing_vectorizer",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    hb AS (SELECT doc_id,
                  CAST(CONCAT('0x', substr(md5(tok), 1, 8)) AS BIGINT) % {_HV_DIM} AS b
           FROM tok),
    cnt AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM hb GROUP BY 1, 2),
    m AS (SELECT doc_id, map(list(b), list(c)) AS m FROM cnt GROUP BY doc_id)
    SELECT doc_id,
           array_to_string(
               list_transform(range(0, {_HV_DIM}),
                              h -> COALESCE(map_extract(m, h)[1], CAST(0 AS BIGINT))),
               ',') AS tf
    FROM m
    """,
)
def text_hashing_vectorizer(spark, sf_dir):
    """Feature hashing (the 'hashing trick', Weinberger et al. 2009):
    each document becomes a fixed {_HV_DIM}-slot hashed term-frequency
    vector — the vocabulary-free featurization a streaming classifier
    or quality model consumes, immune to vocabulary growth because the
    feature space is the hash range, not the term set.

    Scale shape: one explode, two map-side-combining hash aggs
    (per-(doc, slot) counts, then per-doc map assembly), dense vector
    via codegen transform over a {_HV_DIM}-slot sequence — the same
    sparse->dense pattern as ts_similarity's hour profiles. No windows,
    no joins; the portable md5-prefix bucket makes both engines build
    identical vectors."""
    d = load(spark, sf_dir, "documents")
    tok = fanout(d, "doc_id").select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    hb = tok.select(
        "doc_id",
        (F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % _HV_DIM).alias("b"),
    )
    cnt = hb.groupBy("doc_id", "b").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    m = cnt.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("b", "c"))).alias("m")
    )
    zero = F.lit(0).cast("long")
    # driver-canonicalizer contract: vector serialized as a CSV string
    # (array cells are not hashable by the compare layer)
    return m.select(
        "doc_id",
        F.concat_ws(
            ",",
            F.transform(
                F.sequence(F.lit(0), F.lit(_HV_DIM - 1)),
                lambda h: F.coalesce(F.element_at(F.col("m"), h.cast("long")), zero),
            ),
        ).alias("tf"),
    )


# --- quality_ccnet_bins: perplexity-tercile binning (CCNet) --------------


@query(
    "quality_ccnet_bins",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    tot AS (SELECT COUNT(*) AS n_total FROM tok),
    lm AS (SELECT tok, ROUND(-LOG2(COUNT(*) * 1.0 / ANY_VALUE(n_total)), 6)
                         AS bits
           FROM tok CROSS JOIN tot GROUP BY tok),
    bpt AS (SELECT doc_id,
                   CAST(SUM(CAST(bits AS DECIMAL(30,6))) AS DOUBLE)
                     / COUNT(*) AS bits_per_token
            FROM tok JOIN lm USING (tok) GROUP BY doc_id),
    ranked AS (SELECT doc_id, bits_per_token,
                      ROW_NUMBER() OVER (ORDER BY bits_per_token, doc_id) AS rnk,
                      COUNT(*) OVER () AS n
               FROM bpt)
    SELECT doc_id, bits_per_token,
           CASE WHEN rnk * 3 <= n THEN 'head'
                WHEN rnk * 3 <= 2 * n THEN 'middle'
                ELSE 'tail' END AS bin
    FROM ranked
    """,
)
def quality_ccnet_bins(spark, sf_dir):
    """CCNet-style head/middle/tail binning (Wenzek et al. 2020): score
    every document with the corpus-unigram perplexity proxy
    (text_unigram_logprob's pipeline), then split the corpus at its
    own terciles — head = most fluent third, the slice CCNet keeps for
    pretraining by default.

    Determinism at the boundary: binning is RANK-based (rnk*3 <= n,
    pure integer arithmetic over a (score, doc_id) total order), not
    threshold-based — interpolated quantile thresholds differ between
    engines in the last ulp, and at sf0.1 three docs sat exactly on
    one and flipped bins. Scale shape: two token-level hash aggs + a
    broadcast vocab join (the LM) + a per-doc agg; the ranking window
    runs over the doc-count-sized SCORE frame (1 row/doc, not the
    corpus). At 100 TB the exact global rank becomes the bottleneck —
    swap the cutpoints to approx_percentile (t-digest, as
    agg_approx_quantile) for the same pipeline with approximate bins;
    exact here because the oracle must be exact."""
    d = load(spark, sf_dir, "documents")
    tok = fanout(d, "doc_id").select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).localCheckpoint(eager=False)
    tot = tok.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    lm = (
        tok.join(F.broadcast(tot))
        .groupBy("tok")
        .agg(F.round(-F.log2(F.count(F.lit(1)) / F.first("n_total")), 6).alias("bits"))
    )
    bpt = (
        tok.join(F.broadcast(lm), "tok")
        .groupBy("doc_id")
        .agg(
            # exact decimal sum -> one IEEE division, NOT re-rounded:
            # round-after-divide can land on a .5e-7 tie the engines
            # resolve differently (the text_unigram_logprob lesson —
            # reintroducing ROUND here flipped 3/5000 docs at sf0.1)
            (
                F.sum(F.col("bits").cast("decimal(30,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("bits_per_token")
        )
        .localCheckpoint(eager=False)  # feeds the count AND the ranking
    )
    w = Window.orderBy("bits_per_token", "doc_id")
    n = bpt.groupBy().agg(F.count(F.lit(1)).alias("n"))
    ranked = bpt.withColumn("rnk", F.row_number().over(w)).crossJoin(F.broadcast(n))
    return ranked.select(
        "doc_id",
        "bits_per_token",
        F.when(F.col("rnk") * 3 <= F.col("n"), "head")
        .when(F.col("rnk") * 3 <= 2 * F.col("n"), "middle")
        .otherwise("tail")
        .alias("bin"),
    )


# --- bpe_train / tokenizer_encode: K-step BPE training + encoding --------

_BPE_STEPS = 8


def _bpe_chain_sql() -> str:
    """DuckDB CTE chain replaying K bpe_merge_step iterations: each step
    is the identical block (pair count over the current vocabulary ->
    deterministic top-1 -> string-replace merge), chained s0..sK, with
    per-step o{k} merge-record CTEs."""
    blocks = [
        """
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    wf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS wf FROM w
           WHERE word <> '' GROUP BY word),
    s0 AS (SELECT word, wf, array_to_string(string_split(word, ''), ' ') AS sym
           FROM wf)"""
    ]
    for k in range(1, _BPE_STEPS + 1):
        j = k - 1
        blocks.append(f"""
    ch{k} AS (SELECT wf, string_split(sym, ' ') AS l FROM s{j}),
    p{k} AS (SELECT l[u.i] || ' ' || l[u.i + 1] AS pair, wf
             FROM ch{k}, UNNEST(range(1, len(l))) AS u(i)),
    pc{k} AS (SELECT pair, SUM(wf) AS cnt FROM p{k} GROUP BY pair),
    top{k} AS (SELECT pair, CAST(cnt AS BIGINT) AS pair_count
               FROM pc{k} ORDER BY cnt DESC, pair LIMIT 1),
    m{k} AS (SELECT s{j}.word, s{j}.wf, top{k}.pair, top{k}.pair_count,
                    trim(replace(
                        replace(' ' || replace(s{j}.sym, ' ', '  ') || ' ',
                                ' ' || replace(top{k}.pair, ' ', '  ') || ' ',
                                ' ' || replace(top{k}.pair, ' ', '') || ' '),
                        '  ', ' ')) AS new_sym,
                    s{j}.sym AS sym
             FROM s{j}, top{k}),
    o{k} AS (SELECT CAST({k} AS BIGINT) AS step, pair AS merged_pair, pair_count,
                    CAST(SUM(CASE WHEN new_sym <> sym THEN 1 ELSE 0 END)
                         AS BIGINT) AS n_affected
             FROM m{k} GROUP BY pair, pair_count),
    s{k} AS (SELECT word, wf, new_sym AS sym FROM m{k})""")
    return ",".join(blocks)


def _bpe_train_oracle() -> str:
    union = " UNION ALL ".join(f"SELECT * FROM o{k}" for k in range(1, _BPE_STEPS + 1))
    return _bpe_chain_sql() + f" SELECT * FROM ({union}) ORDER BY step"


# Train-once/encode-everywhere: bpe_train and tokenizer_encode share
# one trained vocabulary per (Spark app, sf_dir) — without this the
# 8-step train loop runs twice when both ops execute in one session
# (r7 bench paid 2.07 s for tokenizer_encode's in-op retrain). The
# cached frames are eagerly localCheckpoint'd, so holding the Python
# references keeps their blocks alive; a new SparkSession gets a new
# applicationId and therefore a fresh entry.
_BPE_CACHE: dict = {}


def _bpe_iterate(spark, sf_dir):
    """Run the K merge iterations; returns (per-step merge-record
    frames, final vocabulary frame (word, wf, sym)). Each iteration's
    vocab is localCheckpoint'd eagerly — the standard Spark iterative
    -algorithm move (cf. graph_pagerank) that truncates lineage so
    step K's plan does not re-derive steps 1..K-1 exponentially; the
    checkpointed frame is vocabulary-sized (distinct words), orders of
    magnitude below corpus size at 100 TB. Results are memoized per
    (applicationId, sf_dir) — see _BPE_CACHE."""
    cache_key = (spark.sparkContext.applicationId, sf_dir)
    cached = _BPE_CACHE.get(cache_key)
    if cached is not None:
        return cached
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wf"))
        .select(
            "word", "wf", F.array_join(F.split(F.col("word"), ""), " ").alias("sym")
        )
        .localCheckpoint()
    )
    step_rows = []
    for k in range(1, _BPE_STEPS + 1):
        syms = F.split(F.col("sym"), " ")
        pairs = vocab.select(
            "wf",
            F.explode(
                F.zip_with(
                    F.slice(syms, 1, F.size(syms) - 1),
                    F.slice(syms, 2, F.size(syms) - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("pair"),
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("wf").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .select(
                F.col("pair").alias("merged_pair"),
                F.col("cnt").cast("long").alias("pair_count"),
            )
        )
        # token-exact fuse via the doubled-space sentinel (the
        # operators/wordpiece.py discipline): doubling the separators
        # gives every token a full delimiter on each side, so the pair
        # key ` left  right ` only ever matches whole tokens — in the
        # multi-char steps a raw replace could fuse inside a LONGER
        # token whose suffix matches the pair's left symbol
        sym2 = F.concat(
            F.lit(" "),
            F.replace(F.col("sym"), F.lit(" "), F.lit("  ")),
            F.lit(" "),
        )
        pair2 = F.concat(
            F.lit(" "),
            F.replace(F.col("merged_pair"), F.lit(" "), F.lit("  ")),
            F.lit(" "),
        )
        fused = F.concat(
            F.lit(" "),
            F.replace(F.col("merged_pair"), F.lit(" "), F.lit("")),
            F.lit(" "),
        )
        merged = (
            vocab.crossJoin(F.broadcast(top))
            .select(
                "word",
                "wf",
                "merged_pair",
                "pair_count",
                F.trim(
                    F.replace(
                        F.replace(sym2, pair2, fused),
                        F.lit("  "),
                        F.lit(" "),
                    )
                ).alias("new_sym"),
                "sym",
            )
            .localCheckpoint()
        )
        step_rows.append(
            merged.groupBy("merged_pair", "pair_count")
            .agg(
                F.sum(
                    F.when(F.col("new_sym") != F.col("sym"), 1).otherwise(0)
                ).cast("long").alias("n_affected")
            )
            .select(
                F.lit(k).cast("long").alias("step"),
                "merged_pair",
                "pair_count",
                "n_affected",
            )
        )
        vocab = merged.select("word", "wf", F.col("new_sym").alias("sym"))
    _BPE_CACHE[cache_key] = (step_rows, vocab)
    return step_rows, vocab


@query("bpe_train", oracle=_bpe_train_oracle())
def bpe_train(spark, sf_dir):
    """Multi-step BPE tokenizer training (Sennrich et al. 2016): K=8
    merge iterations of bpe_merge_step's distributed algebra — the
    loop a tokenizer trainer actually runs (to ~50k for a production
    vocab). Emits the ordered merge table (step, merged_pair,
    pair_count, n_affected), i.e. the artifact that IS a trained BPE
    tokenizer. Iteration mechanics + scale shape: see _bpe_iterate.

    Merge semantics note: the fuse is the sentinel-delimited replace()
    (operators/wordpiece.py's doubled-space trick) — TOKEN-EXACT
    greedy BPE at EVERY step, including the multi-char-symbol rounds
    where a raw replace could fuse inside a longer token whose suffix
    matches the pair (proven against a list-based greedy reference in
    tests/test_hypothesis.py), and engine-identical (Spark replace ==
    DuckDB replace, both left-to-right non-overlapping — exactly BPE's
    in-word merge order), so the oracle is exact."""
    step_rows, _ = _bpe_iterate(spark, sf_dir)
    out = step_rows[0]
    for r in step_rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("step")


@query(
    "tokenizer_encode",
    oracle=_bpe_chain_sql() + f""",
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents),
    wl AS (SELECT word, CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_syms
           FROM s{_BPE_STEPS})
    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(wl.n_syms) AS BIGINT) AS n_bpe_tokens
    FROM tok t JOIN wl USING (word)
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
)
def tokenizer_encode(spark, sf_dir):
    """ENCODE with the trained tokenizer: apply the K-merge BPE
    vocabulary from _bpe_iterate to every document and emit per-doc
    token accounting (words in, BPE tokens out) — the token-budget
    measurement a pretraining pipeline runs over the whole corpus
    after training the tokenizer (bpe_train is the train half; this is
    the apply half).

    Scale shape: encoding is a plain equi-join of the exploded token
    stream against the vocabulary's per-word symbol counts (the vocab
    is |distinct words|-sized — broadcastable in practice, and a
    hash-partitioned equi-join at worst) followed by one combining
    per-doc hash agg; the corpus is touched exactly once."""
    _, vocab = _bpe_iterate(spark, sf_dir)
    wl = vocab.select(
        "word", F.size(F.split(F.col("sym"), " ")).cast("long").alias("n_syms")
    )
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        toks.join(wl, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


# --- sample_weighted: deterministic weighted sample (A-Res keys) ---------

_WSAMPLE_K = 100

# A-Res key, SINGLE source of truth for sample_weighted AND
# sample_weighted_union (r8 review: the 6dp->12dp advisor fix had to
# touch four copies; now each engine has exactly one).
_WKEY_SQL = """ROUND(LN((CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                     1, 8)) AS BIGINT) + 0.5) / 4294967296.0)
                     / n_chars, 12)"""


def _wkey_col():
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 0.5
    ) / 4294967296.0
    return F.round(F.log(u) / F.col("n_chars"), 12)


@query(
    "sample_weighted",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source, n_chars, {_WKEY_SQL} AS wkey
        FROM documents WHERE n_chars > 0)
    SELECT doc_id, source, n_chars, wkey FROM keyed
    ORDER BY wkey DESC, doc_id LIMIT {_WSAMPLE_K}
    """,
)
def sample_weighted(spark, sf_dir):
    """Weighted sample without replacement via Efraimidis-Spirakis
    A-Res keys: every doc draws u = md5-uniform(doc_id) in (0,1) and
    ranks by u^(1/w) with weight w = n_chars — keep the top-K. The
    log-domain key ln(u)/w is the same ordering (monotone transform)
    without the pow underflow for huge weights. This is how a 100 TB
    pipeline takes "1M docs sampled proportional to length/quality
    score" in ONE pass: per-partition top-K heaps merged by the driver
    (TakeOrderedAndProject), no RNG state, no shuffle of the data, and
    the identical sample whatever the partitioning or engine — the
    weighted complement of sample_bottom_k. A-Res keys also compose:
    the union of two tables' samples re-truncated is the sample of the
    union, which true weighted reservoirs need auxiliary state for.

    Determinism: u is the exact md5 32-bit bucket (+0.5 to stay inside
    the open interval) over 2^32; LN and the IEEE division are
    deterministic; keys round to 12 dp (r7 advisor: 6 dp collapsed the
    ~1e-3..1e-5-magnitude keys of long docs into ties resolved by
    doc_id, biasing the sample toward low ids — 12 dp keeps full
    ordering resolution and is still exactly mirrorable in DuckDB)
    with a doc_id tie-break before the top-K cut."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return (
        d.select("doc_id", "source", "n_chars", _wkey_col().alias("wkey"))
        .orderBy(F.desc("wkey"), F.asc("doc_id"))
        .limit(_WSAMPLE_K)
    )


# --- sample_weighted_union: A-Res sample mergeability proof ---------------

_WSU_K = 50


@query(
    "sample_weighted_union",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source, n_chars, {_WKEY_SQL} AS wkey
        FROM documents WHERE n_chars > 0),
    per AS (
        SELECT source AS scope, doc_id, wkey FROM (
            SELECT source, doc_id, wkey,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY wkey DESC, doc_id) AS rn
            FROM keyed
        ) WHERE rn <= {_WSU_K}),
    merged AS (
        SELECT '__merged__' AS scope, doc_id, wkey FROM per
        ORDER BY wkey DESC, doc_id LIMIT {_WSU_K}),
    direct AS (
        SELECT '__direct__' AS scope, doc_id, wkey FROM keyed
        ORDER BY wkey DESC, doc_id LIMIT {_WSU_K})
    SELECT scope, doc_id, wkey FROM per
    UNION ALL SELECT scope, doc_id, wkey FROM merged
    UNION ALL SELECT scope, doc_id, wkey FROM direct
    ORDER BY scope, doc_id
    """,
)
def sample_weighted_union(spark, sf_dir):
    """MERGEABILITY proof for Efraimidis-Spirakis A-Res sampling (the
    sample_weighted op): per-source top-K samples re-truncated to K
    must equal the direct top-K over the whole corpus — any member of
    the global top-K is necessarily in its own source's top-K, so the
    merge loses nothing. This is what lets a 100 TB pipeline keep
    per-partition/per-day weighted samples and answer "sample the
    union" by merging K-row frames, never rescanning — the sampling
    sibling of minhash_union / agg_hll_union's union algebra. The op
    emits per-source rows, '__merged__' (union of per-source samples
    re-cut), and '__direct__' (one-pass top-K); the oracle recomputes
    each independently, so merged != direct would hash-fail.

    Plan: per-source top-K is one window over the keyed rows (shuffle
    on source); merged re-truncates a |sources| x K frame (tiny);
    direct is a TakeOrderedAndProject per-partition-heap pass — no
    global sort anywhere."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    keyed = d.select("doc_id", "source", _wkey_col().alias("wkey"))
    w = Window.partitionBy("source").orderBy(F.desc("wkey"), F.asc("doc_id"))
    per = (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _WSU_K)
        .select(F.col("source").alias("scope"), "doc_id", "wkey")
    )
    merged = (
        per.orderBy(F.desc("wkey"), F.asc("doc_id"))
        .limit(_WSU_K)
        .select(F.lit("__merged__").alias("scope"), "doc_id", "wkey")
    )
    direct = (
        keyed.orderBy(F.desc("wkey"), F.asc("doc_id"))
        .limit(_WSU_K)
        .select(F.lit("__direct__").alias("scope"), "doc_id", "wkey")
    )
    return per.unionByName(merged).unionByName(direct).orderBy("scope", "doc_id")


# --- text_kneser_ney_bigram ---------------------------------------------


@query(
    "text_kneser_ney_bigram",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    bg AS (SELECT doc_id,
                  toks[i] AS w1, toks[i + 1] AS w2
           FROM t, UNNEST(range(1, len(toks))) AS u(i)
           WHERE toks[i] <> '' AND toks[i + 1] <> ''),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                  CAST(COUNT(*) AS BIGINT) AS n1p
           FROM c12 GROUP BY w1),
    cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS ncont
             FROM c12 GROUP BY w2),
    bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS bt FROM c12),
    p AS (SELECT c12.w1, c12.w2,
                 ROUND(LN(GREATEST(CAST(c12 AS DOUBLE) - 0.75, 0.0) / c1
                          + 0.75 * n1p / c1 * (ncont * 1.0 / bt)), 6)
                   AS lnp
          FROM c12 JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN bt)
    SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(CAST(lnp AS DECIMAL(30,6))) AS DOUBLE), 6)
             AS kn_logprob
    FROM bg JOIN p ON p.w1 = bg.w1 AND p.w2 = bg.w2
    GROUP BY bg.doc_id
    ORDER BY bg.doc_id
    """,
)
def text_kneser_ney_bigram(spark, sf_dir):
    """Per-document log-probability under an interpolated Kneser–Ney
    bigram LM trained on the corpus itself (d = 0.75) — the n-gram
    upgrade of [text_unigram_logprob]'s CCNet-shaped quality score,
    using the smoothing every KenLM filter model uses:
    P(w2|w1) = max(c(w1w2) − d, 0)/c(w1·) + d·N1+(w1·)/c(w1·) ·
    N1+(·w2)/|bigram types| — the continuation probability scores a
    word by how many CONTEXTS it follows, not how often it occurs
    (the "San Francisco" correction). Low per-bigram logprob =
    rare-transition soup; high = fluent/templated.

    Determinism: all five count tables are exact BIGINTs, and p
    itself is bit-identical cross-engine (one correctly-rounded IEEE
    tree on exact inputs); ONLY ln is libm-dependent (last-ulp
    differences between JVM Math.log and DuckDB's log — the same
    hazard class the skewness op documents for pow), so each term is
    rounded to 6dp, where a last-ulp rounding tie is measure-zero in
    practice (an 8dp first cut hit exactly one tie among 86k bigram
    types at sf0.1); per-doc sums accumulate in DECIMAL(30,6) —
    order-insensitive — before the final 6dp round.
    Double-space tokens ('') drop on BOTH sides of the bigram in both
    engines; every observed bigram has c12 >= 1 so the discount never
    underflows and ln's argument is strictly positive.

    Scale: train = two chained token-level hash aggs (bigram counts,
    then left-context moments) + one |types|-sized continuation agg;
    score = one equi-join of the doc bigram stream against the
    model + a per-doc combining agg. The model is |bigram types| rows
    — the same join geometry a KenLM-scored pipeline distributes; the
    corpus is touched exactly twice."""
    d = load(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    pairs = F.when(
        F.size(t) >= 2,
        F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array())
    bg = (
        fanout(d, "doc_id")
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
        .localCheckpoint(eager=False)
    )
    c12 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .localCheckpoint(eager=False)
    )
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1p"),
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("ncont"))
    bt = c12.groupBy().agg(F.count(F.lit(1)).cast("long").alias("bt"))
    lnp = F.round(
        F.log(
            F.greatest(F.col("c12").cast("double") - F.lit(0.75), F.lit(0.0))
            / F.col("c1")
            + F.lit(0.75) * F.col("n1p") / F.col("c1")
            * (F.col("ncont") / F.col("bt"))
        ),
        6,
    )
    p = (
        c12.join(c1, "w1")
        .join(cont, "w2")
        .join(F.broadcast(bt))
        .select("w1", "w2", lnp.alias("lnp"))
    )
    return (
        bg.join(p, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.sum(F.col("lnp").cast("decimal(30,6)")).cast("double"), 6
            ).alias("kn_logprob"),
        )
        .orderBy("doc_id")
    )


@query(
    "tokenizer_roundtrip",
    oracle=_bpe_chain_sql() + f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab_words,
           CAST(COUNT(CASE WHEN replace(sym, ' ', '') = word THEN 1 END)
                AS BIGINT) AS n_lossless,
           CAST(COALESCE(SUM(wf), 0) AS BIGINT) AS n_occurrences
    FROM s{_BPE_STEPS}
    """,
)
def tokenizer_roundtrip(spark, sf_dir):
    """Losslessness audit of the trained BPE tokenizer — the QA gate a
    tokenizer ships behind: for EVERY vocabulary word, concatenating
    its trained symbol sequence (spaces stripped) must reproduce the
    word exactly, i.e. encode->decode is the identity on the corpus
    ([tokenizer_encode] measures token budgets; this proves no byte is
    lost or invented by the K merge steps). Emits vocab size, the
    lossless count (must equal it — BPE merges only ever JOIN adjacent
    symbols, a structurally lossless operation, and this op pins that
    invariant against future merge-rule changes like the
    boundary-aware matching the docstrings flag), and the total corpus
    occurrences covered.

    Scale: the vocab frame is |distinct words| rows from the memoized
    train (_bpe_iterate — shared with bpe_train / tokenizer_encode, so
    the audit is one combining agg over an already-materialized
    frame); the corpus itself is not re-touched."""
    _, vocab = _bpe_iterate(spark, sf_dir)
    return vocab.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab_words"),
        F.count(
            F.when(
                F.replace(F.col("sym"), F.lit(" "), F.lit("")) == F.col("word"), 1
            )
        )
        .cast("long")
        .alias("n_lossless"),
        F.coalesce(F.sum("wf"), F.lit(0)).cast("long").alias("n_occurrences"),
    )

# --- unigram-LM (SentencePiece-style) tokenizer ---------------------------


@query(
    "tokenizer_unigram_train",
    oracle="WITH " + _ug_ctes() + "\n    SELECT piece, cnt, lp FROM lp2",
)
def tokenizer_unigram_train(spark, sf_dir):
    """Unigram-LM tokenizer training (Kudo 2018 — the SentencePiece
    algorithm Llama-family pipelines train, the r9 verdict's missing
    #4; BPE's sibling in §2.11): seed vocabulary from substring counts
    (all single chars + top-200 multi-char substrings), then
    EM_ROUNDS=2 of hard EM — Viterbi-segment the word vocabulary under
    current piece log-probs, re-estimate log-probs from the chosen
    segments' counts, prune pieces no segmentation uses (single chars
    floored, never pruned — coverage). Emits the trained piece table
    (piece, cnt, lp): the artifact that IS the tokenizer.

    Engine parity: the Viterbi DP is a FIXED 12-level unrolled chain
    (pieces <= 4 chars bound the lookback) generated from the same
    constants as the DuckDB oracle's MATERIALIZED CTE chain
    (operators/unigram.py — the hilbert shared-generator move); lp
    rounds each ln at 6 dp ([text_kneser_ney_bigram]'s libm rule); the
    argmax tie-break (score DESC, n_pieces ASC, seg ASC) is a total
    order. The EM step is pinned against a brute-force all-
    segmentations reference in tests/test_hypothesis.py.

    Scale: vocabulary-collapsed — the DP runs on distinct words with
    frequencies (two hash aggs from the corpus); each level is one
    broadcast join of the piece table + a per-word argmax window over
    a vocab-sized frame. Memoized per (applicationId, sf_dir)
    (train-once/consume-many; [tokenizer_unigram_encode] shares it)."""
    from deltasink_spark.operators.unigram import unigram_train_cached

    pieces, _ = unigram_train_cached(spark, sf_dir)
    return pieces.select("piece", "cnt", "lp")


@query(
    "tokenizer_unigram_encode",
    oracle="WITH " + _ug_ctes() + """,
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents),
    wl AS (SELECT word,
                  CAST(len(string_split(seg, ' ')) AS BIGINT) AS n_pieces
           FROM v2_best)
    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(wl.n_pieces) AS BIGINT) AS n_unigram_tokens
    FROM tok t JOIN wl USING (word)
    GROUP BY t.doc_id""",
)
def tokenizer_unigram_encode(spark, sf_dir):
    """ENCODE with the trained unigram tokenizer: per-document token
    accounting (words in, unigram pieces out) under the FINAL Viterbi
    segmentations — the corpus-wide token-budget pass
    ([tokenizer_encode] is the BPE twin). Words longer than MAXLEN=12
    chars are outside the training contract and drop from the join
    (fixture max is 8 — a no-op here, documented for the general
    case).

    Scale: one equi-join of the exploded token stream against the
    |distinct words|-sized segmentation table (broadcastable) + one
    combining per-doc hash agg; the memoized train is not re-run."""
    from deltasink_spark.operators.unigram import unigram_train_cached

    _, best = unigram_train_cached(spark, sf_dir)
    wl = best.select(
        "word", F.size(F.split(F.col("seg"), " ")).cast("long").alias("n_pieces")
    )
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        toks.join(wl, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_unigram_tokens"),
        )
    )


# --- WordPiece (BERT-family) tokenizer ------------------------------------


def _wp_train_oracle() -> str:
    from deltasink_spark.operators.wordpiece import WP_STEPS, sql_wp_chain

    union = " UNION ALL ".join(
        f"SELECT * FROM o{k}" for k in range(1, WP_STEPS + 1)
    )
    return (
        "WITH " + sql_wp_chain()
        + f"\n    SELECT * FROM ({union}) ORDER BY step"
    )


def _wp_encode_oracle() -> str:
    from deltasink_spark.operators.wordpiece import WP_STEPS, sql_wp_chain

    return (
        "WITH " + sql_wp_chain() + f""",
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents),
    wl AS (SELECT word,
                  CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_pieces
           FROM s{WP_STEPS})
    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(wl.n_pieces) AS BIGINT) AS n_wordpiece_tokens
    FROM tok t JOIN wl USING (word)
    WHERE t.word <> ''
    GROUP BY t.doc_id"""
    )


@query("tokenizer_wordpiece_train", oracle=_wp_train_oracle())
def tokenizer_wordpiece_train(spark, sf_dir):
    """WordPiece tokenizer training (Schuster & Nakajima 2012 — the
    BERT-family trainer, closing the tokenizer-training triad after
    BPE [bpe_train] and unigram-LM [tokenizer_unigram_train]; r10
    verdict next #9): K=8 greedy rounds where the merged pair
    maximizes the LIKELIHOOD RATIO ln c(ab) - ln c(a) - ln c(b)
    (corpus log-likelihood gain), not BPE's raw count — the defining
    difference between the two greedy trainers. Non-initial symbols
    carry the canonical ## continuation prefix; the merge keeps the
    left symbol's prefix status. Emits the ordered merge table (step,
    merged_pair, pair_count, score, n_affected) — the artifact that IS
    a trained WordPiece tokenizer. Engine parity: 6dp-rounded ln terms
    combined in one IEEE order, (score DESC, pair ASC) total-order
    top-1, replace()-based merge replay — the Spark plan and the
    DuckDB oracle chain are generated from the same constants
    (operators/wordpiece.py). Greedy-reference equivalence is pinned
    by the brute-force hypothesis test.

    Scale: vocabulary-collapsed (rounds run on distinct words with
    frequencies — hash aggs + a broadcast top-1, never a corpus pass);
    memoized per (applicationId, sf_dir), cold cost recorded in
    BASELINE.md."""
    from deltasink_spark.operators.wordpiece import wordpiece_train_cached

    records, _ = wordpiece_train_cached(spark, sf_dir)
    out = records[0]
    for r in records[1:]:
        out = out.unionByName(r)
    return out


@query("tokenizer_wordpiece_encode", oracle=_wp_encode_oracle())
def tokenizer_wordpiece_encode(spark, sf_dir):
    """ENCODE with the trained WordPiece merges: per-document token
    accounting (words in, WordPiece pieces out) under the final merged
    symbol table — the corpus-wide token-budget pass, completing the
    per-algorithm encode set ([tokenizer_encode] BPE,
    [tokenizer_unigram_encode] unigram). Scale: one equi-join of the
    exploded token stream against the |distinct words|-sized
    segmentation table (broadcastable) + one combining per-doc hash
    agg; the memoized train is not re-run."""
    from deltasink_spark.operators.wordpiece import wordpiece_train_cached

    _, vocab = wordpiece_train_cached(spark, sf_dir)
    wl = vocab.select(
        "word",
        F.size(F.split(F.col("sym"), " ")).cast("long").alias("n_pieces"),
    )
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        toks.join(wl, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_wordpiece_tokens"),
        )
    )
