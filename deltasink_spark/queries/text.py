"""Text analysis queries (SURVEY.md §2.11): normalize, tokenize, stats,
n-grams, TF-IDF, keyword/lexicon scoring, language-ID heuristic,
quality scoring, token counting, fingerprinting.

Scale shape: everything is explode -> hash-agg -> (broadcast) join.
The explode of a 100 TB corpus into (doc, term) pairs shuffles once per
agg; document-frequency tables are tiny (vocabulary-sized) and always
broadcast back.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deltasink_spark.operators.minhash import minhash_dedup_pairs
from deltasink_spark.operators.text import (
    normalize,
    quality_score,
    token_count_bpe_ish,
    tokenize,
    word_ngrams,
)
from deltasink_spark.registry import query
from deltasink_spark.tables import fanout, load


@query(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g')) AS norm_text
    FROM documents
    """,
)
def text_normalize(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", normalize(F.col("text")).alias("norm_text"))


@query(
    "text_tokenize",
    oracle="""
    SELECT doc_id,
           array_to_string(string_split(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '), '|') AS tokens,
           len(string_split(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS n_tokens
    FROM documents WHERE text IS NOT NULL
    """,
)
def text_tokenize(spark, sf_dir):
    """Driver-facing token list is stringified (concat_ws, mirrored by
    DuckDB array_to_string): the harness canonicalizer cannot hash array
    cells. Raw-array tokenize stays covered by
    tests/test_properties.py::test_raw_array_surfaces."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())  # NULL-text contract (r8 null audit): drop at ingest, mirrored in oracle
    toks = tokenize(F.col("text"))
    return d.select(
        "doc_id",
        F.concat_ws("|", toks).alias("tokens"),
        F.size(toks).alias("n_tokens"),
    )


@query(
    "text_stats",
    oracle="""
    WITH t AS (SELECT doc_id, lang, source, length(text) AS n_chars_real,
                      string_split(text, ' ') AS toks
               FROM documents)
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars_real) AS DOUBLE) / COUNT(*) AS avg_chars,
           CAST(SUM(len(toks)) AS DOUBLE) / COUNT(*) AS avg_tokens,
           MIN(len(toks)) AS min_tokens, MAX(len(toks)) AS max_tokens
    FROM t GROUP BY lang, source
    """,
)
def text_stats(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    t = d.select(
        "lang", "source", F.length("text").alias("n_chars_real"), F.size(toks).alias("n_toks")
    )
    return t.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        (F.sum("n_chars_real").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        (F.sum("n_toks").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        F.min("n_toks").alias("min_tokens"),
        F.max("n_toks").alias("max_tokens"),
    )


@query(
    "text_ngrams",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
               WHERE text IS NOT NULL)
    SELECT doc_id,
           array_to_string(list_transform(range(1, GREATEST(len(toks), 1)),
                          i -> toks[i] || ' ' || toks[i + 1]), '|') AS bigrams,
           GREATEST(len(toks) - 1, 0) AS n_bigrams
    FROM t
    """,
)
def text_ngrams(spark, sf_dir):
    """Bigram list stringified with '|' (grams contain spaces) for the
    harness canonicalizer; raw-array word_ngrams covered by pytest."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())  # NULL-text contract (r8 null audit): drop at ingest, mirrored in oracle
    toks = F.split(F.col("text"), " ")
    grams = word_ngrams(toks, 2)
    return d.select(
        "doc_id",
        F.concat_ws("|", grams).alias("bigrams"),
        F.size(grams).alias("n_bigrams"),
    )


@query(
    "text_tf",
    oracle="""
    SELECT doc_id, tok AS term, COUNT(*) AS tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY doc_id, tok
    """,
)
def text_tf(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


@query(
    "text_tfidf",
    oracle="""
    WITH tf AS (
        SELECT doc_id, tok AS term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY doc_id, tok
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.term, tf.tf,
           ROUND(LN((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0, 6) AS idf,
           ROUND(tf.tf * (ROUND(LN((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0, 6)), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    """,
)
def text_tfidf(spark, sf_dir):
    """TF-IDF as pure DataFrame algebra: the document-frequency table is
    vocabulary-sized -> broadcast joined back onto the (doc, term) pairs."""
    d = load(spark, sf_dir, "documents")
    n_docs = d.count()  # scalar; at scale use a captured agg, still tiny
    tf = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.round(F.log((n_docs + 1.0) / (F.col("df") + 1.0)) + 1.0, 6)
    return (
        tf.join(F.broadcast(df.withColumn("idf", idf)), "term")
        .select(
            "doc_id",
            "term",
            "tf",
            "idf",
            F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
        )
    )


@query(
    "text_keyword_filter",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(list_distinct(list_filter(toks, x -> x IN ('fast', 'merge', 'scan')))) AS pos_hits,
           len(list_distinct(list_filter(toks, x -> x IN ('lock', 'error', 'slow')))) AS neg_hits,
           len(list_distinct(list_filter(toks, x -> x IN ('fast', 'merge', 'scan'))))
             - len(list_distinct(list_filter(toks, x -> x IN ('lock', 'error', 'slow')))) AS sentiment
    FROM t
    WHERE len(list_filter(toks, x -> x IN ('fast', 'merge', 'scan', 'lock', 'error', 'slow'))) > 0
    """,
)
def text_keyword_filter(spark, sf_dir):
    """Lexicon-hit scoring (EDBT-2016 sentiment shape): distinct lexicon
    matches per doc via array_intersect — a broadcast-free set op."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    pos = F.array([F.lit(w) for w in ("fast", "merge", "scan")])
    neg = F.array([F.lit(w) for w in ("lock", "error", "slow")])
    pos_hits = F.size(F.array_intersect(toks, pos))
    neg_hits = F.size(F.array_intersect(toks, neg))
    return (
        d.select(
            "doc_id",
            pos_hits.alias("pos_hits"),
            neg_hits.alias("neg_hits"),
            (pos_hits - neg_hits).alias("sentiment"),
        )
        .filter((F.col("pos_hits") + F.col("neg_hits")) > 0)
    )


@query(
    "text_lang_id",
    oracle="""
    WITH t AS (SELECT doc_id, lang,
                      string_split(text, ' ') AS toks
               FROM documents),
    scored AS (
        SELECT doc_id, lang,
               len(list_filter(toks, x -> x IN ('table', 'scan', 'join', 'merge'))) AS en_score,
               len(list_filter(toks, x -> x IN ('fila', 'tabla', 'datos'))) AS es_score
        FROM t)
    SELECT doc_id, lang,
           CASE WHEN en_score >= es_score THEN 'en-ish' ELSE 'es-ish' END AS guessed,
           en_score, es_score
    FROM scored
    """,
)
def text_lang_id(spark, sf_dir):
    """n-gram/stopword-overlap language-ID heuristic. The fixture corpus
    is synthetic English-ish DB words, so the 'model' is two tiny keyword
    profiles — the operator shape (profile hit-count -> argmax) is what
    matters; real profiles plug into the same pipeline."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    en = F.size(F.filter(toks, lambda x: x.isin("table", "scan", "join", "merge")))
    es = F.size(F.filter(toks, lambda x: x.isin("fila", "tabla", "datos")))
    return d.select(
        "doc_id",
        "lang",
        F.when(en >= es, "en-ish").otherwise("es-ish").alias("guessed"),
        en.alias("en_score"),
        es.alias("es_score"),
    )


@query(
    "text_quality",
    oracle="""
    WITH t AS (SELECT doc_id, text,
                      string_split(trim(regexp_replace(regexp_replace(lower(text),
                          '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
               FROM documents WHERE text IS NOT NULL)
    SELECT doc_id,
           ROUND((CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1 ELSE 0 END) * 0.4
           + (CASE WHEN length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                        * 1.0 / GREATEST(length(text), 1) > 0.6
                   THEN 1 ELSE 0 END) * 0.3
           + (CASE WHEN len(list_filter(toks,
                       x -> x IN ('the', 'and', 'of', 'to', 'a'))) > 0
                   THEN 1 ELSE 0 END) * 0.3, 4) AS quality
    FROM t
    """,
)
def text_quality(spark, sf_dir):
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())  # NULL-text contract (r8 null audit): drop at ingest, mirrored in oracle
    toks = tokenize(F.col("text"))
    return d.select(
        "doc_id", F.round(quality_score(F.col("text"), toks), 4).alias("quality")
    )


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n]')) AS n_bpe_ish,
           len(string_split(text, ' ')) AS n_ws
    FROM documents
    """,
)
def text_token_count(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_bpe_ish(F.col("text")).alias("n_bpe_ish"),
        F.size(F.split(F.col("text"), " ")).alias("n_ws"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(list_aggregate(list_sort(list_distinct(string_split(text, ' '))),
                              'string_agg', ' ')) AS fingerprint
    FROM documents WHERE text IS NOT NULL
    """,
)
def text_fingerprint(spark, sf_dir):
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token set — robust to token reordering (the 'document
    fingerprinting' archetype; rolling-hash variants live in dedup)."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())  # NULL-text contract (r8 null audit): drop at ingest, mirrored in oracle
    toks = F.sort_array(F.array_distinct(F.split(F.col("text"), " ")))
    return d.select(
        "doc_id", F.md5(F.concat_ws(" ", toks)).alias("fingerprint")
    )


_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)
_QUALITY_SQL = """
    ROUND((CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1 ELSE 0 END) * 0.4
    + (CASE WHEN length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                 * 1.0 / GREATEST(length(text), 1) > 0.6 THEN 1 ELSE 0 END) * 0.3
    + (CASE WHEN len(list_filter(toks, x -> x IN ('the', 'and', 'of', 'to', 'a'))) > 0
            THEN 1 ELSE 0 END) * 0.3, 4)
"""


@query(
    "pipeline_llm_prep",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, source, text, {_NORM_SQL} AS norm FROM documents),
    s AS (SELECT doc_id, lang, source, norm, string_split(norm, ' ') AS toks, text FROM t),
    sc AS (SELECT doc_id, lang, source, norm, toks, {_QUALITY_SQL} AS quality FROM s),
    f AS (SELECT * FROM sc WHERE quality >= 0.5),
    dd AS (SELECT * FROM (
              SELECT f.*, ROW_NUMBER() OVER (PARTITION BY sha256(norm)
                                             ORDER BY doc_id) AS rn FROM f
           ) WHERE rn = 1),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, GREATEST(len(toks) - 1, 1)),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
           FROM dd),
    sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    dups AS (
        SELECT DISTINCT id_b
        FROM inter JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
        WHERE n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter) >= 0.6),
    kept AS (SELECT * FROM dd WHERE doc_id NOT IN (SELECT id_b FROM dups))
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(CAST(quality AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*), 6)
             AS avg_quality
    FROM kept GROUP BY lang, source
    """,
)
def pipeline_llm_prep(spark, sf_dir):
    """End-to-end LLM training-data prep, composed from the catalogued
    stages: normalize -> quality-score -> filter -> exact dedup (keep
    min doc_id per normalized-content hash) -> MinHash+LSH near-dup
    drop (any doc that is the higher-id member of a Jaccard>=0.6
    trigram pair over normalized text is removed — the keep-first LSH
    policy; operators/minhash.py) -> per-(lang, source) corpus summary.
    One registered op proving the stages COMPOSE into the pipeline a
    100 TB data-prep job actually runs: every stage is Catalyst
    algebra — candidate generation is the banded equi-join, never a
    cross join. The oracle replays the near-dup stage as all-pairs
    exact Jaccard (LSH at b=32/r=2 misses a J>=0.6 pair with p<1e-6,
    so the sets agree — same argument as dedup_minhash_lsh)."""
    d = load(spark, sf_dir, "documents")
    norm = normalize(F.col("text"))
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        norm.alias("norm"),
        F.round(quality_score(F.col("text"), tokenize(F.col("text"))), 4).alias("quality"),
    ).filter(F.col("quality") >= 0.5)
    # keep-first = MIN(struct(doc_id, <row>)) per content hash: map-side
    # combinable (dedup_paragraph's documented skew-safe shape), so a
    # 10^6-way boilerplate cluster never sorts inside one window task.
    # doc_id leads the struct and is unique, so MIN picks the min-id
    # row. toks is DERIVED (split of norm) and re-materialized after
    # the agg — carrying it through would double the struct payload
    # the partial aggregation hashes and shuffles (measured +35% on
    # the stage at sf0.1 for zero information).
    deduped = (
        scored.groupBy(F.sha2(F.col("norm"), 256).alias("content_sha"))
        .agg(
            F.min(
                F.struct("doc_id", "lang", "source", "norm", "quality")
            ).alias("keep")
        )
        .select("keep.*")
        # feeds the minhash DAG (shingles) AND the final anti-join +
        # summary: materialize once instead of re-running the agg.
        # toks stays OUT of the checkpoint too (r16): it is split(norm)
        # — materializing the token array would roughly double the
        # checkpointed block bytes for a column the summary only needs
        # the SIZE of (same §2.2 payload argument as keeping it out of
        # the dedup agg struct).
        .localCheckpoint(eager=False)
    )
    near_pairs = minhash_dedup_pairs(
        deduped.select("doc_id", "norm"), "doc_id", "norm", n=3, threshold=0.6
    )
    # no distinct: left_anti semantics ("no match exists") are
    # identical on a duplicated right side, and the id set is
    # broadcast-hashed anyway — the distinct only bought an extra
    # exchange + aggregate stage on the critical path (r16, §2.4
    # "a distinct on data that is already unique" — here, a distinct
    # whose uniqueness the consumer never needed).
    dup_ids = near_pairs.select(F.col("id_b").alias("doc_id"))
    kept = deduped.join(dup_ids, "doc_id", "left_anti")
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("norm"), " "))).alias("total_tokens"),
        F.round(
            F.sum(F.col("quality").cast("decimal(30,4)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_quality"),
    )


@query(
    "text_zipf_slope",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    vf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
           FROM tok GROUP BY tok),
    top AS (SELECT tok, f FROM vf ORDER BY f DESC, tok LIMIT 500),
    rk AS (
        SELECT f, CAST(ROW_NUMBER() OVER (ORDER BY f DESC, tok) AS BIGINT)
                    AS r
        FROM top),
    t AS (
        SELECT CAST(ROUND(LN(CAST(r AS DOUBLE)), 8) AS DECIMAL(28,8)) AS lx,
               CAST(ROUND(LN(CAST(f AS DOUBLE)), 8) AS DECIMAL(28,8)) AS ly,
               CAST(ROUND(LN(CAST(r AS DOUBLE)) * LN(CAST(r AS DOUBLE)), 8)
                    AS DECIMAL(28,8)) AS lxx,
               CAST(ROUND(LN(CAST(r AS DOUBLE)) * LN(CAST(f AS DOUBLE)), 8)
                    AS DECIMAL(28,8)) AS lxy,
               CAST(ROUND(LN(CAST(f AS DOUBLE)) * LN(CAST(f AS DOUBLE)), 8)
                    AS DECIMAL(28,8)) AS lyy
        FROM rk),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(lx) AS DOUBLE) AS sx, CAST(SUM(ly) AS DOUBLE) AS sy,
               CAST(SUM(lxx) AS DOUBLE) AS sxx,
               CAST(SUM(lxy) AS DOUBLE) AS sxy,
               CAST(SUM(lyy) AS DOUBLE) AS syy
        FROM t)
    SELECT n AS n_top,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           ROUND((sy - sx * (n * sxy - sx * sy) / (n * sxx - sx * sx)) / n, 6)
             AS zipf_intercept,
           ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM m
    """,
)
def text_zipf_slope(spark, sf_dir):
    """Zipf's-law fit over the corpus token distribution: OLS slope /
    intercept / r² of ln(freq) against ln(rank) for the top-500
    tokens — the corpus-health probe (natural text fits slope ≈ -1;
    boilerplate floods and template spam bend it) run alongside
    [text_unigram_logprob] and [quality_gopher] in curation.

    Determinism: the top-500 set and its ranks are exact ((freq DESC,
    token) with a deterministic LIMIT boundary); each log term is ONE
    IEEE tree on exact BIGINTs, rounded 8dp, decimal-summed
    (order-insensitive); slope/intercept/r² assemble from those six
    moments in one identical tree.

    Scale: one token hash agg collapses the corpus to |vocab| rows;
    the top-500 cut is a TakeOrderedAndProject (per-partition heaps);
    the regression runs on 500 rows. The corpus is touched once."""
    d = fanout(load(spark, sf_dir, "documents"), "doc_id")
    vf = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    top = vf.orderBy(F.desc("f"), F.asc("tok")).limit(500)
    rk = top.select(
        "f",
        F.row_number()
        .over(Window.orderBy(F.desc("f"), F.asc("tok")))
        .cast("long")
        .alias("r"),
    )
    lx = F.log(F.col("r").cast("double"))
    ly = F.log(F.col("f").cast("double"))

    def dterm(col):
        return F.round(col, 8).cast("decimal(28,8)")

    t = rk.select(
        dterm(lx).alias("lx"),
        dterm(ly).alias("ly"),
        dterm(lx * lx).alias("lxx"),
        dterm(lx * ly).alias("lxy"),
        dterm(ly * ly).alias("lyy"),
    )
    m = t.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lx").cast("double").alias("sx"),
        F.sum("ly").cast("double").alias("sy"),
        F.sum("lxx").cast("double").alias("sxx"),
        F.sum("lxy").cast("double").alias("sxy"),
        F.sum("lyy").cast("double").alias("syy"),
    )
    slope_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope_den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = slope_num / slope_den
    return m.select(
        F.col("n").alias("n_top"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - F.col("sx") * slope) / F.col("n"), 6).alias(
            "zipf_intercept"
        ),
        F.round(
            slope_num
            * slope_num
            / (slope_den * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))),
            6,
        ).alias("r2"),
    )


from deltasink_spark.registry import ORACLES as _ORACLES  # noqa: E402


@query(
    "eval_langid_confusion",
    oracle=f"""
    WITH li AS ({_ORACLES["text_lang_id"]}),
    cells AS (
        SELECT lang, guessed, CAST(COUNT(*) AS BIGINT) AS n
        FROM li GROUP BY lang, guessed),
    g AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN (lang = 'en') = (guessed = 'en-ish')
                             THEN n ELSE 0 END) AS BIGINT) AS n_correct
        FROM cells)
    SELECT cells.lang, cells.guessed, cells.n, g.n_total,
           ROUND(CAST(g.n_correct AS DOUBLE) / g.n_total, 6) AS accuracy
    FROM cells, g
    ORDER BY cells.lang, cells.guessed
    """,
)
def eval_langid_confusion(spark, sf_dir):
    """Confusion matrix of the [text_lang_id] heuristic against the
    corpus's labeled ``lang`` column, with global accuracy on every
    row — the classifier-QA readout run before trusting any heuristic
    gate in a curation pipeline. The prediction CTE embeds
    text_lang_id's registered oracle verbatim (the [rank_fusion_rrf]
    pattern), so the eval can never drift from the op it scores.

    Scale: the classifier is the scan-shaped op being evaluated; the
    eval itself is one hash agg to |langs|x|guesses| cells and a
    broadcast of the 2-number global frame."""
    li = text_lang_id(spark, sf_dir)
    cells = li.groupBy("lang", "guessed").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    correct = (F.col("lang") == "en") == (F.col("guessed") == "en-ish")
    g = cells.groupBy().agg(
        F.sum("n").cast("long").alias("n_total"),
        F.sum(F.when(correct, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_correct"),
    )
    return (
        cells.join(F.broadcast(g))
        .select(
            "lang",
            "guessed",
            "n",
            "n_total",
            F.round(
                F.col("n_correct").cast("double") / F.col("n_total"), 6
            ).alias("accuracy"),
        )
        .orderBy("lang", "guessed")
    )
