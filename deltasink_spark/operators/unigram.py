"""Unigram-LM (SentencePiece-style) tokenizer training — Kudo 2018,
"Subword Regularization", the OTHER mainstream tokenizer-training
algorithm next to BPE (trainprep.py): seed a large candidate vocabulary
from substring counts, then alternate (Viterbi-segment the corpus under
current piece log-probs) / (re-estimate log-probs from segment counts,
prune unused pieces) — hard-EM, the deterministic variant of the
forward-backward EM SentencePiece runs, chosen here because every step
is exactly mirrorable in SQL (the differential-oracle requirement).

Everything is VOCABULARY-COLLAPSED: training runs on the distinct-word
frame with frequencies (two hash aggs away from the corpus), never on
the corpus itself — the same scale design as the BPE trainer
(trainprep.py::_bpe_iterate): at 100 TB the word vocab is millions of
rows where the corpus is trillions, and the corpus is touched exactly
once (word count) at train time plus once at encode time (a piece-count
equi-join of the exploded token stream against the trained vocab).

Viterbi DP, engine-portably: best segmentation of word w under piece
log-probs lp is best[i] = max over j in [i-4, i) of (best[j].score +
lp(substr(w, j+1, i-j))) — pieces are at most _MAXPIECE chars, so
position i depends only on the previous _MAXPIECE positions, and the
DP unrolls into a FIXED chain of _MAXLEN levels (words longer than
_MAXLEN are excluded from training by contract — the fixture max is 8).
Each level is one join of the candidate frame against the piece table
plus one per-word argmax window; the Spark plan and the DuckDB oracle
CTE chain are generated from THE SAME constants and level structure in
this module, the hilbert-curve precedent (relational.py) for keeping
unrolled iterative algebra from drifting between engines.

Determinism contract (the oracle requirement):
- piece log-prob lp = round(ln(c+1), 6) - round(ln(T+V), 6): each
  irrational ln rounds at 6 dp (the libm last-ulp rule learned on
  text_kneser_ney_bigram), the difference and all path sums are then
  plain IEEE doubles added in ONE order (left-to-right along the
  segmentation), identical in both engines;
- argmax tie-break: (score DESC, n_pieces ASC, seg ASC) — total order,
  row_number()=1 in both engines;
- add-one smoothing keeps every single character usable (ln(0) never
  occurs), so every word is always segmentable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAXLEN = 12  # words longer than this are excluded from training
MAXPIECE = 4  # max piece length (DP lookback window)
TOPK_MULTI = 200  # multi-char seed pieces kept (by count desc, piece asc)
EM_ROUNDS = 2  # hard-EM iterations


# --- words ------------------------------------------------------------------


def words_frame(docs: DataFrame) -> DataFrame:
    """(word, wf, n): distinct words with frequencies and lengths —
    the vocabulary-collapsed training input."""
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter((F.col("word") != "") & (F.length("word") <= MAXLEN))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wf"))
        .withColumn("n", F.length("word").cast("int"))
    )


SQL_WORDS_CTE = f"""words AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS wf, LEN(word) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
    WHERE word <> '' AND LEN(word) <= {MAXLEN}
    GROUP BY word
)"""


# --- seed vocabulary ----------------------------------------------------------


def seed_pieces(words: DataFrame) -> DataFrame:
    """(piece, cnt): every substring of length 1..MAXPIECE, counted
    with word frequency; ALL single chars + the TOPK_MULTI most
    frequent multi-char pieces survive (count desc, piece asc)."""
    sub = (
        words.select(
            "wf",
            F.explode(F.expr(f"sequence(1, least({MAXPIECE}, n))")).alias("l"),
            F.col("word"),
            F.col("n"),
        )
        .select(
            "wf",
            "l",
            F.explode(F.expr("sequence(1, n - l + 1)")).alias("s"),
            "word",
        )
        .select(F.expr("substr(word, s, l)").alias("piece"), "wf", "l")
    )
    cnt = sub.groupBy("piece", "l").agg(F.sum("wf").cast("long").alias("cnt"))
    singles = cnt.filter(F.col("l") == 1).select("piece", "cnt")
    multi = (
        cnt.filter(F.col("l") > 1)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(TOPK_MULTI)
        .select("piece", "cnt")
    )
    return singles.unionByName(multi)


SQL_SEED_CTE = f"""sub AS (
    SELECT substr(word, u.s + 1, v.l + 1) AS piece, wf, v.l + 1 AS l
    FROM words,
         UNNEST(range(0, {MAXPIECE})) AS v(l),
         UNNEST(range(0, {MAXLEN})) AS u(s)
    WHERE v.l + 1 <= n AND u.s + v.l + 1 <= n
),
cnt AS (
    SELECT piece, l, CAST(SUM(wf) AS BIGINT) AS cnt FROM sub GROUP BY piece, l
),
seed AS (
    SELECT piece, cnt FROM cnt WHERE l = 1
    UNION ALL
    SELECT piece, cnt FROM (
        SELECT piece, cnt FROM cnt WHERE l > 1
        ORDER BY cnt DESC, piece ASC LIMIT {TOPK_MULTI})
)"""


# --- piece log-probs ------------------------------------------------------------


def pieces_with_lp(counted: DataFrame) -> DataFrame:
    """(piece, cnt, lp) with lp = round(ln(cnt+1), 6) -
    round(ln(T+V), 6) — add-one smoothed, each ln rounded at 6 dp."""
    tot = counted.agg(
        F.sum("cnt").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    return counted.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        (
            F.round(F.log(F.col("cnt") + 1), 6)
            - F.round(F.log(F.col("t") + F.col("v")), 6)
        ).alias("lp"),
    )


def sql_lp_cte(name: str, src: str) -> str:
    return f"""{name} AS (
    SELECT piece, cnt,
           ROUND(LN(cnt + 1), 6) - ROUND(LN(t + v), 6) AS lp
    FROM {src}, (SELECT CAST(SUM(cnt) AS BIGINT) AS t,
                        CAST(COUNT(*) AS BIGINT) AS v FROM {src}) tv
)"""


# --- Viterbi DP -----------------------------------------------------------------


def viterbi_best(words: DataFrame, pieces: DataFrame) -> DataFrame:
    """(word, wf, seg): the argmax segmentation of every word under
    the piece table — the fixed-depth unrolled DP (module docstring).
    ``pieces`` must contain every single char of the words (guaranteed
    by seeding + add-one smoothing keeping singles), so best[n] always
    exists."""
    p = F.broadcast(pieces.select("piece", "lp"))
    # level frames: best[i] rows (word, wf, n, score, np, seg)
    levels: list[DataFrame] = [
        words.select(
            "word",
            "wf",
            "n",
            F.lit(0.0).alias("score"),
            F.lit(0).cast("int").alias("np"),
            F.lit("").alias("seg"),
        ).withColumn("i", F.lit(0).cast("int"))
    ]
    for i in range(1, MAXLEN + 1):
        cands = None
        for j in range(max(0, i - MAXPIECE), i):
            c = (
                levels[j]
                .filter(F.col("n") >= i)
                .select(
                    "word",
                    "wf",
                    "n",
                    F.expr(f"substr(word, {j + 1}, {i - j})").alias("piece"),
                    "score",
                    "np",
                    "seg",
                )
            )
            cands = c if cands is None else cands.unionByName(c)
        scored = cands.join(p, "piece").select(
            "word",
            "wf",
            "n",
            (F.col("score") + F.col("lp")).alias("score"),
            (F.col("np") + 1).alias("np"),
            F.when(F.col("seg") == "", F.col("piece"))
            .otherwise(F.concat(F.col("seg"), F.lit(" "), F.col("piece")))
            .alias("seg"),
        )
        from pyspark.sql import Window

        win = Window.partitionBy("word").orderBy(
            F.desc("score"), F.asc("np"), F.asc("seg")
        )
        best = (
            scored.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
            .drop("rn")
            .withColumn("i", F.lit(i).cast("int"))
        )
        levels.append(best.localCheckpoint(eager=False))
    done = levels[1]
    for lv in levels[2:]:
        done = done.unionByName(lv)
    return done.filter(F.col("i") == F.col("n")).select("word", "wf", "seg")


def sql_viterbi_chain(prefix: str, pieces_cte: str) -> str:
    """The DuckDB mirror of viterbi_best: MATERIALIZED CTE chain
    {prefix}0..{prefix}{MAXLEN} (multi-referenced CTEs inline
    exponentially otherwise — the kcore lesson), ending in
    {prefix}best(word, wf, seg)."""
    parts = [
        f"""{prefix}0 AS MATERIALIZED (
    SELECT word, wf, n, CAST(0.0 AS DOUBLE) AS score,
           0 AS np, '' AS seg, 0 AS i FROM words
)"""
    ]
    for i in range(1, MAXLEN + 1):
        cand_selects = []
        for j in range(max(0, i - MAXPIECE), i):
            cand_selects.append(
                f"""SELECT word, wf, n,
           substr(word, {j + 1}, {i - j}) AS piece, score, np, seg
    FROM {prefix}{j} WHERE n >= {i}"""
            )
        cands = "\n    UNION ALL\n    ".join(cand_selects)
        parts.append(
            f"""{prefix}{i} AS MATERIALIZED (
    SELECT word, wf, n, score, np, seg, {i} AS i FROM (
        SELECT c.word, c.wf, c.n,
               c.score + p.lp AS score,
               c.np + 1 AS np,
               CASE WHEN c.seg = '' THEN c.piece
                    ELSE c.seg || ' ' || c.piece END AS seg,
               ROW_NUMBER() OVER (
                   PARTITION BY c.word
                   ORDER BY c.score + p.lp DESC, c.np + 1 ASC,
                            CASE WHEN c.seg = '' THEN c.piece
                                 ELSE c.seg || ' ' || c.piece END ASC
               ) AS rn
        FROM ({cands}) c JOIN {pieces_cte} p USING (piece)
    ) WHERE rn = 1
)"""
        )
    finals = "\n    UNION ALL\n    ".join(
        f"SELECT word, wf, seg FROM {prefix}{i} WHERE n = {i}"
        for i in range(1, MAXLEN + 1)
    )
    parts.append(f"""{prefix}best AS MATERIALIZED (
    {finals}
)""")
    return ",\n".join(parts)


# --- EM round: counts from segmentations ----------------------------------------


def em_counts(best: DataFrame, prev_pieces: DataFrame) -> DataFrame:
    """(piece, cnt) re-estimated from the Viterbi segmentations:
    cnt = sum of wf over occurrences in best segs. Pieces UNUSED by
    every segmentation are PRUNED — except single chars, which stay
    (at zero) so coverage is never lost; that is SentencePiece's
    prune-with-character-floor rule."""
    used = (
        best.select("wf", F.explode(F.split(F.col("seg"), " ")).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wf").cast("long").alias("cnt"))
    )
    singles = (
        prev_pieces.filter(F.length("piece") == 1)
        .select("piece")
        .join(used, "piece", "left_anti")
        .select("piece", F.lit(0).cast("long").alias("cnt"))
    )
    return used.unionByName(singles)


def sql_em_counts_cte(name: str, best_cte: str, prev_pieces_cte: str) -> str:
    return f"""{name}_used AS (
    SELECT piece, CAST(SUM(wf) AS BIGINT) AS cnt
    FROM (SELECT wf, unnest(string_split(seg, ' ')) AS piece FROM {best_cte}) t
    GROUP BY piece
),
{name} AS (
    SELECT piece, cnt FROM {name}_used
    UNION ALL
    SELECT p.piece, CAST(0 AS BIGINT) AS cnt
    FROM {prev_pieces_cte} p
    WHERE LEN(p.piece) = 1
      AND p.piece NOT IN (SELECT piece FROM {name}_used)
)"""


# --- full training (memoized) -----------------------------------------------------


_UG_CACHE: dict = {}


def unigram_train_cached(spark, sf_dir: str):
    """Returns (final_pieces_with_lp, final_best) after EM_ROUNDS of
    hard EM, memoized per (applicationId, sf_dir) — the
    train-once/consume-many shape (_BPE_CACHE precedent); consumers:
    tokenizer_unigram_train, tokenizer_unigram_encode."""
    from deltasink_spark.tables import load

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _UG_CACHE.get(key)
    if got is not None:
        return got
    # eager: multi-consumer cached frames; r15 A/B measured lazy
    # checkpoints slower per consumer action (see minhash_pairs_cached)
    words = words_frame(load(spark, sf_dir, "documents")).localCheckpoint()
    pieces = pieces_with_lp(seed_pieces(words)).localCheckpoint()
    best = None
    for _ in range(EM_ROUNDS):
        best = viterbi_best(words, pieces).localCheckpoint()
        pieces = pieces_with_lp(em_counts(best, pieces)).localCheckpoint()
    _UG_CACHE[key] = (pieces, best)
    return pieces, best


def sql_train_ctes() -> str:
    """The full oracle CTE prelude mirroring unigram_train_cached:
    words -> seed -> lp0 -> v1-chain -> counts1 -> lp1 -> v2-chain ->
    counts2 -> lp2 (the final piece table), plus v2best (the final
    segmentations)."""
    assert EM_ROUNDS == 2, "oracle chain is generated for exactly 2 rounds"
    return ",\n".join(
        [
            SQL_WORDS_CTE,
            SQL_SEED_CTE,
            sql_lp_cte("lp0", "seed"),
            sql_viterbi_chain("v1_", "lp0"),
            sql_em_counts_cte("cnt1", "v1_best", "lp0"),
            sql_lp_cte("lp1", "cnt1"),
            sql_viterbi_chain("v2_", "lp1"),
            sql_em_counts_cte("cnt2", "v2_best", "lp1"),
            sql_lp_cte("lp2", "cnt2"),
        ]
    )
