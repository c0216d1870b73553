"""WordPiece tokenizer training — Schuster & Nakajima 2012, the
BERT-family trainer and the third mainstream subword algorithm next to
BPE (trainprep.py::_bpe_iterate) and unigram-LM (operators/unigram.py).

WordPiece is greedy merging like BPE, but the merge selection is a
LIKELIHOOD-RATIO, not a raw count: the pair (a, b) maximizing

    score = ln count(ab) - ln count(a) - ln count(b)

(the increase in corpus unigram log-likelihood from fusing a+b into one
symbol, up to constants). Non-initial symbols carry the canonical `##`
continuation prefix; a merged symbol keeps the LEFT symbol's prefix
status (`c ##a -> ca`, `##a ##t -> ##at`). The rewrite is a TOKEN-EXACT
string replace via the doubled-space sentinel: the symbol string's
separators are doubled (every token then owns a full delimiter on each
side), the pair is matched as ` left  right ` — so a bare pair like
`a ##b` can never fuse inside `##a ##b` (whose `##a` merely ENDS with
`a`), and adjacent occurrences never share a delimiter — then the
doubled gaps collapse back and the edges trim. Plain substring replace
on the raw symbol string would cross token boundaries (a continuation
symbol's suffix matches a bare symbol), fusing pairs that were never
selected or counted.

Everything is VOCABULARY-COLLAPSED like the sibling trainers: the K
merge rounds run on the distinct-word frame with frequencies (one hash
agg from the corpus); each round is pair/symbol hash aggs + a
deterministic top-1 + one broadcast string-replace — never a corpus
pass. At 100 TB the word vocab is millions of rows where the corpus is
trillions.

Determinism contract (the exact-oracle requirement):
- each irrational ln rounds at 6 dp (the libm last-ulp rule learned on
  text_kneser_ney_bigram); the score is then three IEEE doubles
  combined in one fixed order — identical in Spark and DuckDB;
- top-1 tie-break (score DESC, pair ASC) is a total order;
- the merge rewrite is sentinel-delimited replace() on the
  space-joined symbol string — token-exact at EVERY stage (not just
  single-character symbols) and byte-identical in both engines
  (replace scans left-to-right non-overlapping in Spark and DuckDB
  alike, which is exactly greedy WordPiece's in-word merge order).

The Spark plan and the DuckDB oracle CTE chain are generated from THE
SAME constants in this module (the hilbert/unigram shared-generator
move), so the unrolled iterative algebra cannot drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WP_STEPS = 8  # greedy merge rounds (production: ~30k vocab entries)


def words_wp(docs: DataFrame) -> DataFrame:
    """(word, wf, sym): distinct words with frequencies, symbols
    initialized to WordPiece form — bare first char, `##`-prefixed
    continuations (`cat` -> `c ##a ##t`)."""
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wf"))
        .select(
            "word",
            "wf",
            F.concat(
                F.expr("substr(word, 1, 1)"),
                F.when(
                    F.length("word") > 1,
                    F.concat(
                        F.lit(" ##"),
                        F.expr(
                            "array_join(split(substr(word, 2), ''), ' ##')"
                        ),
                    ),
                ).otherwise(F.lit("")),
            ).alias("sym"),
        )
    )


SQL_WORDS_WP_CTE = """w AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    wf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS wf FROM w
           WHERE word <> '' GROUP BY word),
    s0 AS (SELECT word, wf,
                  substr(word, 1, 1) ||
                  CASE WHEN LEN(word) > 1
                       THEN ' ##' || array_to_string(
                                string_split(substr(word, 2), ''), ' ##')
                       ELSE '' END AS sym
           FROM wf)"""


def wp_step(vocab: DataFrame):
    """One WordPiece merge round over (word, wf, sym): returns
    (merged_frame, record_frame) — merged carries new_sym, record is
    the per-step artifact row (merged_pair, pair_count, score,
    n_affected)."""
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
    pc = pairs.groupBy("pair").agg(F.sum("wf").cast("long").alias("pcnt"))
    sc = (
        vocab.select("wf", F.explode(syms).alias("s"))
        .groupBy("s")
        .agg(F.sum("wf").cast("long").alias("scnt"))
    )
    sa = sc.select(F.col("s").alias("a"), F.col("scnt").alias("acnt"))
    sb = sc.select(F.col("s").alias("b"), F.col("scnt").alias("bcnt"))
    scored = (
        pc.withColumn("a", F.expr("split(pair, ' ')[0]"))
        .withColumn("b", F.expr("split(pair, ' ')[1]"))
        .join(sa, "a")
        .join(sb, "b")
        .select(
            "pair",
            "pcnt",
            (
                F.round(F.log("pcnt"), 6)
                - F.round(F.log("acnt"), 6)
                - F.round(F.log("bcnt"), 6)
            ).alias("score"),
        )
    )
    top = (
        scored.orderBy(F.desc("score"), F.asc("pair"))
        .limit(1)
        .select(
            F.col("pair").alias("merged_pair"),
            F.col("pcnt").cast("long").alias("pair_count"),
            F.col("score"),
        )
    )
    # token-exact fuse via the doubled-space sentinel: doubling the
    # separators gives every token a full delimiter on each side, so
    # the pair key ` left  right ` only ever matches whole tokens and
    # adjacent occurrences never share a delimiter; the doubled gaps
    # then collapse and the edges trim
    fused = F.replace(F.col("merged_pair"), F.lit(" ##"), F.lit(""))
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
    merged = vocab.crossJoin(F.broadcast(top)).select(
        "word",
        "wf",
        "merged_pair",
        "pair_count",
        "score",
        F.trim(
            F.replace(
                F.replace(
                    sym2, pair2, F.concat(F.lit(" "), fused, F.lit(" "))
                ),
                F.lit("  "),
                F.lit(" "),
            )
        ).alias("new_sym"),
        "sym",
    )
    record = merged.groupBy("merged_pair", "pair_count", "score").agg(
        F.sum(F.when(F.col("new_sym") != F.col("sym"), 1).otherwise(0))
        .cast("long")
        .alias("n_affected")
    )
    return merged, record


def sql_wp_chain() -> str:
    """DuckDB CTE chain replaying the K WordPiece rounds — generated
    from the same constants as wp_step (MATERIALIZED: multi-referenced
    CTEs inline exponentially otherwise, the kcore lesson)."""
    blocks = [SQL_WORDS_WP_CTE]
    for k in range(1, WP_STEPS + 1):
        j = k - 1
        blocks.append(f"""ch{k} AS MATERIALIZED (
        SELECT word, wf, sym, string_split(sym, ' ') AS l FROM s{j}),
    pc{k} AS (SELECT l[u.i] || ' ' || l[u.i + 1] AS pair,
                     CAST(SUM(wf) AS BIGINT) AS pcnt
              FROM ch{k}, UNNEST(range(1, len(l))) AS u(i) GROUP BY 1),
    sc{k} AS (SELECT u.s AS s, CAST(SUM(wf) AS BIGINT) AS scnt
              FROM ch{k}, UNNEST(l) AS u(s) GROUP BY 1),
    top{k} AS (SELECT pair AS merged_pair, pcnt AS pair_count,
                      ROUND(LN(pcnt), 6)
                      - ROUND(LN(sa.scnt), 6)
                      - ROUND(LN(sb.scnt), 6) AS score
               FROM pc{k}
               JOIN sc{k} sa ON sa.s = string_split(pair, ' ')[1]
               JOIN sc{k} sb ON sb.s = string_split(pair, ' ')[2]
               ORDER BY score DESC, pair ASC LIMIT 1),
    m{k} AS MATERIALIZED (
        SELECT ch{k}.word, ch{k}.wf, top{k}.merged_pair, top{k}.pair_count,
               top{k}.score,
               trim(replace(
                   replace(' ' || replace(ch{k}.sym, ' ', '  ') || ' ',
                           ' ' || replace(top{k}.merged_pair, ' ', '  ')
                               || ' ',
                           ' ' || replace(top{k}.merged_pair, ' ##', '')
                               || ' '),
                   '  ', ' ')) AS new_sym,
               ch{k}.sym AS sym
        FROM ch{k}, top{k}),
    o{k} AS (SELECT CAST({k} AS BIGINT) AS step, merged_pair, pair_count,
                    score,
                    CAST(SUM(CASE WHEN new_sym <> sym THEN 1 ELSE 0 END)
                         AS BIGINT) AS n_affected
             FROM m{k} GROUP BY merged_pair, pair_count, score),
    s{k} AS (SELECT word, wf, new_sym AS sym FROM m{k})""")
    return ",\n    ".join(blocks)


_WP_CACHE: dict = {}


def wordpiece_train_cached(spark, sf_dir: str):
    """(per-step record frames, final vocab frame (word, wf, sym))
    after WP_STEPS greedy rounds, memoized per (applicationId, sf_dir)
    — the train-once/consume-many shape (_BPE_CACHE precedent).
    Consumers: tokenizer_wordpiece_train, tokenizer_wordpiece_encode."""
    from deltasink_spark.tables import load

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _WP_CACHE.get(key)
    if got is not None:
        return got
    # eager: multi-consumer cached frames; r15 A/B measured lazy
    # checkpoints slower per consumer action (see minhash_pairs_cached)
    vocab = words_wp(load(spark, sf_dir, "documents")).localCheckpoint()
    records = []
    for k in range(1, WP_STEPS + 1):
        merged, record = wp_step(vocab)
        merged = merged.localCheckpoint()
        records.append(
            record.select(
                F.lit(k).cast("long").alias("step"),
                "merged_pair",
                "pair_count",
                "score",
                "n_affected",
            )
        )
        vocab = merged.select("word", "wf", F.col("new_sym").alias("sym"))
    _WP_CACHE[key] = (records, vocab)
    return records, vocab
