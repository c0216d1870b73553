"""Text-pipeline building blocks (SURVEY.md §2.11) — pure Catalyst
column expressions, reused by both the batch queries and the streaming
document pipeline. No Python UDFs anywhere on these paths: at 100 TB
every one of these runs inside whole-stage codegen next to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize(col: Column) -> Column:
    """lowercase, strip non-alphanumerics, collapse whitespace."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, r" +", " ")
    return F.trim(c)


def tokenize(col: Column) -> Column:
    """normalized text -> array<string> tokens (whitespace split)."""
    return F.split(normalize(col), " ")


def word_ngrams(tokens: Column, n: int) -> Column:
    """Word n-grams via a generated index sequence — stays in Catalyst
    (sequence + transform + element_at), no UDF/explode needed.

    Short docs (size < n) must yield an EMPTY gram set, not a crash:
    sequence(1, 0) auto-steps DOWN to [1, 0] in Spark, and element_at
    at index 0 / past the end raises INVALID_ARRAY_INDEX_IN_ELEMENT_AT,
    so the sequence is gated behind a size check."""
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tokens, i + k) for k in range(n)]
    )
    return F.when(F.size(tokens) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def token_count_bpe_ish(col: Column) -> Column:
    """Token count under a BPE-ish regex (word pieces + digits + punct
    runs) — the standard cheap proxy for LLM token accounting."""
    pieces = F.regexp_extract_all(col, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0)
    return F.size(pieces)


def quality_score(text: Column, tokens: Column) -> Column:
    """Heuristic doc-quality score in [0,1]: length band + alpha ratio
    + stopword presence (C4/Gopher-style filters, simplified)."""
    n_tok = F.size(tokens)
    len_ok = (n_tok >= 10) & (n_tok <= 1000)
    alpha_ratio = F.length(F.regexp_replace(text, r"[^a-zA-Z]", "")) / F.greatest(
        F.length(text), F.lit(1)
    )
    stop_hits = F.size(
        F.array_intersect(tokens, F.array(*[F.lit(w) for w in ("the", "and", "of", "to", "a")]))
    )
    return (
        len_ok.cast("int") * 0.4
        + (alpha_ratio > 0.6).cast("int") * 0.3
        + (stop_hits > 0).cast("int") * 0.3
    )
