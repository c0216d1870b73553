"""Vector math over array<float> embedding columns — pure Catalyst
higher-order functions (zip_with / aggregate), no UDFs.

Determinism contract: float arrays are cast elementwise to double, each
product is rounded once to DECIMAL(30,15), and the sum runs in exact
decimal — so the result is independent of summation order and matches
the DuckDB oracle (which mirrors the same expression) bit-for-bit.
The final divisions/sqrt are single IEEE double ops, also deterministic.

At scale: these expressions run inside whole-stage codegen per row.
The quadratic part of similarity work (which PAIRS to score) is the
job of LSH banding / blocking (see queries/dedup.py) — scoring itself
stays linear in pairs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,15)"


def dot_exact(a: Column, b: Column) -> Column:
    """Order-insensitive exact dot product -> double."""
    prods = F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(DEC))
    s = F.aggregate(prods, F.lit(0).cast(DEC), lambda acc, x: (acc + x).cast(DEC))
    return s.cast("double")


def norm_exact(a: Column) -> Column:
    """L2 norm via exact-decimal sum of squares -> double."""
    sq = F.transform(a, lambda x: (x.cast("double") * x.cast("double")).cast(DEC))
    s = F.aggregate(sq, F.lit(0).cast(DEC), lambda acc, x: (acc + x).cast(DEC))
    return F.sqrt(s.cast("double"))


def cosine(a: Column, b: Column, scale: int = 6) -> Column:
    """Rounded cosine similarity (deterministic across engines)."""
    return F.round(dot_exact(a, b) / (norm_exact(a) * norm_exact(b)), scale)


# --- fixed-point variants (the fast path for pairwise stages) -----------
#
# Quantize each vector ONCE per row to longs (scale 1e8; |x| <= ~1 and
# dim 64 keep the dot far below 2^63), then every pairwise dot is pure
# long arithmetic: exact, associative, order-insensitive, and ~3x
# faster than the decimal accumulator inside a BNLJ pair loop. Both
# engines quantize with the identical expression, so results still
# hash-match bit-for-bit.

QSCALE = 100_000_000


def quantized(a: Column) -> Column:
    """array<float|double> -> array<long> at scale QSCALE."""
    return F.transform(a, lambda x: F.round(x.cast("double") * QSCALE).cast("long"))


def qdot(ia: Column, ib: Column) -> Column:
    """Exact long dot of two quantized vectors -> double."""
    zero = F.lit(0).cast("long")
    return F.aggregate(
        F.zip_with(ia, ib, lambda x, y: x * y), zero, lambda acc, x: acc + x
    ).cast("double")


def qnorm(ia: Column) -> Column:
    """L2 norm of a quantized vector -> double."""
    zero = F.lit(0).cast("long")
    return F.sqrt(
        F.aggregate(F.transform(ia, lambda x: x * x), zero, lambda acc, x: acc + x).cast(
            "double"
        )
    )


def sql_quantized(a: str) -> str:
    return f"list_transform({a}, x -> CAST(ROUND(CAST(x AS DOUBLE) * {QSCALE}) AS BIGINT))"


def sql_qdot(ia: str, ib: str) -> str:
    return f"CAST(list_sum(list_transform(list_zip({ia}, {ib}), p -> p[1] * p[2])) AS DOUBLE)"


def sql_qnorm(ia: str) -> str:
    return f"SQRT(CAST(list_sum(list_transform({ia}, x -> x * x)) AS DOUBLE))"


# --- DuckDB oracle SQL mirrors (same expression, same rounding) ---------


def sql_dot_exact(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"x -> CAST(CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE) AS DECIMAL(30,15)))) AS DOUBLE)"
    )


def sql_norm_exact(a: str) -> str:
    return (
        f"SQRT(CAST(list_sum(list_transform({a}, "
        f"x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(30,15)))) AS DOUBLE))"
    )


def sql_cosine(a: str, b: str, scale: int = 6) -> str:
    return f"ROUND({sql_dot_exact(a, b)} / ({sql_norm_exact(a)} * {sql_norm_exact(b)}), {scale})"
