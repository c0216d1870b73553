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
