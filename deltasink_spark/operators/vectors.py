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


# --- sign-LSH (random hyperplane) bucketing ------------------------------
#
# The ANN scale path: sign(plane . v) bits -> bucket id; vectors are
# only compared within shared buckets, so the quadratic cross-join
# becomes an equi-join on (table, bucket) that Catalyst shuffles once
# (same 100 TB design move as MinHash banding). Hyperplanes are
# DETERMINISTIC +/-1 vectors from a seeded PRNG, embedded as literals
# in both the Spark expression and the DuckDB oracle SQL, so even the
# approximate path is differentially testable bit-for-bit.


def hyperplanes(dim: int, n_planes: int, seed: int = 2024) -> list[list[int]]:
    """n_planes deterministic Rademacher (+/-1) hyperplanes."""
    import random

    rng = random.Random(seed)
    return [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(n_planes)]


def bucket(iv: Column, planes: list[list[int]]) -> Column:
    """LSH bucket id of a quantized vector: bit j = sign(plane_j . iv)."""
    zero = F.lit(0).cast("long")
    bits = []
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in p])
        dot = F.aggregate(
            F.zip_with(iv, plane, lambda x, y: x * y), zero, lambda acc, x: acc + x
        )
        bits.append((dot >= 0).cast("int") * (1 << j))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def sql_bucket(iv: str, planes: list[list[int]]) -> str:
    """DuckDB mirror of bucket()."""
    terms = []
    for j, p in enumerate(planes):
        lit = "[" + ", ".join(str(v) for v in p) + "]"
        dot = f"list_sum(list_transform(list_zip({iv}, {lit}), p -> p[1] * p[2]))"
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


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
