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


def qdot_arrow() -> "object":
    """Arrow-vectorized exact long dot for PAIR-SCORING stages: same
    int64 math as qdot() (bit-identical, oracle-compatible) but one
    numpy einsum per batch instead of interpreted zip_with/aggregate
    per row — higher-order functions never enter whole-stage codegen,
    so at 10^5+ candidate pairs the HOF form costs ~1 s/100k pairs
    while the Arrow form is memory-bandwidth-bound. Returns a UDF
    (array<long>, array<long>) -> long; divide/round stays Catalyst."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import PandasUDFType, pandas_udf

    def _dot(va, vb):
        # np.vstack([]) raises on the zero-row Arrow batch an empty
        # partition can deliver
        if len(va) == 0:
            return pd.Series([], dtype=np.int64)
        a = np.vstack([np.asarray(v, dtype=np.int64) for v in va])
        b = np.vstack([np.asarray(v, dtype=np.int64) for v in vb])
        return pd.Series(np.einsum("ij,ij->i", a, b))

    # _dot is pure; the marker only stops the optimizer from cloning the
    # evaluation below a pushed-down filter on its output (one
    # ArrowEvalPython instead of two per scoring stage)
    return pandas_udf(_dot, "long", PandasUDFType.SCALAR).asNondeterministic()


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


# Target expected rows per LSH bucket. Sign-LSH bucket-mate candidate
# pairs grow as O(N^2 / 2^K) per table, so K must scale with the
# corpus: fixing K (the r5 geometry) keeps bucket occupancy — and with
# it the candidate-pair count per bucket — growing linearly with N.
TARGET_BUCKET_ROWS = 64
FLOOR_BITS = 8


def lsh_bits(expected_rows: int, floor_bits: int = FLOOR_BITS) -> int:
    """Bits (hyperplanes) per LSH table for an expected corpus size.

    Chosen so expected bucket occupancy N / 2^K stays <=
    TARGET_BUCKET_ROWS: K = max(floor, ceil(log2(N / target))). At the
    fixture scales (<= 16384 rows) this returns the floor of 8 bits —
    exactly the r5 constants — so every registered oracle stays
    bit-identical; at a 100x blow-up it grows to 12+ bits and expected
    occupancy stays bounded (property-tested in tests/test_plans.py).
    Callers registering a driver oracle must pass a FIXED expected size
    (the oracle SQL embeds the plane literals at import time); a
    production deployment passes its real corpus estimate."""
    import math

    if expected_rows <= TARGET_BUCKET_ROWS:
        return floor_bits
    return max(floor_bits, math.ceil(math.log2(expected_rows / TARGET_BUCKET_ROWS)))


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


def _lsh_signatures(planes: list[list[int]], tables: int):
    """Arrow-vectorized sign-LSH signature UDF: array<long> vector ->
    array<long> of one bucket id per hash table. Each batch is one
    int64 matmul (N x dim) @ (dim x planes) + a sign->bits fold in
    numpy. This is deliberately NOT the Catalyst HOF expression: a
    K-bit x L-table signature is ~2048 interpreted zip_with/aggregate
    ops per row (higher-order functions never enter whole-stage
    codegen) plus a multi-second analyzer cost for the 2k-literal
    expression tree — measured 3-6 s of CONSTANT overhead per query at
    any scale, vs ~0.1 s through Arrow. The math is identical exact
    int64 arithmetic (plane dot >= 0 -> bit j), so results — and the
    DuckDB oracle mirror (sql_bucket) — are unchanged bit-for-bit.
    Overflow-safe: |iv_i| <= QSCALE=1e8, dim <= 64 -> |dot| <= 6.4e9,
    far below 2^63."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import PandasUDFType, pandas_udf

    k = len(planes) // tables
    mat = np.asarray(planes, dtype=np.int64).T  # dim x (tables*k)
    weights = 1 << np.arange(k, dtype=np.int64)

    def _signatures(vs):
        # guard the zero-row Arrow batch (empty partition): vstack([])
        # raises ValueError
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        m = np.vstack([np.asarray(v, dtype=np.int64) for v in vs])
        bits = (m @ mat >= 0).astype(np.int64)  # n x (tables*k)
        # bucket ids stay int64 end-to-end: lsh_bits() can return 32+
        # bits for extreme corpora, and an int32 downcast would wrap
        # negative there, silently diverging from the sql_bucket oracle
        buckets = np.stack(
            [bits[:, t * k : (t + 1) * k] @ weights for t in range(tables)], axis=1
        )
        return pd.Series(list(buckets))

    # explicit functionType: `from __future__ import annotations` turns
    # type hints into strings pandas_udf cannot resolve.
    # _signatures is pure; nondeterministic only keeps the optimizer from
    # duplicating the matmul below the size()>0 filter posexplode infers
    return pandas_udf(_signatures, "array<long>", PandasUDFType.SCALAR).asNondeterministic()


def lsh_tall_frame(df, id_col: str, vec_col: str, planes: list[list[int]], tables: int):
    """(id, t, bucket) sign-LSH signature frame, one row per hash
    table (see _lsh_signatures for the Arrow-vectorized design)."""
    return df.select(
        F.col(id_col), _lsh_signatures(planes, tables)(F.col(vec_col)).alias("sig")
    ).select(id_col, F.posexplode("sig").alias("t", "bucket"))


def lsh_candidate_pairs(
    df,
    id_col: str,
    vec_col: str,
    planes: list[list[int]],
    tables: int,
    carry: tuple[str, ...] = (),
    distinct: bool = True,
):
    """Distinct bucket-mate (id_a < id_b) candidate pairs via sign-LSH.

    The scale path for full-table pairwise similarity: each row is
    bucketed into `tables` hash tables of len(planes)/tables bits
    (Arrow-vectorized, see lsh_tall_frame), and candidates reach
    Catalyst as a shuffled self-EQUI-join on (table, bucket) — one
    shuffle, AQE-skew-handled, never a cross join or a full-table
    broadcast — so the pair count is O(tables * N^2 / 2^K) instead of
    O(N^2). Pair K with lsh_bits() to keep expected bucket occupancy
    bounded as the corpus grows.

    `carry` columns ride THROUGH the self-join as <c>_a / <c>_b, so a
    caller scoring the pairs needs no join-back onto the source frame:
    the whole pipeline is tall-build -> one self-equi-join -> one
    distinct (2 shuffles), instead of join + distinct + two more
    scoring joins. With wide carry payloads (vectors), pass
    distinct=False and dedup AFTER scoring instead: a pair that
    collides in several tables is scored redundantly (cheap, Arrow)
    but the distinct then shuffles narrow (id, id, score) rows, not
    vector arrays."""
    sel = [F.col(id_col)] + [F.col(c) for c in carry]
    base = df.select(*sel, _lsh_signatures(planes, tables)(F.col(vec_col)).alias("sig")).select(
        id_col, *carry, F.posexplode("sig").alias("t", "bucket")
    )
    a = base.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in carry],
        "t",
        "bucket",
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in carry],
        "t",
        "bucket",
    )
    out_cols = ["id_a", "id_b"] + [f"{c}_{s}" for c in carry for s in ("a", "b")]
    pairs = (
        a.join(b, ["t", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(*out_cols)
    )
    return pairs.distinct() if distinct else pairs


def sql_lsh_tall(relation: str, id_col: str, vec_col: str, planes: list[list[int]], tables: int) -> str:
    """DuckDB mirror of the tall (pid, t, bucket) frame: a UNION ALL
    body to splice into a WITH clause; pair it with a self-join
    `ta.t = tb.t AND ta.bucket = tb.bucket AND ta.pid < tb.pid`."""
    k = len(planes) // tables
    return " UNION ALL ".join(
        f"SELECT {id_col} AS pid, {t} AS t, "
        f"{sql_bucket(vec_col, planes[t * k : (t + 1) * k])} AS bucket FROM {relation}"
        for t in range(tables)
    )


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
