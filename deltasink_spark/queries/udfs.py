"""UDF / UDAF / UDTF surface (SURVEY.md §2.12).

These exist to prove the extension surface, not to carry operators —
every core op in this engine is a Catalyst built-in. Policy notes in
each docstring; the pandas variants ride Arrow batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deltasink_spark.registry import query
from deltasink_spark.tables import load


@query(
    "udf_scalar_py",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000 THEN 'H'
                WHEN o_totalprice >= 100000 THEN 'M' ELSE 'L' END AS bucket
    FROM orders
    """,
)
def udf_scalar_py(spark, sf_dir):
    """Row-at-a-time Python UDF — the discouraged escape hatch (breaks
    codegen, pickles per row). Kept trivially pure so the oracle holds."""

    @F.udf(T.StringType())
    def bucket(p: float) -> str:
        return "H" if p >= 200000 else ("M" if p >= 100000 else "L")

    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", bucket("o_totalprice").alias("bucket"))


@query(
    "udf_pandas",
    oracle="""
    SELECT event_id, ROUND(LN(1.0 + value) * 100, 6) AS scaled
    FROM events WHERE value >= 0
    """,
)
def udf_pandas(spark, sf_dir):
    """Vectorized Arrow UDF: numpy expression over a whole batch.
    Mirrors a SQL-expressible formula so the DuckDB oracle applies
    (np.log1p == LN(1+x) bit-for-bit on IEEE doubles; LOG in DuckDB
    is log10 -> oracle uses LOG() natural? No: DuckDB LOG is log10,
    so the oracle spells LN explicitly)."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def scaled(v: pd.Series) -> pd.Series:
        return pd.Series(np.round(np.log1p(v.to_numpy()) * 100.0, 6))

    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("value") >= 0).select(
        "event_id", scaled("value").alias("scaled")
    )


@query(
    "udaf_pandas",
    oracle="""
    SELECT user_id,
           ROUND(CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS HUGEINT)
                          * CAST(FLOOR(epoch(ts)) AS HUGEINT)) AS DOUBLE)
                 / (1000000.0 * CAST(SUM(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS DOUBLE)),
                 6) AS tw_avg
    FROM events WHERE value IS NOT NULL GROUP BY user_id
    """,
)
def udaf_pandas(spark, sf_dir):
    """Grouped-agg pandas UDAF: time-weighted average value per user.

    Determinism: values are quantized to 1e-6 fixed point and the
    weighted sum runs in arbitrary-precision integers (Python ints /
    DuckDB HUGEINT — int64 would overflow: ~1e9-scale products times
    ~1.7e9-second weights), so the reduction is exact and order-free in
    both engines; the single final double division is identical.
    (A double accumulation rounded to 6 decimals still diverged on
    1/1500 groups at sf0.1 — fp sum order is engine-dependent.)"""

    def tw_avg_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        # floor(x+0.5), NOT round(): Python rounds half-to-even, DuckDB
        # half-away-from-zero — floor(+0.5) is identical in both.
        w = (pdf["ts"].astype("int64") // 10**9).tolist()
        v = pdf["value"].tolist()
        num = sum(math.floor(x * 1_000_000 + 0.5) * int(s) for x, s in zip(v, w))
        den = sum(int(s) for s in w)
        tw = round(float(num) / (1_000_000.0 * float(den)), 6)
        return pd.DataFrame({"user_id": [pdf["user_id"].iloc[0]], "tw_avg": [tw]})

    # NULL samples drop at ingest (floor(None*1e6) would crash the
    # worker; a weighted average has no place for missing values) —
    # r8 null audit, mirrored in the oracle
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "event_id", "ts", "value")
    )
    return ev.groupBy("user_id").applyInPandas(tw_avg_fn, schema="user_id bigint, tw_avg double")


@query(
    "udtf_py",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id < 20 AND text IS NOT NULL
    """,
)
def udtf_py(spark, sf_dir):
    """Python UDTF (Spark 4): one doc row -> many token rows. The
    built-in explode is the production path; the UDTF proves the
    table-function surface."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            if text is None:  # a robust table function yields nothing
                return        # for NULL input (r8 null audit)
            for tok in text.split(" "):
                yield doc_id, tok

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    spark.udtf.register("tokenize_udtf", Tokenize)
    d.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        "SELECT t.doc_id, t.token FROM docs_for_udtf d, "
        "LATERAL tokenize_udtf(d.doc_id, d.text) t"
    )


@query(
    "udf_arrow",
    oracle="""
    SELECT s_suppkey,
           concat(upper(substr(s_name, 1, 4)), '-',
                  CAST(s_nationkey * 7 + 3 AS VARCHAR)) AS tag
    FROM supplier
    """,
)
def udf_arrow(spark, sf_dir):
    """Arrow-optimized Python UDF (Spark 4 ``useArrow=True``): the
    scalar-UDF API with the row-pickle serialization swapped for
    Arrow batches — same author experience as udf_scalar_py, ~2-5x
    the throughput, the recommended form when a true pandas_udf
    rewrite isn't worth it. Kept trivially pure/deterministic so the
    exact oracle holds."""

    @F.udf(T.StringType(), useArrow=True)
    def tag(name: str, nk: int) -> str:
        return f"{name[:4].upper()}-{nk * 7 + 3}"

    s = load(spark, sf_dir, "supplier")
    return s.select("s_suppkey", tag("s_name", "s_nationkey").alias("tag"))


@query(
    "udaf_arrow_grouped",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events GROUP BY event_type
    """,
)
def udaf_arrow_grouped(spark, sf_dir):
    """Grouped-map over RAW ARROW tables (Spark 4 applyInArrow) — the
    zero-copy tier below applyInPandas: each group arrives as a
    pyarrow.Table and pyarrow.compute reduces it without ever
    materializing pandas objects (no block manager, no object dtype
    churn — the fast path for columnar group logic). State discipline
    matches the engine-wide convention: cents as int64 via
    pyarrow.compute so the reduction is exact and order-free."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def reduce_group(table: pa.Table) -> pa.Table:
        # half_towards_infinity pins pyarrow to the ROUND convention
        # Spark/DuckDB use (pc.round defaults to half_to_even, which
        # would diverge on any exact .5 cent value)
        cents = pc.cast(
            pc.round(
                pc.multiply(table["value"], 100.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "event_type": [table["event_type"][0].as_py()],
                "n": pa.array([table.num_rows], pa.int64()),
                "total_cents": pa.array(
                    [pc.sum(cents).as_py() or 0], pa.int64()
                ),
            }
        )

    ev = load(spark, sf_dir, "events").select("event_type", "value")
    return ev.groupBy("event_type").applyInArrow(
        reduce_group, "event_type string, n bigint, total_cents bigint"
    )
