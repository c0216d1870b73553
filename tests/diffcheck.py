"""Local differential harness mirroring the driver's DuckDB oracle check.

Runs a registered Spark query and its oracle SQL on the same parquet
fixtures and compares row count, sorted column names, and the exact
multiset of values (floats compared by full repr — i.e. bit-exact, the
strictest reading of the driver's order-insensitive value-hash).
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb

from deltasink_spark.tables import TABLES

_DUCK_CONNS: dict[str, duckdb.DuckDBPyConnection] = {}


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = _DUCK_CONNS.get(sf_dir)
    if conn is None:
        conn = duckdb.connect()
        for t in TABLES:
            conn.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        _DUCK_CONNS[sf_dir] = conn
    return conn


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"f:{float(v)!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, dt.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_norm(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    return f"s:{v}"


def _normalize(rows, cols) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


def compare_driver_style(spark, sf_dir: str, spark_fn, sql: str, op_id: str = "?") -> None:
    compare_driver_style_pdf(spark_fn(spark, sf_dir).toPandas(), sf_dir, sql, op_id)


def compare_driver_style_pdf(spdf, sf_dir: str, sql: str, op_id: str = "?", ddf=None) -> None:
    """Mirror the two driver-canonicalizer hazards the value-compare in
    compare() cannot see (it goes through Python objects):

    1. array/ndarray cells — the driver's pandas sort_values raises
       ``TypeError: unhashable type: 'numpy.ndarray'`` (r2: fn_array,
       fn_map, text_tokenize, text_ngrams);
    2. pandas-dtype divergence — DuckDB SUM(BIGINT) returns HUGEINT which
       lands as float64 while Spark emits int64, flipping the value hash
       even when the values are equal (r2: text_stats, pipeline_llm_prep).

    Takes the already-computed ``toPandas()`` frame so the Spark side
    can be executed elsewhere (tests/test_oracle.py precomputes every
    op's frame concurrently — guide §2.6 overlapping driver jobs).
    """
    import numpy as np

    ddf = ddf if ddf is not None else duck_conn(sf_dir).execute(sql).fetchdf()
    spdf.columns = [c.lower() for c in spdf.columns]
    ddf.columns = [c.lower() for c in ddf.columns]
    for name, frame in (("spark", spdf), ("duckdb", ddf)):
        for c in frame.columns:
            if frame[c].dtype == object and len(frame):
                bad = frame[c].map(lambda v: isinstance(v, (list, np.ndarray))).any()
                assert not bad, (
                    f"[{op_id}] {name} column {c!r} holds array cells — "
                    "would crash the driver canonicalizer (stringify it)"
                )
    for c in sorted(spdf.columns):
        sk, dk = spdf[c].dtype.kind, ddf[c].dtype.kind
        # pandas nullable quirk: an int column with NULLs arrives as float
        # on both engines only if BOTH have nulls; treat i-vs-f with
        # actual-null presence as the known benign case, flag the rest.
        if sk != dk and {sk, dk} == {"i", "f"}:
            has_null = ddf[c].isna().any() or spdf[c].isna().any()
            assert has_null, (
                f"[{op_id}] dtype divergence on {c!r}: spark={spdf[c].dtype} "
                f"duckdb={ddf[c].dtype} with no NULLs — value-hash will "
                "mismatch (cast the oracle, e.g. CAST(... AS BIGINT))"
            )
        elif sk != dk and {sk, dk} == {"O", "M"}:
            # Spark DATE -> object(datetime.date) vs DuckDB DATE ->
            # datetime64[us]: proven benign (fn_date r2 pass,
            # ts_derive_partition r1 pass — driver canon normalizes dates).
            pass
        elif sk != dk and {sk, dk} != {"O", "b"}:
            assert sk == dk, (
                f"[{op_id}] dtype kind mismatch on {c!r}: "
                f"spark={spdf[c].dtype} duckdb={ddf[c].dtype}"
            )


def compare(spark, sf_dir: str, spark_fn, sql: str, op_id: str = "?") -> None:
    sdf = spark_fn(spark, sf_dir)
    compare_rows(sdf.collect(), sdf.columns, sf_dir, sql, op_id)


def compare_rows(srows, scols, sf_dir: str, sql: str, op_id: str = "?", duck=None) -> None:
    """compare() over an already-collected Spark result (see
    compare_driver_style_pdf for why the split exists). ``duck`` may
    carry a precomputed (dcols, drows) pair — tests/test_oracle.py
    runs the DuckDB side on the same worker pool as the Spark side,
    via per-thread cursors of the shared in-memory catalog."""
    if duck is not None:
        dcols, drows = duck
    else:
        res = duck_conn(sf_dir).execute(sql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols), (
        f"[{op_id}] column mismatch: spark={sorted(scols)} duckdb={sorted(dcols)}"
    )
    assert len(srows) == len(drows), (
        f"[{op_id}] row count mismatch: spark={len(srows)} duckdb={len(drows)}"
    )
    sn = _normalize(srows, [c.lower() for c in scols])
    dn = _normalize(drows, [c.lower() for c in dcols])
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b]
        raise AssertionError(
            f"[{op_id}] value mismatch ({len(diffs)}/{len(sn)} rows differ); "
            f"first diff:\n  spark : {diffs[0][0]}\n  duckdb: {diffs[0][1]}"
        )
