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


def compare(spark, sf_dir: str, spark_fn, sql: str, op_id: str = "?") -> None:
    sdf = spark_fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
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
