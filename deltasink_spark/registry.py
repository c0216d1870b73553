"""Op registry: one entry per SURVEY.md §2 operator.

Each query module registers callables with the ``@query`` decorator;
``__spark_entry__.py`` simply re-exports ``QUERIES`` / ``ORACLES``.

Contract (driver-enforced):
- callable signature: (spark: SparkSession, sf_dir: str) -> DataFrame
- every computed column aliased identically in the Spark query and the
  DuckDB oracle SQL (the driver sorts columns by name before hashing)
- oracle=None -> rows-only check (non-SQL-expressible / nondeterministic)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(op_id: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if op_id in QUERIES:
            raise ValueError(f"duplicate op id: {op_id}")
        QUERIES[op_id] = fn
        if oracle is not None:
            ORACLES[op_id] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from deltasink_spark import queries  # noqa: F401
