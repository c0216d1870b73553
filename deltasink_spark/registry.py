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

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The harness may hand us a session we did not configure
            # (deltasink_spark.session.get_spark sets these at build
            # time). Both are runtime-settable; pin them so results are
            # independent of the caller's session defaults:
            # - UTC: fixtures hold naive timestamps, the DuckDB oracle
            #   compares naive UTC values; hour()/date_trunc() must not
            #   shift with a caller's local timezone.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            # - Arrow: pandas-UDF ops ride vectorized batches.
            spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[op_id] = wrapped
        if oracle is not None:
            ORACLES[op_id] = oracle
        return wrapped

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from deltasink_spark import queries  # noqa: F401
