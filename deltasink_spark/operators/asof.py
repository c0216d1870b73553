"""As-of join — Spark-native, shuffle-once, no pair explosion.

Spark has no ASOF JOIN operator. The naive emulation (inequality join
then row_number=1) materializes every (left, earlier-right) pair — at
100 TB that's a quadratic blowup per key. This implementation uses the
union + carry-forward trick instead:

  1. union the two sides into one tall frame tagged by side
  2. single shuffle: window partitioned by key, ordered by (ts, side,
     tiebreak) — right rows sort before left rows at equal ts so '<='
     semantics hold
  3. last(right_payload, ignorenulls=True) carries the most recent
     right row forward onto every left row

Cost: one shuffle + one sort per key partition — identical asymptotics
to a sort-merge join, zero intermediate explosion. Skewed keys are
handled by AQE; ordering ties broken by a unique right-side key so the
result is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key (ties on
    ``right_ts`` broken by greatest ``tiebreak``). Left rows with no
    match keep null payloads. Output: all left columns + payload_cols.
    """
    payload = F.struct(*[F.col(c) for c in payload_cols])
    l_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    ).withColumn("__payload", F.lit(None).cast(right.select(payload).schema[0].dataType)).withColumn(
        "__tb", F.lit(None).cast("long")
    )
    r_tagged = (
        right.select(
            F.col(right_ts).alias("__ts"),
            F.lit(0).alias("__side"),
            payload.alias("__payload"),
            F.col(tiebreak).cast("long").alias("__tb"),
            F.col(on),
        )
    )
    l_cols = [c for c in left.columns]
    tall = l_tagged.select(on, "__ts", "__side", "__payload", "__tb", *[c for c in l_cols if c != on]).unionByName(
        r_tagged, allowMissingColumns=True
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tall.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        *l_cols, *[F.col("__match")[c].alias(c) for c in payload_cols]
    )
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str,
) -> DataFrame:
    """Forward as-of (pandas merge_asof direction='forward'): for each
    left row, attach the right row with the SMALLEST ``right_ts`` >=
    ``left_ts`` within the key (ties on ``right_ts`` broken by
    smallest ``tiebreak``). Same union + one-window shape as the
    backward join, mirrored: right rows sort AFTER left rows at equal
    ts (so '>=' holds) and the first following right payload is pulled
    back with FIRST(... IGNORE NULLS) over (current row, unbounded
    following)."""
    payload = F.struct(*[F.col(c) for c in payload_cols])
    l_tagged = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(0))
        .withColumn(
            "__payload", F.lit(None).cast(right.select(payload).schema[0].dataType)
        )
        .withColumn("__tb", F.lit(None).cast("long"))
    )
    r_tagged = right.select(
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        payload.alias("__payload"),
        F.col(tiebreak).cast("long").alias("__tb"),
        F.col(on),
    )
    l_cols = [c for c in left.columns]
    tall = l_tagged.select(
        on, "__ts", "__side", "__payload", "__tb", *[c for c in l_cols if c != on]
    ).unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = tall.withColumn("__match", F.first("__payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 0).select(
        *l_cols, *[F.col("__match")[c].alias(c) for c in payload_cols]
    )
    return out
