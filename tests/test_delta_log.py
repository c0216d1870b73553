"""Adversarial protocol tests for the real Delta `_delta_log` layer
(deltasink_spark/delta_log.py): crash recovery, replay idempotence,
put-if-absent commits, DML visibility, and the table-as-stream source
contract — the same matrix tests/test_streaming.py pins for the
bespoke-ledger sink, applied to the public format."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from deltasink_spark.delta_log import (
    DeltaLogSink,
    DeltaLogTable,
    DeltaTableStreamDataSource,
)

from tests.conftest import SF_SMALL


def _ev(spark, n=100):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 7).alias("user_id"),
            (F.col("id") * 1.5).alias("value"),
        )
    )


def _table(tmp_path, name="t") -> DeltaLogTable:
    return DeltaLogTable(str(tmp_path / name))


def test_txn_replay_is_skipped(spark, tmp_path):
    t = _table(tmp_path)
    df = _ev(spark)
    assert t.append(df, "app", 0) == 0
    assert t.append(df, "app", 0) is None  # replay: no commit
    assert t.latest_version() == 0
    assert t.read(spark).count() == 100


def test_streaming_sink_no_duplicates_without_txn_guard_would_double(spark, tmp_path):
    # The same frame appended twice WITHOUT txn actions doubles —
    # proving the txn guard (previous test) is what carries
    # exactly-once, not accidental dedup anywhere else.
    t = _table(tmp_path)
    df = _ev(spark)
    t.append(df)
    t.append(df)
    assert t.read(spark).count() == 200


def test_commit_files_are_put_if_absent(spark, tmp_path):
    t = _table(tmp_path)
    t.append(_ev(spark))
    # A racer that somehow wrote version 1 outside the lock: the next
    # commit must NOT clobber it — O_EXCL raises instead.
    racer = os.path.join(t.log_dir, f"{1:020d}.json")
    with open(racer, "w") as fh:
        fh.write(json.dumps({"commitInfo": {"operation": "RACER"}}) + "\n")
    orig = t.latest_version
    t.latest_version = lambda: 0  # force the stale version choice
    try:
        with pytest.raises(FileExistsError):
            t._commit([{"commitInfo": {"operation": "LOSER"}}])
    finally:
        t.latest_version = orig
    with open(racer) as fh:  # racer's content untouched
        assert json.loads(fh.readline())["commitInfo"]["operation"] == "RACER"


def test_crash_before_commit_leaves_table_unchanged(spark, tmp_path):
    t = _table(tmp_path)
    t.append(_ev(spark))
    before = t.read(spark).count()
    # Crash simulation: data files staged (renamed into the root) but
    # the commit never happened — unreferenced files must be invisible.
    t._stage_files(_ev(spark, 50))
    assert t.read(spark).count() == before
    assert t.latest_version() == 0
    # and the next real commit proceeds normally
    t.append(_ev(spark, 10))
    assert t.read(spark).count() == before + 10


def test_optimize_preserves_rows_and_skips_cdf(spark, tmp_path):
    t = _table(tmp_path)
    t.append(_ev(spark, 60))
    t.append(_ev(spark, 40))
    v = t.optimize(spark, target_files=1)
    assert t.read(spark).count() == 100
    assert len(t.snapshot_files()) == 1
    # dataChange=false commit emits NOTHING in a CDF read
    assert t.read_changes(spark, v - 1, v).count() == 0


def test_delete_where_rewrites_only_affected_files(spark, tmp_path):
    t = _table(tmp_path)
    t.append(_ev(spark, 50))  # ids 0..49: contains matches
    t.append(
        _ev(spark, 100).filter(F.col("event_id") >= 80)
    )  # ids 80..99: no matches
    before = set(t.snapshot_files())
    t.delete_where(spark, "event_id < 10")
    after = set(t.snapshot_files())
    # the no-match file survives as the SAME physical file
    untouched = before & after
    assert untouched, "file without matches must not be rewritten"
    assert t.read(spark).count() == 60  # 50 + 20 - 10 deleted
    assert t.read(spark).filter(F.col("event_id") < 10).count() == 0


def test_delete_where_nulls_survive(spark, tmp_path):
    t = _table(tmp_path)
    df = _ev(spark, 20).withColumn(
        "value", F.when(F.col("event_id") % 5 == 0, None).otherwise(F.col("value"))
    )
    t.append(df)
    t.delete_where(spark, "value < 15")
    out = t.read(spark)
    assert out.filter(F.col("value").isNull()).count() == 4  # NULLs kept


def test_delete_where_no_match_is_noop_commit(spark, tmp_path):
    t = _table(tmp_path)
    t.append(_ev(spark, 10))
    v0 = t.latest_version()
    assert t.delete_where(spark, "event_id > 999") == v0
    assert t.latest_version() == v0


def test_delete_emits_cdc_rows(spark, tmp_path):
    t = _table(tmp_path)
    t.append(_ev(spark, 30))
    v = t.delete_where(spark, "event_id < 5")
    cdf = t.read_changes(spark, v - 1, v)
    rows = {r["event_id"] for r in cdf.collect()}
    assert rows == set(range(5))
    assert cdf.filter(F.col("_change_type") == "delete").count() == 5


def test_vacuum_drops_superseded_but_keeps_current(spark, tmp_path):
    t = _table(tmp_path)
    t.append(_ev(spark, 40))
    t.optimize(spark, target_files=1)
    removed = t.vacuum()
    assert removed >= 1
    assert t.read(spark).count() == 40  # current snapshot intact
    # time travel PAST the vacuumed version now fails on missing files
    # (Delta's documented VACUUM consequence)
    with pytest.raises(Exception):
        t.read(spark, as_of_version=0).collect()


def test_first_commit_carries_protocol_and_metadata(spark, tmp_path):
    t = _table(tmp_path)
    t.append(_ev(spark, 5))
    with open(os.path.join(t.log_dir, f"{0:020d}.json")) as fh:
        kinds = [next(iter(json.loads(line))) for line in fh if line.strip()]
    assert kinds[0] == "protocol"
    assert kinds[1] == "metaData"
    assert "add" in kinds and "commitInfo" in kinds
    # schemaString round-trips through an EMPTY snapshot read
    t2 = DeltaLogTable(t.path)
    assert t2.schema() is not None


def test_stream_source_serves_appends_skips_optimize(spark, tmp_path):
    t = _table(tmp_path)
    t.append(_ev(spark, 30))
    t.optimize(spark, target_files=1)
    t.append(_ev(spark, 60).filter(F.col("event_id") >= 30))
    spark.dataSource.register(DeltaTableStreamDataSource)
    from deltasink_spark.queries.sources_sinks import _run_until

    out = _run_until(
        spark,
        spark.readStream.format("delta_log_table").option("path", t.path).load(),
        min_rows=60,
    )
    # optimize's rewritten file must NOT be re-served: exactly 60 rows
    assert out.count() == 60
    assert {r["event_id"] for r in out.collect()} == set(range(60))


def test_stream_source_raises_on_delete_without_optin(spark, tmp_path):
    t = _table(tmp_path)
    t.append(_ev(spark, 20))
    t.delete_where(spark, "event_id < 5")
    from deltasink_spark.delta_log import DeltaTableStreamReader

    r = DeltaTableStreamReader({"path": t.path})
    with pytest.raises(ValueError, match="ignore_deletes"):
        r.partitions({"v": -1}, {"v": t.latest_version()})
    r2 = DeltaTableStreamReader({"path": t.path, "ignore_deletes": "true"})
    parts = r2.partitions({"v": -1}, {"v": t.latest_version()})
    assert parts  # serves the adds, skips the delete


def test_streaming_sink_replay_via_txn(spark, tmp_path, sf_small):
    from deltasink_spark.sources import events_stream

    path = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    sink = DeltaLogSink(path, app_id="t_replay")
    for _ in range(2):
        s = events_stream(spark, sf_small).select("event_id", "value")
        q = (
            s.writeStream.foreachBatch(sink.foreach_batch())
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    from deltasink_spark.tables import load

    expected = load(spark, sf_small, "events").count()
    assert sink.table.read(spark).count() == expected


def test_add_stats_carry_numrecords_and_minmax(spark, tmp_path):
    t = _table(tmp_path)
    t.append(_ev(spark, 25))
    adds = [a["add"] for _, a in t._actions() if "add" in a]
    assert adds
    stats = [json.loads(a["stats"]) for a in adds]  # one per part file
    assert sum(s["numRecords"] for s in stats) == 25
    assert min(s["minValues"]["event_id"] for s in stats) == 0
    assert max(s["maxValues"]["event_id"] for s in stats) == 24
    assert sum(s["nullCount"]["value"] for s in stats) == 0
