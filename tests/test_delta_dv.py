import os, json
import pytest
from pyspark.sql import functions as F
from deltasink_spark.delta_log import DeltaLogTable

def _ev(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        (F.col("id") * 1.5).alias("value"),
    )

def test_dv_delete_no_rewrite(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.append(_ev(spark, 100))
    before_files = set(t.snapshot_files())
    before_bytes = {p: os.path.getsize(os.path.join(t.path, p)) for p in before_files}
    v = t.delete_where_dv(spark, "event_id < 10")
    # same paths, same bytes — merge-on-read
    assert set(t.snapshot_files()) == before_files
    for p, sz in before_bytes.items():
        assert os.path.getsize(os.path.join(t.path, p)) == sz
    got = {r["event_id"] for r in t.read(spark).collect()}
    assert got == set(range(10, 100))
    # adds carry descriptors; protocol upgraded to table features
    adds = t.snapshot_adds()
    assert any(a.get("deletionVector") for a in adds.values())
    protos = [a["protocol"] for _, a in t._actions() if "protocol" in a]
    assert protos[-1]["minReaderVersion"] == 3
    assert "deletionVectors" in protos[-1]["readerFeatures"]
    # CDF published the deleted rows
    ch = t.read_changes(spark, v - 1, v)
    assert {r["event_id"] for r in ch.collect()} == set(range(10))
    assert {r["_change_type"] for r in ch.collect()} == {"delete"}

def test_dv_second_delete_unions(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.append(_ev(spark, 50))
    t.delete_where_dv(spark, "event_id < 5")
    t.delete_where_dv(spark, "event_id >= 45")
    got = {r["event_id"] for r in t.read(spark).collect()}
    assert got == set(range(5, 45))
    # second delete's cdc must NOT re-publish the first delete's rows
    v = t.latest_version()
    ch = {r["event_id"] for r in t.read_changes(spark, v - 1, v).collect()}
    assert ch == set(range(45, 50))

def test_dv_then_copy_on_write_delete(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.append(_ev(spark, 50))
    t.delete_where_dv(spark, "event_id < 5")
    t.delete_where(spark, "event_id >= 45")  # rewrite must not resurrect <5
    got = {r["event_id"] for r in t.read(spark).collect()}
    assert got == set(range(5, 45))

def test_dv_optimize_purges(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.append(_ev(spark, 50))
    t.delete_where_dv(spark, "event_id % 2 = 0")
    t.optimize(spark, target_files=1)
    adds = t.snapshot_adds()
    assert not any(a.get("deletionVector") for a in adds.values())
    got = {r["event_id"] for r in t.read(spark).collect()}
    assert got == {i for i in range(50) if i % 2}

def test_dv_checkpoint_roundtrip(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.append(_ev(spark, 50))
    t.delete_where_dv(spark, "event_id < 20")
    t.checkpoint()
    t2 = DeltaLogTable(t.path)
    got = {r["event_id"] for r in t2.read_via_checkpoint(spark).collect()}
    assert got == set(range(20, 50))

def test_dv_merge_does_not_resurrect(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.append(_ev(spark, 30))
    t.delete_where_dv(spark, "event_id < 10")
    src = _ev(spark, 12).filter(F.col("event_id") >= 10).select(
        "event_id", "user_id", (F.col("value") + 100).alias("value"))
    t.merge(spark, src, "event_id")
    got = {r["event_id"]: r["value"] for r in t.read(spark).collect()}
    assert set(got) == set(range(10, 30))
    assert got[10] == 115.0 and got[11] == 116.5 and got[12] == 18.0

def test_dv_streaming_cdf_and_restore(spark, tmp_path):
    t = DeltaLogTable(str(tmp_path / "t"))
    t.append(_ev(spark, 30))
    pre = t.latest_version()
    t.delete_where_dv(spark, "event_id < 10")
    t.restore(spark, pre)  # re-adds the un-DV'd original add
    got = {r["event_id"] for r in t.read(spark).collect()}
    assert got == set(range(30))
