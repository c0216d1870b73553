"""LogStore seam tests: the commit funnel over the local
put-if-absent/flock store AND the fault-injecting object-store model
(lost-then-visible listings, duplicate puts) — the race matrix must
hold under both (delta-spark's LogStore SPI contract)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from deltasink_spark.delta_log import (
    ConcurrentAppendError,
    DeltaLogTable,
    FaultInjectingLogStore,
    LogStore,
)


def _ev(spark, n=100, lo=0):
    return (
        spark.range(lo, n)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 7).alias("user_id"),
            (F.col("id") * 1.5).alias("value"),
        )
    )


def test_local_store_put_if_absent_contract(tmp_path):
    s = LogStore()
    p = str(tmp_path / "f.json")
    s.put_if_absent(p, "a\n")
    with pytest.raises(FileExistsError):
        s.put_if_absent(p, "b\n")
    assert s.read(p) == "a\n"  # never clobbered
    s.put_atomic(p, "c\n")
    assert s.read(p) == "c\n"
    assert sorted(s.list(str(tmp_path))) == ["f.json"]
    s.delete(p)
    assert not s.exists(p)


def test_duplicate_put_is_idempotent_success(spark, tmp_path):
    """A store that retries the write internally (put succeeded but
    raised) must NOT fail the commit: the funnel recognizes its own
    durable payload and proceeds — version sequence intact, checksum
    sidecar written, reads exact."""
    store = FaultInjectingLogStore(dup=2)
    t = DeltaLogTable(str(tmp_path / "t"), log_store=store)
    assert t.append(_ev(spark, 10)) == 0
    assert t.append(_ev(spark, 20, lo=10)) == 1
    assert store.stats["dup_puts"] == 2
    assert t.read(spark).count() == 20
    # the checksum sidecars exist and validate (snapshot_adds raises
    # on divergence)
    assert os.path.exists(os.path.join(t.log_dir, f"{0:020d}.crc"))
    t.snapshot_adds()  # crc validation path runs without raising
    assert [v for v, _ in t._version_files()] == [0, 1]


def test_lagged_listing_collision_retries_to_success(spark, tmp_path):
    """Eventual consistency: writer B's store hides writer A's fresh
    commit from listings, so B plans a stale version and collides on
    put-if-absent. The funnel surfaces ConcurrentAppendError, the OCC
    loop retries until the listing matures, and BOTH commits land —
    no crash, no clobber, contiguous versions."""
    path = str(tmp_path / "t")
    a = DeltaLogTable(path, log_store=FaultInjectingLogStore())
    store_b = FaultInjectingLogStore(lag=3)
    b = DeltaLogTable(path, log_store=store_b)
    assert a.append(_ev(spark, 10)) == 0
    # B's view lags: its first plan computes version 0 and collides
    assert b.append(_ev(spark, 20, lo=10)) == 1
    assert store_b.stats["hidden_lists"] > 0
    t = DeltaLogTable(path)
    assert {r["event_id"] for r in t.read(spark).collect()} == set(range(20))
    assert [v for v, _ in t._version_files()] == [0, 1]


def test_lagged_listing_true_conflict_still_aborts(spark, tmp_path):
    """A collision where the existing version was written by a FOREIGN
    writer with different content and the listing never matures inside
    the retry budget must abort loudly (bounded retries) — silence
    would clobber or duplicate."""
    path = str(tmp_path / "t")
    a = DeltaLogTable(path)
    a.append(_ev(spark, 10))
    store_b = FaultInjectingLogStore(lag=10_000)  # never matures
    b = DeltaLogTable(path, log_store=store_b)
    os.environ["DS_OCC_ATTEMPTS"] = "3"
    try:
        with pytest.raises(ConcurrentAppendError):
            b.append(_ev(spark, 20, lo=10))
    finally:
        os.environ.pop("DS_OCC_ATTEMPTS", None)
    # A's commit was never clobbered
    assert DeltaLogTable(path).read(spark).count() == 10


def test_race_matrix_over_fault_store(spark, tmp_path):
    """The commit-race suite's core scenario over the fault store:
    interleaved appends and a row-level DELETE from two lagged
    handles — linearizable outcome, exact content, no version gaps."""
    path = str(tmp_path / "t")
    a = DeltaLogTable(path, log_store=FaultInjectingLogStore(lag=2, dup=1))
    b = DeltaLogTable(path, log_store=FaultInjectingLogStore(lag=2, dup=1))
    a.append(_ev(spark, 50))
    b.append(_ev(spark, 100, lo=50))
    a.delete_where(spark, "event_id < 10")
    b.append(_ev(spark, 120, lo=100))
    t = DeltaLogTable(path)
    assert {r["event_id"] for r in t.read(spark).collect()} == set(
        range(10, 120)
    )
    vf = [v for v, _ in t._version_files()]
    assert vf == list(range(len(vf)))


def test_coordinated_commits_own_and_backfill(spark, tmp_path):
    """Coordinated commits: a coordinator-owned table's commits stage
    under _delta_log/_staged_commits and are visible to coordinated
    handles IMMEDIATELY; a plain-filesystem reader sees only the
    BACKFILLED prefix; backfill publishes the owned tail as standard
    version files (idempotently) after which both views agree."""
    from deltasink_spark.delta_log import (
        CoordinatedLogStore,
        InProcessCoordinator,
    )

    coord = InProcessCoordinator()
    path = str(tmp_path / "t")
    t = DeltaLogTable(path, log_store=CoordinatedLogStore(coord))
    assert t.append(_ev(spark, 10)) == 0
    assert t.append(_ev(spark, 20, lo=10)) == 1
    # owned, unbackfilled: no standard version files yet
    assert [v for v, _ in DeltaLogTable(path)._version_files()] == []
    staged = os.listdir(os.path.join(t.log_dir, "_staged_commits"))
    assert len(staged) == 2
    # the coordinated view is complete and exact
    assert t.latest_version() == 1
    assert t.read(spark).count() == 20
    # a second coordinated handle (same coordinator service) sees it
    t2 = DeltaLogTable(path, log_store=CoordinatedLogStore(coord))
    assert t2.read(spark).count() == 20
    # filesystem reader: only backfilled commits exist
    fs = DeltaLogTable(path)
    assert fs.latest_version() == -1
    # backfill publishes; both views converge; staged dir drains
    assert coord.backfill(LogStore(), t.log_dir) == 2
    assert [v for v, _ in fs._version_files()] == [0, 1]
    assert fs.read(spark).count() == 20
    assert os.listdir(os.path.join(t.log_dir, "_staged_commits")) == []
    # backfill again: idempotent no-op
    assert coord.backfill(LogStore(), t.log_dir) == 0
    # post-backfill coordinated commits keep sequencing correctly
    assert t.append(_ev(spark, 30, lo=20)) == 2
    assert fs.latest_version() == 1  # still unbackfilled tail
    coord.backfill(LogStore(), t.log_dir)
    assert fs.read(spark).count() == 30


def test_coordinated_commits_race_matrix(spark, tmp_path):
    """The commit-race suite's core scenario over coordinator-owned
    handles: interleaved appends and a row-level DELETE from two
    handles sharing the coordinator — linearizable outcome, exact
    content, contiguous owned versions, conflicts surfaced as the
    same retryable the OCC loop already handles."""
    from deltasink_spark.delta_log import (
        CoordinatedLogStore,
        InProcessCoordinator,
    )

    coord = InProcessCoordinator()
    path = str(tmp_path / "t")
    a = DeltaLogTable(path, log_store=CoordinatedLogStore(coord))
    b = DeltaLogTable(path, log_store=CoordinatedLogStore(coord))
    a.append(_ev(spark, 50))
    b.append(_ev(spark, 100, lo=50))
    a.delete_where(spark, "event_id < 10")
    b.append(_ev(spark, 120, lo=100))
    assert {r["event_id"] for r in a.read(spark).collect()} == set(
        range(10, 120)
    )
    assert sorted(coord.get_commits(a.log_dir)) == [0, 1, 2, 3]
    # a direct stale-version claim conflicts exactly like put-if-absent
    with pytest.raises(FileExistsError):
        coord.commit(a.log_dir, 3, "{}\n")
    # checkpoint + backfill: a filesystem reader folds the whole state
    coord.backfill(LogStore(), a.log_dir)
    a.checkpoint()
    fs = DeltaLogTable(path)
    assert fs.read(spark).count() == 110
    assert {r["event_id"] for r in fs.read(spark).collect()} == set(
        range(10, 120)
    )


def test_coordinator_ownership_gate(spark, tmp_path):
    """A table whose configuration names a commit coordinator is
    OWNED: a plain-filesystem writer refuses to commit (a direct
    put-if-absent beside the coordinator's owned tail would be split
    brain), while coordinated writers commit and filesystem READS of
    the backfilled prefix stay open."""
    from deltasink_spark.delta_log import (
        CoordinatedLogStore,
        InProcessCoordinator,
    )

    coord = InProcessCoordinator()
    path = str(tmp_path / "t")
    t = DeltaLogTable(path, log_store=CoordinatedLogStore(coord))
    t.append(_ev(spark, 10))
    t.set_properties(
        {"delta.coordinatedCommits.commitCoordinator-preview": "in-process"}
    )
    t.append(_ev(spark, 20, lo=10))  # coordinated writer: fine
    coord.backfill(LogStore(), t.log_dir)
    fs = DeltaLogTable(path)
    assert fs.read(spark).count() == 20  # reads stay open
    with pytest.raises(ValueError, match="commit coordinator"):
        fs.append(_ev(spark, 30, lo=20))
    # the refusal left no partial commit behind
    assert DeltaLogTable(path).latest_version() == t.latest_version()


def test_coordinator_enablement_backfills_synchronously(spark, tmp_path):
    """The RFC's split-brain guard: the commit that ENABLES
    coordinated commits (and everything before it) backfills
    synchronously — a plain-filesystem writer therefore ALWAYS sees
    the ownership metaData and refuses, even while later commits sit
    unbackfilled with the coordinator. Without this, a filesystem
    writer blind to the owned tail would put-if-absent a colliding
    version file beside it."""
    from deltasink_spark.delta_log import (
        CoordinatedLogStore,
        InProcessCoordinator,
    )

    coord = InProcessCoordinator()
    path = str(tmp_path / "t")
    t = DeltaLogTable(path, log_store=CoordinatedLogStore(coord))
    t.append(_ev(spark, 10))
    t.set_properties(
        {"delta.coordinatedCommits.commitCoordinator-preview": "in-process"}
    )
    # enablement (v1) and its prefix (v0) are ALREADY standard files
    fs = DeltaLogTable(path)
    assert fs.latest_version() == 1
    t.append(_ev(spark, 20, lo=10))  # v2 stays owned/unbackfilled
    assert fs.read(spark).count() == 10  # backfilled prefix only
    with pytest.raises(ValueError, match="commit coordinator"):
        DeltaLogTable(path).append(_ev(spark, 30, lo=20))
    # the owned tail is intact and exactly what the coordinator holds
    assert t.read(spark).count() == 20
    assert sorted(coord.get_commits(t.log_dir)) == [2]
