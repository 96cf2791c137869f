"""Snapshot catalog: create/read/partition-pruned overwrite/snapshot
isolation/resume — the Iceberg-analog semantics the engine depends on
(QueueSystem persistence + restore, QueueSystem.spec.coffee:45-54)."""

import os

import pytest
from pyspark.sql import functions as F

from kermit_spark.catalog import SnapshotCatalog


@pytest.fixture
def cat(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path / "cat"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "p int, k long, v string")


def test_create_and_read_roundtrip(spark, cat):
    cat.create("t", _df(spark, [(0, 1, "a"), (1, 2, "b")]), 4)
    got = sorted((r["p"], r["k"], r["v"]) for r in cat.read("t").collect())
    assert got == [(0, 1, "a"), (1, 2, "b")]
    assert cat.current_snapshot("t") == 0


def test_overwrite_touches_only_given_partitions(spark, cat):
    cat.create("t", _df(spark, [(0, 1, "a"), (1, 2, "b"), (2, 3, "c")]), 4)
    cat.overwrite_partitions("t", _df(spark, [(1, 20, "B")]), [1])
    got = sorted((r["p"], r["k"], r["v"]) for r in cat.read("t").collect())
    assert got == [(0, 1, "a"), (1, 20, "B"), (2, 3, "c")]
    # old snapshot still readable (time travel / isolation)
    old = sorted((r["p"], r["k"]) for r in cat.read("t", snapshot=0).collect())
    assert old == [(0, 1), (1, 2), (2, 3)]


def test_emptying_a_partition_does_not_resurrect_rows(spark, cat):
    cat.create("t", _df(spark, [(0, 1, "a"), (1, 2, "b")]), 4)
    empty = _df(spark, []).filter(F.lit(False))
    cat.overwrite_partitions("t", empty, [1])
    got = [(r["p"], r["k"]) for r in cat.read("t").collect()]
    assert got == [(0, 1)]


def test_commit_is_atomic_rename(spark, cat, tmp_path):
    cat.create("t", _df(spark, [(0, 1, "a")]), 2)
    # no stray staging dirs after commit
    tdir = os.path.join(str(tmp_path / "cat"), "t")
    assert not [d for d in os.listdir(tdir) if d.startswith("_staging")]


def test_resume_from_new_catalog_instance(spark, cat, tmp_path):
    cat.create("t", _df(spark, [(0, 1, "a")]), 2)
    cat.overwrite_partitions("t", _df(spark, [(0, 9, "z")]), [0], properties={"wave": 3})
    # a fresh catalog object (new driver process analog) sees committed state
    cat2 = SnapshotCatalog(spark, str(tmp_path / "cat"))
    assert cat2.current_snapshot("t") == 1
    assert cat2.snapshot_property("t")["wave"] == 3
    assert [(r["k"], r["v"]) for r in cat2.read("t").collect()] == [(9, "z")]


def test_rerun_after_kill_mid_commit_is_idempotent(spark, cat, tmp_path):
    """A run killed between per-partition renames and the _meta.json swap
    leaves orphan v{N} dirs; the re-run recomputes the same snapshot version
    and must overwrite them (crash-resume contract)."""
    cat.create("t", _df(spark, [(0, 1, "a"), (1, 2, "b")]), 4)
    # simulate the torn commit: v1 dir exists for p=1 but meta still says v0
    orphan = os.path.join(str(tmp_path / "cat"), "t", "p=1", "v1")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "stale.parquet"), "w") as f:
        f.write("torn")
    cat.overwrite_partitions("t", _df(spark, [(1, 20, "B")]), [1])
    got = sorted((r["p"], r["k"], r["v"]) for r in cat.read("t").collect())
    assert got == [(0, 1, "a"), (1, 20, "B")]


def test_merge_write_appends_then_compact_folds(spark, cat):
    """Fast-append commits grow a partition's file list; compact() folds it
    back to one set with identical rows and carried-forward properties."""
    cat.create("t", _df(spark, [(0, 1, "a")]), 4, properties={"n_rows": 1})
    # pure-insert commit: partition 0 gets an APPENDED file set, partition 1 a new one
    cat.merge_write("t", _df(spark, [(0, 2, "b"), (1, 3, "c")]), replace_parts=set(),
                    properties={"n_rows": 3})
    meta_vers = cat._load_meta("t").snapshots["1"]["0"]
    assert isinstance(meta_vers, list) and len(meta_vers) == 2
    got = sorted((r["p"], r["k"], r["v"]) for r in cat.read("t").collect())
    assert got == [(0, 1, "a"), (0, 2, "b"), (1, 3, "c")]

    sid = cat.compact("t")
    assert cat._load_meta("t").snapshots[str(sid)]["0"] == sid  # single version again
    got2 = sorted((r["p"], r["k"], r["v"]) for r in cat.read("t").collect())
    assert got2 == got
    assert cat.snapshot_property("t")["n_rows"] == 3  # stats carried forward
    # nothing multi-versioned left: compact is a no-op now
    assert cat.compact("t") == sid


def test_merge_write_empty_replace_partition_does_not_resurrect(spark, cat):
    """A partition named in replace_parts whose merged result is EMPTY must
    still have its file list replaced — otherwise the old files resurrect
    stale rows in the new snapshot (ADVICE r2, medium)."""
    cat.create("t", _df(spark, [(0, 1, "a"), (1, 2, "b")]), 4)
    empty = _df(spark, []).filter(F.lit(False))
    cat.merge_write("t", empty, replace_parts=[1])
    got = [(r["p"], r["k"]) for r in cat.read("t").collect()]
    assert got == [(0, 1)]
    # previous snapshot still shows the row (isolation intact)
    assert len(cat.read("t", snapshot=0).collect()) == 2


def test_expire_snapshots_removes_old_versions_keeps_current(spark, cat, tmp_path):
    """Iceberg expire_snapshots analog: version dirs unreferenced by retained
    snapshots are deleted; current + retained snapshots stay readable and a
    fresh catalog instance (resume) still works."""
    cat.create("t", _df(spark, [(0, 1, "a"), (1, 2, "b")]), 4)
    for i in range(3):
        cat.overwrite_partitions("t", _df(spark, [(0, 10 + i, "x")]), [0])
    tdir = os.path.join(str(tmp_path / "cat"), "t", "p=0")
    assert len([d for d in os.listdir(tdir) if d.startswith("v")]) == 4
    removed = cat.expire_snapshots("t", keep_last=2)
    assert removed == 2  # v0, v1 of p=0 gone (p=1 v0 still referenced)
    vers = sorted(d for d in os.listdir(tdir) if d.startswith("v"))
    assert vers == ["v2", "v3"]
    # current snapshot reads identically; retained previous snapshot too
    got = sorted((r["p"], r["k"]) for r in cat.read("t").collect())
    assert got == [(0, 12), (1, 2)]
    assert [(r["k"]) for r in cat.read("t", snapshot=2).filter(F.col("p") == 0).collect()] == [11]
    # expired snapshot metadata is gone
    assert "0" not in cat._load_meta("t").snapshots
    # resume path: fresh instance reads the same state
    cat2 = SnapshotCatalog(spark, str(tmp_path / "cat"))
    assert sorted((r["p"], r["k"]) for r in cat2.read("t").collect()) == got
    # idempotent: nothing left to remove
    assert cat.expire_snapshots("t", keep_last=2) == 0


def test_missing_table_raises(cat):
    with pytest.raises(FileNotFoundError):
        cat.read("nope")
    assert not cat.exists("nope")
