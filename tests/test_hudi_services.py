"""Hudi TABLE SERVICES on the COW wire format: the CLEANER
(KEEP_LATEST_FILE_VERSIONS, .clean timeline action, time-travel horizon
refusal) and ROLLBACK (pending-instant garbage collection + tail-commit
rewind, .rollback action)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import hudi_format as hf


def _rows(df):
    return sorted(map(tuple, df.collect()), key=lambda t: tuple(map(str, t)))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v double").coalesce(1)


@pytest.fixture()
def table(spark, tmp_path):
    """Three committed instants: create + two upserts touching the same
    file group, so the group carries three base-file versions."""
    root = str(tmp_path / "svc")
    hf.create_table(_mk(spark, [(1, 1.0), (2, 2.0)]), root, key_col="k")
    hf.upsert(spark, _mk(spark, [(1, 10.0)]), root, key_col="k")
    hf.upsert(spark, _mk(spark, [(2, 20.0)]), root, key_col="k")
    return root


def _n_base_files(root):
    return len(hf._base_files(root))


def test_clean_deletes_old_versions_keeps_snapshot(table, spark):
    want = _rows(hf.read_table(spark, table))
    assert _n_base_files(table) == 3
    out = hf.clean(table, retain_file_versions=1)
    assert out["files_deleted"] == 2
    assert _n_base_files(table) == 1
    # the current snapshot is untouched
    assert _rows(hf.read_table(spark, table)) == want
    # a completed .clean action exists, no stray markers
    names = os.listdir(hf._timeline_dir(table))
    assert any(n.endswith(".clean") for n in names)
    assert not any(".clean." in n for n in names)
    # and .clean never pollutes the committed-commit set
    assert len(hf.completed_instants(table)) == 3


def test_time_travel_behind_horizon_refuses(table, spark):
    instants = hf.completed_instants(table)
    pre = _rows(hf.read_table(spark, table, as_of=instants[1]))
    hf.clean(table, retain_file_versions=1)
    with pytest.raises(hf.HudiFormatError, match="cleaner horizon"):
        hf.read_table(spark, table, as_of=instants[1])
    with pytest.raises(hf.HudiFormatError, match="cleaner horizon"):
        hf.read_table(spark, table, as_of=instants[0])


def test_clean_retain_two_keeps_one_step_of_time_travel(table, spark):
    instants = hf.completed_instants(table)
    want_prev = _rows(hf.read_table(spark, table, as_of=instants[1]))
    hf.clean(table, retain_file_versions=2)
    assert _rows(hf.read_table(spark, table, as_of=instants[1])) == want_prev
    with pytest.raises(hf.HudiFormatError, match="cleaner horizon"):
        hf.read_table(spark, table, as_of=instants[0])


def test_rollback_pending_instant_is_garbage_collection(table, spark):
    want = _rows(hf.read_table(spark, table))
    # simulate a crashed writer: inflight markers + an orphan base file
    crashed = "20240101000099999"
    tdir = hf._timeline_dir(table)
    for suffix in (".requested", ".inflight"):
        with open(os.path.join(tdir, f"{crashed}.commit{suffix}"), "w") as f:
            f.write("{}")
    orphan = os.path.join(table, f"deadbeef_0-0-0_{crashed}.parquet")
    import shutil

    shutil.copy(hf._base_files(table)[0][3], orphan)
    # the orphan was already invisible (snapshot filters to committed)
    assert _rows(hf.read_table(spark, table)) == want
    assert hf.pending_instants(table) == [crashed]
    out = hf.rollback(table)
    assert out["rolled_back"] == crashed and out["files_deleted"] == 1
    assert not os.path.exists(orphan)
    assert hf.pending_instants(table) == []
    assert _rows(hf.read_table(spark, table)) == want
    names = os.listdir(tdir)
    assert any(n.endswith(".rollback") for n in names)


def test_rollback_latest_completed_commit_rewinds(table, spark):
    instants = hf.completed_instants(table)
    want_prev = _rows(hf.read_table(spark, table, as_of=instants[-2]))
    out = hf.rollback(table, instant=instants[-1])
    assert out["files_deleted"] == 1
    assert hf.completed_instants(table) == instants[:-1]
    assert _rows(hf.read_table(spark, table)) == want_prev
    # only the TAIL commit may be rolled back
    remaining = hf.completed_instants(table)
    with pytest.raises(ValueError, match="LATEST"):
        hf.rollback(table, instant=remaining[0])
    with pytest.raises(ValueError, match="unknown instant"):
        hf.rollback(table, instant="29990101000000000")
    with pytest.raises(ValueError, match="no pending"):
        hf.rollback(table)
