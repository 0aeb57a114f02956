"""Hudi SAVEPOINT / RESTORE (savepoint(), delete_savepoint(),
restore_to_savepoint() — Hudi's disaster-recovery table services):
a savepoint pins a committed snapshot's base files against the
cleaner, keeps it time-travelable behind the clean horizon, and
restore rewinds the table to it across ANY number of commits.

Reference analog: Hudi's spark-procedures create_savepoint /
delete_savepoint / rollback_to_savepoint; gluten's hudi module scans
the tables those services maintain (gluten-hudi/src/main/scala)."""

from __future__ import annotations

import pytest

from incubator_gluten_spark.sources import hudi_format as hudi


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string").coalesce(1)


def _vals(spark, root, **kw):
    return sorted(
        map(tuple, hudi.read_table(spark, root, **kw).collect())
    )


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "hudi_sp")
    hudi.create_table(_mk(spark, [(1, "a"), (2, "b")]), root, "k")
    return root


def test_savepoint_pins_files_against_cleaner(table, spark):
    i1 = hudi.completed_instants(table)[-1]
    hudi.savepoint(table)  # pins i1's snapshot
    hudi.upsert(spark, _mk(spark, [(1, "a2")]), table, "k")  # rewrites group of k=1
    hudi.upsert(spark, _mk(spark, [(1, "a3")]), table, "k")
    out = hudi.clean(table, retain_file_versions=1)
    # cleaner ran, but the savepointed version of the rewritten group
    # survived: time travel to i1 still answers correctly
    assert _vals(spark, table, as_of=i1) == [(1, "a"), (2, "b")]
    assert _vals(spark, table) == [(1, "a3"), (2, "b")]
    # without the savepoint the same read refuses (horizon contract) —
    # prove the bypass is savepoint-specific, not a horizon hole
    hudi.delete_savepoint(table, i1)
    with pytest.raises(hudi.HudiFormatError, match="cleaner horizon"):
        hudi.read_table(spark, table, as_of=i1)


def test_restore_rewinds_multiple_commits(table, spark):
    i1 = hudi.completed_instants(table)[-1]
    hudi.savepoint(table, i1)
    hudi.upsert(spark, _mk(spark, [(3, "c")]), table, "k")
    hudi.upsert(spark, _mk(spark, [(1, "a2"), (4, "d")]), table, "k")
    assert _vals(spark, table) == [(1, "a2"), (2, "b"), (3, "c"), (4, "d")]
    out = hudi.restore_to_savepoint(table, i1)
    assert out["commits_rolled_back"] == 2
    assert out["files_deleted"] >= 2
    assert _vals(spark, table) == [(1, "a"), (2, "b")]
    # the table keeps working: a fresh commit lands on the restored head
    hudi.upsert(spark, _mk(spark, [(5, "e")]), table, "k")
    assert _vals(spark, table) == [(1, "a"), (2, "b"), (5, "e")]


def test_restore_without_savepoint_refuses(table, spark):
    i1 = hudi.completed_instants(table)[-1]
    hudi.upsert(spark, _mk(spark, [(3, "c")]), table, "k")
    with pytest.raises(ValueError, match="not savepointed"):
        hudi.restore_to_savepoint(table, i1)


def test_savepoint_bookkeeping_refusals(table, spark):
    i1 = hudi.completed_instants(table)[-1]
    hudi.savepoint(table, i1)
    with pytest.raises(ValueError, match="already savepointed"):
        hudi.savepoint(table, i1)
    with pytest.raises(ValueError, match="not a completed commit"):
        hudi.savepoint(table, "99999999999999999")
    with pytest.raises(ValueError, match="no savepoint"):
        hudi.delete_savepoint(table, "99999999999999999")
    assert hudi.savepoints(table) == [i1]
    hudi.delete_savepoint(table, i1)
    assert hudi.savepoints(table) == []


def test_savepoint_behind_horizon_refuses(table, spark):
    i1 = hudi.completed_instants(table)[-1]
    hudi.upsert(spark, _mk(spark, [(1, "a2")]), table, "k")
    hudi.upsert(spark, _mk(spark, [(1, "a3")]), table, "k")
    hudi.clean(table, retain_file_versions=1)
    with pytest.raises(ValueError, match="behind the clean horizon"):
        hudi.savepoint(table, i1)


def test_restore_then_incremental_window_resets(table, spark):
    i1 = hudi.completed_instants(table)[-1]
    hudi.savepoint(table, i1)
    hudi.upsert(spark, _mk(spark, [(3, "c")]), table, "k")
    i2 = hudi.completed_instants(table)[-1]
    hudi.restore_to_savepoint(table, i1)
    # the rolled-back commit is gone from the timeline entirely
    assert hudi.completed_instants(table) == [i1]
    # incremental pull over the (now-empty) later window yields nothing
    inc = hudi.read_incremental(spark, table, i1)
    assert inc.count() == 0
