"""Hudi MOR SAVEPOINT / RESTORE (hudi_mor.savepoint +
restore_to_savepoint): restore on a merge-on-read table must rewind
LOG BLOCKS (block surgery on shared log files), delete post-savepoint
base files including compaction outputs, and keep earlier blocks
readable.

Reference analog: Hudi's rollback_to_savepoint on MOR tables; gluten's
hudi module scans the restored tables."""

from __future__ import annotations

import pytest

from incubator_gluten_spark.sources import hudi_format as hf
from incubator_gluten_spark.sources import hudi_mor as mor


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string").coalesce(1)


def _vals(spark, root, **kw):
    return sorted(
        map(tuple, mor.read_table(spark, root, **kw).collect())
    )


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "mor_sp")
    mor.create_table(_mk(spark, [(1, "a"), (2, "b")]), root, "k")
    return root


def test_restore_truncates_log_blocks(table, spark):
    mor.upsert(spark, _mk(spark, [(1, "a2")]), table, "k")  # log block 1
    i2 = mor.completed_instants(table)[-1]
    out_sp = mor.savepoint(table, i2)
    assert out_sp["files_retained"] >= 2  # base + its log
    mor.upsert(spark, _mk(spark, [(1, "a3"), (2, "b2")]), table, "k")  # block 2
    assert _vals(spark, table) == [(1, "a3"), (2, "b2")]
    out = mor.restore_to_savepoint(table, i2)
    assert out["commits_rolled_back"] == 1
    # this writer emits one log file per upsert, so the later blocks
    # leave via whole-file deletion; block surgery is pinned separately
    assert out["files_deleted"] >= 1
    assert _vals(spark, table) == [(1, "a2"), (2, "b")]
    # table keeps taking writes on the restored head
    mor.upsert(spark, _mk(spark, [(3, "c")]), table, "k")
    assert _vals(spark, table) == [(1, "a2"), (2, "b"), (3, "c")]


def test_restore_removes_compaction_output(table, spark):
    mor.upsert(spark, _mk(spark, [(1, "a2")]), table, "k")
    i2 = mor.completed_instants(table)[-1]
    mor.savepoint(table, i2)
    mor.upsert(spark, _mk(spark, [(2, "b2")]), table, "k")
    mor.compact(spark, table)
    assert _vals(spark, table) == [(1, "a2"), (2, "b2")]
    out = mor.restore_to_savepoint(table, i2)
    assert out["commits_rolled_back"] == 2  # upsert + compaction
    assert _vals(spark, table) == [(1, "a2"), (2, "b")]


def test_savepoint_bookkeeping_shared_with_cow(table, spark):
    i1 = mor.completed_instants(table)[-1]
    mor.savepoint(table)
    assert hf.savepoints(table) == [i1]
    with pytest.raises(ValueError, match="already savepointed"):
        mor.savepoint(table, i1)
    with pytest.raises(ValueError, match="not savepointed"):
        mor.restore_to_savepoint(table, "99999999999999999")
    hf.delete_savepoint(table, i1)
    assert hf.savepoints(table) == []


def test_restore_resets_incremental_window(table, spark):
    i1 = mor.completed_instants(table)[-1]
    mor.savepoint(table, i1)
    mor.upsert(spark, _mk(spark, [(3, "c")]), table, "k")
    mor.restore_to_savepoint(table, i1)
    assert mor.completed_instants(table) == [i1]
    assert mor.read_incremental(spark, table, i1).count() == 0


def test_block_surgery_on_multi_instant_log_file(table, spark):
    """A log file holding blocks from TWO deltacommits (legal layout —
    real Hudi writers append) keeps the earlier block after restore."""
    import os

    mor.upsert(spark, _mk(spark, [(1, "a2")]), table, "k")
    i2 = mor.completed_instants(table)[-1]
    mor.savepoint(table, i2)
    mor.upsert(spark, _mk(spark, [(1, "a3")]), table, "k")
    i3 = mor.completed_instants(table)[-1]
    # merge the i3 log file's blocks INTO the i2 log file (append), as
    # a writer reusing the file would have laid them out
    logs = sorted(mor._log_files(table), key=lambda t: t[3])
    assert len(logs) >= 2
    keep_path = logs[0][4]
    merged = []
    for _p, _f, _b, _v, path in logs:
        with open(path, "rb") as fh:
            merged.extend(mor.unpack_log_blocks(fh.read()))
        if path != keep_path:
            os.remove(path)
    with open(keep_path, "wb") as fh:
        for t, h, c in merged:
            fh.write(mor.pack_log_block(t, h, c))
    assert _vals(spark, table) == [(1, "a3"), (2, "b")]
    out = mor.restore_to_savepoint(table, i2)
    assert out["logs_truncated"] == 1  # surgery: file kept, tail cut
    assert _vals(spark, table) == [(1, "a2"), (2, "b")]
