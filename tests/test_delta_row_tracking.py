"""Delta ROW TRACKING (PROTOCOL.md "Row Tracking", writer feature
``rowTracking`` + domain metadata ``delta.rowTracking``): every add
carries baseRowId/defaultRowCommitVersion, fresh ids are baseRowId +
position, the high-water mark only advances, OPTIMIZE preserves ids by
materializing them, and DV deletes keep ids stable for free.

Reference analog: Delta exposes row ids via _metadata on tracked
tables; gluten-delta scans them through the jar."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import delta_protocol as dp
from incubator_gluten_spark.sources.delta_protocol import DeltaProtocolError


def _mk(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .coalesce(2)
    )


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "rowtrack")
    dp.create_table(_mk(spark, 0, 100), root, row_tracking=True)
    return root


def _ids(spark, root, **kw):
    t = dp.read_table_with_row_ids(spark, root, **kw)
    return {r["k"]: (r["_row_id"], r["_row_commit_version"]) for r in t.collect()}


def test_fresh_ids_are_dense_unique_and_monotonic(table, spark):
    snap = dp.resolve(spark, table)
    assert "rowTracking" in snap.protocol["writerFeatures"]
    ids = _ids(spark, table)
    rid = sorted(i for i, _ in ids.values())
    assert rid == list(range(100))  # dense from 0, no gaps, no dupes
    assert all(cv == 0 for _, cv in ids.values())
    hwm = json.loads(snap.domains["delta.rowTracking"])["rowIdHighWaterMark"]
    assert hwm == 99
    # append advances the mark; new rows get ids ABOVE every old id
    dp.append(_mk(spark, 100, 150), table)
    ids2 = _ids(spark, table)
    new = {k: v for k, v in ids2.items() if k >= 100}
    assert sorted(i for i, _ in new.values()) == list(range(100, 150))
    assert all(cv == 1 for _, cv in new.values())
    # old rows kept their ids
    assert {k: v for k, v in ids2.items() if k < 100} == ids


def test_optimize_preserves_row_ids(table, spark):
    dp.append(_mk(spark, 100, 150), table)
    before = _ids(spark, table)
    out = dp.optimize(spark, table, min_files=2)
    assert out["files_added"] >= 1
    after = _ids(spark, table)
    assert after == before  # identity stable across compaction
    # the hwm STILL advanced (rewritten adds get fresh base ranges) —
    # fresh ids can never collide with materialized ones
    snap = dp.resolve(spark, table)
    hwm = json.loads(snap.domains["delta.rowTracking"])["rowIdHighWaterMark"]
    assert hwm >= 149
    dp.append(_mk(spark, 150, 160), table)
    ids3 = _ids(spark, table)
    fresh = [i for k, (i, _) in ids3.items() if k >= 150]
    assert min(fresh) > max(i for i, _ in before.values())


def test_dv_delete_keeps_surviving_ids(table, spark):
    before = _ids(spark, table)
    dp.delete_where_dv(spark, table, "k % 10 = 0")
    after = _ids(spark, table)
    assert set(after) == {k for k in before if k % 10 != 0}
    assert all(after[k] == before[k] for k in after)


def test_cow_update_preserves_row_ids(table, spark):
    """r11 verdict directive #7: UPDATE carries the materialized id
    columns through the rewrite (OPTIMIZE's shape) — every row keeps
    its id; updated rows take the UPDATE's commit as their
    row-commit-version, untouched rows in the rewritten file keep
    theirs."""
    before = _ids(spark, table)
    out = dp.update_where(spark, table, "k < 10", {"v": "v + 1000"})
    assert out["files_rewritten"] >= 1
    after = _ids(spark, table)
    assert {k: i for k, (i, _) in after.items()} == {
        k: i for k, (i, _) in before.items()
    }  # ids stable across the COW rewrite
    for k in range(10):
        assert after[k][1] == out["version"]  # last-modification version
    for k in range(10, 100):
        assert after[k][1] == before[k][1]
    # updated VALUES landed
    vals = {
        r["k"]: r["v"] for r in dp.read_table(spark, table).collect()
    }
    assert vals[3] == 1006 and vals[50] == 100


def test_cow_delete_preserves_surviving_row_ids(table, spark):
    before = _ids(spark, table)
    dp.delete_where(spark, table, "k % 10 = 0")
    after = _ids(spark, table)
    assert set(after) == {k for k in range(100) if k % 10 != 0}
    assert all(after[k] == before[k] for k in after)  # id AND cv stable


def test_row_ids_survive_checkpoint_and_restore(table, spark):
    dp.append(_mk(spark, 100, 120), table)
    before = _ids(spark, table)
    dp.checkpoint(spark, table)
    dp.append(_mk(spark, 120, 130), table)
    assert {k: v for k, v in _ids(spark, table).items() if k < 120} == before
    dp.restore(spark, table, 1)
    assert _ids(spark, table) == before  # ids restored with the snapshot


def test_untracked_table_refuses_row_id_read(spark, tmp_path):
    root = str(tmp_path / "untracked")
    dp.create_table(_mk(spark, 0, 10), root)
    with pytest.raises(DeltaProtocolError, match="row tracking"):
        dp.read_table_with_row_ids(spark, root)
    snap = dp.resolve(spark, root)
    assert all(a.get("baseRowId") is None for a in snap.adds)


def test_plain_reads_never_see_materialized_columns(table, spark):
    dp.optimize(spark, table, min_files=1)
    t = dp.read_table(spark, table)
    assert t.columns == ["k", "v"]
    assert t.count() == 100


def test_merge_preserves_row_ids_inserts_get_fresh(table, spark):
    """MERGE on a tracked table: matched rows keep their id (cv moves
    to the merge commit), untouched-in-rewritten-file rows keep both,
    inserted rows get FRESH ids above the old high-water mark."""
    before = _ids(spark, table)
    hwm_before = max(i for i, _ in before.values())
    src = (
        spark.range(95, 110)
        .select(F.col("id").alias("k"), F.lit(-1).cast("long").alias("v"))
        .coalesce(1)
    )
    out = dp.merge(spark, table, src, "k")
    assert out["files_rewritten"] >= 1
    after = _ids(spark, table)
    # matched keys 95..99: same id, cv = merge version
    for k in range(95, 100):
        assert after[k][0] == before[k][0]
        assert after[k][1] == out["version"]
    # untouched keys: id AND cv stable
    for k in range(0, 95):
        assert after[k] == before[k]
    # inserted keys 100..109: fresh ids above the old hwm, unique
    fresh = [after[k][0] for k in range(100, 110)]
    assert min(fresh) > hwm_before and len(set(fresh)) == 10
    assert all(after[k][1] == out["version"] for k in range(100, 110))
    # all ids unique table-wide
    assert len({i for i, _ in after.values()}) == len(after)


def test_merge_clauses_preserves_row_ids(table, spark):
    """Clause-merge (conditional update + delete + insert) keeps target
    row identity: updated rows keep id + take the merge commit as cv,
    deleted rows vanish, kept rows stable, inserts fresh."""
    before = _ids(spark, table)
    hwm_before = max(i for i, _ in before.values())
    src = (
        spark.range(90, 105)
        .select(F.col("id").alias("k"), F.lit(-5).cast("long").alias("v"))
        .coalesce(1)
    )
    out = dp.merge_clauses(
        spark,
        table,
        src,
        "k",
        [
            {"when": "matched", "condition": "t.k < 95",
             "action": "update", "set": {"v": "s.v"}},
            {"when": "matched", "action": "delete"},
            {"when": "not_matched", "action": "insert_all"},
        ],
    )
    after = _ids(spark, table)
    # updated keys 90..94: id stable, cv = merge commit
    for k in range(90, 95):
        assert after[k][0] == before[k][0]
        assert after[k][1] == out["version"]
    # deleted keys 95..99 gone
    assert all(k not in after for k in range(95, 100))
    # untouched keys: id AND cv stable
    for k in range(0, 90):
        assert after[k] == before[k]
    # inserted keys 100..104: fresh ids above the old hwm
    fresh = [after[k][0] for k in range(100, 105)]
    assert min(fresh) > hwm_before and len(set(fresh)) == 5
    assert len({i for i, _ in after.values()}) == len(after)
