"""Iceberg WRITE-AUDIT-PUBLISH (wap.id staged appends +
system.cherrypick_snapshot), system.rollback_to_snapshot and
system.fast_forward — the spec's snapshot-lineage procedures.

Reference analog: Iceberg spark-procedures CherrypickSnapshot /
RollbackToSnapshot / FastForwardBranch; gluten-iceberg
(gluten-iceberg/src/main/scala) scans the published tables through the
jar — the procedures themselves are table-format behavior."""

from __future__ import annotations

import pytest

from incubator_gluten_spark.sources import iceberg_format as ice


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, grp string").coalesce(1)


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "wap")
    ice.create_table(_mk(spark, [(1, "a"), (2, "b")]), root)
    return root


def test_wap_stage_is_invisible_until_cherrypick(table, spark):
    staged = ice.append(_mk(spark, [(3, "c")]), table, wap_id="etl-42")
    # AUDIT: main readers see nothing; the staged snapshot reads by id
    assert len(_rows(ice.read_table(spark, table))) == 2
    by_id = ice.read_table(spark, table, snapshot_id=staged["snapshot-id"])
    assert len(_rows(by_id)) == 3
    # PUBLISH: parent == current -> fast-forward to the staged snapshot
    out = ice.cherrypick_snapshot(table, wap_id="etl-42")
    assert out["mode"] == "fast-forward"
    assert out["published_snapshot_id"] == staged["snapshot-id"]
    assert _rows(ice.read_table(spark, table)) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]


def test_cherrypick_replays_when_main_moved(table, spark):
    staged = ice.append(_mk(spark, [(3, "c")]), table, wap_id="w1")
    ice.append(_mk(spark, [(4, "d")]), table)  # main advances past stage
    out = ice.cherrypick_snapshot(table, snapshot_id=staged["snapshot-id"])
    assert out["mode"] == "replay"
    # the replayed snapshot has BOTH the interleaved append and the pick
    assert _rows(ice.read_table(spark, table)) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d"),
    ]
    meta = ice._current_metadata(table)
    cur = ice._snapshot(meta, None)
    assert cur["summary"]["published-wap-id"] == "w1"
    assert cur["summary"]["source-snapshot-id"] == str(
        staged["snapshot-id"]
    )


def test_wap_duplicate_publish_and_duplicate_stage_refuse(table, spark):
    ice.append(_mk(spark, [(3, "c")]), table, wap_id="w1")
    with pytest.raises(ValueError, match="already used"):
        ice.append(_mk(spark, [(9, "z")]), table, wap_id="w1")
    ice.cherrypick_snapshot(table, wap_id="w1")
    # fast-forwarded snapshot is now in main ancestry -> second pick refuses
    with pytest.raises(ValueError, match="already in the main ancestry"):
        ice.cherrypick_snapshot(table, wap_id="w1")
    # replay-published wap ids are blocked by the published marker too
    s2 = ice.append(_mk(spark, [(5, "e")]), table, wap_id="w2")
    ice.append(_mk(spark, [(6, "f")]), table)
    ice.cherrypick_snapshot(table, snapshot_id=s2["snapshot-id"])
    with pytest.raises(ValueError, match="already published"):
        ice.cherrypick_snapshot(table, snapshot_id=s2["snapshot-id"])


def test_cherrypick_refuses_non_append_replay(table, spark):
    # a COW delete staged... cannot be staged; instead: pick a historical
    # non-append main snapshot after main moved -> ancestry refusal first,
    # so build a real stale append refusal path via a branch snapshot
    ice.create_branch(table, "side")
    ice.append(_mk(spark, [(7, "g")]), table, branch="side")
    ice.append(_mk(spark, [(8, "h")]), table)  # main moves
    side_id = ice.ref_snapshot_id(table, "side")
    out = ice.cherrypick_snapshot(table, snapshot_id=side_id)
    assert out["mode"] == "replay"  # branch append replays fine
    got = _rows(ice.read_table(spark, table))
    assert (7, "g") in got and (8, "h") in got


def test_staged_snapshot_never_leaks_into_changelog(table, spark):
    ice.append(_mk(spark, [(3, "c")]), table)  # snap 2 on main
    ice.append(_mk(spark, [(9, "z")]), table, wap_id="never")  # snap 3 staged
    ice.append(_mk(spark, [(4, "d")]), table)  # snap 4 on main
    end = ice._current_metadata(table)["current-snapshot-id"]
    cl = ice.read_changelog(spark, table, 1, end)
    got = sorted((r["k"], r["_change_type"]) for r in cl.collect())
    assert got == [(3, "insert"), (4, "insert")]


def test_rollback_to_snapshot_moves_current_back(table, spark):
    ice.append(_mk(spark, [(3, "c")]), table)
    ice.append(_mk(spark, [(4, "d")]), table)
    out = ice.rollback_to_snapshot(table, 2)
    assert out == {"previous_snapshot_id": 3, "current_snapshot_id": 2}
    assert len(_rows(ice.read_table(spark, table))) == 3
    # rolled-past snapshot still time-travels by id until expiry
    assert len(_rows(ice.read_table(spark, table, snapshot_id=3))) == 4
    # a fresh append parents off the rolled-back head
    ice.append(_mk(spark, [(5, "e")]), table)
    assert _rows(ice.read_table(spark, table)) == [
        (1, "a"), (2, "b"), (3, "c"), (5, "e"),
    ]


def test_rollback_refuses_non_ancestor(table, spark):
    ice.append(_mk(spark, [(3, "c")]), table)
    staged = ice.append(_mk(spark, [(9, "z")]), table, wap_id="w")
    with pytest.raises(ValueError, match="not an ancestor"):
        ice.rollback_to_snapshot(table, staged["snapshot-id"])
    with pytest.raises(ValueError, match="not found"):
        ice.rollback_to_snapshot(table, 99)


def test_fast_forward_branch_and_main(table, spark):
    # WAP-branch pattern: write to an audit branch, publish via ff(main)
    ice.create_branch(table, "audit")
    ice.append(_mk(spark, [(3, "c")]), table, branch="audit")
    ice.append(_mk(spark, [(4, "d")]), table, branch="audit")
    assert len(_rows(ice.read_table(spark, table))) == 2
    out = ice.fast_forward(table, "main", to="audit")
    assert out["from"] == 1 and out["to"] == ice.ref_snapshot_id(
        table, "audit"
    )
    assert _rows(ice.read_table(spark, table)) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d"),
    ]
    # now advance main and fast-forward the (behind) branch up to main
    ice.append(_mk(spark, [(5, "e")]), table)
    ice.fast_forward(table, "audit", to="main")
    assert ice.ref_snapshot_id(table, "audit") == (
        ice._current_metadata(table)["current-snapshot-id"]
    )


def test_fast_forward_refuses_divergence_and_tags(table, spark):
    ice.create_branch(table, "b1")
    ice.create_tag(table, "t1")
    ice.append(_mk(spark, [(3, "c")]), table, branch="b1")
    ice.append(_mk(spark, [(4, "d")]), table)  # main diverges from b1
    with pytest.raises(ValueError, match="not an ancestor"):
        ice.fast_forward(table, "b1", to="main")
    with pytest.raises(ValueError, match="not an ancestor"):
        ice.fast_forward(table, "main", to="b1")
    ice.append(_mk(spark, [(5, "e")]), table, branch="b1")
    with pytest.raises(ValueError, match="tag"):
        ice.fast_forward(table, "t1", to="b1")
