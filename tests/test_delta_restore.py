"""Delta RESTORE pins: the rewind is a NEW commit (history intact), the
file diff is exact (re-adds + removes, DV-descriptor-aware), vacuumed
targets refuse, metadata restores, and CDF records the restore as
explicit cdc deletes + inserts.

Reference analog: gluten-delta exercises Delta tables through the scan
(gluten-delta/src/test/scala/org/apache/gluten/execution/DeltaSuite.scala);
RESTORE semantics come from delta-io/delta PROTOCOL.md + the
RestoreTableCommand contract.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import delta_protocol as dp
from incubator_gluten_spark.sources.delta_protocol import DeltaProtocolError


def _rows(df):
    return sorted(map(tuple, df.collect()), key=lambda t: tuple(map(str, t)))


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, price double, grp string"
    ).coalesce(1)


def _three_version_table(spark, tmp_path, name, **create_kw):
    """v0 create (k=1,2), v1 append (k=3,4), v2 delete k IN (1,3) — a
    non-partition predicate, so the COW rewrite restages the kept rows
    into NEW files (restore must remove those and re-add the originals,
    exercising both sides of the diff)."""
    root = str(tmp_path / name)
    dp.create_table(
        _mk(spark, [(1, 10.0, "a"), (2, 20.0, "b")]),
        root,
        partition_cols=["grp"],
        **create_kw,
    )
    dp.append(_mk(spark, [(3, 30.0, "a"), (4, 40.0, "b")]), root)
    dp.delete_where(spark, root, "k IN (1, 3)")
    return root


def test_restore_rewinds_data_and_keeps_history(spark, tmp_path):
    root = _three_version_table(spark, tmp_path, "basic")
    out = dp.restore(spark, root, 1)
    assert out["version"] == 3
    assert out["files_readded"] > 0 and out["files_removed"] > 0
    got = dp.read_table(spark, root)
    assert _rows(got.select("k")) == [(1,), (2,), (3,), (4,)]
    # the in-between state is still time-travelable: v2 has the delete
    assert _rows(dp.read_table(spark, root, version=2).select("k")) == [
        (2,),
        (4,),
    ]


def test_restore_to_current_is_empty_commit(spark, tmp_path):
    root = _three_version_table(spark, tmp_path, "noop")
    out = dp.restore(spark, root, 2)
    assert out["files_removed"] == 0 and out["files_readded"] == 0
    assert dp._read_commit_actions(root, out["version"]) == []
    assert _rows(dp.read_table(spark, root).select("k")) == [(2,), (4,)]


def test_restore_to_future_version_raises(spark, tmp_path):
    root = _three_version_table(spark, tmp_path, "future")
    with pytest.raises(ValueError, match="latest"):
        dp.restore(spark, root, 9)


def test_restore_behind_vacuum_refuses(spark, tmp_path):
    """delete_where removed v0's grp='a' file from the live set; once its
    bytes are gone from disk (vacuum), restore to v1 must refuse."""
    root = _three_version_table(spark, tmp_path, "vac")
    snap1 = dp.resolve(spark, root, 1)
    snap2 = dp.resolve(spark, root, 2)
    gone = sorted(
        {a["path"] for a in snap1.adds} - {a["path"] for a in snap2.adds}
    )[0]
    os.remove(os.path.join(root, gone.replace("/", os.sep)))
    with pytest.raises(DeltaProtocolError, match="vacuumed"):
        dp.restore(spark, root, 1)


def test_restore_across_dv_delete_resurrects_exact_rows(spark, tmp_path):
    """A DV delete re-adds the file WITH a descriptor; restore to the
    pre-DV version must re-add it WITHOUT one (descriptor diff), and
    only those rows come back."""
    root = str(tmp_path / "dv")
    dp.create_table(
        _mk(spark, [(1, 10.0, "a"), (2, 20.0, "a"), (3, 30.0, "b")]), root
    )
    dp.delete_where_dv(spark, root, "k = 2")
    assert _rows(dp.read_table(spark, root).select("k")) == [(1,), (3,)]
    out = dp.restore(spark, root, 0)
    assert out["files_removed"] == 1 and out["files_readded"] == 1
    snap = dp.resolve(spark, root)
    assert not any(a.get("deletionVector") for a in snap.adds)
    assert _rows(dp.read_table(spark, root).select("k")) == [(1,), (2,), (3,)]


def test_restore_restores_metadata(spark, tmp_path):
    """RESTORE rewinds schema-level state too: a post-rename restore
    brings the old logical name back (mapped table, metadata action in
    the restore commit)."""
    root = str(tmp_path / "meta")
    dp.create_table(
        _mk(spark, [(1, 10.0, "a")]), root, column_mapping="name"
    )
    dp.rename_column(spark, root, "price", "amount")
    out = dp.restore(spark, root, 0)
    assert out["metadata_restored"] is True
    got = dp.read_table(spark, root)
    assert got.columns == ["k", "price", "grp"]
    kinds = {k for a in dp._read_commit_actions(root, out["version"]) for k in a}
    assert kinds == {"metaData"}  # pure metadata rewind: no file churn


def test_restore_with_cdf_writes_explicit_changes(spark, tmp_path):
    root = _three_version_table(
        spark,
        tmp_path,
        "cdf",
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    out = dp.restore(spark, root, 1)
    ch = dp.table_changes(spark, root, out["version"], out["version"])
    got = {
        (r["k"], r["_change_type"])
        for r in ch.select("k", "_change_type").collect()
    }
    # the delete at v2 dropped k=1,3 and restaged the kept rows into new
    # files; restoring to v1 removes the restage (k=2,4 leave as cdc
    # deletes) and re-adds the originals (k=1..4 return as inserts)
    assert got == {
        (2, "delete"),
        (4, "delete"),
        (1, "insert"),
        (2, "insert"),
        (3, "insert"),
        (4, "insert"),
    }


def test_restore_result_matches_target_snapshot_hash(spark, tmp_path):
    """End state == read_table at the target version, value-for-value."""
    root = _three_version_table(spark, tmp_path, "exact")
    want = _rows(dp.read_table(spark, root, version=1))
    dp.restore(spark, root, 1)
    assert _rows(dp.read_table(spark, root)) == want
