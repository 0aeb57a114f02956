"""Delta COLUMN MAPPING (name mode) pins — PROTOCOL.md "Column Mapping".

The invariants that make the feature the feature:
* data files / add.partitionValues keys / stats keys carry PHYSICAL
  names (col-<uuid>), never logical ones;
* rename/drop/add column are metadata-ONLY commits (zero add/remove
  actions) and old data files stay readable afterwards;
* the protocol announces the requirement (minReaderVersion 2 legacy, or
  3 + readerFeatures after a DV upgrade) and unsupported modes refuse;
* every mutation path (COW delete/update/merge, DV delete, CDF) keeps
  working on a mapped table, including stats-based file skipping keyed
  by the physical name.

Reference test analog: gluten-delta/src/test/scala/org/apache/gluten/
execution/DeltaSuite.scala (Delta scans exercised through the plugin);
the mapping semantics come from delta-io/delta PROTOCOL.md.
"""

from __future__ import annotations

import json
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


def _mapped(spark, tmp_path, name, rows=None, partition=None, conf=None):
    root = str(tmp_path / name)
    dp.create_table(
        _mk(spark, rows or [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "a")]),
        root,
        partition_cols=partition or [],
        configuration=conf,
        column_mapping="name",
    )
    return root


def _commit_action_kinds(root, version):
    return sorted(
        {k for a in dp._read_commit_actions(root, version) for k in a}
    )


# ---------------------------------------------------------------------------
# physical-name invariants


def test_data_files_carry_physical_names_only(spark, tmp_path):
    root = _mapped(spark, tmp_path, "phys", partition=["grp"])
    snap = dp.resolve(spark, root)
    raw = spark.read.parquet(os.path.join(root, snap.adds[0]["path"]))
    assert all(c.startswith("col-") for c in raw.columns), raw.columns
    assert not {"k", "price", "grp"} & set(raw.columns)


def test_partition_values_and_stats_keyed_physical(spark, tmp_path):
    root = _mapped(spark, tmp_path, "keys", partition=["grp"])
    snap = dp.resolve(spark, root)
    mapping = dp._physical_names(snap.metadata)
    for add in snap.adds:
        assert set(add["partitionValues"]) == {mapping["grp"]}
        stats = json.loads(add["stats"])
        assert set(stats["minValues"]) <= {mapping["k"], mapping["price"]}
        assert mapping["k"] in stats["minValues"]


def test_read_returns_logical_names_and_values(spark, tmp_path):
    root = _mapped(spark, tmp_path, "read", partition=["grp"])
    got = dp.read_table(spark, root)
    assert got.columns == ["k", "price", "grp"]
    assert _rows(got) == _rows(
        _mk(spark, [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "a")])
    )


def test_protocol_announces_mapping(spark, tmp_path):
    root = _mapped(spark, tmp_path, "proto")
    snap = dp.resolve(spark, root)
    assert snap.protocol["minReaderVersion"] == 2
    assert snap.protocol["minWriterVersion"] == 5


def test_unsupported_mapping_mode_refused(spark, tmp_path):
    with pytest.raises(DeltaProtocolError, match="id"):
        dp.create_table(
            _mk(spark, [(1, 1.0, "a")]),
            str(tmp_path / "idmode"),
            column_mapping="id",
        )
    # and a log that DEMANDS id mode refuses at read, not misreads
    root = _mapped(spark, tmp_path, "idmode2")
    path = os.path.join(root, "_delta_log", f"{0:020d}.json")
    out = []
    with open(path) as f:
        for line in f:
            a = json.loads(line)
            if "metaData" in a:
                a["metaData"]["configuration"][
                    "delta.columnMapping.mode"
                ] = "id"
            out.append(json.dumps(a))
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    with pytest.raises(DeltaProtocolError, match="not supported"):
        dp.read_table(spark, root)


def test_duplicate_physical_names_refused(spark, tmp_path):
    root = _mapped(spark, tmp_path, "dupphys")
    path = os.path.join(root, "_delta_log", f"{0:020d}.json")
    out = []
    with open(path) as f:
        for line in f:
            a = json.loads(line)
            if "metaData" in a:
                d = json.loads(a["metaData"]["schemaString"])
                phys = d["fields"][0]["metadata"][
                    "delta.columnMapping.physicalName"
                ]
                d["fields"][1]["metadata"][
                    "delta.columnMapping.physicalName"
                ] = phys
                a["metaData"]["schemaString"] = json.dumps(d)
            out.append(json.dumps(a))
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    with pytest.raises(DeltaProtocolError, match="corrupt"):
        dp.read_table(spark, root).collect()


# ---------------------------------------------------------------------------
# rename / drop / add are metadata-only


def test_rename_is_metadata_only_and_preserves_data(spark, tmp_path):
    root = _mapped(spark, tmp_path, "ren", partition=["grp"])
    files_before = {a["path"] for a in dp.resolve(spark, root).adds}
    v = dp.rename_column(spark, root, "price", "amount")
    assert _commit_action_kinds(root, v) == ["metaData"]
    snap = dp.resolve(spark, root)
    assert {a["path"] for a in snap.adds} == files_before
    got = dp.read_table(spark, root)
    assert got.columns == ["k", "amount", "grp"]
    assert got.agg(F.sum("amount")).first()[0] == 60.0


def test_rename_keeps_field_id_and_physical_name(spark, tmp_path):
    root = _mapped(spark, tmp_path, "renid")
    before = json.loads(dp.resolve(spark, root).metadata["schemaString"])
    dp.rename_column(spark, root, "price", "amount")
    after = json.loads(dp.resolve(spark, root).metadata["schemaString"])
    b = next(f for f in before["fields"] if f["name"] == "price")
    a = next(f for f in after["fields"] if f["name"] == "amount")
    assert a["metadata"] == b["metadata"]


def test_rename_partition_column_updates_partition_columns(spark, tmp_path):
    root = _mapped(spark, tmp_path, "renpart", partition=["grp"])
    dp.rename_column(spark, root, "grp", "bucket")
    snap = dp.resolve(spark, root)
    assert snap.partition_columns == ["bucket"]
    # pruning still works through the physical partitionValues key
    out = dp.delete_where(spark, root, "bucket = 'a'")
    assert out["files_skipped"] > 0
    assert _rows(dp.read_table(spark, root).select("k")) == [(2,)]


def test_rename_collision_and_missing_refused(spark, tmp_path):
    root = _mapped(spark, tmp_path, "rencoll")
    with pytest.raises(DeltaProtocolError, match="already exists"):
        dp.rename_column(spark, root, "price", "k")
    with pytest.raises(DeltaProtocolError, match="no such column"):
        dp.rename_column(spark, root, "nope", "x")


def test_rename_without_mapping_refused(spark, tmp_path):
    root = str(tmp_path / "nomap")
    dp.create_table(_mk(spark, [(1, 1.0, "a")]), root)
    with pytest.raises(DeltaProtocolError, match="column mapping"):
        dp.rename_column(spark, root, "price", "amount")


def test_drop_column_metadata_only_file_keeps_bytes(spark, tmp_path):
    root = _mapped(spark, tmp_path, "drop")
    snap0 = dp.resolve(spark, root)
    phys_price = dp._physical_names(snap0.metadata)["price"]
    v = dp.drop_column(spark, root, "price")
    assert _commit_action_kinds(root, v) == ["metaData"]
    got = dp.read_table(spark, root)
    assert got.columns == ["k", "grp"]
    # the physical column is still in the file — only the mapping hides it
    raw = spark.read.parquet(
        os.path.join(root, dp.resolve(spark, root).adds[0]["path"])
    )
    assert phys_price in raw.columns


def test_drop_partition_or_last_column_refused(spark, tmp_path):
    root = _mapped(spark, tmp_path, "droppart", partition=["grp"])
    with pytest.raises(DeltaProtocolError, match="partition"):
        dp.drop_column(spark, root, "grp")


def test_add_column_old_files_read_null_new_physical(spark, tmp_path):
    root = _mapped(spark, tmp_path, "add")
    dp.add_column(spark, root, "note", "string")
    got = dp.read_table(spark, root)
    assert got.columns == ["k", "price", "grp", "note"]
    assert got.filter("note IS NULL").count() == 3
    # maxColumnId advanced and the new field has a fresh id
    snap = dp.resolve(spark, root)
    conf = snap.metadata["configuration"]
    assert conf["delta.columnMapping.maxColumnId"] == "4"
    fields = json.loads(snap.metadata["schemaString"])["fields"]
    ids = [f["metadata"]["delta.columnMapping.id"] for f in fields]
    assert len(set(ids)) == 4


def test_drop_then_readd_gets_fresh_physical_no_resurrection(spark, tmp_path):
    """Re-adding a dropped logical name must NOT resurrect the dropped
    column's stored bytes: the new field has a new physical name, so old
    files read NULL for it."""
    root = _mapped(spark, tmp_path, "readd")
    snap0 = dp.resolve(spark, root)
    old_phys = dp._physical_names(snap0.metadata)["price"]
    dp.drop_column(spark, root, "price")
    dp.add_column(spark, root, "price", "double")
    snap = dp.resolve(spark, root)
    assert dp._physical_names(snap.metadata)["price"] != old_phys
    got = dp.read_table(spark, root)
    assert got.filter("price IS NULL").count() == 3


def test_append_after_rename_unifies_old_and_new_files(spark, tmp_path):
    root = _mapped(spark, tmp_path, "appren", partition=["grp"])
    dp.rename_column(spark, root, "price", "amount")
    dp.append(
        spark.createDataFrame(
            [(9, 90.0, "c")], "k bigint, amount double, grp string"
        ),
        root,
    )
    got = dp.read_table(spark, root)
    assert got.agg(F.sum("amount")).first()[0] == 150.0
    # both generations of data files share the SAME physical name
    snap = dp.resolve(spark, root)
    phys = dp._physical_names(snap.metadata)["amount"]
    for add in snap.adds:
        raw = spark.read.parquet(os.path.join(root, add["path"]))
        assert phys in raw.columns


# ---------------------------------------------------------------------------
# mutations on mapped tables


def test_merge_stats_skipping_uses_physical_key(spark, tmp_path):
    """File skipping must key the stats lookup by the PHYSICAL name —
    a logical-name lookup finds nothing and silently rewrites
    everything (files_skipped == 0 would be the regression)."""
    root = str(tmp_path / "mapmerge")
    dp.create_table(
        _mk(spark, [(1, 10.0, "a"), (2, 20.0, "a")]),
        root,
        column_mapping="name",
    )
    dp.append(_mk(spark, [(100, 1.0, "b"), (200, 2.0, "b")]), root)
    src = spark.createDataFrame(
        [(100, 5.0, "b")], "k bigint, price double, grp string"
    )
    out = dp.merge(spark, root, src, "k")
    assert out["files_skipped"] == 1 and out["files_rewritten"] == 1
    assert _rows(dp.read_table(spark, root).filter("k = 100")) == [
        (100, 5.0, "b")
    ]


def test_dv_delete_on_mapped_table_keeps_mapping_feature(spark, tmp_path):
    root = _mapped(spark, tmp_path, "mapdv")
    dp.delete_where_dv(spark, root, "k = 2")
    snap = dp.resolve(spark, root)
    assert "columnMapping" in (snap.protocol.get("readerFeatures") or [])
    assert "deletionVectors" in (snap.protocol.get("readerFeatures") or [])
    assert _rows(dp.read_table(spark, root).select("k")) == [(1,), (3,)]
    # and a COW update after the DV must not resurrect the deleted row
    dp.update_where(spark, root, "k = 1", {"price": "price + 1"})
    assert _rows(dp.read_table(spark, root).select("k")) == [(1,), (3,)]


def test_cdf_across_rename_reads_end_schema(spark, tmp_path):
    """CDF over a range that spans a rename resolves every commit with
    the END version's schema (physical names are rename-stable) — the
    per-commit-schema alternative cannot even union the frames."""
    root = _mapped(
        spark,
        tmp_path,
        "mapcdf",
        conf={"delta.enableChangeDataFeed": "true"},
    )
    dp.rename_column(spark, root, "price", "amount")  # v1
    dp.append(
        spark.createDataFrame(
            [(9, 90.0, "c")], "k bigint, amount double, grp string"
        ),
        root,
    )  # v2
    dp.update_where(spark, root, "k = 9", {"amount": "amount * 2"})  # v3
    ch = dp.table_changes(spark, root, 0, 3)
    assert "amount" in ch.columns and "price" not in ch.columns
    counts = {
        (r["_commit_version"], r["_change_type"]): r["n"]
        for r in ch.groupBy("_commit_version", "_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts == {
        (0, "insert"): 3,
        (2, "insert"): 1,
        (3, "update_preimage"): 1,
        (3, "update_postimage"): 1,
    }


def test_checkpoint_roundtrip_preserves_mapping(spark, tmp_path):
    root = _mapped(spark, tmp_path, "mapck", partition=["grp"])
    dp.rename_column(spark, root, "price", "amount")
    dp.checkpoint(spark, root)
    # drop the JSON commits the checkpoint covers: replay must come
    # from the checkpoint alone and still map names
    got = dp.read_table(spark, root)
    assert got.columns == ["k", "amount", "grp"]
    assert got.count() == 3
