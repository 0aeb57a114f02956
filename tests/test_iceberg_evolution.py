"""Iceberg SCHEMA EVOLUTION pins (spec v1 "Schema Evolution"): field-id
column resolution is the whole feature — rename/add/drop are
metadata-only commits, every data-file generation stays readable, ids
are never reused, and the known Spark parquet-pushdown-by-name hazard is
shielded.

Reference analog: gluten-iceberg/src/main/scala/org/apache/gluten/
execution/IcebergScanTransformer.scala (scans offloaded via the jar);
the evolution semantics come from iceberg.apache.org/spec.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import iceberg_format as ice


def _rows(df):
    return sorted(map(tuple, df.collect()), key=lambda t: tuple(map(str, t)))


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, price double, grp string"
    ).coalesce(1)


def _tbl(spark, tmp_path, name, partition=None):
    root = str(tmp_path / name)
    ice.create_table(
        _mk(spark, [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "a")]),
        root,
        partition_cols=partition or [],
    )
    return root


def _n_snapshots(root):
    return len(ice._current_metadata(root)["snapshots"])


def test_data_files_carry_field_ids(spark, tmp_path):
    import pyarrow.parquet as pq

    root = _tbl(spark, tmp_path, "ids", partition=["grp"])
    f = ice.plan_files(root)[0]["file_path"]
    schema = pq.ParquetFile(os.path.join(root, f)).schema
    got = {schema.column(i).name for i in range(len(schema))}
    assert got == {"k", "price", "grp"}
    # true parquet field_id on every column, incl. the re-attached
    # partition column (the spec REQUIRES ids in data files)
    repr_ = repr(schema)
    for i in (1, 2, 3):
        assert f"field_id={i}" in repr_, repr_


def test_rename_is_metadata_only_and_resolves_old_files(spark, tmp_path):
    root = _tbl(spark, tmp_path, "ren", partition=["grp"])
    snaps_before = _n_snapshots(root)
    files_before = {f["file_path"] for f in ice.plan_files(root)}
    ice.rename_column(root, "price", "amount")
    assert _n_snapshots(root) == snaps_before  # no new snapshot
    assert {f["file_path"] for f in ice.plan_files(root)} == files_before
    got = ice.read_table(spark, root)
    assert got.columns == ["k", "amount", "grp"]
    assert got.agg(F.sum("amount")).first()[0] == 60.0


def test_rename_keeps_field_id(spark, tmp_path):
    root = _tbl(spark, tmp_path, "renid")
    before = ice._current_schema(ice._current_metadata(root))
    old_id = next(f["id"] for f in before["fields"] if f["name"] == "price")
    ice.rename_column(root, "price", "amount")
    after = ice._current_schema(ice._current_metadata(root))
    assert (
        next(f["id"] for f in after["fields"] if f["name"] == "amount")
        == old_id
    )


def test_rename_collision_and_missing_refused(spark, tmp_path):
    root = _tbl(spark, tmp_path, "rencoll")
    with pytest.raises(ValueError, match="already exists"):
        ice.rename_column(root, "price", "k")
    with pytest.raises(ValueError, match="no such column"):
        ice.rename_column(root, "nope", "x")


def test_append_after_rename_both_generations_resolve(spark, tmp_path):
    root = _tbl(spark, tmp_path, "appren", partition=["grp"])
    ice.rename_column(root, "price", "amount")
    ice.append(
        spark.createDataFrame(
            [(9, 90.0, "c")], "k bigint, amount double, grp string"
        ).coalesce(1),
        root,
    )
    got = ice.read_table(spark, root)
    assert got.agg(F.sum("amount")).first()[0] == 150.0
    # old files physically say 'price', new ones 'amount' — same id
    names = set()
    for f in ice.plan_files(root):
        import pyarrow.parquet as pq

        sch = pq.ParquetFile(os.path.join(root, f["file_path"])).schema
        names |= {sch.column(i).name for i in range(len(sch))}
    assert {"price", "amount"} <= names


def test_add_column_old_files_read_null(spark, tmp_path):
    root = _tbl(spark, tmp_path, "add")
    ice.add_column(root, "note", "string")
    got = ice.read_table(spark, root)
    assert got.columns == ["k", "price", "grp", "note"]
    assert got.filter("note IS NULL").count() == 3
    meta = ice._current_metadata(root)
    assert meta["last-column-id"] == 4


def test_drop_column_and_partition_refusals(spark, tmp_path):
    root = _tbl(spark, tmp_path, "drop", partition=["grp"])
    ice.drop_column(root, "price")
    assert ice.read_table(spark, root).columns == ["k", "grp"]
    with pytest.raises(ValueError, match="partition source"):
        ice.drop_column(root, "grp")
    with pytest.raises(ValueError, match="no such column"):
        ice.drop_column(root, "price")


def test_drop_readd_no_resurrection_even_filtered(spark, tmp_path):
    """Ids are never reused: re-adding a dropped name reads NULL from old
    files.  The FILTERED read is the hard part — Spark's parquet
    pushdown matches by NAME (verified upstream hazard), so without the
    synthetic-name shield an IS NULL filter on the re-added column is
    wrongly evaluated against the dropped column's bytes and returns 0
    rows."""
    root = _tbl(spark, tmp_path, "readd")
    ice.drop_column(root, "price")
    ice.add_column(root, "price", "double")
    got = ice.read_table(spark, root)
    assert got.filter("price IS NULL").count() == 3
    assert _rows(got.select("k", "price")) == [
        (1, None),
        (2, None),
        (3, None),
    ]


def test_swap_rename_binds_by_id_not_name(spark, tmp_path):
    """The killer test for name-based readers: swap two column names via
    a temp rename.  Values must follow their IDS — after the swap,
    logical 'price' is the old 'k' ints and vice versa."""
    root = str(tmp_path / "swap")
    ice.create_table(
        spark.createDataFrame(
            [(1.0, 100.0), (2.0, 200.0)], "k double, price double"
        ).coalesce(1),
        root,
    )
    ice.rename_column(root, "k", "tmp")
    ice.rename_column(root, "price", "k")
    ice.rename_column(root, "tmp", "price")
    got = ice.read_table(spark, root)
    assert _rows(got.select("k", "price")) == [(100.0, 1.0), (200.0, 2.0)]
    # and a pushed filter on the swapped name must not hit the old
    # same-named physical column
    assert got.filter("k = 100.0").count() == 1


def test_time_travel_reads_snapshot_schema(spark, tmp_path):
    root = _tbl(spark, tmp_path, "tt", partition=["grp"])
    ice.rename_column(root, "price", "amount")
    ice.append(
        spark.createDataFrame(
            [(9, 90.0, "c")], "k bigint, amount double, grp string"
        ).coalesce(1),
        root,
    )
    old = ice.read_table(spark, root, snapshot_id=1)
    assert old.columns == ["k", "price", "grp"]  # pre-rename schema
    assert old.count() == 3
    assert ice.read_table(spark, root).columns == ["k", "amount", "grp"]


def test_partition_filter_survives_partition_rename(spark, tmp_path):
    """Old manifests key partition tuples by the old name; the filter
    resolves through the spec's source-id, so pruning keeps working
    across the rename for BOTH manifest generations."""
    root = _tbl(spark, tmp_path, "prenm", partition=["grp"])
    ice.rename_column(root, "grp", "bucket")
    ice.append(
        spark.createDataFrame(
            [(9, 90.0, "a")], "k bigint, price double, bucket string"
        ).coalesce(1),
        root,
    )
    files = ice.plan_files(root, partition_filter={"bucket": "a"})
    assert len(files) == 2  # one old-manifest file + one new
    got = ice.read_table(spark, root, partition_filter={"bucket": "a"})
    assert _rows(got.select("k")) == [(1,), (3,), (9,)]


def test_pushdown_still_on_for_unevolved_columns(spark, tmp_path):
    """The hazard shield must be surgical: a column whose name never
    moved ids keeps real-name pushdown (PushedFilters non-empty)."""
    root = _tbl(spark, tmp_path, "push")
    ice.drop_column(root, "price")
    ice.add_column(root, "price", "double")
    df = ice.read_table(spark, root).filter("k = 2")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(k)" in plan, plan


def test_metadata_versions_are_sequential_files(spark, tmp_path):
    root = _tbl(spark, tmp_path, "vers")
    ice.rename_column(root, "price", "amount")
    ice.add_column(root, "note", "string")
    versions = sorted(
        int(os.path.basename(p)[1:].split(".")[0])
        for p in glob.glob(os.path.join(root, "metadata", "v*.metadata.json"))
    )
    assert versions == [1, 2, 3]
    with open(os.path.join(root, "metadata", "version-hint.text")) as f:
        assert int(f.read()) == 3
