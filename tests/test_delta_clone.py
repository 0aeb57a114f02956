"""Delta SHALLOW CLONE: absolute-path references, zero data copy,
divergent writes, DV preservation through the "u" -> "p" descriptor
rewrite, vacuum isolation, and the documented source-vacuum hazard."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import delta_protocol as dp


def _rows(df):
    return sorted(map(tuple, df.collect()), key=lambda t: tuple(map(str, t)))


def _orders(spark, sf_dir, year):
    from incubator_gluten_spark.catalog import load_tables

    return (
        load_tables(spark, sf_dir, ("orders",))["orders"]
        .filter(F.year("o_orderdate") == year)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


def _data_files(root):
    return {
        p: os.path.getsize(p)
        for p in glob.glob(os.path.join(root, "**", "*"), recursive=True)
        if os.path.isfile(p) and "_delta_log" not in p
    }


@pytest.fixture()
def src(spark, sf_dir, tmp_path):
    root = str(tmp_path / "src")
    dp.create_table(
        _orders(spark, sf_dir, 1996), root, partition_cols=["o_orderpriority"]
    )
    dp.delete_where_dv(spark, root, "o_totalprice > 200000")
    return root


def test_clone_reads_identical_with_zero_data_copy(src, spark, tmp_path):
    dst = str(tmp_path / "dst")
    out = dp.clone(spark, src, dst)
    assert out["files_referenced"] > 0
    # zero data files under the clone root — references only
    assert _data_files(dst) == {}
    # identical content, INCLUDING the DV-deleted rows staying deleted
    assert _rows(dp.read_table(spark, dst)) == _rows(dp.read_table(spark, src))
    snap = dp.resolve(spark, dst)
    assert any(
        a.get("deletionVector", {}).get("storageType") == "p"
        for a in snap.adds
    )


def test_divergent_writes_never_touch_the_other_table(src, spark, sf_dir, tmp_path):
    dst = str(tmp_path / "dst")
    dp.clone(spark, src, dst)
    src_files = _data_files(src)
    src_rows = _rows(dp.read_table(spark, src))
    src_version = dp.resolve(spark, src).version
    # append + COW delete on the CLONE
    dp.append(_orders(spark, sf_dir, 1997), dst)
    dp.delete_where(spark, dst, "o_totalprice > 150000")
    # the clone's new files are relative, under the clone root
    assert all(
        os.path.commonpath([p, dst]) == dst for p in _data_files(dst)
    )
    # the source is byte-identical and version-identical
    assert _data_files(src) == src_files
    assert dp.resolve(spark, src).version == src_version
    assert _rows(dp.read_table(spark, src)) == src_rows
    # and the clone's content is correct
    want = (
        _orders(spark, sf_dir, 1996)
        .filter("o_totalprice <= 200000")
        .unionByName(_orders(spark, sf_dir, 1997))
        .filter("o_totalprice <= 150000")
    )
    assert _rows(dp.read_table(spark, dst)) == _rows(want)


def test_clone_vacuum_cannot_reclaim_source_bytes(src, spark, sf_dir, tmp_path):
    dst = str(tmp_path / "dst")
    dp.clone(spark, src, dst)
    src_files = _data_files(src)
    dp.delete_where(spark, dst, "o_totalprice > 150000")  # clone-only rewrite
    dp.vacuum(spark, dst, retain_versions=1)
    assert _data_files(src) == src_files  # source untouched
    assert _rows(dp.read_table(spark, dst)) == _rows(
        dp.read_table(spark, src).filter("o_totalprice <= 150000")
    )


def test_source_vacuum_breaks_the_clone(src, spark, sf_dir, tmp_path):
    """Delta's documented shallow-clone hazard: vacuuming the SOURCE
    deletes files the clone still references."""
    dst = str(tmp_path / "dst")
    dp.clone(spark, src, dst)
    # rewrite the source so its original files become unreferenced THERE
    dp.delete_where(spark, src, "o_totalprice > 0")  # rewrites everything
    dp.vacuum(spark, src, retain_versions=1)
    with pytest.raises(Exception):
        dp.read_table(spark, dst).collect()
