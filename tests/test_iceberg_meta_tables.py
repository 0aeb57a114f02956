"""Iceberg METADATA TABLES (the tbl$files / tbl$snapshots inspection
surface): built from manifests/metadata only, consistent with the data
they describe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import iceberg_format as ice


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, grp string").coalesce(1)


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "meta")
    ice.create_table(
        _mk(spark, [(1, "a"), (2, "b"), (3, "a")]), root, partition_cols=["grp"]
    )
    ice.append(_mk(spark, [(4, "b")]), root)
    ice.create_tag(root, "v1", snapshot_id=1)
    return root


def test_files_record_counts_match_data(table, spark):
    files = ice.read_meta_table(spark, table, "files")
    total = files.agg(F.sum("record_count")).first()[0]
    assert total == ice.read_table(spark, table).count() == 4
    # per-partition counts from METADATA equal the data's group-by
    per_part = {
        r.partition: r.n
        for r in files.groupBy("partition")
        .agg(F.sum("record_count").alias("n"))
        .collect()
    }
    assert per_part == {'{"grp": "a"}': 2, '{"grp": "b"}': 2}


def test_snapshots_history_refs(table, spark):
    snaps = ice.read_meta_table(spark, table, "snapshots")
    assert [r.operation for r in snaps.orderBy("snapshot_id").collect()] == [
        "append",
        "append",
    ]
    hist = ice.read_meta_table(spark, table, "history")
    assert {r.snapshot_id: r.is_current_ancestor for r in hist.collect()} == {
        1: False,
        2: True,
    }
    refs = {r.name: (r.type, r.snapshot_id) for r in
            ice.read_meta_table(spark, table, "refs").collect()}
    assert refs == {"v1": ("tag", 1), "main": ("branch", 2)}


def test_manifests_table_lists_current_snapshot_manifests(table, spark):
    m = ice.read_meta_table(spark, table, "manifests")
    assert m.count() == 2  # carried-over + new manifest
    assert {r.partition_spec_id for r in m.collect()} == {0}
    with pytest.raises(ValueError, match="unknown metadata table"):
        ice.read_meta_table(spark, table, "nope")
