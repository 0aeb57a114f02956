"""Delta LIQUID CLUSTERING (PROTOCOL.md "Clustered Table" + "Domain
Metadata"): CLUSTER BY declares the column set in the
``delta.clustering`` domain metadata; writes stay unclustered until
``optimize(cluster=True)`` re-applies the multi-dimensional layout.

Reference analog: gluten-delta scans clustered tables through the jar
(DeltaScanTransformer); the clustering contract is Delta's documented
CLUSTER BY surface."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import delta_protocol as dp
from incubator_gluten_spark.sources.delta_protocol import DeltaProtocolError


def _mk(spark, n=512):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.abs(F.xxhash64("id")) % 1000).alias("x"),
            (F.abs(F.xxhash64("id", F.lit(7))) % 1000).alias("y"),
        )
        .coalesce(4)
    )


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "liquid")
    dp.create_table(_mk(spark), root, cluster_by=["x", "y"])
    return root


def test_cluster_by_lands_in_domain_metadata_and_protocol(table, spark):
    snap = dp.resolve(spark, table)
    assert snap.clustering_columns == ["x", "y"]
    assert "clustering" in snap.protocol["writerFeatures"]
    assert "domainMetadata" in snap.protocol["writerFeatures"]
    assert snap.protocol["minWriterVersion"] == 7
    cfg = json.loads(snap.domains["delta.clustering"])
    assert cfg["clusteringColumns"] == [["x"], ["y"]]


def test_optimize_cluster_applies_layout_and_is_datachange_false(
    table, spark
):
    dp.append(_mk(spark).withColumn("k", F.col("k") + 10000), table)
    out = dp.optimize(spark, table, cluster=True, target_files=8)
    assert out["files_added"] >= 2
    snap = dp.resolve(spark, table)
    # every file narrower than the global range on BOTH columns
    glo = {"x": [None, None], "y": [None, None]}
    per_file = []
    for a in snap.adds:
        st = json.loads(a["stats"])
        per_file.append(st)
        for c in ("x", "y"):
            lo, hi = st["minValues"][c], st["maxValues"][c]
            glo[c][0] = lo if glo[c][0] is None else min(glo[c][0], lo)
            glo[c][1] = hi if glo[c][1] is None else max(glo[c][1], hi)
    # a z-interval straddling a top-level quadrant boundary may span a
    # wide bounding box (inherent to the curve), so assert the LAYOUT
    # property on the majority: most files narrow on BOTH dims at once
    narrow = sum(
        1
        for st in per_file
        if all(
            st["maxValues"][c] - st["minValues"][c]
            <= 0.75 * (glo[c][1] - glo[c][0])
            for c in ("x", "y")
        )
    )
    assert narrow >= len(per_file) * 0.6, (narrow, len(per_file))
    # rows unchanged, commit invisible to CDF-style consumers
    t = dp.read_table(spark, table)
    assert t.count() == 1024
    assert t.agg(F.sum("k")).collect()[0][0] == sum(range(512)) + sum(
        range(10000, 10512)
    )


def test_zorder_refuses_on_clustered_and_cluster_refuses_unclustered(
    table, spark, tmp_path
):
    with pytest.raises(DeltaProtocolError, match="clustered table"):
        dp.optimize(spark, table, zorder_by=["x"])
    with pytest.raises(DeltaProtocolError, match="not both"):
        dp.optimize(spark, table, cluster=True, zorder_by=["x"])
    plain = str(tmp_path / "plain")
    dp.create_table(_mk(spark, 16), plain)
    with pytest.raises(DeltaProtocolError, match="no clustering columns"):
        dp.optimize(spark, plain, cluster=True)


def test_alter_cluster_by_changes_columns_and_upgrades_protocol(
    spark, tmp_path
):
    root = str(tmp_path / "alter_liquid")
    dp.create_table(_mk(spark, 64), root)  # legacy protocol, unclustered
    v = dp.alter_cluster_by(spark, root, ["x"])
    snap = dp.resolve(spark, root)
    assert snap.clustering_columns == ["x"]
    assert snap.protocol["minWriterVersion"] == 7
    assert "clustering" in snap.protocol["writerFeatures"]
    # legacy-implied features carried through the upgrade
    assert "appendOnly" in snap.protocol["writerFeatures"]
    dp.alter_cluster_by(spark, root, ["y", "x"])
    assert dp.resolve(spark, root).clustering_columns == ["y", "x"]
    with pytest.raises(DeltaProtocolError, match="no such column"):
        dp.alter_cluster_by(spark, root, ["zzz"])


def test_create_refusals(spark, tmp_path):
    root = str(tmp_path / "bad_liquid")
    with pytest.raises(DeltaProtocolError, match="replaces PARTITIONED"):
        dp.create_table(
            _mk(spark, 16), root, partition_cols=["x"], cluster_by=["y"]
        )
    with pytest.raises(DeltaProtocolError, match="not in the data"):
        dp.create_table(_mk(spark, 16), root, cluster_by=["zzz"])


def test_clustering_survives_checkpoint(table, spark):
    dp.append(_mk(spark, 64), table)
    dp.checkpoint(spark, table)
    dp.append(_mk(spark, 32), table)
    snap = dp.resolve(spark, table)
    assert snap.clustering_columns == ["x", "y"]
    out = dp.optimize(spark, table, cluster=True, target_files=4)
    assert out["files_added"] >= 1
    assert dp.read_table(spark, table).count() == 512 + 64 + 32
