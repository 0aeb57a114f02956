"""Delta DATA SKIPPING (r12): reader-level file pruning from the log's
per-file stats (minValues/maxValues/nullCount) with a residual row
filter — Delta's headline read optimization, zero footers opened for
skipped files.

Reference analog: Delta's docs "Data skipping with Z-order"; the
reference scans post-skipping file lists through its jar
(gluten-delta/.../DeltaScanTransformer.scala)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from incubator_gluten_spark.sources import delta_protocol as dp


def _mk(spark, n=800, files=4):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("u-"), F.format_string("%04d", F.col("id"))).alias("s"),
        F.date_add(
            F.lit("2024-01-01").cast("date"), F.col("id").cast("int") % 200
        ).alias("d"),
        F.when(F.col("id") % 2 == 0, F.col("id").cast("double")).alias("v"),
    )
    return df.repartitionByRange(files, "k")


def test_point_and_range_predicates_skip_files(spark, tmp_path):
    root = str(tmp_path / "skip")
    dp.create_table(_mk(spark), root)
    assert len(dp.resolve(spark, root).adds) == 4
    t = dp.read_table(spark, root, source_predicates=[("k", "=", 500)])
    assert len(t.inputFiles()) == 1  # 3 of 4 files never opened
    assert [r["k"] for r in t.collect()] == [500]
    t2 = dp.read_table(spark, root, source_predicates=[("k", "<", 100)])
    assert len(t2.inputFiles()) == 1
    assert t2.count() == 100
    # string predicate skips on the string stats
    t3 = dp.read_table(
        spark, root, source_predicates=[("s", ">=", "u-0790")]
    )
    assert len(t3.inputFiles()) == 1 and t3.count() == 10
    # IN spanning two files
    t4 = dp.read_table(
        spark, root, source_predicates=[("k", "in", {5, 795})]
    )
    assert len(t4.inputFiles()) == 2 and t4.count() == 2
    # a predicate NO file satisfies plans zero scans
    t5 = dp.read_table(spark, root, source_predicates=[("k", ">", 10_000)])
    assert len(t5.inputFiles()) == 0 and t5.count() == 0


def test_date_predicates_skip_via_iso_stats(spark, tmp_path):
    """Date stats are ISO strings (PROTOCOL.md); the literal compares
    through the same image, so skipping works on the commonest
    dimension."""
    root = str(tmp_path / "skip_date")
    df = _mk(spark).repartitionByRange(4, "d")  # cluster by date instead
    dp.create_table(df, root)
    t = dp.read_table(
        spark, root, source_predicates=[("d", "<", dt.date(2024, 2, 1))]
    )
    assert 0 < len(t.inputFiles()) < 4
    want = 800 - sum(1 for i in range(800) if i % 200 >= 31)
    assert t.count() == want


def test_null_count_skipping(spark, tmp_path):
    root = str(tmp_path / "skip_null")
    # one file all-null in v, one file null-free (cluster by k; v null
    # for odd ids -> mix; build explicit halves instead)
    df = spark.range(200).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 100, F.col("id").cast("double")).alias("v"),
    ).repartitionByRange(2, "k")
    dp.create_table(df, root)
    t = dp.read_table(spark, root, source_predicates=[("v", "is_null", None)])
    assert len(t.inputFiles()) == 1 and t.count() == 100
    t2 = dp.read_table(spark, root, source_predicates=[("v", "not_null", None)])
    assert len(t2.inputFiles()) == 1 and t2.count() == 100
    # value predicate drops the all-null file (it has no v bounds at all)
    t3 = dp.read_table(spark, root, source_predicates=[("v", ">=", 0.0)])
    assert len(t3.inputFiles()) == 1 and t3.count() == 100


def test_skipping_respects_deletion_vectors(spark, tmp_path):
    """A skipped read over a DV'd file must still remove the deleted
    rows (the sub-snapshot keeps the deletionVector)."""
    root = str(tmp_path / "skip_dv")
    dp.create_table(_mk(spark), root)
    dp.delete_where_dv(spark, root, "k % 10 = 0")
    t = dp.read_table(spark, root, source_predicates=[("k", "<", 200)])
    assert sorted(r["k"] for r in t.collect()) == [
        k for k in range(200) if k % 10 != 0
    ]


def test_column_mapped_table_falls_back_to_residual(spark, tmp_path):
    """Stats keys are PHYSICAL under column mapping: pruning is skipped
    (never wrong), the residual filter alone keeps the result exact."""
    root = str(tmp_path / "skip_map")
    dp.create_table(_mk(spark), root, column_mapping="name")
    t = dp.read_table(spark, root, source_predicates=[("k", "=", 7)])
    assert [r["k"] for r in t.collect()] == [7]


def test_zorder_then_skip_multidim(spark, tmp_path):
    """The write-side layout (ZORDER) and the read-side skipping
    compose: after z-ordering on (k, s), a point predicate on EITHER
    dimension opens a strict subset of files."""
    root = str(tmp_path / "skip_z")
    dp.create_table(_mk(spark).coalesce(1), root)
    dp.optimize(spark, root, zorder_by=["k", "s"], target_files=8)
    n_files = len(dp.resolve(spark, root).adds)
    assert n_files >= 4
    tk = dp.read_table(spark, root, source_predicates=[("k", "=", 400)])
    ts = dp.read_table(
        spark, root, source_predicates=[("s", "=", "u-0400")]
    )
    assert 0 < len(tk.inputFiles()) < n_files
    assert 0 < len(ts.inputFiles()) < n_files
    assert [r["k"] for r in tk.collect()] == [400]
    assert [r["k"] for r in ts.collect()] == [400]
