"""Delta TYPE WIDENING (PROTOCOL.md "Type Widening", readerWriter
feature ``typeWidening``): ALTER COLUMN TYPE to a wider type is
metadata-only — pre-widening files keep the narrow physical type and
every scan upcasts under the LOG schema; narrowing refuses.

Reference analog: gluten's Velox parquet scan upcasts widened Delta
columns on read (backends-velox scan type coercion); the contract here
is the public Delta protocol."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import delta_protocol as dp
from incubator_gluten_spark.sources.delta_protocol import DeltaProtocolError


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl).coalesce(1)


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "widen")
    dp.create_table(
        _mk(spark, [(1, 10, 1.5), (2, 20, 2.5)], "k bigint, v int, f float"),
        root,
    )
    return root


def test_widen_int_to_long_is_metadata_only(table, spark):
    files_before = sorted(glob.glob(table + "/**/*.parquet", recursive=True))
    dp.alter_column_type(spark, table, "v", "long")
    assert files_before == sorted(
        glob.glob(table + "/**/*.parquet", recursive=True)
    )
    t = dp.read_table(spark, table)
    assert dict(t.dtypes)["v"] == "bigint"
    assert sorted(map(tuple, t.select("k", "v").collect())) == [
        (1, 10), (2, 20),
    ]
    # the audit trail rides in the field metadata (spec delta.typeChanges)
    snap = dp.resolve(spark, table)
    import json

    fields = json.loads(snap.metadata["schemaString"])["fields"]
    (vf,) = [f for f in fields if f["name"] == "v"]
    assert vf["metadata"]["delta.typeChanges"][0]["fromType"] == "integer"
    assert vf["metadata"]["delta.typeChanges"][0]["toType"] == "long"
    # protocol upgraded to the feature-list form, both sides
    assert "typeWidening" in snap.protocol["readerFeatures"]
    assert "typeWidening" in snap.protocol["writerFeatures"]
    assert snap.protocol["minReaderVersion"] == 3


def test_mixed_narrow_and_wide_files_scan_together(table, spark):
    dp.alter_column_type(spark, table, "v", "long")
    dp.alter_column_type(spark, table, "f", "double")
    # post-widening append writes the WIDE type; old files stay narrow
    dp.append(
        _mk(spark, [(3, 2**40, 9.5)], "k bigint, v long, f double"), table
    )
    t = dp.read_table(spark, table)
    got = sorted(map(tuple, t.collect()))
    assert got[2] == (3, 2**40, 9.5)
    assert got[0][0] == 1 and got[0][1] == 10
    agg = t.agg(F.sum("v").alias("s")).collect()[0]["s"]
    assert agg == 30 + 2**40


def test_narrow_batch_upcasts_on_append(table, spark):
    dp.alter_column_type(spark, table, "v", "long")
    # an INT batch still appends (lossless upcast), Delta's behavior
    dp.append(_mk(spark, [(4, 40, 4.5)], "k bigint, v int, f float"), table)
    assert dp.read_table(spark, table).filter("k = 4").collect()[0]["v"] == 40


def test_decimal_and_int_to_decimal_widenings(spark, tmp_path):
    root = str(tmp_path / "widen_dec")
    df = spark.createDataFrame([(1, 100)], "k bigint, v int").selectExpr(
        "k", "v", "cast(1.25 as decimal(6,2)) d"
    )
    dp.create_table(df.coalesce(1), root)
    dp.alter_column_type(spark, root, "v", "decimal(12,0)")
    dp.alter_column_type(spark, root, "d", "decimal(10,4)")
    t = dp.read_table(spark, root)
    assert dict(t.dtypes) == {
        "k": "bigint", "v": "decimal(12,0)", "d": "decimal(10,4)",
    }
    row = t.collect()[0]
    assert int(row["v"]) == 100 and float(row["d"]) == 1.25


def test_narrowing_and_cross_family_refuse(table, spark):
    for col, bad in [("k", "int"), ("v", "string"), ("f", "float"),
                     ("v", "float"), ("f", "int")]:
        with pytest.raises(DeltaProtocolError, match="not a supported"):
            dp.alter_column_type(spark, table, col, bad)
    with pytest.raises(DeltaProtocolError, match="no such column"):
        dp.alter_column_type(spark, table, "zzz", "long")
    # decimal scale shrink / integer-digit shrink refuse
    root2 = table  # reuse session
    with pytest.raises(DeltaProtocolError, match="not a supported"):
        dp.alter_column_type(spark, table, "v", "decimal(9,0)")


def test_widened_table_survives_checkpoint_and_time_travel(table, spark):
    dp.alter_column_type(spark, table, "v", "long")
    dp.append(_mk(spark, [(5, 2**35, 0.5)], "k bigint, v long, f float"), table)
    dp.checkpoint(spark, table)
    dp.append(_mk(spark, [(6, 60, 6.5)], "k bigint, v long, f float"), table)
    t = dp.read_table(spark, table)
    assert t.count() == 4 and dict(t.dtypes)["v"] == "bigint"
    snap = dp.resolve(spark, table)
    assert "typeWidening" in snap.protocol["readerFeatures"]
    # pre-widening version still reads with the NARROW schema
    old = dp.read_table(spark, table, version=0)
    assert dict(old.dtypes)["v"] == "int"
