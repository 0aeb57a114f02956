"""Iceberg SNAPSHOT REFERENCES (spec "Snapshot References"): tags are
immutable labels, branches fork and advance independently of main,
refs survive schema-evolution commits, ref bookkeeping refuses
collisions and unknown names."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import iceberg_format as ice


def _rows(df):
    return sorted(map(tuple, df.collect()), key=lambda t: tuple(map(str, t)))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, grp string").coalesce(1)


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "refs")
    ice.create_table(_mk(spark, [(1, "a"), (2, "b")]), root)
    return root


def test_tag_pins_a_snapshot_forever(table, spark):
    ice.create_tag(table, "v1.0")
    want = _rows(ice.read_table(spark, table))
    ice.append(_mk(spark, [(3, "c")]), table)
    # main moved on; the tag still reads the labeled snapshot
    assert len(_rows(ice.read_table(spark, table))) == 3
    assert _rows(ice.read_table(spark, table, ref="v1.0")) == want
    # tags are immutable: appending to one refuses
    with pytest.raises(ValueError, match="immutable"):
        ice.append(_mk(spark, [(9, "z")]), table, branch="v1.0")


def test_branch_advances_independently_of_main(table, spark):
    ice.create_branch(table, "audit")
    ice.append(_mk(spark, [(3, "c")]), table, branch="audit")
    # branch = fork + its append; main = fork only
    assert len(_rows(ice.read_table(spark, table, ref="audit"))) == 3
    assert len(_rows(ice.read_table(spark, table))) == 2
    # a later main append is invisible to the branch and vice versa
    ice.append(_mk(spark, [(4, "d")]), table)
    assert len(_rows(ice.read_table(spark, table))) == 3
    got_branch = _rows(ice.read_table(spark, table, ref="audit"))
    assert got_branch == _rows(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    # a second branch append keeps stacking on the branch head
    ice.append(_mk(spark, [(5, "e")]), table, branch="audit")
    assert len(_rows(ice.read_table(spark, table, ref="audit"))) == 4
    assert len(_rows(ice.read_table(spark, table))) == 3


def test_branch_from_explicit_snapshot(table, spark):
    ice.append(_mk(spark, [(3, "c")]), table)
    ice.create_branch(table, "from_v1", snapshot_id=1)
    assert len(_rows(ice.read_table(spark, table, ref="from_v1"))) == 2


def test_ref_bookkeeping_refusals(table, spark):
    ice.create_tag(table, "t")
    with pytest.raises(ValueError, match="already exists"):
        ice.create_branch(table, "t")
    with pytest.raises(ValueError, match="no such ref"):
        ice.read_table(spark, table, ref="nope")
    with pytest.raises(ValueError, match="no such ref"):
        ice.drop_ref(table, "nope")
    ice.drop_ref(table, "t")
    with pytest.raises(ValueError, match="no such ref"):
        ice.read_table(spark, table, ref="t")
    with pytest.raises(ValueError, match="not both"):
        ice.read_table(spark, table, ref="x", snapshot_id=1)


def test_refs_survive_schema_evolution_and_main_commits(table, spark):
    ice.create_tag(table, "keep")
    ice.append(_mk(spark, [(3, "c")]), table)  # snapshot commit
    ice.rename_column(table, "grp", "bucket_name")  # metadata-only commit
    assert ice.ref_snapshot_id(table, "keep") == 1
    got = ice.read_table(spark, table, ref="keep")
    # tag read resolves with the SNAPSHOT's schema (pre-rename)
    assert got.columns == ["k", "grp"]
    assert len(_rows(got)) == 2
