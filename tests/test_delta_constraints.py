"""Delta CHECK constraints (PROTOCOL.md "Check Constraints", writer
feature): table-property storage, minWriterVersion 3 gate, SQL
TRUE/UNKNOWN-pass FALSE-fail semantics, enforcement on every write path
(append, streaming append, UPDATE, MERGE), existing-data validation at
ADD CONSTRAINT time, metadata-only DROP."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import delta_protocol as dp


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, price double, grp string"
    ).coalesce(1)


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "cons")
    dp.create_table(
        _mk(spark, [(1, 10.0, "a"), (2, 20.0, "b")]),
        root,
        partition_cols=["grp"],
    )
    return root


def test_add_constraint_commits_property_and_writer_version(table, spark):
    v = dp.add_check_constraint(spark, table, "pos_price", "price > 0")
    snap = dp.resolve(spark, table)
    assert snap.version == v
    assert (
        snap.metadata["configuration"]["delta.constraints.pos_price"]
        == "price > 0"
    )
    assert snap.protocol["minWriterVersion"] >= 3
    # valid append still works
    dp.append(_mk(spark, [(3, 30.0, "a")]), table)
    assert dp.read_table(spark, table).count() == 3


def test_violating_append_is_refused_naming_the_constraint(table, spark):
    dp.add_check_constraint(spark, table, "pos_price", "price > 0")
    v = dp.resolve(spark, table).version
    with pytest.raises(dp.DeltaProtocolError, match="pos_price"):
        dp.append(_mk(spark, [(3, -1.0, "a")]), table)
    # nothing committed
    assert dp.resolve(spark, table).version == v
    assert dp.read_table(spark, table).count() == 2


def test_null_passes_sql_unknown_semantics(table, spark):
    dp.add_check_constraint(spark, table, "pos_price", "price > 0")
    dp.append(_mk(spark, [(3, None, "a")]), table)  # UNKNOWN -> passes
    assert dp.read_table(spark, table).count() == 3


def test_add_constraint_validates_existing_rows(table, spark):
    v = dp.resolve(spark, table).version
    with pytest.raises(dp.DeltaProtocolError, match="existing row"):
        dp.add_check_constraint(spark, table, "small", "price < 15")
    assert dp.resolve(spark, table).version == v  # no commit
    assert "small" not in dp._table_constraints(
        dp.resolve(spark, table).metadata
    )


def test_update_and_merge_enforce(table, spark):
    dp.add_check_constraint(spark, table, "pos_price", "price > 0")
    with pytest.raises(dp.DeltaProtocolError, match="UPDATE.*pos_price"):
        dp.update_where(spark, table, "k = 1", {"price": "-5.0"})
    with pytest.raises(dp.DeltaProtocolError, match="MERGE.*pos_price"):
        dp.merge(spark, table, _mk(spark, [(9, -9.0, "a")]), "k")
    # valid versions of both go through
    dp.update_where(spark, table, "k = 1", {"price": "15.0"})
    dp.merge(spark, table, _mk(spark, [(9, 9.0, "a")]), "k")
    got = {r.k: r.price for r in dp.read_table(spark, table).collect()}
    assert got[1] == 15.0 and got[9] == 9.0


def test_streaming_append_enforces(table, spark):
    dp.add_check_constraint(spark, table, "pos_price", "price > 0")
    with pytest.raises(dp.DeltaProtocolError, match="streaming.*pos_price"):
        dp.append_stream_batch(_mk(spark, [(5, -2.0, "b")]), table, "app", 0)
    assert dp.append_stream_batch(_mk(spark, [(5, 2.0, "b")]), table, "app", 0)


def test_drop_constraint_is_metadata_only_and_lifts_enforcement(table, spark):
    dp.add_check_constraint(spark, table, "pos_price", "price > 0")
    adds_before = {a["path"] for a in dp.resolve(spark, table).adds}
    dp.drop_check_constraint(spark, table, "pos_price")
    snap = dp.resolve(spark, table)
    assert {a["path"] for a in snap.adds} == adds_before  # no data motion
    assert dp._table_constraints(snap.metadata) == {}
    dp.append(_mk(spark, [(3, -1.0, "a")]), table)  # now allowed
    assert dp.read_table(spark, table).count() == 3
    with pytest.raises(dp.DeltaProtocolError, match="no such constraint"):
        dp.drop_check_constraint(spark, table, "pos_price")


def test_two_constraints_error_names_the_violated_one(table, spark):
    dp.add_check_constraint(spark, table, "pos_price", "price > 0")
    dp.add_check_constraint(spark, table, "known_grp", "grp IN ('a','b')")
    with pytest.raises(dp.DeltaProtocolError, match="known_grp"):
        dp.append(_mk(spark, [(3, 5.0, "z")]), table)
    with pytest.raises(dp.DeltaProtocolError, match="already exists"):
        dp.add_check_constraint(spark, table, "pos_price", "price > 1")
