"""Delta GENERATED COLUMNS (PROTOCOL.md writer feature, declared at
CREATE TABLE via delta.generationExpression field metadata): absent
values computed, present values validated null-safely, UPDATE
recomputes unassigned generated columns and validates assigned ones,
MERGE validates, partitioning on a generated column works."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import delta_protocol as dp


def _rows(df):
    return sorted(map(tuple, df.collect()), key=lambda t: tuple(map(str, t)))


def _mk(spark, rows, schema="k bigint, price double"):
    return spark.createDataFrame(rows, schema).coalesce(1)


GEN = {"price_band": ("bigint", "CAST(floor(price / 10) AS BIGINT)")}


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "gen")
    dp.create_table(
        _mk(spark, [(1, 5.0), (2, 25.0)]),
        root,
        partition_cols=["price_band"],
        generated_columns=GEN,
    )
    return root


def test_create_computes_and_declares(table, spark):
    snap = dp.resolve(spark, table)
    # the expression is in the schemaString field metadata
    d = json.loads(snap.metadata["schemaString"])
    md = next(f for f in d["fields"] if f["name"] == "price_band")["metadata"]
    assert md["delta.generationExpression"].startswith("CAST(floor")
    assert snap.protocol["minWriterVersion"] >= 4
    got = {r.k: r.price_band for r in dp.read_table(spark, table).collect()}
    assert got == {1: 0, 2: 2}
    # partitioned BY the generated column: values live in the log
    assert {a["partitionValues"]["price_band"] for a in snap.adds} == {
        "0",
        "2",
    }


def test_append_computes_when_absent_validates_when_present(table, spark):
    dp.append(_mk(spark, [(3, 42.0)]), table)  # no price_band provided
    got = {r.k: r.price_band for r in dp.read_table(spark, table).collect()}
    assert got[3] == 4
    # a CONSISTENT provided value is accepted
    dp.append(
        _mk(spark, [(4, 55.0, 5)], "k bigint, price double, price_band bigint"),
        table,
    )
    # an INCONSISTENT one refuses and commits nothing
    v = dp.resolve(spark, table).version
    with pytest.raises(dp.DeltaProtocolError, match="price_band"):
        dp.append(
            _mk(
                spark,
                [(5, 55.0, 9)],
                "k bigint, price double, price_band bigint",
            ),
            table,
        )
    assert dp.resolve(spark, table).version == v


def test_update_recomputes_unassigned_validates_assigned(table, spark):
    # price changes -> the generated band must follow automatically
    dp.update_where(spark, table, "k = 1", {"price": "95.0"})
    got = {r.k: (r.price, r.price_band) for r in
           dp.read_table(spark, table).collect()}
    assert got[1] == (95.0, 9)
    # explicitly assigning a CONSISTENT pair is allowed
    dp.update_where(
        spark, table, "k = 2", {"price": "31.0", "price_band": "3"}
    )
    assert {r.k: r.price_band for r in
            dp.read_table(spark, table).collect()}[2] == 3
    # an inconsistent explicit assignment refuses
    with pytest.raises(dp.DeltaProtocolError, match="price_band"):
        dp.update_where(
            spark, table, "k = 2", {"price": "31.0", "price_band": "7"}
        )


def test_merge_validates_source_rows(table, spark):
    bad = _mk(
        spark, [(1, 50.0, 9)], "k bigint, price double, price_band bigint"
    )
    with pytest.raises(dp.DeltaProtocolError, match="MERGE.*price_band"):
        dp.merge(spark, table, bad, "k")
    ok = _mk(
        spark, [(1, 50.0, 5)], "k bigint, price double, price_band bigint"
    )
    dp.merge(spark, table, ok, "k")
    assert {r.k: r.price_band for r in
            dp.read_table(spark, table).collect()}[1] == 5


def test_generated_plus_mapping_refuses(spark, tmp_path):
    with pytest.raises(dp.DeltaProtocolError, match="column mapping"):
        dp.create_table(
            _mk(spark, [(1, 5.0)]),
            str(tmp_path / "both"),
            column_mapping="name",
            generated_columns=GEN,
        )
