"""Hudi MERGE_ON_READ: log-block framing (reader certified against a
HAND-PACKED spec-literal log file), upsert-as-log-append, file-slice
snapshot/time-travel reads, compaction, delete-block refusal."""

from __future__ import annotations

import json
import os
import struct

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import hudi_mor as mor
from incubator_gluten_spark.sources.hudi_format import HudiFormatError


def _orders(spark, sf_dir, year):
    from incubator_gluten_spark.catalog import load_tables

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return orders.filter(F.year("o_orderdate") == year).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# framing, no Spark


def _hand_packed_block(instant, schema_json, records):
    """Independent reconstruction of one framed AVRO block straight from
    the tech-specs text — NOT via pack_log_block."""
    content = struct.pack(">II", 3, len(records))
    for r in records:
        content += struct.pack(">I", len(r)) + r
    headers = struct.pack(">I", 2)
    for ordinal, val in ((0, instant), (2, schema_json)):
        raw = val.encode()
        headers += struct.pack(">II", ordinal, len(raw)) + raw
    body = struct.pack(">I", 1)  # log format version
    body += struct.pack(">I", 3)  # AVRO_DATA_BLOCK ordinal
    body += headers
    body += struct.pack(">Q", len(content)) + content
    body += struct.pack(">I", 0)  # empty footer map
    total = 6 + 8 + len(body) + 8
    body += struct.pack(">Q", total)
    return b"#HUDI#" + struct.pack(">Q", len(body)) + body


def test_reader_consumes_hand_packed_log():
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": "string"},
        ],
    }
    recs = [
        mor.encode_avro_data_block_content([(7, "x")], schema)[8 + 4 :],
        mor.encode_avro_data_block_content([(9, "yy")], schema)[8 + 4 :],
    ]
    blob = _hand_packed_block("20240101000000001", json.dumps(schema), recs)
    blob += _hand_packed_block("20240101000000002", json.dumps(schema), recs[:1])
    blocks = mor.unpack_log_blocks(blob)
    assert len(blocks) == 2
    btype, headers, content = blocks[0]
    assert btype == mor.AVRO_DATA_BLOCK
    assert headers[mor.HEADER_INSTANT_TIME] == "20240101000000001"
    rows = mor.decode_avro_data_block_content(content, schema)
    assert rows == [(7, "x"), (9, "yy")]
    assert mor.decode_avro_data_block_content(blocks[1][2], schema) == [(7, "x")]


def test_block_roundtrip_and_delete_block_refused():
    schema = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "k", "type": ["null", "long"]}],
    }
    content = mor.encode_avro_data_block_content(
        [(1,), (None,)], schema
    )
    block = mor.pack_log_block(mor.AVRO_DATA_BLOCK, {0: "t1", 2: "{}"}, content)
    (btype, headers, got), = mor.unpack_log_blocks(block)
    assert mor.decode_avro_data_block_content(got, schema) == [(1,), (None,)]
    delete = mor.pack_log_block(1, {0: "t1"}, b"kryo-bytes")
    with pytest.raises(HudiFormatError, match="Kryo"):
        mor.unpack_log_blocks(delete)


# ---------------------------------------------------------------------------
# table behavior


def test_mor_upsert_appends_log_not_base(spark, sf_dir, tmp_path):
    base = _orders(spark, sf_dir, 1996)
    root = str(tmp_path / "mor")
    mor.create_table(base, root, key_col="o_orderkey", partition_col="o_orderpriority")
    slices0 = mor.file_slices(root)
    upd = base.filter("o_orderkey % 5 = 0").withColumn(
        "o_totalprice", F.lit(1.5)
    )
    out = mor.upsert(spark, upd, root, key_col="o_orderkey")
    assert out["log_blocks_appended"] > 0 and out["new_rows"] == 0
    slices1 = mor.file_slices(root)
    # base files unchanged; log files appeared
    assert [s["base_file"] for s in slices1] == [s["base_file"] for s in slices0]
    assert sum(len(s["log_files"]) for s in slices1) == out["log_blocks_appended"]
    got = mor.read_table(spark, root)
    updated_keys = {r[0] for r in upd.select("o_orderkey").collect()}
    want = base.filter(~F.col("o_orderkey").isin(updated_keys)).unionAll(upd)
    assert _rows(got) == _rows(want)
    # time travel: as-of the create instant sees the original rows
    first = mor.completed_instants(root)[0]
    assert _rows(mor.read_table(spark, root, as_of=first)) == _rows(base)


def test_mor_second_upsert_wins_and_inserts_new_group(spark, sf_dir, tmp_path):
    base = _orders(spark, sf_dir, 1996)
    root = str(tmp_path / "mor2")
    mor.create_table(base, root, key_col="o_orderkey")
    upd1 = base.filter("o_orderkey % 3 = 0").withColumn("o_totalprice", F.lit(1.0))
    mor.upsert(spark, upd1, root, key_col="o_orderkey")
    # second upsert touches a subset again (log-over-log wins) + inserts
    upd2 = base.filter("o_orderkey % 6 = 0").withColumn("o_totalprice", F.lit(2.0))
    fresh = _orders(spark, sf_dir, 1997).filter("o_orderkey % 100 = 1")
    out = mor.upsert(spark, upd2.unionAll(fresh), root, key_col="o_orderkey")
    assert out["new_rows"] == fresh.count()
    got = mor.read_table(spark, root)
    k1 = {r[0] for r in upd1.select("o_orderkey").collect()}
    k2 = {r[0] for r in upd2.select("o_orderkey").collect()}
    want = (
        base.filter(~F.col("o_orderkey").isin(k1 | k2))
        .unionAll(upd1.filter(~F.col("o_orderkey").isin(k2)))
        .unionAll(upd2)
        .unionAll(fresh)
    )
    assert _rows(got) == _rows(want)


def test_mor_compaction_restores_pure_parquet_reads(spark, sf_dir, tmp_path):
    base = _orders(spark, sf_dir, 1996)
    root = str(tmp_path / "mor_c")
    mor.create_table(base, root, key_col="o_orderkey")
    upd = base.filter("o_orderkey % 4 = 0").withColumn("o_totalprice", F.lit(3.0))
    mor.upsert(spark, upd, root, key_col="o_orderkey")
    before = _rows(mor.read_table(spark, root))
    out = mor.compact(spark, root)
    assert out["file_groups_compacted"] >= 1
    slices = mor.file_slices(root)
    # new slices carry no logs: snapshot is pure parquet again
    assert all(not s["log_files"] for s in slices)
    assert _rows(mor.read_table(spark, root)) == before
    # pre-compaction time travel still merges the logs
    pre = mor.completed_instants(root)[-2]
    assert _rows(mor.read_table(spark, root, as_of=pre)) == before


def test_cow_module_still_refuses_mor(spark, sf_dir, tmp_path):
    from incubator_gluten_spark.sources import hudi_format as hf

    base = _orders(spark, sf_dir, 1996)
    root = str(tmp_path / "mor_refuse")
    mor.create_table(base, root, key_col="o_orderkey")
    with pytest.raises(HudiFormatError, match="MOR|MERGE_ON_READ"):
        hf.read_table(spark, root)


# ---------------------------------------------------------------------------
# MOR incremental query — r11


def test_mor_incremental_and_compaction_invisibility(spark, tmp_path):
    """(begin, end] incremental over a MOR table: log-block updates and
    new-group inserts report at end-of-range values; a COMPACTION is
    change-INVISIBLE (rows carry their original commit time through
    the rewrite — real Hudi preserves record meta, so an incremental
    consumer never re-reads rows a table service moved)."""
    root = str(tmp_path / "mor_inc")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v double")
    mor.create_table(mk([(1, 1.0), (2, 2.0)]), root, key_col="k")
    mor.upsert(spark, mk([(2, 22.0), (3, 3.0)]), root, key_col="k")
    i1, i2 = sorted(mor.completed_instants(root))
    inc = sorted(map(tuple, mor.read_incremental(spark, root, i1).collect()))
    assert inc == [(2, 22.0), (3, 3.0)]  # update at NEW value + insert
    mor.compact(spark, root)
    # nothing changed since i2 — compaction must not surface anything
    assert mor.read_incremental(spark, root, i2).isEmpty()
    # bounded range unaffected by later compaction
    inc2 = sorted(
        map(tuple, mor.read_incremental(spark, root, i1, i2).collect())
    )
    assert inc2 == [(2, 22.0), (3, 3.0)]
    # snapshot identical post-compaction
    assert sorted(map(tuple, mor.read_table(spark, root).collect())) == [
        (1, 1.0), (2, 22.0), (3, 3.0),
    ]
    with pytest.raises(ValueError, match="after end"):
        mor.read_incremental(spark, root, i2, i1)
