"""Iceberg HIDDEN PARTITIONING pins (spec "Partition Transforms" +
Appendix B bucket hash): the transform math is pinned against the
spec's PUBLISHED test vectors, the numpy murmur3 kernel against the
scalar reference, and the engine end-to-end — transformed write layout,
metadata-only pruning of SOURCE predicates through the transforms,
residual-filter exactness, nulls, append, time travel.

Reference analog: gluten-iceberg offloads transformed-spec scans through
the Iceberg jar (gluten-iceberg/src/main/scala/org/apache/gluten/
execution/IcebergScanTransformer.scala); the transform semantics here
come from iceberg.apache.org/spec.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import iceberg_format as ice
from incubator_gluten_spark.sources import iceberg_transforms as tr


def _rows(df):
    return sorted(map(tuple, df.collect()), key=lambda t: tuple(map(str, t)))


# ---------------------------------------------------------------------------
# spec-published test vectors (Appendix B, "Bucket transform requirements")


def test_spec_hash_vectors():
    assert tr.hash_long(34) == 2017239379  # hashInt(34) == hashLong(34)
    days = (dt.date(2017, 11, 16) - dt.date(1970, 1, 1)).days
    assert days == 17486
    assert tr.hash_long(days) == -653330422  # date 2017-11-16
    micros = int(
        (
            dt.datetime(2017, 11, 16, 22, 31, 8, tzinfo=dt.timezone.utc)
            - dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
        ).total_seconds()
        * 1_000_000
    )
    assert tr.hash_long(micros) == -2047944441  # timestamp 22:31:08
    assert tr.murmur3_32(b"iceberg") == 1210000089  # string "iceberg"


def test_bucket_of_matches_spec_examples():
    # bucket = (hash & Integer.MAX_VALUE) % N
    assert tr.bucket_of(34, "long", 16) == (2017239379 & 0x7FFFFFFF) % 16
    assert (
        tr.bucket_of(dt.date(2017, 11, 16), "date", 8)
        == (-653330422 & 0x7FFFFFFF) % 8
    )
    assert (
        tr.bucket_of("iceberg", "string", 128)
        == (1210000089 & 0x7FFFFFFF) % 128
    )
    assert tr.bucket_of(None, "long", 8) is None


def test_numpy_kernel_matches_scalar_reference():
    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.integers(-(2**62), 2**62, size=500, dtype=np.int64),
            np.array([0, 1, -1, 34, 17486, 2**62, -(2**62)], dtype=np.int64),
        ]
    )
    got = tr._mm3_long_np(vals)
    for v, h in zip(vals.tolist(), got.tolist()):
        expect = tr.hash_long(int(v)) & 0xFFFFFFFF
        assert h == expect, f"kernel mismatch at {v}"


# ---------------------------------------------------------------------------
# literal-side transform math (floor semantics incl. pre-epoch)


def test_time_ordinals():
    assert tr.apply_literal("year", dt.date(2017, 11, 16), "date") == 47
    assert tr.apply_literal("month", dt.date(2017, 11, 16), "date") == 574
    assert tr.apply_literal("day", dt.date(2017, 11, 16), "date") == 17486
    assert (
        tr.apply_literal("hour", dt.datetime(2017, 11, 16, 22), "timestamp")
        == 17486 * 24 + 22
    )
    # pre-epoch goes NEGATIVE (floor), never truncates toward zero
    assert tr.apply_literal("year", dt.date(1969, 12, 31), "date") == -1
    assert tr.apply_literal("month", dt.date(1969, 12, 31), "date") == -1
    assert tr.apply_literal("day", dt.date(1969, 12, 31), "date") == -1
    assert (
        tr.apply_literal("hour", dt.datetime(1969, 12, 31, 23), "timestamp")
        == -1
    )
    # day of a timestamp truncates to its UTC date first
    assert (
        tr.apply_literal("day", dt.datetime(2017, 11, 16, 23, 59), "timestamptz")
        == 17486
    )


def test_truncate_literals():
    assert tr.apply_literal("truncate[10]", 1, "int") == 0
    assert tr.apply_literal("truncate[10]", -1, "int") == -10  # floor
    assert tr.apply_literal("truncate[10]", 10, "int") == 10
    assert tr.apply_literal("truncate[4]", "iceberg", "string") == "iceb"
    assert tr.apply_literal("truncate[4]", "ice", "string") == "ice"


def test_parse_partition_field_shapes():
    schema = {
        "fields": [
            {"id": 1, "name": "ts", "type": "timestamptz", "required": False},
            {"id": 2, "name": "uid", "type": "long", "required": False},
            {"id": 3, "name": "name", "type": "string", "required": False},
        ]
    }
    pf = tr.parse_partition_field("day(ts)", schema, 1000)
    assert pf == {
        "name": "ts_day",
        "transform": "day",
        "source-id": 1,
        "field-id": 1000,
    }
    pf = tr.parse_partition_field("bucket(8, uid)", schema, 1001)
    assert pf["transform"] == "bucket[8]" and pf["name"] == "uid_bucket"
    pf = tr.parse_partition_field("truncate(2, name)", schema, 1002)
    assert pf["transform"] == "truncate[2]" and pf["name"] == "name_trunc"
    pf = tr.parse_partition_field("uid", schema, 1003)
    assert pf["transform"] == "identity"
    with pytest.raises(ValueError, match="hour needs a timestamp"):
        tr.parse_partition_field("hour(uid)", schema, 1004)
    with pytest.raises(ValueError, match="unknown partition"):
        tr.parse_partition_field("nope(ts)", schema, 1005)
    with pytest.raises(ValueError, match="truncate needs"):
        tr.parse_partition_field("truncate(4, ts)", schema, 1006)


# ---------------------------------------------------------------------------
# engine end-to-end


def _orders(spark, sf_dir):
    from incubator_gluten_spark.catalog import load_tables

    return (
        load_tables(spark, sf_dir, ("orders",))["orders"]
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .filter(F.year("o_orderdate").isin(1996, 1997))
    )


def test_day_bucket_table_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    src = _orders(spark, sf_dir)
    root = str(tmp_path / "hidden")
    ice.create_table(
        src, root, partition_cols=["day(o_orderdate)", "bucket(4, o_custkey)"]
    )
    # full read returns every row, source columns intact, no synthetic
    # partition columns leak into the table
    got = ice.read_table(spark, root)
    assert got.columns == src.columns
    assert _rows(got) == _rows(src)

    # manifest tuples carry transformed ints under the convention names
    files = ice.plan_files(root)
    part = files[0]["partition"]
    assert set(part) == {"o_orderdate_day", "o_custkey_bucket"}
    assert isinstance(part["o_orderdate_day"], int)
    assert 0 <= part["o_custkey_bucket"] < 4

    # the data files contain the SOURCE columns (never stripped)
    import pyarrow.parquet as pq
    import os

    sample = pq.read_schema(
        os.path.join(root, files[0]["file_path"])
    )
    assert "o_orderdate" in sample.names
    assert "o_custkey" in sample.names
    assert "o_orderdate_day" not in sample.names

    # a timestamp-range predicate prunes files via the day tuples alone
    lo, hi = dt.datetime(1996, 3, 1), dt.datetime(1996, 6, 1)
    preds = [("o_orderdate", ">=", lo), ("o_orderdate", "<", hi)]
    pruned = ice.plan_files(root, source_predicates=preds)
    assert 0 < len(pruned) < len(files)
    # and the read is EXACT (residual filter closes the relaxed endpoint)
    got = ice.read_table(spark, root, source_predicates=preds)
    want = src.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    assert _rows(got) == _rows(want)


def test_bucket_equality_pruning_is_exact(spark, sf_dir, tmp_path):
    src = _orders(spark, sf_dir)
    root = str(tmp_path / "bucketed")
    ice.create_table(
        src, root, partition_cols=["day(o_orderdate)", "bucket(4, o_custkey)"]
    )
    key = src.select("o_custkey").first()[0]
    preds = [("o_custkey", "=", int(key))]
    all_files = ice.plan_files(root)
    pruned = ice.plan_files(root, source_predicates=preds)
    # equality hits exactly one of 4 buckets
    assert 0 < len(pruned) < len(all_files)
    assert {f["partition"]["o_custkey_bucket"] for f in pruned} == {
        tr.bucket_of(int(key), "long", 4)
    }
    got = ice.read_table(spark, root, source_predicates=preds)
    want = src.filter(F.col("o_custkey") == int(key))
    assert _rows(got) == _rows(want)
    # a RANGE predicate must NOT prune through the bucket TRANSFORM
    # (hash order is meaningless); r12 column bounds may legitimately
    # prune a range, so the sentinel probes the domain bottom where
    # every file's bounds are satisfied — any pruning there would be a
    # transform bug
    rng = ice.plan_files(root, source_predicates=[("o_custkey", ">=", 0)])
    assert len(rng) == len(all_files)
    # a mid-domain range stays exact through bounds + residual filter
    got2 = ice.read_table(
        spark, root, source_predicates=[("o_custkey", ">=", int(key))]
    )
    assert got2.count() == src.filter(F.col("o_custkey") >= int(key)).count()


def test_truncate_string_partitioning(spark, sf_dir, tmp_path):
    from incubator_gluten_spark.catalog import load_tables

    orders = load_tables(spark, sf_dir, ("orders",))["orders"].select(
        "o_orderkey", "o_orderpriority"
    )
    root = str(tmp_path / "trunc")
    ice.create_table(orders, root, partition_cols=["truncate(2, o_orderpriority)"])
    files = ice.plan_files(root)
    assert {f["partition"]["o_orderpriority_trunc"] for f in files} <= {
        "1-", "2-", "3-", "4-", "5-",
    }
    preds = [("o_orderpriority", ">=", "4")]
    pruned = ice.plan_files(root, source_predicates=preds)
    assert 0 < len(pruned) < len(files)
    got = ice.read_table(spark, root, source_predicates=preds)
    want = orders.filter(F.col("o_orderpriority") >= "4")
    assert _rows(got) == _rows(want)


def test_null_source_rows_partition_and_prune(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, dt.datetime(1996, 1, 5)), (2, None), (3, dt.datetime(1996, 1, 9))],
        "k bigint, ts timestamp",
    ).coalesce(1)
    root = str(tmp_path / "nulls")
    ice.create_table(df, root, partition_cols=["day(ts)"])
    files = ice.plan_files(root)
    assert None in {f["partition"]["ts_day"] for f in files}
    # the full read keeps the null row
    assert sorted(r.k for r in ice.read_table(spark, root).collect()) == [1, 2, 3]
    # an equality predicate prunes the null-partition file (null never
    # matches a non-null literal)
    preds = [("ts", "=", dt.datetime(1996, 1, 5))]
    pruned = ice.plan_files(root, source_predicates=preds)
    assert all(f["partition"]["ts_day"] is not None for f in pruned)
    got = ice.read_table(spark, root, source_predicates=preds)
    assert [r.k for r in got.collect()] == [1]


def test_append_reuses_transformed_spec(spark, sf_dir, tmp_path):
    src = _orders(spark, sf_dir)
    a = src.filter(F.year("o_orderdate") == 1996)
    b = src.filter(F.year("o_orderdate") == 1997)
    root = str(tmp_path / "appended")
    ice.create_table(a, root, partition_cols=["day(o_orderdate)"])
    snap = ice.append(b, root)
    got = ice.read_table(spark, root)
    assert _rows(got) == _rows(a.unionByName(b))
    # time travel to the first snapshot sees only the 1996 slice
    first = ice.read_table(spark, root, snapshot_id=1)
    assert _rows(first) == _rows(a)
    assert snap["snapshot-id"] == 2
    # year-range pruning spans both snapshots' manifests
    preds = [("o_orderdate", ">=", dt.datetime(1997, 1, 1))]
    pruned = ice.plan_files(root, source_predicates=preds)
    assert 0 < len(pruned) < len(ice.plan_files(root))


def test_hour_transform_on_events(spark, sf_dir, tmp_path):
    from incubator_gluten_spark.catalog import load_tables

    ev = (
        load_tables(spark, sf_dir, ("events",))["events"]
        .select("event_id", "ts", "user_id")
        .limit(500)
    )
    root = str(tmp_path / "hourly")
    ice.create_table(ev, root, partition_cols=["hour(ts)"])
    got = ice.read_table(spark, root)
    assert _rows(got) == _rows(ev)
    # hour ordinal parity: manifest tuple == literal transform of the
    # row's timestamp, checked on one row
    row = ev.orderBy("event_id").first()
    want_hour = tr.apply_literal("hour", row.ts, "timestamptz")
    hours = {f["partition"]["ts_hour"] for f in ice.plan_files(root)}
    assert want_hour in hours
