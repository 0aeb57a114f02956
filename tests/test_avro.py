"""Avro container format tests: pure-Python codec roundtrip, INTEROP
against the official Apache Avro JVM library (on Spark's classpath even
though the spark-avro DataSource module is not), and the Python
DataSource mount."""

from __future__ import annotations

import io
import random

from pyspark.sql import functions as F

from incubator_gluten_spark.sources.avro import (
    _zigzag_decode,
    _zigzag_encode,
    avro_schema_for,
    read_container,
    read_header,
    register_avro_datasource,
    spark_ddl_for,
    write_container,
)

_SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": ["null", "bytes"]},
    ],
}


def _rows(n=5000):
    return [
        (
            i,
            None if i % 7 == 0 else f"str-{i}-ü中",
            i * 0.5,
            i % 2 == 0,
            None if i % 5 == 0 else bytes([i % 256, 255, 0]),
        )
        for i in range(n)
    ]


def test_zigzag_varint_roundtrip():
    rng = random.Random(7)
    for n in [0, -1, 1, 2**62, -(2**62)] + [
        rng.randint(-(2**62), 2**62) for _ in range(2000)
    ]:
        assert _zigzag_decode(io.BytesIO(_zigzag_encode(n))) == n


def test_container_roundtrip_both_codecs(tmp_path):
    rows = _rows()
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"rt_{codec}.avro")
        assert write_container(p, iter(rows), _SCHEMA, codec=codec) == len(rows)
        assert list(read_container(p)) == rows
        schema, got_codec, _, _ = read_header(p)
        assert (schema, got_codec) == (_SCHEMA, codec)


def test_interop_with_apache_avro_jvm(spark, tmp_path):
    """Files written by the pure-Python encoder must be readable by the
    OFFICIAL Apache Avro implementation (avro-1.12 jar on Spark's
    classpath), and vice versa — the strongest available proof the
    bytes are spec-compliant, not merely self-consistent."""
    jvm = spark._jvm
    rows = _rows(500)
    ours = str(tmp_path / "ours.avro")
    write_container(ours, iter(rows), _SCHEMA, codec="deflate")
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(ours), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    jvm_rows = []
    while reader.hasNext():
        r = reader.next()
        jvm_rows.append(
            (
                r.get("k"),
                None if r.get("s") is None else str(r.get("s")),
                r.get("d"),
                r.get("b"),
            )
        )
    reader.close()
    assert jvm_rows == [(k, s, d, b) for k, s, d, b, _ in rows]

    # JVM writes (deflate), we read
    import json

    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(_SCHEMA))
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    theirs = str(tmp_path / "theirs.avro")
    dfw.create(sch, jvm.java.io.File(theirs))
    for k, s, d, b, raw in rows[:100]:
        rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
        rec.put("k", k)
        rec.put("s", s)
        rec.put("d", d)
        rec.put("b", b)
        rec.put(
            "raw", None if raw is None else jvm.java.nio.ByteBuffer.wrap(raw)
        )
        dfw.append(rec)
    dfw.close()
    assert list(read_container(theirs)) == rows[:100]


def test_avro_datasource_roundtrip(spark, sf_dir, tmp_path):
    """End-to-end through the Python DataSource: write a fixture subset
    with the two-phase-commit sink, read it back with the
    schema-inferring source, values and schema intact."""
    from incubator_gluten_spark.catalog import load_tables

    register_avro_datasource(spark)
    li = (
        load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
        .filter(F.col("l_orderkey") < 200)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )
    p = str(tmp_path / "avro_ds")
    li.write.format("graft_avro").mode("append").option("path", p).save()
    back = spark.read.format("graft_avro").option("path", p).load()
    assert dict(back.dtypes) == dict(li.dtypes)
    want = sorted(map(tuple, li.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want


def test_avro_schema_mapping_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5, True, bytearray(b"xy"))],
        "k bigint, s string, d double, b boolean, raw binary",
    )
    avro = avro_schema_for(df.schema)
    assert spark_ddl_for(avro) == "k bigint, s string, d double, b boolean, raw binary"


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def avro_schema_and_rows(draw):
    """Random record schema over the supported type set + matching rows
    (unions made nullable at random; nested record/array/map included)."""
    prim = st.sampled_from(["long", "int", "double", "string", "boolean", "bytes"])

    def value_for(t, rng):
        if isinstance(t, list):
            inner = [x for x in t if x != "null"][0]
            return None if rng.random() < 0.3 else value_for(inner, rng)
        if isinstance(t, dict):
            if t["type"] == "array":
                return [value_for(t["items"], rng) for _ in range(rng.randrange(3))]
            if t["type"] == "map":
                return {
                    f"k{i}": value_for(t["values"], rng)
                    for i in range(rng.randrange(3))
                }
            if t["type"] == "record":
                return {f["name"]: value_for(f["type"], rng) for f in t["fields"]}
        if t == "long":
            return rng.randrange(-(2**62), 2**62)
        if t == "int":
            return rng.randrange(-(2**31), 2**31)
        if t == "double":
            return rng.uniform(-1e9, 1e9)
        if t == "string":
            return "".join(rng.choice("abßü漢 x") for _ in range(rng.randrange(8)))
        if t == "boolean":
            return rng.random() < 0.5
        if t == "bytes":
            return bytes(rng.randrange(256) for _ in range(rng.randrange(6)))
        raise AssertionError(t)

    n_fields = draw(st.integers(min_value=1, max_value=5))
    fields = []
    for i in range(n_fields):
        base = draw(prim)
        kind = draw(st.sampled_from(["plain", "nullable", "array", "map", "record"]))
        t = {
            "plain": base,
            "nullable": ["null", base],
            "array": {"type": "array", "items": base},
            "map": {"type": "map", "values": base},
            "record": {
                "type": "record",
                "name": f"nested{i}",
                "fields": [{"name": "inner", "type": ["null", base]}],
            },
        }[kind]
        fields.append({"name": f"f{i}", "type": t})
    schema = {"type": "record", "name": "row", "fields": fields}
    seed = draw(st.integers(min_value=0, max_value=2**31))
    import random as _random

    rng = _random.Random(seed)
    n_rows = draw(st.integers(min_value=0, max_value=40))
    rows = [
        tuple(value_for(f["type"], rng) for f in fields) for _ in range(n_rows)
    ]
    codec = draw(st.sampled_from(["null", "deflate"]))
    return schema, rows, codec


@given(sr=avro_schema_and_rows())
@settings(max_examples=40, deadline=None)
def test_avro_codec_roundtrip_fuzz(tmp_path_factory, sr):
    """Property: ANY record schema from the supported type set
    round-trips bit-exactly through the container codec (both codecs,
    empty files included)."""
    schema, rows, codec = sr
    p = str(tmp_path_factory.mktemp("avro_fuzz") / "f.avro")
    assert write_container(p, iter(rows), schema, codec=codec) == len(rows)
    assert list(read_container(p)) == rows


def test_logical_types_roundtrip_and_jvm_interop(spark, tmp_path):
    """date / timestamp-micros / bytes-decimal logical types: python
    roundtrip, and the JVM Avro library reads OUR encoding back as the
    raw logical values the spec defines (days / micros / unscaled
    two's-complement bytes)."""
    import datetime
    import json as _json
    from decimal import Decimal

    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-micros"},
            },
            {
                "name": "m",
                "type": {
                    "type": "bytes",
                    "logicalType": "decimal",
                    "precision": 12,
                    "scale": 2,
                },
            },
        ],
    }
    rows = [
        (
            datetime.date(1996, 3, 14),
            datetime.datetime(2001, 2, 3, 4, 5, 6, 789000),
            Decimal("-12345.67"),
        ),
        (datetime.date(1969, 12, 31), datetime.datetime(1970, 1, 1), Decimal("0.01")),
    ]
    p = str(tmp_path / "logical.avro")
    write_container(p, iter(rows), schema, codec="null")
    assert list(read_container(p)) == rows
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    rec = reader.next()
    assert rec.get("d") == (rows[0][0] - datetime.date(1970, 1, 1)).days
    assert rec.get("ts") == int(
        (rows[0][1] - datetime.datetime(1970, 1, 1)).total_seconds() * 1e6
    )
    raw = bytes(rec.get("m").array())
    assert int.from_bytes(raw, "big", signed=True) == -1234567
    reader.close()


def test_avro_datasource_logical_types(spark, sf_dir, tmp_path):
    """The graft_avro DataSource mounts date/timestamp/decimal columns:
    write a DF with all three, read back with inferred schema, values
    and Spark types identical."""
    from incubator_gluten_spark.catalog import load_tables

    register_avro_datasource(spark)
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    df = orders.filter("o_orderkey < 500").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("d"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("m"),
    )
    path = str(tmp_path / "ds_logical")
    df.write.format("graft_avro").mode("append").option("path", path).save()
    back = spark.read.format("graft_avro").option("path", path).load()
    assert dict(back.dtypes) == dict(df.dtypes)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_timestamp_micros_aware_datetime_converts_to_utc(tmp_path):
    """r7 ADVICE: a tz-aware datetime must be CONVERTED to UTC before
    epoch-micros encoding (the spec defines the long as UTC micros) —
    stripping tzinfo wrote an instant off by the zone offset."""
    import datetime

    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-micros"},
            }
        ],
    }
    plus5 = datetime.timezone(datetime.timedelta(hours=5))
    aware = datetime.datetime(2001, 2, 3, 9, 5, 6, tzinfo=plus5)  # 04:05:06 UTC
    p = str(tmp_path / "tz.avro")
    write_container(p, iter([(aware,)]), schema, codec="null")
    (got,) = list(read_container(p))
    assert got[0] == datetime.datetime(2001, 2, 3, 4, 5, 6)


def test_scan_blocks_is_metadata_only_and_exact(spark, tmp_path):
    """Block boundaries from the varint headers alone: offsets tile the
    file after the header, row counts sum to the written total, and a
    range read over any split reproduces the rows (what makes block
    splits sound)."""
    import os

    from incubator_gluten_spark.sources.avro import (
        avro_schema_for,
        read_block_range,
        read_container,
        scan_blocks,
        write_container,
    )

    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(1000)], "k bigint, s string"
    )
    path = str(tmp_path / "blocks.avro")
    schema = avro_schema_for(df.schema)
    write_container(
        path, ((r["k"], r["s"]) for r in df.collect()), schema, codec="deflate"
    )
    blocks = scan_blocks(path)
    assert sum(n for _, _, n in blocks) == 1000
    # offsets tile the data section exactly
    end = None
    for off, length, _ in blocks:
        if end is not None:
            assert off == end
        end = off + length
    assert end == os.path.getsize(path)
    # a range read over each block reproduces the container's rows
    got = []
    for off, length, _ in blocks:
        got.extend(read_block_range(path, off, length))
    assert got == list(read_container(path))


def test_datasource_splits_large_file_into_multiple_partitions(spark, tmp_path):
    """A single container bigger than the split target must read as
    MULTIPLE input partitions (block-level parallelism), and the arrow
    path must reproduce every value."""
    from incubator_gluten_spark.sources import avro as av
    from incubator_gluten_spark.sources.avro import register_avro_datasource

    register_avro_datasource(spark)
    n = 20000
    df = spark.createDataFrame(
        [(i, float(i) / 7, "x" * 50) for i in range(n)],
        "k bigint, v double, pad string",
    )
    p = str(tmp_path / "big_avro")
    df.coalesce(1).write.format("graft_avro").mode("append").option(
        "path", p
    ).save()
    back = spark.read.format("graft_avro").option("path", p).load()
    import pyspark.sql.functions as F

    row = back.agg(
        F.count(F.lit(1)), F.sum("k"), F.round(F.sum("v"), 4)
    ).first()
    assert row[0] == n and row[1] == n * (n - 1) // 2
    assert row[2] == round(sum(i / 7 for i in range(n)), 4)
    # patch the split target down: the single container must split into
    # many block-range partitions
    old_target = av.AVRO_SPLIT_TARGET
    av.AVRO_SPLIT_TARGET = 1  # every block its own partition
    try:
        ds_cls = av._make_datasource_classes()
        reader = ds_cls({"path": p}).reader(back.schema)
        n_parts = len(reader.partitions())
    finally:
        av.AVRO_SPLIT_TARGET = old_target
    # writer blocks are 4096 rows -> 20000 rows = 5 blocks = 5 splits
    assert n_parts == 5, n_parts
