"""Iceberg table-format tests: metadata/manifest resolution, snapshot
time travel, metadata-only scan planning with partition pruning, and
Avro-layer interop with the official Apache Avro JVM library."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import iceberg_format as ice
from incubator_gluten_spark.sources.avro import read_container


def _orders_cols(orders, year):
    return orders.filter(F.year("o_orderdate") == year).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


def test_create_read_roundtrip_unpartitioned(spark, sf_dir, tmp_path):
    from incubator_gluten_spark.catalog import load_tables

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    root = str(tmp_path / "ice_plain")
    base = _orders_cols(orders, 1996)
    snap = ice.create_table(base, root)
    assert snap["snapshot-id"] == 1
    got = ice.read_table(spark, root)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, base.collect())
    )
    assert dict(got.dtypes) == dict(base.dtypes)


def test_partitioned_append_time_travel_and_pruning(spark, sf_dir, tmp_path):
    from incubator_gluten_spark.catalog import load_tables

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    root = str(tmp_path / "ice_part")
    base = _orders_cols(orders, 1996)
    ice.create_table(base, root, partition_cols=["o_orderpriority"])
    extra = _orders_cols(orders, 1997)
    snap2 = ice.append(extra, root)
    assert snap2["snapshot-id"] == 2

    # latest and time-travel row counts
    assert ice.read_table(spark, root).count() == base.count() + extra.count()
    assert ice.read_table(spark, root, snapshot_id=1).count() == base.count()

    # metadata-only partition pruning: the URGENT filter must plan a
    # strict subset of files without touching any parquet
    all_files = ice.plan_files(root)
    urgent = ice.plan_files(
        root, partition_filter={"o_orderpriority": "1-URGENT"}
    )
    assert 0 < len(urgent) < len(all_files)
    assert all(
        f["partition"]["o_orderpriority"] == "1-URGENT" for f in urgent
    )
    got = ice.read_table(
        spark, root, partition_filter={"o_orderpriority": "1-URGENT"}
    )
    want = (
        base.unionByName(extra)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .count()
    )
    assert got.count() == want
    # identity partition values are ALSO in the data files (spec), so a
    # non-partition read still sees the column populated
    assert (
        ice.read_table(spark, root)
        .filter(F.col("o_orderpriority").isNull())
        .count()
        == 0
    )

    hist = ice.history(root)
    assert [h["snapshot_id"] for h in hist] == [1, 2]
    assert hist[0]["n_rows"] == base.count()
    assert hist[1]["n_rows"] == base.count() + extra.count()


def test_missing_snapshot_raises(spark, sf_dir, tmp_path):
    from incubator_gluten_spark.catalog import load_tables

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    root = str(tmp_path / "ice_miss")
    ice.create_table(_orders_cols(orders, 1996).limit(10), root)
    with pytest.raises(ValueError, match="snapshot 99"):
        ice.read_table(spark, root, snapshot_id=99)


def test_manifest_avro_interop_with_jvm(spark, sf_dir, tmp_path):
    """Both Avro layers must be spec-Avro, not a private dialect: the
    official Apache Avro JVM library parses our manifest + manifest-list
    files, and a manifest written BY the JVM library drops into the
    table and resolves identically."""
    from incubator_gluten_spark.catalog import load_tables

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    root = str(tmp_path / "ice_interop")
    base = _orders_cols(orders, 1996)
    ice.create_table(base, root, partition_cols=["o_orderpriority"])
    meta = ice._current_metadata(root)
    snap = meta["snapshots"][0]

    jvm = spark._jvm

    def jvm_read(path):
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(path),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        out = []
        while reader.hasNext():
            out.append(str(reader.next()))
        reader.close()
        return out

    ml_path = os.path.join(root, snap["manifest-list"])
    jvm_list = jvm_read(ml_path)
    assert len(jvm_list) == 1 and "manifest_path" in jvm_list[0]
    manifest_rel = next(read_container(ml_path))[0]
    jvm_entries = jvm_read(os.path.join(root, manifest_rel))
    ours = list(read_container(os.path.join(root, manifest_rel)))
    assert len(jvm_entries) == len(ours) > 0
    for js, (status, _, df_) in zip(jvm_entries, ours):
        assert df_["file_path"] in js  # same files, same order

    # reverse direction: rewrite the manifest with the JVM library
    # (same schema, same rows) and confirm our planner reads it back
    schema_json, _, _, _ = __import__(
        "incubator_gluten_spark.sources.avro", fromlist=["read_header"]
    ).read_header(os.path.join(root, manifest_rel))
    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema_json))
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    jvm_manifest = os.path.join(root, manifest_rel)  # overwrite in place
    dfw.create(sch, jvm.java.io.File(jvm_manifest))
    df_schema = sch.getField("data_file").schema()
    part_schema = df_schema.getField("partition").schema()
    # py4j auto-unboxes java.lang.Long back to Python int, so build each
    # record JVM-side from its Avro-JSON encoding (typed by the schema)
    datum_reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    for status, snap_id, d in ours:
        avro_json = json.dumps(
            {
                "status": status,
                "snapshot_id": None if snap_id is None else {"long": snap_id},
                "data_file": {
                    "file_path": d["file_path"],
                    "file_format": d["file_format"],
                    "partition": {
                        k: (
                            None
                            if v is None
                            else {
                                "string" if isinstance(v, str) else "long": v
                            }
                        )
                        for k, v in d["partition"].items()
                    },
                    "record_count": d["record_count"],
                    "file_size_in_bytes": d["file_size_in_bytes"],
                    "block_size_in_bytes": d["block_size_in_bytes"],
                    # Avro-JSON spells bytes as ISO-8859-1 strings; the
                    # bounds must survive the JVM roundtrip byte-exact
                    "lower_bounds": None
                    if d.get("lower_bounds") is None
                    else {
                        "map": {
                            k: v.decode("latin-1")
                            for k, v in d["lower_bounds"].items()
                        }
                    },
                    "upper_bounds": None
                    if d.get("upper_bounds") is None
                    else {
                        "map": {
                            k: v.decode("latin-1")
                            for k, v in d["upper_bounds"].items()
                        }
                    },
                    "null_value_counts": None
                    if d.get("null_value_counts") is None
                    else {"map": dict(d["null_value_counts"])},
                },
            }
        )
        decoder = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(
            sch, avro_json
        )
        dfw.append(datum_reader.read(None, decoder))
    dfw.close()
    # our reader consumes the JVM-written manifest transparently,
    # bounds byte-exact through the JVM roundtrip
    assert ice.read_table(spark, root).count() == base.count()
    back = {f["file_path"]: f.get("lower_bounds") for f in ice.plan_files(root)}
    assert back == {
        d["file_path"]: d.get("lower_bounds") for _, _, d in ours
    }


def test_delete_partition_snapshot(spark, sf_dir, tmp_path):
    """DELETE as a new snapshot: matched files become DELETED manifest
    entries (no data file touched), kept files re-stated as EXISTING;
    prior snapshots still see the deleted rows (time travel)."""
    from incubator_gluten_spark.catalog import load_tables

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    root = str(tmp_path / "ice_del")
    base = _orders_cols(orders, 1996)
    ice.create_table(base, root, partition_cols=["o_orderpriority"])
    out = ice.delete_partition(root, {"o_orderpriority": "1-URGENT"})
    assert out["files_deleted"] > 0
    after = ice.read_table(spark, root)
    assert after.filter(F.col("o_orderpriority") == "1-URGENT").count() == 0
    want = base.filter(F.col("o_orderpriority") != "1-URGENT").count()
    assert after.count() == want
    # time travel: snapshot 1 still holds the full table
    assert ice.read_table(spark, root, snapshot_id=1).count() == base.count()
    hist = ice.history(root)
    assert hist[-1]["operation"] == "delete"
    with pytest.raises(ValueError, match="no files match"):
        ice.delete_partition(root, {"o_orderpriority": "nope"})


def test_full_tpch_typed_roundtrip(spark, sf_dir, tmp_path):
    """Timestamp/decimal columns mount: the WHOLE orders schema (incl.
    timestamp_ntz o_orderdate and a decimal cast) round-trips through
    the table format with types preserved."""
    from incubator_gluten_spark.catalog import load_tables

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    df = orders.filter("o_orderkey < 800").select(
        "o_orderkey",
        "o_orderdate",
        F.to_date("o_orderdate").alias("d"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("m"),
    )
    root = str(tmp_path / "ice_typed")
    ice.create_table(df, root)
    back = ice.read_table(spark, root)
    assert dict(back.dtypes) == dict(df.dtypes)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
    with pytest.raises(ValueError, match="identity partitioning"):
        ice.create_table(df, str(tmp_path / "bad"), partition_cols=["o_orderdate"])


def test_date_identity_partition_roundtrip(spark, sf_dir, tmp_path):
    """r7 ADVICE: date identity partitioning was advertised but
    KeyError'd in the data-file rewrite — now supported end-to-end:
    manifest partition tuples carry days-since-epoch ints (the declared
    Avro 'int'), data files carry the date32 column, pruning works."""
    from incubator_gluten_spark.catalog import load_tables
    import datetime

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    df = orders.filter("o_orderkey < 2000").select(
        "o_orderkey",
        "o_totalprice",
        F.to_date(F.date_trunc("year", "o_orderdate")).alias("y"),
    )
    root = str(tmp_path / "ice_date_part")
    ice.create_table(df, root, partition_cols=["y"])
    back = ice.read_table(spark, root)
    assert dict(back.dtypes) == dict(df.dtypes)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # metadata-only pruning: filter value is the manifest representation
    days_1996 = (datetime.date(1996, 1, 1) - datetime.date(1970, 1, 1)).days
    files = ice.plan_files(root, partition_filter={"y": days_1996})
    assert files and all(f["partition"]["y"] == days_1996 for f in files)
    pruned = ice.read_table(spark, root, partition_filter={"y": days_1996})
    want = df.filter(F.col("y") == F.lit(datetime.date(1996, 1, 1)))
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, want.collect()))


def test_partition_values_unescaped_in_manifests(spark, tmp_path):
    """Escaped dir segments and the Hive null sentinel resolve to true
    (typed/null) partition values in the manifest tuples."""
    df = spark.createDataFrame(
        [(1, "a=b"), (2, None), (3, "p%q")], "id int, k string"
    )
    root = str(tmp_path / "ice_esc")
    ice.create_table(df, root, partition_cols=["k"])
    vals = {f["partition"]["k"] for f in ice.plan_files(root)}
    assert vals == {"a=b", None, "p%q"}
    back = ice.read_table(spark, root)
    assert sorted(map(tuple, back.collect()), key=str) == sorted(
        map(tuple, df.collect()), key=str
    )


# ---------------------------------------------------------------------------
# row-level COPY-ON-WRITE delete/update (r10) — the v1 COW twins of
# iceberg_v2's merge-on-read deletes


def _mk_cow(spark, tmp_path, name):
    root = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, float(i * 10), str(i % 3)) for i in range(12)],
        "k long, v double, p string",
    )
    ice.create_table(df, root, partition_cols=["p"])
    return root


def test_cow_delete_prunes_and_rewrites(spark, tmp_path):
    root = _mk_cow(spark, tmp_path, "cow_del")
    out = ice.delete_where(spark, root, [("p", "=", "1"), ("k", "<", 5)])
    # only partition p='1' files are candidates; others EXISTING untouched
    assert out["files_skipped"] >= 1 and out["files_rewritten"] >= 1
    got = sorted(r.k for r in ice.read_table(spark, root).collect())
    assert got == [k for k in range(12) if not (k % 3 == 1 and k < 5)]
    # time travel still sees the deleted rows
    assert ice.read_table(spark, root, snapshot_id=1).count() == 12


def test_cow_delete_full_file_leaves_no_added_manifest(spark, tmp_path):
    root = _mk_cow(spark, tmp_path, "cow_del_all")
    out = ice.delete_where(spark, root, [("p", "=", "2")])
    assert out["files_rewritten"] >= 1
    got = {r.p for r in ice.read_table(spark, root).collect()}
    assert got == {"0", "1"}


def test_cow_update_pre_update_semantics(spark, tmp_path):
    """All assignments see PRE-update values: the v <- k, k <- v swap
    detector (same pin shape as delta's update_where)."""
    root = str(tmp_path / "cow_upd_swap")
    df = spark.createDataFrame([(1, 100.0), (2, 200.0)], "k long, v double")
    ice.create_table(df, root)
    ice.update_where(
        spark, root, [("k", "=", 1)],
        {"k": "CAST(v AS BIGINT)", "v": "CAST(k AS DOUBLE)"},
    )
    got = sorted(map(tuple, ice.read_table(spark, root).collect()))
    assert got == [(2, 200.0), (100, 1.0)]


def test_cow_update_moves_rows_across_partitions(spark, tmp_path):
    """Updating a partition source column restages the row under its
    NEW partition tuple (the default spec governs the rewrite)."""
    root = _mk_cow(spark, tmp_path, "cow_upd_move")
    ice.update_where(spark, root, [("p", "=", "2")], {"p": "'9'"})
    got = {r.p for r in ice.read_table(spark, root).collect()}
    assert got == {"0", "1", "9"}
    # and partition pruning on the NEW value finds the moved rows
    assert len(ice.plan_files(root, source_predicates=[("p", "=", "9")])) >= 1
    rows = ice.read_table(spark, root, source_predicates=[("p", "=", "9")])
    assert rows.count() == 4


def test_cow_update_unknown_column_refuses(spark, tmp_path):
    root = _mk_cow(spark, tmp_path, "cow_upd_bad")
    with pytest.raises(ValueError, match="unknown column"):
        ice.update_where(spark, root, [("k", "=", 1)], {"nope": "1"})


def test_cow_on_name_mapped_table_refuses(spark, tmp_path):
    from incubator_gluten_spark.sources import delta_protocol as dp
    from incubator_gluten_spark.sources import uniform as uf

    root = str(tmp_path / "cow_nm")
    dp.create_table(
        spark.createDataFrame([(1, "a")], "k long, p string").coalesce(1),
        root,
        partition_cols=["p"],
    )
    uf.enable_uniform(spark, root)
    with pytest.raises(ValueError, match="name-mapped"):
        ice.delete_where(spark, root, [("k", "=", 1)])


def test_cow_delete_on_evolved_schema_binds_by_field_id(spark, tmp_path):
    """COW rewrite over a renamed column must bind the old files by
    field id and restage under the CURRENT schema."""
    root = str(tmp_path / "cow_evo")
    ice.create_table(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double"),
        root,
    )
    ice.rename_column(root, "v", "val")
    ice.delete_where(spark, root, [("val", ">", 15.0)])
    got = sorted(map(tuple, ice.read_table(spark, root).collect()))
    assert got == [(1, 10.0)]
    assert ice.read_table(spark, root).columns == ["k", "val"]


def test_cow_delete_keeps_null_predicate_rows(spark, tmp_path):
    """SQL DELETE removes rows where the predicate is TRUE only — a
    row whose predicate evaluates NULL (NULL in the column) must
    SURVIVE the COW rewrite (r11 ADVICE: plain ~cond yields NULL and
    filter() silently dropped it)."""
    root = str(tmp_path / "cow_null")
    ice.create_table(
        spark.createDataFrame(
            [(1, 10.0), (2, None), (3, 30.0)], "k long, v double"
        ),
        root,
    )
    ice.delete_where(spark, root, [("v", ">", 15.0)])
    got = sorted(
        map(tuple, ice.read_table(spark, root).collect()),
        key=lambda t: t[0],
    )
    assert got == [(1, 10.0), (2, None)]


# ---------------------------------------------------------------------------
# MERGE INTO (COW) — r11


def _merge_src(spark, rows):
    return spark.createDataFrame(rows, "k long, v double, p string")


def test_merge_upserts_and_skips_untouched_files(spark, tmp_path):
    root = _mk_cow(spark, tmp_path, "merge_upsert")
    before = {
        f["file_path"]: f["file_size_in_bytes"] for f in ice.plan_files(root)
    }
    out = ice.merge(
        spark,
        root,
        _merge_src(spark, [(1, 111.0, "1"), (100, 1000.0, "1")]),
        ["k"],
    )
    assert out["files_rewritten"] >= 1 and out["files_skipped"] >= 1
    got = sorted(map(tuple, ice.read_table(spark, root).collect()))
    want = sorted(
        [(i, float(i * 10), str(i % 3)) for i in range(12) if i != 1]
        + [(1, 111.0, "1"), (100, 1000.0, "1")]
    )
    assert got == want
    # untouched files survive BYTE-IDENTICAL (EXISTING, not rewritten)
    after = {
        f["file_path"]: f["file_size_in_bytes"] for f in ice.plan_files(root)
    }
    surviving = set(before) & set(after)
    assert len(surviving) == out["files_skipped"]
    assert all(before[p] == after[p] for p in surviving)
    # time travel still sees the pre-merge rows
    assert ice.read_table(spark, root, snapshot_id=1).count() == 12


def test_merge_null_keys_never_match(spark, tmp_path):
    """SQL MERGE: NULL in an ON column never equals anything — such
    source rows INSERT, they must not update any target row."""
    root = _mk_cow(spark, tmp_path, "merge_null")
    ice.merge(spark, root, _merge_src(spark, [(None, 5.0, "0")]), ["k"])
    rows = ice.read_table(spark, root).collect()
    assert len(rows) == 13
    assert sum(1 for r in rows if r.k is None) == 1
    assert sorted(r.v for r in rows if r.k is not None) == [
        float(i * 10) for i in range(12)
    ]  # nothing updated


def test_merge_delete_mode_and_ignore_inserts(spark, tmp_path):
    root = _mk_cow(spark, tmp_path, "merge_del")
    out = ice.merge(
        spark,
        root,
        _merge_src(spark, [(5, 0.0, "x"), (777, 7.0, "0")]),
        ["k"],
        when_matched="delete",
        when_not_matched="ignore",
    )
    assert out["files_rewritten"] == 1
    got = sorted(r.k for r in ice.read_table(spark, root).collect())
    assert got == [k for k in range(12) if k != 5]  # 777 NOT inserted


def test_merge_cardinality_violation_refuses(spark, tmp_path):
    root = _mk_cow(spark, tmp_path, "merge_card")
    with pytest.raises(ValueError, match="CARDINALITY"):
        ice.merge(
            spark,
            root,
            _merge_src(spark, [(1, 1.0, "1"), (1, 2.0, "1")]),
            ["k"],
        )
    # duplicates that match NOTHING are plain multi-row inserts
    out = ice.merge(
        spark, root, _merge_src(spark, [(500, 1.0, "1"), (500, 2.0, "1")]),
        ["k"],
    )
    assert out["files_rewritten"] == 0
    assert ice.read_table(spark, root).count() == 14


def test_merge_multi_column_key(spark, tmp_path):
    root = str(tmp_path / "merge_multi")
    ice.create_table(
        spark.createDataFrame(
            [(1, "a", 1.0), (1, "b", 2.0), (2, "a", 3.0)],
            "k long, g string, v double",
        ),
        root,
    )
    ice.merge(
        spark,
        root,
        spark.createDataFrame(
            [(1, "b", 22.0), (2, "b", 44.0)], "k long, g string, v double"
        ),
        ["k", "g"],
    )
    got = sorted(map(tuple, ice.read_table(spark, root).collect()))
    assert got == [(1, "a", 1.0), (1, "b", 22.0), (2, "a", 3.0), (2, "b", 44.0)]


# ---------------------------------------------------------------------------
# expire_snapshots / remove_orphan_files — r11


def _mk_history(spark, tmp_path, name, tag_at=None):
    """4-snapshot table: create(1,2) -> append(3) -> COW delete k=1 ->
    append(4); optional tag on snapshot ``tag_at``."""
    root = str(tmp_path / name)
    mk = lambda rows: spark.createDataFrame(rows, "k long, v double")
    ice.create_table(mk([(1, 1.0), (2, 2.0)]), root)
    ice.append(mk([(3, 3.0)]), root)
    ice.delete_where(spark, root, [("k", "=", 1)])
    ice.append(mk([(4, 4.0)]), root)
    if tag_at is not None:
        ice.create_tag(root, "pinned", snapshot_id=tag_at)
    return root


def test_expire_snapshots_deletes_unreachable_files(spark, tmp_path):
    root = _mk_history(spark, tmp_path, "expire_del")
    import os

    n_before = len(os.listdir(os.path.join(root, "data")))
    out = ice.expire_snapshots(root, retain_last=1)
    assert out["expired_snapshot_ids"] == [1, 2, 3]
    # the pre-rewrite originals are live in NO retained snapshot — gone
    assert out["data_files_deleted"] >= 1
    assert len(os.listdir(os.path.join(root, "data"))) == n_before - out[
        "data_files_deleted"
    ]
    # current read unaffected
    assert sorted(r.k for r in ice.read_table(spark, root).collect()) == [
        2, 3, 4,
    ]
    # time travel to expired history refuses
    with pytest.raises(ValueError):
        ice.read_table(spark, root, snapshot_id=1)


def test_expire_snapshots_never_expires_refs(spark, tmp_path):
    """Branch/tag'd snapshots NEVER expire (spec retention contract) —
    and files reachable from the tag survive, so data_files_deleted is
    0 here (snapshot 1's files are all live in tagged snapshot 2)."""
    root = _mk_history(spark, tmp_path, "expire_tag", tag_at=2)
    out = ice.expire_snapshots(root, retain_last=1)
    assert 2 not in out["expired_snapshot_ids"]
    assert out["expired_snapshot_ids"] == [1, 3]
    assert out["data_files_deleted"] == 0
    # tagged snapshot fully readable after expiry
    assert sorted(
        r.k for r in ice.read_table(spark, root, snapshot_id=2).collect()
    ) == [1, 2, 3]
    assert sorted(r.k for r in ice.read_table(spark, root).collect()) == [
        2, 3, 4,
    ]


def test_remove_orphan_files_scopes_to_unreferenced(spark, tmp_path):
    root = _mk_history(spark, tmp_path, "orphans")
    import os

    # plant an orphan + a stale staging dir (abandoned write)
    with open(os.path.join(root, "data", "orphan-dead.parquet"), "wb") as f:
        f.write(b"junk")
    os.makedirs(os.path.join(root, "_staging_dead"))
    out = ice.remove_orphan_files(root)
    assert out == {"orphans_deleted": 1, "staging_dirs_deleted": 1}
    # every snapshot still reads — DELETED-status files are referenced,
    # never collected as orphans
    assert sorted(r.k for r in ice.read_table(spark, root).collect()) == [
        2, 3, 4,
    ]
    assert sorted(
        r.k for r in ice.read_table(spark, root, snapshot_id=1).collect()
    ) == [1, 2]


# ---------------------------------------------------------------------------
# read_changelog — r11 (the CDC-read analog of Delta CDF)


def test_changelog_full_history_with_cow_rewrites(spark, tmp_path):
    root = str(tmp_path / "changelog")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v double")
    ice.create_table(mk([(1, 1.0), (2, 2.0)]), root)          # snap 1
    ice.append(mk([(3, 3.0)]), root)                          # snap 2
    ice.delete_where(spark, root, [("k", "=", 1)])            # snap 3
    ice.update_where(spark, root, [("k", "=", 3)], {"v": "30.0"})  # snap 4
    got = sorted(
        (r.k, r.v, r._change_type, r._commit_snapshot_id)
        for r in ice.read_changelog(spark, root, 1).collect()
    )
    # raw (non-net) changelog: a COW rewrite emits delete + re-insert
    # for the files it touches.  r12 column bounds prune UNTOUCHED
    # files from every rewrite, and this layout holds one row per
    # file, so each DML touches exactly its own row's file and the raw
    # changelog is minimal — pre-bounds the same ops rewrote (and so
    # re-emitted) every scanned file's rows.
    want = sorted([
        (3, 3.0, "insert", 2),
        (1, 1.0, "delete", 3),
        (3, 3.0, "delete", 4), (3, 30.0, "insert", 4),
    ])
    assert got == want


def test_changelog_range_slice_and_expired_refusal(spark, tmp_path):
    root = str(tmp_path / "changelog_rng")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v double")
    ice.create_table(mk([(1, 1.0)]), root)
    ice.append(mk([(2, 2.0)]), root)
    ice.append(mk([(3, 3.0)]), root)
    got = sorted(
        (r.k, r._change_type)
        for r in ice.read_changelog(spark, root, 1, 2).collect()
    )
    assert got == [(2, "insert")]  # only snapshot 2's changes
    ice.expire_snapshots(root, retain_last=1)
    with pytest.raises(ValueError, match="expired or never"):
        ice.read_changelog(spark, root, 0, 1)


def test_changelog_net_changes_cancel_rewrites(spark, tmp_path):
    """net=True (the procedure's net_changes): COW rewrite
    delete+re-insert pairs cancel, updates net to ONE insert of the
    final value, and a row inserted then deleted inside the range
    vanishes entirely."""
    root = str(tmp_path / "changelog_net")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v double")
    ice.create_table(mk([(1, 1.0), (2, 2.0)]), root)
    ice.append(mk([(3, 3.0)]), root)
    ice.delete_where(spark, root, [("k", "=", 1)])
    ice.update_where(spark, root, [("k", "=", 3)], {"v": "30.0"})
    net = sorted(
        (r.k, r.v, r._change_type)
        for r in ice.read_changelog(spark, root, 1, net=True).collect()
    )
    assert net == [(1, 1.0, "delete"), (3, 30.0, "insert")]
    assert "_commit_snapshot_id" not in ice.read_changelog(
        spark, root, 1, net=True
    ).columns
    ice.append(mk([(9, 9.0)]), root)
    ice.delete_where(spark, root, [("k", "=", 9)])
    assert ice.read_changelog(spark, root, 4, net=True).isEmpty()


def test_merge_binds_by_field_id_after_rename(spark, tmp_path):
    """MERGE over a renamed key column: the provenance scan and the
    rewrite both bind old files by FIELD ID (hazard-shielded read), so
    a key written under the old name still matches and restages under
    the CURRENT schema."""
    root = str(tmp_path / "merge_evo")
    ice.create_table(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double"),
        root,
    )
    ice.rename_column(root, "k", "key")
    out = ice.merge(
        spark,
        root,
        spark.createDataFrame([(2, 222.0), (3, 30.0)], "key long, v double"),
        ["key"],
    )
    assert out["files_rewritten"] == 1  # only the k=2 file
    got = sorted(map(tuple, ice.read_table(spark, root).collect()))
    assert got == [(1, 10.0), (2, 222.0), (3, 30.0)]
    assert ice.read_table(spark, root).columns == ["key", "v"]


def test_changelog_plan_width_constant_in_snapshots(
    spark, tmp_path, monkeypatch
):
    """r13 (r12-verdict plan-width fix applied to CDC): the changelog
    over N snapshots plans ONE scan per change kind — snapshot ids
    ride the basename broadcast map — never one subtree per snapshot.
    Short ranges may use per-snapshot literals (width <= a constant
    cap); the cap is forced down so 8 snapshots exercise the map."""
    root = str(tmp_path / "changelog_width")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v double")
    ice.create_table(mk([(0, 0.0)]), root)
    for v in range(1, 9):
        ice.append(mk([(v, float(v))]), root)
    small = ice.read_changelog(spark, root, 1)
    assert sorted((r.k, r._change_type, r._commit_snapshot_id)
                  for r in small.collect()) == [
        (v, "insert", v + 1) for v in range(1, 9)
    ]
    monkeypatch.setattr(ice, "_CHANGELOG_UNION_MAX", 2)
    ch = ice.read_changelog(spark, root, 1)  # 8 insert-only snapshots
    phys = ch._jdf.queryExecution().executedPlan().toString()
    assert phys.count("FileScan parquet") == 1
    got = sorted((r.k, r._change_type, r._commit_snapshot_id)
                 for r in ch.collect())
    assert got == [(v, "insert", v + 1) for v in range(1, 9)]
    # a COW delete adds DELETED entries: still one scan per KIND
    ice.delete_where(spark, root, [("k", "=", 3)])
    ch2 = ice.read_changelog(spark, root, 1)
    phys2 = ch2._jdf.queryExecution().executedPlan().toString()
    assert phys2.count("FileScan parquet") <= 2
