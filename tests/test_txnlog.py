"""Transaction-log table format protocol tests: snapshot isolation,
copy-on-write delete with manifest-stats file skipping, time travel,
commit-conflict detection, history accounting."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.catalog import load_tables
from incubator_gluten_spark.sources import txnlog

ROOT = "/tmp/spark_graft_io/txnlog_unit"


@pytest.fixture()
def table(spark, sf_dir):
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    txnlog.create_table(
        orders.filter(F.year("o_orderdate") == 1996),
        ROOT,
        stats_cols=["o_orderpriority"],
    )
    txnlog.append(
        orders.filter(F.year("o_orderdate") == 1997),
        ROOT,
        stats_cols=["o_orderpriority"],
    )
    return orders


def test_snapshot_counts_and_time_travel(spark, table):
    v0 = txnlog.read_snapshot(spark, ROOT, 0).count()
    v1 = txnlog.read_snapshot(spark, ROOT, 1).count()
    expect0 = table.filter(F.year("o_orderdate") == 1996).count()
    expect1 = table.filter(F.year("o_orderdate").isin(1996, 1997)).count()
    assert (v0, v1) == (expect0, expect1)
    # latest == explicit max version
    assert txnlog.read_snapshot(spark, ROOT).count() == v1


def test_delete_skips_files_and_preserves_history(spark, table):
    outcome = txnlog.delete_where(spark, ROOT, "o_orderpriority", "1-URGENT")
    # range-clustering on the stats column guarantees non-matching files
    # are skipped via manifest stats alone
    assert outcome["files_skipped"] > 0
    assert outcome["files_rewritten"] > 0
    after = txnlog.read_snapshot(spark, ROOT)
    assert after.filter(F.col("o_orderpriority") == "1-URGENT").count() == 0
    expect = table.filter(
        F.year("o_orderdate").isin(1996, 1997)
        & (F.col("o_orderpriority") != "1-URGENT")
    ).count()
    assert after.count() == expect
    # historical versions still resolve to their original row counts
    hist = txnlog.history(ROOT)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert hist[1]["n_rows"] > hist[2]["n_rows"]
    v1 = txnlog.read_snapshot(spark, ROOT, 1)
    assert v1.filter(F.col("o_orderpriority") == "1-URGENT").count() > 0


def test_commit_conflict_detected(spark, table):
    v = txnlog.current_version(ROOT)
    with pytest.raises(FileExistsError):
        txnlog._commit(ROOT, v, [], [], "dummy")


def test_data_files_are_immutable(spark, table):
    live, _ = txnlog.resolve(ROOT, 0)
    before = {
        rec["path"]: os.path.getmtime(os.path.join(ROOT, rec["path"]))
        for rec in live
    }
    txnlog.delete_where(spark, ROOT, "o_orderpriority", "2-HIGH")
    for path, mtime in before.items():
        full = os.path.join(ROOT, path)
        if os.path.exists(full):
            assert os.path.getmtime(full) == mtime


def test_merge_into_update_and_insert(spark, sf_dir, table=None):
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    root = "/tmp/spark_graft_io/txnlog_merge_unit"
    tgt = orders.filter(F.year("o_orderdate") == 1996)
    txnlog.create_table(tgt, root, stats_cols=["o_orderkey"])
    n0 = tgt.count()

    upd = tgt.filter(F.col("o_orderkey") < 1000).withColumn(
        "o_orderpriority", F.lit("MERGED")
    )
    n_upd = upd.count()
    out = txnlog.merge_into(spark, root, upd, "o_orderkey")
    assert out["files_skipped"] > 0  # bounds pruning fired
    snap = txnlog.read_snapshot(spark, root)
    assert snap.count() == n0  # update changed no row count
    assert (
        snap.filter(F.col("o_orderpriority") == "MERGED").count() == n_upd
    )

    ins = tgt.limit(50).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(50_000_000)
    )
    out2 = txnlog.merge_into(spark, root, ins, "o_orderkey")
    assert out2["files_rewritten"] == 0  # pure append commit
    assert txnlog.read_snapshot(spark, root).count() == n0 + 50
    # pre-merge snapshot unchanged (time travel across merges)
    assert txnlog.read_snapshot(spark, root, 0).filter(
        F.col("o_orderpriority") == "MERGED"
    ).count() == 0


def test_merge_into_source_null_overwrites(spark, sf_dir):
    """whenMatchedUpdateAll semantics: a matched source row carrying
    NULL in a non-key column must STILL replace the target row whole —
    per-column coalesce would silently keep the stale target value
    (the bug this test pins)."""
    root = "/tmp/spark_graft_io/txnlog_nullmerge_unit"
    tgt = spark.createDataFrame(
        [(1, "keep", 10.0), (2, "stale", 20.0)],
        "k bigint, tag string, v double",
    )
    txnlog.create_table(tgt, root, stats_cols=["k"])
    src = spark.createDataFrame(
        [(2, None, 99.0)], "k bigint, tag string, v double"
    )
    txnlog.merge_into(spark, root, src, "k")
    rows = {
        r["k"]: (r["tag"], r["v"])
        for r in txnlog.read_snapshot(spark, root).collect()
    }
    assert rows[1] == ("keep", 10.0)
    assert rows[2] == (None, 99.0), rows[2]  # NULL overwrote 'stale'


def test_append_if_absent_is_idempotent_and_race_safe(spark, sf_dir):
    """Replay returns False without touching the table, and a loser
    whose commit file appeared mid-write cleans up its own orphaned
    data files (attempt-unique names make that safe)."""
    import glob
    import json
    import os

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    root = "/tmp/spark_graft_io/txnlog_idem_unit"
    df = orders.filter(F.year("o_orderdate") == 1996).limit(100)
    txnlog.create_table(df, root, stats_cols=["o_orderkey"])

    assert txnlog.append_if_absent(df, root, 1) is True
    n1 = txnlog.read_snapshot(spark, root).count()
    files_before = set(glob.glob(os.path.join(root, "data", "*.parquet")))
    # replay of the same version: no-op
    assert txnlog.append_if_absent(df, root, 1) is False
    assert txnlog.read_snapshot(spark, root).count() == n1
    assert set(glob.glob(os.path.join(root, "data", "*.parquet"))) == files_before

    # race loser: version 2's commit file appears while our write is in
    # flight -> the loser must remove its own files and leave the
    # winner's commit untouched
    winner_commit = os.path.join(root, "_txnlog", "00000002.json")
    with open(winner_commit, "w") as f:
        json.dump({"version": 2, "add": [], "remove": [], "schema": ""}, f)
    # append_if_absent's fast path sees the existing commit
    assert txnlog.append_if_absent(df, root, 2) is False
    assert json.load(open(winner_commit))["add"] == []
    assert set(glob.glob(os.path.join(root, "data", "*.parquet"))) == files_before
