"""Delta OPTIMIZE (bin-packing compaction, dataChange=false) and
VACUUM (version-retention physical cleanup) on the wire format.

Pins: compaction must not change logical content at ANY version,
must materialize DV deletes (and never resurrect them), must be
invisible to CDF, and must keep per-file stats; vacuum must delete
exactly the unreferenced files, keep retained versions readable, and
keep retained commits' change-data files.

Reference analog: gluten-delta reads post-OPTIMIZE tables through the
Delta jar (gluten-delta/src/main/scala/org/apache/gluten/execution/
DeltaScanTransformer.scala); the action semantics are PROTOCOL.md's.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import delta_protocol as dp


def _rows(df):
    return sorted(map(tuple, df.collect()), key=lambda t: tuple(map(str, t)))


def _orders(spark, sf_dir, year):
    from incubator_gluten_spark.catalog import load_tables

    return (
        load_tables(spark, sf_dir, ("orders",))["orders"]
        .filter(F.year("o_orderdate") == year)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


def _two_commit_table(spark, sf_dir, tmp_path, name):
    root = str(tmp_path / name)
    a = _orders(spark, sf_dir, 1996)
    b = _orders(spark, sf_dir, 1997)
    dp.create_table(a, root, partition_cols=["o_orderpriority"])
    dp.append(b, root)
    return root, a.unionByName(b)


def _commit_actions(root, version):
    path = os.path.join(root, "_delta_log", f"{version:020d}.json")
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_optimize_compacts_to_one_file_per_partition(spark, sf_dir, tmp_path):
    root, want = _two_commit_table(spark, sf_dir, tmp_path, "opt")
    before = dp.resolve(spark, root)
    per_part: dict = {}
    for a in before.adds:
        key = tuple(sorted(a["partitionValues"].items()))
        per_part[key] = per_part.get(key, 0) + 1
    assert max(per_part.values()) >= 2  # two appends -> >= 2 files/part
    out = dp.optimize(spark, root)
    assert out["files_removed"] > out["files_added"] > 0
    after = dp.resolve(spark, root)
    per_part_after: dict = {}
    for a in after.adds:
        key = tuple(sorted(a["partitionValues"].items()))
        per_part_after[key] = per_part_after.get(key, 0) + 1
    assert max(per_part_after.values()) == 1
    # logical content unchanged, at the new version AND the old one
    assert _rows(dp.read_table(spark, root)) == _rows(want)
    assert _rows(dp.read_table(spark, root, version=before.version)) == _rows(
        want
    )


def test_optimize_actions_say_datachange_false(spark, sf_dir, tmp_path):
    root, _ = _two_commit_table(spark, sf_dir, tmp_path, "flags")
    out = dp.optimize(spark, root)
    for act in _commit_actions(root, out["version"]):
        if act.get("add"):
            assert act["add"]["dataChange"] is False
            # staged adds keep footer stats for file skipping
            stats = json.loads(act["add"]["stats"])
            assert stats["numRecords"] > 0
            assert "minValues" in stats and "maxValues" in stats
        if act.get("remove"):
            assert act["remove"]["dataChange"] is False


def test_optimize_materializes_dv_deletes(spark, sf_dir, tmp_path):
    root, _ = _two_commit_table(spark, sf_dir, tmp_path, "dv")
    dp.delete_where_dv(spark, root, "o_totalprice > 150000")
    want = _rows(dp.read_table(spark, root))
    assert any(a.get("deletionVector") for a in dp.resolve(spark, root).adds)
    dp.optimize(spark, root)
    after = dp.resolve(spark, root)
    assert not any(a.get("deletionVector") for a in after.adds)
    # DV-deleted rows stay deleted through the rewrite
    assert _rows(dp.read_table(spark, root)) == want


def test_optimize_noop_when_nothing_to_compact(spark, sf_dir, tmp_path):
    root = str(tmp_path / "noop")
    dp.create_table(
        _orders(spark, sf_dir, 1996), root, partition_cols=["o_orderpriority"]
    )
    v0 = dp.resolve(spark, root).version
    out = dp.optimize(spark, root)  # one file per partition, no DVs
    assert out["files_removed"] == 0 and out["partitions_compacted"] == 0
    assert dp.resolve(spark, root).version == v0  # no empty commit


def test_optimize_is_invisible_to_cdf(spark, sf_dir, tmp_path):
    root = str(tmp_path / "cdf")
    dp.create_table(
        _orders(spark, sf_dir, 1996), root, partition_cols=["o_orderpriority"]
    )
    dp.enable_cdf(spark, root)
    dp.append(_orders(spark, sf_dir, 1997), root)
    v_before = dp.resolve(spark, root).version
    out = dp.optimize(spark, root)
    changes = dp.table_changes(spark, root, v_before + 1, out["version"])
    assert changes.count() == 0  # the OPTIMIZE commit contributes nothing
    # and the append before it is still a visible insert
    changes = dp.table_changes(spark, root, v_before, out["version"])
    assert (
        changes.filter(F.col("_change_type") == "insert").count()
        == _orders(spark, sf_dir, 1997).count()
    )


def test_vacuum_deletes_unreferenced_keeps_current(spark, sf_dir, tmp_path):
    root, _ = _two_commit_table(spark, sf_dir, tmp_path, "vac")
    dp.delete_where(spark, root, "o_totalprice > 150000")  # COW rewrite
    want = _rows(dp.read_table(spark, root))
    n_disk_before = sum(
        len(fs)
        for d, _, fs in os.walk(root)
        if "_delta_log" not in d
    )
    out = dp.vacuum(spark, root, retain_versions=1)
    assert out["files_deleted"] > 0
    n_disk_after = sum(
        len(fs)
        for d, _, fs in os.walk(root)
        if "_delta_log" not in d
    )
    assert n_disk_after == n_disk_before - out["files_deleted"]
    # current version reads exactly as before the vacuum
    assert _rows(dp.read_table(spark, root)) == want
    # disk now holds exactly the referenced set
    assert n_disk_after == len(dp.resolve(spark, root).adds)
    # time travel behind the retention fails at the scan (files gone)
    with pytest.raises(Exception):
        dp.read_table(spark, root, version=0).collect()


def test_vacuum_retains_requested_versions(spark, sf_dir, tmp_path):
    root, want_all = _two_commit_table(spark, sf_dir, tmp_path, "vac2")
    dp.delete_where(spark, root, "o_totalprice > 150000")
    cur = dp.resolve(spark, root).version
    want_prev = _rows(dp.read_table(spark, root, version=cur - 1))
    dp.vacuum(spark, root, retain_versions=2)
    # the previous version is inside the retention window: still readable
    assert _rows(dp.read_table(spark, root, version=cur - 1)) == want_prev


def test_vacuum_keeps_cdc_files_of_retained_commits(spark, sf_dir, tmp_path):
    root = str(tmp_path / "vac_cdf")
    dp.create_table(
        _orders(spark, sf_dir, 1996), root, partition_cols=["o_orderpriority"]
    )
    dp.enable_cdf(spark, root)
    dp.delete_where(spark, root, "o_totalprice > 150000")
    v_del = dp.resolve(spark, root).version
    want = _rows(
        dp.table_changes(spark, root, v_del, v_del).select(
            "o_orderkey", "_change_type"
        )
    )
    assert want  # the delete produced cdc rows
    dp.vacuum(spark, root, retain_versions=1)  # window includes v_del
    got = _rows(
        dp.table_changes(spark, root, v_del, v_del).select(
            "o_orderkey", "_change_type"
        )
    )
    assert got == want


# ---------------------------------------------------------------------------
# OPTIMIZE ZORDER BY (r10)


def test_zorder_narrows_stats_on_both_dimensions(spark, tmp_path):
    """A 32x32 grid z-ordered into 4 files: every output file's stats
    range must be narrow on BOTH columns (a Morton quadrant ± range-
    sampling slop) — single-column sorting would leave the other
    column's range at full width, which is exactly what ZORDER fixes
    for multi-dimensional file skipping."""
    root = str(tmp_path / "zorder_grid")
    grid = spark.createDataFrame(
        [(a, b) for a in range(32) for b in range(32)], "a bigint, b bigint"
    ).coalesce(1)
    dp.create_table(grid, root)
    out = dp.optimize(spark, root, zorder_by=["a", "b"], target_files=4)
    assert out["files_added"] == 4 and out["files_removed"] == 1
    snap = dp.resolve(spark, root)
    for add in snap.adds:
        ba = dp._stats_bounds(add, "a")
        bb = dp._stats_bounds(add, "b")
        assert ba and bb
        assert ba[1] - ba[0] <= 22, f"a-range too wide: {ba}"
        assert bb[1] - bb[0] <= 22, f"b-range too wide: {bb}"
    # logical content unchanged, and the commit is dataChange=false
    assert dp.read_table(spark, root).count() == 1024
    acts = dp._read_commit_actions(root, snap.version)
    assert all(
        not a["add"]["dataChange"] for a in acts if "add" in a
    ) and all(not a["remove"]["dataChange"] for a in acts if "remove" in a)


def test_zorder_partitioned_sorts_within_partition(spark, tmp_path):
    root = str(tmp_path / "zorder_part")
    df = spark.createDataFrame(
        [(i, float(i % 13), str(i % 2)) for i in range(100)],
        "k bigint, v double, p string",
    ).coalesce(1)
    dp.create_table(df, root, partition_cols=["p"])
    out = dp.optimize(spark, root, zorder_by=["k", "v"])
    assert out["partitions_compacted"] == 2
    snap = dp.resolve(spark, root)
    assert len(snap.adds) == 2  # one z-ordered file per partition
    assert dp.read_table(spark, root).count() == 100


def test_zorder_unsupported_type_refuses(spark, tmp_path):
    """Stats-typed columns (numeric/decimal/date/timestamp/string) all
    z-order; types parquet keeps no ordered stats for refuse."""
    root = str(tmp_path / "zorder_bad")
    dp.create_table(
        spark.createDataFrame(
            [(1, bytearray(b"x"))], "k bigint, b binary"
        ).coalesce(1),
        root,
    )
    with pytest.raises(dp.DeltaProtocolError, match="ZORDER BY supports"):
        dp.optimize(spark, root, zorder_by=["b"])


def test_zorder_date_string_narrows_stats_on_both_dimensions(spark, tmp_path):
    """The r10/r11 carried directive: date × string is the COMMON
    z-order key shape (event_date × user_id).  A 32x32 grid of
    (date, string) z-ordered into 4 files must narrow per-file min/max
    on BOTH dimensions at once — single-column sorting would leave the
    other at full width."""
    import datetime as dt

    root = str(tmp_path / "zorder_ds")
    rows = [
        (dt.date(2024, 1, 1) + dt.timedelta(days=a), f"user-{b:04d}")
        for a in range(32)
        for b in range(32)
    ]
    grid = spark.createDataFrame(rows, "d date, u string").coalesce(1)
    dp.create_table(grid, root)
    out = dp.optimize(spark, root, zorder_by=["d", "u"], target_files=4)
    assert out["files_added"] == 4 and out["files_removed"] == 1
    snap = dp.resolve(spark, root)
    for add in snap.adds:
        bd = dp._stats_bounds(add, "d")
        bu = dp._stats_bounds(add, "u")
        assert bd and bu
        d_lo = dt.date.fromisoformat(str(bd[0])[:10])
        d_hi = dt.date.fromisoformat(str(bd[1])[:10])
        assert (d_hi - d_lo).days <= 24, f"date range too wide: {bd}"
        u_lo, u_hi = int(bu[0][5:]), int(bu[1][5:])
        assert u_hi - u_lo <= 24, f"string range too wide: {bu}"
    assert dp.read_table(spark, root).count() == 1024


def test_zorder_null_values_cluster_first(spark, tmp_path):
    root = str(tmp_path / "zorder_null")
    rows = [(None, 1.0)] + [(float(i), float(i)) for i in range(50)]
    dp.create_table(
        spark.createDataFrame(rows, "a double, b double").coalesce(1), root
    )
    dp.optimize(spark, root, zorder_by=["a", "b"], target_files=2)
    assert dp.read_table(spark, root).count() == 51
    assert (
        dp.read_table(spark, root).filter("a IS NULL").count() == 1
    )  # NULL survived the rewrite


def test_optimize_where_partition_scoped(spark, tmp_path):
    """OPTIMIZE ... WHERE (r13): a partition predicate scopes the
    rewrite — matching partitions compact, fenced-off ones keep their
    files byte-identical; non-partition predicates refuse (Delta's
    contract), and so do conjuncts the extractor cannot decompose
    (silently widening a fenced scope is not sound)."""
    import pytest as _pytest

    from incubator_gluten_spark.sources.delta_protocol import (
        DeltaProtocolError,
    )

    root = str(tmp_path / "opt_where")
    df = spark.createDataFrame(
        [(i, float(i), ["a", "b", "c"][i % 3]) for i in range(90)],
        "k long, v double, grp string",
    ).repartition(4)
    dp.create_table(df, root, partition_cols=["grp"])
    before = {
        a["path"]: a for a in dp.resolve(spark, root).adds
    }
    out = dp.optimize(spark, root, where="grp = 'a'")
    assert out["partitions_compacted"] == 1
    after = {a["path"] for a in dp.resolve(spark, root).adds}
    untouched = {p for p in before if not p.startswith("grp=a")}
    assert untouched <= after  # b/c partitions byte-identical
    assert not any(p.startswith("grp=a/") and p in before for p in after)
    # IN list scopes two partitions at once
    out2 = dp.optimize(spark, root, where="grp IN ('b', 'c')")
    assert out2["partitions_compacted"] == 2
    # content unchanged through both scoped rewrites
    got = sorted(map(tuple, dp.read_table(spark, root).collect()))
    assert got == sorted(map(tuple, df.collect()))
    with _pytest.raises(DeltaProtocolError, match="partition columns only"):
        dp.optimize(spark, root, where="k > 5")
    with _pytest.raises(DeltaProtocolError, match="cannot decompose"):
        dp.optimize(spark, root, where="grp = 'a' OR grp = 'b'")
    # r13 advice: a type-mismatched literal (numeric compare on the
    # string partition column) raises a protocol error naming the
    # predicate, not a bare TypeError mid-scoping
    with _pytest.raises(DeltaProtocolError, match="type-.?match"):
        dp.optimize(spark, root, where="grp > 5")
