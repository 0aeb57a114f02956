"""Iceberg SORT ORDERS (spec "Sort Orders"): WRITE ORDERED BY as a
metadata-only default order that appends honor with a local sort, and
rewrite_sorted (rewrite_data_files, sort strategy) re-laying files
range-split so per-file bounds on the sort column are disjoint.

Reference analog: Iceberg's table sort orders + rewrite_data_files
sort strategy; gluten-iceberg scans the re-laid tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import iceberg_format as ice


def _mk(spark, n=4000, shuffled=True):
    df = spark.range(n).select(
        (F.abs(F.xxhash64("id")) % 100000).alias("k"),
        F.col("id").alias("seq"),
    )
    return df.repartition(4) if shuffled else df.coalesce(1)


def _file_bounds(spark, root, col):
    """(lower, upper) per live data file, from the parquet footers."""
    import pyarrow.parquet as pq

    out = []
    for f in ice.plan_files(root):
        meta = pq.read_metadata(
            ice._resolve_path(root, f["file_path"])
        )
        lo = hi = None
        for rg in range(meta.num_row_groups):
            for ci in range(meta.row_group(rg).num_columns):
                c = meta.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics:
                    st = c.statistics
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def test_sort_order_metadata_and_survival(spark, tmp_path):
    root = str(tmp_path / "sorted")
    ice.create_table(_mk(spark, 100), root)
    oid = ice.set_sort_order(root, ["k"])
    assert oid == 1
    meta = ice._current_metadata(root)
    assert meta["default-sort-order-id"] == 1
    assert meta["sort-orders"][0]["fields"][0]["transform"] == "identity"
    # sort order survives a snapshot commit (append)
    ice.append(_mk(spark, 100), root)
    meta = ice._current_metadata(root)
    assert meta["default-sort-order-id"] == 1
    assert ice._default_sort_cols(meta) == ["k"]
    with pytest.raises(ValueError, match="no such column"):
        ice.set_sort_order(root, ["zzz"])


def test_append_honors_order_locally(spark, tmp_path):
    root = str(tmp_path / "sorted_append")
    ice.create_table(_mk(spark, 10), root)
    ice.set_sort_order(root, ["k"])
    ice.append(_mk(spark, 4000).coalesce(1), root)
    # identify the appended file robustly: one of the files holds 4000
    files = ice.plan_files(root)
    big = [f for f in files if f["record_count"] == 4000]
    assert big
    rows = [
        r["k"]
        for r in spark.read.parquet(
            ice._resolve_path(root, big[0]["file_path"])
        ).collect()
    ]
    assert rows == sorted(rows)


def test_rewrite_sorted_makes_disjoint_file_ranges(spark, tmp_path):
    root = str(tmp_path / "sorted_rewrite")
    ice.create_table(_mk(spark, 2000), root)
    ice.append(_mk(spark, 2000), root)
    ice.set_sort_order(root, ["k"])
    n_before = ice.read_table(spark, root).count()
    out = ice.rewrite_sorted(spark, root, target_files=4)
    assert out["sort_columns"] == ["k"]
    bounds = sorted(b for b in _file_bounds(spark, root, "k") if b[0] is not None)
    assert len(bounds) >= 3
    for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
        assert hi1 <= lo2  # disjoint ranges: point queries hit ONE file
    t = ice.read_table(spark, root)
    assert t.count() == n_before  # lossless
    # time travel still sees the pre-rewrite layout
    assert ice.read_table(spark, root, snapshot_id=2).count() == n_before


def test_rewrite_sorted_requires_order(spark, tmp_path):
    root = str(tmp_path / "unsorted")
    ice.create_table(_mk(spark, 50), root)
    with pytest.raises(ValueError, match="no default sort order"):
        ice.rewrite_sorted(spark, root)
