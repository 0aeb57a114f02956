"""Iceberg write distribution pins (r14 verdict #7 + r14 ADVICE medium).

Two properties of the hash-distributed partitioned write path
(iceberg_format._write_data_files):

* WRITE ORDERED BY survives the r14 hash repartition on PARTITIONED
  tables — the local sort is re-applied after the shuffle with the
  partition columns prefixed (Iceberg's distribute-then-sort), so rows
  inside every data file stay ordered and footer min/max bounds stay
  narrow.  (The r14 code sorted before the shuffle, which destroyed it;
  the pre-r15 tests only covered unpartitioned tables where the
  repartition never fires.)
* The opt-in skew valve (spark.graft.iceberg.write.skewGuard=estimate)
  splits a partition VALUE whose row count exceeds 4x the mean across
  deterministic salt buckets: a forced-skew fixture must land in >1
  file for the hot value with guard on (vs exactly 1 with the default
  hash distribution) and stay logically identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_gluten_spark.sources import iceberg_format as ice


def _file_rows(spark, root, f):
    return spark.read.parquet(
        ice._resolve_path(root, f["file_path"])
    )


def test_partitioned_append_keeps_sort_order_per_file(spark, tmp_path):
    root = str(tmp_path / "part_sorted")
    base = spark.range(8).select(
        (F.col("id") % 2).cast("string").alias("p"),
        (F.abs(F.xxhash64("id")) % 1000).alias("k"),
        F.col("id").alias("seq"),
    )
    ice.create_table(base, root, partition_cols=["p"])
    ice.set_sort_order(root, ["k"])
    batch = spark.range(4000).select(
        (F.col("id") % 3).cast("string").alias("p"),
        (F.abs(F.xxhash64("id", F.lit(7))) % 100000).alias("k"),
        (F.col("id") + 100).alias("seq"),  # disjoint from the base's 0..7
    ).repartition(4)
    n_before = len(ice.plan_files(root))
    ice.append(batch, root)
    appended = ice.plan_files(root)
    assert len(appended) > n_before
    # every APPENDED file (snapshot 2) holds rows locally sorted by k
    checked = 0
    for f in appended:
        rows = _file_rows(spark, root, f).select("k", "seq").collect()
        if {r["seq"] for r in rows} <= set(range(8)):
            continue  # a create-time file (no sort order existed yet)
        ks = [r["k"] for r in rows]
        assert ks == sorted(ks), f["file_path"]
        checked += 1
    assert checked >= 3  # the three p-values of the appended batch
    # lossless
    got = ice.read_table(spark, root).filter(F.col("seq") >= 100).count()
    assert got == 4000


def test_rewrite_sorted_partitioned_keeps_per_file_order(spark, tmp_path):
    root = str(tmp_path / "part_rewrite")
    df = spark.range(3000).select(
        (F.col("id") % 2).cast("string").alias("p"),
        (F.abs(F.xxhash64("id")) % 100000).alias("k"),
        F.col("id").alias("seq"),
    ).repartition(4)
    ice.create_table(df, root, partition_cols=["p"])
    ice.set_sort_order(root, ["k"])
    n = ice.read_table(spark, root).count()
    out = ice.rewrite_sorted(spark, root, target_files=4)
    assert out["sort_columns"] == ["k"]
    for f in ice.plan_files(root):
        ks = [r["k"] for r in _file_rows(spark, root, f).collect()]
        assert ks == sorted(ks), f["file_path"]
    assert ice.read_table(spark, root).count() == n


def _skew_df(spark):
    # hot value 'hot': 20000 rows; ten cold values: 500 rows each
    # mean = 24500/11 ~ 2227; hot > 4x mean -> ceil(20000/2227) = 9 buckets
    hot = spark.range(20000).select(
        F.lit("hot").alias("p"), F.col("id").alias("v")
    )
    cold = spark.range(5000).select(
        F.concat(F.lit("c"), (F.col("id") % 10).cast("string")).alias("p"),
        (F.col("id") + 100000).alias("v"),
    )
    return hot.unionByName(cold)


def test_skew_guard_splits_hot_partition(spark, tmp_path):
    root_off = str(tmp_path / "skew_off")
    root_on = str(tmp_path / "skew_on")
    df = _skew_df(spark)

    def files_per_value(root):
        per: dict[str, int] = {}
        for f in ice.plan_files(root):
            pv = (f.get("partition") or {}).get("p")
            per[pv] = per.get(pv, 0) + 1
        return per

    ice.create_table(df, root_off, partition_cols=["p"])
    off = files_per_value(root_off)
    assert off["hot"] == 1  # default hash mode: one task, one giant file

    spark.conf.set("spark.graft.iceberg.write.skewGuard", "estimate")
    try:
        ice.create_table(df, root_on, partition_cols=["p"])
    finally:
        spark.conf.unset("spark.graft.iceberg.write.skewGuard")
    on = files_per_value(root_on)
    assert on["hot"] > 1  # the hot value split across salt buckets
    # balanced: no single hot file holds everything
    hot_counts = [
        f["record_count"]
        for f in ice.plan_files(root_on)
        if (f.get("partition") or {}).get("p") == "hot"
    ]
    assert max(hot_counts) < 20000
    assert sum(hot_counts) == 20000
    # logically identical to the unguarded table
    a = ice.read_table(spark, root_on).groupBy("p").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    b = ice.read_table(spark, root_off).groupBy("p").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
