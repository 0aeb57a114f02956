"""Measure the Iceberg v2 merge-on-read READ path vs delete-file count
(r11 verdict What's-wrong #1): after k streaming-upsert micro-batches a
table carries k equality-delete files; the fixed read path applies them
as ONE left-anti join per equality-ids group, the pre-fix path chained
one join per FILE, so its Catalyst analysis/optimization time grew
superlinearly in k long before data size mattered.

Method: one base table, then k upsert micro-batches for k in (5, 20,
80); time ``read_table(...).collect()`` under the fixed path and under
an inline reconstruction of the pre-fix per-file chain (kept here, not
in the engine, purely for the pre/post comparison), and count LeftAnti
joins in each optimized plan.

Usage: python3 tools/mor_read_scaling.py
Prints one JSON line per k; the measured table lives in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from incubator_gluten_spark.sources import iceberg_v2 as v2  # noqa: E402


def _legacy_read(spark, root):
    """The pre-r12 read shape: one broadcast left-anti join per
    equality-delete FILE (iceberg_v2.py:311-317 as of r11), rebuilt
    here only so the scaling table has a 'pre' column."""
    meta = v2._current_metadata(root)
    ddl = v2.spark_ddl_for(meta["schema"])
    scan = v2.plan_scan(root)
    df = spark.read.schema(ddl).parquet(
        *[v2._resolve_path(root, f["file_path"]) for f, _ in scan["data"]]
    )
    cols = df.columns
    seq_map = v2._seq_map_df(spark, scan["data"])
    df = df.select(
        "*",
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias(
            "__base"
        ),
        F.col("_metadata.row_index").alias("__pos"),
    ).join(F.broadcast(seq_map), "__base")
    by_ids = {f["id"]: f["name"] for f in meta["schema"]["fields"]}
    for f, seq, eq_ids in scan["eq_deletes"]:
        eq_cols = [by_ids[i] for i in eq_ids]
        dels = spark.read.parquet(v2._resolve_path(root, f["file_path"]))
        cond = F.lit(seq) > df["__dataseq"]
        for c in eq_cols:
            cond = cond & df[c].eqNullSafe(dels[c])
        df = df.join(F.broadcast(dels), cond, "left_anti")
    return df.select(*cols)


def _time_read(build):
    t0 = time.perf_counter()
    df = build()
    n = df.count()
    wall = time.perf_counter() - t0
    antis = df._jdf.queryExecution().optimizedPlan().toString().count(
        "LeftAnti"
    )
    return wall, antis, n


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("mor-read-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = f"/tmp/spark_graft_mor_read_scaling_{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    n_rows = 500_000
    for k in (5, 20, 80):
        root = f"{base}/t_{k}"
        df = spark.range(n_rows).select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
        v2.create_table(df.repartition(4), root)
        for b in range(k):
            src = spark.range(b * 100, b * 100 + 100).select(
                F.col("id").alias("k"), F.lit(float(b)).alias("v")
            )
            v2.merge_mor_stream_batch(spark, src, root, "scale", b, ["k"])
        assert len(v2.plan_scan(root)["eq_deletes"]) == k
        fixed_s, fixed_antis, n1 = _time_read(
            lambda: v2.read_table(spark, root)
        )
        legacy_s, legacy_antis, n2 = _time_read(
            lambda: _legacy_read(spark, root)
        )
        assert n1 == n2, (n1, n2)
        print(
            json.dumps(
                {
                    "eq_delete_files": k,
                    "fixed_read_sec": round(fixed_s, 2),
                    "fixed_anti_joins": fixed_antis,
                    "legacy_read_sec": round(legacy_s, 2),
                    "legacy_anti_joins": legacy_antis,
                    "rows": n1,
                }
            )
        )
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
