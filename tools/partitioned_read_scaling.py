"""Measure partitioned snapshot-read planning vs partition-tuple count
(r12 verdict What's-wrong #1): the pre-r13 scan built one parquet-read
subtree per distinct partition tuple and chained unionByName, so
Catalyst analysis/optimization time grew superlinearly in tuple count —
in the hottest path of all (every partitioned Delta/Iceberg read, every
COW rewrite, every MERGE).  The fixed path is ONE multi-path FileScan
plus one broadcast map join, O(1) plan width in tuples.

Method: one 20k-row dataset written as a Delta table partitioned k ways
(ONE data file per tuple, so file count == tuple count) for k in
(10, 100, 1000); time plan construction + execution of
``read_table(...).count()`` under the fixed path and under an inline
reconstruction of the pre-fix per-tuple chain (kept HERE, not in the
engine, purely for the pre/post column; legacy capped at k<=100 — at
k=1000 the chain takes minutes to even analyze, which is the point).
``scan_only_plan_s`` is the floor ANY reader pays for the same file
set (Spark's multi-path InMemoryFileIndex listing — a distributed job
past spark.sql.sources.parallelPartitionDiscovery.threshold=32, which
is overhead-dominated on local[8] but the right trade on a 1000-
executor cluster listing S3); the fixed path's cost over that floor is
the plan-width cost, and it is what must stay flat.

Usage: python3 tools/partitioned_read_scaling.py
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

from incubator_gluten_spark.sources import delta_protocol as dp  # noqa: E402


def _legacy_read(spark, root):
    """The pre-r13 shape: one scan + literal projection per partition
    tuple, chained unionByName (delta_protocol.py:649-733 as of r12)."""
    from pyspark.sql.types import StructType

    snap = dp.resolve(spark, root)
    schema = snap.schema
    ptypes = {f.name: f.dataType.simpleString() for f in schema.fields}
    groups: dict[tuple, list[str]] = {}
    for add in snap.adds:
        key = tuple(sorted((add.get("partitionValues") or {}).items()))
        groups.setdefault(key, []).append(add["path"])
    pset = set(snap.partition_columns)
    read_schema = StructType([f for f in schema.fields if f.name not in pset])
    parts = []
    for key, rels in sorted(groups.items()):
        df = spark.read.schema(read_schema).parquet(
            *[os.path.join(root, r) for r in rels]
        )
        sel = []
        for f in schema.fields:
            inj = dict(key)
            if f.name in inj:
                sel.append(F.lit(inj[f.name]).cast(ptypes[f.name]).alias(f.name))
            else:
                sel.append(F.col(f.name))
        parts.append(df.select(*sel))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _time(build):
    t0 = time.perf_counter()
    df = build()
    df._jdf.queryExecution().executedPlan()  # force analysis+planning
    t_plan = time.perf_counter() - t0
    n = df.count()
    t_total = time.perf_counter() - t0
    return round(t_plan, 3), round(t_total, 3), n


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("partitioned-read-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base_dir = f"/tmp/spark_graft_part_scaling_{os.getpid()}"
    rows = spark.range(0, 20_000).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("v")
    )
    for k in (10, 100, 1000):
        root = os.path.join(base_dir, f"t{k}")
        shutil.rmtree(root, ignore_errors=True)
        dp.create_table(
            rows.withColumn("pk", F.col("k") % k).repartition("pk"),
            root,
            partition_cols=["pk"],
        )
        snap = dp.resolve(spark, root)
        paths = [os.path.join(root, a["path"]) for a in snap.adds]
        pset = set(snap.partition_columns)
        from pyspark.sql.types import StructType

        read_schema = StructType(
            [f for f in snap.schema.fields if f.name not in pset]
        )
        plan_floor, _, _ = _time(
            lambda: spark.read.schema(read_schema).parquet(*paths)
        )
        plan_fix, total_fix, n_fix = _time(lambda: dp.read_table(spark, root))
        rec = {
            "tuples": k,
            "files": len(paths),
            "scan_only_plan_s": plan_floor,
            "fixed_plan_s": plan_fix,
            "fixed_total_s": total_fix,
            "rows": n_fix,
        }
        if k <= 100:
            plan_old, total_old, n_old = _time(lambda: _legacy_read(spark, root))
            assert n_old == n_fix
            rec["legacy_plan_s"] = plan_old
            rec["legacy_total_s"] = total_old
        print(json.dumps(rec), flush=True)
    shutil.rmtree(base_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
