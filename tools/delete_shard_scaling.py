"""Measure DELETE WHERE wall time vs delete-file sharding (r12 verdict
minor #3): the pre-r13 writer funneled every match set through
coalesce(1) — one task serializes the whole sort+write; the r13 path
range-shards past ``shard_rows`` so the sort+write parallelizes and no
single delete file grows unbounded.

Method: one v2 table (4M rows, 8 data files), DELETE WHERE matching
half of it, run once forced single-file (shard_rows > n) and once
sharded (shard_rows = 500k -> 4 shards); verify both leave the same
live rows.  The field-id stamp is a per-shard driver-side pyarrow pass
(documented bound in _write_delete_parquets) — included in the wall
time, so the sharded win understates the distributed-write win a real
cluster sees.

Usage: python3 tools/delete_shard_scaling.py
Prints one JSON line per mode; the measured row lives in SCALE.md.
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

N_ROWS = 4_000_000


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("delete-shard-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base_dir = f"/tmp/spark_graft_delshard_{os.getpid()}"
    df = spark.range(0, N_ROWS).select(
        F.col("id").alias("k"), (F.col("id") % 997.0).alias("v")
    )
    for mode, shard_rows in (("single", N_ROWS + 1), ("sharded", 500_000)):
        root = os.path.join(base_dir, mode)
        shutil.rmtree(root, ignore_errors=True)
        v2.create_table(df.repartition(8), root)
        t0 = time.perf_counter()
        out = v2.position_delete(spark, root, "k % 2 = 0", shard_rows=shard_rows)
        wall = time.perf_counter() - t0
        survivors = v2.read_table(spark, root).count()
        assert survivors == N_ROWS - out["positions_deleted"], (
            survivors,
            out,
        )
        print(
            json.dumps(
                {
                    "mode": mode,
                    "delete_files": out["delete_files"],
                    "positions_deleted": out["positions_deleted"],
                    "wall_s": round(wall, 2),
                    "read_back_rows": survivors,
                }
            ),
            flush=True,
        )
    shutil.rmtree(base_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
