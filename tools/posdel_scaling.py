"""Measure rewrite_position_delete_files' 'O(delete rows), data never
read' claim (same style as tools/wap_scaling.py): consolidation time
must track the DELETE-file row count, not the table size.

Method: for each table size, create an Iceberg v2 table, land a FIXED
number of position-delete rows as 8 separate delete files (the
many-small-files state a streaming deleter leaves), then time
``rewrite_position_deletes``.  If the time grows with table size, the
procedure is touching data files it must not; flat = metadata +
delete-row bound, affordable nightly at 100 TB.

Usage: python3 tools/posdel_scaling.py
Prints one JSON line per table size; the measured table lives in
SCALE.md.
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


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("posdel-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = f"/tmp/spark_graft_posdel_scaling_{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    for n_rows in (200_000, 2_000_000, 20_000_000):
        root = f"{base}/t_{n_rows}"
        df = spark.range(n_rows).select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
        v2.create_table(df.repartition(4), root)
        # fixed delete debt: 8 files x 1000 rows, spread over the keyspace
        step = n_rows // 8000
        for i in range(8):
            v2.position_delete(
                spark,
                root,
                f"k % {step if step > 1 else 2} = 0 AND "
                f"k >= {i * (n_rows // 8)} AND k < {i * (n_rows // 8) + 1000 * (step if step > 1 else 2)}",
            )
        scan = v2.plan_scan(root)
        debt = sum(f["record_count"] for f, _ in scan["pos_deletes"])
        t0 = time.perf_counter()
        out = v2.rewrite_position_deletes(spark, root)
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "rows": n_rows,
                    "delete_rows": debt,
                    "delete_files_before": out["delete_files_before"],
                    "rewrite_sec": round(dt, 3),
                }
            ),
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
