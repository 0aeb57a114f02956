"""Measure Delta reader data skipping (r12): a point/window predicate
read must open O(matching files) and its wall time must stay FLAT as
the table grows — the log's per-file stats prune everything else
before a footer is touched.

Method: k-clustered tables of n = 200k / 2M / 20M rows in fixed
200k-row range files; the same 1000-key window read with and without
source_predicates; report wall time and files actually opened
(df.inputFiles()).

Usage: python3 tools/delta_skipping_scaling.py
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

from incubator_gluten_spark.sources import delta_protocol as dp  # noqa: E402

ROWS_PER_FILE = 200_000


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("delta-skipping-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = f"/tmp/spark_graft_skip_scaling_{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    for n in (200_000, 2_000_000, 20_000_000):
        root = f"{base}/t_{n}"
        df = spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
        ).repartitionByRange(max(1, n // ROWS_PER_FILE), "k")
        dp.create_table(df, root)
        n_files = len(dp.resolve(spark, root).adds)
        preds = [("k", ">=", 1000), ("k", "<", 2000)]
        t0 = time.perf_counter()
        t = dp.read_table(spark, root, source_predicates=preds)
        got = t.count()
        skip_s = time.perf_counter() - t0
        opened = len(t.inputFiles())
        t1 = time.perf_counter()
        full = dp.read_table(spark, root).filter(
            "k >= 1000 AND k < 2000"
        ).count()
        full_s = time.perf_counter() - t1
        assert got == full == 1000, (got, full)
        print(
            json.dumps(
                {
                    "rows": n,
                    "files": n_files,
                    "files_opened": opened,
                    "skip_read_sec": round(skip_s, 2),
                    "full_scan_filter_sec": round(full_s, 2),
                }
            )
        )
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
