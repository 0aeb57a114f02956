"""Measure the two Iceberg MERGE modes' scale behavior (r11 — same
method as tools/merge_scaling.py did for Delta MERGE):

* **COW** (iceberg_format.merge): claim is O(matched files), not
  O(table) — r12: manifests carry per-column lower/upper_bounds, so
  touched-file DETECTION is metadata-only first (source key min/max vs
  file bounds) and the key scan reads ONLY the surviving candidates —
  `detection_candidate_files` printed below must stay FLAT (1) across
  100x table growth for the point merge: detection bytes are now
  O(candidates), not O(table key bytes).
* **MOR** (iceberg_v2.merge_mor): claim is O(source) at ANY table size
  — one equality-delete file + the source as new data files, existing
  data never read.  Wall time should be flat and table-size-blind.

Merging the same 64-row point source into tables of n = 200k / 2M /
20M rows (1x / 10x / 100x) shows both curves; files_rewritten is
printed for COW to separate detection cost from rewrite cost.

Usage: python3 tools/iceberg_merge_scaling.py [--sizes 200000,2000000,20000000]
Prints one JSON line per (n, mode); the measured table lives in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

ROWS_PER_FILE = 200_000


def make_df(spark, n: int):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
        .repartitionByRange(max(1, n // ROWS_PER_FILE), "k")
    )


def point_source(spark):
    # 64 keys inside one 200k range file (k in [1000, 1063])
    return spark.range(1000, 1064).select(
        F.col("id").alias("k"), F.lit(-1.0).alias("v")
    )


def run_cow(spark, n: int, base: str) -> dict:
    from incubator_gluten_spark.sources import iceberg_format as ice

    root = os.path.join(base, f"cow_{n}")
    shutil.rmtree(root, ignore_errors=True)
    ice.create_table(make_df(spark, n), root)
    t0 = time.perf_counter()
    out = ice.merge(spark, root, point_source(spark), ["k"])
    dt = time.perf_counter() - t0
    shutil.rmtree(root, ignore_errors=True)
    n_files = out["files_rewritten"] + out["files_skipped"]
    return {
        "mode": "cow",
        "n": n,
        "sec": round(dt, 2),
        "files_rewritten": out["files_rewritten"],
        "files_skipped": out["files_skipped"],
        "files_pruned_by_bounds": out["files_pruned_by_bounds"],
        "detection_candidate_files": n_files - out["files_pruned_by_bounds"],
    }


def run_mor(spark, n: int, base: str) -> dict:
    from incubator_gluten_spark.sources import iceberg_v2 as v2

    root = os.path.join(base, f"mor_{n}")
    shutil.rmtree(root, ignore_errors=True)
    v2.create_table(make_df(spark, n), root)
    t0 = time.perf_counter()
    v2.merge_mor(spark, root, point_source(spark), ["k"])
    dt = time.perf_counter() - t0
    shutil.rmtree(root, ignore_errors=True)
    return {"mode": "mor", "n": n, "sec": round(dt, 2)}


def main() -> int:
    sizes = [200_000, 2_000_000, 20_000_000]
    for a in sys.argv[1:]:
        if a.startswith("--sizes="):
            sizes = [int(x) for x in a.split("=", 1)[1].split(",")]
    from incubator_gluten_spark.session import get_session

    spark = get_session(app_name="iceberg-merge-scaling")
    base = f"/tmp/spark_graft_ice_merge_{os.getpid()}"
    run_cow(spark, sizes[0], base)  # warm-up, discarded
    for n in sizes:
        print(json.dumps(run_cow(spark, n, base)), flush=True)
    for n in sizes:
        print(json.dumps(run_mor(spark, n, base)), flush=True)
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
