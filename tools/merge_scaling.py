"""Measure the Delta MERGE "O(matched files), not O(table)" claim
(round-9 verdict directive #8 — convert the argument to a measurement,
the way tools/lsh_scaling.py converted the LSH sizing law).

The claim under test (delta_protocol.merge docstring): per-file stats
skipping keeps a POINT-ish MERGE's cost proportional to the files whose
key range intersects the source, independent of table size.  If true,
merging the same 64-row source into tables of n = 200k / 2M / 20M rows
(1× / 10× / 100× — brackets the sf0.1 → sf1 extrapolation) rewrites the
same ONE file each time and wall time stays ~flat while the table grows
100×; a table-spanning merge at the same sizes shows the O(table)
contrast.

Table layout: k = 0..n-1 split into fixed 200k-row range files
(repartitionByRange), so file count grows linearly with n and per-file
stats are disjoint — the shape a clustered 100 TB table has.

Usage: python3 tools/merge_scaling.py [--sizes 200000,2000000,20000000]
Prints one JSON line per (n, mode); the measured table is recorded in
SCALE.md.
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


def build_table(spark, root: str, n: int) -> int:
    from incubator_gluten_spark.sources import delta_protocol as dp

    shutil.rmtree(root, ignore_errors=True)
    nfiles = max(1, n // ROWS_PER_FILE)
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("double").alias("price"),
            (F.col("id") % 5).cast("string").alias("grp"),
        )
        .repartitionByRange(nfiles, "k")
    )
    dp.create_table(df, root)
    return nfiles


def run(spark, n: int, base: str) -> list[dict]:
    from incubator_gluten_spark.sources import delta_protocol as dp

    out = []
    root = os.path.join(base, f"merge_scale_{n}")
    nfiles = build_table(spark, root, n)

    # POINT merge: 64 keys inside ONE file's range
    src_point = spark.range(1_000, 1_064).select(
        F.col("id").alias("k"),
        F.lit(-1.0).alias("price"),
        F.lit("z").alias("grp"),
    )
    t0 = time.perf_counter()
    r = dp.merge(spark, root, src_point, "k")
    dt_point = time.perf_counter() - t0
    out.append(
        {
            "mode": "point",
            "n": n,
            "n_files": nfiles,
            "files_rewritten": r["files_rewritten"],
            "files_skipped": r["files_skipped"],
            "sec": round(dt_point, 2),
        }
    )

    # SPANNING merge: 64 keys spread across the whole key range — every
    # file intersects, the O(table) contrast case
    src_span = (
        spark.range(64)
        .select(
            (F.col("id") * (n // 64) + 7).alias("k"),
            F.lit(-2.0).alias("price"),
            F.lit("z").alias("grp"),
        )
    )
    t0 = time.perf_counter()
    r = dp.merge(spark, root, src_span, "k")
    dt_span = time.perf_counter() - t0
    out.append(
        {
            "mode": "span",
            "n": n,
            "n_files": nfiles,
            "files_rewritten": r["files_rewritten"],
            "files_skipped": r["files_skipped"],
            "sec": round(dt_span, 2),
        }
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> int:
    sizes = [200_000, 2_000_000, 20_000_000]
    for a in sys.argv[1:]:
        if a.startswith("--sizes"):
            sizes = [int(s) for s in a.split("=", 1)[1].split(",")]
    from incubator_gluten_spark.session import get_session

    spark = get_session(app_name="merge-scaling")
    base = f"/tmp/spark_graft_merge_scale_{os.getpid()}"
    for n in sizes:
        for rec in run(spark, n, base):
            print(json.dumps(rec), flush=True)
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
