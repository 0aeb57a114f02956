"""Measure the r11 'metadata-sized publish' claims: WAP
cherrypick_snapshot (fast-forward AND replay), rollback_to_snapshot,
and fast_forward must stay FLAT as the table grows — they move
current-snapshot-id or re-commit a manifest list, never data bytes.
Same style as tools/merge_scaling.py (point-merge flat across 100x).

Method: build an Iceberg table at several sizes (one base create +
appends so the manifest list has a few entries), then time

* ``stage``        — the WAP append of a FIXED 64-row batch (context:
                     O(batch), not O(table))
* ``publish_ff``   — cherrypick when parent == current (fast-forward:
                     one metadata-only version)
* ``publish_replay`` — cherrypick after main moved (replay: one new
                     manifest-list write = O(manifest count), zero
                     data reads)
* ``rollback``     — rollback_to_snapshot to the pre-publish head

If any of these grows with table size, the publish path is reading
data it must not.  Usage: python3 tools/wap_scaling.py
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

from incubator_gluten_spark.sources import iceberg_format as ice  # noqa: E402


def make_df(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
        F.concat(F.lit("txt-"), (F.col("id") % 99991).cast("string")).alias(
            "s"
        ),
    )


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("wap-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = f"/tmp/spark_graft_wap_scaling_{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    for n_rows in (200_000, 2_000_000, 20_000_000):
        root = f"{base}/t_{n_rows}"
        third = n_rows // 3
        ice.create_table(make_df(spark, 0, third).repartition(4), root)
        ice.append(make_df(spark, third, 2 * third).repartition(4), root)
        ice.append(make_df(spark, 2 * third, n_rows).repartition(4), root)

        t0 = time.perf_counter()
        staged = ice.append(
            make_df(spark, 10**9, 10**9 + 64).coalesce(1), root, wap_id="w1"
        )
        t_stage = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = ice.cherrypick_snapshot(root, wap_id="w1")
        t_ff = time.perf_counter() - t0
        assert out["mode"] == "fast-forward", out

        staged2 = ice.append(
            make_df(spark, 2 * 10**9, 2 * 10**9 + 64).coalesce(1),
            root,
            wap_id="w2",
        )
        ice.append(
            make_df(spark, 3 * 10**9, 3 * 10**9 + 64).coalesce(1), root
        )
        pre = ice._current_metadata(root)["current-snapshot-id"]
        t0 = time.perf_counter()
        out2 = ice.cherrypick_snapshot(
            root, snapshot_id=staged2["snapshot-id"]
        )
        t_replay = time.perf_counter() - t0
        assert out2["mode"] == "replay", out2

        t0 = time.perf_counter()
        ice.rollback_to_snapshot(root, pre)
        t_rb = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "rows": n_rows,
                    "stage_sec": round(t_stage, 4),
                    "publish_ff_sec": round(t_ff, 4),
                    "publish_replay_sec": round(t_replay, 4),
                    "rollback_sec": round(t_rb, 4),
                }
            ),
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
