"""Measure the r14 Delta deletion-vector scale fixes (r13 verdict
What's-wrong #1 + minors #2/#3):

1. **Cold-read DV decode** (`_dv_positions_spilled`): r13 decoded every
   DV sequentially ON THE DRIVER and wrote one scratch parquet — O(total
   deleted positions) driver wall per cold read.  r14 plans one task per
   DV descriptor and runs ``load_dv`` executor-side (mapInPandas), with
   the scratch written distributed.  Measured here at 1M / 10M / 100M
   total positions (1M-position DVs, the realistic per-file shape) —
   synthetic descriptors + real roaring .bin files, no data rows, so the
   number isolates exactly the decode+spill path.  The old driver-
   sequential shape is re-measured inline at 1M/10M for the ratio.

2. **DELETE ... via DVs end-to-end** (`delete_where_dv`): r13 collected
   every file's bitmap blob to the driver to frame ONE .bin (≈50 GB
   driver state at 500k files × 100 KB); r14 hash-shards the framing
   into per-task .bin files and collects only descriptor rows.  Measured
   wall + driver RSS growth at 2M / 8M matched positions.

Usage: python3 tools/dv_scaling.py            (1M/10M rows, fast)
       python3 tools/dv_scaling.py --big      (adds the 100M row)
Prints one JSON line per measurement; rows live in SCALE.md.
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import struct
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from incubator_gluten_spark.sources import delta_protocol as dp  # noqa: E402
from incubator_gluten_spark.sources.roaring import serialize_rba  # noqa: E402

SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
        ],
    }
)
_DV_PER_FILE = 1_000_000


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def _mk_dv_fixture(root: str, total_positions: int):
    """n/1M storageType='p' DV descriptors, each framed in its own real
    .bin file (positions = the even row indexes, a worst-ish roaring
    shape: array containers, no runs)."""
    os.makedirs(root, exist_ok=True)
    adds = []
    pos = np.arange(0, 2 * _DV_PER_FILE, 2, dtype=np.uint64)
    blob = serialize_rba(pos)
    framed = (
        b"\x01"
        + struct.pack(">i", len(blob))
        + blob
        + struct.pack(">I", zlib.crc32(blob))
    )
    for i in range(total_positions // _DV_PER_FILE):
        p = os.path.join(root, f"dv_{i:05d}.bin")
        with open(p, "wb") as f:
            f.write(framed)
        adds.append(
            {
                "path": f"part-{i:05d}.parquet",
                "partitionValues": {},
                "size": 1,
                "dataChange": True,
                "deletionVector": {
                    "storageType": "p",
                    "pathOrInlineDv": p,
                    "offset": 1,
                    "sizeInBytes": len(blob),
                    "cardinality": len(pos),
                },
            }
        )
    meta = {
        "id": "dv-scaling",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": SCHEMA_STRING,
        "partitionColumns": [],
        "configuration": {},
    }
    return dp.Snapshot(0, meta, adds)


def _old_driver_sequential(spark, root, snap) -> float:
    """The r13 shape, re-implemented for the ratio: one driver loop,
    one pyarrow writer."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(tempfile.mkdtemp(prefix="dvscale_old_"), "p.parquet")
    t0 = time.perf_counter()
    pa_schema = pa.schema(
        [pa.field("file_path", pa.string()), pa.field("pos", pa.int64())]
    )
    with pq.ParquetWriter(path, pa_schema) as w:
        for a in snap.adds:
            pos = dp.load_dv(root, a["deletionVector"])
            w.write_table(
                pa.table(
                    {
                        "file_path": pa.array(
                            [a["path"]] * len(pos), pa.string()
                        ),
                        "pos": pa.array(pos.astype("int64"), pa.int64()),
                    },
                    schema=pa_schema,
                )
            )
    n = (
        spark.read.schema("file_path string, pos bigint")
        .parquet(path)
        .count()
    )
    wall = time.perf_counter() - t0
    assert n == sum(a["deletionVector"]["cardinality"] for a in snap.adds)
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return wall


def main() -> int:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("dv-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = f"/tmp/spark_graft_dvscale_{os.getpid()}"
    sizes = [1_000_000, 10_000_000]
    if "--big" in sys.argv:
        sizes.append(100_000_000)
    # --- 1: cold-read decode+spill, executor-side vs old driver loop ---
    for n in sizes:
        root = os.path.join(base, f"dv{n}")
        snap = _mk_dv_fixture(root, n)
        dp._cleanup_dv_scratch()
        t0 = time.perf_counter()
        got = dp._dv_positions_spilled(spark, root, snap).count()
        wall = time.perf_counter() - t0
        assert got == n, (got, n)
        rec = {
            "measure": "dv_cold_decode",
            "positions": n,
            "dv_files": n // _DV_PER_FILE,
            "executor_side_s": round(wall, 2),
        }
        if n <= 10_000_000:
            rec["old_driver_sequential_s"] = round(
                _old_driver_sequential(spark, root, snap), 2
            )
        dp._cleanup_dv_scratch()
        print(json.dumps(rec), flush=True)
        shutil.rmtree(root, ignore_errors=True)
    # --- 2: DELETE via DVs end-to-end (distributed build + shard frame) ---
    for rows in (2_000_000, 8_000_000):
        root = os.path.join(base, f"del{rows}")
        df = spark.range(0, rows).selectExpr("id AS k", "id * 1.0 AS v")
        dp.create_table(df.repartition(16), root)
        rss0, t0 = _rss_mb(), time.perf_counter()
        out = dp.delete_where_dv(spark, root, "k % 2 = 0")
        wall = time.perf_counter() - t0
        import glob

        print(
            json.dumps(
                {
                    "measure": "delete_where_dv",
                    "rows": rows,
                    "deleted": out["rows_deleted"],
                    "wall_s": round(wall, 2),
                    "driver_rss_growth_mb": round(_rss_mb() - rss0, 1),
                    "dv_bin_files": len(
                        glob.glob(os.path.join(root, "deletion_vector_*.bin"))
                    ),
                }
            ),
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
