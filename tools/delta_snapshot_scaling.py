"""Measure Delta driver-side snapshot state vs file count (r12 verdict
directive #8): ``resolve()`` replays the log / checkpoint and holds
every live add-action on the driver — O(n_files) metadata, the same
class as Delta OSS's driver snapshot.  This tool puts a NUMBER on that
honest-ledger note: synthesized logs with 1k / 10k / 100k add actions
(stats included, the realistic shape), measured resolve() wall time
and driver RSS growth, from the raw JSON log and — at 100k — from a
checkpoint parquet.

No data files are written: resolve() touches only the log, so the
measurement isolates exactly the driver-metadata cost.

Usage: python3 tools/delta_snapshot_scaling.py
Prints one JSON line per size; the measured row lives in SCALE.md.
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from incubator_gluten_spark.sources import delta_protocol as dp  # noqa: E402

SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
        ],
    }
)


def _mk_log(root: str, n_files: int) -> None:
    os.makedirs(os.path.join(root, "_delta_log"), exist_ok=True)
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            + "\n"
        )
        f.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "measure-snapshot-scaling-0000",
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": SCHEMA_STRING,
                        "partitionColumns": [],
                        "configuration": {},
                        "createdTime": 1700000000000,
                    }
                }
            )
            + "\n"
        )
        for i in range(n_files):
            stats = {
                "numRecords": 10_000,
                "minValues": {"k": i * 10_000, "v": 0.0},
                "maxValues": {"k": (i + 1) * 10_000 - 1, "v": 996.0},
                "nullCount": {"k": 0, "v": 0},
            }
            f.write(
                json.dumps(
                    {
                        "add": {
                            "path": f"part-{i:08d}-0123456789abcdef.parquet",
                            "partitionValues": {},
                            "size": 4_000_000,
                            "modificationTime": 1700000000000,
                            "dataChange": True,
                            "stats": json.dumps(stats),
                        }
                    }
                )
                + "\n"
            )


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def _mk_checkpoint_direct(root: str, n_files: int) -> None:
    """Official-schema checkpoint parquet written straight through
    pyarrow in 100k-row batches — dp.checkpoint() builds its rows as
    Python tuples on the driver, which is FIXTURE cost here (the tool
    measures snapshot READ reconstruction, and 1.5M tuples through
    py4j serialization takes tens of minutes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    proto_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    schema = pa.schema(
        [("add", add_t), ("metaData", meta_t), ("protocol", proto_t)]
    )
    path = os.path.join(
        root, "_delta_log", f"{0:020d}.checkpoint.parquet"
    )
    with pq.ParquetWriter(path, schema) as w:
        head = pa.table(
            {
                "add": pa.array([None, None], add_t),
                "metaData": pa.array(
                    [
                        None,
                        {
                            "id": "measure-snapshot-scaling-0000",
                            "format": {"provider": "parquet"},
                            "schemaString": SCHEMA_STRING,
                            "partitionColumns": [],
                            "configuration": [],
                            "createdTime": 1700000000000,
                        },
                    ],
                    meta_t,
                ),
                "protocol": pa.array(
                    [{"minReaderVersion": 1, "minWriterVersion": 2}, None],
                    proto_t,
                ),
            },
            schema=schema,
        )
        w.write_table(head)
        batch = 100_000
        for lo in range(0, n_files, batch):
            hi = min(lo + batch, n_files)
            adds = [
                {
                    "path": f"part-{i:08d}-0123456789abcdef.parquet",
                    "partitionValues": [],
                    "size": 4_000_000,
                    "modificationTime": 1700000000000,
                    "dataChange": True,
                    "stats": json.dumps(
                        {
                            "numRecords": 10_000,
                            "minValues": {"k": i * 10_000, "v": 0.0},
                            "maxValues": {
                                "k": (i + 1) * 10_000 - 1,
                                "v": 996.0,
                            },
                            "nullCount": {"k": 0, "v": 0},
                        }
                    ),
                }
                for i in range(lo, hi)
            ]
            w.write_table(
                pa.table(
                    {
                        "add": pa.array(adds, add_t),
                        "metaData": pa.array([None] * len(adds), meta_t),
                        "protocol": pa.array([None] * len(adds), proto_t),
                    },
                    schema=schema,
                )
            )
    with open(os.path.join(root, "_delta_log", "_last_checkpoint"), "w") as f:
        json.dump({"version": 0, "size": n_files + 2}, f)


def main() -> int:
    from incubator_gluten_spark.session import get_session

    # the PRODUCT session posture (maxResultSize 4g etc.) — a bare
    # default session caps driver results at 1g, which the full
    # (unpruned) past-envelope metadata collect legitimately exceeds
    spark = get_session(
        app_name="delta-snapshot-scaling",
        master="local[8]",
        shuffle_partitions=8,
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = f"/tmp/spark_graft_snapscale_{os.getpid()}"
    sizes = [1_000, 10_000, 100_000]
    if "--big" in sys.argv:
        # r14: the past-envelope row — resolve() refuses at this size
        # (driver envelope) while resolve_pruned stays usable
        sizes.append(2_500_000)
    for n in sizes:
        root = os.path.join(base, f"t{n}")
        shutil.rmtree(root, ignore_errors=True)
        big = n > dp._SNAPSHOT_DRIVER_MAX_FILES
        _mk_log(root, 0 if big else n)
        rec = {"files": n}
        if not big:
            rss0 = _rss_mb()
            t0 = time.perf_counter()
            snap = dp.resolve(spark, root)
            rec["resolve_s"] = round(time.perf_counter() - t0, 3)
            rec["rss_growth_mb"] = round(_rss_mb() - rss0, 1)
            rec["adds"] = len(snap.adds)
        if n >= 100_000:
            if big:
                # fixture checkpoint written straight through pyarrow —
                # dp.checkpoint()'s driver row-building is fixture cost,
                # not the measured read path
                _mk_checkpoint_direct(root, n)
            else:
                dp.checkpoint(spark, root)
            if n <= dp._SNAPSHOT_DRIVER_MAX_FILES:
                t0 = time.perf_counter()
                dp.resolve(spark, root)
                rec["resolve_from_checkpoint_s"] = round(
                    time.perf_counter() - t0, 3
                )
            else:
                try:
                    dp.resolve(spark, root)
                    rec["envelope_refusal"] = "MISSING (BUG)"
                except dp.DeltaProtocolError:
                    rec["envelope_refusal"] = "ok"
            # r14: distributed reconstruction — only the pruned file
            # list reaches the driver (predicate keeps ~1% of files)
            rss0 = _rss_mb()
            t0 = time.perf_counter()
            snap = dp.resolve_pruned(spark, root)
            rec["resolve_pruned_full_s"] = round(time.perf_counter() - t0, 3)
            rec["resolve_pruned_full_rss_mb"] = round(_rss_mb() - rss0, 1)
            preds = [("k", "<", n * 100)]  # ~1% of files
            rss0 = _rss_mb()
            t0 = time.perf_counter()
            snap = dp.resolve_pruned(spark, root, preds)
            rec["resolve_pruned_1pct_s"] = round(time.perf_counter() - t0, 3)
            rec["resolve_pruned_1pct_rss_mb"] = round(_rss_mb() - rss0, 1)
            rec["pruned_adds"] = len(snap.adds)
        print(json.dumps(rec), flush=True)
        shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
