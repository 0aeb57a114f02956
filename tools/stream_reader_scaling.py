"""Measure the r10 partition-planned stream reader against the
driver-side simple reader (round-9 verdict directive #4 follow-through:
convert the 'executor-side decode scales, driver-side doesn't' argument
into a measurement, like tools/merge_scaling.py did for MERGE).

Method: one Delta table, N_ROWS rows split into N_FILES range files;
ONE availableNow micro-batch covering the whole backlog is driven
through the engine twice —

* ``graft_delta``            — _DeltaPartitionedStreamReader: per-file
  InputPartitions, parquet decode + Arrow transfer in EXECUTOR workers;
* ``graft_delta_simpleonly`` — a tool-local DataSource subclass whose
  ``streamReader`` raises NotImplementedError, forcing the engine onto
  the SimpleDataSourceStreamReader path: the whole batch decodes in the
  driver-side data-source worker and crosses as pickled rows.

Both sinks are foreachBatch -> noop write (full decode, no driver
collect), so the measured delta is the read path itself.

Usage: python3 tools/stream_reader_scaling.py [--rows 2000000 --files 16]
Prints one JSON line per mode; the measured table lives in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_table(spark, root: str, n_rows: int, n_files: int) -> None:
    from incubator_gluten_spark.sources import delta_protocol as dp

    shutil.rmtree(root, ignore_errors=True)
    df = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
            (F.col("id") % 7).cast("string").alias("grp"),
        )
        .repartitionByRange(n_files, "k")
    )
    dp.create_table(df, root)


def run_one(spark, fmt: str, root: str, ckpt_base: str) -> dict:
    seen = {"rows": 0, "parts": 0}

    def sink(df, _bid):
        seen["parts"] = df.rdd.getNumPartitions()
        df.write.format("noop").mode("overwrite").save()
        seen["rows"] = df.count()

    t0 = time.perf_counter()
    q = (
        spark.readStream.format(fmt)
        .option("path", root)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{ckpt_base}/{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.perf_counter() - t0
    return {
        "mode": fmt,
        "sec": round(dt, 2),
        "rows": seen["rows"],
        "batch_partitions": seen["parts"],
        "rows_per_sec": int(seen["rows"] / dt) if dt else None,
    }


def main() -> int:
    n_rows, n_files = 2_000_000, 16
    for a in sys.argv[1:]:
        if a.startswith("--rows="):
            n_rows = int(a.split("=", 1)[1])
        elif a.startswith("--files="):
            n_files = int(a.split("=", 1)[1])
    from incubator_gluten_spark.session import get_session
    from incubator_gluten_spark.sources.delta_stream import (
        DeltaStreamDataSource,
    )

    class DeltaSimpleOnlyDataSource(DeltaStreamDataSource):
        """Tool-local: same source, engine forced onto the simple
        (driver-side) reader path."""

        @classmethod
        def name(cls) -> str:
            return "graft_delta_simpleonly"

        def streamReader(self, schema):  # noqa: ARG002
            # the engine's fallback catches PySparkNotImplementedError
            # specifically (pyspark datasource_internal._streamReader)
            from pyspark.errors import PySparkNotImplementedError

            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "streamReader"},
            )

    spark = get_session(app_name="stream-reader-scaling")
    spark.dataSource.register(DeltaStreamDataSource)
    spark.dataSource.register(DeltaSimpleOnlyDataSource)
    base = f"/tmp/spark_graft_stream_scale_{os.getpid()}"
    root = os.path.join(base, "table")
    build_table(spark, root, n_rows, n_files)
    for fmt in ("graft_delta", "graft_delta_simpleonly"):
        # decode both twice; min-of-two strips JVM/py-worker warm-up
        best = None
        for _ in range(2):
            rec = run_one(spark, fmt, root, os.path.join(base, "ckpt"))
            best = rec if best is None or rec["sec"] < best["sec"] else best
        print(json.dumps(best), flush=True)
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
