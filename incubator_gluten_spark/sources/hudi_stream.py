"""Hudi COW table as a STRUCTURED STREAMING SOURCE (Spark 4 Python
DataSource ``SimpleDataSourceStreamReader``).

``spark.readStream.format("graft_hudi").option("path", root)`` tails the
timeline: offsets are COMPLETED COMMIT INSTANTS (engine-checkpointed
dicts; deterministic ``readBetweenOffsets`` replay = exactly-once), each
micro-batch is the RECORD-LEVEL incremental pull of ``(start, end]`` —
``hoodie.datasource.query.type=incremental`` semantics, the contract
Hudi's own DeltaStreamer chains on:

* inserts stream through once, at their commit instant;
* an UPSERT delivers exactly the records it changed (at their new
  values) — untouched records of a rewritten file group are NOT
  re-delivered, because the writer preserves their original
  ``_hoodie_commit_time`` through COW rewrites (the property
  ``read_incremental`` already pins); no ``ignoreChanges`` option is
  needed, unlike the Delta twin, because Hudi's change tracking is
  per-record, not per-file;
* record DELETES are invisible to a COW incremental pull (the rewritten
  file group simply lacks the record; real Hudi needs the CDC feature
  for delete capture) — documented parity with hudi's own source;
* MERGE_ON_READ tables refuse (``snapshot_files`` raises — log-block
  merge belongs to sources/hudi_mor.py).

Base-file pruning is by NAME alone: a COW base file written at instant
``i`` holds only commit times <= ``i``, so files named <= start are
skipped without opening them — an incremental micro-batch off a 100 TB
table reads the recently-written file groups, not the table.  The
reader runs in the driver-side Python data-source worker (no
SparkSession): pyarrow + pure-Python timeline walk, the documented
demo-grade connector transfer path; the OFFSET/replay contract is the
100 TB-relevant part.

Reference analog: gluten-hudi scans through the Hudi jar's relations
(gluten-hudi/src/main/scala/org/apache/gluten/execution/HudiScanTransformer.scala);
semantics here are the public incremental-query contract.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import DataSource

__all__ = ["HudiStreamDataSource", "register_hudi_stream_source"]


def _newest_base_file(files: list[str]) -> str:
    """Newest by the COMMIT INSTANT embedded in the base-file name
    (``<file_id>_<write_token>_<instant>.parquet``) — basenames START
    with the md5 file_id, so lexicographic max picks an arbitrary file
    group, not the latest write (r9 ADVICE)."""
    return max(
        files,
        key=lambda p: os.path.basename(p)[: -len(".parquet")].split("_")[2],
    )


def _opt(options: dict, *names: str, default: str = "") -> str:
    for n in names:
        for k in (n, n.lower()):
            if k in options:
                return options[k]
    return default


class _HudiTableStreamReader:
    """SimpleDataSourceStreamReader over a Hudi COW table."""

    def __init__(self, options: dict) -> None:
        self.root = _opt(options, "path")
        if not self.root:
            raise ValueError("graft_hudi requires .option('path', <root>)")
        self.start_instant = _opt(options, "startingInstant", default="")
        self.max_commits = int(_opt(options, "maxCommitsPerBatch", default="0"))

    # --- offsets -----------------------------------------------------
    def initialOffset(self) -> dict:
        return {"instant": self.start_instant}

    def latestOffset(self) -> dict:
        from incubator_gluten_spark.sources.hudi_format import (
            completed_instants,
        )

        committed = completed_instants(self.root)
        return {"instant": committed[-1] if committed else ""}

    def read(self, start: dict):
        from incubator_gluten_spark.sources.hudi_format import (
            completed_instants,
        )

        lo = start["instant"]
        newer = [i for i in completed_instants(self.root) if i > lo]
        if not newer:
            return iter(()), {"instant": lo}
        if self.max_commits > 0:
            newer = newer[: self.max_commits]
        end = newer[-1]
        # list iterator, never a generator: the engine's prefetch cache
        # copy.copy()s the batch iterator (same gotcha as delta_stream)
        return iter(list(self._rows(lo, end))), {"instant": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows(start["instant"], end["instant"])))

    def commit(self, end: dict) -> None:
        pass

    # --- record-level incremental decode -------------------------------
    def _rows(self, lo: str, hi: str) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        from incubator_gluten_spark.sources.hudi_format import snapshot_files

        names = self._data_columns()
        for path in snapshot_files(self.root, as_of=hi):
            # name-prune: base file instant <= lo holds no rows in range
            instant = os.path.basename(path)[: -len(".parquet")].split("_")[2]
            if instant <= lo:
                continue
            table = pq.read_table(path)
            ct = table.column("_hoodie_commit_time").to_pylist()
            keep = [i for i, c in enumerate(ct) if lo < c <= hi]
            if not keep:
                continue
            table = table.take(keep).select(names)
            cols = [table.column(n).to_pylist() for n in names]
            yield from zip(*cols)

    def _data_columns(self) -> list[str]:
        import pyarrow.parquet as pq

        from incubator_gluten_spark.sources.hudi_format import (
            META_COLS,
            snapshot_files,
        )

        files = snapshot_files(self.root)
        if not files:
            raise ValueError(f"no committed snapshot in {self.root}")
        schema = pq.read_schema(_newest_base_file(files))
        return [n for n in schema.names if n not in META_COLS]


class HudiStreamDataSource(DataSource):
    """``spark.readStream.format("graft_hudi")`` — commit-instant-offset
    record-level incremental micro-batches over a Hudi COW table."""

    @classmethod
    def name(cls) -> str:
        return "graft_hudi"

    def schema(self):
        # built SESSIONLESS from the newest base file's parquet footer
        # (the data-source worker has no JVM — same constraint as the
        # Avro/Iceberg stream sources); from_arrow_schema is pure Python
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        from incubator_gluten_spark.sources.hudi_format import (
            META_COLS,
            snapshot_files,
        )

        root = _opt(self.options, "path")
        if not root:
            raise ValueError("graft_hudi requires .option('path', <root>)")
        files = snapshot_files(root)
        if not files:
            raise ValueError(f"no committed snapshot in {root}")
        schema = pq.read_schema(_newest_base_file(files))
        full = from_arrow_schema(schema)
        from pyspark.sql.types import StructType

        return StructType([f for f in full.fields if f.name not in META_COLS])

    def simpleStreamReader(self, schema):
        return _HudiTableStreamReader(self.options)


def register_hudi_stream_source(spark) -> None:
    spark.dataSource.register(HudiStreamDataSource)
