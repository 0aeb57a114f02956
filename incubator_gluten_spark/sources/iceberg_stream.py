"""Iceberg table as a STRUCTURED STREAMING SOURCE (Spark 4 Python
DataSource ``SimpleDataSourceStreamReader``).

``spark.readStream.format("graft_iceberg").option("path", root)`` tails
the snapshot log: offsets are SNAPSHOT IDS (engine-checkpointed dicts;
deterministic ``readBetweenOffsets`` replay = exactly-once), each
micro-batch is the ADDED manifest entries of the snapshots in
``(start, end]`` — the same incremental-append contract as Iceberg's
own Spark streaming source:

* append snapshots stream through as inserts (Iceberg data files carry
  EVERY column, including identity-partition ones, so the batch is a
  plain parquet read — no partition re-injection);
* a snapshot whose summary operation is not ``append`` (delete,
  replace/compaction) raises by default; ``ignoreChanges`` skips
  non-append snapshots' effects while still delivering genuinely new
  ADDED files (compactions re-add existing rows — duplicate delivery,
  the documented trade-off Iceberg's source shares);
* column binding is BY NAME against the current schema (fields a data
  file lacks read as NULL) — field-id evolution tables stream with
  their current names.

Runs in the driver-side Python data-source worker (no SparkSession):
manifest Avro decodes through this repo's own pure-Python codec and
data files through pyarrow.  The offset/replay contract is the
100 TB-relevant part; per-batch size is paced by ``maxSnapshotsPerBatch``.

Reference analog: gluten-iceberg streams through the jar's
SparkMicroBatchStream; semantics here are the public spec's.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import DataSource

__all__ = ["IcebergStreamDataSource", "register_iceberg_stream_source"]


def _opt(options: dict, *names: str, default: str = "") -> str:
    for n in names:
        for k in (n, n.lower()):
            if k in options:
                return options[k]
    return default


def _current_meta(root: str) -> dict:
    with open(os.path.join(root, "metadata", "version-hint.text")) as f:
        v = int(f.read().strip())
    with open(os.path.join(root, "metadata", f"v{v}.metadata.json")) as f:
        return json.load(f)


class _IcebergTableStreamReader:
    """SimpleDataSourceStreamReader over an Iceberg v1 table."""

    ADDED = 1

    def __init__(self, options: dict) -> None:
        self.root = _opt(options, "path")
        if not self.root:
            raise ValueError("graft_iceberg requires .option('path', <root>)")
        self.ignore_changes = (
            _opt(options, "ignoreChanges", default="false") == "true"
        )
        self.max_snapshots = int(
            _opt(options, "maxSnapshotsPerBatch", default="0")
        )

    def initialOffset(self) -> dict:
        return {"snapshot": 0}

    def read(self, start: dict):
        meta = _current_meta(self.root)
        snaps = meta.get("snapshots", [])
        latest = max((s["snapshot-id"] for s in snaps), default=0)
        lo = start["snapshot"]
        if latest <= lo:
            return iter(()), {"snapshot": lo}
        end = (
            latest
            if self.max_snapshots <= 0
            else min(lo + self.max_snapshots, latest)
        )
        return iter(list(self._rows(lo, end))), {"snapshot": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows(start["snapshot"], end["snapshot"])))

    def commit(self, end: dict) -> None:
        pass

    def _rows(self, lo: int, hi: int) -> Iterator[tuple]:
        from incubator_gluten_spark.sources.avro import read_container

        meta = _current_meta(self.root)
        schemas = meta.get("schemas") or [meta["schema"]]
        by_id = {s.get("schema-id", 0): s for s in schemas}
        cur = by_id.get(meta.get("current-schema-id", 0), schemas[-1])
        names = [f["name"] for f in cur["fields"]]
        # name-mapped tables (Hive migrate, Delta UniForm) strip identity
        # partition columns from EVERY data file: without injection the
        # stream would silently NULL-fill them while the batch path
        # (_read_name_mapped) sources them from the manifest partition
        # tuple — r9 ADVICE.  Mirror the batch path's refusals too.
        part_inject: dict[str, str] = {}
        if (meta.get("properties") or {}).get("schema.name-mapping.default"):
            if len(schemas) > 1:
                raise ValueError(
                    "name-mapped stream with evolved schema history: name "
                    "binding cannot track renames/re-adds — refusing"
                )
            from incubator_gluten_spark.sources.iceberg_format import (
                _default_spec,
            )

            spec = _default_spec(meta)
            if any(
                pf.get("transform", "identity") != "identity"
                for pf in spec["fields"]
            ):
                raise ValueError(
                    "name-mapped stream supports identity partition "
                    "specs only"
                )
            fld = {f["id"]: f for f in cur["fields"]}
            part_inject = {
                fld[pf["source-id"]]["name"]: fld[pf["source-id"]]["type"]
                for pf in spec["fields"]
            }
        for s in meta.get("snapshots", []):
            sid = s["snapshot-id"]
            if not (lo < sid <= hi):
                continue
            op = s.get("summary", {}).get("operation", "append")
            if op != "append" and not self.ignore_changes:
                raise ValueError(
                    f"snapshot {sid} is a {op!r}, not an append. Streaming "
                    "past deletes/compactions loses or re-delivers rows; "
                    "opt in with .option('ignoreChanges', 'true') — "
                    "iceberg's own streaming-source contract"
                )
            ml = os.path.join(self.root, s["manifest-list"])
            for mf in read_container(ml):
                manifest = os.path.join(self.root, mf[0])
                for status, snap_id, data_file in read_container(manifest):
                    if status != self.ADDED or snap_id != sid:
                        continue
                    yield from self._emit(data_file, names, part_inject)

    def _emit(
        self, data_file: dict, names: list[str], part_inject: dict
    ):
        import datetime as _dt

        import pyarrow.parquet as pq

        path = os.path.join(self.root, data_file["file_path"])
        table = pq.read_table(path)
        n = table.num_rows
        pvals = data_file.get("partition") or {}
        cols = []
        for name in names:
            if name in table.schema.names:
                cols.append(table.column(name).to_pylist())
            elif name in part_inject:
                # identity partition value from the manifest tuple
                # (spec: identity values may be sourced from metadata)
                v = pvals.get(name)
                if v is not None and part_inject[name] == "date":
                    v = _dt.date(1970, 1, 1) + _dt.timedelta(days=int(v))
                cols.append([v] * n)
            else:
                cols.append([None] * n)  # pre-evolution file
        return iter(zip(*cols)) if n else iter(())


class IcebergStreamDataSource(DataSource):
    """``spark.readStream.format("graft_iceberg")`` — snapshot-id-offset
    micro-batches over an Iceberg v1 table."""

    @classmethod
    def name(cls) -> str:
        return "graft_iceberg"

    def schema(self):
        # built SESSIONLESS: the data-source worker has no JVM, so
        # _parse_datatype_string is unavailable (same constraint the
        # Avro source hit) — map Iceberg types to pyspark type objects
        from pyspark.sql import types as T

        from incubator_gluten_spark.sources.iceberg_format import (
            _current_schema,
        )

        root = _opt(self.options, "path")
        if not root:
            raise ValueError("graft_iceberg requires .option('path', <root>)")
        ice_to_t = {
            "long": T.LongType(),
            "int": T.IntegerType(),
            "double": T.DoubleType(),
            "float": T.FloatType(),
            "string": T.StringType(),
            "boolean": T.BooleanType(),
            "binary": T.BinaryType(),
            "date": T.DateType(),
            "timestamp": T.TimestampNTZType(),
            "timestamptz": T.TimestampType(),
        }
        cur = _current_schema(_current_meta(root))
        return T.StructType(
            [
                T.StructField(
                    f["name"], ice_to_t[f["type"]], not f["required"]
                )
                for f in cur["fields"]
            ]
        )

    def simpleStreamReader(self, schema):
        return _IcebergTableStreamReader(self.options)


def register_iceberg_stream_source(spark) -> None:
    spark.dataSource.register(IcebergStreamDataSource)
