"""Delta table as a STRUCTURED STREAMING SOURCE (Spark 4 Python
DataSource ``SimpleDataSourceStreamReader``).

``spark.readStream.format("graft_delta").option("path", root)`` tails
the `_delta_log`: offsets are COMMIT VERSIONS (plain dicts the engine
checkpoints — exactly-once via the offset log + deterministic replay
through ``readBetweenOffsets``), each micro-batch is the
``dataChange=true`` add-actions of the versions in ``(start, end]`` —
the same change-set contract as delta's own streaming source:

* append commits stream through as inserts;
* a commit that REMOVES data files raises by default —
  ``ignoreDeletes`` permits remove-only commits (partition deletes),
  ``ignoreChanges`` additionally permits rewrite commits (COW
  update/delete/merge) by re-emitting the commit's restaged adds
  (duplicate delivery, exactly delta's documented semantics);
* an add carrying a DELETION VECTOR is emitted minus its deleted
  positions (the pure-Python Roaring decode, sources/roaring.py);
* column-mapped tables are refused (physical-name streaming would
  silently mis-bind after a rename).

The reader runs in the driver-side Python data-source worker — there is
NO SparkSession there (the same constraint the Avro source hit), so the
log replay and parquet reads are pyarrow + pure Python.  Per-row
transfer crosses the pickled-tuple path: this is the documented
demo-grade connector surface (scan path label in SCALE.md), while the
OFFSET/replay contract — the part a 100 TB deployment relies on for
exactly-once — is the real protocol.

Reference analog: gluten-delta streams through the Delta jar's
DeltaSource (gluten-delta/src/main/scala/org/apache/gluten/execution/
DeltaScanTransformer.scala is the scan side); semantics here are
delta-io PROTOCOL.md + the documented DeltaSource option contract.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from typing import Iterator

from pyspark.sql.datasource import DataSource
from pyspark.sql.types import StructType

__all__ = ["DeltaStreamDataSource", "register_delta_stream_source"]


def _opt(options: dict, *names: str, default: str = "") -> str:
    """Option lookup tolerant of case (DSv2 lowercases option keys)."""
    for n in names:
        for k in (n, n.lower()):
            if k in options:
                return options[k]
    return default


def _log_versions(root: str) -> list[int]:
    log = os.path.join(root, "_delta_log")
    out = []
    for name in os.listdir(log):
        if name.endswith(".json") and name[:-5].isdigit():
            out.append(int(name[:-5]))
    return sorted(out)


def _actions(root: str, version: int) -> list[dict]:
    path = os.path.join(root, "_delta_log", f"{version:020d}.json")
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _metadata_at(root: str, version: int) -> dict:
    """Last metaData action at or before ``version`` (replay, no
    checkpoint shortcuts — a stream source needs the commits anyway)."""
    meta = None
    for v in _log_versions(root):
        if v > version:
            break
        for a in _actions(root, v):
            if a.get("metaData"):
                meta = a["metaData"]
    if meta is None:
        raise ValueError(f"no metaData action in {root} up to v{version}")
    return meta


def _check_not_mapped(meta: dict) -> None:
    mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    if mode != "none":
        raise ValueError(
            "graft_delta streaming source does not support column-mapped "
            f"tables (delta.columnMapping.mode={mode})"
        )


def _coerce_part(v: str | None, spark_type: str):
    if v is None:
        return None
    if spark_type in ("byte", "short", "integer", "long"):
        return int(v)
    if spark_type in ("float", "double"):
        return float(v)
    if spark_type == "boolean":
        return v == "true"
    if spark_type == "date":
        return _dt.date.fromisoformat(v)
    if spark_type == "timestamp":
        return _dt.datetime.fromisoformat(v)
    return v


class _DeltaTableStreamReader:
    """SimpleDataSourceStreamReader over a Delta wire-format table."""

    def __init__(self, options: dict) -> None:
        self.root = _opt(options, "path")
        if not self.root:
            raise ValueError("graft_delta requires .option('path', <root>)")
        self.ignore_deletes = (
            _opt(options, "ignoreDeletes", default="false") == "true"
        )
        self.ignore_changes = (
            _opt(options, "ignoreChanges", default="false") == "true"
        )
        mv = _opt(options, "maxVersionsPerBatch", default="0")
        self.max_versions = int(mv)
        # starting version: -1 = from the table's first commit
        sv = _opt(options, "startingVersion", default="0")
        self.start_version = int(sv)

    # --- offsets -----------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self.start_version - 1}

    def latestOffset(self) -> dict:
        vs = _log_versions(self.root)
        return {"version": vs[-1] if vs else -1}

    def read(self, start: dict):
        vs = _log_versions(self.root)
        latest = vs[-1] if vs else -1
        lo = start["version"]
        if latest <= lo:
            return iter(()), {"version": lo}
        end = (
            latest
            if self.max_versions <= 0
            else min(lo + self.max_versions, latest)
        )
        # a LIST iterator, not a generator: the engine's prefetch cache
        # copy.copy()s the batch iterator (datasource_internal.getCache),
        # which a generator cannot survive.  Batch size is bounded by
        # maxVersionsPerBatch — the simple-reader API is driver-side by
        # design (SCALE.md connector label).
        return iter(list(self._rows(lo, end))), {"version": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows(start["version"], end["version"])))

    def commit(self, end: dict) -> None:  # nothing external to ack
        pass

    # --- change-set decode --------------------------------------------
    def _rows(self, lo: int, hi: int) -> Iterator[tuple]:
        meta = _metadata_at(self.root, hi)
        _check_not_mapped(meta)
        schema = StructType.fromJson(json.loads(meta["schemaString"]))
        fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        part_cols = set(meta.get("partitionColumns") or [])
        # paths live BEFORE the window: an add that re-states one of
        # them (a DV delete re-adds the same path with a descriptor) is
        # an UPDATE of already-delivered data, not an insert — delta's
        # source refuses it without ignoreChanges.  Metadata-only replay.
        seen: set[str] = set()
        for v in _log_versions(self.root):
            if v > lo:
                break
            for a in _actions(self.root, v):
                if a.get("add"):
                    seen.add(a["add"]["path"])
                elif a.get("remove"):
                    seen.discard(a["remove"]["path"])
        for v in _log_versions(self.root):
            if not (lo < v <= hi):
                continue
            actions = _actions(self.root, v)
            adds = [
                a["add"]
                for a in actions
                if a.get("add") and a["add"].get("dataChange", True)
            ]
            removes = [
                a["remove"]
                for a in actions
                if a.get("remove") and a["remove"].get("dataChange", True)
            ]
            rewrites = bool(removes and adds) or any(
                a["path"] in seen for a in adds
            )
            if rewrites and not self.ignore_changes:
                raise ValueError(
                    f"version {v} rewrites data files (COW update/delete/"
                    "merge or DV delete). Streaming a rewritten table "
                    "re-delivers the restaged rows; opt in with "
                    ".option('ignoreChanges', 'true') — delta's own "
                    "source contract"
                )
            if removes and not adds and not (
                self.ignore_deletes or self.ignore_changes
            ):
                raise ValueError(
                    f"version {v} deletes data files. Opt in with "
                    ".option('ignoreDeletes', 'true') if downstream "
                    "tolerates missing deletes — delta's own source contract"
                )
            for add in adds:
                seen.add(add["path"])
                yield from self._emit_add(add, fields, part_cols)
            for r in removes:
                seen.discard(r["path"])

    def _emit_add(self, add: dict, fields: list, part_cols: set):
        import numpy as np
        import pyarrow.parquet as pq

        path = os.path.join(
            self.root, add["path"].replace("/", os.sep)
        )
        table = pq.read_table(path)
        dv = add.get("deletionVector")
        if dv:
            from incubator_gluten_spark.sources.delta_protocol import load_dv

            deleted = np.fromiter(
                (int(p) for p in load_dv(self.root, dv)), dtype=np.int64
            )
            keep = np.setdiff1d(
                np.arange(table.num_rows, dtype=np.int64), deleted
            )
            table = table.take(keep)
        pvals = add.get("partitionValues") or {}
        cols = []
        n = table.num_rows
        for name, typ in fields:
            if name in part_cols:
                cols.append([_coerce_part(pvals.get(name), typ)] * n)
            else:
                cols.append(table.column(name).to_pylist())
        return iter(zip(*cols)) if n else iter(())


class DeltaStreamDataSource(DataSource):
    """``spark.readStream.format("graft_delta")`` — version-offset
    micro-batches over a Delta wire-format table."""

    @classmethod
    def name(cls) -> str:
        return "graft_delta"

    def schema(self):
        root = _opt(self.options, "path")
        if not root:
            raise ValueError("graft_delta requires .option('path', <root>)")
        vs = _log_versions(root)
        meta = _metadata_at(root, vs[-1] if vs else 0)
        _check_not_mapped(meta)
        return StructType.fromJson(json.loads(meta["schemaString"]))

    def simpleStreamReader(self, schema):
        return _DeltaTableStreamReader(self.options)


def register_delta_stream_source(spark) -> None:
    spark.dataSource.register(DeltaStreamDataSource)
