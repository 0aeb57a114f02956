"""Iceberg PARTITION TRANSFORMS — hidden partitioning.

Implements the Apache Iceberg spec's partition transforms so tables can
be partitioned by a *derived* value while queries keep filtering on the
source column (the spec's headline "hidden partitioning" property):

* ``year`` / ``month`` / ``day`` / ``hour`` — ordinals relative to
  1970-01-01 00:00:00 UTC (spec: ``year`` counts years from 1970,
  ``month`` months from 1970-01, ``day`` days from epoch, ``hour``
  hours from epoch; all floor semantics, so pre-epoch values go
  negative).
* ``truncate[W]`` — integers truncate toward negative infinity
  (``v - (v mod W)`` with a positive mod), strings truncate to the
  first ``W`` characters.
* ``bucket[N]`` — ``(murmur3_x86_32(encode(v)) & Integer.MAX_VALUE)
  mod N`` with seed 0, where ints/longs/dates/timestamps hash as the
  8-byte little-endian of their long representation (days since epoch
  for dates, micros since epoch for timestamps) and strings hash their
  UTF-8 bytes — the spec's Appendix B contract, pinned against the
  spec's published test vectors in tests/test_iceberg_transforms.py.

Engine integration lives in iceberg_format.py: the writer computes the
transform JVM-side where built-ins express it (year/month/day/hour/
truncate — date arithmetic and pmod, whole-stage-codegen friendly) and
through an Arrow-vectorized numpy murmur3 kernel for bucket (per-batch,
never per-row Python for the numeric types); scan planning maps SOURCE
predicates into partition space (monotonic transforms map range
endpoints, bucket maps equality/IN only) so file pruning needs no data
or footer reads — the property that makes a day-partitioned 100 TB
table cheap to query by timestamp range.

Reference analog: gluten-iceberg reads transformed specs through the
Iceberg jar (gluten-iceberg/src/main/scala/org/apache/gluten/execution/
IcebergScanTransformer.scala); this module implements the transforms
themselves from the public spec, since no Iceberg jar exists in this
environment.
"""

from __future__ import annotations

import datetime as _dt
import re
import struct
from typing import Any

import numpy as np
import pandas as pd  # noqa: F401 — resolves the pandas-UDF type hints

__all__ = [
    "murmur3_32",
    "hash_long",
    "bucket_of",
    "parse_partition_field",
    "result_ice_type",
    "spark_transform_expr",
    "apply_literal",
    "is_monotonic",
]

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
_M32 = 0xFFFFFFFF


# ---------------------------------------------------------------------------
# murmur3_x86_32, seed 0 (spec Appendix B)


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """32-bit x86 Murmur3 of ``data``; returns the SIGNED int32 Java
    would (the spec publishes signed test vectors)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _M32
    n = len(data)
    for i in range(0, n - n % 4, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * c2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[n - n % 4 :]
    if tail:
        k = 0
        for i, b in enumerate(tail):
            k |= b << (8 * i)
        k = (k * c1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * c2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def hash_long(v: int) -> int:
    """Spec: int and long hash identically — the 8-byte little-endian
    of the long value (hashInt(34) == hashLong(34) == 2017239379)."""
    return murmur3_32(struct.pack("<q", v))


def _mm3_long_np(v: np.ndarray) -> np.ndarray:
    """Vectorized murmur3_x86_32 over int64 values (8-byte little-endian
    encoding = two 4-byte blocks, no tail). Returns uint32 hashes.
    Parity vs the scalar path is pinned in tests."""
    u = v.astype(np.int64).view(np.uint64)
    k1 = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    k2 = (u >> np.uint64(32)).astype(np.uint32)
    h = np.zeros(len(v), dtype=np.uint32)
    for k in (k1, k2):
        k = k * np.uint32(0xCC9E2D51)
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k = k * np.uint32(0x1B873593)
        h = h ^ k
        h = (h << np.uint32(13)) | (h >> np.uint32(19))
        h = h * np.uint32(5) + np.uint32(0xE6546B64)
    h = h ^ np.uint32(8)  # length
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> np.uint32(16))
    return h


def bucket_from_hashes_np(h: np.ndarray, n: int) -> np.ndarray:
    """(hash & Integer.MAX_VALUE) mod N, vectorized."""
    return ((h & np.uint32(0x7FFFFFFF)).astype(np.int64) % n).astype(np.int32)


def _as_long(value: Any, ice_type: str) -> int:
    """A literal's long representation for hashing (spec encodings)."""
    if ice_type in ("int", "long"):
        return int(value)
    if ice_type == "date":
        return (value - _EPOCH_DATE).days
    if ice_type in ("timestamp", "timestamptz"):
        dt = value
        if dt.tzinfo is None:  # session tz is pinned UTC (session.py)
            dt = dt.replace(tzinfo=_dt.timezone.utc)
        return int((dt - _EPOCH_DT) / _dt.timedelta(microseconds=1))
    raise ValueError(f"bucket transform unsupported on {ice_type}")


def bucket_of(value: Any, ice_type: str, n: int) -> int | None:
    """bucket[N] of a driver-side literal (scan-planning side)."""
    if value is None:
        return None
    if ice_type == "string":
        h = murmur3_32(value.encode("utf-8"))
    else:
        h = hash_long(_as_long(value, ice_type))
    return (h & 0x7FFFFFFF) % n


# ---------------------------------------------------------------------------
# partition-spec parsing

_TRANSFORM_RE = re.compile(r"^(\w+)\(\s*(?:(\d+)\s*,\s*)?(\w+)\s*\)$")
_SUFFIX = {
    "year": "year",
    "month": "month",
    "day": "day",
    "hour": "hour",
    "bucket": "bucket",
    "truncate": "trunc",
}


def parse_partition_field(
    spec_str: str, ice_schema: dict, field_id: int
) -> dict:
    """``"day(ts)"`` / ``"bucket(8, user_id)"`` / ``"truncate(4, name)"``
    / plain ``"col"`` -> a spec partition-field dict.  Field naming
    follows Iceberg's convention (``<col>_day``, ``<col>_bucket``,
    ``<col>_trunc``); the transform string uses the spec's bracket
    notation (``bucket[8]``)."""
    by_name = {f["name"]: f for f in ice_schema["fields"]}
    s = spec_str.strip()
    m = _TRANSFORM_RE.match(s)
    if not m:
        if s not in by_name:
            raise ValueError(f"unknown partition column {s!r}")
        return {
            "name": s,
            "transform": "identity",
            "source-id": by_name[s]["id"],
            "field-id": field_id,
        }
    t, arg, src = m.groups()
    if t not in _SUFFIX:
        raise ValueError(f"unknown partition transform {t!r} in {s!r}")
    if src not in by_name:
        raise ValueError(f"unknown partition source column {src!r}")
    if t in ("bucket", "truncate"):
        if not arg:
            raise ValueError(f"{t} needs a width/count arg: {s!r}")
        transform = f"{t}[{int(arg)}]"
    else:
        if arg:
            raise ValueError(f"{t} takes no arg: {s!r}")
        transform = t
    src_type = by_name[src]["type"]
    _check_source_type(transform, src_type, s)
    return {
        "name": f"{src}_{_SUFFIX[t]}",
        "transform": transform,
        "source-id": by_name[src]["id"],
        "field-id": field_id,
    }


def _check_source_type(transform: str, ice_type: str, spec_str: str) -> None:
    time_ok = ("date", "timestamp", "timestamptz")
    if transform in ("year", "month", "day") and ice_type not in time_ok:
        raise ValueError(f"{spec_str!r}: source must be date/timestamp")
    if transform == "hour" and ice_type not in ("timestamp", "timestamptz"):
        raise ValueError(f"{spec_str!r}: hour needs a timestamp source")
    if transform.startswith("bucket[") and ice_type not in (
        "int",
        "long",
        "date",
        "timestamp",
        "timestamptz",
        "string",
    ):
        raise ValueError(f"{spec_str!r}: bucket unsupported on {ice_type}")
    if transform.startswith("truncate[") and ice_type not in (
        "int",
        "long",
        "string",
    ):
        raise ValueError(f"{spec_str!r}: truncate needs int/long/string")


def result_ice_type(transform: str, source_ice_type: str) -> str:
    """Iceberg type of the PARTITION value the transform produces."""
    if transform == "identity" or transform.startswith("truncate["):
        return source_ice_type
    return "int"  # year/month/day/hour ordinals and bucket ids


def is_monotonic(transform: str) -> bool:
    """Order-preserving transforms admit RANGE predicate mapping
    (part <= T(ub) / part >= T(lb)); bucket admits equality only."""
    return not transform.startswith("bucket[")


def _arg_of(transform: str) -> int:
    return int(transform[transform.index("[") + 1 : -1])


# ---------------------------------------------------------------------------
# Spark-side transform expressions (write path)


def spark_transform_expr(transform: str, src_col: str, src_spark_type: str):
    """Column expression computing the transform of ``src_col``.
    year/month/day/hour/truncate stay JVM-side (codegen); bucket goes
    through an Arrow-batched numpy murmur3 kernel for the long-backed
    types and per-row Python only for strings."""
    from pyspark.sql import functions as F

    c = F.col(src_col)
    if transform == "identity":
        return c
    if transform == "year":
        return (F.year(c) - F.lit(1970)).cast("int")
    if transform == "month":
        return (
            (F.year(c) - F.lit(1970)) * F.lit(12) + F.month(c) - F.lit(1)
        ).cast("int")
    if transform == "day":
        return F.datediff(
            c.cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("int")
    if transform == "hour":
        # ntz casts to the session tz, pinned UTC (session.py) — the
        # spec's hour ordinal is hours since epoch UTC either way
        return F.floor(
            F.unix_micros(c.cast("timestamp")) / F.lit(3_600_000_000)
        ).cast("int")
    if transform.startswith("truncate["):
        w = _arg_of(transform)
        if src_spark_type == "string":
            return F.substring(c, 1, w)
        return (c - F.pmod(c, F.lit(w))).cast(src_spark_type)
    if transform.startswith("bucket["):
        n = _arg_of(transform)
        if src_spark_type == "string":
            return _bucket_string_udf(n)(c)
        if src_spark_type == "date":
            lv = F.datediff(c, F.lit("1970-01-01").cast("date")).cast("long")
        elif src_spark_type in ("timestamp", "timestamp_ntz"):
            lv = F.unix_micros(c.cast("timestamp"))
        else:
            lv = c.cast("long")
        return _bucket_long_udf(n)(lv)
    raise ValueError(f"unknown transform {transform!r}")


def _bucket_long_udf(n: int):
    from pyspark.sql import functions as F

    @F.pandas_udf("int")
    def bucket_long(s: pd.Series) -> pd.Series:
        mask = s.isna()
        vals = s.fillna(0).astype(np.int64).to_numpy()
        b = bucket_from_hashes_np(_mm3_long_np(vals), n)
        out = pd.Series(b).astype("object")
        out[mask.to_numpy()] = None
        return out

    return bucket_long


def _bucket_string_udf(n: int):
    from pyspark.sql import functions as F

    @F.pandas_udf("int")
    def bucket_string(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else (murmur3_32(v.encode("utf-8")) & 0x7FFFFFFF) % n
        ).astype("object")

    return bucket_string


# ---------------------------------------------------------------------------
# literal-side transform (scan planning)


def apply_literal(transform: str, value: Any, ice_type: str):
    """Transform a driver-side predicate literal into partition space.
    Accepts python date/datetime/int/str; naive datetimes are UTC (the
    engine pins the session timezone to UTC, session.py)."""
    if value is None:
        return None
    if transform == "identity":
        return value
    if transform == "year":
        return value.year - 1970
    if transform == "month":
        return (value.year - 1970) * 12 + value.month - 1
    if transform == "day":
        d = value.date() if isinstance(value, _dt.datetime) else value
        return (d - _EPOCH_DATE).days
    if transform == "hour":
        micros = _as_long(value, "timestamp")
        return micros // 3_600_000_000
    if transform.startswith("truncate["):
        w = _arg_of(transform)
        if isinstance(value, str):
            return value[:w]
        return value - (value % w)  # python % is already a positive mod
    if transform.startswith("bucket["):
        return bucket_of(value, ice_type, _arg_of(transform))
    raise ValueError(f"unknown transform {transform!r}")
