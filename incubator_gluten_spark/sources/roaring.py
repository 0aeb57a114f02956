"""Pure-Python Roaring bitmaps — exactly the serialized forms Delta
Lake's DELETION VECTORS use (delta-io PROTOCOL.md "Deletion Vector
Format"), built from the two PUBLIC specs:

* the standard 32-bit Roaring portable format
  (github.com/RoaringBitmap/RoaringFormatSpec): cookie 12346
  (no run containers) / 12347 (+run-flag bitset), descriptive headers
  (key u16, cardinality-1 u16), offset headers, then array containers
  (sorted u16 values, cardinality <= 4096), bitmap containers (8 KiB =
  1024 u64), or run containers ([start, length-1] u16 pairs) — all
  little-endian;
* Delta's 64-bit "RoaringBitmapArray" portable wrapper: magic
  1681511377 (u32 LE), number of 32-bit bitmaps (u64 LE), then for each
  bitmap its high-32-bit key (u32 LE) followed by the standard 32-bit
  portable serialization of the low 32 bits.

The WRITER emits array/bitmap containers only (cookie 12346 — run
containers are an optional optimization the spec lets writers skip);
the READER consumes all three container kinds, so DVs produced by other
writers (which may run-compress) decode too.

Everything vectorizes through numpy: serialization of N positions is
O(N) array ops, no per-bit Python loops — this code runs inside Arrow
batches when the Delta writer builds DVs distributed.
"""

from __future__ import annotations

import struct

import numpy as np

SERIAL_COOKIE_NO_RUNCONTAINER = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4
MAGIC_RBA = 1681511377  # Delta RoaringBitmapArray "portable" magic


# ---------------------------------------------------------------------------
# 32-bit portable format


def serialize_bitmap32(values: np.ndarray) -> bytes:
    """Standard portable serialization of a 32-bit Roaring bitmap.
    ``values``: sorted unique uint32 array."""
    values = np.asarray(values, dtype=np.uint64)
    keys = (values >> np.uint64(16)).astype(np.uint16)
    lows = (values & np.uint64(0xFFFF)).astype(np.uint16)
    uk, starts = np.unique(keys, return_index=True)
    bounds = np.append(starts, len(values))
    n = len(uk)
    out = bytearray()
    out += struct.pack("<II", SERIAL_COOKIE_NO_RUNCONTAINER, n)
    containers = []
    for i in range(n):
        chunk = lows[bounds[i] : bounds[i + 1]]
        card = len(chunk)
        out += struct.pack("<HH", int(uk[i]), card - 1)
        if card <= 4096:
            containers.append(chunk.tobytes())
        else:
            bits = np.zeros(1024, dtype=np.uint64)
            idx = chunk.astype(np.uint32)
            np.bitwise_or.at(
                bits, idx >> 6, np.uint64(1) << (idx & np.uint32(63)).astype(np.uint64)
            )
            containers.append(bits.tobytes())
    # offset header: always present for cookie 12346
    pos = len(out) + 4 * n
    for c in containers:
        out += struct.pack("<I", pos)
        pos += len(c)
    for c in containers:
        out += c
    return bytes(out)


def deserialize_bitmap32(data: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    """Decode one 32-bit portable bitmap starting at ``offset``.
    Returns (sorted uint32 values, bytes consumed).  Handles array,
    bitmap AND run containers (cookies 12346 and 12347)."""
    start = offset
    (cookie,) = struct.unpack_from("<I", data, offset)
    offset += 4
    run_flags = b""
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        flag_bytes = (n + 7) // 8
        run_flags = data[offset : offset + flag_bytes]
        offset += flag_bytes
    elif cookie == SERIAL_COOKIE_NO_RUNCONTAINER:
        (n,) = struct.unpack_from("<I", data, offset)
        offset += 4
    else:
        raise ValueError(f"bad roaring cookie: {cookie}")
    keys = np.empty(n, dtype=np.uint32)
    cards = np.empty(n, dtype=np.int64)
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", data, offset)
        offset += 4
        keys[i], cards[i] = k, cm1 + 1
    has_offsets = cookie == SERIAL_COOKIE_NO_RUNCONTAINER or (
        (cookie & 0xFFFF) == SERIAL_COOKIE and n >= NO_OFFSET_THRESHOLD
    )
    if has_offsets:
        offset += 4 * n  # trust sequential layout; offsets are relative anyway
    parts = []
    for i in range(n):
        is_run = bool(run_flags and (run_flags[i // 8] >> (i % 8)) & 1)
        if is_run:
            (n_runs,) = struct.unpack_from("<H", data, offset)
            offset += 2
            runs = np.frombuffer(data, np.uint16, 2 * n_runs, offset).reshape(
                -1, 2
            )
            offset += 4 * n_runs
            vals = np.concatenate(
                [
                    np.arange(s, s + ln + 1, dtype=np.uint32)
                    for s, ln in runs.astype(np.uint32)
                ]
            ) if n_runs else np.empty(0, dtype=np.uint32)
        elif cards[i] <= 4096:
            vals = np.frombuffer(
                data, np.uint16, int(cards[i]), offset
            ).astype(np.uint32)
            offset += 2 * int(cards[i])
        else:
            bits = np.frombuffer(data, np.uint64, 1024, offset)
            offset += 8192
            unpacked = np.unpackbits(
                bits.view(np.uint8), bitorder="little"
            )
            vals = np.nonzero(unpacked)[0].astype(np.uint32)
        parts.append(vals + (np.uint32(keys[i]) << np.uint32(16)))
    values = (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint32)
    )
    return values, offset - start


# ---------------------------------------------------------------------------
# Delta 64-bit RoaringBitmapArray wrapper


def serialize_rba(positions) -> bytes:
    """Delta RoaringBitmapArray portable serialization of sorted unique
    uint64 positions (row indexes)."""
    positions = np.asarray(sorted(set(int(p) for p in positions)), dtype=np.uint64)
    if len(positions) and int(positions[-1]) >> 32 >= 2**31:
        raise ValueError("position out of RoaringBitmapArray range")
    highs = (positions >> np.uint64(32)).astype(np.uint32)
    lows = (positions & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    uk, starts = np.unique(highs, return_index=True)
    bounds = np.append(starts, len(positions))
    out = bytearray()
    out += struct.pack("<IQ", MAGIC_RBA, len(uk))
    for i, key in enumerate(uk):
        out += struct.pack("<I", int(key))
        out += serialize_bitmap32(lows[bounds[i] : bounds[i + 1]])
    return bytes(out)


def deserialize_rba(data: bytes) -> np.ndarray:
    """Sorted uint64 positions from a Delta RoaringBitmapArray blob."""
    magic, n_maps = struct.unpack_from("<IQ", data, 0)
    if magic != MAGIC_RBA:
        raise ValueError(f"bad RoaringBitmapArray magic: {magic}")
    offset = 12
    parts = []
    for _ in range(n_maps):
        (key,) = struct.unpack_from("<I", data, offset)
        offset += 4
        vals, used = deserialize_bitmap32(data, offset)
        offset += used
        parts.append(vals.astype(np.uint64) + (np.uint64(key) << np.uint64(32)))
    return (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    )
