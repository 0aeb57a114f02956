"""Delta Lake deletion vectors: Roaring serialization (both public
specs), DV file framing, merge-on-read application, DV merge on
re-delete, checkpoint survival, protocol feature gating."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import delta_protocol as dp
from incubator_gluten_spark.sources.roaring import (
    MAGIC_RBA,
    deserialize_bitmap32,
    deserialize_rba,
    serialize_bitmap32,
    serialize_rba,
)


# ---------------------------------------------------------------------------
# roaring unit tests (no Spark)


def test_bitmap32_layout_matches_spec():
    """Independent reconstruction of the RoaringFormatSpec byte layout
    for a two-container bitmap (one array, one bitmap container)."""
    vals = np.array([1, 2, 65536 + 5], dtype=np.uint32)
    blob = serialize_bitmap32(vals)
    cookie, n = struct.unpack_from("<II", blob, 0)
    assert (cookie, n) == (12346, 2)
    # descriptive headers: (key, cardinality-1)
    assert struct.unpack_from("<HH", blob, 8) == (0, 1)
    assert struct.unpack_from("<HH", blob, 12) == (1, 0)
    # offset header then sorted u16 array containers
    o0, o1 = struct.unpack_from("<II", blob, 16)
    assert struct.unpack_from("<HH", blob, o0) == (1, 2)
    assert struct.unpack_from("<H", blob, o1) == (5,)
    back, used = deserialize_bitmap32(blob)
    assert used == len(blob) and list(back) == [1, 2, 65536 + 5]


def test_bitmap32_dense_container_roundtrip():
    vals = np.arange(0, 60000, 3, dtype=np.uint32)  # cardinality > 4096
    back, _ = deserialize_bitmap32(serialize_bitmap32(vals))
    assert np.array_equal(back, vals)


def test_bitmap32_reads_run_containers():
    """Hand-built cookie-12347 blob with one run container — writers may
    run-compress; our reader must accept it."""
    blob = bytearray()
    blob += struct.pack("<I", (0 << 16) | 12347)  # 1 container
    blob += b"\x01"  # run flag bitset: container 0 is runs
    blob += struct.pack("<HH", 0, 9)  # key 0, cardinality-1
    blob += struct.pack("<H", 2)  # 2 runs
    blob += struct.pack("<HH", 10, 4)  # 10..14
    blob += struct.pack("<HH", 100, 4)  # 100..104
    back, used = deserialize_bitmap32(bytes(blob))
    assert used == len(blob)
    assert list(back) == list(range(10, 15)) + list(range(100, 105))


def test_rba_wrapper_layout_and_high_bits():
    pos = [3, 2**32 + 7, 2**33]
    blob = serialize_rba(pos)
    magic, n_maps = struct.unpack_from("<IQ", blob, 0)
    assert magic == MAGIC_RBA and n_maps == 3
    assert list(deserialize_rba(blob)) == sorted(pos)


@pytest.mark.parametrize("n", [0, 1, 4096, 5000])
def test_rba_roundtrip_sizes(n):
    import random

    rng = random.Random(n)
    pos = sorted(set(rng.randrange(0, 2**34) for _ in range(n)))
    assert list(deserialize_rba(serialize_rba(pos))) == pos


# ---------------------------------------------------------------------------
# Delta integration


def _orders(spark, sf_dir, year):
    from incubator_gluten_spark.catalog import load_tables

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return orders.filter(F.year("o_orderdate") == year).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_dv_delete_merge_on_read_no_rewrite(spark, sf_dir, tmp_path):
    base = _orders(spark, sf_dir, 1996)
    root = str(tmp_path / "dv")
    dp.create_table(base, root, partition_cols=["o_orderpriority"])
    files_before = [a["path"] for a in dp.resolve(spark, root).adds]
    out = dp.delete_where_dv(spark, root, "o_totalprice < 50000")
    assert out["rows_deleted"] == base.filter("o_totalprice < 50000").count()
    snap = dp.resolve(spark, root)
    # same data files, now carrying descriptors — nothing rewritten
    assert [a["path"] for a in snap.adds] == files_before
    assert all(a["deletionVector"]["storageType"] == "u" for a in snap.adds)
    got = dp.read_table(spark, root)
    assert _rows(got) == _rows(base.filter("o_totalprice >= 50000"))
    # time travel to the pre-DV version still sees every row
    assert _rows(dp.read_table(spark, root, 0)) == _rows(base)


def test_dv_file_framing_checksum_and_b85_path(spark, sf_dir, tmp_path):
    """The .bin file honors [version][size BE][data][crc32 BE] at each
    descriptor offset, and pathOrInlineDv base85-decodes to the file's
    UUID; corrupting a byte trips the checksum."""
    import os

    base = _orders(spark, sf_dir, 1996)
    root = str(tmp_path / "dv_frame")
    dp.create_table(base, root)
    dp.delete_where_dv(spark, root, "o_orderkey % 3 = 0")
    add = dp.resolve(spark, root).adds[0]
    d = add["deletionVector"]
    rel = dp._dv_file_rel(d)
    path = os.path.join(root, rel)
    assert os.path.exists(path) and rel.startswith("deletion_vector_")
    blob = open(path, "rb").read()
    assert blob[0] == 1
    (size,) = struct.unpack_from(">i", blob, d["offset"])
    assert size == d["sizeInBytes"]
    data = blob[d["offset"] + 4 : d["offset"] + 4 + size]
    (crc,) = struct.unpack_from(">I", blob, d["offset"] + 4 + size)
    assert zlib.crc32(data) == crc
    assert len(deserialize_rba(data)) == d["cardinality"]
    corrupted = bytearray(blob)
    corrupted[d["offset"] + 4] ^= 0xFF
    with open(path, "wb") as f:
        f.write(bytes(corrupted))
    with pytest.raises(dp.DeltaProtocolError, match="checksum"):
        dp.load_dv(root, d)


def test_dv_second_delete_merges_bitmaps(spark, sf_dir, tmp_path):
    base = _orders(spark, sf_dir, 1996)
    root = str(tmp_path / "dv_merge")
    dp.create_table(base, root)
    dp.delete_where_dv(spark, root, "o_totalprice < 30000")
    out = dp.delete_where_dv(spark, root, "o_orderpriority = '5-LOW'")
    # second pass counts only NEWLY deleted rows
    want_new = base.filter(
        "o_orderpriority = '5-LOW' AND o_totalprice >= 30000"
    ).count()
    assert out["rows_deleted"] == want_new
    got = dp.read_table(spark, root)
    want = base.filter(
        "o_totalprice >= 30000 AND o_orderpriority <> '5-LOW'"
    )
    assert _rows(got) == _rows(want)


def test_dv_survives_checkpoint(spark, sf_dir, tmp_path):
    base = _orders(spark, sf_dir, 1996)
    root = str(tmp_path / "dv_ck")
    dp.create_table(base, root)
    dp.delete_where_dv(spark, root, "o_totalprice < 40000")
    dp.checkpoint(spark, root)
    # append forces replay through the checkpoint
    dp.append(_orders(spark, sf_dir, 1997), root)
    snap = dp.resolve(spark, root)
    assert any(a.get("deletionVector") for a in snap.adds)
    want = base.filter("o_totalprice >= 40000").unionAll(
        _orders(spark, sf_dir, 1997)
    )
    assert _rows(dp.read_table(spark, root)) == _rows(want)


def test_protocol_gate_still_refuses_unknown_features(spark, tmp_path):
    import json
    import os

    root = str(tmp_path / "gate")
    os.makedirs(os.path.join(root, "_delta_log"))
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        # columnMapping graduated to a SUPPORTED reader
                        # feature (r9); v2Checkpoint is still unknown —
                        # the gate must refuse rather than misread
                        "readerFeatures": ["deletionVectors", "v2Checkpoint"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(dp.DeltaProtocolError, match="v2Checkpoint"):
        dp.resolve(spark, root)


def test_cow_delete_after_dv_delete_keeps_dv_rows_deleted(spark, sf_dir, tmp_path):
    """r7 ADVICE (high): copy-on-write delete_where must apply existing
    deletion vectors before restaging survivors — a raw
    spark.read.parquet rewrite silently resurrected DV-deleted rows."""
    base = _orders(spark, sf_dir, 1996)
    root = str(tmp_path / "mix")
    dp.create_table(base, root, partition_cols=["o_orderpriority"])
    dp.delete_where_dv(spark, root, "o_totalprice < 50000")
    dp.delete_where(spark, root, "o_totalprice > 200000")
    got = dp.read_table(spark, root)
    want = base.filter("o_totalprice >= 50000 AND o_totalprice <= 200000")
    assert _rows(got) == _rows(want)
    # the rewrite dropped the DV descriptors (survivors were restaged)
    snap = dp.resolve(spark, root)
    assert not any(a.get("deletionVector") for a in snap.adds)


def test_dv_expansion_driver_materialization_bounded(
    spark, sf_dir, tmp_path, monkeypatch
):
    """r8 verdict directive #3: DV expansion must not hold every
    position as a Python int simultaneously — at most
    _DV_POSITIONS_PER_SLICE positions per createDataFrame slice, slices
    unioned, result and plan unchanged.  At 100 TB a table's total DV
    cardinality can be billions; the peak driver allocation must be the
    slice cap, not the table's deletion count."""
    base = _orders(spark, sf_dir, 1996)
    root = str(tmp_path / "dv_chunk")
    dp.create_table(base, root)
    dp.delete_where_dv(spark, root, "o_orderkey % 2 = 0")
    snap = dp.resolve(spark, root)
    cap = 16
    monkeypatch.setattr(dp, "_DV_POSITIONS_PER_SLICE", cap)
    calls: list[int] = []

    class _Spy:
        def __init__(self, s):
            self._s = s

        def createDataFrame(self, rows, schema):
            calls.append(sum(len(r[1]) for r in rows))
            return self._s.createDataFrame(rows, schema)

        def __getattr__(self, name):
            return getattr(self._s, name)

    got = dp._dv_positions_df(_Spy(spark), root, snap)
    n_expected = sum(
        a["deletionVector"]["cardinality"]
        for a in snap.adds
        if a.get("deletionVector")
    )
    assert got.count() == n_expected
    assert len(calls) > 1, "slicing never engaged"
    assert max(calls) <= cap, f"a slice materialized {max(calls)} > {cap}"
    # reader correctness and the Python-free plan survive slicing
    sliced = dp.read_table(spark, root)
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    for marker in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert marker not in plan, marker
    assert _rows(sliced) == _rows(base.filter("o_orderkey % 2 != 0"))


def test_dv_positions_expand_jvm_side(spark, sf_dir, tmp_path):
    """The DV-merging scan plan contains no Python evaluation node —
    position expansion is a JVM-side explode (r7 plan-audit note)."""
    base = _orders(spark, sf_dir, 1996)
    root = str(tmp_path / "plan")
    dp.create_table(base, root)
    dp.delete_where_dv(spark, root, "o_totalprice < 50000")
    plan = dp.read_table(spark, root)._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan or "Generate" in plan
    for marker in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert marker not in plan, marker


def _anti_lines(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [ln for ln in plan.splitlines() if "LeftAnti" in ln]


def test_dv_broadcast_gate_both_sides(spark, tmp_path, monkeypatch):
    """r13 verdict weak #1: the DV delete side must be broadcast-hinted
    only under the metadata cardinality gate — past it (a month of MoR
    delete debt at 100 TB is 100M+ positions, exactly the scale the
    scratch-parquet spill exists for) the hint drops and AQE sizes the
    anti-join.  autoBroadcastJoinThreshold pinned to -1 so the no-hint
    branch isn't re-broadcast by the size estimator; in production AQE
    re-sizes at runtime, which is the point."""
    root = str(tmp_path / "dv_gate")
    df = spark.range(0, 2000).selectExpr("id AS k", "id * 1.0 AS v")
    dp.create_table(df.repartition(2), root)
    dp.delete_where_dv(spark, root, "k % 3 = 0")
    want = sorted(r.k for r in dp.read_table(spark, root).collect())

    key = "spark.sql.autoBroadcastJoinThreshold"
    prior = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        small = _anti_lines(dp.read_table(spark, root))
        assert len(small) == 1 and "Broadcast" in small[0]
        monkeypatch.setattr(dp, "_DV_BROADCAST_MAX_POSITIONS", 0)
        big = _anti_lines(dp.read_table(spark, root))
        assert len(big) == 1 and "Broadcast" not in big[0]
        # heavy-debt shape: spill + no hint together — the scan the
        # spill returns must NOT be funneled back through the driver
        monkeypatch.setattr(dp, "_DV_SPILL_POSITIONS", 10)
        spilled = _anti_lines(dp.read_table(spark, root))
        assert len(spilled) == 1 and "Broadcast" not in spilled[0]
        assert sorted(r.k for r in dp.read_table(spark, root).collect()) == want
    finally:
        spark.conf.set(key, prior)


def test_dv_gate_covers_all_consumers(spark, tmp_path, monkeypatch):
    """Every consumer of the DV positions frame (plain read, row-tracked
    read, delete_where_dv's existing-DV filter) routes through
    _dv_delete_side so the gate can never be bypassed; gated-off plans
    still return exact results on each path."""
    root = str(tmp_path / "dv_gate_all")
    df = spark.range(0, 300).selectExpr("id AS k", "id * 1.0 AS v")
    dp.create_table(df.repartition(2), root, row_tracking=True)
    dp.delete_where_dv(spark, root, "k < 30")

    calls = []
    orig = dp._dv_delete_side

    def spy(spark_, root_, snap_):
        calls.append(1)
        return orig(spark_, root_, snap_)

    monkeypatch.setattr(dp, "_dv_delete_side", spy)
    monkeypatch.setattr(dp, "_DV_BROADCAST_MAX_POSITIONS", 0)

    key = "spark.sql.autoBroadcastJoinThreshold"
    prior = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        assert sorted(
            r.k for r in dp.read_table(spark, root).collect()
        ) == list(range(30, 300))
        tracked = dp.read_table_with_row_ids(spark, root)
        assert sorted(r.k for r in tracked.collect()) == list(range(30, 300))
        anti = _anti_lines(tracked)
        assert anti and not any("Broadcast" in ln for ln in anti)
        dp.delete_where_dv(spark, root, "k >= 290")  # merges w/ existing DV
        assert sorted(
            r.k for r in dp.read_table(spark, root).collect()
        ) == list(range(30, 290))
        assert len(calls) >= 4  # plain read + tracked read + delete filter
    finally:
        spark.conf.set(key, prior)


def test_dv_write_framing_shards_past_threshold(spark, tmp_path, monkeypatch):
    """r13 verdict minor #2: DV framing must not funnel every blob
    through one driver collect — past _DV_FILE_MAX_BYTES the blobs
    hash-shard into MULTIPLE deletion_vector_*.bin files (per-add
    descriptors name their own file+offset, so the read path merges
    them with no change).  Only descriptor rows reach the driver."""
    import glob
    import os

    root = str(tmp_path / "dv_shard")
    df = spark.range(0, 3000).selectExpr("id AS k", "id * 1.0 AS v")
    dp.create_table(df.repartition(6), root)
    monkeypatch.setattr(dp, "_DV_FILE_MAX_BYTES", 64)  # force sharding
    out = dp.delete_where_dv(spark, root, "k % 2 = 0")
    assert out["rows_deleted"] == 1500 and out["files_with_dv"] == 6
    bins = glob.glob(os.path.join(root, "deletion_vector_*.bin"))
    assert len(bins) > 1  # sharded framing, all referenced per-add
    # every descriptor's (file, offset) checksum-verifies via load_dv
    snap = dp.resolve(spark, root)
    referenced = set()
    for a in snap.adds:
        d = a.get("deletionVector")
        assert d and d["storageType"] == "u"
        assert len(dp.load_dv(root, d)) == d["cardinality"]
        referenced.add(os.path.join(root, dp._dv_file_rel(d)))
    assert referenced == set(bins)
    # read path merges shards unchanged: one anti-join, exact rows
    got = dp.read_table(spark, root)
    assert _anti_lines(got) and len(_anti_lines(got)) == 1
    assert sorted(r.k for r in got.collect()) == list(range(1, 3000, 2))
    # second delete merges with existing DVs executor-side and re-shards
    dp.delete_where_dv(spark, root, "k % 3 = 0")
    want = [k for k in range(3000) if k % 2 and k % 3]
    assert sorted(r.k for r in dp.read_table(spark, root).collect()) == want


def test_dv_positions_spill_past_threshold(spark, tmp_path, monkeypatch):
    """r13 (reshaped r14): past _DV_SPILL_POSITIONS total DV cardinality
    the delete side comes back as a parquet SCAN, not inline local
    relations — a 100M-position local relation is a multi-GB plan tree.
    r14: the decode runs EXECUTOR-side (one descriptor row per task,
    load_dv inside mapInPandas) and the scratch write is distributed —
    pinned by a PID-guarded load_dv that raises in the DRIVER process
    and delegates to the real decode in Python workers (cloudpickle
    ships the patched global by value, so the guard travels with the
    closure).  Forced here with a tiny threshold; results identical
    either way."""
    import os

    root = str(tmp_path / "dv_spill")
    df = spark.range(0, 2000).selectExpr("id AS k", "id * 1.0 AS v")
    dp.create_table(df.repartition(2), root)
    dp.delete_where_dv(spark, root, "k % 3 = 0")
    want = sorted(r.k for r in dp.read_table(spark, root).collect())
    monkeypatch.setattr(dp, "_DV_SPILL_POSITIONS", 10)

    driver_pid = os.getpid()
    real_load_dv = dp.load_dv

    def driver_decode_forbidden(*a, **k):
        if os.getpid() == driver_pid:
            raise AssertionError("driver-side DV decode on the spill path")
        return real_load_dv(*a, **k)

    monkeypatch.setattr(dp, "load_dv", driver_decode_forbidden)
    spilled = dp.read_table(spark, root)
    phys = spilled._jdf.queryExecution().executedPlan().toString()
    assert phys.count("FileScan parquet") == 2  # data + spilled DV side
    assert "spark_graft_dv_" in phys  # the delete side is a SCAN
    # the only local relation left is the O(n_files) basename map —
    # no positions ride the plan tree
    assert "positions#" not in phys.split("spark_graft_dv_")[0]
    assert sorted(r.k for r in spilled.collect()) == want


def test_dv_spill_scratch_reused_and_tracked(spark, tmp_path, monkeypatch):
    """r13 advice: the spill scratch must not leak a fresh multi-GB
    tempdir per read — it is keyed by (root, version) for reuse and
    removed at interpreter exit."""
    import os

    root = str(tmp_path / "dv_reuse")
    df = spark.range(0, 500).selectExpr("id AS k", "id * 1.0 AS v")
    dp.create_table(df.repartition(2), root)
    dp.delete_where_dv(spark, root, "k < 100")
    monkeypatch.setattr(dp, "_DV_SPILL_POSITIONS", 10)
    before = dict(dp._DV_SCRATCH)
    dp.read_table(spark, root).count()
    new_keys = set(dp._DV_SCRATCH) - set(before)
    assert len(new_keys) == 1
    (key,) = new_keys
    assert key == (os.path.abspath(root), dp.current_version(root))
    scratch = dp._DV_SCRATCH[key]
    dp.read_table(spark, root).count()  # second read: no new scratch
    assert dp._DV_SCRATCH[key] == scratch
    assert set(dp._DV_SCRATCH) - set(before) == {key}
    # a NEW version gets its own key (old dirs die at exit, not here)
    dp.delete_where_dv(spark, root, "k >= 400")
    dp.read_table(spark, root).count()
    assert len(set(dp._DV_SCRATCH) - set(before)) == 2
    # exit-time cleanup removes the dirs
    dp._cleanup_dv_scratch()
    assert not os.path.isdir(scratch) and not dp._DV_SCRATCH
