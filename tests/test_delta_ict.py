"""Delta IN-COMMIT TIMESTAMPS (PROTOCOL.md "In-Commit Timestamps",
writer feature ``inCommitTimestamp``): every commit on an enabled
table leads with a commitInfo whose timestamp is strictly monotonic,
and TIMESTAMP AS OF resolves against those values — clock-skew-proof,
copy-proof (no file-mtime dependence)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import delta_protocol as dp
from incubator_gluten_spark.sources.delta_protocol import DeltaProtocolError


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k")).coalesce(1)


def _icts(root):
    out = {}
    for v in dp._list_commit_versions(root):
        with open(dp._commit_path(root, v)) as f:
            a = json.loads(f.readline())
        ci = a.get("commitInfo") or {}
        if "inCommitTimestamp" in ci:
            out[v] = ci["inCommitTimestamp"]
    return out


def test_enabled_at_create_stamps_every_commit(spark, tmp_path):
    root = str(tmp_path / "ict")
    dp.create_table(
        _mk(spark, 0, 10),
        root,
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    dp.append(_mk(spark, 10, 20), root)
    dp.append(_mk(spark, 20, 30), root)
    icts = _icts(root)
    assert sorted(icts) == [0, 1, 2]
    vals = [icts[v] for v in sorted(icts)]
    assert vals == sorted(vals) and len(set(vals)) == 3  # strictly up
    snap = dp.resolve(spark, root)
    assert "inCommitTimestamp" in snap.protocol["writerFeatures"]
    assert snap.protocol["minWriterVersion"] == 7


def test_timestamp_as_of_travel(spark, tmp_path):
    root = str(tmp_path / "ict_travel")
    dp.create_table(
        _mk(spark, 0, 10),
        root,
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    dp.append(_mk(spark, 10, 20), root)
    dp.append(_mk(spark, 20, 30), root)
    icts = _icts(root)
    assert dp.version_at_timestamp(root, icts[1]) == 1
    assert dp.version_at_timestamp(root, icts[2] - 1) == 1
    assert dp.version_at_timestamp(root, icts[2] + 10**6) == 2
    assert dp.read_table(spark, root, timestamp_ms=icts[1]).count() == 20
    with pytest.raises(DeltaProtocolError, match="precedes the first"):
        dp.version_at_timestamp(root, icts[0] - 1)
    with pytest.raises(ValueError, match="not both"):
        dp.read_table(spark, root, version=1, timestamp_ms=icts[1])


def test_enable_on_existing_table(spark, tmp_path):
    root = str(tmp_path / "ict_alter")
    dp.create_table(_mk(spark, 0, 10), root)  # legacy, unstamped
    dp.append(_mk(spark, 10, 20), root)
    v = dp.enable_in_commit_timestamps(spark, root)
    dp.append(_mk(spark, 20, 30), root)
    icts = _icts(root)
    # pre-enablement commits have no ICT; enablement + later do
    assert sorted(icts) == [v, v + 1]
    snap = dp.resolve(spark, root)
    cfg = snap.metadata["configuration"]
    assert cfg["delta.inCommitTimestampEnablementVersion"] == str(v)
    assert "appendOnly" in snap.protocol["writerFeatures"]  # legacy-implied
    # timestamps before enablement refuse (no mtime fallback)
    with pytest.raises(DeltaProtocolError, match="precedes the first"):
        dp.version_at_timestamp(root, icts[v] - 1)
    assert dp.read_table(spark, root, timestamp_ms=icts[v]).count() == 20
    # idempotent enable
    assert dp.enable_in_commit_timestamps(spark, root) == dp.resolve(
        spark, root
    ).version


def test_untracked_tables_stay_unstamped(spark, tmp_path):
    root = str(tmp_path / "no_ict")
    dp.create_table(_mk(spark, 0, 10), root)
    dp.append(_mk(spark, 10, 20), root)
    assert _icts(root) == {}
    with pytest.raises(DeltaProtocolError, match="no in-commit"):
        dp.version_at_timestamp(root, 10**15)


def test_metadata_cleanup_keeps_walkers_bounded(spark, tmp_path):
    """PROTOCOL.md metadata cleanup (r11 verdict directive #6): commit
    JSONs behind the checkpoint are removed, time travel behind the
    horizon refuses with the vacuumed-log error, TIMESTAMP AS OF
    inside the horizon stays exact, and behind it refuses with the
    enablement-boundary error."""
    root = str(tmp_path / "ict_cleanup")
    dp.create_table(
        _mk(spark, 0, 10),
        root,
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    with pytest.raises(DeltaProtocolError, match="checkpoint"):
        dp.cleanup_expired_logs(root)  # nothing to reconstruct from yet
    dp.append(_mk(spark, 10, 20), root)   # v1
    dp.append(_mk(spark, 20, 30), root)   # v2
    dp.checkpoint(spark, root)            # checkpoint at v2
    dp.append(_mk(spark, 30, 40), root)   # v3
    icts_before = _icts(root)
    out = dp.cleanup_expired_logs(root)
    assert out == {"removed_commits": 2, "earliest_version": 2}
    # on disk: only the checkpoint-covered suffix remains
    assert dp._list_commit_versions(root) == [2, 3]
    # current + retained time travel read exactly
    assert dp.read_table(spark, root).count() == 40
    assert dp.read_table(spark, root, version=2).count() == 30
    # behind the horizon: the spec's vacuumed-log refusal
    with pytest.raises(ValueError, match="vacuumed"):
        dp.read_table(spark, root, version=1)
    # ICT lookup inside the horizon is still exact
    assert dp.version_at_timestamp(root, icts_before[3]) == 3
    assert dp.version_at_timestamp(root, icts_before[2]) == 2
    # behind it: the enablement-boundary refusal (horizon = first
    # surviving ICT)
    with pytest.raises(DeltaProtocolError, match="precedes the first"):
        dp.version_at_timestamp(root, icts_before[2] - 1)
    # a second cleanup is a no-op
    assert dp.cleanup_expired_logs(root)["removed_commits"] == 0
