"""Exactly-once streaming sinks into the Iceberg and Hudi wire formats
(checkpoint-in-metadata idempotence: Iceberg snapshot summary keys,
Hudi commit extraMetadata deltastreamer.checkpoint.key — each format's
own mechanism)."""

from __future__ import annotations

import json
import os

import pytest

from incubator_gluten_spark.sources import hudi_format as hf
from incubator_gluten_spark.sources import iceberg_format as ice


def _rows(df):
    return sorted(map(tuple, df.collect()), key=lambda t: tuple(map(str, t)))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v double").coalesce(1)


def test_iceberg_stream_batch_idempotence(spark, tmp_path):
    root = str(tmp_path / "ice_sink")
    ice.create_table(_mk(spark, [(0, 0.0)]), root)
    assert ice.append_stream_batch(_mk(spark, [(1, 1.0)]), root, "app", 0)
    n = ice.read_table(spark, root).count()
    # replay of batch 0 must commit NOTHING
    assert not ice.append_stream_batch(_mk(spark, [(1, 1.0)]), root, "app", 0)
    assert ice.read_table(spark, root).count() == n
    # the next batch commits; the checkpoint rides in the summary
    assert ice.append_stream_batch(_mk(spark, [(2, 2.0)]), root, "app", 1)
    meta = ice._current_metadata(root)
    last = meta["snapshots"][-1]["summary"]
    assert last["streaming-app"] == "app" and last["batch-id"] == "1"
    # a DIFFERENT app's batch 0 is independent
    assert ice.append_stream_batch(_mk(spark, [(3, 3.0)]), root, "other", 0)
    assert ice.read_table(spark, root).count() == n + 2


def test_hudi_stream_batch_idempotence(spark, tmp_path):
    root = str(tmp_path / "hudi_sink")
    hf.create_table(_mk(spark, [(0, 0.0)]), root, key_col="k")
    assert hf.append_stream_batch(
        spark, _mk(spark, [(1, 1.0)]), root, "k", "app", 0
    )
    want = _rows(hf.read_table(spark, root))
    assert not hf.append_stream_batch(
        spark, _mk(spark, [(1, 999.0)]), root, "k", "app", 0
    )
    assert _rows(hf.read_table(spark, root)) == want  # replay is a no-op
    assert hf.append_stream_batch(
        spark, _mk(spark, [(1, 10.0)]), root, "k", "app", 1
    )
    got = {r.k: r.v for r in hf.read_table(spark, root).collect()}
    assert got == {0: 0.0, 1: 10.0}  # batch 1 UPSERTED key 1
    # the checkpoint key is in the commit's extraMetadata
    last = hf.completed_instants(root)[-1]
    with open(os.path.join(hf._timeline_dir(root), f"{last}.commit")) as f:
        body = json.load(f)
    assert body["extraMetadata"]["deltastreamer.checkpoint.key"] == "app:1"
