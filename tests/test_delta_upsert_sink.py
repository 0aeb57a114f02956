"""Delta streaming CDC-UPSERT sink (delta_protocol.merge_stream_batch):
per-batch MERGE (update_all / insert_all / flagged deletes) with the
protocol's txn action committed atomically in the merge's version —
foreachBatch replays NO-OP.  The Delta twin of
iceberg_v2.merge_mor_stream_batch.

Reference analog: Delta's documented foreachBatch-upsert pattern
(MERGE + txn idempotence); gluten-delta scans the merged tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import delta_protocol as dp


def _mk(spark, rows, ddl="k bigint, v string"):
    return spark.createDataFrame(rows, ddl).coalesce(1)


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "delta_upsert")
    dp.create_table(_mk(spark, [(1, "a"), (2, "b")]), root)
    return root


def _vals(spark, root):
    return sorted(map(tuple, dp.read_table(spark, root).collect()))


def test_upsert_batches_and_replay_noop(table, spark):
    assert dp.merge_stream_batch(
        spark, _mk(spark, [(2, "b2"), (3, "c")]), table, "k", "app", 0
    )
    assert _vals(spark, table) == [(1, "a"), (2, "b2"), (3, "c")]
    assert dp.merge_stream_batch(
        spark, _mk(spark, [(1, "a2")]), table, "k", "app", 1
    )
    # replay of batch 1 (and anything below) no-ops
    assert not dp.merge_stream_batch(
        spark, _mk(spark, [(1, "SHOULD_NOT_LAND")]), table, "k", "app", 1
    )
    assert not dp.merge_stream_batch(
        spark, _mk(spark, [(9, "SHOULD_NOT_LAND")]), table, "k", "app", 0
    )
    assert _vals(spark, table) == [(1, "a2"), (2, "b2"), (3, "c")]
    # a different app id has its own checkpoint lane
    assert dp.merge_stream_batch(
        spark, _mk(spark, [(4, "d")]), table, "k", "other", 0
    )
    assert (4, "d") in _vals(spark, table)


def test_txn_marker_is_atomic_with_the_merge(table, spark):
    dp.merge_stream_batch(spark, _mk(spark, [(3, "c")]), table, "k", "app", 7)
    v = dp.current_version(table)
    acts = dp._read_commit_actions(table, v)
    kinds = {next(iter(a)) for a in acts}
    assert "txn" in kinds and "add" in kinds  # one commit carries both
    snap = dp.resolve(spark, table)
    assert snap.txns["app"] == 7


def test_delete_flag_column(table, spark):
    batch = _mk(
        spark,
        [(1, "x", True), (2, "b2", False), (5, "e", False), (6, "z", True)],
        "k bigint, v string, _deleted boolean",
    )
    assert dp.merge_stream_batch(
        spark, batch, table, "k", "cdc", 0, delete_col="_deleted"
    )
    # 1 deleted, 2 updated, 5 inserted, 6 (delete of absent key) ignored
    assert _vals(spark, table) == [(2, "b2"), (5, "e")]
    with pytest.raises(dp.DeltaProtocolError, match="missing from batch"):
        dp.merge_stream_batch(
            spark, _mk(spark, [(7, "g")]), table, "k", "cdc", 1,
            delete_col="_deleted",
        )


def test_engine_driven_stream(spark, tmp_path):
    root = str(tmp_path / "delta_upsert_stream")
    src_dir = str(tmp_path / "src")
    feed = spark.range(40).select(
        (F.col("id") % 10).alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    feed.repartition(4).write.parquet(src_dir)
    dp.create_table(feed.limit(0), root)

    def write_batch(batch_df, batch_id):
        src = batch_df.groupBy("k").agg(F.max("v").alias("v"))
        dp.merge_stream_batch(spark, src, root, "k", "eng", batch_id)

    sq = (
        spark.readStream.schema(feed.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
        .writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    t = dp.read_table(spark, root)
    assert t.count() == 10  # exactly one row per key, whatever the split
    assert t.filter(~F.col("v").startswith("v")).count() == 0
