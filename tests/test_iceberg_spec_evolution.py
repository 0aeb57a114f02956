"""Iceberg PARTITION SPEC EVOLUTION (spec "Partition Evolution"):
evolving the spec is metadata-only, old manifests keep their spec-id
and prune under THEIR spec, new writes land under the new spec, ids
never collide across specs, partition-source renames update every
historical spec, mixed-spec deletes re-state per-spec manifests."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from incubator_gluten_spark.sources import iceberg_format as ice


def _rows(df):
    return sorted(map(tuple, df.collect()), key=lambda t: tuple(map(str, t)))


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, ts timestamp, grp string"
    ).coalesce(1)


_D = dt.datetime


@pytest.fixture()
def table(spark, tmp_path):
    """grp-partitioned table (spec 0), then evolved to day(ts) (spec 1)
    with a second snapshot under the new layout."""
    root = str(tmp_path / "specevo")
    ice.create_table(
        _mk(
            spark,
            [(1, _D(2024, 1, 1), "a"), (2, _D(2024, 1, 2), "b")],
        ),
        root,
        partition_cols=["grp"],
    )
    ice.evolve_partition_spec(root, ["day(ts)"])
    ice.append(
        _mk(spark, [(3, _D(2024, 1, 3), "a"), (4, _D(2024, 1, 4), "b")]),
        root,
    )
    return root


def test_evolution_is_metadata_only_and_specs_accumulate(table, spark):
    meta = ice._current_metadata(table)
    assert [s["spec-id"] for s in meta["partition-specs"]] == [0, 1]
    assert meta["default-spec-id"] == 1
    # partition field ids never collide across specs
    ids = [
        pf["field-id"] for sp in meta["partition-specs"] for pf in sp["fields"]
    ]
    assert len(ids) == len(set(ids))
    # old files keep the old layout, new files the new one
    files = ice.plan_files(table)
    by_spec = {}
    for f in files:
        by_spec.setdefault(f["_spec_id"], []).append(f)
    assert set(by_spec) == {0, 1}
    assert all("grp" in f["partition"] for f in by_spec[0])
    assert all("ts_day" in f["partition"] for f in by_spec[1])
    # the full read unions both generations
    assert len(_rows(ice.read_table(spark, table))) == 4


def test_predicate_prunes_new_spec_keeps_old_conservatively(table, spark):
    files = ice.plan_files(table)
    n_old = sum(1 for f in files if f["_spec_id"] == 0)
    # a ts predicate: old-spec files are not ts-PARTITIONED, so the
    # transform path keeps them — pre-r12 that meant all kept; now
    # their COLUMN BOUNDS prune the ones provably outside the range
    # (the read-exactness assert below is the soundness check); new-spec
    # files prune by their day tuple
    preds = [("ts", ">=", _D(2024, 1, 4))]
    pruned = ice.plan_files(table, source_predicates=preds)
    assert sum(1 for f in pruned if f["_spec_id"] == 0) <= n_old
    assert sum(1 for f in pruned if f["_spec_id"] == 1) == 1
    # and the read stays EXACT through the residual filter
    got = ice.read_table(spark, table, source_predicates=preds)
    assert [r.k for r in got.collect()] == [4]
    # a grp predicate prunes OLD-spec files via their grp partition
    # tuple, and new-spec files (day-partitioned, not by grp) via their
    # r12 column bounds — exactness asserted below either way
    gpruned = ice.plan_files(table, source_predicates=[("grp", "=", "a")])
    assert sum(1 for f in gpruned if f["_spec_id"] == 0) < n_old
    assert 1 <= sum(1 for f in gpruned if f["_spec_id"] == 1) <= 2
    got = ice.read_table(
        spark, table, source_predicates=[("grp", "=", "a")]
    )
    assert sorted(r.k for r in got.collect()) == [1, 3]


def test_partition_source_rename_updates_all_specs(table, spark):
    ice.rename_column(table, "grp", "bucket_name")
    meta = ice._current_metadata(table)
    spec0 = next(s for s in meta["partition-specs"] if s["spec-id"] == 0)
    assert spec0["fields"][0]["name"] == "bucket_name"
    # pruning by the NEW name still reaches the OLD manifests (tuples
    # keyed by the old name resolve via source-id aliasing)
    pruned = ice.plan_files(
        table, source_predicates=[("bucket_name", "=", "a")]
    )
    assert sum(1 for f in pruned if f["_spec_id"] == 0) == 1
    got = ice.read_table(
        spark, table, source_predicates=[("bucket_name", "=", "a")]
    )
    assert sorted(r.k for r in got.collect()) == [1, 3]


def test_delete_partition_restates_per_spec_manifests(table, spark):
    # delete one NEW-spec partition; both generations must survive the
    # re-statement under their own avro partition schemas
    day = (dt.date(2024, 1, 3) - dt.date(1970, 1, 1)).days
    out = ice.delete_partition(table, {"ts_day": day})
    assert out["files_deleted"] == 1
    assert sorted(
        r.k for r in ice.read_table(spark, table).collect()
    ) == [1, 2, 4]
    # old-spec partition delete still works after evolution
    out = ice.delete_partition(table, {"grp": "a"})
    assert sorted(
        r.k for r in ice.read_table(spark, table).collect()
    ) == [2, 4]


def test_drop_partition_source_of_any_spec_refuses(table):
    with pytest.raises(ValueError, match="partition source"):
        ice.drop_column(table, "grp")  # spec 0's source
    with pytest.raises(ValueError, match="partition source"):
        ice.drop_column(table, "ts")  # spec 1's source
