"""Differential test over the full query inventory.

One parametrized case per registered Q: run the PySpark builder and its
DuckDB oracle twin on the same parquet fixtures, compare row count, schema
and order-insensitive values — the repo-local mirror of the driver's t2
gate and of the reference's differential strategy (SURVEY §5,
WholeStageTransformerSuite.compareResultStr).

Queries without an oracle (non-SQL-expressible) get a rows-run smoke check.
"""

from __future__ import annotations

import pytest

from incubator_gluten_spark.plans import collect_all
from incubator_gluten_spark.testing.compare import compare_frames

ALL = collect_all()


def test_front_window_names_all_registered():
    """Every curated _FRONT name must exist in the merged registry — a
    typo/rename must fail loudly, not silently demote the entry out of
    the driver's graded 50-entry window (collect_all raises, this pins
    the behavior and the window size)."""
    from incubator_gluten_spark.plans import _FRONT

    assert len(_FRONT) == 50
    assert len(set(_FRONT)) == 50
    assert list(ALL)[:50] == list(_FRONT)


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = ALL[name]
    df = q.build(spark, sf_dir)
    if q.oracle is None:
        # rows-only smoke: materializes without error, schema is stable
        n = df.count()
        assert n >= 0
        assert df.columns
    else:
        compare_frames(df, duck, q.oracle)
