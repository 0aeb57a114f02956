"""q21 window form == EXISTS/NOT-EXISTS subquery form (r14 verdict #3 pin).

The r15 rewrite evaluates q21's EXISTS + NOT EXISTS pair as per-order
window aggregates over ONE lineitem scan (was: 3 scans + a semi and an
anti shuffle).  This pin runs BOTH forms over a fixture that forces every
equivalence branch of the rewrite:

* o1  max attained by TWO suppliers (tie): both probe rows survive;
* o2  SOLE top supplier with several rows >= the best other-supplier row,
      including the exact q == m2 equality (NOT EXISTS is *strictly*
      greater, so equality survives);
* o3  sole top supplier with an intermediate row between m2 and m1;
* o4  single-supplier order: EXISTS fails, nothing survives;
* o5  duplicate max quantities inside one supplier + a second attaining
      supplier: every duplicate row counts;
* o6  non-F order: excluded by the orders join, not by the window;
* o7  tie where one attaining supplier is in another nation: the window
      must still see its row (the subqueries are over ALL lineitem), the
      nation filter only trims the final count.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _write_fixture(spark, root: str) -> None:
    li = spark.createDataFrame(
        [
            # o1: tie at max 10.0 between s1 and s2
            (1, 1, 10.0), (1, 2, 10.0), (1, 1, 5.0),
            # o2: sole top s1 (10), m2 = 8 (s2); s1 rows 10 and 8 survive
            (2, 1, 10.0), (2, 1, 8.0), (2, 1, 7.0), (2, 2, 8.0),
            # o3: sole top s1; s1's 9 sits between m2=8 and m1=10
            (3, 1, 10.0), (3, 1, 9.0), (3, 2, 8.0),
            # o4: single supplier
            (4, 3, 7.0),
            # o5: duplicate maxes within s2 + attaining s3
            (5, 2, 6.0), (5, 2, 6.0), (5, 3, 6.0),
            # o6: status-O order (window sees it, orders join drops it)
            (6, 4, 99.0), (6, 1, 1.0),
            # o7: tie between s1 and s5 (s5 is another nation)
            (7, 1, 9.0), (7, 5, 9.0),
        ],
        "l_orderkey long, l_suppkey long, l_quantity double",
    )
    orders = spark.createDataFrame(
        [(1, "F"), (2, "F"), (3, "F"), (4, "F"), (5, "F"), (6, "O"), (7, "F")],
        "o_orderkey long, o_orderstatus string",
    )
    supplier = spark.createDataFrame(
        [(i, f"Supplier#{i}", 4 if i != 5 else 9) for i in range(1, 6)],
        "s_suppkey long, s_name string, s_nationkey long",
    )
    nation = spark.createDataFrame(
        [(4, "NATION_4"), (9, "NATION_9")],
        "n_nationkey long, n_name string",
    )
    li.write.parquet(f"{root}/lineitem.parquet")
    orders.write.parquet(f"{root}/orders.parquet")
    supplier.write.parquet(f"{root}/supplier.parquet")
    nation.write.parquet(f"{root}/nation.parquet")


def _q21_subquery_form(spark, sf_dir: str):
    """The pre-r15 semi+anti reference implementation, verbatim."""
    from incubator_gluten_spark.plans.tpch import _t

    supplier, li, orders, nation = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "nation"
    )
    l1 = li.select(
        F.col("l_orderkey").alias("l1_orderkey"),
        F.col("l_suppkey").alias("l1_suppkey"),
        F.col("l_quantity").alias("l1_quantity"),
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_quantity").alias("l3_quantity"),
    )
    base = (
        l1.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l1_orderkey"),
        )
        .join(supplier, F.col("s_suppkey") == F.col("l1_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_4")
    )
    with_other = base.join(
        l2,
        (F.col("l2_orderkey") == F.col("l1_orderkey"))
        & (F.col("l2_suppkey") != F.col("l1_suppkey")),
        "left_semi",
    )
    sole_max = with_other.join(
        l3,
        (F.col("l3_orderkey") == F.col("l1_orderkey"))
        & (F.col("l3_suppkey") != F.col("l1_suppkey"))
        & (F.col("l3_quantity") > F.col("l1_quantity")),
        "left_anti",
    )
    return (
        sole_max.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("q21_fixture"))
    _write_fixture(spark, root)
    return root


def test_q21_window_form_equals_subquery_form(spark, fixture_dir):
    from incubator_gluten_spark.plans import collect_all

    new = collect_all()["q21"].build(spark, fixture_dir).collect()
    old = _q21_subquery_form(spark, fixture_dir).collect()
    assert sorted(map(tuple, new)) == sorted(map(tuple, old))
    # hand-computed expectation (see module docstring): s1 counts o1(10),
    # o2(10, 8), o3(10, 9), o7(9); s2 counts o1(10), o5(6, 6); s3 o5(6)
    assert sorted(map(tuple, new)) == [
        ("Supplier#1", 6), ("Supplier#2", 3), ("Supplier#3", 1),
    ]


def test_q21_window_form_equals_subquery_form_at_sf(spark, sf_dir):
    from incubator_gluten_spark.plans import collect_all

    new = collect_all()["q21"].build(spark, sf_dir).collect()
    old = _q21_subquery_form(spark, sf_dir).collect()
    assert sorted(map(tuple, new)) == sorted(map(tuple, old))


def test_q21_scans_lineitem_once(spark, sf_dir):
    from incubator_gluten_spark.plans import collect_all

    df = collect_all()["q21"].build(spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(jmode)
    assert plan.count("lineitem.parquet") == 1
