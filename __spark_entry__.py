"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Everything is sourced from ``incubator_gluten_spark.plans.collect_all()``:
one Q per implemented SURVEY §2 capability row, each carrying its PySpark
builder and (where SQL-expressible) its DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H q1: scan -> filter -> two-phase hash agg)
    on /root/testdata/sf0.001; driver checks rows>0 and a stable schema."""
    from incubator_gluten_spark.plans import collect_all

    q1 = collect_all()["q1"]
    return q1.build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from incubator_gluten_spark.plans import collect_all

    return {name: q.build for name, q in collect_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for every SQL-expressible query; non-SQL ops
    (custom stateful streaming, LSH pipelines) omit theirs -> rows-only."""
    from incubator_gluten_spark.plans import collect_all

    return {name: q.oracle for name, q in collect_all().items() if q.oracle}
