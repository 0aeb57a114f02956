"""Query inventory registry.

Every capability row in SURVEY.md §2 is represented by at least one named
query: a PySpark builder plus (where SQL-expressible) a DuckDB oracle twin.
The driver runs both at sf0.01 and hash-compares — the same differential
protocol the reference uses against vanilla Spark (SURVEY §5).

Conventions that keep the cross-engine value-hash stable:
* every computed float column is round()-ed (money: 2dp, ratios/avgs: 4-6dp)
  in BOTH the Spark plan and the oracle SQL;
* every LIMIT query carries a total order with a unique tie-breaker column;
* column aliases match exactly between the two sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Q:
    """One inventory entry: Spark builder + optional DuckDB oracle SQL."""

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)


_PLAN_MODULES = (
    "tpch",
    "operators_queries",
    "functions_queries",
    "datapipe_queries",
    "streaming_queries",
    "sources_queries",
    "udf_queries",
    "clickbench_queries",
    "tpcds_queries",
)


def collect_all() -> dict[str, Q]:
    """Merge every plan module's registry (import here to avoid cycles).

    Modules are imported defensively so a not-yet-landed (or locally broken)
    plan module never takes down the whole inventory — mirrors the
    reference's per-suite opt-outs (BackendTestSettings.scala).
    """
    import importlib

    merged: dict[str, Q] = {}
    for mod_name in _PLAN_MODULES:
        try:
            mod = importlib.import_module(f"incubator_gluten_spark.plans.{mod_name}")
        except ImportError:
            continue
        for q in getattr(mod, "REGISTRY", []):
            if q.name in merged:
                raise ValueError(f"duplicate query name: {q.name}")
            merged[q.name] = q
    return merged
