"""Custom relational operators Spark's API lacks, composed from built-ins.

The brief's canonical examples — as-of join, range join — are here, each
expressed as a composition of existing DataFrame ops (shuffle/sort/window
or banded equi-join) rather than a Python kernel, so they inherit codegen,
AQE and spill behavior.
"""

from incubator_gluten_spark.operators.joins import asof_join, range_join

__all__ = ["asof_join", "range_join"]
