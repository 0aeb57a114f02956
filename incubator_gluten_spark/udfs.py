"""UDF / UDAF / UDTF surface (SURVEY §2.12).

The reference loads native C++ UDFs (cpp/velox/udf/UdfLoader.cc) and remaps
Hive/Scala UDF names onto native functions (UDFMappings.scala:32-76). The
PySpark-native analogs, in preference order:

1. built-in functions               — always first choice (JVM, codegen)
2. @pandas_udf / applyInPandas      — Arrow-batched, vectorized Python
3. F.udf (row-at-a-time)            — last resort, 10-100x slower
4. @udtf                            — table functions (Generate analog)

`with_pandas_columns` mirrors ColumnarPartialProjectExec.scala:56 /
docs/developers/PartialProject.md: when one output column needs Python,
evaluate ONLY that column's pruned inputs through Arrow and keep every
other expression JVM-side, instead of dragging the whole row through
Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType


# ---------------------------------------------------------------- kernels

@F.pandas_udf(DoubleType())
def net_price(extended: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) net price kernel."""
    return extended * (1.0 - discount) * (1.0 + tax)


@F.pandas_udf(StringType())
def qty_band(qty: pd.Series) -> pd.Series:
    """Vectorized banding kernel."""
    return pd.cut(
        qty, bins=[-float("inf"), 10, 30, float("inf")], labels=["low", "mid", "high"]
    ).astype(str)


def line_desc(flag, qty):
    """Row-at-a-time Python UDF body — deliberately the slow path, kept for
    API parity (EvalPythonExecTransformer.scala:35 analog). (No type hints:
    F.udf warns when it can't map scalar hints to an eval type.)"""
    return f"{flag}:{int(qty)}"


line_desc_udf = F.udf(line_desc, StringType())


def register_udfs(spark: SparkSession) -> None:
    """Name-registration surface (UDFMappings.scala analog): makes the
    kernels callable from SQL text."""
    spark.udf.register("net_price", net_price)
    spark.udf.register("qty_band", qty_band)
    spark.udf.register("line_desc", line_desc_udf)


# ------------------------------------------------------- partial project

def with_pandas_columns(df: DataFrame, **udf_cols: Column) -> DataFrame:
    """PartialProject analog: append pandas-UDF columns while keeping the
    rest of the projection JVM-side.

    Spark already plans exactly this split (ArrowEvalPython node receives
    only the attributes the UDFs reference — column pruning does the input
    minimization), so the helper's job is to keep UDF expressions isolated
    in one place and out of join/filter hot paths."""
    out = df
    for name, col in udf_cols.items():
        out = out.withColumn(name, col)
    return out


# ---------------------------------------------------------------- UDTF

def make_word_splitter():
    """Python UDTF (Generate/UnnestNode analog, SURVEY §2.12): one input
    string -> one row per word with its position."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string")
    class WordSplitter:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split(" ")):
                yield i, w

    return WordSplitter
