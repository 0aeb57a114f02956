"""UDF-surface inventory entries (SURVEY §2.12).

Every entry computes something the oracle can also express in plain SQL,
so the differential gate certifies the Python/Arrow boundary returns
exactly what the JVM would: pandas UDF batches, row-at-a-time UDFs,
SQL-registered names, UDTF lateral joins, grouped applyInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_gluten_spark.catalog import load_tables, register_views
from incubator_gluten_spark.plans import Q
from incubator_gluten_spark.udfs import (
    line_desc_udf,
    make_word_splitter,
    net_price,
    qty_band,
    register_udfs,
    with_pandas_columns,
)


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tables = load_tables(spark, sf_dir, names)
    return [tables[n] for n in names]


REGISTRY: list[Q] = []


def q(name: str, oracle: str | None, *tags: str):
    def deco(fn):
        REGISTRY.append(Q(name, fn, oracle, tags))
        return fn

    return deco


@q(
    "udf_pandas_vectorized",
    """
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS revenue,
           count(*) AS n
    FROM lineitem WHERE l_orderkey < 2000 GROUP BY l_returnflag
    """,
    "udf", "pandas",
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas UDF in an aggregation pipeline."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") < 2000)
        .withColumn("np", net_price("l_extendedprice", "l_discount", "l_tax"))
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("np"), 2).alias("revenue"), F.count("*").alias("n"))
    )


@q(
    "udf_python_row",
    """
    SELECT l_returnflag || ':' || CAST(CAST(l_quantity AS INT) AS VARCHAR) AS line_desc,
           count(*) AS n
    FROM lineitem WHERE l_orderkey < 500 GROUP BY 1
    """,
    "udf", "python",
)
def udf_python_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the deliberate slow path, exercised on a
    pruned subset only (never in a hot loop at scale)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") < 500)
        .select(line_desc_udf("l_returnflag", "l_quantity").alias("line_desc"))
        .groupBy("line_desc")
        .agg(F.count("*").alias("n"))
    )


@q(
    "udf_registered_sql",
    """
    SELECT CASE WHEN l_quantity <= 10 THEN 'low'
                WHEN l_quantity <= 30 THEN 'mid' ELSE 'high' END AS band,
           round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS revenue
    FROM lineitem WHERE l_orderkey < 2000 GROUP BY 1
    """,
    "udf", "register",
)
def udf_registered_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.udf.register + SQL-text invocation (UDFMappings analog)."""
    register_udfs(spark)
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT qty_band(l_quantity) AS band,
               round(sum(net_price(l_extendedprice, l_discount, l_tax)), 2) AS revenue
        FROM lineitem WHERE l_orderkey < 2000 GROUP BY 1
        """
    )


@q(
    "udf_udtf_lateral",
    """
    SELECT pos, count(*) AS n, count(DISTINCT word) AS n_words
    FROM (
      SELECT generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
             unnest(string_split(text, ' ')) AS word
      FROM documents WHERE doc_id < 100
    )
    WHERE pos < 5 GROUP BY pos
    """,
    "udf", "udtf",
)
def udf_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in a LATERAL join (Generate analog through the Python
    table-function surface)."""
    splitter = make_word_splitter()
    spark.udtf.register("word_splitter", splitter)
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT pos, count(*) AS n, count(DISTINCT word) AS n_words
        FROM documents, LATERAL word_splitter(text)
        WHERE doc_id < 100 AND pos < 5
        GROUP BY pos
        """
    )


@q(
    "udf_partial_project",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)), 2)
                AS DOUBLE)                                                    AS disc_price,
           CAST(round(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                           AS DECIMAL(18,6)), 2) AS DOUBLE)                   AS net,
           CASE WHEN l_quantity <= 10 THEN 'low'
                WHEN l_quantity <= 30 THEN 'mid' ELSE 'high' END              AS band
    FROM lineitem WHERE l_orderkey < 300
    """,
    "udf", "partial-project",
)
def udf_partial_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed projection: disc_price stays JVM-side, net + band go through
    one Arrow batch each (ColumnarPartialProjectExec.scala:56 analog —
    Spark's ArrowEvalPython node receives only the pruned UDF inputs)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_orderkey") < 300)

    def money(col: F.Column) -> F.Column:
        # per-row money rounding: go through DECIMAL(18,6) first — Spark
        # rounds doubles on their shortest decimal repr while DuckDB uses
        # the binary value, and the extra decimal step aligns the two
        return F.round(col.cast("decimal(18,6)"), 2).cast("double")

    out = with_pandas_columns(
        base,
        net=money(net_price("l_extendedprice", "l_discount", "l_tax")),
        band=qty_band("l_quantity"),
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        money(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        "net",
        "band",
    )


@q(
    "udf_grouped_apply",
    """
    SELECT l_returnflag, l_orderkey, l_linenumber,
           round((l_quantity - avg(l_quantity) OVER (PARTITION BY l_returnflag))
                 / stddev_samp(l_quantity) OVER (PARTITION BY l_returnflag), 4) AS zscore
    FROM lineitem WHERE l_orderkey < 300
    """,
    "udf", "grouped-map",
)
def udf_grouped_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-group z-score computed in pandas,
    certified against the window-function formulation."""
    import pandas as pd

    (li,) = _t(spark, sf_dir, "lineitem")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["l_quantity"].mean()
        sd = pdf["l_quantity"].std(ddof=1)
        return pd.DataFrame(
            {
                "l_returnflag": pdf["l_returnflag"],
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "zscore": ((pdf["l_quantity"] - mu) / sd).round(4),
            }
        )

    return (
        li.filter(F.col("l_orderkey") < 300)
        .groupBy("l_returnflag")
        .applyInPandas(
            zscore,
            schema="l_returnflag string, l_orderkey bigint, l_linenumber int, zscore double",
        )
    )


@q(
    "udf_map_in_arrow",
    """
    SELECT l_returnflag,
           CAST(round(sum(round(CAST(l_extendedprice * (1.0 - l_discount)
                                     AS DECIMAL(18,6)), 2)), 2) AS DOUBLE) AS net_total,
           count(*) AS n
    FROM lineitem WHERE l_orderkey < 2000 GROUP BY l_returnflag
    """,
    "udf", "arrow",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy sibling of mapInPandas — the kernel sees
    raw pyarrow RecordBatches (no pandas conversion), the right boundary
    for numeric kernels at scale. Computes per-row net price in pyarrow
    compute, then aggregates JVM-side."""
    import pyarrow as pa
    import pyarrow.compute as pc

    (li,) = _t(spark, sf_dir, "lineitem")
    src = li.filter(F.col("l_orderkey") < 2000).select(
        "l_returnflag", "l_extendedprice", "l_discount"
    )

    def kernel(batches):
        # raw IEEE multiply only — rounding happens JVM-side through the
        # decimal route (pyarrow's pc.round is half-to-even, which would
        # diverge from SQL's rounding at .xx5 boundaries)
        for batch in batches:
            net = pc.multiply(
                batch.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_returnflag"), net], ["l_returnflag", "net"]
            )

    out = src.mapInArrow(kernel, "l_returnflag string, net double")
    net2 = F.round(F.col("net").cast("decimal(18,6)"), 2)
    return out.groupBy("l_returnflag").agg(
        F.round(F.sum(net2), 2).cast("double").alias("net_total"),
        F.count("*").alias("n"),
    )


@q(
    "udf_window_in_pandas",
    """
    SELECT l_orderkey, l_linenumber,
           round(avg(l_quantity) OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 4)
             AS frame_avg
    FROM lineitem WHERE l_orderkey < 300
    """,
    "udf", "window-in-pandas",
)
def udf_window_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WindowInPandas (the support-matrix row the reference can NOT
    offload, docs/velox-backend-support-progress.md:79-83): a pandas UDF
    evaluated over a window frame — Arrow ships each frame's column to the
    Python worker. Numerically the frame is integer-valued quantities, so
    the pandas mean matches SQL avg exactly."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from pyspark.sql.functions import PandasUDFType

    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def frame_mean(v):
        return float(v.mean())

    from pyspark.sql import Window as W

    (li,) = _t(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        li.filter(F.col("l_orderkey") < 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(frame_mean("l_quantity").over(w), 4).alias("frame_avg"),
        )
    )


@q(
    "udf_agg_in_pandas",
    """
    SELECT l_returnflag, round(avg(l_quantity), 4) AS mean_qty,
           round(max(l_quantity) - min(l_quantity), 4) AS qty_range
    FROM lineitem WHERE l_orderkey < 2000 GROUP BY l_returnflag
    """,
    "udf", "agg-in-pandas",
)
def udf_agg_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregateInPandas (support-matrix row not offloaded by the
    reference): GROUPED_AGG pandas UDFs inside groupBy().agg() — each
    group's column arrives as one Arrow batch. Integer-valued quantities
    make the pandas mean exactly equal SQL avg."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def mean_qty(v):
        return float(v.mean())

    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def qty_range(v):
        return float(v.max() - v.min())

    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") < 2000)
        .groupBy("l_returnflag")
        .agg(
            F.round(mean_qty("l_quantity"), 4).alias("mean_qty"),
            F.round(qty_range("l_quantity"), 4).alias("qty_range"),
        )
    )


@q(
    "udf_scalar_iter",
    """
    SELECT l_returnflag, count(*) AS n,
           CAST(round(sum(round(CAST(l_extendedprice * (1.0 - l_discount)
                                     AS DECIMAL(18,6)), 2)), 2) AS DOUBLE) AS net_total
    FROM lineitem WHERE l_orderkey < 2000 GROUP BY l_returnflag
    """,
    "udf", "scalar-iter",
)
def udf_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR_ITER pandas UDF: the iterator form that amortizes expensive
    per-worker setup (a model load, a tokenizer init) across ALL batches
    of a partition instead of per-batch — the shape every model-scoring
    pipeline uses. Setup here is a trivial constant to keep it oracle-
    checkable; the iterator protocol is the point."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("double", PandasUDFType.SCALAR_ITER)
    def net_iter(batches):
        one = 1.0  # stands in for per-worker heavy init (model/tokenizer)
        for price, disc in batches:
            yield price * (one - disc)

    (li,) = _t(spark, sf_dir, "lineitem")
    src = li.filter(F.col("l_orderkey") < 2000)
    net = net_iter("l_extendedprice", "l_discount")
    net2 = F.round(net.cast("decimal(18,6)"), 2)
    return src.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.sum(net2), 2).cast("double").alias("net_total"),
    )


@q(
    "udf_cogroup_apply",
    """
    SELECT c.c_custkey AS c_custkey, c.c_acctbal AS acctbal,
           coalesce(o.n_orders, 0) AS n_orders,
           CAST(round(coalesce(o.total, 0), 2) AS DOUBLE) AS total
    FROM customer c LEFT JOIN (
      SELECT o_custkey, count(*) AS n_orders,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS total
      FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey < 100
    """,
    "udf", "cogroup",
)
def udf_cogroup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FlatMapCoGroupsInPandas: cogroup two tables on a key, each group
    pair arriving as two pandas frames — the Python-side analog of a
    custom join/merge-asof. The kernel does a manual left merge so the
    SQL LEFT JOIN oracle can certify it."""
    import pandas as pd

    customer, orders = _t(spark, sf_dir, "customer", "orders")
    c = customer.filter(F.col("c_custkey") < 100).select("c_custkey", "c_acctbal")
    o = orders.filter(F.col("o_custkey") < 100).select("o_custkey", "o_totalprice")

    def merge(cg: pd.DataFrame, og: pd.DataFrame) -> pd.DataFrame:
        if cg.empty:
            return pd.DataFrame(
                columns=["c_custkey", "acctbal", "n_orders", "total"]
            )
        row = {
            "c_custkey": cg["c_custkey"].iloc[0],
            "acctbal": cg["c_acctbal"].iloc[0],
            "n_orders": len(og),
            # exact-cents accumulation: a float sum's value depends on the
            # (shuffle-determined) row order; integer cents do not
            "total": float((og["o_totalprice"] * 100).round().astype("int64").sum())
            / 100.0
            if len(og)
            else 0.0,
        }
        return pd.DataFrame([row])

    return (
        c.groupBy("c_custkey")
        .cogroup(o.groupBy("o_custkey"))
        .applyInPandas(
            merge, "c_custkey bigint, acctbal double, n_orders bigint, total double"
        )
    )


@q(
    "udf_sql_function",
    """
    SELECT l_returnflag, count(*) AS n,
           CAST(round(sum(round(CAST(l_extendedprice * (1.0 - l_discount)
                                     AS DECIMAL(18,6)), 2)), 2) AS DOUBLE) AS net_total
    FROM lineitem WHERE l_orderkey < 2000 GROUP BY l_returnflag
    """,
    "udf", "sql-udf",
)
def udf_sql_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar UDF (CREATE FUNCTION ... RETURN expr, Spark 4):
    unlike Python UDFs the body inlines into the plan — full codegen, zero
    serialization boundary; the UDF registration surface (UDFMappings
    analog) at its cheapest."""
    register_views(spark, sf_dir, ("lineitem",))
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net2(p DOUBLE, d DOUBLE)
        RETURNS DOUBLE
        RETURN CAST(round(CAST(p * (1.0 - d) AS DECIMAL(18,6)), 2) AS DOUBLE)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag, count(*) AS n,
               CAST(round(sum(net2(l_extendedprice, l_discount)), 2) AS DOUBLE)
                 AS net_total
        FROM lineitem WHERE l_orderkey < 2000 GROUP BY l_returnflag
        """
    )


@q(
    "fn_lateral_alias",
    """
    SELECT l_orderkey,
           CAST(round(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)), 2)
                AS DOUBLE) AS net,
           round(CAST(round(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)), 2)
                AS DOUBLE) * 100.0, 2) AS net_cents
    FROM lineitem WHERE l_orderkey < 100
    """,
    "udf", "lateral-column-alias",
)
def fn_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column alias: a SELECT item referencing an alias defined
    earlier in the SAME select list (no subquery nesting needed) — sugar
    Catalyst resolves to nested projection."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_orderkey,
               CAST(round(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)), 2)
                    AS DOUBLE) AS net,
               round(net * 100.0, 2) AS net_cents
        FROM lineitem WHERE l_orderkey < 100
        """
    )


@q(
    "udf_arrow_optimized",
    """
    SELECT l_returnflag, count(*) AS n,
           CAST(round(sum(CAST(l_quantity * 3 AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS tripled
    FROM lineitem WHERE l_orderkey < 2000 GROUP BY l_returnflag
    """,
    "udf", "arrow-optimized",
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED Python UDF (Spark 4 ``@udf(useArrow=True)``) —
    row-signature Python UDF with Arrow batch transfer under the hood:
    the migration path for row UDFs that can't be rewritten as pandas
    UDFs but shouldn't pay pickle serialization. Same plan shape as
    udf_python_row, ~an order less Python overhead at scale."""
    from pyspark.sql.functions import udf

    @udf("double", useArrow=True)
    def triple(x):
        return float(x) * 3.0

    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") < 2000)
        .withColumn("t", triple("l_quantity"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("t").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("tripled"),
        )
    )


@q(
    "udf_udtf_polymorphic",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents WHERE doc_id < 60
    )
    SELECT t[1] AS tok_0, count(*) AS n,
           count(DISTINCT t[2]) AS n_second
    FROM toks
    GROUP BY t[1]
    """,
    "udf", "udtf", "polymorphic",
)
def udf_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 static analyze()): the output
    schema is computed at ANALYSIS time from the call's literal
    argument (n leading tokens -> n columns) — the table function
    shape-shifts per call site, which a fixed returnType UDTF cannot.
    The lateral apply then aggregates by the first token; the oracle
    replays it with list indexing."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class LeadTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"tok_{i}", "string")
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            toks = (text or "").split(" ")
            yield tuple(
                (toks[i] if i < len(toks) else None) for i in range(n)
            )

    spark.udtf.register("lead_tokens", LeadTokens)
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT tok_0, count(*) AS n, count(DISTINCT tok_1) AS n_second
        FROM documents, LATERAL lead_tokens(text, 2)
        WHERE doc_id < 60
        GROUP BY tok_0
        """
    )
