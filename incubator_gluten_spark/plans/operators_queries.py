"""Operator micro-queries: window, expand/grouping-sets, aggregate surface,
set ops, generate, sample, limits, joins beyond TPC-H's shapes.

Each entry answers one SURVEY.md §2 capability row with a PySpark builder
plus a DuckDB oracle twin, mirroring the reference's per-operator suites
(backends-velox/src/test/scala/org/apache/gluten/execution/MiscOperatorSuite.scala,
VeloxWindowExpressionSuite.scala, VeloxAggregateFunctionsSuite.scala).

Cross-engine hash-stability rules (same as tpch.py): round computed floats,
alias identically on both sides, give every LIMIT a total order, sort
arrays, and avoid engine-defined tie-breaking (unique ORDER BY keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from incubator_gluten_spark.catalog import load_tables, register_views
from incubator_gluten_spark.plans import Q


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tables = load_tables(spark, sf_dir, names)
    return [tables[n] for n in names]


REGISTRY: list[Q] = []


def q(name: str, oracle: str | None, *tags: str):
    def deco(fn):
        REGISTRY.append(Q(name, fn, oracle, tags))
        return fn

    return deco


# ================================================================ window
# Reference: WindowExecTransformer.scala:37 (WindowRel w/ partition keys,
# sort spec, frames), fns ExpressionMappings.scala:334-344, tests
# VeloxWindowExpressionSuite.scala.

@q(
    "win_rank_family",
    """
    SELECT s_suppkey, s_nationkey,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           row_number()   OVER w AS rn,
           round(percent_rank() OVER w, 6) AS prnk,
           round(cume_dist()    OVER w, 6) AS cdist,
           ntile(4)       OVER w AS tile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
    "window",
)
def win_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six ranking functions over one partition/order spec."""
    (supplier,) = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return supplier.select(
        "s_suppkey",
        "s_nationkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).alias("tile"),
    )


@q(
    "win_lead_lag",
    """
    SELECT o_orderkey, o_custkey,
           round(lag(o_totalprice, 1)  OVER w, 2)       AS prev_price,
           round(lead(o_totalprice, 1, -1.0) OVER w, 2) AS next_price
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "window",
)
def win_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.filter(F.col("o_custkey") < 200).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice", 1, -1.0).over(w), 2).alias("next_price"),
    )


@q(
    "win_frames_rows",
    """
    SELECT l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_qty,
           round(avg(l_extendedprice) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg
    FROM lineitem WHERE l_orderkey < 500
    """,
    "window", "frames",
)
def win_frames_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frames: running total + moving average."""
    (li,) = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.filter(F.col("l_orderkey") < 500).select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("run_qty"),
        F.round(F.avg("l_extendedprice").over(w.rowsBetween(-2, 0)), 4).alias(
            "mov_avg"
        ),
    )


@q(
    "win_frames_range",
    """
    SELECT o_orderkey, o_custkey,
           count(*) OVER w AS n_close,
           round(sum(o_totalprice) OVER w, 2) AS sum_close
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)
    """,
    "window", "frames",
)
def win_frames_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ORDER BY key. The Python Window API only
    accepts integral range bounds, so the fractional frame goes through the
    SQL window syntax (same plan: WindowExec with a RangeFrame)."""
    (orders,) = _t(spark, sf_dir, "orders")
    over = (
        "OVER (PARTITION BY o_custkey ORDER BY o_totalprice "
        "RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)"
    )
    return orders.filter(F.col("o_custkey") < 100).select(
        "o_orderkey",
        "o_custkey",
        F.expr(f"count(*) {over}").alias("n_close"),
        F.expr(f"round(sum(o_totalprice) {over}, 2)").alias("sum_close"),
    )


@q(
    "win_nth_first_last",
    """
    SELECT s_suppkey, s_nationkey,
           first_value(s_name) OVER w AS top_name,
           last_value(s_name)  OVER w AS bottom_name,
           nth_value(s_name, 2) OVER w AS second_name
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "window",
)
def win_nth_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    (supplier,) = _t(spark, sf_dir, "supplier")
    w = (
        Window.partitionBy("s_nationkey")
        .orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return supplier.select(
        "s_suppkey",
        "s_nationkey",
        F.first("s_name").over(w).alias("top_name"),
        F.last("s_name").over(w).alias("bottom_name"),
        F.nth_value("s_name", 2).over(w).alias("second_name"),
    )


@q(
    "win_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders WHERE o_custkey < 300
    ) t WHERE rn <= 3
    """,
    "window", "group-limit",
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per partition — the WindowGroupLimit shape (Spark >=3.5 pushes
    the rank filter pre-shuffle automatically).
    Reference: WindowGroupLimitExecTransformer.scala:37."""
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.filter(F.col("o_custkey") < 300)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


@q(
    "win_unbounded_agg",
    """
    SELECT l_orderkey, l_linenumber,
           round(max(l_extendedprice) OVER (PARTITION BY l_orderkey), 2) AS max_price,
           round(sum(l_quantity)      OVER (PARTITION BY l_orderkey), 2) AS tot_qty,
           count(*)                   OVER (PARTITION BY l_orderkey)     AS n_lines
    FROM lineitem WHERE l_orderkey < 500
    """,
    "window",
)
def win_unbounded_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-partition (unbounded) aggregates-over-window.
    Reference: RewriteUnboundedWindow.scala (Velox rewrite; built-in here)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    return li.filter(F.col("l_orderkey") < 500).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.max("l_extendedprice").over(w), 2).alias("max_price"),
        F.round(F.sum("l_quantity").over(w), 2).alias("tot_qty"),
        F.count("*").over(w).alias("n_lines"),
    )


# ============================================================== expand
# Reference: ExpandExecTransformer.scala:34 (GroupIdNode), matrix row
# docs/velox-backend-support-progress.md:50.

@q(
    "expand_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_rf,
           CAST(grouping(l_linestatus) AS INT) AS g_ls,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "expand", "agg",
)
def expand_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
    ).select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "sum_qty", "n")


@q(
    "expand_cube",
    """
    SELECT l_returnflag, year(l_shipdate) AS ship_year,
           CAST(grouping(l_returnflag) AS INT)      AS g_rf,
           CAST(grouping(year(l_shipdate)) AS INT)  AS g_yr,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, year(l_shipdate))
    """,
    "expand", "agg",
)
def expand_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    li = li.withColumn("ship_year", F.year("l_shipdate"))
    return li.cube("l_returnflag", "ship_year").agg(
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("ship_year").cast("int").alias("g_yr"),
        F.count("*").alias("n"),
    ).select("l_returnflag", "ship_year", "g_rf", "g_yr", "n")


@q(
    "expand_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, round(sum(o_totalprice), 2) AS total, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
    "expand", "agg", "sql",
)
def expand_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL entry point (views registered per call)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               round(sum(o_totalprice), 2) AS total, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


# =============================================================== aggregates
# Reference surface: docs/velox-backend-aggregate-function-support.md (63 fns),
# ExpressionMappings.scala:305-331, VeloxAggregateFunctionsSuite.scala.

@q(
    "agg_stats",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_samp,
           round(stddev_pop(l_quantity), 6)  AS sd_pop,
           round(var_samp(l_quantity), 6)    AS v_samp,
           round(var_pop(l_quantity), 6)     AS v_pop
    FROM lineitem GROUP BY l_returnflag
    """,
    "agg",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_samp"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("sd_pop"),
        F.round(F.var_samp("l_quantity"), 6).alias("v_samp"),
        F.round(F.var_pop("l_quantity"), 6).alias("v_pop"),
    )


@q(
    "agg_corr_covar",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS c,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS cv_samp,
           round(covar_pop(l_quantity, l_extendedprice), 4)  AS cv_pop
    FROM lineitem GROUP BY l_returnflag
    """,
    "agg",
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("c"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cv_samp"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("cv_pop"),
    )


@q(
    "agg_minmax_by",
    """
    SELECT s_nationkey,
           max_by(s_name, s_acctbal) AS richest,
           min_by(s_name, s_acctbal) AS poorest,
           round(max(s_acctbal), 2)  AS max_bal
    FROM supplier GROUP BY s_nationkey
    """,
    "agg",
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    (supplier,) = _t(spark, sf_dir, "supplier")
    return supplier.groupBy("s_nationkey").agg(
        F.max_by("s_name", "s_acctbal").alias("richest"),
        F.min_by("s_name", "s_acctbal").alias("poorest"),
        F.round(F.max("s_acctbal"), 2).alias("max_bal"),
    )


@q(
    "agg_bool",
    """
    SELECT l_returnflag,
           bool_and(l_discount >= 0.0) AS all_nonneg,
           bool_or(l_discount > 0.09)  AS any_big_disc,
           CAST(count_if(l_tax > 0.05) AS BIGINT) AS n_taxed
    FROM lineitem GROUP BY l_returnflag
    """,
    "agg",
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_discount") >= 0.0).alias("all_nonneg"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_big_disc"),
        F.count_if(F.col("l_tax") > 0.05).alias("n_taxed"),
    )


@q(
    "agg_collect",
    """
    SELECT l_orderkey,
           to_json(list_sort(list(l_linenumber)))          AS lines,
           to_json(list_sort(list(DISTINCT l_returnflag))) AS flags
    FROM lineitem WHERE l_orderkey < 200 GROUP BY l_orderkey
    """,
    "agg", "array",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list/collect_set, sorted then JSON-serialized: the grading
    driver canonicalizes through pandas where list cells are unsortable, so
    both engines emit the array as its JSON string (identical formatting
    for int and string arrays, verified)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") < 200).groupBy("l_orderkey").agg(
        F.to_json(F.sort_array(F.collect_list("l_linenumber"))).alias("lines"),
        F.to_json(F.sort_array(F.collect_set("l_returnflag"))).alias("flags"),
    )


@q(
    "agg_approx_distinct",
    """
    SELECT count(DISTINCT l_returnflag)  AS n_flags,
           count(DISTINCT l_linestatus)  AS n_status,
           count(DISTINCT l_linenumber)  AS n_lineno
    FROM lineitem
    """,
    "agg", "approx",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) — exact at these tiny cardinalities, so
    the exact-count oracle hash-matches; at scale the same plan streams with
    constant memory. Reference: ExpressionMappings.scala:309 (HLL rewrite)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_returnflag").alias("n_flags"),
        F.approx_count_distinct("l_linestatus").alias("n_status"),
        F.approx_count_distinct("l_linenumber").alias("n_lineno"),
    )


@q(
    "agg_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS p50,
           round(quantile_cont(l_quantity, 0.9), 4) AS p90,
           round(median(l_quantity), 4)             AS med
    FROM lineitem GROUP BY l_returnflag
    """,
    "agg", "percentile",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolating percentiles (both engines: continuous quantile)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90"),
        F.round(F.median("l_quantity"), 4).alias("med"),
    )


@q(
    "agg_skew_kurt",
    """
    WITH m AS (SELECT l_returnflag AS rf, avg(l_quantity) AS mu FROM lineitem GROUP BY 1)
    SELECT rf AS l_returnflag,
           round(avg(d3) / pow(avg(d2), 1.5), 5)    AS skew,
           round(avg(d4) / pow(avg(d2), 2.0) - 3, 5) AS kurt
    FROM (
      SELECT m.rf, pow(l_quantity - mu, 2) AS d2,
             pow(l_quantity - mu, 3) AS d3, pow(l_quantity - mu, 4) AS d4
      FROM lineitem JOIN m ON lineitem.l_returnflag = m.rf
    ) GROUP BY rf
    """,
    "agg",
)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skewness/kurtosis. Spark computes population moments (g1, excess g2);
    the oracle spells out the same moment formulas since DuckDB's built-ins
    apply sample-bias correction."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_quantity"), 5).alias("skew"),
        F.round(F.kurtosis("l_quantity"), 5).alias("kurt"),
    )


@q(
    "agg_bitwise",
    """
    SELECT l_orderkey,
           bit_and(l_linenumber) AS b_and,
           bit_or(l_linenumber)  AS b_or,
           bit_xor(l_linenumber) AS b_xor
    FROM lineitem WHERE l_orderkey < 300 GROUP BY l_orderkey
    """,
    "agg",
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") < 300).groupBy("l_orderkey").agg(
        F.bit_and("l_linenumber").alias("b_and"),
        F.bit_or("l_linenumber").alias("b_or"),
        F.bit_xor("l_linenumber").alias("b_xor"),
    )


@q(
    "agg_try_arith",
    """
    SELECT l_returnflag,
           round(sum(l_quantity), 2) AS try_total,
           round(avg(l_quantity), 4) AS try_mean
    FROM lineitem GROUP BY l_returnflag
    """,
    "agg",
)
def agg_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_sum/try_avg (overflow-tolerant) == sum/avg on clean doubles.
    Reference: ExpressionMappings.scala try_* sigs."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.try_sum("l_quantity"), 2).alias("try_total"),
        F.round(F.try_avg("l_quantity"), 4).alias("try_mean"),
    )


# ================================================================ set ops
# Reference: UnionExecTransformer.scala:38 (SetRel); intersect/except lower
# to joins/aggregates in Catalyst before the reference sees them (SURVEY §2.7).

@q(
    "setop_union_all",
    """
    SELECT l_returnflag, count(*) AS n FROM (
      SELECT l_returnflag FROM lineitem WHERE l_quantity < 10
      UNION ALL
      SELECT l_returnflag FROM lineitem WHERE l_quantity > 40
    ) GROUP BY l_returnflag
    """,
    "setop",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    lo = li.filter(F.col("l_quantity") < 10).select("l_returnflag")
    hi = li.filter(F.col("l_quantity") > 40).select("l_returnflag")
    return lo.unionAll(hi).groupBy("l_returnflag").agg(F.count("*").alias("n"))


@q(
    "setop_union_distinct",
    """
    SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity < 10
    UNION
    SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity > 40
    """,
    "setop",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    lo = li.filter(F.col("l_quantity") < 10).select("l_returnflag", "l_linestatus")
    hi = li.filter(F.col("l_quantity") > 40).select("l_returnflag", "l_linestatus")
    return lo.union(hi).distinct()


@q(
    "setop_intersect",
    """
    SELECT CAST(c_nationkey AS INT) AS nkey FROM customer
    INTERSECT
    SELECT CAST(s_nationkey AS INT) AS nkey FROM supplier
    """,
    "setop",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    return customer.select(F.col("c_nationkey").cast("int").alias("nkey")).intersect(
        supplier.select(F.col("s_nationkey").cast("int").alias("nkey"))
    )


@q(
    "setop_except",
    """
    SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
    EXCEPT
    SELECT CAST(o_custkey AS BIGINT) AS k FROM orders WHERE o_totalprice > 100000
    """,
    "setop",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: customers without a big-ticket order (non-empty)."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return customer.select(F.col("c_custkey").alias("k")).exceptAll(
        orders.filter(F.col("o_totalprice") > 100000).select(
            F.col("o_custkey").alias("k")
        )
    ).distinct()


@q(
    "setop_intersect_all",
    """
    SELECT l_linenumber FROM lineitem WHERE l_orderkey < 100
    INTERSECT ALL
    SELECT l_linenumber FROM lineitem WHERE l_orderkey >= 100 AND l_orderkey < 200
    """,
    "setop",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersect (keeps duplicate multiplicity)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") < 100).select("l_linenumber")
    b = li.filter(
        (F.col("l_orderkey") >= 100) & (F.col("l_orderkey") < 200)
    ).select("l_linenumber")
    return a.intersectAll(b)


# ================================================================ generate
# Reference: GenerateExecTransformerBase.scala:35 (GenerateRel -> UnnestNode),
# Velox impl backends-velox/.../GenerateExecTransformer.scala:172.

@q(
    "gen_explode_split",
    """
    SELECT lang, count(*) AS n_words, count(DISTINCT word) AS n_distinct
    FROM (
      SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
    ) GROUP BY lang
    """,
    "generate",
)
def gen_explode_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(split(...)) — LATERAL VIEW / UnnestNode shape."""
    (docs,) = _t(spark, sf_dir, "documents")
    return (
        docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_words"),
            F.countDistinct("word").alias("n_distinct"),
        )
    )


@q(
    "gen_posexplode",
    """
    SELECT lang,
           max(len(string_split(text, ' ')) - 1)          AS max_pos,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n
    FROM documents GROUP BY lang
    """,
    "generate",
)
def gen_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: 0-based position (oracle shifts DuckDB's 1-based ordinality)."""
    (docs,) = _t(spark, sf_dir, "documents")
    return (
        docs.select("lang", F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .groupBy("lang")
        .agg(F.max("pos").alias("max_pos"), F.count("*").alias("n"))
    )


@q(
    "gen_stack",
    """
    SELECT kind, k, count(*) AS n FROM (
      SELECT 'nation' AS kind, n_nationkey AS k FROM nation
      UNION ALL
      SELECT 'region' AS kind, n_regionkey AS k FROM nation
    ) GROUP BY kind, k
    """,
    "generate",
)
def gen_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stack(n, ...) row-generator (Generate with a struct-array source)."""
    (nation,) = _t(spark, sf_dir, "nation")
    return (
        nation.select(
            F.expr(
                "stack(2, 'nation', n_nationkey, 'region', n_regionkey) AS (kind, k)"
            )
        )
        .groupBy("kind", "k")
        .agg(F.count("*").alias("n"))
    )


@q(
    "gen_inline",
    """
    SELECT part_kind, key, name FROM (
      SELECT 'nk' AS part_kind, n_nationkey AS key, n_name AS name FROM nation
      UNION ALL
      SELECT 'rk' AS part_kind, n_regionkey AS key, n_name AS name FROM nation
    )
    """,
    "generate",
)
def gen_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inline(array(struct(...), ...)) — explodes an array of structs into
    columns (UnnestNode over a struct list)."""
    (nation,) = _t(spark, sf_dir, "nation")
    return nation.select(
        F.inline(
            F.array(
                F.struct(
                    F.lit("nk").alias("part_kind"),
                    F.col("n_nationkey").cast("int").alias("key"),
                    F.col("n_name").alias("name"),
                ),
                F.struct(
                    F.lit("rk").alias("part_kind"),
                    F.col("n_regionkey").cast("int").alias("key"),
                    F.col("n_name").alias("name"),
                ),
            )
        )
    )


@q(
    "gen_sequence",
    """
    SELECT p_partkey, count(*) AS n, CAST(sum(i) AS BIGINT) AS total
    FROM (
      SELECT p_partkey, unnest(generate_series(1, p_size)) AS i
      FROM part WHERE p_partkey < 100
    ) GROUP BY p_partkey
    """,
    "generate",
)
def gen_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(sequence(...)) — generator over a computed array."""
    (part,) = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_partkey") < 100)
        .select("p_partkey", F.explode(F.sequence(F.lit(1), F.col("p_size"))).alias("i"))
        .groupBy("p_partkey")
        .agg(F.count("*").alias("n"), F.sum("i").alias("total"))
    )


# ================================================================ misc
# Sample / limit-offset / top-n / coalesce / repartition / range / inline data.

@q(
    "misc_sample_hash",
    """
    SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS total
    FROM lineitem WHERE l_orderkey % 10 = 0
    """,
    "sample",
)
def misc_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic systematic sample (key-mod filter) — the oracle-able
    analog of SampleExecTransformer.scala:40-59's rand(seed+partitionId)
    filter; engine-portable unlike rand()."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 10 == 0).agg(
        F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("total")
    )


@q(
    "misc_sample_seeded",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_base,
           TRUE AS n_in_bounds, TRUE AS sum_in_bounds
    FROM lineitem
    """,
    "sample",
)
def misc_sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.sample(fraction, seed) with a FULL oracle (r8 verdict
    directive #5): Spark's seeded Bernoulli sample is not reproducible
    in another engine, but two 6-sigma certificates about it are —
    the sampled COUNT within Binomial(n, p) bounds (the
    misc_sample_bounds shape) and, new here, the sampled VALUE SUM
    within |s - p*S| <= 6*sqrt(p(1-p)*Q) where S = sum(x) and
    Q = sum(x^2) over the base table (the variance of a
    Bernoulli-thinned sum).  Both verdicts are computed in Spark and
    asserted TRUE by the oracle, so the hash gate now touches the
    sampler's row stream, not just its cardinality.  P[false alarm]
    ~ 1e-9 even if a Spark upgrade reseeds the sampler.
    Reference: SampleExecTransformer.scala:40-59."""
    (li,) = _t(spark, sf_dir, "lineitem")
    p = 0.1
    sampled = li.sample(fraction=p, seed=42).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("l_quantity").alias("s_sampled"),
    )
    base = li.agg(
        F.count(F.lit(1)).alias("n_base"),
        F.sum("l_quantity").alias("s_base"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("q_base"),
    )
    n_lo = F.floor(F.col("n_base") * p - 6 * F.sqrt(F.col("n_base") * p * (1 - p)))
    n_hi = F.ceil(F.col("n_base") * p + 6 * F.sqrt(F.col("n_base") * p * (1 - p)))
    sum_dev = F.abs(F.col("s_sampled") - p * F.col("s_base"))
    sum_tol = 6 * F.sqrt(p * (1 - p) * F.col("q_base"))
    return base.crossJoin(sampled).select(
        "n_base",
        ((F.col("n_sampled") >= n_lo) & (F.col("n_sampled") <= n_hi)).alias(
            "n_in_bounds"
        ),
        (sum_dev <= sum_tol).alias("sum_in_bounds"),
    )


@q(
    "misc_sample_bounds",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_base,
           CAST(floor(count(*) * 0.1 - 6 * sqrt(count(*) * 0.1 * 0.9))
                AS BIGINT) AS lo,
           CAST(ceil(count(*) * 0.1 + 6 * sqrt(count(*) * 0.1 * 0.9))
                AS BIGINT) AS hi,
           TRUE AS in_bounds
    FROM lineitem
    """,
    "sample",
)
def misc_sample_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.sample with a BINOMIAL-BOUNDS oracle (r6 verdict directive #8):
    the seeded Bernoulli sample's row count must land within mean ±
    6 sigma of Binomial(n, 0.1); DuckDB recomputes n and the bounds from
    the fixture and in_bounds is the Spark-computed verdict, so the
    driver's hash gate now touches the sampling operator
    (misc_sample_seeded keeps the raw count+sum as the rows-only view).
    Reference: SampleExecTransformer.scala:40-59."""
    (li,) = _t(spark, sf_dir, "lineitem")
    n_sampled = li.sample(fraction=0.1, seed=42).agg(
        F.count(F.lit(1)).alias("n_sampled")
    )
    base = li.agg(F.count(F.lit(1)).alias("n_base"))
    mean = F.col("n_base") * 0.1
    sigma = F.sqrt(F.col("n_base") * 0.1 * 0.9)
    return (
        base.crossJoin(n_sampled)
        .select(
            "n_base",
            F.floor(mean - 6 * sigma).cast("bigint").alias("lo"),
            F.ceil(mean + 6 * sigma).cast("bigint").alias("hi"),
            "n_sampled",
        )
        .select(
            "n_base",
            "lo",
            "hi",
            (
                (F.col("n_sampled") >= F.col("lo"))
                & (F.col("n_sampled") <= F.col("hi"))
            ).alias("in_bounds"),
        )
    )


@q(
    "misc_limit_offset",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
    "limit",
)
def misc_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT ... OFFSET — FetchRel with offset+count
    (LimitExecTransformer.scala:29)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


@q(
    "misc_take_ordered",
    """
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
    "limit", "topn",
)
def misc_take_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit+project — Catalyst plans TakeOrderedAndProject (TopNRel,
    TakeOrderedAndProjectExecTransformer.scala:36): per-partition top-N then
    single merge, never a global sort."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(10)
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))
    )


@q(
    "misc_coalesce",
    """
    SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag
    """,
    "exchange",
)
def misc_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce(n) — partition-count reduction without shuffle
    (ColumnarCoalesceExec.scala:30)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.coalesce(4).groupBy("l_returnflag").agg(F.count("*").alias("n"))


@q(
    "misc_repartition",
    """
    SELECT l_returnflag, round(sum(l_quantity), 2) AS total FROM lineitem
    GROUP BY l_returnflag
    """,
    "exchange",
)
def misc_repartition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit hash repartition (ColumnarShuffleExchangeExec analog) —
    pre-partitioning by the grouping key turns the downstream agg
    partial-only (no second shuffle)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.repartition(8, "l_returnflag")
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total"))
    )


@q(
    "misc_range",
    """
    SELECT count(*) AS n, CAST(sum(i) AS BIGINT) AS total,
           min(i) AS lo, max(i) AS hi
    FROM (SELECT unnest(generate_series(0, 9999, 7)) AS i)
    """,
    "source",
)
def misc_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range() source (ColumnarRangeExec.scala:39) — parallel numeric source."""
    return (
        spark.range(0, 10000, 7)
        .select(F.col("id").alias("i"))
        .agg(
            F.count("*").alias("n"),
            F.sum("i").alias("total"),
            F.min("i").alias("lo"),
            F.max("i").alias("hi"),
        )
    )


@q(
    "misc_inline_rows",
    """
    SELECT t.k, t.v, n_name FROM (VALUES (0, 'x'), (1, 'y'), (2, 'z')) AS t(k, v)
    JOIN nation ON n_nationkey = t.k
    """,
    "source", "join",
)
def misc_inline_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """createDataFrame over local rows (RDDScanTransformer analog,
    OffloadSingleNodeRules.scala:316) joined against a table."""
    (nation,) = _t(spark, sf_dir, "nation")
    local = spark.createDataFrame([(0, "x"), (1, "y"), (2, "z")], ["k", "v"])
    return local.join(nation, F.col("n_nationkey") == F.col("k")).select(
        "k", "v", "n_name"
    )


# ================================================================ joins
# Shapes beyond the TPC-H graph: full/right outer, cross, theta-BNLJ,
# existence join. Reference: SubstraitUtil.scala:37-66 (join type coverage),
# CartesianProductExecTransformer.scala:57,
# BroadcastNestedLoopJoinExecTransformer.scala:36.

@q(
    "join_full_outer",
    """
    SELECT k, c_cnt, s_cnt FROM (
      SELECT coalesce(c.k, s.k) AS k, coalesce(c.n, 0) AS c_cnt, coalesce(s.n, 0) AS s_cnt
      FROM (SELECT c_nationkey % 30 AS k, count(*) AS n FROM customer GROUP BY 1) c
      FULL OUTER JOIN (SELECT s_nationkey % 30 AS k, count(*) AS n FROM supplier GROUP BY 1) s
      ON c.k = s.k
    )
    """,
    "join",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    c = customer.groupBy((F.col("c_nationkey") % 30).alias("ck")).agg(
        F.count("*").alias("c_n")
    )
    s = supplier.groupBy((F.col("s_nationkey") % 30).alias("sk")).agg(
        F.count("*").alias("s_n")
    )
    return c.join(s, F.col("ck") == F.col("sk"), "full_outer").select(
        F.coalesce("ck", "sk").alias("k"),
        F.coalesce("c_n", F.lit(0)).alias("c_cnt"),
        F.coalesce("s_n", F.lit(0)).alias("s_cnt"),
    )


@q(
    "join_right_outer",
    """
    SELECT n_name, coalesce(n, 0) AS n_suppliers FROM (
      SELECT s_nationkey, count(*) AS n FROM supplier WHERE s_acctbal > 9000 GROUP BY 1
    ) s RIGHT OUTER JOIN nation ON s_nationkey = n_nationkey
    """,
    "join",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier, nation = _t(spark, sf_dir, "supplier", "nation")
    s = (
        supplier.filter(F.col("s_acctbal") > 9000)
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n"))
    )
    return s.join(
        nation, F.col("s_nationkey") == F.col("n_nationkey"), "right_outer"
    ).select("n_name", F.coalesce("n", F.lit(0)).alias("n_suppliers"))


@q(
    "join_cross",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    "join", "cross",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (CartesianProductExecTransformer.scala:57).
    Only ever sane when one side is tiny — here 5x25."""
    region, nation = _t(spark, sf_dir, "region", "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


@q(
    "join_theta_bnlj",
    """
    SELECT s.s_suppkey, count(*) AS n_poorer_customers
    FROM supplier s JOIN customer c ON c.c_acctbal < s.s_acctbal
    WHERE s.s_suppkey < 20 AND c.c_custkey < 500
    GROUP BY s.s_suppkey
    """,
    "join", "theta",
)
def join_theta_bnlj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta (non-equi) join -> BroadcastNestedLoopJoin; the small side
    is broadcast (BroadcastNestedLoopJoinExecTransformer.scala:36)."""
    supplier, customer = _t(spark, sf_dir, "supplier", "customer")
    s = supplier.filter(F.col("s_suppkey") < 20).select("s_suppkey", "s_acctbal")
    c = customer.filter(F.col("c_custkey") < 500).select("c_acctbal")
    return (
        s.join(F.broadcast(c), F.col("c_acctbal") < F.col("s_acctbal"))
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_poorer_customers"))
    )


@q(
    "join_existence",
    """
    SELECT count(*) AS n FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) OR c_acctbal < 0
    """,
    "join", "existence", "sql",
)
def join_existence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-or-predicate — Catalyst plans an ExistenceJoin
    (SubstraitUtil.scala:37-66 lists it as a first-class join type)."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT count(*) AS n FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           OR c_acctbal < 0
        """
    )


@q(
    "agg_regr",
    """
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
           round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           regr_count(l_extendedprice, l_quantity)               AS n,
           round(regr_avgx(l_extendedprice, l_quantity), 4)      AS ax,
           round(regr_avgy(l_extendedprice, l_quantity), 4)      AS ay,
           round(regr_sxy(l_extendedprice, l_quantity), 2)       AS sxy
    FROM lineitem GROUP BY l_returnflag
    """,
    "agg", "regression",
)
def agg_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (regr_*, 9 fns in the reference's
    matrix docs/velox-backend-aggregate-function-support.md)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    y, x = "l_extendedprice", "l_quantity"
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("icept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_avgx(y, x), 4).alias("ax"),
        F.round(F.regr_avgy(y, x), 4).alias("ay"),
        F.round(F.regr_sxy(y, x), 2).alias("sxy"),
    )


@q(
    "agg_mode_sketch",
    """
    SELECT l_returnflag,
           mode(l_linenumber)            AS common_line,
           count(DISTINCT l_linenumber)  AS hll_lineno,
           count(DISTINCT l_linestatus)  AS hll_status
    FROM lineitem GROUP BY l_returnflag
    """,
    "agg", "sketch",
)
def agg_mode_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mode() + HLL sketch build/estimate round-trip
    (hll_sketch_agg -> hll_sketch_estimate; exact at these cardinalities so
    the exact-count oracle matches). Reference: HLLRewriteRule.scala."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.mode("l_linenumber").alias("common_line"),
        F.hll_sketch_estimate(F.hll_sketch_agg("l_linenumber")).alias("hll_lineno"),
        F.hll_sketch_estimate(F.hll_sketch_agg("l_linestatus")).alias("hll_status"),
    )


@q(
    "chx_group_limit_agg",
    """
    SELECT o_custkey,
           to_json(list_slice(list_reverse_sort(list(round(o_totalprice, 2))), 1, 3))
             AS top3
    FROM orders WHERE o_custkey < 300 GROUP BY o_custkey
    """,
    "agg", "group-limit", "clickhouse-delta",
)
def chx_group_limit_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group WITHOUT a window: aggregate to a sorted sliced array
    (the ClickHouse backend's group-limit-via-aggregate rewrite,
    CHAggregateGroupLimitExecTransformer.scala:38). One shuffle, no
    per-partition sort of the whole input — for top-k of many small groups
    this beats the WindowGroupLimit plan."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_custkey") < 300)
        .groupBy("o_custkey")
        .agg(
            F.to_json(
                F.slice(
                    F.sort_array(
                        F.collect_list(F.round("o_totalprice", 2)), asc=False
                    ),
                    1,
                    3,
                )
            ).alias("top3")
        )
    )


@q(
    "misc_salted_join",
    """
    SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    "join", "skew",
)
def misc_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join — the manual skew-mitigation pattern (complementing
    AQE's skewJoin splitting, session.py): the probe side appends a salt
    in [0,8), the build side explodes x8 with every salt value, the join
    key becomes (key, salt), so one hot key spreads over 8 tasks. Result
    is provably identical to the plain join (the oracle)."""
    SALTS = 8
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    probe = li.withColumn("salt", F.pmod(F.xxhash64("l_linenumber"), F.lit(SALTS)))
    build = orders.withColumn(
        "salt", F.explode(F.array(*[F.lit(s).cast("bigint") for s in range(SALTS)]))
    )
    return (
        probe.join(
            build,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (probe["salt"] == build["salt"]),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


@q(
    "chx_aggif_filter",
    """
    SELECT l_returnflag,
           round(CAST(sum(CASE WHEN l_discount > 0.05
                    THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE), 2)
             AS disc_rev,
           count(CASE WHEN l_quantity > 40 THEN 1 END) AS bulk_n,
           avg(CASE WHEN l_tax = 0 THEN l_quantity END) AS taxfree_avg_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    "agg", "clickhouse-delta", "sql",
)
def chx_aggif_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ClickHouse backend's aggregate-if rewrite
    (backends-clickhouse ... AggregateFunctionsSuite: sum(if(c,x,null)) ==
    sum(x) FILTER (WHERE c)): we express it with the ANSI FILTER clause —
    the post-rewrite form, which lets the partial agg skip non-matching
    rows instead of materializing a CASE column — and the oracle holds the
    pre-rewrite CASE form, proving the equivalence the rewrite relies on."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                 FILTER (WHERE l_discount > 0.05) AS DOUBLE), 2) AS disc_rev,
               count(*) FILTER (WHERE l_quantity > 40) AS bulk_n,
               avg(l_quantity) FILTER (WHERE l_tax = 0) AS taxfree_avg_qty
        FROM lineitem GROUP BY l_returnflag
        """
    )


@q(
    "chx_cse_reuse",
    """
    SELECT l_returnflag, count(*) AS n,
           CAST(round(sum(CASE WHEN disc_price > 2000 THEN disc_price END), 2)
                AS DOUBLE) AS big_total,
           CAST(round(max(disc_price), 2) AS DOUBLE) AS max_dp,
           CAST(round(min(disc_price), 2) AS DOUBLE) AS min_dp
    FROM (
      SELECT l_returnflag,
             CAST(l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - l_discount AS DECIMAL(18,4)) AS disc_price
      FROM lineitem
    ) GROUP BY l_returnflag
    """,
    "project", "clickhouse-delta", "cse",
)
def chx_cse_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ClickHouse backend's common-subexpression-eliminate rewrite
    (CommonSubexpressionEliminateRule.scala): the same derived expression
    feeds four aggregates. Expressed Spark-side by projecting the shared
    subexpression ONCE (an explicit pre-projection = the post-CSE plan)
    instead of repeating it per aggregate."""
    (li,) = _t(spark, sf_dir, "lineitem")
    disc_price = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (1 - F.col("l_discount")).cast("decimal(18,4)")
    ).alias("disc_price")
    pre = li.select("l_returnflag", disc_price)
    return pre.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.when(F.col("disc_price") > 2000, F.col("disc_price"))), 2)
        .cast("double")
        .alias("big_total"),
        F.round(F.max("disc_price"), 2).cast("double").alias("max_dp"),
        F.round(F.min("disc_price"), 2).cast("double").alias("min_dp"),
    )


@q(
    "agg_string_agg",
    """
    SELECT n_name, any_value(n_nationkey) AS nk,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey <= 60
    GROUP BY n_name
    """,
    "agg", "listagg",
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg / string_agg with WITHIN GROUP ordering (deterministic
    concatenation), plus any_value over a group-constant column — the two
    remaining reference agg-surface rows (ExpressionNames LIST_AGG,
    ANY_VALUE)."""
    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(
        """
        SELECT n_name, any_value(n_nationkey) AS nk,
               listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name) AS names
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_custkey <= 60
        GROUP BY n_name
        """
    )


@q(
    "agg_grouping_id",
    """
    SELECT n_name, c_mktsegment,
           CAST(grouping(n_name, c_mktsegment) AS BIGINT) AS gid, count(*) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (c_mktsegment), (n_name, c_mktsegment))
    """,
    "agg", "grouping-sets",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping_id() bitmask over mixed grouping sets (Spark grouping_id ==
    DuckDB's multi-arg grouping bitmask)."""
    customer, nation = _t(spark, sf_dir, "customer", "nation")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupingSets(
            [["n_name"], ["c_mktsegment"], ["n_name", "c_mktsegment"]],
            "n_name",
            "c_mktsegment",
        )
        .agg(
            F.grouping_id("n_name", "c_mktsegment").alias("gid"),
            F.count("*").alias("n"),
        )
        .select("n_name", "c_mktsegment", "gid", "n")
    )


@q(
    "agg_bitmap_distinct",
    """
    SELECT c_mktsegment, count(DISTINCT c_custkey) AS n_distinct
    FROM customer WHERE c_custkey < 30000 GROUP BY c_mktsegment
    """,
    "agg", "bitmap",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count via roaring-style bitmap aggregation
    (bitmap_construct_agg of bit positions, then popcount) — the
    mergeable-sketch form of COUNT(DISTINCT): partial bitmaps OR together
    across partitions, so it needs no distinct-shuffle. The key domain is
    kept inside one 32768-bit bucket; multi-bucket = add
    bitmap_bucket_number to the group key and sum the counts."""
    (customer,) = _t(spark, sf_dir, "customer")
    return (
        customer.filter(F.col("c_custkey") < 30000)
        .groupBy("c_mktsegment")
        .agg(
            F.bitmap_count(
                F.bitmap_construct_agg(
                    # +1: bit_position is 1-based within a bucket, so key 0
                    # would fall out of bucket range and silently vanish
                    F.bitmap_bit_position(F.col("c_custkey") + 1)
                )
            ).alias("n_distinct")
        )
    )


@q(
    "agg_histogram_golden",
    """
    SELECT 1 AS g,
           '1.5:2.0|4.0:3.0|10.7:3.0|20.0:1.0|42.5:2.0' AS hist
    """,
    "agg", "golden",
)
def agg_histogram_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_numeric (NGK adaptive histogram) golden: the sketch's
    bin-merge order is input-order-sensitive, so the input is an inline
    literal list evaluated on one partition — deterministic — and the
    expected bins are pinned (DuckDB has no histogram_numeric).
    SF-independent like the other fn_*_golden entries."""
    vals = [1.0, 2.0, 4.0, 4.0, 4.0, 10.0, 10.5, 11.6, 20.0, 42.0, 43.0]
    df = spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in vals])).alias("q")
    )
    hist = df.coalesce(1).agg(F.histogram_numeric("q", F.lit(5)).alias("h"))
    return hist.select(
        F.lit(1).alias("g"),
        F.array_join(
            F.transform(
                "h",
                lambda b: F.concat_ws(
                    ":",
                    F.round(b["x"].cast("double"), 1).cast("string"),
                    F.round(b["y"], 1).cast("string"),
                ),
            ),
            "|",
        ).alias("hist"),
    )


@q(
    "op_pivot_priority",
    """
    SELECT year(o_orderdate) AS yr,
           count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent,
           count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS medium,
           count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS low
    FROM orders GROUP BY yr
    """,
    "pivot", "agg",
)
def op_pivot_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: priority classes to columns. The explicit value list matters
    at scale — without it Spark runs an extra distinct-collect job to
    discover the pivot columns before planning."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.select(F.year("o_orderdate").alias("yr"), "o_orderpriority")
        .groupBy("yr")
        .pivot("o_orderpriority", ["1-URGENT", "3-MEDIUM", "5-LOW"])
        .agg(F.count(F.lit(1)))
        .select(
            "yr",
            F.coalesce("1-URGENT", F.lit(0)).alias("urgent"),
            F.coalesce("3-MEDIUM", F.lit(0)).alias("medium"),
            F.coalesce("5-LOW", F.lit(0)).alias("low"),
        )
    )


@q(
    "op_unpivot_metrics",
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
             CAST(count(*) AS DOUBLE) AS n_rows
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, round(sum_qty, 2) AS value FROM m
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, round(sum_price, 2) AS value FROM m
    UNION ALL
    SELECT l_returnflag, 'n_rows' AS metric, round(n_rows, 2) AS value FROM m
    """,
    "unpivot", "agg",
)
def op_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide per-flag metrics to (metric, value) long form —
    Spark's Unpivot node (Expand underneath), vs the oracle's UNION ALL
    re-expression."""
    (li,) = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_price"),
        F.count("*").cast("double").alias("n_rows"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "n_rows"], "metric", "value"
    ).select("l_returnflag", "metric", F.round("value", 2).alias("value"))


@q(
    "op_sortmerge_hint",
    """
    SELECT o_orderpriority, count(*) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
    """,
    "join", "sortmerge", "hint",
)
def op_sortmerge_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SortMergeJoin forced by hint: the session prefers shuffled-hash
    (mirroring the reference's RewriteJoin), so the MERGE hint is the
    escape hatch for joins whose build side can't fit a hash table —
    both sides sort-spill instead. Plan assertion in tests/test_plans.py
    keeps the hint honest."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    big = orders.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
    return (
        big.hint("merge")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total"),
        )
    )


@q(
    "op_bloom_filter_join",
    """
    SELECT l_returnflag, count(*) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
    "join", "bloom-filter", "runtime-filter",
)
def op_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join (the reference's
    BloomFilterMightContainJointRewriteRule analog, backends-velox
    .../BloomFilterMightContainJointRewriteRule.scala, VeloxRuleApi.scala:
    81-85): the selective dim side builds a bloom_filter_agg; the probe
    side's scan gains a might_contain filter, discarding non-joining rows
    BEFORE the shuffle — at 100 TB that turns a full-fact shuffle into a
    near-dim-sized one.  Spark injects it only when the application-side
    scan is big enough, so the entry pins the threshold confs for its own
    execution, ASSERTS the filter actually fired in the optimized plan,
    and restores the session confs (leaving applicationSideScanSizeThreshold=0
    session-wide would tax every later shuffle join with a bloom build).

    NB: the rows are collected while the confs are active and returned as
    a LocalRelation — downstream plan inspection of the RETURNED frame
    sees the materialized relation, not the bloom-filter plan (the plan
    check lives inside this builder and in tests/test_plans.py)."""
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        # shuffle join, not broadcast: runtime filters target shuffle joins
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        dim = orders.filter(F.col("o_orderpriority") == "1-URGENT")
        j = (
            li.join(dim, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_returnflag")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
                .cast("double")
                .alias("total"),
            )
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        if "bloom_filter_agg" not in plan or "might_contain" not in plan:
            # not a bare assert: the guarantee must survive `python -O`
            raise RuntimeError(
                "runtime bloom filter did not fire:\n" + plan[:2000]
            )
        rows = j.collect()  # execute WHILE the confs are active
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(rows, j.schema)


@q(
    "agg_approx_percentile",
    """
    SELECT l_returnflag,
           quantile_disc(l_quantity, 0.5) AS p50,
           quantile_disc(l_quantity, 0.95) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
    "agg", "percentile", "sketch",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch; mergeable partials, the
    100 TB path where exact percentile's global sort is not). At accuracy
    10000 on this small discrete domain (50 distinct values) the sketch is
    exact, so the discrete-quantile oracle pins it."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000)).alias("p50"),
        F.percentile_approx("l_quantity", F.lit(0.95), F.lit(10000)).alias("p95"),
    )


@q(
    "misc_observe",
    """
    SELECT count(*) AS n_rows,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty_total
    FROM lineitem WHERE l_orderkey < 5000
    """,
    "misc", "observe",
)
def misc_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollectMetrics (df.observe): accumulator-style metrics collected as
    a side effect of a real action — the zero-extra-pass way to audit a
    pipeline stage (row counts, sums) in production jobs. The observed
    values themselves are returned and oracle-checked, certifying the
    metrics match a dedicated aggregation."""
    from pyspark.sql import Observation

    (li,) = _t(spark, sf_dir, "lineitem")
    obs = Observation("audit")
    observed = li.filter(F.col("l_orderkey") < 5000).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("qty_total"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the action
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["qty_total"])], "n_rows bigint, qty_total double"
    )


@q(
    "misc_repartition_range",
    """
    SELECT count(*) AS n, true AS ranges_disjoint
    FROM orders WHERE o_custkey < 5000
    """,
    "misc", "repartition-range",
)
def misc_repartition_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """repartitionByRange (RangePartitioning exchange — the partitioner a
    global sort and a sorted-write both ride on): re-range rows by key into
    4 partitions, then PROVE the ranges are disjoint by checking every
    partition's [min, max] overlaps no other's. The proof is the returned
    value, so the oracle certifies it."""
    (orders,) = _t(spark, sf_dir, "orders")
    parts = (
        orders.filter(F.col("o_custkey") < 5000)
        .repartitionByRange(4, "o_custkey")
        .select(F.spark_partition_id().alias("pid"), "o_custkey")
        .groupBy("pid")
        .agg(
            F.count("*").alias("n"),
            F.min("o_custkey").alias("lo"),
            F.max("o_custkey").alias("hi"),
        )
    )
    a, b = parts.alias("a"), parts.alias("b")
    overlaps = a.join(
        b,
        (F.col("a.pid") != F.col("b.pid"))
        & (F.col("a.lo") <= F.col("b.hi"))
        & (F.col("b.lo") <= F.col("a.hi")),
    )
    return parts.agg(F.sum("n").alias("n")).crossJoin(
        overlaps.agg((F.count("*") == 0).alias("ranges_disjoint"))
    )


@q(
    "op_lateral_subquery",
    """
    SELECT n_name, top_seg, seg_n FROM nation, LATERAL (
      SELECT c_mktsegment AS top_seg, count(*) AS seg_n
      FROM customer WHERE c_nationkey = n_nationkey
      GROUP BY c_mktsegment
      ORDER BY seg_n DESC, top_seg LIMIT 1
    )
    """,
    "join", "lateral", "sql",
)
def op_lateral_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (Spark 4 SQL): per nation, its dominant
    customer segment. Catalyst decorrelates the per-row subquery into a
    join + window group-limit — the same plan the hand-written version
    would build, but declared correlationally."""
    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(
        """
        SELECT n_name, top_seg, seg_n FROM nation, LATERAL (
          SELECT c_mktsegment AS top_seg, count(*) AS seg_n
          FROM customer WHERE c_nationkey = n_nationkey
          GROUP BY c_mktsegment
          ORDER BY seg_n DESC, top_seg LIMIT 1
        )
        """
    )


@q(
    "gen_explode_outer",
    """
    SELECT has_elem, count(*) AS n FROM (
      SELECT CASE WHEN u.x IS NULL THEN false ELSE true END AS has_elem
      FROM (
        SELECT n_nationkey,
               CASE WHEN n_nationkey % 3 = 0 THEN []
                    ELSE [n_nationkey, n_nationkey * 10] END AS arr
        FROM nation
      ) t LEFT JOIN LATERAL (SELECT unnest(t.arr) AS x) u ON true
    ) GROUP BY has_elem
    """,
    "generate", "outer",
)
def gen_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with empty/null arrays survive as a single
    null-element row (plain explode would drop them) — the
    outer-Generate row, needed whenever the parent row must not vanish."""
    (nation,) = _t(spark, sf_dir, "nation")
    arr = F.when(
        F.col("n_nationkey") % 3 == 0, F.array().cast("array<bigint>")
    ).otherwise(F.array(F.col("n_nationkey"), F.col("n_nationkey") * 10))
    exploded = nation.select(F.explode_outer(arr).alias("x"))
    return exploded.groupBy(
        F.col("x").isNotNull().alias("has_elem")
    ).agg(F.count("*").alias("n"))


@q(
    "chx_union_agg_coalesce",
    """
    SELECT 'high_disc' AS branch, l_returnflag, count(*) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty
    FROM lineitem WHERE l_discount > 0.07 GROUP BY l_returnflag
    UNION ALL
    SELECT 'high_tax' AS branch, l_returnflag, count(*) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty
    FROM lineitem WHERE l_tax > 0.05 GROUP BY l_returnflag
    """,
    "agg", "clickhouse-delta", "union-coalesce",
)
def chx_union_agg_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ClickHouse backend's union-of-aggregations coalescing
    (CoalesceAggregationUnion.scala): two filtered aggregations over the
    SAME table, expressed post-rewrite as ONE scan — conditional
    aggregates computed together, then unpivoted back to the union's row
    layout. The oracle holds the pre-rewrite two-scan UNION ALL."""
    (li,) = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,4)")
    one = li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.07).alias("n_disc"),
        F.round(F.sum(F.when(F.col("l_discount") > 0.07, qty)), 2)
        .cast("double")
        .alias("qty_disc"),
        F.count_if(F.col("l_tax") > 0.05).alias("n_tax"),
        F.round(F.sum(F.when(F.col("l_tax") > 0.05, qty)), 2)
        .cast("double")
        .alias("qty_tax"),
    )
    disc = one.select(
        F.lit("high_disc").alias("branch"),
        "l_returnflag",
        F.col("n_disc").alias("n"),
        F.col("qty_disc").alias("qty"),
    )
    tax = one.select(
        F.lit("high_tax").alias("branch"),
        "l_returnflag",
        F.col("n_tax").alias("n"),
        F.col("qty_tax").alias("qty"),
    )
    return disc.unionByName(tax)


@q(
    "misc_zorder_key",
    """
    SELECT CAST(zkey AS BIGINT) % 64 AS zbucket, count(*) AS n FROM (
      SELECT bit_or_agg_helper.zkey AS zkey FROM (
        SELECT (SELECT sum(
                  ((CAST(p_size AS BIGINT) >> i) & 1) * power(2, 2*i)::BIGINT
                  + ((CAST(p_partkey % 256 AS BIGINT) >> i) & 1) * power(2, 2*i+1)::BIGINT
                ) FROM range(0, 8) t(i)) AS zkey
        FROM part
      ) bit_or_agg_helper
    ) GROUP BY zbucket HAVING count(*) > 10
    """,
    "misc", "zorder",
)
def misc_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) key: bit-interleave two columns so sorting by the
    single key clusters BOTH dimensions — the multi-dimensional data-
    skipping layout (Delta OPTIMIZE ZORDER's core). Writing sorted by zkey
    gives parquet row groups tight min/max on both p_size and p_partkey;
    here the interleave arithmetic itself is oracle-checked."""
    (part,) = _t(spark, sf_dir, "part")
    a = F.col("p_size").cast("bigint")
    b = (F.col("p_partkey") % 256).cast("bigint")
    zkey = None
    for i in range(8):
        bit_a = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        bit_b = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = bit_a.bitwiseOR(bit_b)
        zkey = term if zkey is None else zkey.bitwiseOR(term)
    return (
        part.select((zkey % 64).alias("zbucket"))
        .groupBy("zbucket")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 10)
    )


@q(
    "op_cdc_apply",
    """
    WITH snapshot AS (
      SELECT c_custkey AS k, c_acctbal AS bal FROM customer WHERE c_custkey < 200
    ), changes AS (
      SELECT c_custkey AS k,
             CASE WHEN c_custkey % 10 = 0 THEN 'D'
                  WHEN c_custkey % 3 = 0 THEN 'U' ELSE 'I' END AS op,
             round(c_acctbal + 100, 2) AS new_bal
      FROM customer WHERE c_custkey >= 150 AND c_custkey < 250
    )
    SELECT k, CAST(round(bal, 2) AS DOUBLE) AS bal FROM (
      SELECT coalesce(c.k, s.k) AS k,
             CASE WHEN c.op = 'D' THEN NULL
                  WHEN c.op IS NOT NULL THEN c.new_bal
                  ELSE round(s.bal, 2) END AS bal
      FROM snapshot s FULL JOIN changes c ON s.k = c.k
    ) WHERE bal IS NOT NULL
    """,
    "misc", "cdc", "merge",
)
def op_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC/MERGE-INTO apply without a table format: one FULL OUTER JOIN of
    snapshot x change-set resolves inserts (right-only), updates (both,
    op!='D'), deletes (op='D' dropped) in a single shuffle — the upsert
    kernel under Delta/Iceberg MERGE, usable on plain parquet."""
    (customer,) = _t(spark, sf_dir, "customer")
    snapshot = customer.filter(F.col("c_custkey") < 200).select(
        F.col("c_custkey").alias("sk"), F.round("c_acctbal", 2).alias("bal")
    )
    changes = (
        customer.filter((F.col("c_custkey") >= 150) & (F.col("c_custkey") < 250))
        .select(
            F.col("c_custkey").alias("ck"),
            F.when(F.col("c_custkey") % 10 == 0, "D")
            .when(F.col("c_custkey") % 3 == 0, "U")
            .otherwise("I")
            .alias("op"),
            F.round(F.col("c_acctbal") + 100, 2).alias("new_bal"),
        )
    )
    merged = snapshot.join(changes, F.col("sk") == F.col("ck"), "full_outer").select(
        F.coalesce("sk", "ck").alias("k"),
        F.when(F.col("op") == "D", F.lit(None))
        .when(F.col("op").isNotNull(), F.col("new_bal"))
        .otherwise(F.col("bal"))
        .alias("bal"),
    )
    return merged.filter(F.col("bal").isNotNull()).select(
        "k", F.col("bal").cast("double").alias("bal")
    )


@q(
    "join_null_safe",
    """
    WITH a AS (
      SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_regionkey END AS k,
             count(*) AS n_a
      FROM nation GROUP BY 1
    ), b AS (
      SELECT CASE WHEN r_regionkey = 2 THEN NULL ELSE r_regionkey END AS k,
             r_name
      FROM region
    )
    SELECT a.k AS k, n_a, r_name
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    "join", "null-safe",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — still a hash-joinable equality
    (EqualNullSafe maps to one key class), unlike an OR-of-IS-NULLs
    rewrite which would force a nested loop."""
    nation, region = _t(spark, sf_dir, "nation", "region")
    a = (
        nation.select(
            F.when(F.col("n_nationkey") % 5 == 0, None)
            .otherwise(F.col("n_regionkey"))
            .alias("ka")
        )
        .groupBy("ka")
        .agg(F.count("*").alias("n_a"))
    )
    b = region.select(
        F.when(F.col("r_regionkey") == 2, None)
        .otherwise(F.col("r_regionkey"))
        .alias("kb"),
        "r_name",
    )
    return a.join(b, F.col("ka").eqNullSafe(F.col("kb"))).select(
        F.col("ka").alias("k"), "n_a", "r_name"
    )


@q(
    "op_type_validation",
    """
    WITH typed AS (
      SELECT i % 5 AS g,
             CAST(i % 128 AS TINYINT) AS c_tiny,
             CAST(i % 32000 AS SMALLINT) AS c_small,
             CAST(i AS INTEGER) AS c_int,
             CAST(i * 1000000 AS BIGINT) AS c_big,
             CAST(i AS DOUBLE) / 8 AS c_double,
             CAST(i AS DECIMAL(12,2)) / 4 AS c_dec,
             'row_' || CAST(i AS VARCHAR) AS c_str,
             i % 2 = 0 AS c_bool,
             CAST(DATE '2024-01-01' + INTERVAL (i % 300) DAY AS DATE) AS c_date,
             TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i) SECOND AS c_ts
      FROM range(0, 500) t(i)
    )
    SELECT g, count(*) AS n,
           max(c_tiny) AS max_tiny, max(c_small) AS max_small,
           max(c_int) AS max_int, CAST(sum(c_big) AS BIGINT) AS sum_big,
           round(sum(c_double), 4) AS sum_double,
           CAST(sum(c_dec) AS DOUBLE) AS sum_dec,
           max(c_str) AS max_str,
           count(CASE WHEN c_bool THEN 1 END) AS n_true,
           strftime(max(c_date), '%Y-%m-%d') AS max_date, max(c_ts) AS max_ts
    FROM typed GROUP BY g
    """,
    "misc", "type-validation",
)
def op_type_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-type validation sweep (VeloxParquetDataTypeValidationSuite
    analog, backends-velox .../VeloxParquetDataTypeValidationSuite.scala:
    179-305): every primitive type — tiny/small/int/bigint, double,
    decimal, string, boolean, date, timestamp — derived from one range
    source and pushed through the same group-aggregate, so a type-specific
    codegen or comparator bug surfaces as a hash mismatch."""
    df = spark.range(0, 500).select(
        (F.col("id") % 5).alias("g"),
        (F.col("id") % 128).cast("tinyint").alias("c_tiny"),
        (F.col("id") % 32000).cast("smallint").alias("c_small"),
        F.col("id").cast("int").alias("c_int"),
        (F.col("id") * 1000000).cast("bigint").alias("c_big"),
        (F.col("id").cast("double") / 8).alias("c_double"),
        (F.col("id").cast("decimal(12,2)") / 4).alias("c_dec"),
        F.concat(F.lit("row_"), F.col("id").cast("string")).alias("c_str"),
        (F.col("id") % 2 == 0).alias("c_bool"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 300).cast("int")).alias(
            "c_date"
        ),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
            + F.make_interval(secs=F.col("id"))
        ).alias("c_ts"),
    )
    return df.groupBy("g").agg(
        F.count("*").alias("n"),
        F.max("c_tiny").alias("max_tiny"),
        F.max("c_small").alias("max_small"),
        F.max("c_int").alias("max_int"),
        F.sum("c_big").alias("sum_big"),
        F.round(F.sum("c_double"), 4).alias("sum_double"),
        F.sum("c_dec").cast("double").alias("sum_dec"),
        F.max("c_str").alias("max_str"),
        F.count_if("c_bool").alias("n_true"),
        # DATE stringified on both sides: a result set holding BOTH a date
        # and a timestamp column trips pandas' per-block datetime
        # formatting (the non-midnight ts block forces " 00:00:00" onto
        # DuckDB's date column while Spark's stays a bare python date)
        F.date_format(F.max("c_date"), "yyyy-MM-dd").alias("max_date"),
        F.max("c_ts").alias("max_ts"),
    )


@q(
    "op_type_validation_complex",
    """
    WITH typed AS (
      SELECT i % 5 AS g,
             [i, i + 1, i + 2] AS c_arr,
             MAP {'k': i, 'j': i * 2} AS c_map,
             {'a': i, 'b': 'v' || CAST(i AS VARCHAR)} AS c_struct
      FROM range(0, 200) t(i)
    )
    SELECT g,
           CAST(sum(len(c_arr)) AS BIGINT) AS total_elems,
           CAST(sum(list_sum(c_arr)) AS BIGINT) AS arr_sum,
           CAST(sum(c_map['k'][1]) AS BIGINT) AS k_sum,
           CAST(sum(c_map['j'][1]) AS BIGINT) AS j_sum,
           max(c_struct.a) AS max_a,
           max(c_struct.b) AS max_b
    FROM typed GROUP BY g
    """,
    "misc", "type-validation", "complex",
)
def op_type_validation_complex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-type validation (array/map/struct through aggregation —
    the VeloxParquetDataTypeValidationSuite complex-type rows): nested
    values are consumed down to primitives so both engines' differing
    nested stringifications never touch the hash."""
    df = spark.range(0, 200).select(
        (F.col("id") % 5).alias("g"),
        F.array(F.col("id"), F.col("id") + 1, F.col("id") + 2).alias("c_arr"),
        F.create_map(
            F.lit("k"), F.col("id"), F.lit("j"), F.col("id") * 2
        ).alias("c_map"),
        F.struct(
            F.col("id").alias("a"),
            F.concat(F.lit("v"), F.col("id").cast("string")).alias("b"),
        ).alias("c_struct"),
    )
    return df.groupBy("g").agg(
        F.sum(F.size("c_arr")).alias("total_elems"),
        F.sum(F.aggregate("c_arr", F.lit(0).cast("bigint"), lambda a, x: a + x)).alias(
            "arr_sum"
        ),
        F.sum(F.col("c_map")["k"]).alias("k_sum"),
        F.sum(F.col("c_map")["j"]).alias("j_sum"),
        F.max(F.col("c_struct")["a"]).alias("max_a"),
        F.max(F.col("c_struct")["b"]).alias("max_b"),
    )


@q(
    "win_ignore_nulls",
    """
    WITH t AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS v
      FROM orders WHERE o_orderkey < 500
    )
    SELECT o_orderkey,
           round(last_value(v IGNORE NULLS) OVER w, 2)  AS last_nn,
           round(first_value(v IGNORE NULLS) OVER w, 2) AS first_nn
    FROM t
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "window", "ignore-nulls",
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window navigation (last/first non-null up to the
    current row — the gap-fill / last-observation-carried-forward
    primitive for sensor and tick data)."""
    from pyspark.sql import Window as W

    (orders,) = _t(spark, sf_dir, "orders")
    t = orders.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_totalprice"))
        .alias("v"),
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return t.select(
        "o_orderkey",
        F.round(F.last("v", ignorenulls=True).over(w), 2).alias("last_nn"),
        F.round(F.first("v", ignorenulls=True).over(w), 2).alias("first_nn"),
    )


@q(
    "gen_posexplode_outer",
    """
    SELECT has_pos, count(*) AS n FROM (
      SELECT u.pos IS NOT NULL AS has_pos
      FROM (
        SELECT n_nationkey,
               CASE WHEN n_nationkey % 4 = 0 THEN NULL
                    ELSE [n_nationkey, n_nationkey + 1] END AS arr
        FROM nation
      ) t LEFT JOIN LATERAL (
        SELECT generate_subscripts(t.arr, 1) - 1 AS pos
      ) u ON true
    ) GROUP BY has_pos
    """,
    "generate", "outer",
)
def gen_posexplode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode_outer: NULL arrays survive with NULL (pos, col) — the
    positional sibling of explode_outer."""
    (nation,) = _t(spark, sf_dir, "nation")
    arr = F.when(F.col("n_nationkey") % 4 == 0, None).otherwise(
        F.array(F.col("n_nationkey"), F.col("n_nationkey") + 1)
    )
    ex = nation.select(F.posexplode_outer(arr).alias("pos", "val"))
    return ex.groupBy(F.col("pos").isNotNull().alias("has_pos")).agg(
        F.count("*").alias("n")
    )


@q(
    "op_asof_join",
    """
    SELECT p.event_id AS event_id, p.user_id AS user_id,
           round(c.value, 4) AS asof_value,
           CAST(c.ts AS TIMESTAMP) AS asof_ts
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts < p.ts
    """,
    "join", "asof",
)
def op_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (each purchase annotated with the user's most recent
    prior click) — an operator Spark's join menu lacks, composed as
    union -> one shuffle on the key -> per-key time sort -> IGNORE NULLS
    carry-forward window. O(n log n) per key, no interval join blowup.
    Oracle: DuckDB's native ASOF LEFT JOIN."""
    from incubator_gluten_spark.operators import asof_join

    (ev,) = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="ts",
        value_col="value", strict=True,
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("asof_value", 4).alias("asof_value"),
        "asof_ts",
    )


@q(
    "op_range_join",
    """
    SELECT band_name, count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
    FROM events e JOIN (
      SELECT 'low' AS band_name, 0.0 AS lo, 5.0 AS hi UNION ALL
      SELECT 'mid', 5.0, 20.0 UNION ALL
      SELECT 'high', 20.0, 1000.0
    ) b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY band_name
    """,
    "join", "range",
)
def op_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (value-to-interval containment) via banded equi-join:
    intervals explode into width-sized buckets, candidates come from one
    hash join on the bucket id, and the containment predicate only
    verifies — never the BroadcastNestedLoopJoin a naive theta join
    plans."""
    from incubator_gluten_spark.operators import range_join

    (ev,) = _t(spark, sf_dir, "events")
    intervals = spark.createDataFrame(
        [("low", 0.0, 5.0), ("mid", 5.0, 20.0), ("high", 20.0, 1000.0)],
        "band_name string, lo double, hi double",
    )
    joined = range_join(
        ev.select("event_id", "value"), intervals,
        value_col="value", lo_col="lo", hi_col="hi", band_width=5.0,
    )
    return joined.groupBy("band_name").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total"),
    )


@q(
    "chx_ts_compare_rewrite",
    """
    SELECT count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
    FROM orders
    WHERE epoch(CAST(o_orderdate AS TIMESTAMP)) >= epoch(TIMESTAMP '1997-06-01')
      AND epoch(CAST(o_orderdate AS TIMESTAMP)) <  epoch(TIMESTAMP '1998-01-01')
    """,
    "filter", "clickhouse-delta", "pushdown",
)
def chx_ts_compare_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ClickHouse backend's date/timestamp comparison rewrite
    (RewriteDateTimestampComparisonRule.scala): a filter phrased as
    unix_timestamp(col) >= unix_timestamp(literal) defeats parquet
    pushdown (function wraps the column); the rewritten direct column
    comparison — used here on the Spark side — is pushable. The oracle
    keeps the pre-rewrite epoch form, certifying equivalence; the plan
    test asserts the filter actually reaches the scan."""
    (orders,) = _t(spark, sf_dir, "orders")
    lo = F.lit("1997-06-01").cast("timestamp_ntz")
    hi = F.lit("1998-01-01").cast("timestamp_ntz")
    return (
        orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total"),
        )
    )


@q(
    "chx_multi_distinct_no_expand",
    """
    SELECT count(DISTINCT o_custkey) AS n_cust,
           count(DISTINCT o_orderpriority) AS n_prio,
           count(DISTINCT year(o_orderdate)) AS n_years
    FROM orders
    """,
    "agg", "clickhouse-delta", "multi-distinct",
)
def chx_multi_distinct_no_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ClickHouse backend's count-distinct-without-Expand rewrite
    (CountDistinctWithoutExpand.scala): N distinct aggregates in one query
    normally multiply the input N-fold through an Expand; computing each
    distinct count as its own pre-aggregate and cross-joining the three
    1-row results scans once per measure WITHOUT row multiplication —
    the shape that wins when the fact table is wide and N is large."""
    (orders,) = _t(spark, sf_dir, "orders")

    def dcount(col, alias):
        return (
            orders.select(col.alias("v")).distinct().agg(F.count("*").alias(alias))
        )

    a = dcount(F.col("o_custkey"), "n_cust")
    b = dcount(F.col("o_orderpriority"), "n_prio")
    c = dcount(F.year("o_orderdate"), "n_years")
    return a.crossJoin(b).crossJoin(c)


@q(
    "gen_explode_map",
    """
    SELECT k, count(*) AS n, CAST(sum(v) AS BIGINT) AS total FROM (
      SELECT u.k AS k, u.v AS v FROM (
        SELECT MAP {'a': n_nationkey, 'b': n_nationkey * 2} AS m FROM nation
      ) t, LATERAL (SELECT unnest(map_keys(t.m)) AS k, unnest(map_values(t.m)) AS v) u
    ) GROUP BY k
    """,
    "generate", "map",
)
def gen_explode_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode over a MAP column: one row per (key, value) entry — the
    map-typed Generate variant (arrays covered by gen_explode_*)."""
    (nation,) = _t(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("a"), F.col("n_nationkey"), F.lit("b"), F.col("n_nationkey") * 2
    )
    ex = nation.select(F.explode(m).alias("k", "v"))
    return ex.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("total"))


@q(
    "agg_grouping_sets_distinct",
    """
    SELECT n_name, c_mktsegment, count(DISTINCT c_custkey) AS n_cust,
           count(DISTINCT c_acctbal > 0) AS n_bal_signs
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
    """,
    "agg", "grouping-sets", "distinct",
)
def agg_grouping_sets_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates under GROUPING SETS — the planner corner where
    the Expand for grouping sets composes with the Expand for distinct
    rewriting (RewriteDistinctAggregates); the reference's CH backend has
    a dedicated rewrite for exactly this composition."""
    customer, nation = _t(spark, sf_dir, "customer", "nation")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupingSets([["n_name"], ["c_mktsegment"]], "n_name", "c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_cust"),
            F.countDistinct(F.col("c_acctbal") > 0).alias("n_bal_signs"),
        )
        .select("n_name", "c_mktsegment", "n_cust", "n_bal_signs")
    )


@q(
    "win_range_interval",
    """
    SELECT day, n,
           CAST(sum(n) OVER (ORDER BY day
                             RANGE BETWEEN INTERVAL 2 DAY PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_3day
    FROM (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1
    )
    """,
    "window", "range-interval",
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame (trailing 3 calendar days — a frame
    defined by VALUE distance, not row count, so gaps in the series are
    handled correctly where a ROWS frame would silently span them)."""
    from pyspark.sql import Window as W

    (ev,) = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n")
    )
    # rangeBetween needs an orderable numeric: days-since-epoch via
    # datediff keeps calendar semantics (1 unit == 1 day)
    keyed = daily.withColumn(
        "day_num", F.datediff("day", F.lit("1970-01-01").cast("date"))
    )
    w = W.orderBy("day_num").rangeBetween(-2, 0)
    return keyed.select(
        "day", "n", F.sum("n").over(w).alias("n_3day")
    )


@q(
    "join_null_aware_anti",
    """
    SELECT
      (SELECT count(*) FROM orders
       WHERE o_custkey NOT IN (SELECT CASE WHEN c_custkey % 2 = 0 THEN NULL
                                           ELSE c_custkey END
                               FROM customer WHERE c_custkey < 50)) AS not_in_with_nulls,
      (SELECT count(*) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c
                         WHERE c.c_custkey < 50 AND c.c_custkey % 2 <> 0
                           AND c.c_custkey = o.o_custkey)) AS not_exists_same_set
    """,
    "join", "null-aware-anti", "sql",
)
def join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap: one NULL in the subquery makes NOT IN
    three-valued-logic to zero rows, while NOT EXISTS over the same
    non-null keys keeps them — Spark plans the former as a null-aware
    anti join (BroadcastNestedLoopJoin under the hood), the latter as a
    plain left-anti. Both counts certified against DuckDB."""
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT
          (SELECT count(*) FROM orders
           WHERE o_custkey NOT IN (SELECT CASE WHEN c_custkey % 2 = 0 THEN NULL
                                               ELSE c_custkey END
                                   FROM customer WHERE c_custkey < 50)) AS not_in_with_nulls,
          (SELECT count(*) FROM orders o
           WHERE NOT EXISTS (SELECT 1 FROM customer c
                             WHERE c.c_custkey < 50 AND c.c_custkey % 2 <> 0
                               AND c.c_custkey = o.o_custkey)) AS not_exists_same_set
        """
    )


@q(
    "op_correlated_scalar",
    """
    SELECT n_name,
           (SELECT round(max(c_acctbal), 2) FROM customer
            WHERE c_nationkey = n_nationkey) AS max_bal,
           (SELECT count(*) FROM supplier
            WHERE s_nationkey = n_nationkey) AS n_supp
    FROM nation
    """,
    "subquery", "correlated-scalar", "sql",
)
def op_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in the SELECT list (one per measure,
    different tables) — Catalyst decorrelates each into a left outer join
    against a pre-aggregate, so the per-row re-scan the syntax implies
    never happens."""
    register_views(spark, sf_dir, ("nation", "customer", "supplier"))
    return spark.sql(
        """
        SELECT n_name,
               (SELECT round(max(c_acctbal), 2) FROM customer
                WHERE c_nationkey = n_nationkey) AS max_bal,
               (SELECT count(*) FROM supplier
                WHERE s_nationkey = n_nationkey) AS n_supp
        FROM nation
        """
    )


@q(
    "op_recursive_cte",
    """
    WITH RECURSIVE tree AS (
      SELECT n_nationkey AS id, 0 AS depth FROM nation WHERE n_nationkey = 0
      UNION ALL
      SELECT n.n_nationkey, t.depth + 1
      FROM nation n JOIN tree t
        ON CAST(floor((n.n_nationkey - 1) / 2) AS BIGINT) = t.id
      WHERE n.n_nationkey > 0
    )
    SELECT depth, count(*) AS n, CAST(sum(id) AS BIGINT) AS id_sum
    FROM tree GROUP BY depth
    """,
    "recursive-cte", "sql",
)
def op_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE — a capability the
    reference engine does NOT have): the nation keys arranged as an
    implicit binary heap (parent = floor((k-1)/2)) expanded from the
    root, reporting nodes per depth. Same recursive SQL runs on both
    engines."""
    register_views(spark, sf_dir, ("nation",))
    return spark.sql(
        """
        WITH RECURSIVE tree AS (
          SELECT n_nationkey AS id, 0 AS depth FROM nation WHERE n_nationkey = 0
          UNION ALL
          SELECT n.n_nationkey, t.depth + 1
          FROM nation n JOIN tree t
            ON CAST(floor((n.n_nationkey - 1) / 2) AS BIGINT) = t.id
          WHERE n.n_nationkey > 0
        )
        SELECT depth, count(*) AS n, sum(id) AS id_sum
        FROM tree GROUP BY depth
        """
    )


@q(
    "op_parameterized_sql",
    """
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 250000
    GROUP BY o_orderpriority
    """,
    "sql", "parameterized",
)
def op_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (spark.sql(query, args=...)): values bind as
    typed literals, not string splices — the injection-safe templating
    every production SQL entry point should use."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice > :min_price
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "min_price": 250000},
    )


@q(
    "op_sql_features",
    """
    SELECT grp, n, n * 2 AS doubled, n * 2 + 10 AS with_thresh
    FROM (
      SELECT l_returnflag AS grp, count(*) AS n
      FROM lineitem WHERE l_orderkey < 1000 GROUP BY l_returnflag
    )
    """,
    "sql", "spark4-surface",
)
def op_sql_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-surface sweep in one query: GROUP BY ALL (group on
    every non-aggregate column), lateral column alias (`doubled` built
    from `n` in the same SELECT), a session variable (DECLARE/SET VAR)
    read as a literal, and IDENTIFIER()-resolved table name — the
    ANSI-surface conveniences a SQL-first migration expects."""
    register_views(spark, sf_dir, ("lineitem",))
    spark.sql("DECLARE OR REPLACE VARIABLE graft_thresh INT DEFAULT 5")
    spark.sql("SET VAR graft_thresh = 10")
    return spark.sql(
        """
        SELECT grp, n, n * 2 AS doubled,
               doubled + graft_thresh AS with_thresh
        FROM (
          SELECT l_returnflag AS grp, count(*) AS n
          FROM IDENTIFIER('lineitem') WHERE l_orderkey < 1000
          GROUP BY ALL
        )
        """
    )


@q(
    "op_cbo_stats",
    """
    SELECT count(*) AS stat_rows, count(*) AS true_rows,
           count(DISTINCT p_brand) AS n_brands
    FROM part
    """,
    "sql", "cbo", "statistics",
)
def op_cbo_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based-optimizer plumbing: materialize a managed table, ANALYZE
    TABLE ... COMPUTE STATISTICS, and read the recorded rowCount back from
    the catalog — returned next to the true count so the oracle certifies
    the stat is EXACT.  These stats are what CBO join reordering and
    broadcast-threshold decisions consume on a real warehouse (the
    reference relies on vanilla Spark stats the same way)."""
    import shutil

    (part,) = _t(spark, sf_dir, "part")
    # the in-memory catalog forgets tables between sessions while their
    # warehouse directories persist — drop both before recreating
    spark.sql("DROP TABLE IF EXISTS cbo_part")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/cbo_part", ignore_errors=True)
    part.write.mode("overwrite").saveAsTable("cbo_part")
    spark.sql("ANALYZE TABLE cbo_part COMPUTE STATISTICS")
    desc = spark.sql("DESCRIBE TABLE EXTENDED cbo_part").collect()
    stats_line = next(
        (r.data_type for r in desc if r.col_name == "Statistics"), ""
    )
    # "X bytes, N rows"
    import re

    m = re.search(r"(\d+) rows", stats_line)
    stat_rows = int(m.group(1)) if m else -1
    true_rows = spark.table("cbo_part").count()
    n_brands = (
        spark.table("cbo_part").select("p_brand").distinct().count()
    )
    return spark.range(1).select(
        F.lit(stat_rows).cast("bigint").alias("stat_rows"),
        F.lit(true_rows).cast("bigint").alias("true_rows"),
        F.lit(n_brands).cast("bigint").alias("n_brands"),
    )


@q(
    "chx_json_collapse",
    """
    WITH docs AS (
      SELECT printf('{"k": %d, "t": "%s", "u": %d}',
                    CAST(json_extract_string(props, '$.k') AS INT),
                    event_type, CAST(user_id AS INT)) AS doc
      FROM events WHERE event_id < 2000
    )
    SELECT json_extract_string(doc, '$.t') AS t,
           count(*) AS n,
           CAST(sum(CAST(json_extract(doc, '$.k') AS INT)) AS BIGINT) AS k_sum,
           count(DISTINCT CAST(json_extract(doc, '$.u') AS BIGINT)) AS n_users
    FROM docs GROUP BY 1
    """,
    "chx", "json", "rewrite",
)
def chx_json_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH-backend CollapseGetJsonObjectExpressionRule analog
    (backends-clickhouse/.../CollapseGetJsonObjectExpressionRule.scala):
    N get_json_object calls on the same document = N full JSON parses;
    the rewrite parses ONCE into a struct and projects fields.  Here the
    collapsed form is built directly — a single from_json over the
    document, three field accesses, zero get_json_object (plan-asserted
    in tests/test_plans.py).  The oracle extracts the same three paths
    with DuckDB's json functions."""
    (ev,) = _t(spark, sf_dir, "events")
    doc = F.format_string(
        '{"k": %s, "t": "%s", "u": %s}',
        F.get_json_object("props", "$.k").cast("int"),
        F.col("event_type"),
        F.col("user_id"),
    )
    parsed = (
        ev.filter(F.col("event_id") < 2000)
        .select(doc.alias("doc"))
        .select(
            "doc",
            F.from_json("doc", "k INT, t STRING, u BIGINT").alias("j"),
        )
    )
    return parsed.groupBy(F.col("j.t").alias("t")).agg(
        F.count("*").alias("n"),
        F.sum("j.k").cast("bigint").alias("k_sum"),
        F.countDistinct("j.u").alias("n_users"),
    )


@q(
    "agg_hll_sketch_rollup",
    """
    SELECT day(ts) AS d,
           CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
           count(*) AS n_events
    FROM events GROUP BY day(ts)
    UNION ALL
    SELECT 0 AS d,
           CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
           count(*) AS n_events
    FROM events
    """,
    "agg", "sketch", "rollup",
)
def agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RE-AGGREGATABLE distinct-count sketches (hll_sketch_agg /
    hll_union_agg / hll_sketch_estimate, Spark 3.5 Datasketches): one
    scan builds per-day HLL sketches; the corpus-wide distinct count
    comes from UNIONING the daily sketches, never rescanning the fact —
    the pre-aggregated-cube pattern that makes distinct counts
    tractable at 100 TB (approx_count_distinct alone cannot roll up).
    lgConfigK=14 keeps the sketch in exact mode at fixture
    cardinalities (~1.5k users), so the exact-count oracle hash-matches
    while the PLAN is the genuine sketch pipeline.  Reference:
    ExpressionMappings.scala:309 (HLL rewrite family),
    HLLRewriteRule.scala."""
    (ev,) = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk"),
        F.count("*").alias("n_events"),
    )
    per_day = daily.select(
        "d",
        F.expr("CAST(hll_sketch_estimate(sk) AS BIGINT)").alias(
            "distinct_users"
        ),
        "n_events",
    )
    total = daily.agg(
        F.expr(
            "CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)"
        ).alias("distinct_users"),
        F.sum("n_events").alias("n_events"),
    ).select(F.lit(0).cast("int").alias("d"), "distinct_users", "n_events")
    return per_day.unionAll(total)


@q(
    "op_pipe_sql",
    """
    SELECT o_orderpriority, count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    "sql", "spark4-surface", "pipe",
)
def op_pipe_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `|>` operators): the same logical plan
    as the classic form, written as a linear FROM -> WHERE ->
    AGGREGATE pipeline.  Catalyst parses pipes into the identical
    tree, so the entry certifies the *parser surface*, not new
    semantics — exactly how the reference treats SQL dialect features
    (they ride through to the same Substrait plan)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE count(*) AS n,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                  AS DOUBLE) AS total
             GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n, total
        """
    )


@q(
    "op_collation",
    """
    WITH mixed AS (
      SELECT CASE WHEN p_partkey % 2 = 0
                  THEN upper(p_type)
                  ELSE lower(p_type) END AS tc
      FROM part
    )
    SELECT lower(min(tc)) AS t, count(*) AS n
    FROM mixed
    GROUP BY lower(tc)
    """,
    "sql", "spark4-surface", "collation",
)
def op_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4 COLLATE): case-INSENSITIVE grouping
    via UTF8_LCASE over a deliberately mixed-case column — upper/lower
    variants of the same type land in ONE group without any lower()
    normalization in the grouping key.  The oracle normalizes with
    lower() instead (DuckDB's equivalent), and both emit
    lower(min(raw)) so the displayed key is deterministic.  Reference
    analog: the CH backend's case-insensitive-only limitation
    (docs/velox-backend-limitations.md) — here the engine supports BOTH
    binary and LCASE collations per expression."""
    register_views(spark, sf_dir, ("part",))
    return spark.sql(
        """
        WITH mixed AS (
          SELECT CASE WHEN p_partkey % 2 = 0
                      THEN upper(p_type)
                      ELSE lower(p_type) END AS tc
          FROM part
        )
        SELECT lower(min(tc)) AS t, count(*) AS n
        FROM mixed
        GROUP BY tc COLLATE UTF8_LCASE
        """
    )


@q(
    "op_execute_immediate",
    """
    SELECT p_brand, count(*) AS n
    FROM part WHERE p_size < 25
    GROUP BY p_brand
    """,
    "sql", "spark4-surface", "dynamic-sql",
)
def op_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE (Spark 4 dynamic SQL): a query TEXT built at
    runtime, executed with a positional parameter — the stored-
    procedure-style surface SQL-first migrations expect.  The
    parameter binds as a true literal in the plan (no string
    concatenation), so pushdown still applies."""
    register_views(spark, sf_dir, ("part",))
    return spark.sql(
        "EXECUTE IMMEDIATE "
        "'SELECT p_brand, count(*) AS n FROM part WHERE p_size < ? "
        "GROUP BY p_brand' USING 25"
    )


@q(
    "op_sql_scripting",
    """
    SELECT CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_1997,
           CAST(12 AS INT) AS n_iterations
    FROM orders WHERE year(o_orderdate) = 1997
    """,
    "sql", "spark4-surface", "scripting",
)
def op_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN/END compound statements): DECLARE +
    WHILE loop accumulating per-month revenue through 12 iterations of
    real scalar subqueries — the procedural control-flow surface of a
    SQL-first migration.  The accumulator is DECIMAL so the 12
    sequential adds are exact and the single-query oracle
    hash-matches; each iteration's subquery still plans with pushdown
    (month+year predicates reach the scan)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        BEGIN
          DECLARE m INT DEFAULT 1;
          DECLARE total DECIMAL(18,4) DEFAULT 0;
          WHILE m <= 12 DO
            SET total = total + (
              SELECT coalesce(sum(CAST(o_totalprice AS DECIMAL(18,4))),
                              CAST(0 AS DECIMAL(18,4)))
              FROM orders
              WHERE year(o_orderdate) = 1997 AND month(o_orderdate) = m
            );
            SET m = m + 1;
          END WHILE;
          SELECT CAST(round(total, 2) AS DOUBLE) AS total_1997,
                 CAST(m - 1 AS INT) AS n_iterations;
        END
        """
    )


@q(
    "op_column_defaults",
    """
    WITH partial_rows AS (
      SELECT o_orderkey AS k, 'none' AS priority, CAST(0.0 AS DOUBLE) AS price
      FROM orders WHERE o_orderkey < 1000
    ), full_rows AS (
      SELECT o_orderkey AS k, o_orderpriority AS priority, o_totalprice AS price
      FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2000
    )
    SELECT priority, count(*) AS n,
           CAST(round(sum(CAST(price AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total
    FROM (SELECT * FROM partial_rows UNION ALL SELECT * FROM full_rows)
    GROUP BY priority
    """,
    "sql", "spark4-surface", "ddl-defaults",
)
def op_column_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEFAULT column values (ANSI DDL surface): a table declares
    per-column defaults; a PARTIAL insert (key only) fills them in, a
    full insert overrides them.  The oracle simulates the two insert
    paths with literal defaults — certifying that the engine's
    default-resolution produced exactly those rows."""
    import shutil

    register_views(spark, sf_dir, ("orders",))
    spark.sql("DROP TABLE IF EXISTS graft_defaults")
    # the in-memory catalog forgets tables across sessions while the
    # managed location persists — clear it or CREATE fails with
    # LOCATION_ALREADY_EXISTS (same pitfall as op_cbo_stats)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/graft_defaults", ignore_errors=True)
    spark.sql(
        "CREATE TABLE graft_defaults "
        "(k BIGINT, priority STRING DEFAULT 'none', "
        "price DOUBLE DEFAULT 0.0) USING parquet"
    )
    spark.sql(
        "INSERT INTO graft_defaults (k) "
        "SELECT o_orderkey FROM orders WHERE o_orderkey < 1000"
    )
    spark.sql(
        "INSERT INTO graft_defaults "
        "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders "
        "WHERE o_orderkey >= 1000 AND o_orderkey < 2000"
    )
    return spark.sql(
        """
        SELECT priority, count(*) AS n,
               CAST(round(sum(CAST(price AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS total
        FROM graft_defaults GROUP BY priority
        """
    )
