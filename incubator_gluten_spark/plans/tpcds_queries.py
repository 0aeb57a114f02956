"""TPC-DS-shaped queries adapted to the driver's star schema.

The reference's second corpus is TPC-DS 103
(tools/gluten-it/common/src/main/resources/tpcds-queries/). The DS schema
isn't in the fixtures, but the *query shapes* that distinguish DS from
TPC-H — multi-CTE pipelines, year-over-year self-comparisons, rollup
reports with grouping flags, ranked category reports, channel unions,
exists/in-chained filters — map directly onto orders/lineitem/customer.
Each entry names the DS query family it mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from incubator_gluten_spark.catalog import load_tables
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


@q(
    "ds_yoy_growth",
    """
    WITH yearly AS (
      SELECT o_custkey, year(o_orderdate) AS yr, sum(o_totalprice) AS total
      FROM orders GROUP BY 1, 2
    )
    SELECT a.o_custkey, a.yr AS yr,
           round(a.total, 2) AS cur_total,
           round(b.total, 2) AS prev_total,
           round(a.total / b.total, 4) AS growth
    FROM yearly a JOIN yearly b
      ON a.o_custkey = b.o_custkey AND a.yr = b.yr + 1
    WHERE b.total > 0 AND a.total / b.total > 1.5
    """,
    "tpcds", "cte", "self-join",
)
def ds_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth self-join (TPC-DS q74/q11 shape)."""
    (orders,) = _t(spark, sf_dir, "orders")
    yearly = orders.groupBy(
        "o_custkey", F.year("o_orderdate").alias("yr")
    ).agg(F.sum("o_totalprice").alias("total"))
    a, b = yearly.alias("a"), yearly.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.yr") == F.col("b.yr") + 1),
        )
        .filter((F.col("b.total") > 0) & (F.col("a.total") / F.col("b.total") > 1.5))
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.yr").alias("yr"),
            F.round("a.total", 2).alias("cur_total"),
            F.round("b.total", 2).alias("prev_total"),
            F.round(F.col("a.total") / F.col("b.total"), 4).alias("growth"),
        )
    )


@q(
    "ds_rollup_report",
    """
    SELECT n_name, c_mktsegment,
           CAST(grouping(n_name) AS INT) + CAST(grouping(c_mktsegment) AS INT) AS lvl,
           count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
    "tpcds", "rollup",
)
def ds_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup report with level indicator (TPC-DS q18/q22
    shape: aggregates at item/class/category levels)."""
    customer, nation = _t(spark, sf_dir, "customer", "nation")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("n_name", "c_mktsegment")
        .agg(
            (F.grouping("n_name").cast("int") + F.grouping("c_mktsegment").cast("int")).alias("lvl"),
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .select("n_name", "c_mktsegment", "lvl", "n_cust", "total_bal")
    )


@q(
    "ds_ranked_categories",
    """
    SELECT * FROM (
      SELECT p_brand, p_type, round(sum(l_extendedprice), 2) AS revenue,
             rank() OVER (PARTITION BY p_brand
                          ORDER BY sum(l_extendedprice) DESC, p_type) AS rnk
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, p_type
    ) WHERE rnk <= 3
    """,
    "tpcds", "window",
)
def ds_ranked_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-within-category over an aggregate (TPC-DS q67/q86 shape)."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    agg = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.sum("l_extendedprice").alias("rev_raw"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("rev_raw"), F.asc("p_type"))
    return (
        agg.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "p_brand",
            "p_type",
            F.round("rev_raw", 2).alias("revenue"),
            "rnk",
        )
    )


@q(
    "ds_channel_union",
    """
    SELECT channel, seg, count(*) AS n, round(sum(amt), 2) AS total FROM (
      SELECT 'small' AS channel, l_returnflag AS seg, l_extendedprice AS amt
      FROM lineitem WHERE l_quantity < 10
      UNION ALL
      SELECT 'bulk' AS channel, l_returnflag AS seg, l_extendedprice AS amt
      FROM lineitem WHERE l_quantity >= 40
      UNION ALL
      SELECT 'mid' AS channel, l_returnflag AS seg, l_extendedprice AS amt
      FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 40
    ) GROUP BY channel, seg
    """,
    "tpcds", "union",
)
def ds_channel_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-channel union + shared aggregate (TPC-DS q5/q77 shape)."""
    (li,) = _t(spark, sf_dir, "lineitem")

    def chan(name: str, cond) -> DataFrame:
        return li.filter(cond).select(
            F.lit(name).alias("channel"),
            F.col("l_returnflag").alias("seg"),
            F.col("l_extendedprice").alias("amt"),
        )

    unioned = (
        chan("small", F.col("l_quantity") < 10)
        .unionAll(chan("bulk", F.col("l_quantity") >= 40))
        .unionAll(
            chan("mid", (F.col("l_quantity") >= 10) & (F.col("l_quantity") < 40))
        )
    )
    return unioned.groupBy("channel", "seg").agg(
        F.count("*").alias("n"), F.round(F.sum("amt"), 2).alias("total")
    )


@q(
    "ds_in_exists_chain",
    """
    SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
      AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)
    """,
    "tpcds", "subquery", "sql",
)
def ds_in_exists_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained IN / EXISTS / NOT IN subqueries (TPC-DS q10/q35 shape) —
    Catalyst decorrelates into semi/anti join cascades."""
    from incubator_gluten_spark.catalog import register_views

    register_views(spark, sf_dir, ("orders", "customer", "lineitem"))
    return spark.sql(
        """
        SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'MACHINERY')
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
          AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
                                 WHERE l_quantity > 49)
        """
    )


@q(
    "ds_cust_percentile_band",
    """
    WITH ranked AS (
      SELECT c_custkey, c_acctbal,
             ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS decile
      FROM customer
    )
    SELECT decile, count(*) AS n,
           round(min(c_acctbal), 2) AS lo, round(max(c_acctbal), 2) AS hi
    FROM ranked GROUP BY decile
    """,
    "tpcds", "window",
)
def ds_cust_percentile_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global decile banding then per-band stats (TPC-DS q49 shape).
    Note: the unpartitioned window forces a single-partition sort — fine
    for a dimension table, a deliberate anti-pattern for fact tables."""
    (customer,) = _t(spark, sf_dir, "customer")
    w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    ranked = customer.select(
        "c_custkey", "c_acctbal", F.ntile(10).over(w).alias("decile")
    )
    return ranked.groupBy("decile").agg(
        F.count("*").alias("n"),
        F.round(F.min("c_acctbal"), 2).alias("lo"),
        F.round(F.max("c_acctbal"), 2).alias("hi"),
    )


@q(
    "ds_multi_slot_counts",
    """
    SELECT
      (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10)  AS slot1,
      (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) AS slot2,
      (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) AS slot3,
      (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) AS slot4,
      (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) AS slot5
    """,
    "tpcds", "multi-scan",
)
def ds_multi_slot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q88 shape: N independent slot counts over one table. Rather
    than q88's eight self-scans, a single scan with conditional counts —
    the scan-once rewrite every columnar engine wants."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.agg(
        *[
            F.count_if(F.col("l_quantity").between(lo, lo + 9)).alias(f"slot{i+1}")
            for i, lo in enumerate((1, 11, 21, 31, 41))
        ]
    )


@q(
    "ds_having_join",
    """
    SELECT c_custkey, c_name, cnt FROM customer JOIN (
      SELECT o_custkey, count(*) AS cnt FROM orders
      GROUP BY o_custkey HAVING count(*) >= 15
    ) t ON c_custkey = o_custkey
    """,
    "tpcds", "having",
)
def ds_having_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q34/q73 shape: aggregate with HAVING joined back to the
    dimension. Aggregating BEFORE the join shrinks the join input to the
    qualifying keys only."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    frequent = (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 15)
    )
    return customer.join(
        frequent, F.col("c_custkey") == F.col("o_custkey")
    ).select("c_custkey", "c_name", "cnt")


@q(
    "ds_cumulative_share",
    """
    SELECT n_name, yr, round(total, 2) AS total,
           round(sum(total) OVER (PARTITION BY n_name ORDER BY yr
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running,
           round(total / sum(total) OVER (PARTITION BY n_name), 6) AS share
    FROM (
      SELECT n_name, year(o_orderdate) AS yr, sum(o_totalprice) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    )
    """,
    "tpcds", "window", "cte",
)
def ds_cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q51 shape: cumulative window over a pre-aggregated series
    plus share-of-total (unbounded partition sum)."""
    from pyspark.sql import Window as W

    orders, customer, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    yearly = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(F.sum("o_totalprice").alias("total"))
    )
    wrun = W.partitionBy("n_name").orderBy("yr").rowsBetween(W.unboundedPreceding, 0)
    wall = W.partitionBy("n_name")
    return yearly.select(
        "n_name",
        "yr",
        F.round("total", 2).alias("total"),
        F.round(F.sum("total").over(wrun), 2).alias("running"),
        F.round(F.col("total") / F.sum("total").over(wall), 6).alias("share"),
    )


@q(
    "ds_returns_anti",
    """
    SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS total
    FROM lineitem
    WHERE l_orderkey NOT IN (
      SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 300000
    )
    GROUP BY l_returnflag
    """,
    "tpcds", "anti",
)
def ds_returns_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q93-returns shape: exclude the return-like order set with an
    anti join, then aggregate what remains."""
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    excluded = orders.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 300000)
    ).select("o_orderkey")
    return (
        li.join(excluded, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
    )


@q(
    "ds_cross_channel_customers",
    """
    SELECT count(*) AS n_both FROM (
      SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    )
    """,
    "tpcds", "setop",
)
def ds_cross_channel_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q38/q87 shape: customers present in multiple 'channels'
    (priority classes standing in for store/web/catalog)."""
    (orders,) = _t(spark, sf_dir, "orders")
    urgent = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return urgent.intersect(low).agg(F.count("*").alias("n_both"))


@q(
    "ds_cov_stats",
    """
    SELECT p_brand, n, round(mean_q, 4) AS mean_q, round(cov, 4) AS cov
    FROM (
      SELECT p_brand, count(*) AS n,
             sum(l_quantity) / count(*) AS mean_q,
             sqrt((sum(l_quantity * l_quantity)
                   - sum(l_quantity) * sum(l_quantity) / count(*))
                  / (count(*) - 1))
               / (sum(l_quantity) / count(*)) AS cov
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
    ) WHERE cov > 0.5
    """,
    "tpcds", "stats",
)
def ds_cov_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q17 shape: coefficient of variation of quantity per brand,
    keeping high-variance brands. Variance is computed from the exact
    moments (n, sum q, sum q^2 — integer-valued doubles, so both engines
    sum them exactly) with the identical closed-form expression, which
    makes the hash deterministic where stddev_samp's streaming merge order
    would not be."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    m = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("s1"),
            F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("s2"),
        )
    )
    mean_q = F.col("s1") / F.col("n")
    cov = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    ) / mean_q
    return (
        m.select(
            "p_brand",
            "n",
            F.round(mean_q, 4).alias("mean_q"),
            F.round(cov, 4).alias("cov"),
        )
        .filter(cov > 0.5)
    ).select("p_brand", "n", "mean_q", "cov")


@q(
    "ds_promo_ratio",
    """
    SELECT n_name,
           CAST(sum(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             AS promo_share
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    "tpcds", "conditional-agg",
)
def ds_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q61 shape: promotional revenue share per nation — one scan,
    conditional aggregation instead of q61's two correlated scalar
    subqueries. Decimal accumulation keeps both engines' sums exact; the
    final double division is then bit-identical."""
    li, part, supplier, nation = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    dec = F.col("l_extendedprice").cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", dec).otherwise(zero))
                .cast("double")
                / F.sum(dec).cast("double")
            ).alias("promo_share")
        )
    )


@q(
    "ds_ampm_ratio",
    """
    SELECT event_type,
           count(*) FILTER (WHERE hour(ts) < 12) AS am,
           count(*) FILTER (WHERE hour(ts) >= 12) AS pm,
           round(CAST(count(*) FILTER (WHERE hour(ts) < 12) AS DOUBLE)
                 / count(*) FILTER (WHERE hour(ts) >= 12), 6) AS ratio
    FROM events GROUP BY event_type
    """,
    "tpcds", "conditional-agg", "events",
)
def ds_ampm_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q90 shape (am/pm request ratio) over the events table: two
    time-window counts from ONE scan via count_if, where q90 scans the
    fact table twice and cross-joins the scalar counts."""
    (ev,) = _t(spark, sf_dir, "events")
    am = F.count_if(F.hour("ts") < 12)
    pm = F.count_if(F.hour("ts") >= 12)
    return ev.groupBy("event_type").agg(
        am.alias("am"),
        pm.alias("pm"),
        F.round(am.cast("double") / pm, 6).alias("ratio"),
    )


@q(
    "ds_above_nation_avg",
    """
    WITH per_cust AS (
      SELECT c_custkey, c_nationkey,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS total
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_nationkey
    )
    SELECT c_custkey, CAST(round(total, 2) AS DOUBLE) AS total
    FROM (
      SELECT c_custkey, total,
             CAST(sum(total) OVER (PARTITION BY c_nationkey) AS DOUBLE)
               / count(*) OVER (PARTITION BY c_nationkey) AS nation_avg
      FROM per_cust
    ) WHERE CAST(total AS DOUBLE) > 1.2 * nation_avg
    """,
    "tpcds", "window", "correlated",
)
def ds_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q1 shape: customers whose lifetime spend exceeds 1.2x their
    nation's average — the correlated aggregate subquery decorrelated into
    a window over the grouped totals (one shuffle on nationkey instead of
    a re-scan per row). The threshold is derived from the exact decimal
    sum with the same expression on both engines, so the predicate
    boundary is deterministic."""
    from pyspark.sql import Window as W

    customer, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("total"))
    )
    w = W.partitionBy("c_nationkey")
    nation_avg = F.sum("total").over(w).cast("double") / F.count("*").over(w)
    return (
        per_cust.withColumn("nation_avg", nation_avg)
        .filter(F.col("total").cast("double") > 1.2 * F.col("nation_avg"))
        .select(
            "c_custkey", F.round("total", 2).cast("double").alias("total")
        )
    )


@q(
    "ds_first_order_cohort",
    """
    WITH firsts AS (
      SELECT o_custkey, year(min(o_orderdate)) AS cohort_yr
      FROM orders GROUP BY o_custkey
    )
    SELECT cohort_yr, count(*) AS n_cust,
           CAST(round(sum(spend), 2) AS DOUBLE) AS cohort_spend
    FROM firsts JOIN (
      SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,4))) AS spend
      FROM orders GROUP BY o_custkey
    ) s ON firsts.o_custkey = s.o_custkey
    GROUP BY cohort_yr
    """,
    "tpcds", "cohort",
)
def ds_first_order_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q11 shape: first-purchase-year cohorts with lifetime spend.
    One groupBy computes both the cohort year (min date) and the spend, so
    the 'two CTEs' collapse into a single shuffle."""
    (orders,) = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.year(F.min("o_orderdate")).alias("cohort_yr"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("spend"),
    )
    return per_cust.groupBy("cohort_yr").agg(
        F.count("*").alias("n_cust"),
        F.round(F.sum("spend"), 2).cast("double").alias("cohort_spend"),
    )


@q(
    "ds_monthly_deviation",
    """
    WITH monthly AS (
      SELECT n_name, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2, 3
    ), windowed AS (
      SELECT n_name, yr, mo, rev,
             sum(rev) OVER w AS prev3_sum,
             count(*) OVER w AS prev3_n
      FROM monthly
      WINDOW w AS (PARTITION BY n_name ORDER BY yr, mo
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
    )
    SELECT n_name, yr, mo,
           CAST(round(rev, 2) AS DOUBLE) AS rev,
           CAST(round(prev3_sum, 2) AS DOUBLE) AS prev3_sum,
           round(CAST(rev AS DOUBLE) * 3 / CAST(prev3_sum AS DOUBLE), 4) AS vs_trailing
    FROM windowed
    WHERE prev3_n = 3 AND CAST(rev AS DOUBLE) * 3 > 1.5 * CAST(prev3_sum AS DOUBLE)
    """,
    "tpcds", "window", "timeseries",
)
def ds_monthly_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q47 shape: monthly revenue vs the trailing-3-month window,
    keeping months that spike >1.5x the trailing average. The trailing
    frame is ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING (excludes the
    current row); exact decimal sums make the spike predicate
    engine-stable."""
    from pyspark.sql import Window as W

    orders, customer, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    monthly = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"))
    )
    w = W.partitionBy("n_name").orderBy("yr", "mo").rowsBetween(-3, -1)
    windowed = monthly.select(
        "n_name",
        "yr",
        "mo",
        "rev",
        F.sum("rev").over(w).alias("prev3_sum"),
        F.count("*").over(w).alias("prev3_n"),
    )
    rev_d = F.col("rev").cast("double")
    prev_d = F.col("prev3_sum").cast("double")
    return (
        windowed.filter((F.col("prev3_n") == 3) & (rev_d * 3 > 1.5 * prev_d))
        .select(
            "n_name",
            "yr",
            "mo",
            F.round("rev", 2).cast("double").alias("rev"),
            F.round("prev3_sum", 2).cast("double").alias("prev3_sum"),
            F.round(rev_d * 3 / prev_d, 4).alias("vs_trailing"),
        )
    )


@q(
    "ds_quarter_share_shift",
    """
    WITH q AS (
      SELECT n_name, year(o_orderdate) AS yr, quarter(o_orderdate) AS qt,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE year(o_orderdate) = 1997
      GROUP BY 1, 2, 3
    ), tot AS (
      SELECT yr, qt, sum(rev) AS all_rev FROM q GROUP BY yr, qt
    )
    SELECT a.n_name AS n_name,
           round(CAST(a.rev AS DOUBLE) / CAST(ta.all_rev AS DOUBLE), 6) AS q1_share,
           round(CAST(b.rev AS DOUBLE) / CAST(tb.all_rev AS DOUBLE), 6) AS q4_share
    FROM q a JOIN q b ON a.n_name = b.n_name AND a.yr = b.yr
    JOIN tot ta ON ta.yr = a.yr AND ta.qt = a.qt
    JOIN tot tb ON tb.yr = b.yr AND tb.qt = b.qt
    WHERE a.qt = 1 AND b.qt = 4
      AND CAST(a.rev AS DOUBLE) / CAST(ta.all_rev AS DOUBLE)
        > CAST(b.rev AS DOUBLE) / CAST(tb.all_rev AS DOUBLE)
    """,
    "tpcds", "share", "self-join",
)
def ds_quarter_share_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q31 shape: market-share shift between Q1 and Q4 — per-nation
    share of total revenue in each quarter, keeping nations whose share
    fell. Expressed with ONE aggregation + a share window over the quarter
    (no re-join against a totals CTE), then a pivot-style self-join q1-vs-q4."""
    from pyspark.sql import Window as W

    orders, customer, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    q = (
        orders.filter(F.year("o_orderdate") == 1997)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qt"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"))
        .withColumn(
            "share",
            F.col("rev").cast("double")
            / F.sum("rev").over(W.partitionBy("yr", "qt")).cast("double"),
        )
    )
    a = q.filter(F.col("qt") == 1).select("n_name", F.col("share").alias("s1"))
    b = q.filter(F.col("qt") == 4).select(
        F.col("n_name").alias("n2"), F.col("share").alias("s4")
    )
    return (
        a.join(b, F.col("n_name") == F.col("n2"))
        .filter(F.col("s1") > F.col("s4"))
        .select(
            "n_name",
            F.round("s1", 6).alias("q1_share"),
            F.round("s4", 6).alias("q4_share"),
        )
    )


@q(
    "ds_below_half_avg",
    """
    WITH per_part AS (
      SELECT p_partkey, p_brand, sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_partkey, p_brand
    )
    SELECT p_partkey, p_brand, CAST(round(rev, 2) AS DOUBLE) AS rev
    FROM (
      SELECT p_partkey, p_brand, rev,
             CAST(sum(rev) OVER (PARTITION BY p_brand) AS DOUBLE)
               / count(*) OVER (PARTITION BY p_brand) AS brand_avg
      FROM per_part
    ) WHERE CAST(rev AS DOUBLE) < 0.5 * brand_avg
    """,
    "tpcds", "window", "correlated",
)
def ds_below_half_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q65 shape: parts selling below half their brand's average —
    correlated avg decorrelated into a window over the per-part aggregate."""
    from pyspark.sql import Window as W

    li, part = _t(spark, sf_dir, "lineitem", "part")
    per_part = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_brand")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("rev"))
    )
    w = W.partitionBy("p_brand")
    brand_avg = F.sum("rev").over(w).cast("double") / F.count("*").over(w)
    return (
        per_part.withColumn("brand_avg", brand_avg)
        .filter(F.col("rev").cast("double") < 0.5 * F.col("brand_avg"))
        .select(
            "p_partkey", "p_brand", F.round("rev", 2).cast("double").alias("rev")
        )
    )


@q(
    "ds_worst_return_ratio",
    """
    SELECT * FROM (
      SELECT l_suppkey,
             round(CAST(sum(CASE WHEN l_returnflag = 'R'
                            THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE)
                   / CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6) AS ret_ratio,
             rank() OVER (ORDER BY
               CAST(sum(CASE WHEN l_returnflag = 'R'
                        THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE)
               / CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) DESC,
               l_suppkey) AS rnk
      FROM lineitem GROUP BY l_suppkey
    ) WHERE rnk <= 10
    """,
    "tpcds", "window", "ratio",
)
def ds_worst_return_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q49 shape: rank suppliers by return ratio, keep the 10 worst.
    The rank's ORDER BY includes the supplier key so ties are broken
    deterministically on both engines."""
    from pyspark.sql import Window as W

    (li,) = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,4)")
    per_supp = li.groupBy("l_suppkey").agg(
        (
            F.sum(F.when(F.col("l_returnflag") == "R", qty)).cast("double")
            / F.sum(qty).cast("double")
        ).alias("ratio")
    )
    w = W.orderBy(F.desc("ratio"), F.asc("l_suppkey"))
    return (
        per_supp.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 10)
        .select("l_suppkey", F.round("ratio", 6).alias("ret_ratio"), "rnk")
    )


@q(
    "ds_except_counts",
    """
    SELECT count(*) AS n_store_only FROM (
      SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    )
    """,
    "tpcds", "setop",
)
def ds_except_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q87 shape: customers in one channel but NOT another —
    EXCEPT (distinct anti-semantics), the set-op cousin of the NOT IN
    anti join."""
    (orders,) = _t(spark, sf_dir, "orders")
    hi = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_custkey")
    lo = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return hi.subtract(lo).agg(F.count("*").alias("n_store_only"))


@q(
    "ds_full_outer_match",
    """
    SELECT count(CASE WHEN c.k IS NOT NULL AND s.k IS NOT NULL THEN 1 END) AS n_both,
           count(CASE WHEN s.k IS NULL THEN 1 END) AS n_cust_only,
           count(CASE WHEN c.k IS NULL THEN 1 END) AS n_supp_only
    FROM      (SELECT DISTINCT c_nationkey AS k FROM customer WHERE c_acctbal > 9000) c
    FULL JOIN (SELECT DISTINCT s_nationkey AS k FROM supplier WHERE s_acctbal > 9000) s
      ON c.k = s.k
    """,
    "tpcds", "join", "full-outer",
)
def ds_full_outer_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q97 shape: matched/one-sided counts from a single FULL
    OUTER JOIN — one pass instead of three separate semi/anti queries."""
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    c = (
        customer.filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("ck"))
        .distinct()
    )
    s = (
        supplier.filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("sk"))
        .distinct()
    )
    j = c.join(s, F.col("ck") == F.col("sk"), "full_outer")
    return j.agg(
        F.count_if(F.col("ck").isNotNull() & F.col("sk").isNotNull()).alias("n_both"),
        F.count_if(F.col("sk").isNull()).alias("n_cust_only"),
        F.count_if(F.col("ck").isNull()).alias("n_supp_only"),
    )


@q(
    "ds_three_way_intersect",
    """
    SELECT count(*) AS n_all_three FROM (
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
    )
    """,
    "tpcds", "setop",
)
def ds_three_way_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q14 shape: items present in ALL three channels — chained
    INTERSECT. A conditional-aggregate rewrite (count distinct flags = 3)
    would be one scan; the set-op form exercises the operator chain the
    DS corpus actually uses."""
    (li,) = _t(spark, sf_dir, "lineitem")

    def keys(flag: str) -> DataFrame:
        return li.filter(F.col("l_returnflag") == flag).select("l_partkey")

    return (
        keys("R").intersect(keys("A")).intersect(keys("N")).agg(
            F.count("*").alias("n_all_three")
        )
    )


@q(
    "ds_frequent_items",
    """
    WITH freq AS (
      SELECT l_partkey FROM lineitem
      GROUP BY l_partkey HAVING count(DISTINCT l_orderkey) >= 8
    ), best AS (
      SELECT o_custkey FROM orders
      GROUP BY o_custkey
      HAVING sum(CAST(o_totalprice AS DECIMAL(18,4))) >
             (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
              FROM orders) * 0.002
    )
    SELECT count(*) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS rev
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_partkey IN (SELECT l_partkey FROM freq)
      AND o_custkey IN (SELECT o_custkey FROM best)
    """,
    "tpcds", "subquery", "semi-chain",
)
def ds_frequent_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q23 shape: revenue from FREQUENT items bought by BEST
    customers — two derived key sets applied as semi joins to the fact
    scan. Both key sets are aggregates (small) -> broadcast semi joins;
    the global-spend scalar reuses the per-customer aggregate rather than
    re-scanning orders."""
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    freq = (
        li.groupBy("l_partkey")
        .agg(F.countDistinct("l_orderkey").alias("n_ord"))
        .filter(F.col("n_ord") >= 8)
        .select("l_partkey")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("spend")
    )
    total = per_cust.agg(
        F.sum("spend").cast("double").alias("total_spend")
    )
    best = (
        per_cust.crossJoin(F.broadcast(total))
        .filter(F.col("spend").cast("double") > F.col("total_spend") * 0.002)
        .select("o_custkey")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(freq), "l_partkey", "left_semi")
        .join(F.broadcast(best), "o_custkey", "left_semi")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("rev"),
        )
    )


@q(
    "ds_rollup_rank",
    """
    WITH r AS (
      SELECT n_name, c_mktsegment,
             CAST(grouping(c_mktsegment) AS INT) AS lvl,
             sum(CAST(c_acctbal AS DECIMAL(18,4))) AS bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name, c_mktsegment)
      HAVING grouping(n_name) = 0
    )
    SELECT n_name, c_mktsegment, lvl,
           CAST(round(bal, 2) AS DOUBLE) AS bal,
           rank() OVER (PARTITION BY lvl, CASE WHEN lvl = 0 THEN n_name END
                        ORDER BY bal DESC, c_mktsegment NULLS FIRST) AS rnk
    FROM r
    """,
    "tpcds", "rollup", "window",
)
def ds_rollup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q36 shape: rollup levels ranked WITHIN their parent level
    (lvl 0 = segment within nation, lvl 1 = nation totals ranked
    globally) — Expand feeding Window, partitioned by the grouping flag."""
    from pyspark.sql import Window as W

    customer, nation = _t(spark, sf_dir, "customer", "nation")
    r = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.grouping("c_mktsegment").cast("int").alias("lvl"),
            F.grouping("n_name").cast("int").alias("g_n"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).alias("bal"),
        )
        .filter(F.col("g_n") == 0)
    )
    w = W.partitionBy(
        "lvl", F.when(F.col("lvl") == 0, F.col("n_name"))
    ).orderBy(F.desc("bal"), F.asc_nulls_first("c_mktsegment"))
    return r.select(
        "n_name",
        "c_mktsegment",
        "lvl",
        F.round("bal", 2).cast("double").alias("bal"),
        F.rank().over(w).alias("rnk"),
    )


@q(
    "ds_return_year_ratio",
    """
    WITH yr AS (
      SELECT year(l_shipdate) AS yr,
             sum(CASE WHEN l_returnflag = 'R'
                      THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS ret_qty,
             sum(CAST(l_quantity AS DECIMAL(18,4))) AS all_qty
      FROM lineitem GROUP BY 1
    )
    SELECT a.yr AS yr,
           round(CAST(a.ret_qty AS DOUBLE) / CAST(a.all_qty AS DOUBLE), 6) AS cur_ratio,
           round(CAST(b.ret_qty AS DOUBLE) / CAST(b.all_qty AS DOUBLE), 6) AS prev_ratio
    FROM yr a JOIN yr b ON a.yr = b.yr + 1
    """,
    "tpcds", "self-join", "ratio",
)
def ds_return_year_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q78 shape: year-over-year comparison of a ratio metric
    (returned share of quantity) via self-join of one pre-aggregate."""
    (li,) = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,4)")
    yr = li.groupBy(F.year("l_shipdate").alias("yr")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", qty)).alias("ret_qty"),
        F.sum(qty).alias("all_qty"),
    )
    a, b = yr.alias("a"), yr.alias("b")
    ratio = lambda side: F.round(
        F.col(f"{side}.ret_qty").cast("double")
        / F.col(f"{side}.all_qty").cast("double"),
        6,
    )
    return (
        a.join(b, F.col("a.yr") == F.col("b.yr") + 1)
        .select(
            F.col("a.yr").alias("yr"),
            ratio("a").alias("cur_ratio"),
            ratio("b").alias("prev_ratio"),
        )
    )


@q(
    "ds_top_half_contributors",
    """
    WITH nrev AS (
      SELECT n_name, sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, CAST(round(rev, 2) AS DOUBLE) AS rev
    FROM (
      SELECT n_name, rev,
             sum(rev) OVER (ORDER BY rev DESC, n_name
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum_before,
             sum(rev) OVER () AS total
      FROM nrev
    ) WHERE coalesce(CAST(cum_before AS DOUBLE), 0) < CAST(total AS DOUBLE) * 0.5
    """,
    "tpcds", "window", "pareto",
)
def ds_top_half_contributors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q15-ish Pareto cut: the smallest set of nations covering 50%
    of revenue — cumulative window over the sorted aggregate, keeping rows
    until the *preceding* cumulative crosses the threshold (so the row
    that crosses it is included)."""
    from pyspark.sql import Window as W

    orders, customer, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    nrev = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"))
    )
    wcum = W.orderBy(F.desc("rev"), F.asc("n_name")).rowsBetween(
        W.unboundedPreceding, -1
    )
    wall = W.partitionBy()
    return (
        nrev.select(
            "n_name",
            "rev",
            F.sum("rev").over(wcum).alias("cum_before"),
            F.sum("rev").over(wall).alias("total"),
        )
        .filter(
            F.coalesce(F.col("cum_before").cast("double"), F.lit(0.0))
            < F.col("total").cast("double") * 0.5
        )
        .select("n_name", F.round("rev", 2).cast("double").alias("rev"))
    )


@q(
    "ds_sequential_purchase",
    """
    WITH promo_first AS (
      SELECT o_custkey, min(o_orderdate) AS first_promo
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
      GROUP BY o_custkey
    )
    SELECT count(*) AS n_returning FROM (
      SELECT DISTINCT o.o_custkey
      FROM orders o JOIN promo_first p ON o.o_custkey = p.o_custkey
      WHERE o.o_orderdate > p.first_promo
        AND o.o_orderdate <= p.first_promo + INTERVAL 90 DAY
    )
    """,
    "tpcds", "sequential", "behavior",
)
def ds_sequential_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q54 shape: sequential behavior — customers who came BACK
    within 90 days of their first promo purchase. The per-customer anchor
    date is an aggregate joined once against orders; the window predicate
    is a non-equi band on the join."""
    orders, li, part = _t(spark, sf_dir, "orders", "lineitem", "part")
    promo_first = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(part.filter(F.col("p_type") == "PROMO")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("o_custkey")
        .agg(F.min("o_orderdate").alias("first_promo"))
        .withColumnRenamed("o_custkey", "pk")
    )
    came_back = (
        orders.join(promo_first, F.col("o_custkey") == F.col("pk"))
        .filter(
            (F.col("o_orderdate") > F.col("first_promo"))
            & (
                F.col("o_orderdate")
                <= F.col("first_promo") + F.expr("INTERVAL 90 DAY")
            )
        )
        .select("o_custkey")
        .distinct()
    )
    return came_back.agg(F.count("*").alias("n_returning"))


@q(
    "ds_ship_delay_buckets",
    """
    SELECT o_orderpriority,
           count(CASE WHEN delay <= 30 THEN 1 END) AS d30,
           count(CASE WHEN delay > 30 AND delay <= 60 THEN 1 END) AS d60,
           count(CASE WHEN delay > 60 AND delay <= 90 THEN 1 END) AS d90,
           count(CASE WHEN delay > 90 THEN 1 END) AS d_late
    FROM (
      SELECT o_orderpriority, date_diff('day', o_orderdate, l_shipdate) AS delay
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ) GROUP BY o_orderpriority
    """,
    "tpcds", "bucket-matrix",
)
def ds_ship_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q99 shape: shipping-delay bucket matrix per priority — one
    scan, conditional counts per delay band (q99's 5-column bucket
    report)."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    delay = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_orderpriority", delay.alias("delay"))
        .groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("delay") <= 30).alias("d30"),
            F.count_if((F.col("delay") > 30) & (F.col("delay") <= 60)).alias("d60"),
            F.count_if((F.col("delay") > 60) & (F.col("delay") <= 90)).alias("d90"),
            F.count_if(F.col("delay") > 90).alias("d_late"),
        )
    )


@q(
    "ds_before_after_cut",
    """
    SELECT p_brand,
           CAST(round(sum(CASE WHEN l_shipdate < TIMESTAMP '1998-01-01'
                          THEN CAST(l_extendedprice AS DECIMAL(18,4)) END), 2)
                AS DOUBLE) AS rev_before,
           CAST(round(sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01'
                          THEN CAST(l_extendedprice AS DECIMAL(18,4)) END), 2)
                AS DOUBLE) AS rev_after
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    "tpcds", "before-after",
)
def ds_before_after_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q40 shape: revenue before/after a date pivot per brand —
    the two-period comparison as conditional aggregates on one scan
    (q40 writes it as a CASE on the date, same here)."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    cut = F.lit("1998-01-01").cast("timestamp_ntz")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.when(F.col("l_shipdate") < cut, price)), 2)
            .cast("double")
            .alias("rev_before"),
            F.round(F.sum(F.when(F.col("l_shipdate") >= cut, price)), 2)
            .cast("double")
            .alias("rev_after"),
        )
    )


@q(
    "ds_order_gap_median",
    """
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap_d
      FROM orders
    )
    SELECT count(*) AS n_customers,
           round(avg(med_gap), 4) AS mean_median_gap
    FROM (
      SELECT o_custkey, median(gap_d) AS med_gap
      FROM gaps WHERE gap_d IS NOT NULL
      GROUP BY o_custkey HAVING count(*) >= 5
    )
    """,
    "tpcds", "window", "gap",
)
def ds_order_gap_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: per-customer median days between
    consecutive orders (lag window -> integer day gaps -> exact median),
    summarized. Gap days are integers, so median/avg are engine-exact."""
    from pyspark.sql import Window as W

    (orders,) = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag("o_orderdate").over(w).cast("date"),
        ).alias("gap_d"),
    ).filter(F.col("gap_d").isNotNull())
    per_cust = (
        gaps.groupBy("o_custkey")
        .agg(F.median("gap_d").alias("med_gap"), F.count("*").alias("n"))
        .filter(F.col("n") >= 5)
    )
    return per_cust.agg(
        F.count("*").alias("n_customers"),
        F.round(F.avg("med_gap"), 4).alias("mean_median_gap"),
    )


@q(
    "ds_channel_band",
    """
    WITH per_chan AS (
      SELECT l_partkey, l_returnflag AS chan,
             sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
      FROM lineitem GROUP BY 1, 2
    ), wide AS (
      SELECT l_partkey,
             sum(CASE WHEN chan = 'R' THEN rev END) AS r_rev,
             sum(CASE WHEN chan = 'A' THEN rev END) AS a_rev,
             sum(CASE WHEN chan = 'N' THEN rev END) AS n_rev
      FROM per_chan GROUP BY l_partkey
    )
    SELECT count(*) AS n_balanced FROM (
      SELECT l_partkey,
             CAST(r_rev + a_rev + n_rev AS DOUBLE) / 3 AS avg_rev
      FROM wide
      WHERE r_rev IS NOT NULL AND a_rev IS NOT NULL AND n_rev IS NOT NULL
        AND CAST(r_rev AS DOUBLE) BETWEEN 0.7 * (CAST(r_rev + a_rev + n_rev AS DOUBLE) / 3)
                                      AND 1.3 * (CAST(r_rev + a_rev + n_rev AS DOUBLE) / 3)
        AND CAST(a_rev AS DOUBLE) BETWEEN 0.7 * (CAST(r_rev + a_rev + n_rev AS DOUBLE) / 3)
                                      AND 1.3 * (CAST(r_rev + a_rev + n_rev AS DOUBLE) / 3)
        AND CAST(n_rev AS DOUBLE) BETWEEN 0.7 * (CAST(r_rev + a_rev + n_rev AS DOUBLE) / 3)
                                      AND 1.3 * (CAST(r_rev + a_rev + n_rev AS DOUBLE) / 3)
    )
    """,
    "tpcds", "channel-band",
)
def ds_channel_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q58 shape: parts whose revenue is BALANCED across all three
    channels (each within ±30% of the 3-channel mean). One aggregation
    pivoted wide — q58's three scans and double self-join collapse into a
    single shuffle; the band predicate is exact-decimal-derived so the
    boundary is engine-stable."""
    (li,) = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,4)")
    wide = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", rev)).alias("r_rev"),
            F.sum(F.when(F.col("l_returnflag") == "A", rev)).alias("a_rev"),
            F.sum(F.when(F.col("l_returnflag") == "N", rev)).alias("n_rev"),
        )
        .filter(
            F.col("r_rev").isNotNull()
            & F.col("a_rev").isNotNull()
            & F.col("n_rev").isNotNull()
        )
    )
    avg_rev = (F.col("r_rev") + F.col("a_rev") + F.col("n_rev")).cast("double") / 3
    def in_band(c):
        return F.col(c).cast("double").between(0.7 * avg_rev, 1.3 * avg_rev)
    return (
        wide.filter(in_band("r_rev") & in_band("a_rev") & in_band("n_rev"))
        .agg(F.count("*").alias("n_balanced"))
    )


@q(
    "ds_attr_combo_filter",
    """
    SELECT count(*) AS n, min(p_partkey) AS first_key
    FROM part
    WHERE (p_type = 'PROMO' AND p_size BETWEEN 1 AND 15 AND p_brand LIKE 'Brand#1%')
       OR (p_type = 'ECONOMY' AND p_size BETWEEN 20 AND 35 AND p_brand LIKE 'Brand#2%')
       OR (p_type = 'STANDARD' AND p_size BETWEEN 36 AND 50
           AND (p_brand LIKE 'Brand#3%' OR p_brand LIKE 'Brand#4%'))
    """,
    "tpcds", "predicate",
)
def ds_attr_combo_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q41 shape: deeply OR'd attribute-combination predicate —
    the disjunction stays a single scan filter (no union of scans), and
    each conjunct is independently pushable."""
    (part,) = _t(spark, sf_dir, "part")
    combo = (
        (
            (F.col("p_type") == "PROMO")
            & F.col("p_size").between(1, 15)
            & F.col("p_brand").like("Brand#1%")
        )
        | (
            (F.col("p_type") == "ECONOMY")
            & F.col("p_size").between(20, 35)
            & F.col("p_brand").like("Brand#2%")
        )
        | (
            (F.col("p_type") == "STANDARD")
            & F.col("p_size").between(36, 50)
            & (F.col("p_brand").like("Brand#3%") | F.col("p_brand").like("Brand#4%"))
        )
    )
    return part.filter(combo).agg(
        F.count("*").alias("n"), F.min("p_partkey").alias("first_key")
    )


@q(
    "ds_supplier_hhi",
    """
    WITH per_supp AS (
      SELECT n_name, l_suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name, l_suppkey
    )
    , shares AS (
      SELECT n_name,
             power(CAST(rev AS DOUBLE)
                   / CAST(sum(rev) OVER (PARTITION BY n_name) AS DOUBLE), 2)
               AS share2
      FROM per_supp
    )
    SELECT n_name, count(*) AS n_suppliers, round(sum(share2), 6) AS hhi
    FROM shares GROUP BY n_name
    """,
    "tpcds", "concentration",
)
def ds_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration report (Herfindahl index per nation): squared
    revenue shares summed per nation — a two-level aggregate where the
    share denominator is a window over the first level. Exact decimal
    revenue makes the share doubles bit-identical across engines."""
    from pyspark.sql import Window as W

    li, supplier, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    per_supp = (
        li.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "l_suppkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("rev"))
    )
    w = W.partitionBy("n_name")
    share = F.col("rev").cast("double") / F.sum("rev").over(w).cast("double")
    return (
        per_supp.withColumn("share2", F.pow(share, 2))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("share2"), 6).alias("hhi"),
        )
    )


@q(
    "ds_monthly_pivot",
    """
    SELECT n_name,
           CAST(round(coalesce(sum(CASE WHEN mo = 1  THEN rev END), 0), 2) AS DOUBLE) AS m01,
           CAST(round(coalesce(sum(CASE WHEN mo = 2  THEN rev END), 0), 2) AS DOUBLE) AS m02,
           CAST(round(coalesce(sum(CASE WHEN mo = 3  THEN rev END), 0), 2) AS DOUBLE) AS m03,
           CAST(round(coalesce(sum(CASE WHEN mo = 4  THEN rev END), 0), 2) AS DOUBLE) AS m04,
           CAST(round(coalesce(sum(CASE WHEN mo = 5  THEN rev END), 0), 2) AS DOUBLE) AS m05,
           CAST(round(coalesce(sum(CASE WHEN mo = 6  THEN rev END), 0), 2) AS DOUBLE) AS m06,
           CAST(round(coalesce(sum(CASE WHEN mo = 7  THEN rev END), 0), 2) AS DOUBLE) AS m07,
           CAST(round(coalesce(sum(CASE WHEN mo = 8  THEN rev END), 0), 2) AS DOUBLE) AS m08,
           CAST(round(coalesce(sum(CASE WHEN mo = 9  THEN rev END), 0), 2) AS DOUBLE) AS m09,
           CAST(round(coalesce(sum(CASE WHEN mo = 10 THEN rev END), 0), 2) AS DOUBLE) AS m10,
           CAST(round(coalesce(sum(CASE WHEN mo = 11 THEN rev END), 0), 2) AS DOUBLE) AS m11,
           CAST(round(coalesce(sum(CASE WHEN mo = 12 THEN rev END), 0), 2) AS DOUBLE) AS m12
    FROM (
      SELECT n_name, month(o_orderdate) AS mo,
             CAST(o_totalprice AS DECIMAL(18,4)) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE year(o_orderdate) = 1997
    ) GROUP BY n_name
    """,
    "tpcds", "pivot", "wide-report",
)
def ds_monthly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q66 shape: the 12-month wide report — a full-year pivot of
    monthly revenue per nation (explicit value list keeps planning to one
    pass; a WIDE pivot is where the one-scan conditional-agg plan beats
    q66's hand-written 12-branch CASE by nothing — they're the same plan,
    which is the point)."""
    orders, customer, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    base = (
        orders.filter(F.year("o_orderdate") == 1997)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.month("o_orderdate").alias("mo"),
            F.col("o_totalprice").cast("decimal(18,4)").alias("rev"),
        )
    )
    pivoted = (
        base.groupBy("n_name")
        .pivot("mo", list(range(1, 13)))
        .agg(F.sum("rev"))
    )
    return pivoted.select(
        "n_name",
        *[
            F.round(F.coalesce(F.col(str(m)), F.lit(0)), 2)
            .cast("double")
            .alias(f"m{m:02d}")
            for m in range(1, 13)
        ],
    )


@q(
    "ds_rank_migration",
    """
    WITH yearly AS (
      SELECT o_custkey, year(o_orderdate) AS yr,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS spend
      FROM orders WHERE year(o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2
    ), ranked AS (
      SELECT o_custkey, yr,
             rank() OVER (PARTITION BY yr ORDER BY spend DESC, o_custkey) AS rnk
      FROM yearly
    )
    SELECT a.o_custkey AS o_custkey, a.rnk AS rnk_1996, b.rnk AS rnk_1997,
           a.rnk - b.rnk AS rank_gain
    FROM ranked a JOIN ranked b
      ON a.o_custkey = b.o_custkey AND a.yr = 1996 AND b.yr = 1997
    WHERE a.rnk - b.rnk >= 200
    """,
    "tpcds", "rank-migration", "window",
)
def ds_rank_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q74 (full form): customers ranked by spend within each year,
    self-joined across years to find the biggest rank climbers — rank
    computed once per partition, the comparison a key-equi join of the
    ranked result with itself."""
    from pyspark.sql import Window as W

    (orders,) = _t(spark, sf_dir, "orders")
    yearly = (
        orders.filter(F.year("o_orderdate").isin(1996, 1997))
        .groupBy("o_custkey", F.year("o_orderdate").alias("yr"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("spend"))
    )
    w = W.partitionBy("yr").orderBy(F.desc("spend"), F.asc("o_custkey"))
    ranked = yearly.withColumn("rnk", F.rank().over(w))
    a = ranked.filter(F.col("yr") == 1996).select(
        "o_custkey", F.col("rnk").alias("rnk_1996")
    )
    b = ranked.filter(F.col("yr") == 1997).select(
        F.col("o_custkey").alias("ck2"), F.col("rnk").alias("rnk_1997")
    )
    return (
        a.join(b, F.col("o_custkey") == F.col("ck2"))
        .withColumn("rank_gain", F.col("rnk_1996") - F.col("rnk_1997"))
        .filter(F.col("rank_gain") >= 200)
        .select("o_custkey", "rnk_1996", "rnk_1997", "rank_gain")
    )


# ---------------------------------------------------------------- round 4:
# multi-channel UNION pyramids (q14/q77/q78), EXISTS-chains (q10/q35/q95),
# cross-channel cumulative/growth comparisons (q31/q4/q51), returns
# arithmetic (q93/q25), calendar ratio pivots (q59/q66), threshold scans
# (q6/q65), frequent-buyer intersections (q23).

@q(
    "ds_union_pyramid",
    """
    WITH chan AS (
      SELECT l_partkey, l_linenumber % 3 AS channel,
             CAST(l_extendedprice AS DECIMAL(18,4)) AS price
      FROM lineitem
    ), cross_items AS (
      SELECT l_partkey FROM chan GROUP BY l_partkey
      HAVING count(DISTINCT channel) = 3
    ), threshold AS (
      SELECT avg(price) AS avg_price FROM chan
    )
    SELECT channel, count(*) AS n,
           CAST(round(sum(price), 2) AS DOUBLE) AS revenue
    FROM chan JOIN cross_items USING (l_partkey), threshold
    WHERE price > avg_price
    GROUP BY channel
    """,
    "tpcds", "union-pyramid", "q14",
)
def ds_union_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q14 shape: 'cross items' appearing in ALL channels feed a
    per-channel aggregate pyramid gated by a shared average-price scalar
    subquery.  The cross-items set and the scalar threshold are both tiny
    aggregates -> broadcast; the fact scan happens once."""
    (li,) = _t(spark, sf_dir, "lineitem")
    chan = li.select(
        "l_partkey",
        (F.col("l_linenumber") % 3).alias("channel"),
        F.col("l_extendedprice").cast("decimal(18,4)").alias("price"),
    )
    cross_items = (
        chan.groupBy("l_partkey")
        .agg(F.countDistinct("channel").alias("nc"))
        .filter(F.col("nc") == 3)
        .select("l_partkey")
    )
    threshold = chan.agg(F.avg("price").alias("avg_price"))
    return (
        chan.join(F.broadcast(cross_items), "l_partkey")
        .join(F.broadcast(threshold))
        .filter(F.col("price") > F.col("avg_price"))
        .groupBy("channel")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("price"), 2).cast("double").alias("revenue"),
        )
    )


@q(
    "ds_channel_profit_union",
    """
    WITH base AS (
      SELECT l_orderkey % 3 AS channel,
             CAST(l_extendedprice AS DECIMAL(18,4)) AS gross,
             CASE WHEN l_returnflag = 'R'
                  THEN CAST(l_extendedprice AS DECIMAL(18,4)) ELSE 0 END AS returned
      FROM lineitem
    )
    SELECT CASE WHEN channel IS NULL THEN -1 ELSE channel END AS channel,
           CAST(round(sum(gross), 2) AS DOUBLE) AS gross_rev,
           CAST(round(sum(returned), 2) AS DOUBLE) AS returns_rev,
           CAST(round(sum(gross) - sum(returned), 2) AS DOUBLE) AS net
    FROM base GROUP BY ROLLUP (channel)
    """,
    "tpcds", "union-pyramid", "q77",
)
def ds_channel_profit_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q77 shape: per-channel gross/returns/net plus an all-channel
    total row — the channel union + grand-total report expressed as one
    ROLLUP (one Expand, one shuffle) instead of N scans UNION'd."""
    (li,) = _t(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_orderkey") % 3).alias("channel"),
        F.col("l_extendedprice").cast("decimal(18,4)").alias("gross"),
        F.when(
            F.col("l_returnflag") == "R",
            F.col("l_extendedprice").cast("decimal(18,4)"),
        )
        .otherwise(F.lit(0).cast("decimal(18,4)"))
        .alias("returned"),
    )
    return (
        base.rollup("channel")
        .agg(
            F.round(F.sum("gross"), 2).cast("double").alias("gross_rev"),
            F.round(F.sum("returned"), 2).cast("double").alias("returns_rev"),
            F.round(F.sum("gross") - F.sum("returned"), 2)
            .cast("double")
            .alias("net"),
        )
        .select(
            F.coalesce("channel", F.lit(-1)).alias("channel"),
            "gross_rev",
            "returns_rev",
            "net",
        )
    )


@q(
    "ds_exists_or_chain",
    """
    SELECT c_mktsegment, count(*) AS n_cust
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1996-01-01')
      AND (EXISTS (SELECT 1 FROM orders o JOIN lineitem l
                     ON l.l_orderkey = o.o_orderkey
                   WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R')
           OR EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT'))
    GROUP BY c_mktsegment
    """,
    "tpcds", "exists-chain", "q10",
)
def ds_exists_or_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q10 shape: EXISTS(recent activity) AND (EXISTS a OR EXISTS b)
    — planned as one semi join plus a union-of-semi-joins (the OR of two
    EXISTS is a DISTINCT union of their key sets, avoiding a second pass
    over customer)."""
    customer, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    recent = (
        orders.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    returned = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    either = returned.union(urgent).distinct()
    return (
        customer.join(recent, F.col("c_custkey") == recent["k"], "left_semi")
        .join(either, F.col("c_custkey") == either["k"], "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_cust"))
    )


@q(
    "ds_exists_agg_profile",
    """
    SELECT n_name, c_mktsegment, count(*) AS n,
           round(avg(c_acctbal), 2) AS avg_bal,
           round(max(c_acctbal), 2) AS max_bal,
           round(min(c_acctbal), 2) AS min_bal
    FROM customer c JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      AND NOT EXISTS (SELECT 1 FROM orders o JOIN lineitem l
                        ON l.l_orderkey = o.o_orderkey
                      WHERE o.o_custkey = c.c_custkey
                        AND l.l_returnflag = 'R')
    GROUP BY n_name, c_mktsegment
    """,
    "tpcds", "exists-chain", "q35",
)
def ds_exists_agg_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q35 shape: demographic profile (count/avg/max/min) of
    customers gated by EXISTS(purchases) AND NOT EXISTS(returns) — a
    semi join chained with an anti join before the aggregate."""
    customer, nation, orders, li = _t(
        spark, sf_dir, "customer", "nation", "orders", "lineitem"
    )
    buyers = orders.select(F.col("o_custkey").alias("k")).distinct()
    returners = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    return (
        customer.join(buyers, F.col("c_custkey") == buyers["k"], "left_semi")
        .join(returners, F.col("c_custkey") == returners["k"], "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        )
    )


@q(
    "ds_frequent_top_spenders",
    """
    WITH frequent AS (
      SELECT o_custkey FROM orders GROUP BY o_custkey HAVING count(*) >= 12
    ), top_spenders AS (
      SELECT o_custkey FROM orders GROUP BY o_custkey
      HAVING sum(o_totalprice) > (SELECT 0.0004 * sum(o_totalprice) FROM orders)
    )
    SELECT count(*) AS n_both,
           CAST(round((SELECT sum(o_totalprice) FROM orders o
                       JOIN frequent f ON o.o_custkey = f.o_custkey
                       JOIN top_spenders t ON o.o_custkey = t.o_custkey
                       WHERE o.o_orderpriority = '1-URGENT'), 2) AS DOUBLE)
             AS urgent_rev
    FROM frequent f JOIN top_spenders t ON f.o_custkey = t.o_custkey
    """,
    "tpcds", "cte-intersect", "q23",
)
def ds_frequent_top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q23 shape: two independent qualifying CTEs (frequent buyers,
    top spenders vs a global-share threshold) intersected, then the fact
    re-scanned restricted to the intersection — both CTE outputs are tiny
    key sets, broadcast into the final pass."""
    (orders,) = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n"),
        F.sum("o_totalprice").alias("spend"),
    )
    total = orders.agg((F.sum("o_totalprice") * 0.0004).alias("cut"))
    frequent = per_cust.filter(F.col("n") >= 12).select("o_custkey")
    top = (
        per_cust.join(F.broadcast(total))
        .filter(F.col("spend") > F.col("cut"))
        .select(F.col("o_custkey").alias("k2"))
    )
    both = frequent.join(top, F.col("o_custkey") == F.col("k2")).select("o_custkey")
    urgent_rev = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .join(F.broadcast(both), "o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).cast("double").alias("urgent_rev"))
    )
    n_both = both.agg(F.count("*").alias("n_both"))
    return n_both.join(urgent_rev)


@q(
    "ds_cumulative_cross_channel",
    """
    WITH monthly AS (
      SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS mon,
             o_orderkey % 2 AS chan,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders WHERE year(o_orderdate) = 1997
      GROUP BY 1, 2
    ), cum AS (
      SELECT mon, chan,
             sum(rev) OVER (PARTITION BY chan ORDER BY mon
                            ROWS UNBOUNDED PRECEDING) AS cum_rev
      FROM monthly
    )
    SELECT w.mon AS mon,
           CAST(round(w.cum_rev, 2) AS DOUBLE) AS web_cum,
           CAST(round(s.cum_rev, 2) AS DOUBLE) AS store_cum,
           w.cum_rev > s.cum_rev AS web_ahead
    FROM (SELECT * FROM cum WHERE chan = 1) w
    JOIN (SELECT * FROM cum WHERE chan = 0) s ON w.mon = s.mon
    """,
    "tpcds", "cumulative", "q51",
)
def ds_cumulative_cross_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q51 shape: per-channel cumulative revenue series joined on
    the calendar axis with an ahead/behind flag — ONE window pass over the
    tiny monthly aggregate, then a self-join on month."""
    (orders,) = _t(spark, sf_dir, "orders")
    monthly = (
        orders.filter(F.year("o_orderdate") == 1997)
        .groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("mon"),
            (F.col("o_orderkey") % 2).alias("chan"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"))
    )
    w = Window.partitionBy("chan").orderBy("mon").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = monthly.withColumn("cum_rev", F.sum("rev").over(w))
    web = cum.filter(F.col("chan") == 1).select("mon", F.col("cum_rev").alias("wc"))
    store = cum.filter(F.col("chan") == 0).select(
        F.col("mon").alias("mon2"), F.col("cum_rev").alias("sc")
    )
    return (
        web.join(store, F.col("mon") == F.col("mon2"))
        .select(
            "mon",
            F.round("wc", 2).cast("double").alias("web_cum"),
            F.round("sc", 2).cast("double").alias("store_cum"),
            (F.col("wc") > F.col("sc")).alias("web_ahead"),
        )
    )


@q(
    "ds_effective_net_quantity",
    """
    SELECT l_orderkey,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE l_quantity END)
                AS BIGINT) AS net_qty,
           CAST(round(sum(CASE WHEN l_returnflag = 'R' THEN 0
                    ELSE CAST(l_extendedprice AS DECIMAL(18,4)) END), 2) AS DOUBLE)
             AS net_rev
    FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE l_quantity END) > 180
    """,
    "tpcds", "returns-arith", "q93",
)
def ds_effective_net_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q93 shape: effective order quantity after cancelling
    returned lines — the returns subtraction folded into the aggregate
    CASE (one scan, no returns-table join since returnflag is inline)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    not_r = F.col("l_returnflag") != "R"
    agg = li.groupBy("l_orderkey").agg(
        F.sum(F.when(not_r, F.col("l_quantity")).otherwise(0))
        .cast("bigint")
        .alias("net_qty"),
        F.round(
            F.sum(
                F.when(
                    not_r, F.col("l_extendedprice").cast("decimal(18,4)")
                ).otherwise(F.lit(0).cast("decimal(18,4)"))
            ),
            2,
        )
        .cast("double")
        .alias("net_rev"),
    )
    return agg.filter(F.col("net_qty") > 180)


@q(
    "ds_two_supplier_orders",
    """
    SELECT count(*) AS n_orders FROM (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING count(DISTINCT l_suppkey) >= 2
         AND count(CASE WHEN l_shipdate >= TIMESTAMP '1998-06-01' THEN 1 END) = 0
    )
    """,
    "tpcds", "exists-chain", "q95",
)
def ds_two_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q95 shape: orders shipped from >= 2 suppliers with NO late
    line — the EXISTS(other supplier) / NOT EXISTS(late line) pair
    collapsed to one grouped scan (distinct-count + conditional count)
    instead of two correlated self-joins of the fact."""
    (li,) = _t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.count_if(
            F.col("l_shipdate") >= F.lit("1998-06-01").cast("timestamp_ntz")
        ).alias("n_late"),
    )
    return per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late") == 0)
    ).agg(F.count("*").alias("n_orders"))


@q(
    "ds_region_qoq_growth",
    """
    WITH q AS (
      SELECT n_name, quarter(o_orderdate) AS qtr, o_orderkey % 2 AS chan,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE year(o_orderdate) = 1997
      GROUP BY 1, 2, 3
    )
    SELECT a.n_name AS n_name, a.qtr AS qtr,
           round(a.rev / b.rev, 4) AS web_growth,
           round(c.rev / d.rev, 4) AS store_growth
    FROM q a JOIN q b ON a.n_name = b.n_name AND a.qtr = b.qtr + 1
                     AND a.chan = 1 AND b.chan = 1
         JOIN q c ON a.n_name = c.n_name AND c.qtr = a.qtr AND c.chan = 0
         JOIN q d ON a.n_name = d.n_name AND d.qtr = a.qtr - 1 AND d.chan = 0
    WHERE b.rev > 0 AND d.rev > 0 AND a.rev / b.rev > c.rev / d.rev
    """,
    "tpcds", "growth-compare", "q31",
)
def ds_region_qoq_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q31 shape: quarter-over-quarter growth per nation computed
    for two channels and compared (nations where web outgrew store) —
    the four-way self-join runs over the tiny (nation x quarter x channel)
    aggregate, never the fact."""
    orders, customer, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    q_agg = (
        orders.filter(F.year("o_orderdate") == 1997)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.quarter("o_orderdate").alias("qtr"),
            (F.col("o_orderkey") % 2).alias("chan"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"))
    )
    a = q_agg.filter(F.col("chan") == 1).select(
        "n_name", "qtr", F.col("rev").alias("wa")
    )
    b = q_agg.filter(F.col("chan") == 1).select(
        F.col("n_name").alias("n2"), F.col("qtr").alias("q2"), F.col("rev").alias("wb")
    )
    c = q_agg.filter(F.col("chan") == 0).select(
        F.col("n_name").alias("n3"), F.col("qtr").alias("q3"), F.col("rev").alias("sc")
    )
    d = q_agg.filter(F.col("chan") == 0).select(
        F.col("n_name").alias("n4"), F.col("qtr").alias("q4"), F.col("rev").alias("sd")
    )
    return (
        a.join(b, (F.col("n_name") == F.col("n2")) & (F.col("qtr") == F.col("q2") + 1))
        .join(c, (F.col("n_name") == F.col("n3")) & (F.col("qtr") == F.col("q3")))
        .join(d, (F.col("n_name") == F.col("n4")) & (F.col("qtr") == F.col("q4") + 1))
        .filter(
            (F.col("wb") > 0)
            & (F.col("sd") > 0)
            & (F.col("wa") / F.col("wb") > F.col("sc") / F.col("sd"))
        )
        .select(
            "n_name",
            "qtr",
            F.round(F.col("wa") / F.col("wb"), 4).cast("double").alias("web_growth"),
            F.round(F.col("sc") / F.col("sd"), 4).cast("double").alias("store_growth"),
        )
    )


@q(
    "ds_three_year_pref",
    """
    WITH yearly AS (
      SELECT o_custkey, year(o_orderdate) AS yr, o_orderkey % 2 AS chan,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders WHERE year(o_orderdate) BETWEEN 1996 AND 1998
      GROUP BY 1, 2, 3
    )
    SELECT count(*) AS n_cust FROM (
      SELECT w1.o_custkey
      FROM yearly w1 JOIN yearly w2
        ON w1.o_custkey = w2.o_custkey AND w1.chan = 1 AND w2.chan = 1
       AND w1.yr = 1996 AND w2.yr = 1997
      JOIN yearly s1 ON s1.o_custkey = w1.o_custkey AND s1.chan = 0 AND s1.yr = 1996
      JOIN yearly s2 ON s2.o_custkey = w1.o_custkey AND s2.chan = 0 AND s2.yr = 1997
      WHERE w1.rev > 0 AND s1.rev > 0
        AND w2.rev / w1.rev > s2.rev / s1.rev
    )
    """,
    "tpcds", "growth-compare", "q4",
)
def ds_three_year_pref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q4 shape: customers present in BOTH channels in consecutive
    years whose web growth beat their store growth — four joins of the
    per-(customer, year, channel) aggregate against itself."""
    (orders,) = _t(spark, sf_dir, "orders")
    yearly = (
        orders.filter(F.year("o_orderdate").between(1996, 1998))
        .groupBy(
            "o_custkey",
            F.year("o_orderdate").alias("yr"),
            (F.col("o_orderkey") % 2).alias("chan"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"))
    )

    def slice_(yr, chan, alias_rev, alias_key):
        return yearly.filter((F.col("yr") == yr) & (F.col("chan") == chan)).select(
            F.col("o_custkey").alias(alias_key), F.col("rev").alias(alias_rev)
        )

    w1 = slice_(1996, 1, "w1", "k1")
    w2 = slice_(1997, 1, "w2", "k2")
    s1 = slice_(1996, 0, "s1", "k3")
    s2 = slice_(1997, 0, "s2", "k4")
    return (
        w1.join(w2, F.col("k1") == F.col("k2"))
        .join(s1, F.col("k1") == F.col("k3"))
        .join(s2, F.col("k1") == F.col("k4"))
        .filter(
            (F.col("w1") > 0)
            & (F.col("s1") > 0)
            & (F.col("w2") / F.col("w1") > F.col("s2") / F.col("s1"))
        )
        .agg(F.count("*").alias("n_cust"))
    )


@q(
    "ds_weekday_ratio_pivot",
    """
    WITH wk AS (
      SELECT CASE WHEN month(o_orderdate) <= 6 THEN 'h1' ELSE 'h2' END AS half,
             dayofweek(o_orderdate) AS dow,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders WHERE year(o_orderdate) = 1997
      GROUP BY 1, 2
    )
    SELECT a.dow AS dow,
           CAST(round(a.rev, 2) AS DOUBLE) AS h1_rev,
           CAST(round(b.rev, 2) AS DOUBLE) AS h2_rev,
           round(b.rev / a.rev, 4) AS ratio
    FROM (SELECT * FROM wk WHERE half = 'h1') a
    JOIN (SELECT * FROM wk WHERE half = 'h2') b ON a.dow = b.dow
    WHERE a.rev > 0
    """,
    "tpcds", "calendar-pivot", "q59",
)
def ds_weekday_ratio_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q59 shape: weekday revenue profile of one half-year ratioed
    against the other half — the pivot is a (half, dow) aggregate
    self-joined on weekday.  DuckDB dayofweek is 0-6 Sunday-first vs
    Spark 1-7; Spark side converts to DuckDB's numbering."""
    (orders,) = _t(spark, sf_dir, "orders")
    wk = (
        orders.filter(F.year("o_orderdate") == 1997)
        .groupBy(
            F.when(F.month("o_orderdate") <= 6, "h1").otherwise("h2").alias("half"),
            (F.dayofweek("o_orderdate") - 1).alias("dow"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"))
    )
    a = wk.filter(F.col("half") == "h1").select("dow", F.col("rev").alias("r1"))
    b = wk.filter(F.col("half") == "h2").select(
        F.col("dow").alias("dow2"), F.col("rev").alias("r2")
    )
    return (
        a.join(b, F.col("dow") == F.col("dow2"))
        .filter(F.col("r1") > 0)
        .select(
            "dow",
            F.round("r1", 2).cast("double").alias("h1_rev"),
            F.round("r2", 2).cast("double").alias("h2_rev"),
            F.round(F.col("r2") / F.col("r1"), 4).cast("double").alias("ratio"),
        )
    )


@q(
    "ds_half_year_share",
    """
    WITH t AS (
      SELECT p_type,
             sum(CASE WHEN month(l_shipdate) <= 6
                      THEN CAST(l_extendedprice AS DECIMAL(18,4)) ELSE 0 END) AS h1,
             sum(CASE WHEN month(l_shipdate) > 6
                      THEN CAST(l_extendedprice AS DECIMAL(18,4)) ELSE 0 END) AS h2
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE year(l_shipdate) = 1997
      GROUP BY p_type
    )
    SELECT p_type,
           CAST(round(h1, 2) AS DOUBLE) AS h1_rev,
           CAST(round(h2, 2) AS DOUBLE) AS h2_rev,
           round(h1 / (h1 + h2), 4) AS h1_share
    FROM t WHERE h1 + h2 > 0
    """,
    "tpcds", "calendar-pivot", "q66",
)
def ds_half_year_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q66 shape: per-carrier (p_type stands in) revenue split into
    calendar buckets inside the aggregate (conditional sums, one scan) with
    each bucket's share of the year."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    t = (
        li.filter(F.year("l_shipdate") == 1997)
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type")
        .agg(
            F.sum(F.when(F.month("l_shipdate") <= 6, price).otherwise(zero)).alias("h1"),
            F.sum(F.when(F.month("l_shipdate") > 6, price).otherwise(zero)).alias("h2"),
        )
    )
    return (
        t.filter(F.col("h1") + F.col("h2") > 0)
        .select(
            "p_type",
            F.round("h1", 2).cast("double").alias("h1_rev"),
            F.round("h2", 2).cast("double").alias("h2_rev"),
            F.round(F.col("h1") / (F.col("h1") + F.col("h2")), 4)
            .cast("double")
            .alias("h1_share"),
        )
    )


@q(
    "ds_below_avg_items",
    """
    WITH brand_item AS (
      SELECT p_brand, l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    ), brand_stats AS (
      SELECT p_brand, avg(rev) AS avg_rev FROM brand_item GROUP BY 1
    )
    SELECT b.p_brand AS p_brand, count(*) AS n_weak_items,
           CAST(round(min(i.rev), 2) AS DOUBLE) AS weakest_rev
    FROM brand_item i JOIN brand_stats b ON i.p_brand = b.p_brand
    WHERE i.rev < 0.5 * b.avg_rev
    GROUP BY b.p_brand
    """,
    "tpcds", "threshold-scan", "q65",
)
def ds_below_avg_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q65 shape: items revenue-underperforming their brand average
    — the per-brand average joins back against the per-item aggregate
    (tiny vs tiny; the fact is scanned once)."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    brand_item = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("rev"))
    )
    brand_stats = brand_item.groupBy(F.col("p_brand").alias("b2")).agg(
        F.avg("rev").alias("avg_rev")
    )
    return (
        brand_item.join(
            F.broadcast(brand_stats), F.col("p_brand") == F.col("b2")
        )
        .filter(F.col("rev") < 0.5 * F.col("avg_rev"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_weak_items"),
            F.round(F.min("rev"), 2).cast("double").alias("weakest_rev"),
        )
    )


@q(
    "ds_nation_above_global",
    """
    WITH nat AS (
      SELECT n_name, avg(c_acctbal) AS nat_avg, count(*) AS n_cust
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    ), gstats AS (SELECT avg(c_acctbal) AS g FROM customer)
    SELECT n_name, n_cust, round(nat_avg, 2) AS nat_avg
    FROM nat, gstats WHERE nat_avg > 1.02 * g
    """,
    "tpcds", "threshold-scan", "q6",
)
def ds_nation_above_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q6 shape: states (nations) whose customer average exceeds
    the global average by a margin — scalar subquery broadcast against the
    per-nation aggregate."""
    customer, nation = _t(spark, sf_dir, "customer", "nation")
    nat = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.avg("c_acctbal").alias("nat_avg"), F.count("*").alias("n_cust"))
    )
    glob = customer.agg(F.avg("c_acctbal").alias("g"))
    return (
        nat.join(F.broadcast(glob))
        .filter(F.col("nat_avg") > 1.02 * F.col("g"))
        .select("n_name", "n_cust", F.round("nat_avg", 2).alias("nat_avg"))
    )


@q(
    "ds_return_then_reorder",
    """
    WITH returned_orders AS (
      SELECT DISTINCT o_custkey, o_orderdate
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
    )
    SELECT count(DISTINCT r.o_custkey) AS n_cust,
           count(*) AS n_reorders,
           CAST(round(sum(o2.o_totalprice), 2) AS DOUBLE) AS reorder_rev
    FROM returned_orders r
    JOIN orders o2 ON o2.o_custkey = r.o_custkey
                  AND o2.o_orderdate > r.o_orderdate
                  AND o2.o_orderdate <= r.o_orderdate + INTERVAL 30 DAY
    """,
    "tpcds", "sequence", "q25",
)
def ds_return_then_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q25/q29 shape: customers who re-ordered within 30 days of an
    order containing a return — a banded temporal self-join on customer
    (equi on custkey, range on date: the equi key carries the shuffle)."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    returned = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("o_custkey").alias("rk"), F.col("o_orderdate").alias("rdate"))
        .distinct()
    )
    reorder = orders.join(
        returned,
        (F.col("o_custkey") == F.col("rk"))
        & (F.col("o_orderdate") > F.col("rdate"))
        & (F.col("o_orderdate") <= F.col("rdate") + F.expr("INTERVAL 30 DAY")),
    )
    return reorder.agg(
        F.countDistinct("rk").alias("n_cust"),
        F.count("*").alias("n_reorders"),
        F.round(F.sum("o_totalprice"), 2).cast("double").alias("reorder_rev"),
    )


@q(
    "ds_three_channel_share",
    """
    WITH ch AS (
      SELECT p_brand, l_orderkey % 3 AS channel,
             sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    ), wide AS (
      SELECT p_brand,
             sum(CASE WHEN channel = 0 THEN rev ELSE 0 END) AS c0,
             sum(CASE WHEN channel = 1 THEN rev ELSE 0 END) AS c1,
             sum(CASE WHEN channel = 2 THEN rev ELSE 0 END) AS c2
      FROM ch GROUP BY p_brand
    )
    SELECT p_brand,
           round(CAST(least(c0, c1, c2) AS DOUBLE)
                 / CAST(c0 + c1 + c2 AS DOUBLE), 4) AS min_share,
           CAST(round(c0 + c1 + c2, 2) AS DOUBLE) AS total
    FROM wide
    WHERE c0 + c1 + c2 > 0
      AND CAST(least(c0, c1, c2) AS DOUBLE) / CAST(c0 + c1 + c2 AS DOUBLE) >= 0.25
    """,
    "tpcds", "channel-balance", "q58",
)
def ds_three_channel_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q58/q83 shape: brands whose revenue is BALANCED across all
    three channels (each channel >= 25% of total) — the cross-channel
    consistency report, pivoted wide so the share math is one pass."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    zero = F.lit(0).cast("decimal(18,4)")
    ch = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", (F.col("l_orderkey") % 3).alias("channel"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("rev"))
    )
    wide = ch.groupBy("p_brand").agg(
        F.sum(F.when(F.col("channel") == 0, F.col("rev")).otherwise(zero)).alias("c0"),
        F.sum(F.when(F.col("channel") == 1, F.col("rev")).otherwise(zero)).alias("c1"),
        F.sum(F.when(F.col("channel") == 2, F.col("rev")).otherwise(zero)).alias("c2"),
    )
    total = F.col("c0") + F.col("c1") + F.col("c2")
    min_c = F.least("c0", "c1", "c2")
    share = min_c.cast("double") / total.cast("double")
    return (
        wide.filter((total > 0) & (share >= 0.25))
        .select(
            "p_brand",
            F.round(share, 4).alias("min_share"),
            F.round(total, 2).cast("double").alias("total"),
        )
    )


@q(
    "ds_priority_switch_orders",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderkey, o_orderpriority,
             lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS prev_prio
      FROM orders
    )
    SELECT o_orderpriority AS new_prio, prev_prio AS old_prio, count(*) AS n
    FROM seq
    WHERE prev_prio IS NOT NULL AND prev_prio <> o_orderpriority
      AND (o_orderpriority = '1-URGENT' OR prev_prio = '1-URGENT')
    GROUP BY 1, 2
    """,
    "tpcds", "sequence", "q46",
)
def ds_priority_switch_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q46/q68 shape (city-change trips): consecutive orders where
    the attribute changed across the urgency boundary — a lag window over
    the per-customer order sequence, transition matrix out."""
    from pyspark.sql import Window as W

    (orders,) = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.withColumn("prev_prio", F.lag("o_orderpriority").over(w))
    return (
        seq.filter(
            F.col("prev_prio").isNotNull()
            & (F.col("prev_prio") != F.col("o_orderpriority"))
            & (
                (F.col("o_orderpriority") == "1-URGENT")
                | (F.col("prev_prio") == "1-URGENT")
            )
        )
        .groupBy(
            F.col("o_orderpriority").alias("new_prio"),
            F.col("prev_prio").alias("old_prio"),
        )
        .agg(F.count("*").alias("n"))
    )


@q(
    "ds_yoy_decline",
    """
    WITH yearly AS (
      SELECT p_type, year(l_shipdate) AS yr,
             sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE year(l_shipdate) IN (1996, 1997)
      GROUP BY 1, 2
    )
    SELECT a.p_type AS p_type,
           CAST(round(b.rev, 2) AS DOUBLE) AS rev_1996,
           CAST(round(a.rev, 2) AS DOUBLE) AS rev_1997,
           round(a.rev / b.rev, 4) AS ratio
    FROM yearly a JOIN yearly b
      ON a.p_type = b.p_type AND a.yr = 1997 AND b.yr = 1996
    WHERE b.rev > 0 AND a.rev / b.rev < 0.98
    """,
    "tpcds", "yoy-decline", "q75",
)
def ds_yoy_decline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q75 shape: categories whose revenue DECLINED year over year
    — the all-channels yearly aggregate self-joined across years with a
    decline predicate on the ratio."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    yearly = (
        li.filter(F.year("l_shipdate").isin(1996, 1997))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", F.year("l_shipdate").alias("yr"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("rev"))
    )
    a = yearly.filter(F.col("yr") == 1997).select("p_type", F.col("rev").alias("r97"))
    b = yearly.filter(F.col("yr") == 1996).select(
        F.col("p_type").alias("pt2"), F.col("rev").alias("r96")
    )
    return (
        a.join(b, F.col("p_type") == F.col("pt2"))
        .filter((F.col("r96") > 0) & (F.col("r97") / F.col("r96") < 0.98))
        .select(
            "p_type",
            F.round("r96", 2).cast("double").alias("rev_1996"),
            F.round("r97", 2).cast("double").alias("rev_1997"),
            F.round(F.col("r97") / F.col("r96"), 4).cast("double").alias("ratio"),
        )
    )


@q(
    "ds_above_part_avg_qty",
    """
    SELECT count(*) AS n_lines,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS heavy_rev
    FROM lineitem l JOIN (
      SELECT l_partkey AS pk, avg(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) p ON l.l_partkey = p.pk
    WHERE l.l_quantity > 1.2 * p.avg_qty
    """,
    "tpcds", "correlated-avg", "q17",
)
def ds_above_part_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q17 shape: lines whose quantity exceeds 1.2x their part's
    average — the correlated per-key average decorrelated into a
    self-aggregate join (the per-part agg is small -> broadcast)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(per_part), F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") > 1.2 * F.col("avg_qty"))
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("heavy_rev"),
        )
    )


@q(
    "ds_scalar_slot_report",
    """
    SELECT
      (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) AS b1,
      (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) AS b2,
      (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) AS b3,
      (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) AS b4,
      (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) AS b5
    """,
    "tpcds", "scalar-slots", "q9",
)
def ds_scalar_slot_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q9 shape: five scalar-subquery slots in one SELECT.  The
    five correlated scans collapse to ONE pass with conditional counts —
    the rewrite Catalyst/DS benchmarks reward (vs five fact scans)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.agg(
        F.count_if(q.between(1, 10)).alias("b1"),
        F.count_if(q.between(11, 20)).alias("b2"),
        F.count_if(q.between(21, 30)).alias("b3"),
        F.count_if(q.between(31, 40)).alias("b4"),
        F.count_if(q.between(41, 50)).alias("b5"),
    )


@q(
    "ds_attr_combo_exists",
    """
    SELECT DISTINCT p_brand FROM part p1
    WHERE p_partkey < 500 AND EXISTS (
      SELECT 1 FROM part p2
      WHERE p2.p_brand = p1.p_brand
        AND ((p2.p_size BETWEEN 10 AND 20 AND p2.p_type LIKE '%PROMO%')
             OR (p2.p_size BETWEEN 30 AND 40 AND p2.p_type LIKE '%ECONOMY%'))
    )
    ORDER BY p_brand
    """,
    "tpcds", "exists-chain", "q41",
)
def ds_attr_combo_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q41 shape: brands having at least one item matching an
    attribute-combination disjunction — EXISTS over the dimension itself,
    planned as a semi join of part against its filtered self."""
    (part,) = _t(spark, sf_dir, "part")
    combo = part.filter(
        (F.col("p_size").between(10, 20) & F.col("p_type").contains("PROMO"))
        | (F.col("p_size").between(30, 40) & F.col("p_type").contains("ECONOMY"))
    ).select(F.col("p_brand").alias("b2")).distinct()
    return (
        part.filter(F.col("p_partkey") < 500)
        .join(F.broadcast(combo), F.col("p_brand") == F.col("b2"), "left_semi")
        .select("p_brand")
        .distinct()
        .orderBy("p_brand")
    )


@q(
    "ds_repeat_part_cross_year",
    """
    SELECT count(*) AS n_pairs, count(DISTINCT custkey) AS n_cust
    FROM (
      SELECT DISTINCT o1.o_custkey AS custkey, l1.l_partkey
      FROM orders o1 JOIN lineitem l1 ON l1.l_orderkey = o1.o_orderkey
      WHERE year(o1.o_orderdate) = 1996
    ) y1 JOIN (
      SELECT DISTINCT o2.o_custkey AS custkey2, l2.l_partkey AS partkey2
      FROM orders o2 JOIN lineitem l2 ON l2.l_orderkey = o2.o_orderkey
      WHERE year(o2.o_orderdate) = 1997
    ) y2 ON y1.custkey = y2.custkey2 AND y1.l_partkey = y2.partkey2
    """,
    "tpcds", "cross-sale", "q64",
)
def ds_repeat_part_cross_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q64 shape (cross-sale chain): (customer, part) pairs bought
    in BOTH years — two distinct fact passes equi-joined on the composite
    key; the distinct collapses each year to its pair set before the
    join."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")

    def year_pairs(yr, ck, pk):
        return (
            orders.filter(F.year("o_orderdate") == yr)
            .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .select(F.col("o_custkey").alias(ck), F.col("l_partkey").alias(pk))
            .distinct()
        )

    y1 = year_pairs(1996, "custkey", "l_partkey")
    y2 = year_pairs(1997, "custkey2", "partkey2")
    return (
        y1.join(
            y2,
            (F.col("custkey") == F.col("custkey2"))
            & (F.col("l_partkey") == F.col("partkey2")),
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("custkey").alias("n_cust"),
        )
    )


@q(
    "ds_click_to_purchase_window",
    """
    SELECT count(DISTINCT c.user_id) AS n_converted,
           count(*) AS n_conversions
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 7 DAY
    """,
    "tpcds", "attribution", "q54",
)
def ds_click_to_purchase_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q54 shape (click-to-purchase attribution window): users
    converting within 7 days of a click — banded temporal self-join,
    equi on user (the shuffle key), range on time."""
    ev = _t(spark, sf_dir, "events")[0]
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    return (
        c.join(
            p,
            (F.col("cu") == F.col("pu"))
            & (F.col("pts") > F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 7 DAY")),
        )
        .agg(
            F.countDistinct("cu").alias("n_converted"),
            F.count("*").alias("n_conversions"),
        )
    )


@q(
    "ds_window_over_rollup",
    """
    WITH r AS (
      SELECT n_name, c_mktsegment,
             CAST(grouping(n_name) AS INT) AS gn,
             CAST(grouping(c_mktsegment) AS INT) AS gs,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name, c_mktsegment)
    )
    SELECT n_name, c_mktsegment, gn + gs AS lvl,
           CAST(round(rev, 2) AS DOUBLE) AS rev,
           rank() OVER (
             PARTITION BY gn + gs, CASE WHEN gs = 0 THEN n_name END
             ORDER BY rev DESC, coalesce(n_name, ''), coalesce(c_mktsegment, '')
           ) AS rnk
    FROM r
    """,
    "tpcds", "rollup", "window",
)
def ds_window_over_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q86/q70 shape: a rank window OVER the rollup output — detail
    rows ranked within their parent nation, subtotal rows ranked among
    nations, the grand total alone in its level.  The rank partition key
    is (level, parent) exactly as q86 writes it (tools/gluten-it/.../
    tpcds-queries/q86.sql); exact decimal sums keep rank ties
    engine-stable."""
    from pyspark.sql import Window as W

    orders, customer, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    r = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.grouping("n_name").cast("int").alias("gn"),
            F.grouping("c_mktsegment").cast("int").alias("gs"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"),
        )
    )
    w = W.partitionBy(
        F.col("gn") + F.col("gs"),
        F.when(F.col("gs") == 0, F.col("n_name")),
    ).orderBy(
        F.col("rev").desc(),
        F.coalesce("n_name", F.lit("")),
        F.coalesce("c_mktsegment", F.lit("")),
    )
    return r.select(
        "n_name",
        "c_mktsegment",
        (F.col("gn") + F.col("gs")).alias("lvl"),
        F.round("rev", 2).cast("double").alias("rev"),
        F.rank().over(w).alias("rnk"),
    )


@q(
    "ds_weekly_matrix",
    """
    WITH wk AS (
      SELECT weekofyear(o_orderdate) AS wk, year(o_orderdate) AS yr,
             sum(CASE WHEN isodow(o_orderdate) = 1 THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS mon,
             sum(CASE WHEN isodow(o_orderdate) = 3 THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS wed,
             sum(CASE WHEN isodow(o_orderdate) = 5 THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS fri,
             sum(CASE WHEN isodow(o_orderdate) = 7 THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS sun
      FROM orders
      WHERE weekofyear(o_orderdate) BETWEEN 2 AND 51
      GROUP BY 1, 2
    )
    SELECT a.wk AS wk,
           round(CAST(a.mon AS DOUBLE) / CAST(b.mon AS DOUBLE), 4) AS mon_ratio,
           round(CAST(a.wed AS DOUBLE) / CAST(b.wed AS DOUBLE), 4) AS wed_ratio,
           round(CAST(a.fri AS DOUBLE) / CAST(b.fri AS DOUBLE), 4) AS fri_ratio,
           round(CAST(a.sun AS DOUBLE) / CAST(b.sun AS DOUBLE), 4) AS sun_ratio
    FROM wk a JOIN wk b ON a.wk = b.wk
    WHERE a.yr = 1996 AND b.yr = 1997
    """,
    "tpcds", "pivot", "self-join",
)
def ds_weekly_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q59/q2 shape: the weekly-sales matrix — revenue pivoted to
    weekday columns per ISO week, then a same-week self-join across two
    years producing per-weekday ratios.  Weeks 2-51 only (the 52/53
    year-boundary weeks split across calendar years).  NULL weekday cells
    (no orders that day) propagate NULL ratios identically in both
    engines."""
    (orders,) = _t(spark, sf_dir, "orders")

    def daycol(d: int, alias: str):
        return F.sum(
            F.when(
                F.weekday("o_orderdate") + 1 == d,
                F.col("o_totalprice").cast("decimal(18,4)"),
            )
        ).alias(alias)

    wk = (
        orders.filter(F.weekofyear("o_orderdate").between(2, 51))
        .groupBy(
            F.weekofyear("o_orderdate").alias("wk"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(daycol(1, "mon"), daycol(3, "wed"), daycol(5, "fri"), daycol(7, "sun"))
    )
    a = wk.filter(F.col("yr") == 1996).alias("a")
    b = wk.filter(F.col("yr") == 1997).alias("b")

    def ratio(col: str):
        return F.round(
            F.col(f"a.{col}").cast("double") / F.col(f"b.{col}").cast("double"), 4
        ).alias(f"{col}_ratio")

    return a.join(b, F.col("a.wk") == F.col("b.wk")).select(
        F.col("a.wk").alias("wk"),
        ratio("mon"),
        ratio("wed"),
        ratio("fri"),
        ratio("sun"),
    )


@q(
    "ds_frequent_monthly_cohort",
    """
    WITH freq AS (
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      GROUP BY 1 HAVING count(DISTINCT month(o_orderdate)) >= 4
    ), sp AS (
      SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,4))) AS t
      FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1
    ), big AS (
      SELECT o_custkey FROM sp
      WHERE CAST(t AS DOUBLE) > 0.5 * (SELECT max(CAST(t AS DOUBLE)) FROM sp)
    ), cohort AS (
      SELECT o_custkey FROM freq INTERSECT SELECT o_custkey FROM big
    )
    SELECT c_mktsegment,
           count(DISTINCT o.o_custkey) AS n_cust,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS spend_98
    FROM orders o
    JOIN cohort ct ON o.o_custkey = ct.o_custkey
    JOIN customer ON o.o_custkey = c_custkey
    WHERE year(o.o_orderdate) = 1998
    GROUP BY c_mktsegment
    """,
    "tpcds", "cte", "cohort",
)
def ds_frequent_monthly_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q23 (full form) shape: the repeated-monthly-spend cohort —
    customers who bought in >=4 distinct months AND whose yearly spend is
    within 2x of the best customer, then next-year spend of that cohort
    by segment.  The cohort is two semi-joined CTE branches (frequency
    INTERSECT spend) exactly as q23a chains best_ss_customer with
    frequent_ss_items; the max-spend scalar broadcasts."""
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    o97 = orders.filter(F.year("o_orderdate") == 1997)
    freq = (
        o97.groupBy("o_custkey")
        .agg(F.countDistinct(F.month("o_orderdate")).alias("nm"))
        .filter(F.col("nm") >= 4)
        .select("o_custkey")
    )
    sp = o97.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("t")
    )
    mx = sp.agg(F.max(F.col("t").cast("double")).alias("mx"))
    big = (
        sp.join(F.broadcast(mx))
        .filter(F.col("t").cast("double") > 0.5 * F.col("mx"))
        .select("o_custkey")
    )
    cohort = freq.intersect(big)
    return (
        orders.filter(F.year("o_orderdate") == 1998)
        .join(cohort, "o_custkey", "inner")
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("spend_98"),
        )
    )


@q(
    "ds_rolling_avg_dev",
    """
    WITH monthly AS (
      SELECT p_brand, year(l_shipdate) AS yr, month(l_shipdate) AS mo,
             sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE year(l_shipdate) = 1997
      GROUP BY 1, 2, 3
    ), avgd AS (
      SELECT p_brand, yr, mo, rev,
             sum(rev) OVER (PARTITION BY p_brand, yr) AS yr_sum,
             count(*) OVER (PARTITION BY p_brand, yr) AS n_mo
      FROM monthly
    )
    SELECT p_brand, yr, mo,
           CAST(round(rev, 2) AS DOUBLE) AS rev,
           CAST(round(yr_sum, 2) AS DOUBLE) AS yr_sum,
           CAST(n_mo AS BIGINT) AS n_mo,
           round(abs(CAST(rev AS DOUBLE) * n_mo - CAST(yr_sum AS DOUBLE))
                 / CAST(yr_sum AS DOUBLE), 4) AS dev
    FROM avgd
    WHERE CAST(yr_sum AS DOUBLE) > 0
      AND abs(CAST(rev AS DOUBLE) * n_mo - CAST(yr_sum AS DOUBLE))
          / CAST(yr_sum AS DOUBLE) > 0.35
    """,
    "tpcds", "window", "timeseries",
)
def ds_rolling_avg_dev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q89 shape: monthly brand revenue vs the brand's average
    month in that year (an unbounded-within-partition avg window), keeping
    months deviating >35% from the mean.  One agg + one window, no
    re-join against a totals CTE."""
    from pyspark.sql import Window as W

    li, part = _t(spark, sf_dir, "lineitem", "part")
    monthly = (
        li.filter(F.year("l_shipdate") == 1997)
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            "p_brand",
            F.year("l_shipdate").alias("yr"),
            F.month("l_shipdate").alias("mo"),
        )
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("rev"))
    )
    w = W.partitionBy("p_brand", "yr")
    # display the EXACT decimal year sum + month count, never a rounded
    # float average — round(sum/count, 2) can land on half-way doubles
    # that the two engines round apart; the deviation ratio rewrites
    # algebraically as |rev*n - sum| / sum over exact operands
    avgd = monthly.withColumn("yr_sum", F.sum("rev").over(w)).withColumn(
        "n_mo", F.count("*").over(w)
    )
    ys_d = F.col("yr_sum").cast("double")
    dev = F.abs(F.col("rev").cast("double") * F.col("n_mo") - ys_d) / ys_d
    return (
        avgd.filter((ys_d > 0) & (dev > 0.35))
        .select(
            "p_brand",
            "yr",
            "mo",
            F.round("rev", 2).cast("double").alias("rev"),
            F.round("yr_sum", 2).cast("double").alias("yr_sum"),
            F.col("n_mo").cast("bigint").alias("n_mo"),
            F.round(dev, 4).alias("dev"),
        )
    )


@q(
    "ds_lag_lead_center",
    """
    WITH monthly AS (
      SELECT n_name, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2, 3
    ), ctr AS (
      SELECT n_name, yr, mo, rev,
             lag(rev) OVER w AS prev_rev,
             lead(rev) OVER w AS next_rev
      FROM monthly
      WINDOW w AS (PARTITION BY n_name ORDER BY yr, mo)
    )
    SELECT n_name, yr, mo,
           CAST(round(rev, 2) AS DOUBLE) AS rev,
           round((CAST(prev_rev AS DOUBLE) + CAST(rev AS DOUBLE)
                  + CAST(next_rev AS DOUBLE)) / 3, 2) AS center_avg,
           round(CAST(rev AS DOUBLE) * 3 / (CAST(prev_rev AS DOUBLE)
                  + CAST(rev AS DOUBLE) + CAST(next_rev AS DOUBLE)), 4) AS vs_center
    FROM ctr
    WHERE prev_rev IS NOT NULL AND next_rev IS NOT NULL
      AND CAST(rev AS DOUBLE) * 3
          < 0.6 * (CAST(prev_rev AS DOUBLE) + CAST(rev AS DOUBLE)
                   + CAST(next_rev AS DOUBLE))
    """,
    "tpcds", "window", "timeseries",
)
def ds_lag_lead_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q57 shape: the centered three-month mean (lag + current +
    lead over the month sequence) flagging months that crater below 60%
    of their neighborhood — q57's v1.avg_monthly_sales deviation filter
    with the same lag/lead window."""
    from pyspark.sql import Window as W

    orders, customer, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    monthly = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"))
    )
    w = W.partitionBy("n_name").orderBy("yr", "mo")
    ctr = monthly.select(
        "n_name",
        "yr",
        "mo",
        "rev",
        F.lag("rev").over(w).alias("prev_rev"),
        F.lead("rev").over(w).alias("next_rev"),
    )
    s3 = (
        F.col("prev_rev").cast("double")
        + F.col("rev").cast("double")
        + F.col("next_rev").cast("double")
    )
    return (
        ctr.filter(
            F.col("prev_rev").isNotNull()
            & F.col("next_rev").isNotNull()
            & (F.col("rev").cast("double") * 3 < 0.6 * s3)
        )
        .select(
            "n_name",
            "yr",
            "mo",
            F.round("rev", 2).cast("double").alias("rev"),
            F.round(s3 / 3, 2).alias("center_avg"),
            F.round(F.col("rev").cast("double") * 3 / s3, 4).alias("vs_center"),
        )
    )


@q(
    "ds_channel_null_union",
    """
    WITH u AS (
      SELECT 'order' AS channel, o_orderpriority AS attr,
             year(o_orderdate) AS yr,
             CAST(o_totalprice AS DECIMAL(18,4)) AS amount
      FROM orders
      UNION ALL
      SELECT 'return' AS channel, CAST(NULL AS VARCHAR) AS attr,
             year(l_shipdate) AS yr,
             CAST(l_extendedprice AS DECIMAL(18,4)) AS amount
      FROM lineitem WHERE l_returnflag = 'R'
      UNION ALL
      SELECT 'web' AS channel, event_type AS attr,
             year(ts) AS yr,
             CAST(value AS DECIMAL(18,4)) AS amount
      FROM events
    )
    SELECT channel, attr, yr, count(*) AS n,
           CAST(round(sum(amount), 2) AS DOUBLE) AS total
    FROM u GROUP BY channel, attr, yr
    """,
    "tpcds", "union", "null-columns",
)
def ds_channel_null_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q76 shape: a three-channel UNION ALL where each branch
    NULL-fills the columns it lacks (q76's ss_store_sk IS NULL branches),
    then one aggregate over the union.  Branch types must reconcile —
    the NULL attr is an explicit CAST(NULL AS STRING), the amounts are
    decimal-aligned across three different source columns."""
    orders, li, ev = _t(spark, sf_dir, "orders", "lineitem", "events")
    b1 = orders.select(
        F.lit("order").alias("channel"),
        F.col("o_orderpriority").alias("attr"),
        F.year("o_orderdate").alias("yr"),
        F.col("o_totalprice").cast("decimal(18,4)").alias("amount"),
    )
    b2 = li.filter(F.col("l_returnflag") == "R").select(
        F.lit("return").alias("channel"),
        F.lit(None).cast("string").alias("attr"),
        F.year("l_shipdate").alias("yr"),
        F.col("l_extendedprice").cast("decimal(18,4)").alias("amount"),
    )
    b3 = ev.select(
        F.lit("web").alias("channel"),
        F.col("event_type").alias("attr"),
        F.year("ts").alias("yr"),
        F.col("value").cast("decimal(18,4)").alias("amount"),
    )
    return (
        b1.unionByName(b2)
        .unionByName(b3)
        .groupBy("channel", "attr", "yr")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("amount"), 2).cast("double").alias("total"),
        )
    )


@q(
    "ds_class_share",
    """
    WITH rev AS (
      SELECT p_brand, p_type,
             sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    )
    SELECT p_brand, p_type,
           CAST(round(rev, 2) AS DOUBLE) AS rev,
           round(CAST(rev AS DOUBLE) /
                 sum(CAST(rev AS DOUBLE)) OVER (PARTITION BY p_brand), 6)
             AS brand_share
    FROM rev
    QUALIFY CAST(rev AS DOUBLE) /
            sum(CAST(rev AS DOUBLE)) OVER (PARTITION BY p_brand) > 0.2
    """,
    "tpcds", "window", "share",
)
def ds_class_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q98/q12/q20 shape: revenue share of a class within its
    category — the ratio_to_report idiom as a sum-over-partition window
    on top of one aggregation, keeping classes above 20% of their brand."""
    from pyspark.sql import Window as W

    li, part = _t(spark, sf_dir, "lineitem", "part")
    rev = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("rev"))
    )
    share = F.col("rev").cast("double") / F.sum(
        F.col("rev").cast("double")
    ).over(W.partitionBy("p_brand"))
    return (
        rev.withColumn("brand_share_raw", share)
        .filter(F.col("brand_share_raw") > 0.2)
        .select(
            "p_brand",
            "p_type",
            F.round("rev", 2).cast("double").alias("rev"),
            F.round("brand_share_raw", 6).alias("brand_share"),
        )
    )


@q(
    "ds_best_worst_items",
    """
    WITH perf AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS net
      FROM lineitem GROUP BY 1
    ), ranked AS (
      SELECT l_partkey, net,
             rank() OVER (ORDER BY net DESC, l_partkey) AS best_rnk,
             rank() OVER (ORDER BY net ASC,  l_partkey) AS worst_rnk
      FROM perf
    )
    SELECT b.best_rnk AS rnk, pb.p_name AS best_part, pw.p_name AS worst_part,
           CAST(round(b.net, 2) AS DOUBLE) AS best_net,
           CAST(round(w.net, 2) AS DOUBLE) AS worst_net
    FROM ranked b
    JOIN ranked w ON b.best_rnk = w.worst_rnk
    JOIN part pb ON b.l_partkey = pb.p_partkey
    JOIN part pw ON w.l_partkey = pw.p_partkey
    WHERE b.best_rnk <= 10
    """,
    "tpcds", "window", "rank-join",
)
def ds_best_worst_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q44 shape: best and worst performing items side by side —
    two opposite global ranks over one aggregate, equi-joined ON THE RANK
    NUMBER, then name lookups.  The double rank is one window stage (same
    sort, both directions derivable); the rank-number join is tiny (top
    10), part lookups broadcast.  Deterministic: exact decimal nets with
    partkey tie-breaks."""
    from pyspark.sql import Window as W

    li, part = _t(spark, sf_dir, "lineitem", "part")
    perf = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        ).alias("net")
    )
    ranked = perf.select(
        "l_partkey",
        "net",
        F.rank().over(W.orderBy(F.col("net").desc(), "l_partkey")).alias("best_rnk"),
        F.rank().over(W.orderBy(F.col("net").asc(), "l_partkey")).alias("worst_rnk"),
    )
    b = ranked.filter(F.col("best_rnk") <= 10).select(
        F.col("best_rnk").alias("rnk"),
        F.col("l_partkey").alias("bk"),
        F.col("net").alias("bnet"),
    )
    w = ranked.select(
        F.col("worst_rnk").alias("wrnk"),
        F.col("l_partkey").alias("wk"),
        F.col("net").alias("wnet"),
    )
    pb = part.select(F.col("p_partkey").alias("bpk"), F.col("p_name").alias("best_part"))
    pw = part.select(F.col("p_partkey").alias("wpk"), F.col("p_name").alias("worst_part"))
    return (
        b.join(w, F.col("rnk") == F.col("wrnk"))
        .join(F.broadcast(pb), F.col("bk") == F.col("bpk"))
        .join(F.broadcast(pw), F.col("wk") == F.col("wpk"))
        .select(
            "rnk",
            "best_part",
            "worst_part",
            F.round("bnet", 2).cast("double").alias("best_net"),
            F.round("wnet", 2).cast("double").alias("worst_net"),
        )
    )


@q(
    "ds_cumulative_compare",
    """
    WITH monthly AS (
      SELECT c_mktsegment AS seg, month(o_orderdate) AS mo,
             sum(CASE WHEN o_orderstatus = 'O'
                      THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS rev_o,
             sum(CASE WHEN o_orderstatus = 'F'
                      THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS rev_f
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE year(o_orderdate) = 1997
      GROUP BY 1, 2
    ), cum AS (
      SELECT seg, mo,
             sum(coalesce(rev_o, 0)) OVER w AS cum_o,
             sum(coalesce(rev_f, 0)) OVER w AS cum_f
      FROM monthly
      WINDOW w AS (PARTITION BY seg ORDER BY mo ROWS UNBOUNDED PRECEDING)
    )
    SELECT seg, mo,
           CAST(round(cum_o, 2) AS DOUBLE) AS cum_o,
           CAST(round(cum_f, 2) AS DOUBLE) AS cum_f
    FROM cum WHERE CAST(cum_o AS DOUBLE) > CAST(cum_f AS DOUBLE)
    """,
    "tpcds", "window", "cumulative",
)
def ds_cumulative_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q51 shape: two channels' cumulative revenue racing over the
    month sequence, keeping the months where one channel's running total
    leads the other.  One conditional aggregation + one running-sum
    window (q51 writes it as a FULL OUTER JOIN of two windowed subqueries;
    the conditional-agg form is the same result with one scan and one
    window)."""
    from pyspark.sql import Window as W

    orders, customer = _t(spark, sf_dir, "orders", "customer")
    monthly = (
        orders.filter(F.year("o_orderdate") == 1997)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "O",
                    F.col("o_totalprice").cast("decimal(18,4)"),
                )
            ).alias("rev_o"),
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "F",
                    F.col("o_totalprice").cast("decimal(18,4)"),
                )
            ).alias("rev_f"),
        )
    )
    w = (
        W.partitionBy("seg")
        .orderBy("mo")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = monthly.select(
        "seg",
        "mo",
        F.sum(F.coalesce("rev_o", F.lit(0))).over(w).alias("cum_o"),
        F.sum(F.coalesce("rev_f", F.lit(0))).over(w).alias("cum_f"),
    )
    return cum.filter(
        F.col("cum_o").cast("double") > F.col("cum_f").cast("double")
    ).select(
        "seg",
        "mo",
        F.round("cum_o", 2).cast("double").alias("cum_o"),
        F.round("cum_f", 2).cast("double").alias("cum_f"),
    )


@q(
    "ds_supplier_below_avg_parts",
    """
    WITH sp AS (
      SELECT l_suppkey, l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
      FROM lineitem GROUP BY 1, 2
    ), avgd AS (
      SELECT l_suppkey, sum(rev) AS supp_sum, count(*) AS n_parts
      FROM sp GROUP BY 1
    )
    SELECT l_suppkey, l_partkey, s_name, p_name,
           CAST(round(rev, 2) AS DOUBLE) AS rev,
           CAST(round(supp_sum, 2) AS DOUBLE) AS supp_sum,
           CAST(n_parts AS BIGINT) AS n_parts
    FROM sp
    JOIN avgd USING (l_suppkey)
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE CAST(rev AS DOUBLE) * n_parts < 0.25 * CAST(supp_sum AS DOUBLE)
    ORDER BY l_suppkey, l_partkey LIMIT 100
    """,
    "tpcds", "having", "below-avg",
)
def ds_supplier_below_avg_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q65 shape: (supplier, part) pairs whose revenue sits far
    below the supplier's average part — the per-group average re-joined
    to the grain it averaged over, then name lookups.  The avg side is
    one row per supplier (tiny) and broadcasts; exact decimal sums make
    the 0.25x cut deterministic."""
    li, supplier, part = _t(spark, sf_dir, "lineitem", "supplier", "part")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("rev")
    )
    # exact decimal sum + count displayed instead of a rounded float
    # average: the two engines round half-way doubles apart
    avgd = sp.groupBy("l_suppkey").agg(
        F.sum("rev").alias("supp_sum"), F.count("*").alias("n_parts")
    )
    return (
        sp.join(F.broadcast(avgd), "l_suppkey")
        .filter(
            F.col("rev").cast("double") * F.col("n_parts")
            < 0.25 * F.col("supp_sum").cast("double")
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_suppkey",
            "l_partkey",
            "s_name",
            "p_name",
            F.round("rev", 2).cast("double").alias("rev"),
            F.round("supp_sum", 2).cast("double").alias("supp_sum"),
            F.col("n_parts").cast("bigint").alias("n_parts"),
        )
        # total order on the UNIQUE key pair: (s_name, p_name) has
        # duplicate names, which made the LIMIT boundary nondeterministic
        .orderBy("l_suppkey", "l_partkey")
        .limit(100)
    )


@q(
    "ds_big_ticket_households",
    """
    WITH big AS (
      SELECT l_orderkey, count(*) AS n_lines
      FROM lineitem GROUP BY 1 HAVING count(*) BETWEEN 5 AND 7
    )
    SELECT o_custkey, count(*) AS n_big_orders,
           CAST(sum(n_lines) AS BIGINT) AS total_lines
    FROM orders JOIN big ON o_orderkey = l_orderkey
    GROUP BY o_custkey HAVING count(*) >= 2
    """,
    "tpcds", "having", "cohort",
)
def ds_big_ticket_households(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q34/q73 shape: customers with repeated big-ticket orders —
    orders whose line count lands in a band, grouped to the customer with
    a HAVING on the repeat count.  Two hash aggs + one join; the order-
    grain agg is the big side and drives the shuffle."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lines"))
        .filter(F.col("n_lines").between(5, 7))
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_big_orders"),
            F.sum("n_lines").cast("bigint").alias("total_lines"),
        )
        .filter(F.col("n_big_orders") >= 2)
    )


@q(
    "ds_two_hop_exists",
    """
    SELECT month(o.o_orderdate) AS mo,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total
    FROM orders o
    WHERE year(o.o_orderdate) = 1997
      AND EXISTS (
        SELECT 1 FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
          AND o2.o_orderkey <> o.o_orderkey
          AND year(o2.o_orderdate) = 1997
          AND month(o2.o_orderdate) = month(o.o_orderdate)
      )
    GROUP BY 1
    """,
    "tpcds", "exists", "self-join",
)
def ds_two_hop_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q95 shape: rows that co-occur with ANOTHER row of the same
    key (q95's ws_order_number with a different warehouse) — a self
    LEFT SEMI join on (customer, month) with an orderkey inequality
    residual, aggregated by month."""
    (orders,) = _t(spark, sf_dir, "orders")
    o97 = orders.filter(F.year("o_orderdate") == 1997).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.month("o_orderdate").alias("mo"),
    )
    other = o97.select(
        F.col("o_custkey").alias("c2"),
        F.col("mo").alias("m2"),
        F.col("o_orderkey").alias("k2"),
    )
    return (
        o97.join(
            other,
            (F.col("o_custkey") == F.col("c2"))
            & (F.col("mo") == F.col("m2"))
            & (F.col("o_orderkey") != F.col("k2")),
            "left_semi",
        )
        .groupBy("mo")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total"),
        )
    )


@q(
    "ds_quarterly_vs_monthly",
    """
    WITH monthly AS (
      SELECT p_brand, year(l_shipdate) AS yr, quarter(l_shipdate) AS qt,
             month(l_shipdate) AS mo,
             sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2, 3, 4
    ), qd AS (
      SELECT p_brand, yr, qt, mo, rev,
             sum(rev) OVER (PARTITION BY p_brand, yr, qt) AS q_sum,
             count(*) OVER (PARTITION BY p_brand, yr, qt) AS n_mo
      FROM monthly
    )
    SELECT p_brand, yr, mo,
           CAST(round(rev, 2) AS DOUBLE) AS rev,
           CAST(round(q_sum, 2) AS DOUBLE) AS q_sum,
           CAST(n_mo AS BIGINT) AS n_mo,
           round(CAST(rev AS DOUBLE) * n_mo / CAST(q_sum AS DOUBLE), 4)
             AS vs_quarter
    FROM qd
    WHERE CAST(q_sum AS DOUBLE) > 0
      AND CAST(rev AS DOUBLE) * n_mo > 1.4 * CAST(q_sum AS DOUBLE)
    ORDER BY p_brand, yr, mo LIMIT 100
    """,
    "tpcds", "window", "timeseries",
)
def ds_quarterly_vs_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q53/q63 shape: months that outrun their quarter's average —
    the quarterly mean is a window over the monthly aggregate (exact
    decimal sum / count, not float avg), with a 1.4x spike filter."""
    from pyspark.sql import Window as W

    li, part = _t(spark, sf_dir, "lineitem", "part")
    monthly = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            "p_brand",
            F.year("l_shipdate").alias("yr"),
            F.quarter("l_shipdate").alias("qt"),
            F.month("l_shipdate").alias("mo"),
        )
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("rev"))
    )
    w = W.partitionBy("p_brand", "yr", "qt")
    # display the EXACT decimal quarter sum + month count, never a rounded
    # float average: round(sum/count, 2) lands on half-way doubles that
    # the two engines round apart (found live at sf0.01, Brand#3 2001-10)
    qd = monthly.withColumn("q_sum", F.sum("rev").over(w)).withColumn(
        "n_mo", F.count("*").over(w)
    )
    qs_d = F.col("q_sum").cast("double")
    return (
        qd.filter(
            (qs_d > 0)
            & (F.col("rev").cast("double") * F.col("n_mo") > 1.4 * qs_d)
        )
        .select(
            "p_brand",
            "yr",
            "mo",
            F.round("rev", 2).cast("double").alias("rev"),
            F.round("q_sum", 2).cast("double").alias("q_sum"),
            F.col("n_mo").cast("bigint").alias("n_mo"),
            F.round(
                F.col("rev").cast("double") * F.col("n_mo") / qs_d, 4
            ).alias("vs_quarter"),
        )
        .orderBy("p_brand", "yr", "mo")
        .limit(100)
    )


@q(
    "ds_yearly_channel_ratio",
    """
    WITH per_cust AS (
      SELECT o_custkey,
             sum(CASE WHEN o_orderstatus = 'O'
                      THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS rev_o,
             sum(CASE WHEN o_orderstatus = 'F'
                      THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS rev_f
      FROM orders WHERE year(o_orderdate) = 1997
      GROUP BY 1
    )
    SELECT o_custkey,
           CAST(round(rev_o, 2) AS DOUBLE) AS rev_o,
           CAST(round(rev_f, 2) AS DOUBLE) AS rev_f,
           round(CAST(rev_o AS DOUBLE) / CAST(rev_f AS DOUBLE), 4) AS o_f_ratio
    FROM per_cust
    WHERE rev_o IS NOT NULL AND rev_f IS NOT NULL
    ORDER BY o_f_ratio DESC, o_custkey LIMIT 100
    """,
    "tpcds", "pivot", "ratio",
)
def ds_yearly_channel_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q78 shape: per-customer cross-channel spend ratio for one
    year, customers active in BOTH channels only, ranked by how lopsided
    the split is.  One conditional aggregation (q78 writes three CTE
    self-joins; this is the one-scan form on the shared key)."""
    (orders,) = _t(spark, sf_dir, "orders")
    per_cust = (
        orders.filter(F.year("o_orderdate") == 1997)
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "O",
                    F.col("o_totalprice").cast("decimal(18,4)"),
                )
            ).alias("rev_o"),
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "F",
                    F.col("o_totalprice").cast("decimal(18,4)"),
                )
            ).alias("rev_f"),
        )
    )
    return (
        per_cust.filter(F.col("rev_o").isNotNull() & F.col("rev_f").isNotNull())
        .select(
            "o_custkey",
            F.round("rev_o", 2).cast("double").alias("rev_o"),
            F.round("rev_f", 2).cast("double").alias("rev_f"),
            F.round(
                F.col("rev_o").cast("double") / F.col("rev_f").cast("double"), 4
            ).alias("o_f_ratio"),
        )
        .orderBy(F.col("o_f_ratio").desc(), "o_custkey")
        .limit(100)
    )


@q(
    "ds_returns_above_nation_avg",
    """
    WITH ret AS (
      SELECT o_custkey, c_nationkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS ret_amt
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
      GROUP BY 1, 2
    ), nation_tot AS (
      SELECT c_nationkey, sum(ret_amt) AS nat_sum, count(*) AS n_ret
      FROM ret GROUP BY 1
    )
    SELECT o_custkey, n_name,
           CAST(round(ret_amt, 2) AS DOUBLE) AS ret_amt,
           CAST(round(nat_sum, 2) AS DOUBLE) AS nat_sum,
           CAST(n_ret AS BIGINT) AS n_ret
    FROM ret
    JOIN nation_tot USING (c_nationkey)
    JOIN nation ON c_nationkey = n_nationkey
    WHERE CAST(ret_amt AS DOUBLE) * n_ret > 1.2 * CAST(nat_sum AS DOUBLE)
    """,
    "tpcds", "returns", "above-avg",
)
def ds_returns_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q1/q30/q81 shape: customers whose RETURNED revenue exceeds
    1.2x their nation's average returner — the returns CTE reused twice
    (detail + per-nation average), the average side tiny and broadcast."""
    li, orders, customer, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    ret = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_custkey", "c_nationkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("ret_amt"))
    )
    # exact decimal nation sum + returner count, not a rounded float avg
    nation_tot = ret.groupBy("c_nationkey").agg(
        F.sum("ret_amt").alias("nat_sum"), F.count("*").alias("n_ret")
    )
    return (
        ret.join(F.broadcast(nation_tot), "c_nationkey")
        .filter(
            F.col("ret_amt").cast("double") * F.col("n_ret")
            > 1.2 * F.col("nat_sum").cast("double")
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "o_custkey",
            "n_name",
            F.round("ret_amt", 2).cast("double").alias("ret_amt"),
            F.round("nat_sum", 2).cast("double").alias("nat_sum"),
            F.col("n_ret").cast("bigint").alias("n_ret"),
        )
    )


@q(
    "ds_channel_rollup_union",
    """
    WITH per_order_ret AS (
      SELECT l_orderkey,
             sum(CASE WHEN l_returnflag = 'R'
                      THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS ret
      FROM lineitem GROUP BY 1
    )
    SELECT o_orderstatus AS channel, o_orderpriority AS priority,
           CAST(grouping(o_orderstatus) AS INT)
             + CAST(grouping(o_orderpriority) AS INT) AS lvl,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sales,
           CAST(round(coalesce(sum(ret), 0), 2) AS DOUBLE) AS returns
    FROM orders LEFT JOIN per_order_ret ON o_orderkey = l_orderkey
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "tpcds", "rollup", "union-channels",
)
def ds_channel_rollup_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q80 shape: the channel report — sales and returns side by
    side, rolled up channel -> priority -> grand total.  Returns
    pre-aggregate to the order grain BEFORE the join (the shuffle carries
    one row per order, not one per return line); q80's three-channel
    UNION collapses to the status column on this schema."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    per_order_ret = li.groupBy("l_orderkey").agg(
        F.sum(
            F.when(
                F.col("l_returnflag") == "R",
                F.col("l_extendedprice").cast("decimal(18,4)"),
            )
        ).alias("ret")
    )
    return (
        orders.join(per_order_ret, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        # rename BEFORE rollup: F.grouping() cannot see grouping-column
        # aliases introduced inside rollup()
        .withColumnRenamed("o_orderstatus", "channel")
        .withColumnRenamed("o_orderpriority", "priority")
        .rollup("channel", "priority")
        .agg(
            (
                F.grouping("channel").cast("int")
                + F.grouping("priority").cast("int")
            ).alias("lvl"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sales"),
            F.round(F.coalesce(F.sum("ret"), F.lit(0)), 2)
            .cast("double")
            .alias("returns"),
        )
        .select("channel", "priority", "lvl", "sales", "returns")
    )


@q(
    "ds_disjunct_band_avgs",
    """
    SELECT count(*) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_price,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE (o_orderpriority = '1-URGENT'
             AND l_quantity BETWEEN 1 AND 15 AND l_discount BETWEEN 0.02 AND 0.06)
       OR (o_orderpriority = '2-HIGH'
             AND l_quantity BETWEEN 16 AND 35 AND l_discount BETWEEN 0.04 AND 0.08)
       OR (o_orderpriority = '5-LOW'
             AND l_quantity BETWEEN 36 AND 50 AND l_discount BETWEEN 0.00 AND 0.04)
    """,
    "tpcds", "disjunct", "bands",
)
def ds_disjunct_band_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q13/q48/q85 shape: one aggregate under a three-way
    DISJUNCTION of correlated band predicates — the filter Catalyst must
    keep as a residual (no single band is pushable alone) while still
    pushing the join keys.  Exact decimal sums; q13 reports avgs, which
    are n + exact sums here (same information, no float-avg rounding
    hazard)."""
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    band = (
        (
            (F.col("o_orderpriority") == "1-URGENT")
            & F.col("l_quantity").between(1, 15)
            & F.col("l_discount").between(0.02, 0.06)
        )
        | (
            (F.col("o_orderpriority") == "2-HIGH")
            & F.col("l_quantity").between(16, 35)
            & F.col("l_discount").between(0.04, 0.08)
        )
        | (
            (F.col("o_orderpriority") == "5-LOW")
            & F.col("l_quantity").between(36, 50)
            & F.col("l_discount").between(0.00, 0.04)
        )
    )
    return j.filter(band).agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total_price"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total_qty"),
    )


@q(
    "ds_six_band_distinct_stats",
    """
    SELECT band, count(*) AS n,
           count(DISTINCT l_partkey) AS n_parts,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total
    FROM (
      SELECT l_partkey, l_extendedprice,
             CASE WHEN l_quantity <= 10 THEN 'b1'
                  WHEN l_quantity <= 20 THEN 'b2'
                  WHEN l_quantity <= 30 THEN 'b3'
                  WHEN l_quantity <= 40 THEN 'b4'
                  ELSE 'b5' END AS band
      FROM lineitem
    )
    GROUP BY band
    """,
    "tpcds", "bands", "distinct",
)
def ds_six_band_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q28 shape: per-band count + COUNT DISTINCT + sum from one
    table.  q28 writes six self-scan subqueries; the single-scan CASE
    banding is the same result with one Expand-free aggregate (the
    distinct lands in Spark's two-phase distinct-agg rewrite)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    band = (
        F.when(F.col("l_quantity") <= 10, "b1")
        .when(F.col("l_quantity") <= 20, "b2")
        .when(F.col("l_quantity") <= 30, "b3")
        .when(F.col("l_quantity") <= 40, "b4")
        .otherwise("b5")
    )
    return (
        li.select(
            "l_partkey", "l_extendedprice", band.alias("band")
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total"),
        )
    )


@q(
    "ds_cohort_spend_bands",
    """
    WITH cohort AS (
      SELECT DISTINCT o_custkey
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE year(o_orderdate) = 1997 AND month(o_orderdate) = 3
        AND p_type LIKE 'PROMO%'
    ), q2_spend AS (
      SELECT o.o_custkey,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS spend
      FROM orders o JOIN cohort c ON o.o_custkey = c.o_custkey
      WHERE year(o.o_orderdate) = 1997 AND quarter(o.o_orderdate) = 2
      GROUP BY 1
    )
    SELECT CAST(floor(CAST(spend AS DOUBLE) / 50000) AS BIGINT) AS spend_band,
           count(*) AS n_cust
    FROM q2_spend
    GROUP BY 1
    """,
    "tpcds", "cohort", "histogram",
)
def ds_cohort_spend_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q54 shape: pick a purchase cohort (bought a product type in
    a given month), then histogram their NEXT-quarter total spend into
    fixed-width revenue bands — q54's 50-dollar segments scaled to the
    fixture.  The cohort is a distinct semi-join side; banding is
    arithmetic on an exact decimal sum."""
    orders, li, part = _t(spark, sf_dir, "orders", "lineitem", "part")
    cohort = (
        orders.filter(
            (F.year("o_orderdate") == 1997) & (F.month("o_orderdate") == 3)
        )
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            part.filter(F.col("p_type").like("PROMO%")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("o_custkey")
        .distinct()
    )
    q2 = (
        orders.filter(
            (F.year("o_orderdate") == 1997) & (F.quarter("o_orderdate") == 2)
        )
        .join(cohort, "o_custkey", "left_semi")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("spend"))
    )
    return (
        q2.select(
            F.floor(F.col("spend").cast("double") / 50000)
            .cast("bigint")
            .alias("spend_band")
        )
        .groupBy("spend_band")
        .agg(F.count("*").alias("n_cust"))
    )


@q(
    "ds_excess_discount",
    """
    WITH part_avg AS (
      SELECT l_partkey AS pk,
             CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
               / count(*) AS avg_disc
      FROM lineitem GROUP BY 1
    )
    SELECT count(*) AS n_excess,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS excess_revenue
    FROM lineitem JOIN part_avg ON l_partkey = pk
    WHERE CAST(l_discount AS DOUBLE) > 1.3 * avg_disc
    """,
    "tpcds", "correlated", "above-avg",
)
def ds_excess_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q32/q92 shape: 'excess discount' — lineitems discounted
    more than 1.3x their part's average discount; the correlated scalar
    subquery decorrelates into one per-part aggregate re-joined to the
    detail (exactly what Catalyst's DecorrelateInnerQuery emits), exact
    decimal sums for the averaged measure."""
    (li,) = _t(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("avg_disc")
    )
    return (
        li.join(part_avg, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_discount").cast("double") > 1.3 * F.col("avg_disc"))
        .agg(
            F.count("*").alias("n_excess"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("excess_revenue"),
        )
    )


@q(
    "ds_common_items_rollup",
    """
    WITH common AS (
      SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'O'
      INTERSECT
      SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'P'
    )
    SELECT o_orderstatus AS channel, p_brand,
           CAST(grouping(o_orderstatus) AS INT)
             + CAST(grouping(p_brand) AS INT) AS lvl,
           count(*) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    JOIN common ON lineitem.l_partkey = common.l_partkey
    GROUP BY ROLLUP (o_orderstatus, p_brand)
    """,
    "tpcds", "intersect", "rollup",
)
def ds_common_items_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q14b shape: cross-channel common items (the three-way
    INTERSECT of per-channel item sets) feeding a channel/brand ROLLUP of
    revenue — q14's cross_items CTE re-joined to the facts.  The common
    set is small and semi-joins the detail."""
    li, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")

    def chan_items(status: str) -> DataFrame:
        return (
            li.join(
                orders.filter(F.col("o_orderstatus") == status),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select("l_partkey")
            .distinct()
        )

    common = (
        chan_items("O").intersect(chan_items("F")).intersect(chan_items("P"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(common, "l_partkey", "left_semi")
        .withColumnRenamed("o_orderstatus", "channel")
        .rollup("channel", "p_brand")
        .agg(
            (
                F.grouping("channel").cast("int")
                + F.grouping("p_brand").cast("int")
            ).alias("lvl"),
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .select("channel", "p_brand", "lvl", "n", "revenue")
    )


@q(
    "ds_inlist_or_members",
    """
    WITH big AS (
      SELECT o_custkey AS bk
      FROM orders GROUP BY 1
      ORDER BY sum(CAST(o_totalprice AS DECIMAL(18,4))) DESC, o_custkey
      LIMIT 100
    )
    SELECT c_mktsegment, count(*) AS n,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_bal
    FROM customer LEFT JOIN big ON c_custkey = bk
    WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY') OR bk IS NOT NULL
    GROUP BY c_mktsegment
    """,
    "tpcds", "disjunct", "semi-join",
)
def ds_inlist_or_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q15/q45 shape: an attribute IN-list OR membership in a
    subquery-derived set — the disjunction a semi-join cannot express
    alone, planned as a LEFT join against the (tiny, broadcast) member
    set with an is-not-null flag in the OR.  The member set is a
    deterministic top-k (total order with key tie-break)."""
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    big = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("t"))
        .orderBy(F.col("t").desc(), "o_custkey")
        .limit(100)
        .select(F.col("o_custkey").alias("bk"))
    )
    return (
        customer.join(F.broadcast(big), F.col("c_custkey") == F.col("bk"), "left")
        .filter(
            F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY")
            | F.col("bk").isNotNull()
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_bal"),
        )
    )


@q(
    "ds_multi_supplier_no_return",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
        WHERE l1.l_orderkey = o_orderkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem lr
        WHERE lr.l_orderkey = o_orderkey AND lr.l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    """,
    "tpcds", "exists", "anti-join",
)
def ds_multi_supplier_no_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q16 shape: orders involving AT LEAST TWO suppliers
    (EXISTS a sibling line with a different supplier) and NO returned
    line (NOT EXISTS) — the semi + anti join pair on the same fact.
    The multi-supplier set computes as one aggregate
    (countDistinct(suppkey) > 1), not q16's literal self-join, then
    semi/anti joins apply in sequence."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("l_orderkey")
    )
    returned = (
        li.filter(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    )
    return (
        orders.join(
            multi, F.col("o_orderkey") == multi["l_orderkey"], "left_semi"
        )
        .join(
            returned,
            F.col("o_orderkey") == returned["l_orderkey"],
            "left_anti",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@q(
    "ds_single_channel_profile",
    """
    WITH o97 AS (SELECT * FROM orders WHERE year(o_orderdate) = 1997)
    SELECT c_mktsegment, count(DISTINCT c_custkey) AS n_cust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_bal
    FROM customer
    WHERE EXISTS (SELECT 1 FROM o97 WHERE o_custkey = c_custkey
                    AND o_orderstatus = 'O')
      AND NOT EXISTS (SELECT 1 FROM o97 WHERE o_custkey = c_custkey
                        AND o_orderstatus = 'F')
      AND NOT EXISTS (SELECT 1 FROM o97 WHERE o_custkey = c_custkey
                        AND o_orderstatus = 'P')
    GROUP BY c_mktsegment
    """,
    "tpcds", "exists", "anti-join",
)
def ds_single_channel_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q69 shape: customers active in exactly one channel — one
    semi join (the required channel) chained with TWO anti joins (the
    excluded channels), all on the same year slice, then a demographic
    profile.  Three derived channel key-sets from one scan."""
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    o97 = orders.filter(F.year("o_orderdate") == 1997)

    def chan_keys(status: str) -> DataFrame:
        return (
            o97.filter(F.col("o_orderstatus") == status)
            .select(F.col("o_custkey").alias(f"k_{status}"))
            .distinct()
        )

    return (
        customer.join(
            chan_keys("O"), F.col("c_custkey") == F.col("k_O"), "left_semi"
        )
        .join(chan_keys("F"), F.col("c_custkey") == F.col("k_F"), "left_anti")
        .join(chan_keys("P"), F.col("c_custkey") == F.col("k_P"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_cust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_bal"),
        )
    )


@q(
    "ds_attr_avg_report",
    """
    SELECT p_brand,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) AS avg_disc,
           CAST(sum(CAST(l_tax AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) AS avg_tax
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part ON l_partkey = p_partkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY p_brand
    """,
    "tpcds", "star-avg",
)
def ds_attr_avg_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q7/q26 shape: four averaged measures per item over a
    demographic+promotion slice of the fact (q7 store, q26 catalog —
    identical form).  Averages are exact-decimal sums divided by the
    group count in double, so both engines round identical values —
    a double-accumulated avg() could differ in the last ulp."""
    li, orders, customer, part = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "part"
    )

    def dec_avg(col: str, alias: str):
        # UNROUNDED on purpose: the decimal sum is exact and IEEE
        # double division is deterministic, so both engines emit the
        # bit-identical double; round()-ing at Ndp would re-introduce
        # the half-way-tie divergence (Spark HALF_UP vs DuckDB's
        # to-even on doubles) this entry once hit at sf0.001.
        return (
            F.sum(F.col(col).cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias(alias)

    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            (F.col("c_mktsegment") == "BUILDING")
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        )
        .groupBy("p_brand")
        .agg(
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            dec_avg("l_discount", "avg_disc"),
            dec_avg("l_tax", "avg_tax"),
        )
    )


@q(
    "ds_substr_inlist_revenue",
    """
    WITH rich AS (
      SELECT c_nationkey FROM customer GROUP BY c_nationkey
      HAVING sum(CASE WHEN c_acctbal > 4000 THEN 1 ELSE 0 END) >= 30
    )
    SELECT n_name,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE substr(n_name, 8, 1) IN ('1', '2')
      AND c_nationkey IN (SELECT c_nationkey FROM rich)
    GROUP BY n_name
    """,
    "tpcds", "substr-inlist",
)
def ds_substr_inlist_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q8 shape: revenue per store restricted to an IN-list over
    substr(zip) INTERSECTED with a derived set (zips with enough
    preferred customers).  Here: nation-prefix IN-list + nations with
    >= 3 high-balance customers, as a broadcast-able semi join."""
    orders, customer, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    rich = (
        customer.groupBy("c_nationkey")
        .agg(
            F.sum(F.when(F.col("c_acctbal") > 4000, 1).otherwise(0)).alias("nr")
        )
        .filter(F.col("nr") >= 30)
        .select("c_nationkey")
    )
    picked = nation.filter(F.substring("n_name", 8, 1).isin("1", "2"))
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(picked), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            rich.withColumnRenamed("c_nationkey", "rk"),
            F.col("c_nationkey") == F.col("rk"),
            "left_semi",
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("revenue")
        )
    )


@q(
    "ds_cross_border_brand",
    """
    SELECT p_brand, month(o_orderdate) AS mth,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE year(o_orderdate) = 1996
      AND c_nationkey <> s_nationkey
    GROUP BY p_brand, month(o_orderdate)
    """,
    "tpcds", "cross-border",
)
def ds_cross_border_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q19 shape: brand revenue by month where the buyer and the
    fulfilling store sit in DIFFERENT zip zones — here customer nation
    != supplier nation.  The inequality predicate rides on the joined
    row (no extra join), so the plan is the plain 5-way star."""
    li, orders, customer, supplier, part = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "part"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            (F.year("o_orderdate") == 1996)
            & (F.col("c_nationkey") != F.col("s_nationkey"))
        )
        .groupBy("p_brand", F.month("o_orderdate").alias("mth"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@q(
    "ds_qty_shift_ratio",
    """
    WITH qty AS (
      SELECT s_name, p_brand,
             sum(CASE WHEN l_shipdate < TIMESTAMP '1998-06-01'
                      THEN CAST(l_quantity AS DECIMAL(18,4))
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS qty_before,
             sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-06-01'
                      THEN CAST(l_quantity AS DECIMAL(18,4))
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS qty_after
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate < TIMESTAMP '1998-12-01'
      GROUP BY s_name, p_brand
    )
    SELECT s_name, p_brand,
           CAST(qty_before AS DOUBLE) AS qty_before,
           CAST(qty_after AS DOUBLE) AS qty_after
    FROM qty
    WHERE qty_before > 0 AND qty_after > 0
      AND CAST(qty_after AS DOUBLE) / CAST(qty_before AS DOUBLE) >= 2.0/3.0
      AND CAST(qty_after AS DOUBLE) / CAST(qty_before AS DOUBLE) <= 3.0/2.0
    """,
    "tpcds", "before-after-ratio",
)
def ds_qty_shift_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q21 shape: per (warehouse, item) inventory BEFORE vs
    AFTER a date cut, keeping pairs whose shift ratio stays within
    [2/3, 3/2].  Both conditional sums come from ONE scan (no
    self-join), the reference's preferred form for this query
    (backends-velox ScalarFunctionsValidateSuite covers the
    conditional-aggregate rewrite).  Ratio compares in double on
    exact-decimal sums — identical in both engines."""
    li, supplier, part = _t(spark, sf_dir, "lineitem", "supplier", "part")
    cut = F.lit("1998-06-01").cast("timestamp")
    zero = F.lit(0).cast("decimal(18,4)")
    qdec = F.col("l_quantity").cast("decimal(18,4)")
    agg = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-12-01").cast("timestamp"))
        )
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("s_name", "p_brand")
        .agg(
            F.sum(F.when(F.col("l_shipdate") < cut, qdec).otherwise(zero)).alias(
                "qb"
            ),
            F.sum(
                F.when(F.col("l_shipdate") >= cut, qdec).otherwise(zero)
            ).alias("qa"),
        )
    )
    ratio = F.col("qa").cast("double") / F.col("qb").cast("double")
    return (
        agg.filter(
            (F.col("qb") > 0)
            & (F.col("qa") > 0)
            & (ratio >= 2.0 / 3.0)
            & (ratio <= 3.0 / 2.0)
        )
        .select(
            "s_name",
            "p_brand",
            F.col("qb").cast("double").alias("qty_before"),
            F.col("qa").cast("double").alias("qty_after"),
        )
    )


@q(
    "ds_spend_above_frac_avg",
    """
    WITH spend AS (
      SELECT c_name, p_brand,
             sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS paid
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN part ON l_partkey = p_partkey
      WHERE l_returnflag = 'N'
      GROUP BY c_name, p_brand
    )
    SELECT c_name, p_brand, CAST(paid AS DOUBLE) AS paid
    FROM spend
    WHERE CAST(paid AS DOUBLE) >
          3 * (SELECT avg(CAST(paid AS DOUBLE)) FROM spend)
    """,
    "tpcds", "scalar-threshold",
)
def ds_spend_above_frac_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q24 shape: per-(customer, color) net-paid kept only when
    it exceeds a FRACTION OF THE GLOBAL AVERAGE of the same aggregate —
    the scalar-subquery-over-the-CTE-itself pattern.  The grouped CTE
    computes once; the global avg is a 1-row broadcast cross join, not
    a re-scan (the reference validates this exact plan in
    VeloxTPCDSSuite q24)."""
    li, orders, customer, part = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "part"
    )
    spend = (
        li.filter(F.col("l_returnflag") == "N")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("c_name", "p_brand")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("paid")
        )
    )
    thresh = spend.agg(
        F.avg(F.col("paid").cast("double")).alias("gavg")
    )
    return (
        spend.crossJoin(F.broadcast(thresh))
        .filter(F.col("paid").cast("double") > 3 * F.col("gavg"))
        .select(
            "c_name", "p_brand", F.col("paid").cast("double").alias("paid")
        )
    )


@q(
    "ds_rollup_geo_avgs",
    """
    SELECT n_name, c_mktsegment,
           CAST(grouping(n_name) AS INT) * 2
             + CAST(grouping(c_mktsegment) AS INT) AS gid,
           count(*) AS n_cust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) AS avg_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_nationkey < 12
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
    "tpcds", "rollup-avg",
)
def ds_rollup_geo_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q27 shape: averaged measures ROLLED UP along the
    geography hierarchy (state -> country -> total) with a grouping-id
    so report rows carry their aggregation level.  Averages are
    exact-decimal sum / count to keep the cross-engine hash stable at
    every rollup level."""
    customer, nation = _t(spark, sf_dir, "customer", "nation")
    return (
        customer.join(
            F.broadcast(nation.filter(F.col("n_nationkey") < 12)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .rollup("n_name", "c_mktsegment")
        .agg(
            (
                F.grouping("n_name").cast("int") * 2
                + F.grouping("c_mktsegment").cast("int")
            ).alias("gid"),
            F.count("*").alias("n_cust"),
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
                / F.count("*")
            ).alias("avg_bal"),
        )
        .select("n_name", "c_mktsegment", "gid", "n_cust", "avg_bal")
    )


@q(
    "ds_mfr_tri_channel_union",
    """
    WITH wanted AS (
      SELECT p_partkey, substr(p_brand, 1, 7) AS mfr FROM part
      WHERE p_type = 'ECONOMY'
    ),
    slice1 AS (
      SELECT mfr, CAST(l_extendedprice AS DECIMAL(18,4)) AS amt
      FROM lineitem JOIN wanted ON l_partkey = p_partkey
      WHERE l_returnflag = 'N' AND year(l_shipdate) = 1996
    ),
    slice2 AS (
      SELECT mfr, CAST(l_extendedprice AS DECIMAL(18,4)) AS amt
      FROM lineitem JOIN wanted ON l_partkey = p_partkey
      WHERE l_returnflag = 'A' AND year(l_shipdate) = 1996
    ),
    slice3 AS (
      SELECT mfr, CAST(l_extendedprice AS DECIMAL(18,4)) AS amt
      FROM lineitem JOIN wanted ON l_partkey = p_partkey
      WHERE l_returnflag = 'R' AND year(l_shipdate) = 1996
    )
    SELECT mfr, CAST(round(sum(amt), 2) AS DOUBLE) AS total_sales
    FROM (SELECT * FROM slice1 UNION ALL
          SELECT * FROM slice2 UNION ALL
          SELECT * FROM slice3)
    GROUP BY mfr
    """,
    "tpcds", "channel-union",
)
def ds_mfr_tri_channel_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q33/q56/q60 shape: three per-channel slices restricted to
    a derived manufacturer set, UNION ALL'd, then re-aggregated by
    manufacturer.  The wanted-item set computes once and broadcasts to
    all three slices (the reference reuses one subquery per channel)."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    wanted = part.filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey", F.substring("p_brand", 1, 7).alias("mfr")
    )
    base = (
        li.filter(F.year("l_shipdate") == 1996)
        .join(F.broadcast(wanted), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "mfr",
            "l_returnflag",
            F.col("l_extendedprice").cast("decimal(18,4)").alias("amt"),
        )
    )
    slices = [base.filter(F.col("l_returnflag") == fl).select("mfr", "amt")
              for fl in ("N", "A", "R")]
    unioned = slices[0].unionAll(slices[1]).unionAll(slices[2])
    return unioned.groupBy("mfr").agg(
        F.round(F.sum("amt"), 2).cast("double").alias("total_sales")
    )


@q(
    "ds_range_scan_items",
    """
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    JOIN (
      SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS on_hand
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-03-01'
      GROUP BY l_partkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) BETWEEN 100 AND 500
    ) inv ON p_partkey = l_partkey
    WHERE p_size BETWEEN 10 AND 40
      AND p_retailprice BETWEEN 200 AND 1400
    ORDER BY p_partkey
    LIMIT 50
    """,
    "tpcds", "range-scan",
)
def ds_range_scan_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q37/q82 shape: items inside price+size bands whose
    60-day inventory position lands in a quantity band — range
    predicates pushed to the dimension scan, a date-windowed
    aggregate on the fact, ordered limited output (unique key order
    so LIMIT is deterministic)."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    inv = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-03-01").cast("timestamp"))
        )
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("on_hand"))
        .filter(F.col("on_hand").between(100, 500))
    )
    return (
        part.filter(
            F.col("p_size").between(10, 40)
            & F.col("p_retailprice").between(200, 1400)
        )
        .join(inv, F.col("p_partkey") == F.col("l_partkey"))
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
        .limit(50)
    )


@q(
    "ds_monthly_cov_pair",
    """
    WITH m AS (
      SELECT l_suppkey, month(l_shipdate) AS mth,
             CAST(stddev_samp(l_quantity) AS DOUBLE) AS sd,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               / count(*) AS mean_qty,
             count(*) AS n
      FROM lineitem
      WHERE year(l_shipdate) = 1997 AND month(l_shipdate) IN (3, 4)
      GROUP BY l_suppkey, month(l_shipdate)
    )
    SELECT a.l_suppkey AS suppkey,
           round(a.sd / a.mean_qty, 4) AS cov_m1,
           round(b.sd / b.mean_qty, 4) AS cov_m2
    FROM m a JOIN m b ON a.l_suppkey = b.l_suppkey
    WHERE a.mth = 3 AND b.mth = 4
      AND a.n > 1 AND b.n > 1
      AND a.sd / a.mean_qty >= 0.5 AND b.sd / b.mean_qty >= 0.5
    """,
    "tpcds", "cov-pair",
)
def ds_monthly_cov_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q39 shape: per (warehouse, item, month) coefficient of
    variation (stddev/mean), self-joined across two consecutive months
    keeping pairs where BOTH months are volatile.  stddev_samp agrees
    bit-for-bit across engines on this data (already certified by
    agg_stats); the mean uses the exact-decimal-sum form."""
    (li,) = _t(spark, sf_dir, "lineitem")
    m = (
        li.filter(
            (F.year("l_shipdate") == 1997)
            & F.month("l_shipdate").isin(3, 4)
        )
        .groupBy("l_suppkey", F.month("l_shipdate").alias("mth"))
        .agg(
            F.stddev_samp("l_quantity").cast("double").alias("sd"),
            (
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
                / F.count("*")
            ).alias("mean_qty"),
            F.count("*").alias("n"),
        )
    )
    a, b = m.alias("a"), m.alias("b")
    cov_a = F.col("a.sd") / F.col("a.mean_qty")
    cov_b = F.col("b.sd") / F.col("b.mean_qty")
    return (
        a.join(b, F.col("a.l_suppkey") == F.col("b.l_suppkey"))
        .filter(
            (F.col("a.mth") == 3)
            & (F.col("b.mth") == 4)
            & (F.col("a.n") > 1)
            & (F.col("b.n") > 1)
            & (cov_a >= 0.5)
            & (cov_b >= 0.5)
        )
        .select(
            F.col("a.l_suppkey").alias("suppkey"),
            F.round(cov_a, 4).alias("cov_m1"),
            F.round(cov_b, 4).alias("cov_m2"),
        )
    )


@q(
    "ds_brand_month_top",
    """
    SELECT * FROM (
      SELECT year(l_shipdate) AS yr, month(l_shipdate) AS mth, p_brand,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2)
                  AS DOUBLE) AS revenue,
             rank() OVER (
               ORDER BY sum(CAST(l_extendedprice AS DECIMAL(18,4))) DESC,
                        year(l_shipdate), month(l_shipdate), p_brand) AS rnk
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE year(l_shipdate) = 1996
      GROUP BY 1, 2, p_brand
    ) WHERE rnk <= 10
    """,
    "tpcds", "star-topk",
)
def ds_brand_month_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q42/q52/q55 shape: the simple star — brand revenue by
    calendar month, top-10 by revenue.  The rank's ORDER BY carries
    (yr, mth, brand) tie-breakers so the cut is deterministic in both
    engines; the rank rides on the exact-decimal aggregate."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    agg = (
        li.filter(F.year("l_shipdate") == 1996)
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.year("l_shipdate").alias("yr"),
            F.month("l_shipdate").alias("mth"),
            "p_brand",
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("rev")
        )
    )
    # TakeOrderedAndProject first (distributed top-k, no global window
    # over the full aggregate), THEN rank inside the 10 kept rows: the
    # ORDER BY is total (unique tie-breakers), so rank()==row_number and
    # the within-limit rank equals the global rank.
    top = agg.orderBy(
        F.col("rev").desc(), F.col("yr"), F.col("mth"), F.col("p_brand")
    ).limit(10)
    w = Window.orderBy(
        F.col("rev").desc(), F.col("yr"), F.col("mth"), F.col("p_brand")
    )
    return top.withColumn("rnk", F.rank().over(w)).select(
        "yr",
        "mth",
        "p_brand",
        F.round("rev", 2).cast("double").alias("revenue"),
        "rnk",
    )


@q(
    "ds_weekday_matrix",
    """
    SELECT n_name,
           CAST(round(sum(CASE WHEN dayofweek(o_orderdate) = 0
                    THEN CAST(o_totalprice AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS sun_sales,
           CAST(round(sum(CASE WHEN dayofweek(o_orderdate) = 1
                    THEN CAST(o_totalprice AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS mon_sales,
           CAST(round(sum(CASE WHEN dayofweek(o_orderdate) = 2
                    THEN CAST(o_totalprice AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS tue_sales,
           CAST(round(sum(CASE WHEN dayofweek(o_orderdate) = 3
                    THEN CAST(o_totalprice AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS wed_sales,
           CAST(round(sum(CASE WHEN dayofweek(o_orderdate) = 4
                    THEN CAST(o_totalprice AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS thu_sales,
           CAST(round(sum(CASE WHEN dayofweek(o_orderdate) = 5
                    THEN CAST(o_totalprice AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS fri_sales,
           CAST(round(sum(CASE WHEN dayofweek(o_orderdate) = 6
                    THEN CAST(o_totalprice AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS sat_sales
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE year(o_orderdate) = 1997
    GROUP BY n_name
    """,
    "tpcds", "weekday-matrix",
)
def ds_weekday_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q43 shape: the per-store 7-weekday-column sales matrix —
    one scan, seven conditional decimal sums (no pivot shuffle).
    Spark dayofweek() is 1-7 Sunday-first; DuckDB's is 0-6 — the Spark
    side subtracts 1 so both sides bucket identically."""
    orders, customer, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    dow = F.dayofweek("o_orderdate") - 1
    zero = F.lit(0).cast("decimal(18,4)")
    price = F.col("o_totalprice").cast("decimal(18,4)")
    names = ["sun", "mon", "tue", "wed", "thu", "fri", "sat"]
    cols = [
        F.round(F.sum(F.when(dow == i, price).otherwise(zero)), 2)
        .cast("double")
        .alias(f"{names[i]}_sales")
        for i in range(7)
    ]
    return (
        orders.filter(F.year("o_orderdate") == 1997)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(*cols)
    )


@q(
    "ds_delay_crosstab",
    """
    SELECT l_returnflag, o_orderpriority,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30
                         THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 30
                          AND datediff('day', o_orderdate, l_shipdate) <= 60
                         THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 60
                          AND datediff('day', o_orderdate, l_shipdate) <= 90
                         THEN 1 ELSE 0 END) AS BIGINT) AS d90,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 90
                         THEN 1 ELSE 0 END) AS BIGINT) AS d120
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE year(o_orderdate) = 1996
    GROUP BY l_returnflag, o_orderpriority
    """,
    "tpcds", "delay-crosstab",
)
def ds_delay_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q50/q62 shape: order-to-ship latency bucketed into
    30/60/90/120-day bands, cross-tabbed by (ship mode, warehouse) —
    here (returnflag, priority).  One fact-fact join, conditional
    counts, no pivot operator."""
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    delay = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    def band(cond, alias):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(alias)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.year("o_orderdate") == 1996)
        .groupBy("l_returnflag", "o_orderpriority")
        .agg(
            band(delay <= 30, "d30"),
            band((delay > 30) & (delay <= 60), "d60"),
            band((delay > 60) & (delay <= 90), "d90"),
            band(delay > 90, "d120"),
        )
    )


@q(
    "ds_hour_band_channels",
    """
    WITH sliced AS (
      SELECT event_type, extract(hour FROM ts) AS hr,
             CAST(value AS DECIMAL(18,4)) AS v
      FROM events
      WHERE day(ts) BETWEEN 1 AND 7
      UNION ALL
      SELECT event_type, extract(hour FROM ts) AS hr,
             CAST(value AS DECIMAL(18,4)) AS v
      FROM events
      WHERE day(ts) BETWEEN 11 AND 17
      UNION ALL
      SELECT event_type, extract(hour FROM ts) AS hr,
             CAST(value AS DECIMAL(18,4)) AS v
      FROM events
      WHERE day(ts) BETWEEN 21 AND 27
    )
    SELECT event_type,
           CASE WHEN hr BETWEEN 6 AND 9 THEN 'breakfast'
                WHEN hr BETWEEN 17 AND 20 THEN 'dinner'
                ELSE 'other' END AS meal_band,
           count(*) AS n_events,
           CAST(round(sum(v), 2) AS DOUBLE) AS total_value
    FROM sliced
    GROUP BY 1, 2
    """,
    "tpcds", "hour-band-union",
)
def ds_hour_band_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q71 shape: three channel slices UNION ALL'd, then
    aggregated by (brand, time-of-day band) — breakfast/dinner hours
    against the events stream table (the only fixture with
    time-of-day).  The band CASE runs post-union so all three slices
    share one aggregate."""
    (events,) = _t(spark, sf_dir, "events")
    base = events.select(
        "event_type",
        F.hour("ts").alias("hr"),
        F.dayofmonth("ts").alias("dy"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    slices = [
        base.filter(F.col("dy").between(lo, hi)).select("event_type", "hr", "v")
        for lo, hi in ((1, 7), (11, 17), (21, 27))
    ]
    unioned = slices[0].unionAll(slices[1]).unionAll(slices[2])
    band = (
        F.when(F.col("hr").between(6, 9), "breakfast")
        .when(F.col("hr").between(17, 20), "dinner")
        .otherwise("other")
    )
    return (
        unioned.groupBy("event_type", band.alias("meal_band"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("v"), 2).cast("double").alias("total_value"),
        )
    )


@q(
    "ds_late_ship_promo_nulls",
    """
    SELECT p_brand,
           CAST(sum(CASE WHEN promo.pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS no_promo,
           CAST(sum(CASE WHEN promo.pk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS promo,
           count(*) AS total_cnt
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    LEFT JOIN (SELECT p_partkey AS pk FROM part WHERE p_size > 45) promo
      ON l_partkey = promo.pk
    WHERE l_shipdate > o_orderdate + INTERVAL 5 DAY
      AND year(o_orderdate) = 1997
    GROUP BY p_brand
    """,
    "tpcds", "late-ship", "left-outer",
)
def ds_late_ship_promo_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q72 shape: lines shipped MORE THAN N DAYS after the order
    (the d1.d_date > d2.d_date + 5 inequality rides the joined row),
    LEFT OUTER joined to a promotion dim, reporting promo vs no-promo
    counts per item.  The promo dim is small and broadcast."""
    li, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")
    promo = part.filter(F.col("p_size") > 45).select(
        F.col("p_partkey").alias("pk")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(promo), F.col("l_partkey") == F.col("pk"), "left")
        .filter(
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 5 DAY")
            )
            & (F.year("o_orderdate") == 1997)
        )
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("no_promo"),
            F.sum(F.when(F.col("pk").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("promo"),
            F.count("*").alias("total_cnt"),
        )
    )


@q(
    "ds_hour_profile_users",
    """
    SELECT * FROM (
      SELECT user_id, count(*) AS n_ev,
             CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total_value
      FROM events
      WHERE extract(hour FROM ts) BETWEEN 17 AND 20
        AND event_type IN ('purchase', 'click')
      GROUP BY user_id
    ) WHERE n_ev >= 5
    ORDER BY n_ev DESC, user_id
    LIMIT 40
    """,
    "tpcds", "hour-profile",
)
def ds_hour_profile_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q79/q96 shape: per-customer activity inside one
    time-of-day band (q96 counts the band, q79 profiles per-customer
    amounts within it), HAVING-filtered and top-limited with a unique
    tie-breaker (user_id) so the LIMIT cut is deterministic."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.filter(
            F.hour("ts").between(17, 20)
            & F.col("event_type").isin("purchase", "click")
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_ev"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .filter(F.col("n_ev") >= 5)
        .orderBy(F.col("n_ev").desc(), "user_id")
        .limit(40)
    )


@q(
    "ds_customer_band_lookup",
    """
    SELECT c_custkey,
           c_name || ' [' || c_mktsegment || ']' AS customer_id,
           n_name, r_name, c_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE c_acctbal BETWEEN 2000 AND 2500
      AND c_mktsegment = 'AUTOMOBILE'
    ORDER BY c_custkey
    LIMIT 60
    """,
    "tpcds", "lookup-chain",
)
def ds_customer_band_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q84 shape: customer directory lookup through a
    dimension join chain (household income band -> demographics ->
    address; here acctbal band -> nation -> region), emitting a
    concatenated display id.  Pure broadcast-chain lookup, ordered on
    the unique key."""
    customer, nation, region = _t(spark, sf_dir, "customer", "nation", "region")
    return (
        customer.filter(
            F.col("c_acctbal").between(2000, 2500)
            & (F.col("c_mktsegment") == "AUTOMOBILE")
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "c_custkey",
            F.concat(
                F.col("c_name"), F.lit(" ["), F.col("c_mktsegment"), F.lit("]")
            ).alias("customer_id"),
            "n_name",
            "r_name",
            "c_acctbal",
        )
        .orderBy("c_custkey")
        .limit(60)
    )


@q(
    "ds_returns_month_status",
    """
    SELECT month(o_orderdate) AS mth, o_orderstatus,
           count(*) AS n_returns,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS returned_value
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R'
      AND year(o_orderdate) = 1997
      AND c_mktsegment IN ('BUILDING', 'MACHINERY')
    GROUP BY month(o_orderdate), o_orderstatus
    """,
    "tpcds", "returns-report",
)
def ds_returns_month_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q91 shape: the call-center returns report — returned
    value by (month, status) for a demographic slice of customers.
    Straight star aggregate over the returns subset of the fact."""
    li, orders, customer = _t(spark, sf_dir, "lineitem", "orders", "customer")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (F.year("o_orderdate") == 1997)
            & F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        )
        .groupBy(F.month("o_orderdate").alias("mth"), "o_orderstatus")
        .agg(
            F.count("*").alias("n_returns"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("returned_value"),
        )
    )


@q(
    "ds_bounded_ship_check",
    """
    SELECT count(DISTINCT o_orderkey) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
        WHERE l1.l_orderkey = o_orderkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem lr
        WHERE lr.l_orderkey = o_orderkey AND lr.l_returnflag = 'R'
      )
    """,
    "tpcds", "semi-anti-agg",
)
def ds_bounded_ship_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q94 shape (q16's web twin): a 6-month order window,
    shipped from MORE THAN ONE warehouse (semi), never returned
    (anti), reduced to a single distinct-count + revenue row.  The
    multi-supplier set computes as countDistinct > 1, not the literal
    self-join."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("l_orderkey")
    )
    returned = (
        li.filter(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    )
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .join(multi, F.col("o_orderkey") == multi["l_orderkey"], "left_semi")
        .join(
            returned, F.col("o_orderkey") == returned["l_orderkey"], "left_anti"
        )
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_price"),
        )
    )


@q(
    "ds_spend_above_frac_avg_alt",
    """
    WITH spend AS (
      SELECT c_name, p_brand,
             sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS paid
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN part ON l_partkey = p_partkey
      WHERE l_returnflag = 'A'
      GROUP BY c_name, p_brand
    )
    SELECT c_name, p_brand, CAST(paid AS DOUBLE) AS paid
    FROM spend
    WHERE CAST(paid AS DOUBLE) >
          3 * (SELECT avg(CAST(paid AS DOUBLE)) FROM spend)
    """,
    "tpcds", "scalar-threshold",
)
def ds_spend_above_frac_avg_alt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q24b: the reference ships q24 twice, a/b differing ONLY
    in the color literal ('pale' vs 'chiffon') — this entry mirrors
    that corpus structure exactly: the q24a shape
    (ds_spend_above_frac_avg) over the OTHER returnflag slice ('A'
    instead of 'N').  Same plan, different selection literal, as in
    the reference corpus."""
    li, orders, customer, part = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "part"
    )
    spend = (
        li.filter(F.col("l_returnflag") == "A")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("c_name", "p_brand")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("paid")
        )
    )
    thresh = spend.agg(F.avg(F.col("paid").cast("double")).alias("gavg"))
    return (
        spend.crossJoin(F.broadcast(thresh))
        .filter(F.col("paid").cast("double") > 3 * F.col("gavg"))
        .select(
            "c_name", "p_brand", F.col("paid").cast("double").alias("paid")
        )
    )


@q(
    "ds_monthly_cov_pair_strict",
    """
    WITH m AS (
      SELECT l_suppkey, month(l_shipdate) AS mth,
             CAST(stddev_samp(l_quantity) AS DOUBLE) AS sd,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               / count(*) AS mean_qty,
             count(*) AS n
      FROM lineitem
      WHERE year(l_shipdate) = 1997 AND month(l_shipdate) IN (3, 4)
      GROUP BY l_suppkey, month(l_shipdate)
    )
    SELECT a.l_suppkey AS suppkey,
           round(a.sd / a.mean_qty, 4) AS cov_m1,
           round(b.sd / b.mean_qty, 4) AS cov_m2
    FROM m a JOIN m b ON a.l_suppkey = b.l_suppkey
    WHERE a.mth = 3 AND b.mth = 4
      AND a.n > 1 AND b.n > 1
      AND a.sd / a.mean_qty >= 0.5 AND b.sd / b.mean_qty >= 0.5
      AND a.sd / a.mean_qty > 0.6
    """,
    "tpcds", "cov-pair",
)
def ds_monthly_cov_pair_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q39b: the reference's b-variant of q39 is the SAME query
    with one extra volatility floor on the first month (inv1.cov > 1.5
    in the original) — mirrored here as cov_m1 > 0.6 over the q39a
    shape (ds_monthly_cov_pair).  Corpus-faithful variant, not a new
    plan."""
    (li,) = _t(spark, sf_dir, "lineitem")
    m = (
        li.filter(
            (F.year("l_shipdate") == 1997) & F.month("l_shipdate").isin(3, 4)
        )
        .groupBy("l_suppkey", F.month("l_shipdate").alias("mth"))
        .agg(
            F.stddev_samp("l_quantity").cast("double").alias("sd"),
            (
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
                / F.count("*")
            ).alias("mean_qty"),
            F.count("*").alias("n"),
        )
    )
    a, b = m.alias("a"), m.alias("b")
    cov_a = F.col("a.sd") / F.col("a.mean_qty")
    cov_b = F.col("b.sd") / F.col("b.mean_qty")
    return (
        a.join(b, F.col("a.l_suppkey") == F.col("b.l_suppkey"))
        .filter(
            (F.col("a.mth") == 3)
            & (F.col("b.mth") == 4)
            & (F.col("a.n") > 1)
            & (F.col("b.n") > 1)
            & (cov_a >= 0.5)
            & (cov_b >= 0.5)
            & (cov_a > 0.6)
        )
        .select(
            F.col("a.l_suppkey").alias("suppkey"),
            F.round(cov_a, 4).alias("cov_m1"),
            F.round(cov_b, 4).alias("cov_m2"),
        )
    )
