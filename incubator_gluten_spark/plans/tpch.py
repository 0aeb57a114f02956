"""Adapted TPC-H suite (22 queries) over the driver's trimmed star schema.

The reference ships TPC-H q1-q22 as its end-to-end correctness corpus
(tools/gluten-it/common/src/main/resources/tpch-queries/, run by
backends-velox/src/test/scala/.../VeloxTPCHSuite.scala:32-66). The driver's
testdata is a *trimmed* TPC-H (FIXTURES.md): no partsupp table, no
comment/address/phone/shipmode/commitdate/receiptdate columns, dates stored
as timestamps, decimals as doubles. Queries marked "adapted" keep the
original's *operator shape* (join graph, subquery pattern, agg structure)
while substituting available columns; q2/q9/q11/q16/q20 lose partsupp and
q21/q22 lose receipt-date/phone, as documented per query.

Every query is built with the declarative DataFrame API so Catalyst plans
scans with pushed filters + pruned columns, picks broadcast vs shuffled-hash
joins (small dims region/nation/supplier/part are broadcast at these SFs;
at 100 TB customer/orders/lineitem joins shuffle on their keys and AQE
handles skew), and fuses operator chains into WholeStageCodegen — the same
division of labor the reference relies on (SURVEY §3: Spark plans, native
executes; here Spark plans *and* executes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from incubator_gluten_spark.catalog import load_tables
from incubator_gluten_spark.plans import Q

# ---------------------------------------------------------------- helpers

def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tables = load_tables(spark, sf_dir, names)
    return [tables[n] for n in names]


def _ts(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


def _money(col) -> F.Column:
    return F.round(col, 2)


REGISTRY: list[Q] = []


def q(name: str, oracle: str | None, *tags: str):
    def deco(fn):
        REGISTRY.append(Q(name, fn, oracle, tags))
        return fn

    return deco


# ---------------------------------------------------------------- queries

@q(
    "q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "agg", "scan",
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: scan -> filter -> hash agg (two-phase partial/final)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= _ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money(F.sum("l_quantity")).alias("sum_qty"),
            _money(F.sum("l_extendedprice")).alias("sum_base_price"),
            _money(F.sum(disc_price)).alias("sum_disc_price"),
            _money(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@q(
    "q2",
    """
    SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal, n_name
    FROM supplier, nation, region
    WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND s_acctbal = (
        SELECT max(s_acctbal)
        FROM supplier s2, nation n2, region r2
        WHERE s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
          AND r2.r_name = 'EUROPE')
    """,
    "join", "subquery",
)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted (no partsupp): best-acctbal supplier in EUROPE.

    Keeps q2's shape: dimension join chain + correlated-scalar-max subquery,
    expressed as a broadcast-joined max (no equality-on-computed-floats:
    s_acctbal is raw data so cross-engine equality is exact).
    """
    supplier, nation, region = _t(spark, sf_dir, "supplier", "nation", "region")
    europe = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
    )
    # r14 (guide §2.4/§3.3): the scalar-max subquery re-evaluated the
    # whole `europe` join chain — a second supplier scan plus two more
    # broadcast joins.  localCheckpoint materializes the joined rows
    # ONCE; the max stays a tree-reduced scalar (no single-partition
    # window) and the equality join consumes the same materialized
    # values — identical results (s_acctbal is raw data, so the
    # comparison is exact), one pass over supplier.
    europe = europe.localCheckpoint()
    best = europe.agg(F.max("s_acctbal").alias("max_bal"))
    return (
        europe.join(F.broadcast(best), F.col("s_acctbal") == F.col("max_bal"))
        .select("s_suppkey", "s_name", _money(F.col("s_acctbal")).alias("s_acctbal"), "n_name")
    )


@q(
    "q3",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-01' AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    "join", "agg", "topn",
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: 3-way join -> agg -> TakeOrderedAndProject."""
    customer, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    # the shipdate filter keeps only the tail of lineitem — join it first
    # so the custkey shuffle carries the already-tiny (li ⋈ orders) rows
    # instead of shuffling every BUILDING customer against full orders
    li_f = li.filter(F.col("l_shipdate") > _ts("1998-06-01"))
    ord_f = orders.filter(F.col("o_orderdate") < _ts("1998-06-01"))
    cust_f = customer.filter(F.col("c_mktsegment") == "BUILDING")
    return (
        li_f.join(ord_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_f, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select(
            "l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("o_orderdate")
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@q(
    "q4",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    "join", "semi",
)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order priority checking, adapted: EXISTS(lineitem shipped >60d after
    order) replaces the dropped l_commitdate/l_receiptdate predicate.
    Left-semi join == EXISTS (JoinExecTransformer semi support, SURVEY §2.3)."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.filter(
            (F.col("o_orderdate") >= _ts("1996-07-01"))
            & (F.col("o_orderdate") < _ts("1996-10-01"))
        )
        .join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@q(
    "q5",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    "join", "agg",
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-table join; dims broadcast, facts shuffle."""
    customer, orders, li, supplier, nation, region = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= _ts("1996-01-01"))
            & (F.col("o_orderdate") < _ts("1997-01-01"))
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(_money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@q(
    "q6",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    "scan", "filter", "agg",
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue change: pure scan+filter+agg; all four predicates
    push to the parquet reader (PushedFilters), projection prunes to 4 cols."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(_money(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


@q(
    "q7",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    "join", "agg",
)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations (self-joined nation dim)."""
    supplier, li, orders, customer, nation = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        li.filter(F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31")))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_money(F.sum("volume")).alias("revenue"))
    )


@q(
    "q8",
    """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) / sum(volume), 4)
             AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
    "join", "agg",
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share: 8-table join + conditional aggregation."""
    part, supplier, li, orders, customer, nation, region = _t(
        spark, sf_dir, "part", "supplier", "lineitem", "orders", "customer", "nation", "region"
    )
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part.filter(F.col("p_type") == "PROMO"), F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            orders.filter(F.col("o_orderdate").between(_ts("1996-01-01"), _ts("1997-12-31"))),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "AMERICA")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
    )


@q(
    "q9",
    """
    SELECT nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) - 0.2 * p_retailprice * l_quantity
                  AS DECIMAL(18,4)) AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND o_orderkey = l_orderkey
        AND s_nationkey = n_nationkey AND p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    """,
    "join", "agg",
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit, adapted: supply cost proxied as
    0.2*p_retailprice*l_quantity since partsupp.ps_supplycost was dropped."""
    part, supplier, li, orders, nation = _t(
        spark, sf_dir, "part", "supplier", "lineitem", "orders", "nation"
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.2 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(
            part.filter(F.col("p_name").like("%gear%")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            # decimal accumulation: fp sums are order-dependent across
            # engines/partitionings; exact decimal makes the hash stable.
            amount.cast("decimal(18,4)").alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(_money(F.sum("amount")).cast("double").alias("sum_profit"))
    )


@q(
    "q10",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "join", "agg", "topn",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (address/phone/comment columns dropped)."""
    customer, orders, li, nation = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    # join order: (filtered orders ⋈ lineitem-R) first, so the orderkey
    # shuffle carries only order columns — joining customer first would
    # drag its columns through that (much larger) exchange
    ord_f = orders.filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    return (
        ord_f.join(
            li.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue", _money(F.col("c_acctbal")).alias("c_acctbal"), "n_name"
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@q(
    "q11",
    """
    SELECT p_brand, round(sum(p_retailprice), 2) AS value
    FROM part
    GROUP BY p_brand
    HAVING sum(p_retailprice) > (SELECT sum(p_retailprice) * 0.02 FROM part)
    """,
    "agg", "subquery",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock, adapted (no partsupp): brand value share with a
    global-aggregate scalar subquery threshold — q11's HAVING-over-total shape."""
    (part,) = _t(spark, sf_dir, "part")
    total = part.agg((F.sum("p_retailprice") * 0.02).alias("threshold"))
    return (
        part.groupBy("p_brand")
        .agg(F.sum("p_retailprice").alias("raw_value"))
        .join(F.broadcast(total))
        .filter(F.col("raw_value") > F.col("threshold"))
        .select("p_brand", _money(F.col("raw_value")).alias("value"))
    )


@q(
    "q12",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
    "join", "agg",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-mode priority, adapted: l_returnflag stands in for the
    dropped l_shipmode; conditional counts preserved."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@q(
    "q13",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    "join", "outer", "agg",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer distribution: left-outer join + double aggregation."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@q(
    "q14",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    "join", "agg",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect: broadcast part dim, conditional agg ratio."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-09-01")) & (F.col("l_shipdate") < _ts("1997-10-01"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@q(
    "q15",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "agg", "subquery", "join",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier: reusable agg view + scalar-max subquery join."""
    li, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1997-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    # r14 (guide §2.4/§3.3 — remove a whole pass): the scalar-max
    # subquery re-evaluated the `revenue` subtree, i.e. TWO full
    # lineitem scans + two aggregations.  localCheckpoint materializes
    # the per-supplier aggregate ONCE (per-supplier rows — tiny
    # relative to lineitem) and truncates the lineage, so the max stays
    # a scale-safe tree-reduced scalar (no single-partition window) and
    # the join consumes the SAME materialized values — results
    # identical, one lineitem scan.
    revenue = revenue.localCheckpoint()
    best = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(F.broadcast(best), F.col("total_revenue") == F.col("max_rev"))
        .join(supplier, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", _money(F.col("total_revenue")).alias("total_revenue"))
    )


@q(
    "q16",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part, lineitem
    WHERE p_partkey = l_partkey AND p_brand <> 'Brand#5'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
    GROUP BY p_brand, p_type, p_size
    """,
    "join", "agg", "distinct",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-supplier relationship, adapted: lineitem bridges part->supplier
    (partsupp dropped). Exercises count(DISTINCT) expand-style rewrite."""
    part, li = _t(spark, sf_dir, "part", "lineitem")
    return (
        li.join(
            part.filter(
                (F.col("p_brand") != "Brand#5")
                & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@q(
    "q17",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
    "join", "subquery", "agg",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity revenue: correlated scalar subquery de-correlated into
    a per-part average join (exactly Catalyst's own rewrite)."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    # r14 (guide §2.4): the de-correlated per-part-average join scanned
    # lineitem TWICE (once for the avg, once for the probe) and shuffled
    # the FULL lineitem by partkey for the aggregation.  The part join
    # keeps every lineitem row of a surviving part (it joins on partkey
    # only), so a window-avg per partkey over the joined rows equals the
    # whole-table per-part average — one lineitem scan, and the partkey
    # exchange now carries only the ~1/25 of rows whose part survives
    # the brand filter.  l_quantity is integer-valued, so the average is
    # exact in float64 under any summation order.
    return (
        li.join(part.filter(F.col("p_brand") == "Brand#3"), F.col("p_partkey") == F.col("l_partkey"))
        .withColumn(
            "qty_threshold",
            (F.avg("l_quantity").over(Window.partitionBy("l_partkey")) * 0.2),
        )
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@q(
    "q18",
    """
    SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           round(o_totalprice, 2) AS o_totalprice, round(sum(l_quantity), 2) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    "join", "semi", "agg", "topn",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers: IN-subquery as left-semi join + top-100."""
    customer, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tot_qty"))
        .filter(F.col("tot_qty") > 200)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_money(F.sum("l_quantity")).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            _money(F.col("o_totalprice")).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@q(
    "q19",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
            AND l_quantity >= 1 AND l_quantity <= 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
            AND l_quantity >= 10 AND l_quantity <= 20)
        OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
            AND l_quantity >= 20 AND l_quantity <= 30))
    """,
    "join", "filter",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue: OR-of-ANDs residual join condition (container/
    shipmode legs dropped with their columns)."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    leg = lambda brand, smax, qlo, qhi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(leg("Brand#12", 15, 1, 11) | leg("Brand#23", 25, 10, 20) | leg("Brand#34", 35, 20, 30))
        .agg(_money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@q(
    "q20",
    """
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 50)
    """,
    "semi", "agg",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion, adapted: partsupp availability test becomes
    shipped-PROMO-volume test; keeps the IN(agg-HAVING subquery) shape."""
    supplier, li, part = _t(spark, sf_dir, "supplier", "lineitem", "part")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(part.filter(F.col("p_type") == "PROMO"), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("promo_qty"))
        .filter(F.col("promo_qty") > 50)
    )
    return (
        supplier.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", _money(F.col("s_acctbal")).alias("s_acctbal"))
    )


@q(
    "q21",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND s_nationkey = n_nationkey AND n_name = 'NATION_4'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_quantity > l1.l_quantity)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    "join", "semi", "anti", "topn",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting, adapted: with receipt/commit dates
    dropped, 'the lone blocker' becomes 'the strict max-quantity line among
    multi-supplier F orders'. The EXISTS + NOT EXISTS pair is evaluated as
    per-order window aggregates over ONE lineitem scan (r14 verdict #3 —
    the old semi+anti form scanned lineitem 3x and shuffled it twice):

    * EXISTS(other supplier)      <=> min(suppkey) != max(suppkey) per order;
    * NOT EXISTS(other supplier's l3_quantity > l1_quantity)
                                  <=> quantity >= max over OTHER suppliers'
      rows, decomposed per order as: m1 = max(quantity); the max-attaining
      supplier set via min/max(suppkey WHERE quantity == m1); if that set
      has >=2 suppliers (or the probe row's supplier is not in it) the
      other-supplier max is m1 itself, else (probe row's supplier is the
      SOLE top) it is m2 = max(quantity over rows of every other supplier).
      Ties and multi-row survivors fall out exactly as in the subquery
      form; tests/test_q21_equivalence.py pins both forms equal on a
      fixture that forces every branch."""
    supplier, li, orders, nation = _t(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
    w = Window.partitionBy("l1_orderkey")
    l1 = li.select(
        F.col("l_orderkey").alias("l1_orderkey"),
        F.col("l_suppkey").alias("l1_suppkey"),
        F.col("l_quantity").alias("l1_quantity"),
    )
    top = F.when(F.col("l1_quantity") == F.col("m1"), F.col("l1_suppkey"))
    stats = (
        l1.withColumn("m1", F.max("l1_quantity").over(w))
        .withColumn("min_s", F.min("l1_suppkey").over(w))
        .withColumn("max_s", F.max("l1_suppkey").over(w))
        .withColumn("top_min", F.min(top).over(w))
        .withColumn("top_max", F.max(top).over(w))
        .withColumn(
            "m2",
            F.max(
                F.when(
                    F.col("l1_suppkey") != F.col("top_min"),
                    F.col("l1_quantity"),
                )
            ).over(w),
        )
    )
    other_max = F.when(
        (F.col("top_min") != F.col("top_max"))
        | (F.col("l1_suppkey") != F.col("top_min")),
        F.col("m1"),
    ).otherwise(F.col("m2"))
    surv = stats.filter(
        (F.col("min_s") != F.col("max_s"))
        & (F.col("l1_quantity") >= other_max)
    ).select("l1_orderkey", "l1_suppkey")
    return (
        surv.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l1_orderkey"),
        )
        .join(supplier, F.col("s_suppkey") == F.col("l1_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_4")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@q(
    "q22",
    """
    SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT c_nationkey % 10 AS cntrycode, c_acctbal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ) custsale
    GROUP BY cntrycode
    """,
    "anti", "subquery", "agg",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity, adapted: country code derived from
    c_nationkey (c_phone dropped). Scalar-avg subquery + anti join kept."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .select((F.col("c_nationkey") % 10).alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(F.count("*").alias("numcust"), _money(F.sum("c_acctbal")).alias("totacctbal"))
    )
