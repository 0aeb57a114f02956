"""Property-based differential fuzzing (goes beyond the reference's test
strategy, which is fixed-corpus only — SURVEY §5): hypothesis generates
random filter + aggregate shapes over lineitem and both engines must agree
on the result.

Deliberately restricted to the cross-engine-deterministic subset:
integer/flag columns, exact counts and integer sums — no float ordering
or rounding semantics in play, so any mismatch is a real engine bug, not
tolerance noise.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from incubator_gluten_spark.catalog import load_tables
from pyspark.sql import functions as F

NUM_COLS = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]
STR_COLS = ["l_returnflag", "l_linestatus"]
OPS = ["<", "<=", ">", ">=", "=", "!="]


@st.composite
def predicate(draw):
    if draw(st.booleans()):
        col = draw(st.sampled_from(NUM_COLS))
        op = draw(st.sampled_from(OPS))
        val = draw(st.integers(min_value=0, max_value=2000))
        return col, op, val
    col = draw(st.sampled_from(STR_COLS))
    op = draw(st.sampled_from(["=", "!="]))
    val = draw(st.sampled_from(["A", "N", "R", "O", "F"]))
    return col, op, val


_cache = {}


def _tables(spark, sf_dir):
    if "li" not in _cache:
        _cache["li"] = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return _cache["li"]


@given(preds=st.lists(predicate(), min_size=1, max_size=3), conj=st.booleans())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_filter_agg_matches_oracle(spark, duck, sf_dir, preds, conj):
    li = _tables(spark, sf_dir)

    scond = None
    sql_parts = []
    for col, op, val in preds:
        lit = repr(val) if isinstance(val, str) else str(val)
        sql_parts.append(f"l.{col} {'<>' if op == '!=' else op} {lit}")
        c = F.col(col)
        cond = {
            "<": c < val, "<=": c <= val, ">": c > val,
            ">=": c >= val, "=": c == val, "!=": c != val,
        }[op]
        scond = cond if scond is None else (scond & cond if conj else scond | cond)

    glue = " AND " if conj else " OR "
    sql = (
        "SELECT count(*) AS n, coalesce(sum(l_linenumber), 0) AS s "
        f"FROM lineitem l WHERE {glue.join(sql_parts)}"
    )
    got = (
        li.filter(scond)
        .agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("l_linenumber"), F.lit(0)).alias("s"),
        )
        .collect()[0]
    )
    want = duck.sql(sql).fetchall()[0]
    assert (got.n, got.s) == want, f"{sql} -> spark {(got.n, got.s)} duck {want}"


RANK_FNS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
}


@given(
    part=st.sampled_from(STR_COLS),
    order=st.sampled_from(NUM_COLS),
    fn=st.sampled_from(sorted(RANK_FNS)),
    desc=st.booleans(),
    limit=st.integers(min_value=1, max_value=5),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_window_rank_matches_oracle(
    spark, duck, sf_dir, part, order, fn, desc, limit
):
    """Random ranking-window shapes: partition col, order col (made total
    with the unique (l_orderkey, l_linenumber) tie-break), rank fn,
    direction, and a group-limit — both engines must agree exactly."""
    from pyspark.sql import Window as W

    li = _tables(spark, sf_dir).filter(F.col("l_orderkey") < 400)
    direction = "DESC" if desc else "ASC"
    w = W.partitionBy(part).orderBy(
        F.col(order).desc() if desc else F.col(order).asc(),
        "l_orderkey",
        "l_linenumber",
    )
    sdf = (
        li.select(
            part,
            "l_orderkey",
            "l_linenumber",
            RANK_FNS[fn]().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= limit)
    )
    srows = sorted(tuple(r) for r in sdf.collect())
    drows = sorted(
        tuple(r)
        for r in duck.sql(
            f"""
            SELECT * FROM (
              SELECT {part}, l_orderkey, l_linenumber,
                     {fn}() OVER (PARTITION BY {part}
                       ORDER BY {order} {direction}, l_orderkey, l_linenumber) AS rnk
              FROM lineitem WHERE l_orderkey < 400
            ) WHERE rnk <= {limit}
            """
        ).fetchall()
    )
    assert srows == drows


JOIN_TYPES = {
    "inner": "JOIN",
    "left": "LEFT JOIN",
    "left_semi": "SEMI JOIN",
    "left_anti": "ANTI JOIN",
}


@given(
    jt=st.sampled_from(sorted(JOIN_TYPES)),
    cut=st.integers(min_value=0, max_value=2000),
    seg=st.sampled_from(["AUTOMOBILE", "BUILDING", "MACHINERY", "HOUSEHOLD"]),
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_join_matches_oracle(spark, duck, sf_dir, jt, cut, seg):
    """Random join shapes (type x filter placement) between orders and a
    filtered customer dim — counts must match DuckDB exactly."""
    from incubator_gluten_spark.catalog import load_tables

    if "cust" not in _cache:
        t = load_tables(spark, sf_dir, ("orders", "customer"))
        _cache["cust"] = t["customer"]
        _cache["ord"] = t["orders"]
    customer, orders = _cache["cust"], _cache["ord"]

    dim = customer.filter(
        (F.col("c_mktsegment") == seg) & (F.col("c_custkey") < cut)
    ).select("c_custkey")
    joined = orders.join(dim, F.col("o_custkey") == F.col("c_custkey"), jt)
    n_spark = joined.count()
    n_duck = duck.sql(
        f"""
        SELECT count(*) FROM orders o {JOIN_TYPES[jt]} (
          SELECT c_custkey FROM customer
          WHERE c_mktsegment = '{seg}' AND c_custkey < {cut}
        ) c ON o.o_custkey = c.c_custkey
        """
    ).fetchone()[0]
    assert n_spark == n_duck, (jt, cut, seg, n_spark, n_duck)
