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


FRAME_AGGS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
}


@given(
    part=st.sampled_from(STR_COLS),
    lo=st.integers(min_value=0, max_value=6),
    hi=st.integers(min_value=0, max_value=6),
    agg=st.sampled_from(sorted(FRAME_AGGS)),
    val=st.sampled_from(["l_linenumber", "l_suppkey"]),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_rows_frame_matches_oracle(
    spark, duck, sf_dir, part, lo, hi, agg, val
):
    """Random ROWS frames (x PRECEDING .. y FOLLOWING) with integer
    aggregates over a TOTAL order — both engines must agree cell-exactly
    on every row.  The fixture's (l_orderkey, l_linenumber) is NOT unique
    (the hypothesis run that found this is why the input is distinct-ed
    and the value column joins the sort key: frames over a non-total
    order are legitimately engine-dependent)."""
    from pyspark.sql import Window as W

    li = (
        _tables(spark, sf_dir)
        .filter(F.col("l_orderkey") < 300)
        .select(part, "l_orderkey", "l_linenumber", val)
        .distinct()
    )
    w = (
        W.partitionBy(part)
        .orderBy("l_orderkey", "l_linenumber", val)
        .rowsBetween(-lo, hi)
    )
    sdf = li.select(
        part,
        "l_orderkey",
        "l_linenumber",
        F.col(val),
        FRAME_AGGS[agg](val).over(w).alias("v"),
    )
    srows = sorted(tuple(r) for r in sdf.collect())
    duck_agg = f"{agg}({val})"
    drows = sorted(
        tuple(r)
        for r in duck.sql(
            f"""
            SELECT {part}, l_orderkey, l_linenumber, {val},
                   {duck_agg} OVER (PARTITION BY {part}
                     ORDER BY l_orderkey, l_linenumber, {val}
                     ROWS BETWEEN {lo} PRECEDING AND {hi} FOLLOWING) AS v
            FROM (SELECT DISTINCT {part}, l_orderkey, l_linenumber, {val}
                  FROM lineitem WHERE l_orderkey < 300)
            """
        ).fetchall()
    )
    assert srows == drows, (part, lo, hi, agg, val)


ROLLUP_KEYS = ["l_returnflag", "l_linestatus", "l_suppkey"]


@given(
    keys=st.lists(
        st.sampled_from(ROLLUP_KEYS), min_size=1, max_size=3, unique=True
    ),
    cube=st.booleans(),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_rollup_cube_matches_oracle(spark, duck, sf_dir, keys, cube):
    """Random rollup/cube key sets (the Expand operator): grouping_id +
    exact integer aggregates must match DuckDB's ROLLUP/CUBE."""
    li = _tables(spark, sf_dir).filter(F.col("l_orderkey") < 500)
    grouped = li.cube(*keys) if cube else li.rollup(*keys)
    sdf = grouped.agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n"),
        F.sum("l_linenumber").alias("s"),
    )

    def nkey(t):  # None-safe total order over mixed tuples
        return tuple((x is None, "" if x is None else x) for x in t)

    srows = sorted(
        (tuple(r) for r in sdf.select(*keys, "gid", "n", "s").collect()),
        key=nkey,
    )
    kw = "CUBE" if cube else "ROLLUP"
    klist = ", ".join(keys)
    drows = sorted(
        (
            tuple(r)
            for r in duck.sql(
                f"""
                SELECT {klist}, grouping({klist}) AS gid,
                       count(*) AS n, sum(l_linenumber) AS s
                FROM lineitem WHERE l_orderkey < 500
                GROUP BY {kw} ({klist})
                """
            ).fetchall()
        ),
        key=nkey,
    )
    assert srows == drows, (keys, cube)


SETOPS = ["union_all", "union_distinct", "intersect", "except"]


@given(
    p1=predicate(),
    p2=predicate(),
    op=st.sampled_from(SETOPS),
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_setop_matches_oracle(spark, duck, sf_dir, p1, p2, op):
    """Random set operations between two predicate-derived projections:
    row multiset (union all) / set (rest) cardinalities must match."""
    li = _tables(spark, sf_dir)
    proj = ["l_returnflag", "l_linestatus", "l_linenumber"]

    def side(pred):
        col, o, val = pred
        c = F.col(col)
        cond = {
            "<": c < val, "<=": c <= val, ">": c > val,
            ">=": c >= val, "=": c == val, "!=": c != val,
        }[o]
        lit = repr(val) if isinstance(val, str) else str(val)
        sql = (
            f"SELECT {', '.join(proj)} FROM lineitem "
            f"WHERE {col} {'<>' if o == '!=' else o} {lit}"
        )
        return li.filter(cond).select(*proj), sql

    d1, s1 = side(p1)
    d2, s2 = side(p2)
    if op == "union_all":
        sdf, glue = d1.unionAll(d2), "UNION ALL"
    elif op == "union_distinct":
        sdf, glue = d1.union(d2).distinct(), "UNION"
    elif op == "intersect":
        sdf, glue = d1.intersect(d2), "INTERSECT"
    else:
        # subtract == SQL EXCEPT (set semantics); exceptAll().distinct()
        # would wrongly KEEP rows present in both sides with higher
        # multiplicity on the left
        sdf, glue = d1.subtract(d2), "EXCEPT"
    n_spark = sdf.count()
    n_duck = duck.sql(
        f"SELECT count(*) FROM (({s1}) {glue} ({s2}))"
    ).fetchone()[0]
    assert n_spark == n_duck, (p1, p2, op, n_spark, n_duck)


@given(
    off=st.integers(min_value=-1000, max_value=1000),
    trunc=st.sampled_from(["year", "quarter", "month", "week"]),
    cut=st.integers(min_value=100, max_value=2000),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_date_arithmetic_matches_oracle(spark, duck, sf_dir, off, trunc, cut):
    """Random calendar arithmetic: date_add offsets, date_trunc grains,
    month boundaries — both engines must agree on every derived date
    (calendar math is exactly the kind of scalar surface where engines
    silently diverge; SURVEY §2.9 datetime family)."""
    from incubator_gluten_spark.catalog import load_tables

    if "ord" not in _cache:
        t = load_tables(spark, sf_dir, ("orders", "customer"))
        _cache["cust"] = t["customer"]
        _cache["ord"] = t["orders"]
    orders = _cache["ord"]
    sdf = (
        orders.filter(F.col("o_orderkey") < cut)
        .select(
            "o_orderkey",
            F.date_add(F.to_date("o_orderdate"), off).alias("d_off"),
            F.to_date(F.date_trunc(trunc, "o_orderdate")).alias("d_trunc"),
            F.last_day("o_orderdate").alias("d_last"),
            F.month(F.add_months("o_orderdate", off % 13)).alias("m_add"),
        )
    )
    srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
    drows = sorted(
        tuple(str(x) for x in r)
        for r in duck.sql(
            f"""
            SELECT o_orderkey,
                   CAST(o_orderdate AS DATE) + {off} AS d_off,
                   CAST(date_trunc('{trunc}', o_orderdate) AS DATE) AS d_trunc,
                   last_day(CAST(o_orderdate AS DATE)) AS d_last,
                   month(CAST(o_orderdate AS DATE)
                         + to_months({off % 13})) AS m_add
            FROM orders WHERE o_orderkey < {cut}
            """
        ).fetchall()
    )
    assert srows == drows, (off, trunc, cut)


@given(
    pos=st.integers(min_value=1, max_value=40),
    ln=st.integers(min_value=0, max_value=30),
    pad=st.integers(min_value=1, max_value=20),
    needle=st.sampled_from(["the", "a ", "ing", "zz", " of "]),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_string_slicing_matches_oracle(spark, duck, sf_dir, pos, ln, pad, needle):
    """Random substring/pad/locate parameters over real fixture text —
    1-based positions, zero lengths, out-of-range slices, pad-to-shorter
    truncation all must agree (SURVEY §2.9 string family)."""
    from incubator_gluten_spark.catalog import load_tables

    if "docs" not in _cache:
        _cache["docs"] = load_tables(spark, sf_dir, ("documents",))["documents"]
    docs = _cache["docs"].filter(F.col("doc_id") < 150)
    sdf = docs.select(
        "doc_id",
        F.substring("text", pos, ln).alias("sub"),
        F.lpad(F.substring("text", 1, 10), pad, "_").alias("pl"),
        F.locate(needle, "text").alias("loc"),
    )
    srows = sorted(tuple(r) for r in sdf.collect())
    nl = needle.replace("'", "''")
    drows = sorted(
        tuple(r)
        for r in duck.sql(
            f"""
            SELECT doc_id,
                   substr(text, {pos}, {ln}) AS sub,
                   lpad(substr(text, 1, 10), {pad}, '_') AS pl,
                   CAST(instr(text, '{nl}') AS INT) AS loc
            FROM documents WHERE doc_id < 150
            """
        ).fetchall()
    )
    assert srows == drows, (pos, ln, pad, needle)


@given(
    sa=st.sampled_from(["left_semi", "left_anti"]),
    preds=st.lists(predicate(), min_size=1, max_size=2),
    ocut=st.integers(min_value=0, max_value=60000),
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_semi_anti_matches_oracle(spark, duck, sf_dir, sa, preds, ocut):
    """Random EXISTS / NOT EXISTS shapes: orders filtered on a key cut,
    semi- or anti-joined against lineitem rows matching 1-2 random
    predicates — the null-handling and dedup semantics of semi/anti
    joins under arbitrary inner filters must agree with DuckDB's
    correlated EXISTS exactly (count + priority breakdown)."""
    from incubator_gluten_spark.catalog import load_tables

    if "ord" not in _cache:
        t = load_tables(spark, sf_dir, ("orders", "customer"))
        _cache["ord"] = t["orders"]
    orders = _cache["ord"]
    li = _tables(spark, sf_dir)

    cond = None
    sql_parts = []
    for col, op, val in preds:
        lit = repr(val) if isinstance(val, str) else str(val)
        sql_parts.append(f"l.{col} {'<>' if op == '!=' else op} {lit}")
        c = F.expr(f"{col} {op} {lit}")
        cond = c if cond is None else (cond & c)

    inner = li.filter(cond).select("l_orderkey")
    joined = (
        orders.filter(F.col("o_orderkey") < ocut)
        .join(inner, F.col("o_orderkey") == F.col("l_orderkey"), sa)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    got = {r["o_orderpriority"]: r["n"] for r in joined.collect()}
    neg = "NOT " if sa == "left_anti" else ""
    want = {
        r[0]: r[1]
        for r in duck.sql(
            f"""
            SELECT o_orderpriority, count(*) FROM orders o
            WHERE o.o_orderkey < {ocut}
              AND {neg}EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND {' AND '.join(sql_parts)}
              )
            GROUP BY o_orderpriority
            """
        ).fetchall()
    }
    assert got == want, (sa, preds, ocut, got, want)


@given(
    jt=st.sampled_from(["inner", "left", "right", "full"]),
    k=st.integers(min_value=2, max_value=9),
    m=st.integers(min_value=2, max_value=9),
    cut=st.integers(min_value=200, max_value=4000),
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_null_key_join_matches_oracle(spark, duck, sf_dir, jt, k, m, cut):
    """Joins with NULL keys on either side (r5 verdict directive #4,
    gluten-ut join-suite semantics): keys are NULLed out on a random
    modulus per side, then inner/left/right/full joined — NULL keys must
    never match, outer sides must preserve their NULL-keyed rows, and
    count(col) vs count(*) must diverge exactly as SQL says."""
    from incubator_gluten_spark.catalog import load_tables

    if "ord" not in _cache:
        t = load_tables(spark, sf_dir, ("orders", "customer"))
        _cache["ord"] = t["orders"]
        _cache["cust"] = t["customer"]
    orders, customer = _cache["ord"], _cache["cust"]

    o = orders.filter(F.col("o_orderkey") < cut).select(
        "o_orderkey",
        F.when(F.col("o_custkey") % k == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("jk_o"),
    )
    c = customer.select(
        F.when(F.col("c_custkey") % m == 0, None)
        .otherwise(F.col("c_custkey"))
        .alias("jk_c"),
        "c_nationkey",
    )
    got = (
        o.join(c, F.col("jk_o") == F.col("jk_c"), jt)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("jk_o").alias("n_o"),
            F.count("jk_c").alias("n_c"),
            F.coalesce(F.sum("o_orderkey"), F.lit(0)).alias("s_ok"),
            F.coalesce(F.sum("c_nationkey"), F.lit(0)).alias("s_nk"),
        )
        .collect()[0]
    )
    sql_jt = {"inner": "JOIN", "left": "LEFT JOIN", "right": "RIGHT JOIN",
              "full": "FULL JOIN"}[jt]
    want = duck.sql(
        f"""
        WITH o AS (
          SELECT o_orderkey,
                 CASE WHEN o_custkey % {k} = 0 THEN NULL ELSE o_custkey END AS jk_o
          FROM orders WHERE o_orderkey < {cut}
        ), c AS (
          SELECT CASE WHEN c_custkey % {m} = 0 THEN NULL ELSE c_custkey END AS jk_c,
                 c_nationkey
          FROM customer
        )
        SELECT CAST(count(*) AS BIGINT), CAST(count(jk_o) AS BIGINT),
               CAST(count(jk_c) AS BIGINT),
               CAST(coalesce(sum(o_orderkey), 0) AS BIGINT),
               CAST(coalesce(sum(c_nationkey), 0) AS BIGINT)
        FROM o {sql_jt} c ON jk_o = jk_c
        """
    ).fetchall()[0]
    assert (got.n, got.n_o, got.n_c, got.s_ok, got.s_nk) == want, (jt, k, m, cut)


@given(
    a=st.integers(min_value=-(10**25), max_value=10**25),
    b=st.integers(min_value=-(10**25), max_value=10**25),
)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_decimal_overflow_checked(spark, duck, sf_dir, a, b):
    """CheckOverflow semantics on DECIMAL multiplication (r5 verdict
    directive #4; reference ExpressionMappings.scala:289-290 and the
    SURVEY "what's hard" (b) decimal-rescale row): the product of two
    DECIMAL(26,0) is DECIMAL(38,0); when the true product fits, Spark
    must return it EXACTLY (oracle: Python bignum); when it does not,
    non-ANSI Spark returns NULL while ANSI raises — both accepted per
    the session's ansi setting, silent wrong values never."""
    res = spark.sql(
        f"SELECT CAST('{a}' AS DECIMAL(26,0)) * CAST('{b}' AS DECIMAL(26,0)) AS p"
    )
    true = a * b
    fits = abs(true) < 10**38
    ansi = spark.conf.get("spark.sql.ansi.enabled") == "true"
    if fits:
        got = res.collect()[0].p
        assert got is not None and int(got) == true, (a, b, got)
    elif ansi:
        import pytest as _pytest

        with _pytest.raises(Exception):
            res.collect()
    else:
        assert res.collect()[0].p is None, (a, b)


@given(
    mo=st.integers(min_value=-36, max_value=36),
    d=st.integers(min_value=-500, max_value=500),
    h=st.integers(min_value=-100, max_value=100),
    cut=st.integers(min_value=100, max_value=1500),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_interval_arithmetic_matches_oracle(spark, duck, sf_dir, mo, d, h, cut):
    """Interval arithmetic (r5 verdict directive #4): month addition with
    end-of-month clamping, day offsets stacked on months, and hour
    intervals over timestamps — every derived value must agree with
    DuckDB row-for-row (SURVEY §2.9 interval family)."""
    from incubator_gluten_spark.catalog import load_tables

    if "ord" not in _cache:
        t = load_tables(spark, sf_dir, ("orders", "customer"))
        _cache["ord"] = t["orders"]
    orders = _cache["ord"]
    sdf = orders.filter(F.col("o_orderkey") < cut).select(
        "o_orderkey",
        F.date_add(F.add_months("o_orderdate", mo), d).alias("d_md"),
        F.add_months(F.last_day("o_orderdate"), mo).alias("d_clamp"),
        (
            F.to_timestamp("o_orderdate")
            + F.expr(f"make_interval(0, 0, 0, 0, {h}, 0, 0)")
        ).alias("ts_h"),
    )
    srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
    drows = sorted(
        tuple(str(x) for x in r)
        for r in duck.sql(
            f"""
            SELECT o_orderkey,
                   CAST(CAST(o_orderdate AS DATE) + to_months({mo})
                        + to_days({d}) AS DATE) AS d_md,
                   CAST(last_day(CAST(o_orderdate AS DATE))
                        + to_months({mo}) AS DATE) AS d_clamp,
                   CAST(o_orderdate AS TIMESTAMP) + to_hours({h}) AS ts_h
            FROM orders WHERE o_orderkey < {cut}
            """
        ).fetchall()
    )
    assert srows == drows, (mo, d, h, cut)


_SPECIALS = [float("nan"), float("inf"), float("-inf"), -0.0, 0.0, None]


@given(
    xs=st.lists(
        st.one_of(
            st.sampled_from(_SPECIALS),
            st.integers(min_value=-100, max_value=100).map(lambda n: n / 4.0),
        ),
        min_size=1,
        max_size=12,
    ),
    desc=st.booleans(),
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_float_specials_match_oracle(spark, duck, sf_dir, xs, desc):
    """IEEE special values through sort / group / min-max (gluten-ut
    GlutenDataFrameAggregateSuite territory): NaN must sort greatest and
    form one group, -0.0 and 0.0 must share a group, NULL ordering must
    follow the explicit NULLS FIRST/LAST — identically in both engines.
    (-0.0 renders differently across engines, so group keys are
    normalized via x + 0.0.)"""
    rows = [(i, v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "i int, x double")

    def lit(v):
        if v is None:
            return "NULL::DOUBLE"
        if v != v:
            return "'nan'::DOUBLE"
        if v == float("inf"):
            return "'inf'::DOUBLE"
        if v == float("-inf"):
            return "'-inf'::DOUBLE"
        return f"{v!r}::DOUBLE"

    vals = ", ".join(f"({i}, {lit(v)})" for i, v in rows)

    order_col = F.col("x").desc_nulls_last() if desc else F.col("x").asc_nulls_first()
    got_order = [r.i for r in df.orderBy(order_col, "i").collect()]
    sql_dir = "DESC NULLS LAST" if desc else "ASC NULLS FIRST"
    want_order = [
        r[0]
        for r in duck.sql(
            f"SELECT i FROM (VALUES {vals}) t(i, x) ORDER BY x {sql_dir}, i"
        ).fetchall()
    ]
    assert got_order == want_order, (xs, desc, got_order, want_order)

    got_groups = sorted(
        (str(r.xn), r.n)
        for r in df.selectExpr("x + 0.0 AS xn")
        .groupBy("xn")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want_groups = sorted(
        (str(a), b)
        for a, b in duck.sql(
            f"SELECT x + 0.0, CAST(count(*) AS BIGINT) "
            f"FROM (VALUES {vals}) t(i, x) GROUP BY 1"
        ).fetchall()
    )
    assert got_groups == want_groups, (xs, got_groups, want_groups)

    got_mm = df.selectExpr("min(x) AS mn", "max(x) AS mx").collect()[0]
    want_mm = duck.sql(
        f"SELECT min(x), max(x) FROM (VALUES {vals}) t(i, x)"
    ).fetchall()[0]
    assert (str(got_mm.mn), str(got_mm.mx)) == tuple(str(v) for v in want_mm), (
        xs, got_mm, want_mm
    )


@given(
    k=st.integers(min_value=2, max_value=7),
    cut=st.integers(min_value=200, max_value=4000),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_rollup_with_null_keys_matches_oracle(spark, duck, sf_dir, k, cut):
    """ROLLUP over a key column that itself contains NULLs: the subtotal
    row's NULL key is only distinguishable from a data-NULL group via
    GROUPING() — both engines must agree on every (key, grouping, count)
    triple (gluten-ut GlutenDataFrameAggregateSuite grouping-sets rows)."""
    li = _tables(spark, sf_dir)
    keyed = li.filter(F.col("l_orderkey") < cut).select(
        F.when(F.col("l_suppkey") % k == 0, None)
        .otherwise(F.col("l_suppkey") % k)
        .alias("g")
    )
    got = sorted(
        (str(r.g), r.gid, r.n)
        for r in keyed.rollup("g")
        .agg(F.grouping("g").cast("int").alias("gid"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = sorted(
        (str(a), b, c)
        for a, b, c in duck.sql(
            f"""
            SELECT g, CAST(GROUPING(g) AS INT), CAST(count(*) AS BIGINT)
            FROM (
              SELECT CASE WHEN l_suppkey % {k} = 0 THEN NULL
                          ELSE l_suppkey % {k} END AS g
              FROM lineitem WHERE l_orderkey < {cut}
            ) GROUP BY ROLLUP(g)
            """
        ).fetchall()
    )
    assert got == want, (k, cut, got[:5], want[:5])


@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        min_size=2,
        max_size=4,
    ),
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_least_greatest_null_matches_oracle(spark, duck, sf_dir, vals):
    """least/greatest skip NULLs (all-NULL => NULL) and ||-concatenation
    propagates NULL — identically in both engines.  Documented engine
    divergence found while building this property: DuckDB's concat()
    SKIPS NULL arguments (concat('x', NULL) = 'x') while Spark's concat
    propagates (= NULL) — so the property pins Spark concat against
    DuckDB's || operator, which shares Spark's propagate semantics."""
    lits = [("NULL" if v is None else str(v)) for v in vals]
    got = spark.sql(
        f"SELECT least({', '.join(lits)}) AS lo, "
        f"greatest({', '.join(lits)}) AS hi, "
        f"concat('v', {lits[0]}) AS cat"
    ).collect()[0]
    want = duck.sql(
        f"SELECT least({', '.join(lits)}), greatest({', '.join(lits)}), "
        f"'v' || {lits[0]}"
    ).fetchall()[0]
    assert (got.lo, got.hi, got.cat) == want, (vals, got, want)


@given(
    part=st.sampled_from(STR_COLS),
    n_tiles=st.integers(min_value=2, max_value=7),
    cut=st.integers(min_value=200, max_value=2500),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_distribution_windows_match_oracle(
    spark, duck, sf_dir, part, n_tiles, cut
):
    """ntile / percent_rank / cume_dist over a UNIQUE total order
    ((l_orderkey, l_linenumber) — the round-5 fuzz finding: non-unique
    orders make window results engine-dependent): every tile id and
    every exact-ratio double must agree row-for-row."""
    from pyspark.sql import Window as W

    li = _tables(spark, sf_dir).filter(F.col("l_orderkey") < cut)
    w = W.partitionBy(part).orderBy("l_orderkey", "l_linenumber")
    sdf = li.select(
        "l_orderkey",
        "l_linenumber",
        F.ntile(n_tiles).over(w).alias("tile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
    drows = sorted(
        tuple(str(x) for x in r)
        for r in duck.sql(
            f"""
            SELECT l_orderkey, l_linenumber,
                   CAST(ntile({n_tiles}) OVER w AS INT) AS tile,
                   percent_rank() OVER w AS pr,
                   cume_dist() OVER w AS cd
            FROM lineitem WHERE l_orderkey < {cut}
            WINDOW w AS (PARTITION BY {part} ORDER BY l_orderkey, l_linenumber)
            """
        ).fetchall()
    )
    assert srows == drows, (part, n_tiles, cut)


@given(
    a=st.integers(min_value=-(2**63), max_value=2**63 - 1),
    b=st.integers(min_value=-(2**63), max_value=2**63 - 1),
    d=st.integers(min_value=-3, max_value=3),
)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_try_arithmetic_checked(spark, duck, sf_dir, a, b, d):
    """try_add / try_subtract / try_multiply on BIGINT and try_divide by
    a possibly-zero divisor: NULL exactly when the true result leaves
    the 64-bit domain (or the divisor is 0), the exact value otherwise —
    oracle is Python bignum arithmetic (the reference maps these through
    the same checked-arithmetic paths as CheckOverflow)."""
    lo, hi = -(2**63), 2**63 - 1
    got = spark.sql(
        f"SELECT try_add({a}L, {b}L) AS s, try_subtract({a}L, {b}L) AS m, "
        f"try_multiply({a}L, {b}L) AS p, try_divide({a}L, {d}L) AS q"
    ).collect()[0]

    def want(v):
        return v if lo <= v <= hi else None

    assert got.s == want(a + b), ("add", a, b, got.s)
    assert got.m == want(a - b), ("sub", a, b, got.m)
    assert got.p == want(a * b), ("mul", a, b, got.p)
    if d == 0:
        assert got.q is None, ("div0", a, got.q)
    else:
        # Documented divergence class (found BY this property, r6):
        # Spark's try_divide(bigint, bigint) casts BOTH operands to
        # double FIRST and then divides; Python's a / d divides the
        # exact rationals and rounds once at the end.  For |a| > 2^53
        # the two round differently by 1 ulp (e.g. a=17958117978721733,
        # d=3 -> Spark 5986039326240577.0, Python ...78.0).  The oracle
        # must mirror the cast-then-divide order; within the
        # float-exact domain the comparison stays exact.
        assert got.q == float(a) / float(d), ("div", a, d, got.q)
        if abs(a) <= 2**53:
            assert got.q == a / d, ("div-exact", a, d, got.q)


@given(
    xs=st.lists(st.integers(min_value=-9, max_value=9), min_size=1, max_size=6),
    idx=st.integers(min_value=-6, max_value=6).filter(lambda i: i != 0),
    start=st.integers(min_value=-5, max_value=5).filter(lambda i: i != 0),
    ln=st.integers(min_value=0, max_value=5),
    needle=st.integers(min_value=-9, max_value=9),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_array_indexing_matches_oracle(
    spark, duck, sf_dir, xs, idx, start, ln, needle
):
    """1-based and negative array indexing, out-of-range extraction,
    negative-start slices, and 1-based position lookup must agree with
    DuckDB's list semantics exactly (SURVEY §2.9 array family — the
    index-origin class of bug the reference pins in its UT suites)."""
    arr = f"array({', '.join(map(str, xs))})"
    got = spark.sql(
        f"SELECT try_element_at({arr}, {idx}) AS el, "
        f"slice({arr}, {start}, {ln}) AS sl, "
        f"array_position({arr}, {needle}) AS pos"
    ).collect()[0]
    larr = f"[{', '.join(map(str, xs))}]"
    # duckdb slice: l[a:b] with negative-from-end start; emulate Spark's
    # (start, length) form with list_slice over resolved bounds
    s0 = start if start > 0 else len(xs) + start + 1
    want_sl = xs[s0 - 1 : s0 - 1 + ln] if s0 >= 1 else []
    want = duck.sql(
        f"SELECT {larr}[{idx}], CAST(list_position({larr}, {needle}) AS BIGINT)"
    ).fetchall()[0]
    assert got.el == want[0], ("element_at", xs, idx, got.el, want[0])
    assert list(got.sl) == want_sl, ("slice", xs, start, ln, got.sl, want_sl)
    assert (got.pos or 0) == (want[1] or 0), ("pos", xs, needle, got.pos, want)


@given(
    n=st.integers(min_value=-99999, max_value=99999),
    s=st.integers(min_value=0, max_value=2),
)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_rounding_modes_checked(spark, duck, sf_dir, n, s):
    """Rounding-mode semantics on exact decimals: round() is HALF_UP in
    BOTH engines (probed: round(2.5)=3, round(-2.5)=-3, round(2.675,2)
    =2.68 on DECIMAL in both), and Spark's bround() is HALF_EVEN —
    pinned against Python Decimal ROUND_HALF_EVEN since DuckDB has no
    banker's-rounding scalar."""
    from decimal import ROUND_HALF_EVEN, Decimal

    lit = f"{n / 1000:.3f}"
    got = spark.sql(
        f"SELECT round(CAST('{lit}' AS DECIMAL(10,3)), {s}) AS r, "
        f"bround(CAST('{lit}' AS DECIMAL(10,3)), {s}) AS br"
    ).collect()[0]
    want_r = duck.sql(
        f"SELECT round('{lit}'::DECIMAL(10,3), {s})"
    ).fetchall()[0][0]
    assert got.r == want_r, ("round", lit, s, got.r, want_r)
    q = Decimal(1).scaleb(-s)
    want_br = Decimal(lit).quantize(q, rounding=ROUND_HALF_EVEN)
    assert got.br == want_br, ("bround", lit, s, got.br, want_br)


@given(
    c1=st.sampled_from(NUM_COLS),
    c2=st.sampled_from(STR_COLS),
    k=st.integers(min_value=2, max_value=8),
    cut=st.integers(min_value=200, max_value=4000),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_multicol_distinct_matches_oracle(spark, duck, sf_dir, c1, c2, k, cut):
    """Multi-column COUNT(DISTINCT a, b) with NULLs injected into one key
    (rows where ANY distinct column is NULL are excluded from the pair
    count — the SQL rule both engines must share), next to sum(DISTINCT)
    and a plain count for cross-checking."""
    li = _tables(spark, sf_dir).filter(F.col("l_orderkey") < cut)
    keyed = li.select(
        F.when(F.col(c1) % k == 0, None).otherwise(F.col(c1) % k).alias("a"),
        F.col(c2).alias("b"),
        F.col("l_linenumber").alias("v"),
    )
    got = keyed.agg(
        F.count_distinct("a", "b").alias("nd"),
        F.sum_distinct("v").alias("sd"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    want = duck.sql(
        f"""
        SELECT CAST(count(DISTINCT CASE WHEN {c1} % {k} = 0 THEN NULL
                          ELSE {c1} % {k} || '|' || {c2} END) AS BIGINT),
               CAST(sum(DISTINCT l_linenumber) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM lineitem WHERE l_orderkey < {cut}
        """
    ).fetchall()[0]
    assert got.nd == want[0], (c1, c2, k, cut, got.nd, want)
    assert got.sd == want[1] and got.n == want[2], (got, want)


# ---------------------------------------------------------------------------
# Reference-documented divergence classes (docs/velox-backend-limitations.md
# names "Regexp functions" — RE2 vs java.util.regex — and timezone handling
# as the places the reference's native engine diverges from vanilla Spark).
# This build runs Spark's own JVM semantics, so the differential oracles are
# DuckDB's RE2 (the same engine class Velox uses) and Python zoneinfo (IANA
# ground truth): agreement pins the portable subset, and the generators stay
# inside it BY CONSTRUCTION (documented below) the way the frame-tie and
# try_divide findings documented theirs.


@st.composite
def regex_pattern(draw):
    """Patterns from the Java/RE2-portable subset: literals, ASCII char
    classes, \\d, non-capturing alternation of fixed words — quantified
    by '', '+', or '{1,2}' only.  Deliberately EXCLUDED (the documented
    divergence surface): backreferences and lookaround (absent from RE2
    entirely), possessive/reluctant quantifiers, \\p classes, and any
    atom that can match EMPTY ('*', '?') — empty-match replacement
    positions are where global-replace semantics drift between engines."""
    atoms = []
    for i in range(draw(st.integers(min_value=1, max_value=3))):
        kind = draw(st.sampled_from(["lit", "cls", "dig", "alt"]))
        if kind == "lit":
            a = draw(st.sampled_from(list("aeiorstn")))
        elif kind == "cls":
            lo = draw(st.sampled_from("abcdef"))
            a = f"[{lo}-{chr(ord(lo) + draw(st.integers(min_value=3, max_value=12)))}]"
        elif kind == "dig":
            a = r"\d"
        else:
            w1 = draw(st.sampled_from(["the", "and", "ing", "er"]))
            w2 = draw(st.sampled_from(["on", "es", "ed"]))
            a = f"(?:{w1}|{w2})"
        q = draw(st.sampled_from(["", "", "+", "{1,2}"]))
        atoms.append(a + q)
    return draw(st.sampled_from(["", "", "^"])) + "".join(atoms)


@given(pat=regex_pattern())
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_regex_matches_re2_oracle(spark, duck, sf_dir, pat):
    """rlike / regexp_extract / regexp_replace vs DuckDB's RE2 on the
    documents corpus: same match decision, same first-match group-1
    extract, same global-replace result length, row for row."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 300
    )
    gpat = f"({pat})"
    srows = sorted(
        (r.doc_id, r.m, r.ex, r.rl)
        for r in docs.select(
            "doc_id",
            F.col("text").rlike(pat).alias("m"),
            F.regexp_extract("text", gpat, 1).alias("ex"),
            F.length(F.regexp_replace("text", pat, "X")).alias("rl"),
        ).collect()
    )
    drows = sorted(
        (d, m, e, rl)
        for d, m, e, rl in duck.execute(
            """
            SELECT doc_id, regexp_matches(text, ?) AS m,
                   regexp_extract(text, ?, 1) AS ex,
                   CAST(length(regexp_replace(text, ?, 'X', 'g')) AS INT)
                     AS rl
            FROM documents WHERE doc_id < 300
            """,
            [pat, gpat, pat],
        ).fetchall()
    )
    assert srows == drows, (pat, srows[:3], drows[:3])


_TZ_ZONES = [
    "America/New_York",
    "Europe/Berlin",
    "Australia/Sydney",
    "Asia/Kolkata",       # half-hour offset, no DST
    "America/Sao_Paulo",  # abolished DST in 2019 — historical rules
]
# UTC instants of real DST transitions (spring-forward AND fall-back in
# three hemispheres); the generator samples a +/-2h window around each,
# so every example set straddles gap and overlap wall times.
_TZ_EDGES = [
    1710054000,  # 2024-03-10 07:00Z  US spring forward
    1730613600,  # 2024-11-03 06:00Z  US fall back
    1711846800,  # 2024-03-31 01:00Z  EU spring forward
    1729990800,  # 2024-10-27 01:00Z  EU fall back
    1712419200,  # 2024-04-06 16:00Z  Sydney fall back
    1728144000,  # 2024-10-05 16:00Z  Sydney spring forward
]


@given(
    zone=st.sampled_from(_TZ_ZONES),
    edge=st.sampled_from(_TZ_EDGES),
    deltas=st.lists(
        st.integers(min_value=-7200, max_value=7200), min_size=4, max_size=8
    ),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_timezone_dst_roundtrips(spark, duck, sf_dir, zone, edge, deltas):
    """from_utc_timestamp wall times, date_trunc('hour'), and the
    to_utc_timestamp round-trip across real DST transitions, oracled by
    Python zoneinfo (IANA tzdata ground truth — sidesteps any DuckDB
    timezone-extension differences):

    * the wall time Spark computes must equal zoneinfo's, always;
    * truncation happens on the WALL clock, not the instant;
    * the round-trip must restore the original instant EXCEPT for wall
      times inside a fall-back overlap, which have two legitimate UTC
      preimages (fold 0/1) — Spark must pick one of them.  That carve-out
      IS the documented divergence: engines legitimately differ on which
      preimage (java.time picks the earlier offset), so the property pins
      membership, not the choice."""
    from datetime import datetime, timezone
    from zoneinfo import ZoneInfo

    tz = ZoneInfo(zone)
    epochs = sorted({edge + d for d in deltas})
    sdf = spark.createDataFrame([(e,) for e in epochs], "epoch bigint").select(
        "epoch",
        F.from_utc_timestamp(F.timestamp_seconds(F.col("epoch")), zone).alias(
            "wall"
        ),
        F.date_trunc(
            "hour",
            F.from_utc_timestamp(F.timestamp_seconds(F.col("epoch")), zone),
        ).alias("wall_hr"),
        F.to_utc_timestamp(
            F.from_utc_timestamp(F.timestamp_seconds(F.col("epoch")), zone),
            zone,
        ).alias("rt"),
    )
    for r in sdf.collect():
        want_wall = datetime.fromtimestamp(r.epoch, tz).replace(tzinfo=None)
        assert r.wall == want_wall, (zone, r.epoch, r.wall, want_wall)
        assert r.wall_hr == want_wall.replace(
            minute=0, second=0, microsecond=0
        ), (zone, r.epoch)
        # legitimate UTC preimages of this wall time (fold 0 and 1)
        preimages = {
            want_wall.replace(tzinfo=tz, fold=f).timestamp() for f in (0, 1)
        }
        rt_epoch = r.rt.replace(tzinfo=timezone.utc).timestamp()
        assert rt_epoch in preimages, (
            zone,
            r.epoch,
            rt_epoch,
            preimages,
        )


@given(
    base_day=st.integers(min_value=0, max_value=1460),  # 4y window, leap incl
    months=st.integers(min_value=-30, max_value=30),
    days=st.integers(min_value=-400, max_value=400),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_month_end_clamping_matches_oracle(
    spark, duck, sf_dir, base_day, months, days
):
    """add_months (month-END CLAMPING: Jan 31 + 1 month = Feb 29/28),
    last_day, date_add, datediff — cross-checked against DuckDB's
    interval arithmetic over a 4-year window that includes a leap year.
    Clamping at month ends is the classic cross-engine divergence spot;
    both engines clamp, and this pins that they clamp IDENTICALLY."""
    row = spark.sql(
        f"""
        SELECT d,
               add_months(d, {months}) AS am,
               last_day(d) AS ld,
               date_add(d, {days}) AS da,
               datediff(date_add(d, {days}), d) AS dd
        FROM (SELECT date_add(DATE'2023-01-01', {base_day}) AS d)
        """
    ).collect()[0]
    want = duck.sql(
        f"""
        SELECT d,
               CAST(d + ({months}) * INTERVAL 1 MONTH AS DATE) AS am,
               last_day(d) AS ld,
               CAST(d + ({days}) * INTERVAL 1 DAY AS DATE) AS da,
               date_diff('day', d,
                         CAST(d + ({days}) * INTERVAL 1 DAY AS DATE)) AS dd
        FROM (SELECT CAST(DATE'2023-01-01' + ({base_day}) * INTERVAL 1 DAY
                          AS DATE) AS d)
        """
    ).fetchall()[0]
    assert (row.d, row.am, row.ld, row.da, row.dd) == tuple(want), (
        base_day,
        months,
        days,
    )


@st.composite
def string_op(draw):
    fn = draw(st.sampled_from(["substr", "lpad", "rpad", "repeat", "reverse",
                               "translate", "concat_ws"]))
    if fn == "substr":
        return fn, (draw(st.integers(min_value=1, max_value=30)),
                    draw(st.integers(min_value=0, max_value=20)))
    if fn in ("lpad", "rpad"):
        return fn, (draw(st.integers(min_value=0, max_value=40)),
                    draw(st.sampled_from(["x", "ab", "_."])))
    if fn == "repeat":
        return fn, (draw(st.integers(min_value=0, max_value=4)),)
    if fn == "translate":
        return fn, (draw(st.sampled_from(["aeiou", "abc"])),
                    draw(st.sampled_from(["AEIOU", "xy"])))
    if fn == "concat_ws":
        return fn, (draw(st.sampled_from(["-", "::", ""])),)
    return fn, ()


@given(op=string_op())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_string_functions_match_oracle(spark, duck, sf_dir, op):
    """The portable string-function subset over the documents corpus:
    substr (positive start), lpad/rpad (incl. truncation when the target
    length is shorter), repeat, reverse, translate (incl. shortening
    maps, which DROP unmapped-to characters in both engines), and
    concat_ws.  Row-for-row equality; negative substr starts are
    deliberately out of scope (Spark counts from the end, DuckDB's
    negative indexing differs — a documented non-portable zone)."""
    fn, args = op
    if fn == "substr":
        start, ln = args
        sexpr, dexpr = (
            f"substring(text, {start}, {ln})",
            f"substr(text, {start}, {ln})",
        )
    elif fn in ("lpad", "rpad"):
        n, pad = args
        sexpr = dexpr = f"{fn}(text, {n}, '{pad}')"
    elif fn == "repeat":
        (n,) = args
        sexpr = dexpr = f"repeat(substring(text, 1, 8), {n})"
    elif fn == "translate":
        frm, to = args
        sexpr = dexpr = f"translate(text, '{frm}', '{to}')"
    elif fn == "reverse":
        sexpr = dexpr = "reverse(text)"
    else:
        (sep,) = args
        sexpr = dexpr = f"concat_ws('{sep}', lang, text)"
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 250
    )
    srows = sorted(
        (r.doc_id, r.v)
        for r in docs.selectExpr("doc_id", f"{sexpr} AS v").collect()
    )
    drows = sorted(
        tuple(r)
        for r in duck.sql(
            f"SELECT doc_id, {dexpr} AS v FROM documents WHERE doc_id < 250"
        ).fetchall()
    )
    assert srows == drows, (fn, args, srows[:2], drows[:2])


@given(
    s1=st.integers(min_value=0, max_value=6),
    s2=st.integers(min_value=0, max_value=6),
    a=st.integers(min_value=-(10**9), max_value=10**9),
    b=st.integers(min_value=-(10**9), max_value=10**9),
)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_decimal_scale_promotion_checked(spark, duck, sf_dir, s1, s2, a, b):
    """Decimal +, *, / result-scale promotion — the divergence class the
    reference documents for decimal rescale (SURVEY "what's hard" (b)).
    Operands are DECIMAL(10,s): by Spark's documented rules the sum and
    product types are exact (no rounding), so they must equal Python
    bignum arithmetic EXACTLY; division promotes to scale s1+11
    (max(6, s1+p2+1) with p2=10), total precision 21+s2 < 38, so no
    precision-loss adjustment applies and the value must equal the exact
    rational quotient rounded HALF_UP at scale s1+11 — pinned against
    Python's decimal module, digit for digit.  DuckDB cross-checks the
    exact cases (its division scale differs by design, so the quotient
    is pinned to Spark's documented semantics, not DuckDB's)."""
    from decimal import ROUND_HALF_UP, Decimal, localcontext

    da = Decimal(a).scaleb(-s1)
    db = Decimal(b).scaleb(-s2)
    lit_a = f"CAST('{da}' AS DECIMAL(10,{s1}))"
    lit_b = f"CAST('{db}' AS DECIMAL(10,{s2}))"
    row = spark.sql(
        f"""SELECT {lit_a} + {lit_b} AS s, {lit_a} * {lit_b} AS p,
                   {f'{lit_a} / {lit_b}' if b else 'NULL'} AS q"""
    ).collect()[0]
    assert Decimal(str(row.s)) == da + db, (a, b, s1, s2, row.s)
    assert Decimal(str(row.p)) == da * db, (a, b, s1, s2, row.p)
    if b:
        with localcontext() as ctx:
            ctx.prec = 60
            want_q = (da / db).quantize(
                Decimal(1).scaleb(-(s1 + 11)), rounding=ROUND_HALF_UP
            )
        assert Decimal(str(row.q)) == want_q, (a, b, s1, s2, row.q, want_q)
    # DuckDB agrees on the exact (sum/product) cases.  Operand width 19:
    # DuckDB's product type is DECIMAL(p1+p2) and at the strategy's bound
    # (|unscaled| = 1e9 → 1e18 product, 19 digits) a 12-wide operand
    # overflowed DECIMAL(18) (the r7 red test); 19+19 = 38 = DuckDB's max
    # width, and 19 digits + s1+s2 ≤ 12 scale digits = 31 ≤ 38 is exact.
    ds, dp_ = duck.sql(
        f"""SELECT CAST('{da}' AS DECIMAL(19,{s1})) +
                   CAST('{db}' AS DECIMAL(19,{s2})),
                   CAST('{da}' AS DECIMAL(19,{s1})) *
                   CAST('{db}' AS DECIMAL(19,{s2}))"""
    ).fetchall()[0]
    assert Decimal(str(ds)) == da + db and Decimal(str(dp_)) == da * db
