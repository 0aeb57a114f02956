"""Scalar-function family queries — SURVEY §2.9's 290-expression surface.

One differential query per family, exercising the family's functions over
real fixture columns (reference mapping: gluten-substrait/.../expression/
ExpressionMappings.scala:52-352; support matrix
docs/velox-backend-scalar-function-support.md).

DuckDB-divergent functions are handled two ways:
* emulated in the oracle SQL (expm1, log1p, pmod, hypot, dayofweek offset,
  substring_index, initcap-on-single-token, bool list quantifiers), or
* pinned as golden literals for engine-specific functions computed on
  constants (soundex, conv, elt, overlay, sha1, crc32, murmur3 hash,
  xxhash64, parse_url, bround, width_bucket) — SF-independent, verified
  against a one-row VALUES oracle. Same spirit as the reference's
  VeloxLiteralSuite / function micro-suites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


# ---------------------------------------------------------------- string

@q(
    "fn_string_basic",
    """
    SELECT n_name,
           length(n_name)                      AS len,
           lower(n_name)                       AS lo,
           upper(lower(n_name))                AS up,
           substring(n_name, 1, 6)             AS sub,
           concat_ws('-', n_name, 'X')         AS cw,
           lpad(n_name, 12, '*')               AS lp,
           rpad(n_name, 12, '*')               AS rp,
           replace(n_name, 'NATION', 'N')      AS rep,
           reverse(n_name)                     AS rev,
           left(n_name, 3)                     AS l3,
           right(n_name, 2)                    AS r2,
           repeat(right(n_name, 1), 3)         AS rpt,
           ascii(n_name)                       AS asc_first,
           chr(65 + n_nationkey % 26)          AS ch,
           instr(n_name, '_')                  AS pos,
           translate(n_name, 'NAT', 'nat')     AS tr,
           levenshtein(n_name, 'NATION_1')     AS lev,
           upper(substring(n_name,1,1)) || lower(substring(n_name,2)) AS icap,
           trim('  ' || n_name || '  ')        AS trm,
           contains(n_name, '1')               AS has1
    FROM nation
    """,
    "function", "string",
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    (nation,) = _t(spark, sf_dir, "nation")
    n = F.col("n_name")
    return nation.select(
        "n_name",
        F.length(n).alias("len"),
        F.lower(n).alias("lo"),
        F.upper(F.lower(n)).alias("up"),
        F.substring(n, 1, 6).alias("sub"),
        F.concat_ws("-", n, F.lit("X")).alias("cw"),
        F.lpad(n, 12, "*").alias("lp"),
        F.rpad(n, 12, "*").alias("rp"),
        F.replace(n, F.lit("NATION"), F.lit("N")).alias("rep"),
        F.reverse(n).alias("rev"),
        F.left(n, F.lit(3)).alias("l3"),
        F.right(n, F.lit(2)).alias("r2"),
        F.repeat(F.right(n, F.lit(1)), 3).alias("rpt"),
        F.ascii(n).alias("asc_first"),
        F.chr(F.lit(65) + F.col("n_nationkey") % 26).alias("ch"),
        F.instr(n, "_").alias("pos"),
        F.translate(n, "NAT", "nat").alias("tr"),
        F.levenshtein(n, F.lit("NATION_1")).alias("lev"),
        F.initcap(F.lower(n)).alias("icap"),
        F.trim(F.concat(F.lit("  "), n, F.lit("  "))).alias("trm"),
        F.contains(n, F.lit("1")).alias("has1"),
    )


@q(
    "fn_string_regex",
    """
    SELECT lang,
           count(*) AS n_match,
           CAST(sum(CAST(regexp_extract(text, '([a-z]+)', 1) = 'key' AS INT)) AS BIGINT)
             AS n_key_first,
           max(length(regexp_replace(text, '[aeiou]', '', 'g'))) AS max_novowel_len,
           max(len(string_split(text, ' '))) AS max_words,
           max(array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ')) AS first3
    FROM documents
    WHERE regexp_matches(text, 'spark')
    GROUP BY lang
    """,
    "function", "string", "regex",
)
def fn_string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """like/rlike/regexp_* — patterns restricted to the RE2∩Java-regex
    subset, the same portability caveat the reference documents
    (docs/velox-backend-limitations.md 'Regexp functions')."""
    (docs,) = _t(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").rlike("spark"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_match"),
            F.sum(
                (F.regexp_extract("text", r"([a-z]+)", 1) == "key").cast("int")
            ).alias("n_key_first"),
            F.max(
                F.length(F.regexp_replace("text", "[aeiou]", ""))
            ).alias("max_novowel_len"),
            F.max(F.size(F.split("text", " "))).alias("max_words"),
            F.max(F.expr("substring_index(text, ' ', 3)")).alias("first3"),
        )
    )


@q(
    "fn_string_golden",
    """
    SELECT * FROM (VALUES
      ('R163', '4', 'b', 2, 'hXXlo', 'Hello Spark World', 'a.b',
       'spark.apache.org', '/docs/api.html', 'join', 3)
    ) AS t(soundex_v, conv_v, elt_v, fis_v, overlay_v, initcap_v, subidx_v,
           url_host, url_path, url_q, width_bucket_v)
    """,
    "function", "string", "golden",
)
def fn_string_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-specific string/URL fns on constants vs pinned golden values
    (Spark-computed). Covers soundex, conv, elt, find_in_set, overlay,
    initcap, substring_index, parse_url (HOST/PATH/QUERY), width_bucket —
    reference sigs ExpressionMappings.scala:66-112."""
    return spark.range(1).select(
        F.soundex(F.lit("Robert")).alias("soundex_v"),
        F.conv(F.lit("100"), 2, 10).alias("conv_v"),
        F.elt(F.lit(2), F.lit("a"), F.lit("b"), F.lit("c")).alias("elt_v"),
        F.find_in_set(F.lit("b"), F.lit("a,b,c")).alias("fis_v"),
        F.overlay(F.lit("hello"), F.lit("XX"), F.lit(2)).alias("overlay_v"),
        F.initcap(F.lit("hello spark world")).alias("initcap_v"),
        F.expr("substring_index('a.b.c.d', '.', 2)").alias("subidx_v"),
        F.expr(
            "parse_url('https://spark.apache.org/docs/api.html?q=join&lang=en', 'HOST')"
        ).alias("url_host"),
        F.expr(
            "parse_url('https://spark.apache.org/docs/api.html?q=join&lang=en', 'PATH')"
        ).alias("url_path"),
        F.expr(
            "parse_url('https://spark.apache.org/docs/api.html?q=join&lang=en', 'QUERY', 'q')"
        ).alias("url_q"),
        F.expr("width_bucket(5.3, 0.2, 10.6, 5)").alias("width_bucket_v"),
    )


# ---------------------------------------------------------------- math

@q(
    "fn_math",
    """
    SELECT p_partkey,
           abs(p_retailprice - 1000)                   AS a,
           CAST(ceil(p_retailprice) AS BIGINT)         AS ce,
           CAST(floor(p_retailprice) AS BIGINT)        AS fl,
           round(sqrt(p_retailprice), 6)               AS sq,
           round(cbrt(p_retailprice), 6)               AS cb,
           round(exp(p_size / 25.0), 6)                AS ex,
           round(exp(p_size / 25.0) - 1, 6)            AS exm1,
           round(ln(p_retailprice), 6)                 AS lg,
           round(log10(p_retailprice), 6)              AS l10,
           round(log2(p_retailprice), 6)               AS l2,
           round(ln(1 + p_retailprice), 6)             AS l1p,
           round(pow(p_size, 2.5), 4)                  AS pw,
           round(sin(p_size), 6)                       AS sn,
           round(cos(p_size), 6)                       AS cs,
           round(atan2(p_size, 7.0), 6)                AS at2,
           round(degrees(p_size / 10.0), 6)            AS dg,
           round(radians(CAST(p_size AS DOUBLE)), 6)   AS rd,
           sign(p_size - 25)                           AS sg,
           greatest(p_size, 10, 25)                    AS gr,
           least(p_size, 10, 25)                       AS ls,
           ((p_size % 7) + 7) % 7                      AS pm,
           round(sqrt(p_size*p_size + 9.0), 6)         AS hyp,
           CAST(factorial(p_size % 10) AS BIGINT)      AS fac,
           p_size & 12                                 AS band,
           p_size | 12                                 AS bor,
           xor(p_size, 12)                             AS bxor,
           ~p_size                                     AS bnot,
           p_size << 2                                 AS shl,
           p_size >> 1                                 AS shr,
           hex(p_size)                                 AS hx
    FROM part WHERE p_partkey < 200
    """,
    "function", "math",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (~50 fns, ExpressionMappings.scala:115-166). expm1/log1p/
    pmod/hypot emulated in the oracle; bround/rint are golden-tested in
    fn_math_golden (DuckDB rounds half-away, Spark bround half-even)."""
    (part,) = _t(spark, sf_dir, "part")
    s, rp = F.col("p_size"), F.col("p_retailprice")
    return part.filter(F.col("p_partkey") < 200).select(
        "p_partkey",
        F.abs(rp - 1000).alias("a"),
        F.ceil(rp).alias("ce"),
        F.floor(rp).alias("fl"),
        F.round(F.sqrt(rp), 6).alias("sq"),
        F.round(F.cbrt(rp), 6).alias("cb"),
        F.round(F.exp(s / 25.0), 6).alias("ex"),
        F.round(F.expm1(s / 25.0), 6).alias("exm1"),
        F.round(F.log(rp), 6).alias("lg"),
        F.round(F.log10(rp), 6).alias("l10"),
        F.round(F.log2(rp), 6).alias("l2"),
        F.round(F.log1p(rp), 6).alias("l1p"),
        F.round(F.pow(s, 2.5), 4).alias("pw"),
        F.round(F.sin(s), 6).alias("sn"),
        F.round(F.cos(s), 6).alias("cs"),
        F.round(F.atan2(s.cast("double"), F.lit(7.0)), 6).alias("at2"),
        F.round(F.degrees(s / 10.0), 6).alias("dg"),
        F.round(F.radians(s.cast("double")), 6).alias("rd"),
        F.sign(s - 25).cast("int").alias("sg"),
        F.greatest(s, F.lit(10), F.lit(25)).alias("gr"),
        F.least(s, F.lit(10), F.lit(25)).alias("ls"),
        F.pmod(s, F.lit(7)).alias("pm"),
        F.round(F.hypot(s.cast("double"), F.lit(3.0)), 6).alias("hyp"),
        F.factorial(s % 10).alias("fac"),
        s.bitwiseAND(12).alias("band"),
        s.bitwiseOR(12).alias("bor"),
        s.bitwiseXOR(12).alias("bxor"),
        F.bitwise_not(s).alias("bnot"),
        F.shiftleft(s, 2).alias("shl"),
        F.shiftright(s, 1).alias("shr"),
        F.hex(s).alias("hx"),
    )


@q(
    "fn_math_golden",
    """
    SELECT * FROM (VALUES (2.0, 4.0, 2.68, 2.0, 3.141593, 2.718282)
    ) AS t(br25, br35, br2675, rint25, pi_r, e_r)
    """,
    "function", "math", "golden",
)
def fn_math_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-even rounding (bround/rint) + constants — golden since DuckDB
    rounds half-away-from-zero."""
    return spark.range(1).select(
        F.bround(F.lit(2.5)).alias("br25"),
        F.bround(F.lit(3.5)).alias("br35"),
        F.bround(F.lit(2.675), 2).alias("br2675"),
        F.rint(F.lit(2.5)).alias("rint25"),
        F.round(F.lit(3.14159265358979), 6).alias("pi_r"),
        F.round(F.exp(F.lit(1.0)), 6).alias("e_r"),
    )


# ---------------------------------------------------------------- datetime

@q(
    "fn_datetime",
    """
    SELECT o_orderkey,
           year(o_orderdate)                          AS y,
           quarter(o_orderdate)                       AS qtr,
           month(o_orderdate)                         AS m,
           day(o_orderdate)                           AS d,
           dayofweek(o_orderdate) + 1                 AS dow,
           dayofyear(o_orderdate)                     AS doy,
           weekofyear(o_orderdate)                    AS woy,
           CAST(o_orderdate + INTERVAL 10 DAY AS DATE)  AS plus10,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS dd,
           last_day(CAST(o_orderdate AS DATE))        AS ld,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart,
           strftime(o_orderdate, '%Y-%m-%d')          AS fmt,
           CAST(epoch(o_orderdate) AS BIGINT)         AS unix_s
    FROM orders WHERE o_orderkey < 300
    """,
    "function", "datetime",
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (~40 fns, ExpressionMappings.scala:168-207).
    DuckDB dayofweek is 0-based (Sun=0) vs Spark 1-based -> oracle +1."""
    (orders,) = _t(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return orders.filter(F.col("o_orderkey") < 300).select(
        "o_orderkey",
        F.year(od).alias("y"),
        F.quarter(od).alias("qtr"),
        F.month(od).alias("m"),
        F.dayofmonth(od).alias("d"),
        F.dayofweek(od).alias("dow"),
        F.dayofyear(od).alias("doy"),
        F.weekofyear(od).alias("woy"),
        F.date_add(od, 10).alias("plus10"),
        F.add_months(od, 3).alias("plus3m"),
        F.datediff(F.lit("1998-01-01").cast("date"), od).alias("dd"),
        F.last_day(od).alias("ld"),
        F.date_trunc("month", od).cast("date").alias("mstart"),
        F.date_format(od, "yyyy-MM-dd").alias("fmt"),
        F.unix_timestamp(od).alias("unix_s"),
    )


@q(
    "fn_datetime_make",
    """
    SELECT make_date(2024, m, 15)                                   AS md,
           strftime(make_timestamp(2024, m, 15, 6, 30, 0), '%Y-%m-%d %H:%M:%S') AS mts,
           strftime(to_timestamp(1700000000 + m * 86400), '%Y-%m-%d %H:%M:%S')  AS from_unix,
           CAST(epoch(make_timestamp(2024, m, 15, 6, 30, 0)) AS BIGINT)         AS secs,
           epoch_ms(make_timestamp(2024, m, 15, 6, 30, 0))                      AS millis
    FROM (SELECT unnest(generate_series(1, 12)) AS m)
    """,
    "function", "datetime",
)
def fn_datetime_make(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_date/make_timestamp/timestamp_seconds/unix_seconds-millis +
    from_unixtime, on a range source."""
    m = F.col("m")
    ts = F.make_timestamp(
        F.lit(2024), m, F.lit(15), F.lit(6), F.lit(30), F.lit(0)
    )
    return (
        spark.range(1, 13)
        .select(F.col("id").cast("int").alias("m"))
        .select(
            F.make_date(F.lit(2024), m, F.lit(15)).alias("md"),
            F.date_format(ts, "yyyy-MM-dd HH:mm:ss").alias("mts"),
            F.from_unixtime(F.lit(1700000000) + m * 86400, "yyyy-MM-dd HH:mm:ss").alias(
                "from_unix"
            ),
            F.unix_seconds(ts.cast("timestamp")).alias("secs"),
            F.unix_millis(ts.cast("timestamp")).alias("millis"),
        )
    )


# ---------------------------------------------------------------- json

@q(
    "fn_json",
    """
    SELECT event_type,
           count(*)                                              AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
                                                                 AS sum_k,
           max(CAST(json_extract_string(props, '$.k') AS INT))   AS max_k,
           min(json_extract_string(props, '$.k'))                AS min_k_str
    FROM events GROUP BY event_type
    """,
    "function", "json",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family (ExpressionMappings.scala:209-214): get_json_object +
    from_json over the events.props payload column."""
    (events,) = _t(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    k_int = F.from_json("props", "k INT").getField("k")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k_int).alias("sum_k"),
        F.max(k_int).alias("max_k"),
        F.min(k_str).alias("min_k_str"),
    )


@q(
    "fn_json_golden",
    """
    SELECT 3 AS arr_len, '{"a":1,"b":"x"}' AS to_json_v, '7' AS tuple_v
    """,
    "function", "json", "golden",
)
def fn_json_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_array_length / to_json / json_tuple on constants."""
    return spark.range(1).select(
        F.json_array_length(F.lit("[1,2,3]")).alias("arr_len"),
        F.to_json(
            F.struct(F.lit(1).alias("a"), F.lit("x").alias("b"))
        ).alias("to_json_v"),
        F.expr("json_tuple('{\"q\": 7}', 'q')").alias("tuple_v"),
    )


# ---------------------------------------------------------------- hash

@q(
    "fn_hash",
    """
    SELECT n_name,
           md5(n_name)         AS h_md5,
           sha256(n_name)      AS h_sha256
    FROM nation
    """,
    "function", "hash",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine hash fns over a real column (md5/sha2-256)."""
    (nation,) = _t(spark, sf_dir, "nation")
    return nation.select(
        "n_name",
        F.md5(F.col("n_name").cast("binary")).alias("h_md5"),
        F.sha2(F.col("n_name").cast("binary"), 256).alias("h_sha256"),
    )


@q(
    "fn_hash_golden",
    """
    SELECT 'a9993e364706816aba3e25717850c26c9cd0d89d' AS h_sha1,
           891568578  AS h_crc32,
           1322437556 AS h_murmur3,
           1423657621850124518 AS h_xxh64
    """,
    "function", "hash", "golden",
)
def fn_hash_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-specific hashes pinned on constants: sha1, crc32, murmur3
    (= the shuffle partitioning hash), xxhash64
    (ExpressionMappings.scala:216-221)."""
    return spark.range(1).select(
        F.sha1(F.lit("abc")).alias("h_sha1"),
        F.crc32(F.lit("abc")).alias("h_crc32"),
        F.hash(F.lit("abc")).alias("h_murmur3"),
        F.xxhash64(F.lit("abc")).alias("h_xxh64"),
    )


# ---------------------------------------------------------------- array

@q(
    "fn_array",
    """
    SELECT p_partkey,
           len(arr)                                         AS sz,
           arr[1]                                           AS first_el,
           arr[len(arr)]                                    AS last_el,
           list_contains(arr, 5)                            AS has5,
           list_position(arr, 5)                            AS pos5,
           to_json(list_sort(list_distinct(arr)))           AS dis,
           to_json(list_slice(arr, 2, 4))                   AS sl,
           to_json(list_sort(arr))                          AS srt,
           to_json(list_reverse_sort(arr))                  AS srt_desc,
           list_min(arr)                                    AS mn,
           list_max(arr)                                    AS mx,
           CAST(list_sum(arr) AS BIGINT)                    AS sm,
           to_json(list_transform(arr, x -> x * 2))         AS dbl,
           to_json(list_filter(arr, x -> x % 2 = 0))        AS evens,
           list_bool_or(list_transform(arr, x -> x > 8))    AS any_gt8,
           list_bool_and(list_transform(arr, x -> x > 0))   AS all_pos,
           to_json(flatten([arr, [99]]))                    AS flat,
           array_to_string(arr, ',')                        AS joined
    FROM (
      SELECT p_partkey,
             list_transform(generate_series(1, 1 + p_size % 9),
                            i -> CAST((p_partkey + i) % 11 AS BIGINT)) AS arr
      FROM part WHERE p_partkey < 150
    )
    """,
    "function", "array",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order fns (ExpressionMappings.scala:223-259,
    LambdaFunction :233): size/element_at/contains/position/distinct/slice/
    sort/min/max/aggregate/transform/filter/exists/forall/flatten/join."""
    (part,) = _t(spark, sf_dir, "part")
    arr = F.transform(
        F.sequence(F.lit(1), 1 + F.col("p_size") % 9),
        lambda i: ((F.col("p_partkey") + i) % 11).cast("bigint"),
    )
    base = part.filter(F.col("p_partkey") < 150).select(
        "p_partkey", arr.alias("arr")
    )
    a = F.col("arr")
    return base.select(
        "p_partkey",
        F.size(a).alias("sz"),
        F.element_at(a, 1).alias("first_el"),
        F.element_at(a, -1).alias("last_el"),
        F.array_contains(a, 5).alias("has5"),
        F.array_position(a, 5).alias("pos5"),
        # array-valued outputs JSON-serialized: the driver's pandas
        # canonicalizer cannot sort ndarray cells (round-3 agg_collect err)
        F.to_json(F.sort_array(F.array_distinct(a))).alias("dis"),
        F.to_json(F.slice(a, 2, 3)).alias("sl"),
        F.to_json(F.sort_array(a)).alias("srt"),
        F.to_json(F.sort_array(a, asc=False)).alias("srt_desc"),
        F.array_min(a).alias("mn"),
        F.array_max(a).alias("mx"),
        F.aggregate(a, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("sm"),
        F.to_json(F.transform(a, lambda x: x * 2)).alias("dbl"),
        F.to_json(F.filter(a, lambda x: x % 2 == 0)).alias("evens"),
        F.exists(a, lambda x: x > 8).alias("any_gt8"),
        F.forall(a, lambda x: x > 0).alias("all_pos"),
        F.to_json(F.flatten(F.array(a, F.array(F.lit(99).cast("bigint"))))).alias("flat"),
        F.array_join(a, ",").alias("joined"),
    )


@q(
    "fn_array_setops",
    """
    SELECT p_partkey,
           to_json(list_sort(list_distinct(a1 || a2)))                       AS un,
           to_json(list_sort(list_distinct(list_intersect(a1, a2))))         AS inter,
           to_json(list_sort(list_distinct(list_filter(a1, x -> NOT list_contains(a2, x)))))
                                                                             AS ex,
           list_has_any(a1, a2)                                              AS overlap
    FROM (
      SELECT p_partkey,
             list_transform(generate_series(1, 4), i -> (p_partkey + i) % 7)  AS a1,
             list_transform(generate_series(1, 4), i -> (p_partkey + i*2) % 7) AS a2
      FROM part WHERE p_partkey < 100
    )
    """,
    "function", "array",
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_union/intersect/except/overlap (sorted for hash stability)."""
    (part,) = _t(spark, sf_dir, "part")
    mk = lambda mult: F.transform(  # noqa: E731
        F.sequence(F.lit(1), F.lit(4)),
        lambda i: (F.col("p_partkey") + i * mult) % 7,
    )
    base = part.filter(F.col("p_partkey") < 100).select(
        "p_partkey", mk(1).alias("a1"), mk(2).alias("a2")
    )
    a1, a2 = F.col("a1"), F.col("a2")
    return base.select(
        "p_partkey",
        F.to_json(F.sort_array(F.array_union(a1, a2))).alias("un"),
        F.to_json(F.sort_array(F.array_intersect(a1, a2))).alias("inter"),
        F.to_json(F.sort_array(F.array_except(a1, a2))).alias("ex"),
        F.arrays_overlap(a1, a2).alias("overlap"),
    )


@q(
    "fn_array_vector",
    """
    SELECT vec_id,
           len(embedding)                                             AS dim,
           round(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]), 3) AS sq_norm,
           round(list_sum(embedding::DOUBLE[]) / len(embedding), 5)   AS mean_el
    FROM embeddings WHERE vec_id < 100
    """,
    "function", "array", "vector",
)
def fn_array_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zip_with + aggregate as a vector dot product over the embeddings
    fixture — the JVM-side kernel the datapipe ANN operators build on."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(v, v, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.filter(F.col("vec_id") < 100).select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(dot, 3).alias("sq_norm"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x) / F.size("embedding"), 5
        ).alias("mean_el"),
    )


# ---------------------------------------------------------------- map / struct

@q(
    "fn_map",
    """
    SELECT n_nationkey,
           map_extract(m, 'key')[1]              AS v_key,
           map_extract(m, 'region')[1]           AS v_region,
           cardinality(m)                        AS n_entries,
           to_json(list_sort(map_keys(m)))       AS keys_sorted,
           to_json(list_sort(map_values(m)))     AS vals_sorted
    FROM (
      SELECT n_nationkey,
             map(['key', 'region'], [n_nationkey, n_regionkey]) AS m
      FROM nation
    )
    """,
    "function", "map",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (ExpressionMappings.scala:261-271): construction, lookup,
    keys/values/cardinality."""
    (nation,) = _t(spark, sf_dir, "nation")
    m = F.map_from_arrays(
        F.array(F.lit("key"), F.lit("region")),
        F.array(F.col("n_nationkey"), F.col("n_regionkey")),
    )
    base = nation.select("n_nationkey", m.alias("m"))
    return base.select(
        "n_nationkey",
        F.element_at("m", "key").alias("v_key"),
        F.element_at("m", "region").alias("v_region"),
        F.size("m").alias("n_entries"),
        F.to_json(F.sort_array(F.map_keys("m"))).alias("keys_sorted"),
        F.to_json(F.sort_array(F.map_values("m"))).alias("vals_sorted"),
    )


@q(
    "fn_struct",
    """
    SELECT s_suppkey, s_name AS nm, round(s_acctbal, 2) AS bal,
           s_nationkey AS nk
    FROM supplier WHERE s_suppkey < 60
    """,
    "function", "struct",
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """named_struct + get_struct_field round-trip (struct built then fields
    extracted back to top level; ExpressionMappings.scala:273-274)."""
    (supplier,) = _t(spark, sf_dir, "supplier")
    st = F.struct(
        F.col("s_name").alias("nm"),
        F.round("s_acctbal", 2).alias("bal"),
        F.col("s_nationkey").alias("nk"),
    )
    return (
        supplier.filter(F.col("s_suppkey") < 60)
        .select("s_suppkey", st.alias("st"))
        .select(
            "s_suppkey",
            F.col("st.nm").alias("nm"),
            F.col("st.bal").alias("bal"),
            F.col("st.nk").alias("nk"),
        )
    )


# ---------------------------------------------------------------- conditional

@q(
    "fn_conditional",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END  AS bucket,
           CASE WHEN l_discount > 0.05 THEN 'big' ELSE 'small' END AS disc_band,
           l_returnflag IN ('A', 'R')                            AS is_ar,
           coalesce(nullif(l_returnflag, 'N'), 'none')           AS flag_or_none,
           CASE WHEN nullif(l_tax, 0.0) IS NOT NULL THEN 'taxed' ELSE 'free' END AS nvl2_v,
           isnan('NaN'::DOUBLE)                                  AS nan_chk,
           round(CASE WHEN isnan('NaN'::DOUBLE) THEN l_quantity ELSE 0.0 END, 2) AS nanvl_v,
           l_quantity BETWEEN 10 AND 20                          AS in_range
    FROM lineitem WHERE l_orderkey < 300
    """,
    "function", "conditional",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """if/case_when/in/nullif/nvl/nvl2/isnan/between
    (ExpressionMappings.scala:276-301, :346-352 runtime-replaceable)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    return li.filter(F.col("l_orderkey") < 300).select(
        "l_orderkey",
        "l_linenumber",
        F.when(qty < 10, "low").when(qty < 30, "mid").otherwise("high").alias("bucket"),
        F.when(F.col("l_discount") > 0.05, "big").otherwise("small").alias("disc_band"),
        F.col("l_returnflag").isin("A", "R").alias("is_ar"),
        F.nvl(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
        F.nvl2(F.nullif("l_tax", F.lit(0.0)), F.lit("taxed"), F.lit("free")).alias(
            "nvl2_v"
        ),
        F.isnan(F.lit(float("nan"))).alias("nan_chk"),
        F.round(F.nanvl(F.lit(float("nan")), qty), 2).alias("nanvl_v"),
        qty.between(10, 20).alias("in_range"),
    )


# ---------------------------------------------------------------- decimal

@q(
    "fn_decimal",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)      AS dec_sum,
           CAST(max(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(8,4))) AS VARCHAR)          AS dec_mul_max,
           CAST(round(avg(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS dec_avg
    FROM lineitem GROUP BY l_returnflag
    """,
    "function", "decimal",
)
def fn_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal arithmetic + overflow-checked agg (CheckOverflow/MakeDecimal
    sigs ExpressionMappings.scala:289-290; DecimalRoundTransformer.scala).
    Sums/products in exact decimal, rendered as strings so scale rules match."""
    (li,) = _t(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(8,4)")
    return li.groupBy("l_returnflag").agg(
        F.sum(p).cast("string").alias("dec_sum"),
        F.max(p * d).cast("string").alias("dec_mul_max"),
        F.round(F.avg(p), 2).cast("double").alias("dec_avg"),
    )


@q(
    "fn_string_more",
    """
    SELECT n_name,
           bit_length(n_name)                          AS bits,
           octet_length(n_name::BLOB)                  AS octets,
           length(n_name)                              AS chars,
           printf('%s/%02d', n_name, n_nationkey)      AS fmt,
           repeat(' ', 3) || n_name                    AS spaced,
           strpos(n_name, 'TION')                      AS loc,
           trim(n_name, 'N_0123456789')                AS btrimmed,
           ltrim(n_name, 'NATIO')                      AS ltrimmed,
           starts_with(n_name, 'NATION')               AS sw,
           ends_with(n_name, '1')                      AS ew,
           encode(n_name)::VARCHAR                     AS enc_dec,
           base64(encode(n_name))                      AS b64,
           decode(from_base64(base64(encode(n_name)))) AS b64_roundtrip
    FROM nation
    """,
    "function", "string",
)
def fn_string_more(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String batch 2: lengths, format_string, space, locate, btrim,
    startswith/endswith, encode/decode, base64 round-trip."""
    (nation,) = _t(spark, sf_dir, "nation")
    n = F.col("n_name")
    enc = F.encode(n, "utf-8")
    return nation.select(
        "n_name",
        F.bit_length(n).alias("bits"),
        F.octet_length(n).alias("octets"),
        F.char_length(n).alias("chars"),
        F.format_string("%s/%02d", n, F.col("n_nationkey")).alias("fmt"),
        F.concat(F.expr("space(3)"), n).alias("spaced"),
        F.locate("TION", n).alias("loc"),
        F.btrim(n, F.lit("N_0123456789")).alias("btrimmed"),
        F.ltrim(n, F.lit("NATIO")).alias("ltrimmed"),
        F.startswith(n, F.lit("NATION")).alias("sw"),
        F.endswith(n, F.lit("1")).alias("ew"),
        enc.cast("string").alias("enc_dec"),
        F.base64(enc).alias("b64"),
        F.decode(F.unbase64(F.base64(enc)), "utf-8").alias("b64_roundtrip"),
    )


@q(
    "fn_datetime_more",
    """
    SELECT o_orderkey,
           CAST(date_trunc('quarter', o_orderdate) AS DATE)  AS qstart,
           CAST(date_trunc('week', o_orderdate) AS DATE)     AS wstart,
           date_part('month', o_orderdate)                   AS dpm,
           CAST(o_orderdate + ((7 - dayofweek(CAST(o_orderdate AS DATE)) + 1) % 7
                + CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) = 1 THEN 7 ELSE 0 END)
                * INTERVAL 1 DAY AS DATE)                    AS next_monday,
           CAST(o_orderdate - INTERVAL 90 DAY AS DATE)       AS minus90,
           greatest(CAST(o_orderdate AS DATE), DATE '1996-06-01') AS clamped
    FROM orders WHERE o_orderkey < 200
    """,
    "function", "datetime",
)
def fn_datetime_more(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime batch 2: trunc to quarter/week, date_part/extract,
    next_day (oracle spells out the day arithmetic: DuckDB dayofweek is
    0=Sun vs Spark 1=Sun), interval subtraction, date greatest."""
    (orders,) = _t(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return orders.filter(F.col("o_orderkey") < 200).select(
        "o_orderkey",
        F.date_trunc("quarter", od).cast("date").alias("qstart"),
        F.date_trunc("week", od).cast("date").alias("wstart"),
        F.date_part(F.lit("month"), od).alias("dpm"),
        F.next_day(od, "Mon").alias("next_monday"),
        F.date_sub(od, 90).alias("minus90"),
        F.greatest(od.cast("date"), F.lit("1996-06-01").cast("date")).alias("clamped"),
    )


@q(
    "fn_utc_golden",
    """
    SELECT '2024-03-10 07:30:00' AS to_utc_v, '2024-03-09 18:30:00' AS from_utc_v,
           1.4839 AS months_between_v, 2 AS extract_dow
    """,
    "function", "datetime", "golden",
)
def fn_utc_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_utc_timestamp / from_utc_timestamp / months_between on constants
    (timezone rules and 31-day-month fractions are Spark-defined)."""
    ts = F.lit("2024-03-10 02:30:00").cast("timestamp_ntz").cast("timestamp")
    return spark.range(1).select(
        F.date_format(
            F.to_utc_timestamp(ts, "America/New_York"), "yyyy-MM-dd HH:mm:ss"
        ).alias("to_utc_v"),
        F.date_format(
            F.from_utc_timestamp(ts, "America/Los_Angeles"), "yyyy-MM-dd HH:mm:ss"
        ).alias("from_utc_v"),
        F.round(
            F.months_between(
                F.lit("2020-03-15").cast("timestamp_ntz"),
                F.lit("2020-01-31").cast("timestamp_ntz"),
            ),
            4,
        ).alias("months_between_v"),
        F.expr("extract(DOW FROM DATE '2024-03-11')").cast("int").alias("extract_dow"),
    )


@q(
    "fn_try_eval",
    """
    SELECT l_orderkey, l_linenumber,
           l_quantity / nullif(l_linenumber - 1, 0)   AS safe_div,
           TRY_CAST(l_returnflag AS INT)              AS bad_cast,
           TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INT) AS good_cast,
           arr[5]                                     AS maybe_el
    FROM (SELECT *, [l_linenumber, l_linenumber * 2] AS arr
          FROM lineitem WHERE l_orderkey < 200)
    """,
    "function", "try",
)
def fn_try_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_* family (ExpressionMappings try_eval sigs): NULL instead of
    error under ANSI mode — try_divide on a zero divisor, try_cast on a
    non-numeric string, try_element_at past the end."""
    (li,) = _t(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_orderkey") < 200).withColumn(
        "arr", F.array(F.col("l_linenumber"), F.col("l_linenumber") * 2)
    )
    return base.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide("l_quantity", F.col("l_linenumber") - 1).alias("safe_div"),
        F.col("l_returnflag").try_cast("int").alias("bad_cast"),
        F.col("l_linenumber").cast("string").try_cast("int").alias("good_cast"),
        F.try_element_at("arr", F.lit(5)).alias("maybe_el"),
    )


@q(
    "fn_array_more",
    """
    SELECT p_partkey,
           to_json(list_transform(generate_series(1, 3), i -> p_size))  AS repeated,
           to_json(arr || [99])                                         AS appended,
           to_json([0] || arr)                                          AS prepended,
           to_json(list_filter(arr, e -> e != 2))                       AS removed,
           to_json(list_filter(arr2, e -> e IS NOT NULL))               AS compacted,
           to_json(list_slice(arr, 1, 1) || [42] || list_slice(arr, 2, len(arr)))
                                                                        AS inserted,
           to_json(list_transform(generate_series(0, 8, 2), i -> i))    AS stepped
    FROM (
      SELECT p_partkey, p_size,
             list_transform(generate_series(1, 4), i -> (p_partkey + i) % 5) AS arr,
             [p_size, NULL, p_size * 2, NULL]                        AS arr2
      FROM part WHERE p_partkey < 100
    )
    """,
    "function", "array",
)
def fn_array_more(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array batch 2: array_repeat, append/prepend, remove, compact,
    insert, sequence-with-step (ExpressionMappings array sigs :223-259)."""
    (part,) = _t(spark, sf_dir, "part")
    base = part.filter(F.col("p_partkey") < 100).select(
        "p_partkey",
        "p_size",
        F.transform(
            F.sequence(F.lit(1), F.lit(4)),
            lambda i: (F.col("p_partkey") + i) % 5,
        ).alias("arr"),
        F.array(
            F.col("p_size"),
            F.lit(None).cast("int"),
            F.col("p_size") * 2,
            F.lit(None).cast("int"),
        ).alias("arr2"),
    )
    a = F.col("arr")
    return base.select(
        "p_partkey",
        F.to_json(F.array_repeat(F.col("p_size"), 3)).alias("repeated"),
        F.to_json(F.array_append(a, F.lit(99))).alias("appended"),
        F.to_json(F.array_prepend(a, F.lit(0))).alias("prepended"),
        F.to_json(F.array_remove(a, 2)).alias("removed"),
        F.to_json(F.array_compact("arr2")).alias("compacted"),
        F.to_json(F.array_insert(a, 2, F.lit(42))).alias("inserted"),
        F.to_json(F.sequence(F.lit(0), F.lit(8), F.lit(2))).alias("stepped"),
    )


@q(
    "fn_map_more",
    """
    SELECT n_nationkey,
           to_json(list_sort(list_transform(string_split('a:1,b:2,c:3', ','),
                                    kv -> string_split(kv, ':')[1])))  AS s2m_keys,
           to_json(list_sort(list_transform(string_split('a:1,b:2,c:3', ','),
                                    kv -> CAST(string_split(kv, ':')[2] AS INT))))
                                                                       AS s2m_vals,
           to_json(list_sort([n_nationkey * 10, n_regionkey * 10]))    AS tv_vals,
           to_json(list_sort(['K_key', 'K_region']))                   AS tk_keys,
           to_json([n_nationkey])                                      AS filtered_vals
    FROM nation
    """,
    "function", "map",
)
def fn_map_more(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map batch 2: str_to_map, transform_values, transform_keys,
    map_filter — DuckDB's map surface is thin, so the oracle reproduces
    the *contents* (sorted key/value arrays) rather than map cells."""
    (nation,) = _t(spark, sf_dir, "nation")
    m = F.map_from_arrays(
        F.array(F.lit("key"), F.lit("region")),
        F.array(F.col("n_nationkey"), F.col("n_regionkey")),
    )
    s2m = F.expr("str_to_map('a:1,b:2,c:3', ',', ':')")
    tv = F.transform_values(m, lambda k, v: v * 10)
    tk = F.transform_keys(m, lambda k, v: F.concat(F.lit("K_"), k))
    mf = F.map_filter(m, lambda k, v: k == "key")
    return nation.select(
        "n_nationkey",
        F.to_json(F.sort_array(F.map_keys(s2m))).alias("s2m_keys"),
        F.to_json(
            F.sort_array(F.transform(F.map_values(s2m), lambda v: v.cast("int")))
        ).alias("s2m_vals"),
        F.to_json(F.sort_array(F.map_values(tv))).alias("tv_vals"),
        F.to_json(F.sort_array(F.map_keys(tk))).alias("tk_keys"),
        F.to_json(F.map_values(mf)).alias("filtered_vals"),
    )


@q(
    "fn_interval_golden",
    """
    SELECT 'INTERVAL ''1-3'' YEAR TO MONTH' AS ym,
           'INTERVAL ''2 03:04:05.5'' DAY TO SECOND' AS dt,
           '2024-02-29' AS plus_m,
           '2024-01-01 01:30:00' AS plus_min,
           '0000000100000000000000010000000400000014' AS cms_prefix
    """,
    "function", "interval", "golden",
)
def fn_interval_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval construction + arithmetic (make_ym_interval /
    make_dt_interval / month-end clamping) and a count_min_sketch
    determinism pin (fixed seed -> fixed sketch bytes).
    Reference sigs: ExpressionMappings make_ym_interval :199-201,
    count_min_sketch in the aggregate matrix."""
    return spark.range(1).select(
        F.expr("CAST(make_ym_interval(1, 3) AS STRING)").alias("ym"),
        F.expr("CAST(make_dt_interval(2, 3, 4, 5.5) AS STRING)").alias("dt"),
        F.expr("CAST(DATE '2024-01-31' + INTERVAL '1' MONTH AS STRING)").alias(
            "plus_m"
        ),
        F.expr(
            "CAST(TIMESTAMP_NTZ '2024-01-01 00:00:00' + INTERVAL '90' MINUTE AS STRING)"
        ).alias("plus_min"),
        F.expr("substr(hex(count_min_sketch(1, 0.1d, 0.9d, 42)), 1, 40)").alias(
            "cms_prefix"
        ),
    )


@q(
    "fn_special",
    """
    SELECT 0 AS pid, true AS from_lineitem, count(*) AS n,
           max(mid) AS max_mid
    FROM (
      SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS mid
      FROM lineitem WHERE l_orderkey < 100
    )
    """,
    "function", "special",
)
def fn_special(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Special/internal expressions (ExpressionMappings :276-301):
    spark_partition_id, input_file_name, monotonically_increasing_id —
    partition-dependent by design, so pinned to a single partition where
    their values are fully determined (pid=0, mid=dense 0..n-1)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    # input_file_name() must be captured at the scan (a shuffle erases it);
    # coalesce(1) is a narrow dependency so it survives, and on one
    # partition monotonically_increasing_id is a dense 0..n-1
    one = (
        li.filter(F.col("l_orderkey") < 100)
        .select(F.input_file_name().contains("lineitem").alias("from_lineitem"))
        .coalesce(1)
        .select(
            F.spark_partition_id().alias("pid"),
            "from_lineitem",
            F.monotonically_increasing_id().alias("mid"),
        )
    )
    return one.groupBy("pid", "from_lineitem").agg(
        F.count("*").alias("n"), F.max("mid").alias("max_mid")
    ).select("pid", "from_lineitem", "n", "max_mid")


@q(
    "fn_variant",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS bucket,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum
    FROM events GROUP BY bucket
    """,
    "function", "variant",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark 4 semi-structured type): parse_json into a binary
    variant ONCE, then typed variant_get extraction — the columnar-JSON
    path that replaces per-access string re-parsing (the 100 TB answer to
    schemaless props columns). Oracle extracts the same field with
    DuckDB's JSON functions."""
    (ev,) = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return (
        ev.select(k.alias("k"))
        .groupBy((F.col("k") % 5).alias("bucket"))
        .agg(F.count("*").alias("n"), F.sum("k").alias("k_sum"))
    )


@q(
    "fn_xml_golden",
    """
    SELECT 5 AS id, 'x' AS nm, 'hi' AS b_text, 7 AS b_int, 2 AS n_items
    """,
    "function", "xml", "golden",
)
def fn_xml_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML surface: from_xml (schema'd parse) + xpath_string/xpath_int +
    xpath node counting — golden-pinned literals (DuckDB has no XML
    functions)."""
    row = spark.range(1).select(
        F.from_xml(
            F.lit("<r><id>5</id><nm>x</nm></r>"), "id INT, nm STRING"
        ).alias("s"),
        F.xpath_string(F.lit("<a><b>hi</b></a>"), F.lit("a/b")).alias("b_text"),
        F.xpath_int(F.lit("<a><b>7</b></a>"), F.lit("a/b")).alias("b_int"),
        F.xpath(
            F.lit("<l><i>1</i><i>2</i></l>"), F.lit("l/i/text()")
        ).alias("items"),
    )
    return row.select(
        F.col("s.id").alias("id"),
        F.col("s.nm").alias("nm"),
        "b_text",
        "b_int",
        F.size("items").alias("n_items"),
    )


@q(
    "fn_url_golden",
    """
    SELECT o_orderkey AS k,
           hex(o_orderkey) AS hx,
           bin(o_orderkey) AS bn,
           base64(CAST(o_orderpriority AS BLOB)) AS b64,
           'a+b%26c%3Dd' AS enc, 'a b&c' AS dec, 'NULL' AS bad,
           'spark.apache.org' AS host, 'q=join' AS query_kv,
           '1,234,567.89' AS fmt
    FROM orders WHERE o_orderkey < 200
    """,
    "function", "url", "golden", "computed-oracle",
)
def fn_url_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL family (url_encode/url_decode/try_url_decode/parse_url —
    ExpressionMappings URL block) plus format_number/hex/bin/base64.
    hex/bin/base64 are COMPUTED row-by-row over fixture orderkeys/clerk
    strings and cross-checked against DuckDB's own hex/bin/base64 (r6
    verdict directive #3 — prefer a computable cross-check wherever one
    exists); the URL functions and format_number stay golden-pinned as
    constant columns (DuckDB 1.0 has no equivalents).  try_url_decode
    returns NULL on malformed input instead of raising — the try_*
    contract."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") < 200).select(
        F.col("o_orderkey").alias("k"),
        F.hex(F.col("o_orderkey")).alias("hx"),
        F.bin(F.col("o_orderkey")).alias("bn"),
        F.base64(F.col("o_orderpriority").cast("binary")).alias("b64"),
        F.url_encode(F.lit("a b&c=d")).alias("enc"),
        F.url_decode(F.lit("a%20b%26c")).alias("dec"),
        # sentinel instead of NULL: a NULL cell is NaN (float) in DuckDB's
        # pandas frame but None (object) in Spark's — 'nan' vs 'None'
        F.coalesce(
            F.try_url_decode(F.lit("%zz")).cast("string"), F.lit("NULL")
        ).alias("bad"),
        F.parse_url(
            F.lit("https://spark.apache.org/docs?q=join"), F.lit("HOST")
        ).alias("host"),
        F.parse_url(
            F.lit("https://spark.apache.org/docs?q=join"), F.lit("QUERY")
        ).alias("query_kv"),
        F.format_number(F.lit(1234567.891), 2).alias("fmt"),
    )


@q(
    "fn_replaceable",
    """
    SELECT left(n_name, 3) AS l3, right(n_name, 3) AS r3,
           +n_nationkey AS pos, -n_nationkey AS neg,
           CAST(NULL AS BOOLEAN) IS NULL AS assert_ok,
           ifnull(NULL, n_name) AS ifn
    FROM nation WHERE n_nationkey < 5
    """,
    "function", "runtime-replaceable",
)
def fn_replaceable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-replaceable expressions (ExpressionMappings :302-318 —
    exprs Catalyst rewrites into other exprs before execution): left/right
    (-> substring), positive/negative, assert_true (-> null on pass),
    ifnull (-> coalesce)."""
    (nation,) = _t(spark, sf_dir, "nation")
    return nation.filter(F.col("n_nationkey") < 5).select(
        F.left("n_name", F.lit(3)).alias("l3"),
        F.right("n_name", F.lit(3)).alias("r3"),
        F.positive("n_nationkey").alias("pos"),
        F.negative("n_nationkey").alias("neg"),
        F.assert_true(F.lit(True)).isNull().alias("assert_ok"),
        F.ifnull(F.lit(None), F.col("n_name")).alias("ifn"),
    )


@q(
    "fn_nondeterministic",
    """
    SELECT true AS uuid_ok, true AS rand_ok, true AS randn_ok, 5 AS n
    """,
    "function", "nondeterministic",
)
def fn_nondeterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nondeterministic expressions (uuid, rand, randn — ExpressionMappings
    :160-166): values can't be pinned, so the oracle checks INVARIANTS —
    uuid shape, rand() in [0,1), per-row evaluation (5 rows in, 5 out)."""
    (nation,) = _t(spark, sf_dir, "nation")
    rows = nation.filter(F.col("n_nationkey") < 5).select(
        F.uuid().alias("u"), F.rand().alias("r"), F.randn().alias("g")
    )
    return rows.agg(
        F.bool_and(
            F.col("u").rlike(
                "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
            )
        ).alias("uuid_ok"),
        F.bool_and((F.col("r") >= 0) & (F.col("r") < 1)).alias("rand_ok"),
        F.bool_and(F.abs("g") < 100).alias("randn_ok"),
        F.count("*").alias("n"),
    )


@q(
    "fn_to_char_number",
    """
    SELECT '01,234.56' AS chr_v, 1234.56 AS num_v, NULL AS bad_v,
           '3.14' AS fmt_f
    """,
    "function", "format", "golden",
)
def fn_to_char_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_char / to_number / try_to_number (Spark 4 Oracle-style numeric
    formatting) — golden-pinned (DuckDB's format model differs)."""
    return spark.range(1).select(
        F.to_char(F.lit(1234.56).cast("decimal(10,2)"), F.lit("00,000.00")).alias(
            "chr_v"
        ),
        F.to_number(F.lit("01,234.56"), F.lit("00,000.00"))
        .cast("double")
        .alias("num_v"),
        F.try_to_number(F.lit("oops"), F.lit("00,000.00"))
        .cast("double")
        .alias("bad_v"),
        F.format_string("%.2f", F.lit(3.14159)).alias("fmt_f"),
    )


@q(
    "fn_math_trig",
    """
    SELECT 0.523599 AS asin_v, 1.047198 AS acos_v,
           1.557408 AS tan_v, 0.785398 AS atan_v,
           1.175201 AS sinh_v, 1.543081 AS cosh_v,
           0.761594 AS tanh_v, 0.642093 AS cot_v,
           -1.0 AS sign_v, '4A' AS unhex_rt
    """,
    "function", "math", "trig",
)
def fn_math_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trig + hyperbolic + sign + unhex roundtrip (ExpressionMappings math
    block :115-166). Golden-pinned at 6 dp — DuckDB lacks the hyperbolic
    family, and its sign() returns int8 where Spark's signum is double."""
    return spark.range(1).select(
        F.round(F.asin(F.lit(0.5)), 6).alias("asin_v"),
        F.round(F.acos(F.lit(0.5)), 6).alias("acos_v"),
        F.round(F.tan(F.lit(1.0)), 6).alias("tan_v"),
        F.round(F.atan(F.lit(1.0)), 6).alias("atan_v"),
        F.round(F.sinh(F.lit(1.0)), 6).alias("sinh_v"),
        F.round(F.cosh(F.lit(1.0)), 6).alias("cosh_v"),
        F.round(F.tanh(F.lit(1.0)), 6).alias("tanh_v"),
        F.round(F.cot(F.lit(1.0)), 6).alias("cot_v"),
        F.signum(F.lit(-3.5)).alias("sign_v"),
        F.hex(F.unhex(F.lit("4A"))).alias("unhex_rt"),
    )


@q(
    "fn_datetime_epoch",
    """
    SELECT CAST(epoch(ts) AS BIGINT) AS secs,
           epoch_us(ts) AS micros,
           CAST(date_trunc('year', ts) AS TIMESTAMP) AS yr_start,
           isodow(ts) - 1 AS wd,
           count(*) AS n
    FROM (SELECT CAST(l_shipdate AS TIMESTAMP) AS ts FROM lineitem
          WHERE l_orderkey < 50)
    GROUP BY 1, 2, 3, 4
    """,
    "function", "datetime", "epoch",
)
def fn_datetime_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch conversions + trunc + weekday (datetime block :168-207):
    unix_seconds/unix_micros (UTC session), date_trunc to year, weekday
    (Monday=0 == DuckDB isodow-1)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    ts = F.col("l_shipdate").cast("timestamp")
    return (
        li.filter(F.col("l_orderkey") < 50)
        .select(
            F.unix_seconds(ts).alias("secs"),
            F.unix_micros(ts).alias("micros"),
            F.date_trunc("year", ts).cast("timestamp_ntz").alias("yr_start"),
            F.weekday(ts).alias("wd"),
        )
        .groupBy("secs", "micros", "yr_start", "wd")
        .agg(F.count("*").alias("n"))
    )


@q(
    "fn_array_zip_sort",
    """
    SELECT list_sort([3, 1, 2], 'DESC') = [3, 2, 1] AS sorted_desc,
           CAST(list_sum(list_transform(list_zip([1, 2, 3], [10, 20, 30]),
                                        p -> p[1] * p[2])) AS BIGINT) AS dot_v,
           140 AS dot_expected
    """,
    "function", "array", "zip",
)
def fn_array_zip_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_sort with a comparator lambda + arrays_zip consumed through
    transform/aggregate (struct output itself stringifies differently per
    engine, so the zip is certified via the dot product it computes)."""
    arr = F.array(F.lit(3), F.lit(1), F.lit(2))
    a = F.array(F.lit(1), F.lit(2), F.lit(3))
    b = F.array(F.lit(10), F.lit(20), F.lit(30))
    zipped = F.arrays_zip(a.alias("x"), b.alias("y"))
    dot = F.aggregate(
        F.transform(zipped, lambda p: p["x"] * p["y"]),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return spark.range(1).select(
        (
            F.array_sort(arr, lambda l, r: F.when(l < r, 1).when(l > r, -1).otherwise(0))
            == F.array(F.lit(3), F.lit(2), F.lit(1))
        ).alias("sorted_desc"),
        dot.alias("dot_v"),
        F.lit(140).alias("dot_expected"),
    )


@q(
    "fn_map_batch3",
    """
    SELECT 3 AS n_entries, 'a=1|b=2|c=30' AS entries_repr,
           '[k]' AS json_keys, 'pad' AS rtrim_v
    """,
    "function", "map", "golden",
)
def fn_map_batch3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_concat + map_entries + map_zip_with + json_object_keys + rtrim
    (DuckDB's map surface is thin -> golden-pinned). The zip_with merges
    overlapping keys by multiplication (c: 3*10=30)."""
    m1 = F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2))
    m2 = F.create_map(F.lit("c"), F.lit(3))
    m3 = F.create_map(F.lit("c"), F.lit(10))
    merged = F.map_concat(m1, m2)
    zipped = F.map_zip_with(
        m2, m3, lambda k, v1, v2: F.coalesce(v1, F.lit(1)) * F.coalesce(v2, F.lit(1))
    )
    entries = F.map_entries(F.map_concat(m1, zipped))
    repr_ = F.array_join(
        F.transform(entries, lambda e: F.concat_ws("=", e["key"], e["value"])), "|"
    )
    return spark.range(1).select(
        F.size(entries).alias("n_entries"),
        repr_.alias("entries_repr"),
        F.json_object_keys(F.lit('{"k": 1}')).cast("string").alias("json_keys"),
        F.rtrim(F.lit("pad   ")).alias("rtrim_v"),
    )


@q(
    "fn_null_empty_agg",
    """
    SELECT 'all_null' AS grp, count(*) AS n_rows, count(v) AS n_vals,
           sum(v) AS sum_v, avg(v) AS avg_v, min(v) AS min_v,
           count(DISTINCT v) AS n_distinct
    FROM (SELECT CAST(NULL AS DOUBLE) AS v FROM range(0, 10))
    UNION ALL
    SELECT 'empty', count(*), count(v), sum(v), avg(v), min(v),
           count(DISTINCT v)
    FROM (SELECT CAST(1.0 AS DOUBLE) AS v FROM range(0, 10) WHERE false)
    """,
    "function", "null-semantics",
)
def fn_null_empty_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate NULL semantics at the edges: an all-NULL column (count(*)
    counts rows, count(col)/sum/avg/min ignore NULLs -> 10/0/NULL) and a
    globally-empty input (global agg still returns ONE row: 0/0/NULL) —
    the two shapes that break naive partial-agg implementations."""
    all_null = spark.range(10).select(F.lit(None).cast("double").alias("v"))
    empty = spark.range(10).select(F.lit(1.0).alias("v")).filter(F.lit(False))

    def agg(df, tag):
        return df.agg(
            F.count("*").alias("n_rows"),
            F.count("v").alias("n_vals"),
            F.sum("v").alias("sum_v"),
            F.avg("v").alias("avg_v"),
            F.min("v").alias("min_v"),
            F.countDistinct("v").alias("n_distinct"),
        ).select(F.lit(tag).alias("grp"), "*")

    return agg(all_null, "all_null").unionByName(agg(empty, "empty"))


@q(
    "fn_sentences_golden",
    """
    SELECT 2 AS n_sentences, 4 AS first_words, 'Hello' AS w0
    """,
    "function", "string", "golden",
)
def fn_sentences_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sentences(): locale-aware sentence/word segmentation to
    array<array<string>> (golden — no DuckDB equivalent)."""
    s = F.sentences(F.lit("Hello brave new world. Second sentence here!"))
    return spark.range(1).select(
        F.size(s).alias("n_sentences"),
        F.size(F.element_at(s, 1)).cast("int").alias("first_words"),
        F.element_at(F.element_at(s, 1), 1).alias("w0"),
    )


@q(
    "fn_meta_golden",
    """
    SELECT 'INT' AS t_int, 'DOUBLE' AS t_double, 'STRING' AS t_str,
           true AS is_v4, 'spark_catalog' AS cat
    """,
    "function", "meta", "golden",
)
def fn_meta_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-meta expressions: typeof (runtime type names), version
    (pinned to the 4.x major), current_catalog — the reference maps these
    in its 'special' block (version :298)."""
    return spark.range(1).select(
        F.upper(F.typeof(F.lit(1))).alias("t_int"),
        F.upper(F.typeof(F.lit(1.5))).alias("t_double"),
        F.upper(F.typeof(F.lit("x"))).alias("t_str"),
        F.version().startswith("4.").alias("is_v4"),
        F.current_catalog().alias("cat"),
    )


@q(
    "fn_regexp_family2",
    """
    SELECT p_name,
           len(regexp_extract_all(p_name, '[aeiou]+')) AS vowel_runs,
           CASE WHEN regexp_matches(p_name, '[0-9]') THEN 1 ELSE 0 END AS has_digit,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word
    FROM part WHERE p_partkey < 30
    """,
    "function", "regex",
)
def fn_regexp_family2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_count / rlike-as-flag / regexp_substr (the Spark 3.4+ regex
    additions) against DuckDB's regexp_extract_all/matches equivalents —
    same RE2-compatible pattern subset both engines honor."""
    (part,) = _t(spark, sf_dir, "part")
    return part.filter(F.col("p_partkey") < 30).select(
        "p_name",
        F.regexp_count("p_name", F.lit("[aeiou]+")).alias("vowel_runs"),
        F.col("p_name").rlike("[0-9]").cast("int").alias("has_digit"),
        F.regexp_substr("p_name", F.lit("[a-z]+")).alias("first_word"),
    )


@q(
    "fn_variant_try",
    """
    SELECT true AS bad_is_null, 42 AS good_k
    """,
    "function", "variant", "try",
)
def fn_variant_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_parse_json: malformed input -> NULL variant instead of raising
    (the try_* contract extended to the VARIANT type); the well-formed
    path round-trips through variant_get."""
    return spark.range(1).select(
        F.try_parse_json(F.lit("{not json")).isNull().alias("bad_is_null"),
        F.variant_get(
            F.try_parse_json(F.lit('{"k": 42}')), "$.k", "bigint"
        ).alias("good_k"),
    )


@q(
    "fn_lev_bounded",
    """
    SELECT n_name,
           CASE WHEN levenshtein(n_name, 'NATION_1') > 3 THEN -1
                ELSE levenshtein(n_name, 'NATION_1') END AS lev3
    FROM nation
    """,
    "function", "string", "bounded",
)
def fn_lev_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-bounded levenshtein (Spark 3.5 3-arg form: early-exits
    and returns -1 past the bound — O(k*n) instead of O(m*n), the form a
    fuzzy-match pipeline should use). Oracle emulates the contract with
    unbounded levenshtein + CASE."""
    (nation,) = _t(spark, sf_dir, "nation")
    return nation.select(
        "n_name",
        F.levenshtein("n_name", F.lit("NATION_1"), 3).alias("lev3"),
    )


@q(
    "fn_string_batch3",
    """
    SELECT 'xycyx' AS tr, '00042-ok' AS fs, '1234.56' AS tn, 'NULL' AS ttn,
           6 AS bc, 1 AS gb, 'B' AS ch, 65 AS asc_v, 'ababab' AS rp,
           '007' AS lp, '1234.50' AS tc, 'AB' AS uh
    """,
    "function", "string", "golden",
)
def fn_string_batch3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/format long tail golden-pinned: translate, format_string,
    to_number/try_to_number (NULL on malformed -> sentinel), bit_count,
    getbit, char, ascii, repeat, lpad, to_char, unhex — closing the last
    unexercised sigs of the reference's string block."""
    return spark.range(1).select(
        F.translate(F.lit("abcba"), "ab", "xy").alias("tr"),
        F.format_string("%05d-%s", F.lit(42), F.lit("ok")).alias("fs"),
        F.expr("to_number('1,234.56', '9,999.99')").cast("string").alias("tn"),
        F.coalesce(
            F.expr("try_to_number('bogus', '999')").cast("string"), F.lit("NULL")
        ).alias("ttn"),
        F.bit_count(F.lit(12345)).alias("bc"),
        F.expr("getbit(5, 0)").alias("gb"),
        F.expr("char(66)").alias("ch"),
        F.ascii(F.lit("A")).alias("asc_v"),
        F.repeat(F.lit("ab"), 3).alias("rp"),
        F.lpad(F.lit("7"), 3, "0").alias("lp"),
        F.expr("to_char(1234.5, '9999.99')").alias("tc"),
        F.expr("CAST(unhex('4142') AS STRING)").alias("uh"),
    )


@q(
    "fn_aes_golden",
    """
    SELECT 'Wx6puX+cj/3bVmaYV/jB4Q==' AS ct_ecb,
           'spark-graft' AS rt,
           CAST(count(*) AS BIGINT) AS n_ok
    FROM documents WHERE doc_id < 100
    """,
    "function", "crypto", "golden",
)
def fn_aes_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aes_encrypt / aes_decrypt (reference ExpressionMappings maps the
    CH backend's AES family): ECB mode is deterministic, so the
    ciphertext of a fixed (plaintext, key) pair is golden-pinned as a
    literal the oracle states back; GCM (the default) carries a random
    IV and is exercised through the decrypt(encrypt(x)) == x roundtrip
    counted over 100 fixture documents — n_ok certifies every document
    survived the round trip bit-for-bit."""
    (docs,) = _t(spark, sf_dir, "documents")
    key = "0123456789abcdef"
    ok = docs.filter(F.col("doc_id") < 100).filter(
        F.expr(
            f"CAST(aes_decrypt(aes_encrypt(text, '{key}', 'GCM'), "
            f"'{key}', 'GCM') AS STRING) = text"
        )
    )
    return ok.agg(
        F.expr(
            f"any_value(base64(aes_encrypt('spark-graft', '{key}', 'ECB')))"
        ).alias("ct_ecb"),
        F.expr(
            f"any_value(CAST(aes_decrypt(aes_encrypt('spark-graft', '{key}', "
            f"'ECB'), '{key}', 'ECB') AS STRING))"
        ).alias("rt"),
        F.count(F.lit(1)).alias("n_ok"),
    )


@q(
    "fn_validation_golden",
    """
    WITH luhn AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS s FROM orders
      WHERE o_orderkey < 5000
    ),
    scored AS (
      SELECT CAST(list_sum([
               CASE WHEN (length(s) - i) % 2 = 1 THEN
                 CASE WHEN 2 * CAST(s[i] AS INT) > 9
                      THEN 2 * CAST(s[i] AS INT) - 9
                      ELSE 2 * CAST(s[i] AS INT) END
               ELSE CAST(s[i] AS INT) END
               FOR i IN range(1, length(s) + 1)]) AS BIGINT) AS total
      FROM luhn
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM scored) AS n_keys,
      (SELECT CAST(count(*) FILTER (WHERE total % 10 = 0) AS BIGINT)
         FROM scored) AS n_luhn_valid,
      (SELECT CAST(count(*) FILTER (WHERE i < 128) AS BIGINT)
         FROM range(0, 256) t(i)) AS n_valid_1b,
      (SELECT CAST(count(*) FILTER (WHERE (a.i < 128 AND b.i < 128)
            OR (a.i BETWEEN 194 AND 223 AND b.i BETWEEN 128 AND 191))
            AS BIGINT)
         FROM range(0, 256) a(i), range(0, 256) b(i)) AS n_valid_2b,
      (SELECT CAST(count(*) AS BIGINT) FROM range(0, 256) t(i))
        AS n_fixed_chars,
      (SELECT CAST(count(*) FILTER (WHERE i < 128) AS BIGINT)
         FROM range(0, 256) t(i)) AS n_validated
    """,
    "function", "validation", "computed-oracle",
)
def fn_validation_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 validation scalar family with a COMPUTED cross-engine
    oracle (r6 verdict directive #3 — literal-echo goldens can only
    catch regressions, never initial-value errors):

    * luhn_check over every fixture orderkey < 5000 — the oracle
      re-derives the Luhn checksum in DuckDB list arithmetic (double
      every 2nd digit from the right, fold >9 to digit sum, mod 10);
    * is_valid_utf8 over ALL 256 single-byte and ALL 65536 two-byte
      sequences — the oracle computes validity straight from the UTF-8
      spec's byte-range arithmetic (ASCII < 0x80; two-byte lead
      0xC2-0xDF + continuation 0x80-0xBF; everything else — bare
      continuations, overlong 0xC0/0xC1, truncated multi-byte leads —
      invalid);
    * make_valid_utf8 maps every single byte to EXACTLY one char
      (valid byte -> itself, invalid byte -> one U+FFFD), counted via
      char_length; validate_utf8 passes all 128 valid ASCII bytes
      through non-NULL (guarded in a CASE branch so the raising path
      is never evaluated on invalid bytes)."""
    (orders,) = _t(spark, sf_dir, "orders")
    luhn_agg = (
        orders.filter(F.col("o_orderkey") < 5000)
        .select(F.col("o_orderkey").cast("string").alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.count_if(F.expr("luhn_check(s)")).alias("n_luhn_valid"),
        )
    )
    b1 = spark.range(256).select(
        F.col("id").alias("i"),
        F.expr("CAST(unhex(lpad(hex(id), 2, '0')) AS STRING)").alias("c"),
    )
    b1_agg = b1.agg(
        F.count_if(F.expr("is_valid_utf8(c)")).alias("n_valid_1b"),
        F.sum(F.expr("char_length(make_valid_utf8(c))"))
        .cast("bigint")
        .alias("n_fixed_chars"),
        F.count_if(
            F.expr("CASE WHEN i < 128 THEN validate_utf8(c) END IS NOT NULL")
        ).alias("n_validated"),
    )
    pairs = (
        spark.range(256)
        .select(F.col("id").alias("x"))
        .crossJoin(spark.range(256).select(F.col("id").alias("y")))
        .select(
            F.expr(
                "CAST(concat(unhex(lpad(hex(x), 2, '0')), "
                "unhex(lpad(hex(y), 2, '0'))) AS STRING)"
            ).alias("c")
        )
    )
    b2_agg = pairs.agg(
        F.count_if(F.expr("is_valid_utf8(c)")).alias("n_valid_2b")
    )
    return luhn_agg.crossJoin(b1_agg).crossJoin(b2_agg).select(
        "n_keys",
        "n_luhn_valid",
        "n_valid_1b",
        "n_valid_2b",
        "n_fixed_chars",
        "n_validated",
    )


@q(
    "fn_parity_gaps",
    """
    SELECT o_orderkey AS k,
           CAST(len(generate_series(1, 1 + o_orderkey % 5)) AS INT) AS n_arr,
           (nullif(o_orderpriority, '1-URGENT') IS NULL) AS is_n,
           (o_orderpriority = '1-URGENT') AS has_key,
           CASE WHEN o_orderkey < 0 THEN error('neg') ELSE 'ok' END AS ok,
           epoch_ms(o_orderkey * 100000) AS ts_ms,
           o_orderdate + (o_custkey % 50) * INTERVAL 1 HOUR AS ts_add,
           CAST(date_diff('second', o_orderdate,
                o_orderdate + (o_custkey % 50) * INTERVAL 1 HOUR) AS BIGINT)
             AS ts_diff,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS tr,
           CAST(date_diff('day', DATE '1970-01-01',
                          CAST(o_orderdate AS DATE)) AS INT) AS ud,
           CASE WHEN o_orderkey > 100 THEN NULL
                ELSE 9223372036854775707 + o_orderkey END AS t_add,
           CASE WHEN o_orderkey > 100 THEN NULL
                ELSE -9223372036854775708 - o_orderkey END AS t_sub,
           CASE WHEN o_orderkey >= 3 THEN NULL
                ELSE 4611686018427387903 * o_orderkey END AS t_mul,
           lower(o_orderpriority) AS lc,
           upper(o_orderstatus) AS uc,
           regexp_matches(o_orderpriority, '^[12]-') AS re_l
    FROM orders WHERE o_orderkey < 200
    """,
    "function", "parity", "computed-oracle",
)
def fn_parity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7 coverage-audit closure: the 13 function names from the
    reference's FunctionsValidateSuite corpus (backends-velox/.../
    functions/*.scala test names) that no registry entry exercised yet —
    array_size, isnull, map_contains_key, raise_error (guarded branch),
    timestamp_millis, timestampadd, timestampdiff, to_date, trunc,
    unix_date, try_add/try_subtract/try_multiply (overflow -> NULL at
    the exact 64-bit boundary, which the oracle recomputes with an
    explicit boundary predicate), plus the lcase/ucase/regexp_like
    aliases the same audit flagged.  Everything row-varying, everything
    computed independently by DuckDB."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") < 200).select(
        F.col("o_orderkey").alias("k"),
        F.array_size(F.sequence(F.lit(1), 1 + F.col("o_orderkey") % 5)).alias(
            "n_arr"
        ),
        F.isnull(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))).alias(
            "is_n"
        ),
        F.map_contains_key(
            F.create_map(F.col("o_orderpriority"), F.lit(1)), "1-URGENT"
        ).alias("has_key"),
        F.when(
            F.col("o_orderkey") < 0, F.raise_error(F.lit("neg"))
        )
        .otherwise(F.lit("ok"))
        .alias("ok"),
        F.timestamp_millis(F.col("o_orderkey") * 100000).alias("ts_ms"),
        F.timestamp_add("HOUR", F.col("o_custkey") % 50, F.col("o_orderdate")).alias(
            "ts_add"
        ),
        F.timestamp_diff(
            "SECOND",
            F.col("o_orderdate"),
            F.timestamp_add("HOUR", F.col("o_custkey") % 50, F.col("o_orderdate")),
        ).alias("ts_diff"),
        F.to_date(F.col("o_orderdate")).cast("string").alias("d"),
        F.trunc(F.to_date(F.col("o_orderdate")), "MM").cast("string").alias("tr"),
        F.unix_date(F.to_date(F.col("o_orderdate"))).alias("ud"),
        F.try_add(F.lit(9223372036854775707), F.col("o_orderkey")).alias("t_add"),
        F.try_subtract(F.lit(-9223372036854775708), F.col("o_orderkey")).alias(
            "t_sub"
        ),
        F.try_multiply(F.lit(4611686018427387903), F.col("o_orderkey")).alias(
            "t_mul"
        ),
        F.expr("lcase(o_orderpriority)").alias("lc"),
        F.expr("ucase(o_orderstatus)").alias("uc"),
        F.expr("regexp_like(o_orderpriority, '^[12]-')").alias("re_l"),
    )
