"""ClickBench-shaped analytics suite over the events fixture.

The reference ships three corpora: TPC-H 22, TPC-DS 103, ClickBench 43
(tools/gluten-it/common/src/main/resources/clickbench-queries/). ClickBench
is single-table web-analytics SQL — counts, distinct users, top-k entities,
time bucketing, string matching — which maps exactly onto the driver's
events table (event_id, ts, user_id, event_type, value, props). These
entries adapt the ClickBench query *shapes* to the available columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from incubator_gluten_spark.catalog import load_tables
from incubator_gluten_spark.plans import Q


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ("events",))["events"]


REGISTRY: list[Q] = []


def q(name: str, oracle: str | None, *tags: str):
    def deco(fn):
        REGISTRY.append(Q(name, fn, oracle, tags))
        return fn

    return deco


@q(
    "cb_counts",
    """
    SELECT count(*) AS n, count(DISTINCT user_id) AS users,
           count(DISTINCT event_type) AS types,
           round(avg(value), 4) AS avg_value
    FROM events
    """,
    "clickbench", "agg",
)
def cb_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q1-Q7 shape: whole-table counts and distincts."""
    ev = _ev(spark, sf_dir)
    return ev.agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("users"),
        F.countDistinct("event_type").alias("types"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


@q(
    "cb_topk_users",
    """
    SELECT user_id, count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY user_id
    ORDER BY n DESC, user_id LIMIT 10
    """,
    "clickbench", "topn",
)
def cb_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k heavy hitters (ClickBench Q13-Q17 shape)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(10)
    )


@q(
    "cb_type_breakdown",
    """
    SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS users,
           round(min(value), 4) AS lo, round(max(value), 4) AS hi
    FROM events GROUP BY event_type
    """,
    "clickbench", "agg",
)
def cb_type_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("users"),
        F.round(F.min("value"), 4).alias("lo"),
        F.round(F.max("value"), 4).alias("hi"),
    )


@q(
    "cb_daily_series",
    """
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, count(*) AS n,
           count(DISTINCT user_id) AS dau
    FROM events GROUP BY 1
    """,
    "clickbench", "timeseries",
)
def cb_daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily activity series (ClickBench time-bucket shape)."""
    ev = _ev(spark, sf_dir)
    return ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n"), F.countDistinct("user_id").alias("dau")
    )


@q(
    "cb_hour_histogram",
    """
    SELECT hour(CAST(ts AS TIMESTAMP)) AS h, count(*) AS n,
           round(sum(value), 2) AS total
    FROM events WHERE event_type = 'click' GROUP BY 1
    """,
    "clickbench", "timeseries",
)
def cb_hour_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    return (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.hour("ts").alias("h"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )


@q(
    "cb_user_funnel",
    """
    SELECT n_types, count(*) AS n_users FROM (
      SELECT user_id, count(DISTINCT event_type) AS n_types
      FROM events GROUP BY user_id
    ) GROUP BY n_types
    """,
    "clickbench", "agg",
)
def cb_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-user event-type breadth (funnel shape)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n_types"))
        .groupBy("n_types")
        .agg(F.count("*").alias("n_users"))
    )


@q(
    "cb_props_filter",
    """
    SELECT event_type, count(*) AS n
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) BETWEEN 40 AND 60
    GROUP BY event_type
    """,
    "clickbench", "json",
)
def cb_props_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured predicate (ClickBench URL/referer-match shape)."""
    ev = _ev(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.filter(k.between(40, 60))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


@q(
    "cb_sessionized_topk",
    """
    SELECT user_id, day, n FROM (
      SELECT user_id, day, n,
             row_number() OVER (PARTITION BY user_id ORDER BY n DESC, day) AS rn
      FROM (
        SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, count(*) AS n
        FROM events GROUP BY 1, 2
      )
    ) WHERE rn = 1 AND n >= 5
    """,
    "clickbench", "window",
)
def cb_sessionized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's busiest day (group-limit over a time-bucketed agg)."""
    ev = _ev(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("day"))
    return (
        daily.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("n") >= 5))
        .select("user_id", "day", "n")
    )


@q(
    "cb_value_deciles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.1), 4) AS p10,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90
    FROM events GROUP BY event_type
    """,
    "clickbench", "percentile",
)
def cb_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.1)), 4).alias("p10"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
    )


@q(
    "cb_retention",
    """
    SELECT count(*) AS retained FROM (
      SELECT user_id FROM events
      WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) < DATE '2024-01-15'
      INTERSECT
      SELECT user_id FROM events
      WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) >= DATE '2024-01-15'
    )
    """,
    "clickbench", "setop",
)
def cb_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users active in both halves of the month (retention shape)."""
    ev = _ev(spark, sf_dir)
    day = F.col("ts").cast("date")
    cut = F.lit("2024-01-15").cast("date")
    before = ev.filter(day < cut).select("user_id")
    after = ev.filter(day >= cut).select("user_id")
    return before.intersect(after).agg(F.count("*").alias("retained"))


@q(
    "cb_regex_buckets",
    """
    SELECT CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) % 10 AS bucket,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
    FROM events
    GROUP BY bucket
    """,
    "clickbench", "regex",
)
def cb_regex_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q28-ish shape (REGEXP extraction + group): pull the
    numeric prop out of the JSON string with a regex (the string path, not
    the JSON path — get_json_object is exercised elsewhere) and bucket it."""
    ev = _ev(spark, sf_dir)
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("bigint")
    return (
        ev.groupBy((k % 10).alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total"),
        )
    )


@q(
    "cb_user_breadth",
    """
    SELECT breadth, count(*) AS n_users FROM (
      SELECT user_id, count(DISTINCT event_type) AS breadth
      FROM events GROUP BY user_id
    ) GROUP BY breadth
    """,
    "clickbench", "distinct",
)
def cb_user_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench engagement-breadth shape: distinct event types per user,
    then a histogram over that — two chained aggregations where the second
    reuses the first's hash partitioning on user_id."""
    ev = _ev(spark, sf_dir)
    breadth = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("breadth")
    )
    return breadth.groupBy("breadth").agg(F.count("*").alias("n_users"))


@q(
    "cb_value_quantiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.9), 4)  AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
    "clickbench", "quantile",
)
def cb_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench latency-quantile shape: exact interpolated percentiles
    per group (Spark `percentile` == DuckDB `quantile_cont`, both linear
    interpolation on the sorted set). At 100 TB you'd switch to
    approx_percentile (t-digest) — exercised in agg_percentiles."""
    ev = _ev(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


@q(
    "cb_weekly_wow",
    """
    WITH weekly AS (
      SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk, count(*) AS n
      FROM events GROUP BY 1
    )
    SELECT wk, n,
           lag(n) OVER (ORDER BY wk) AS prev_n,
           round(CAST(n AS DOUBLE) / lag(n) OVER (ORDER BY wk) - 1, 4) AS wow
    FROM weekly
    """,
    "clickbench", "timeseries", "window",
)
def cb_weekly_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench time-series shape: weekly counts with week-over-week
    change via lag. The single-partition window is fine because the series
    is one row per week — pre-aggregation shrank the data first."""
    ev = _ev(spark, sf_dir)
    weekly = ev.groupBy(F.date_trunc("week", "ts").alias("wk")).agg(
        F.count("*").alias("n")
    )
    w = Window.orderBy("wk")
    prev = F.lag("n").over(w)
    return weekly.select(
        "wk",
        "n",
        prev.alias("prev_n"),
        F.round(F.col("n").cast("double") / prev - 1, 4).alias("wow"),
    )


@q(
    "cb_above_p90",
    """
    WITH th AS (
      SELECT event_type, quantile_cont(value, 0.9) AS p90
      FROM events GROUP BY event_type
    )
    SELECT e.event_type AS event_type, count(*) AS n_above,
           round(min(e.value), 4) AS min_above
    FROM events e JOIN th ON e.event_type = th.event_type
    WHERE e.value > th.p90
    GROUP BY e.event_type
    """,
    "clickbench", "quantile", "join",
)
def cb_above_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-count shape: events above their type's p90. The per-type
    thresholds are a tiny aggregate — broadcast back against the fact
    scan, so the only shuffle is the threshold agg itself."""
    ev = _ev(spark, sf_dir)
    th = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.9)).alias("p90")
    )
    e = ev.alias("e")
    t = F.broadcast(th.alias("t"))
    return (
        e.join(t, F.col("e.event_type") == F.col("t.event_type"))
        .filter(F.col("e.value") > F.col("t.p90"))
        .groupBy(F.col("e.event_type").alias("event_type"))
        .agg(
            F.count("*").alias("n_above"),
            F.round(F.min("e.value"), 4).alias("min_above"),
        )
    )


@q(
    "cb_collect_limit_sorted",
    """
    SELECT event_id, user_id, event_type FROM events
    ORDER BY ts DESC, event_id LIMIT 25
    """,
    "clickbench", "topn",
)
def cb_collect_limit_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q34-ish shape: latest-N raw rows (TakeOrderedAndProject —
    per-partition top-25 then a single merge, never a global sort)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.orderBy(F.desc("ts"), F.asc("event_id"))
        .select("event_id", "user_id", "event_type")
        .limit(25)
    )


@q(
    "cb_type_hour_matrix",
    """
    SELECT event_type, hour(ts) AS hr, count(*) AS n,
           round(CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER (PARTITION BY event_type), 6) AS share
    FROM events GROUP BY event_type, hr
    """,
    "clickbench", "matrix", "window",
)
def cb_type_hour_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type x hour activity matrix with within-type share — aggregate
    first (5 types x 24 hours), window over the tiny result."""
    ev = _ev(spark, sf_dir)
    agg = ev.groupBy("event_type", F.hour("ts").alias("hr")).agg(
        F.count("*").alias("n")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type")
    return agg.select(
        "event_type",
        "hr",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(w), 6).alias("share"),
    )


@q(
    "cb_like_topk",
    """
    SELECT event_type, count(*) AS n
    FROM events WHERE props LIKE '%"k": 4%'
    GROUP BY event_type ORDER BY n DESC, event_type LIMIT 3
    """,
    "clickbench", "like",
)
def cb_like_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench Q20-ish: leading-wildcard LIKE over the raw string (no
    pushdown possible — a full-scan substring match, the case where a
    columnar engine's SIMD substring search is the whole game)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.filter(F.col("props").like('%"k": 4%'))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"))
        .limit(3)
    )


@q(
    "cb_user_span",
    """
    SELECT span_days, count(*) AS n_users FROM (
      SELECT user_id,
             date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) AS span_days
      FROM events GROUP BY user_id
    ) GROUP BY span_days
    """,
    "clickbench", "agg", "timeseries",
)
def cb_user_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-span histogram: min/max timestamp per user in ONE
    aggregation, then the day-span distribution."""
    ev = _ev(spark, sf_dir)
    span = ev.groupBy("user_id").agg(
        F.datediff(F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))).alias(
            "span_days"
        )
    )
    return span.groupBy("span_days").agg(F.count("*").alias("n_users"))


@q(
    "cb_first_event_type",
    """
    SELECT first_type, count(*) AS n_users FROM (
      SELECT user_id, min_by(event_type, ts) AS first_type
      FROM events GROUP BY user_id
    ) GROUP BY first_type
    """,
    "clickbench", "minby",
)
def cb_first_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's FIRST event type (min_by on ts, which is per-user unique — (user_id, ts) is unique in the fixture), then the
    distribution."""
    ev = _ev(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        F.min_by("event_type", "ts").alias("first_type")
    )
    return first.groupBy("first_type").agg(F.count("*").alias("n_users"))


@q(
    "cb_event_gap_stats",
    """
    SELECT user_id,
           count(*) AS n_gaps,
           round(avg(gap_s), 2) AS mean_gap_s
    FROM (
      SELECT user_id,
             date_diff('second',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) AS gap_s
      FROM events
    ) WHERE gap_s IS NOT NULL
    GROUP BY user_id
    HAVING count(*) >= 50 AND avg(gap_s) < 42000
    """,
    "clickbench", "window", "timeseries",
)
def cb_event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap statistics per user (lag over the per-user ordered
    stream — the sessionization primitive). Gap seconds are integers, so
    avg is engine-exact."""
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.unix_timestamp(F.col("ts").cast("timestamp"))
            - F.unix_timestamp(F.lag("ts").over(w).cast("timestamp"))
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(F.count("*").alias("n_gaps"), F.round(F.avg("gap_s"), 2).alias("mean_gap_s"))
        .filter((F.col("n_gaps") >= 50) & (F.col("mean_gap_s") < 42000))
    )


@q(
    "cb_gap_sessions",
    """
    WITH gapped AS (
      SELECT user_id, ts,
             CASE WHEN date_diff('second',
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    ts) > 1800
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ), sessions AS (
      SELECT user_id,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gapped
    )
    SELECT n_events_in_session, count(*) AS n_sessions FROM (
      SELECT user_id, session_id, count(*) AS n_events_in_session
      FROM sessions GROUP BY user_id, session_id
    ) GROUP BY n_events_in_session
    """,
    "clickbench", "sessionization", "gaps-islands",
)
def cb_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True gap-based sessionization in batch (gaps-and-islands): a
    session starts after >30 min of silence; session ids are the running
    sum of start flags — the batch twin of the streaming session_window
    (stream_session). Output: session-size histogram."""
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap_s = F.unix_timestamp(F.col("ts").cast("timestamp")) - F.unix_timestamp(
        prev.cast("timestamp")
    )
    gapped = ev.select(
        "user_id",
        "ts",
        F.when(prev.isNull() | (gap_s > 1800), 1).otherwise(0).alias("is_start"),
    )
    wrun = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = gapped.select(
        "user_id", F.sum("is_start").over(wrun).alias("session_id")
    )
    sizes = sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events_in_session")
    )
    return sizes.groupBy("n_events_in_session").agg(F.count("*").alias("n_sessions"))


@q(
    "cb_peak_minutes",
    """
    SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
           count(*) AS n
    FROM events GROUP BY 1
    ORDER BY n DESC, minute LIMIT 5
    """,
    "clickbench", "timeseries", "topn",
)
def cb_peak_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Busiest minutes (fine-grained time bucket + global top-5 — the
    traffic-spike hunt; TakeOrderedAndProject over the bucket agg)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.date_trunc("minute", "ts").alias("minute"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("minute"))
        .limit(5)
    )


@q(
    "cb_value_histogram",
    """
    SELECT CAST(floor(value / 5) AS BIGINT) AS bin, count(*) AS n,
           round(min(value), 4) AS lo, round(max(value), 4) AS hi
    FROM events GROUP BY bin
    """,
    "clickbench", "histogram",
)
def cb_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (floor-division binning — the
    exact-bin complement of the adaptive histogram_numeric sketch)."""
    ev = _ev(spark, sf_dir)
    return ev.groupBy(
        F.floor(F.col("value") / 5).cast("bigint").alias("bin")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 4).alias("lo"),
        F.round(F.max("value"), 4).alias("hi"),
    )


@q(
    "cb_pair_distinct",
    """
    SELECT count(DISTINCT (user_id, event_type)) AS active_pairs,
           count(DISTINCT (user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS user_days
    FROM events
    """,
    "clickbench", "distinct",
)
def cb_pair_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column distinct counts (ClickBench UNIQ-by-tuple shape):
    distinct (user, type) pairs and (user, day) activity cells in one
    aggregate — each compiles to a distinct-shuffle on the struct key."""
    ev = _ev(spark, sf_dir)
    return ev.agg(
        F.countDistinct("user_id", "event_type").alias("active_pairs"),
        F.countDistinct(
            F.col("user_id"), F.col("ts").cast("date")
        ).alias("user_days"),
    )


@q(
    "cb_position_analytics",
    """
    SELECT pos_bucket, count(*) AS n,
           round(CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS purchase_rate
    FROM (
      SELECT event_type,
             CASE WHEN rn = 1 THEN 'first'
                  WHEN rn <= 5 THEN 'early'
                  ELSE 'late' END AS pos_bucket
      FROM (
        SELECT event_type,
               row_number() OVER (
                 PARTITION BY user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE)
                 ORDER BY ts, event_id) AS rn
        FROM events
      )
    ) GROUP BY pos_bucket
    """,
    "clickbench", "position", "window",
)
def cb_position_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-in-session analytics: how purchase propensity shifts from
    the first event of a user-day to later ones — row_number within
    (user, day), bucketed, then a rate per bucket."""
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id", F.col("ts").cast("date")).orderBy(
        "ts", "event_id"
    )
    bucketed = ev.select(
        "event_type",
        F.when(F.row_number().over(w) == 1, "first")
        .when(F.row_number().over(w) <= 5, "early")
        .otherwise("late")
        .alias("pos_bucket"),
    )
    return bucketed.groupBy("pos_bucket").agg(
        F.count("*").alias("n"),
        F.round(
            F.count_if(F.col("event_type") == "purchase").cast("double")
            / F.count("*"),
            6,
        ).alias("purchase_rate"),
    )


@q(
    "cb_funnel_ordered",
    """
    SELECT count(*) AS converting_user_days FROM (
      SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      FROM events
      GROUP BY user_id, day
      HAVING min(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL
         AND min(CASE WHEN event_type = 'click' THEN ts END)
             > min(CASE WHEN event_type = 'view' THEN ts END)
         AND min(CASE WHEN event_type = 'purchase' THEN ts END)
             > min(CASE WHEN event_type = 'click' THEN ts END)
    )
    """,
    "clickbench", "funnel", "sequence",
)
def cb_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel (view -> click -> purchase within a
    user-day, each stage's FIRST occurrence after the previous stage's):
    the sequence-match analytics shape, computed with conditional min
    timestamps in one aggregation — no self-joins per stage."""
    ev = _ev(spark, sf_dir)
    first_of = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))
    per_day = ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        first_of("view").alias("v"),
        first_of("click").alias("c"),
        first_of("purchase").alias("p"),
    )
    return per_day.filter(
        F.col("v").isNotNull() & (F.col("c") > F.col("v")) & (F.col("p") > F.col("c"))
    ).agg(F.count("*").alias("converting_user_days"))


@q(
    "cb_gapfill_spine",
    """
    WITH sparse AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, count(*) AS n
      FROM events WHERE event_id % 97 = 0 GROUP BY 1
    ), bounds AS (
      SELECT min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS lo,
             max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS hi
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM bounds
    )
    SELECT count(*) AS n_days,
           count(CASE WHEN coalesce(n, 0) = 0 THEN 1 END) AS n_gap_days,
           CAST(sum(coalesce(n, 0)) AS BIGINT) AS total
    FROM spine LEFT JOIN sparse USING (day)
    """,
    "clickbench", "gapfill", "spine",
)
def cb_gapfill_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap filling: generate the full date range with
    sequence+explode, left-join the sparse series, and count the filled
    gaps — the reporting primitive that keeps time series dense (a ROWS
    window over a gappy series silently spans holes; the spine makes them
    explicit zeros)."""
    ev = _ev(spark, sf_dir)
    sparse = (
        ev.filter(F.col("event_id") % 97 == 0)
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    joined = spine.join(sparse, "day", "left")
    return joined.agg(
        F.count("*").alias("n_days"),
        F.count_if(F.coalesce("n", F.lit(0)) == 0).alias("n_gap_days"),
        F.sum(F.coalesce("n", F.lit(0))).alias("total"),
    )


# ---------------------------------------------------------------- round 4:
# ClickBench URL / UserAgent / regex-extraction shapes (clickbench q20-28
# URL family, q9-10 ad/mobile breakdowns, q28 heavy-hitter extraction).
# The fixture has no URL or UA columns, so both engines SYNTHESIZE them
# deterministically from the same columns — the string kernels under test
# (regexp_extract, split, classify-by-LIKE) then run on identical inputs.

_URL_SQL = (
    "'https://' || CASE WHEN user_id % 3 = 0 THEN 'shop.example.com' "
    "WHEN user_id % 3 = 1 THEN 'blog.example.org' ELSE 'docs.example.net' END "
    "|| '/' || event_type || '/p' || CAST(event_id % 50 AS VARCHAR) "
    "|| CASE WHEN event_id % 4 = 0 THEN '?ref=search&cmp=' || CAST(user_id % 5 AS VARCHAR) "
    "WHEN event_id % 4 = 1 THEN '?ref=social' ELSE '' END"
)

_UA_SQL = (
    "CASE WHEN user_id % 5 = 0 THEN 'Mozilla/5.0 (iPhone; CPU iPhone OS 17_0) Mobile Safari/604.1' "
    "WHEN user_id % 5 = 1 THEN 'Mozilla/5.0 (Linux; Android 14) Chrome/120.0 Mobile' "
    "WHEN user_id % 5 = 2 THEN 'Mozilla/5.0 (Windows NT 10.0) Chrome/120.0' "
    "WHEN user_id % 5 = 3 THEN 'Mozilla/5.0 (Macintosh) Safari/605.1' "
    "ELSE 'curl/8.4.0' END"
)


def _url_col() -> F.Column:
    host = (
        F.when(F.col("user_id") % 3 == 0, "shop.example.com")
        .when(F.col("user_id") % 3 == 1, "blog.example.org")
        .otherwise("docs.example.net")
    )
    query = (
        F.when(
            F.col("event_id") % 4 == 0,
            F.concat(F.lit("?ref=search&cmp="), (F.col("user_id") % 5).cast("string")),
        )
        .when(F.col("event_id") % 4 == 1, F.lit("?ref=social"))
        .otherwise(F.lit(""))
    )
    return F.concat(
        F.lit("https://"),
        host,
        F.lit("/"),
        F.col("event_type"),
        F.lit("/p"),
        (F.col("event_id") % 50).cast("string"),
        query,
    )


def _ua_col() -> F.Column:
    return (
        F.when(
            F.col("user_id") % 5 == 0,
            "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0) Mobile Safari/604.1",
        )
        .when(
            F.col("user_id") % 5 == 1,
            "Mozilla/5.0 (Linux; Android 14) Chrome/120.0 Mobile",
        )
        .when(F.col("user_id") % 5 == 2, "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0")
        .when(F.col("user_id") % 5 == 3, "Mozilla/5.0 (Macintosh) Safari/605.1")
        .otherwise("curl/8.4.0")
    )


@q(
    "cb_url_host_topk",
    f"""
    SELECT host, count(*) AS n, count(DISTINCT user_id) AS users
    FROM (SELECT user_id, regexp_extract({_URL_SQL}, 'https://([^/]+)/', 1) AS host
          FROM events)
    GROUP BY host ORDER BY n DESC, host LIMIT 10
    """,
    "clickbench", "url", "regex",
)
def cb_url_host_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench URL-family shape: extract the host with one regex and
    rank hosts by hits + unique users (q21-style heavy hitters)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.select(
            "user_id",
            F.regexp_extract(_url_col(), r"https://([^/]+)/", 1).alias("host"),
        )
        .groupBy("host")
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("users"))
        .orderBy(F.desc("n"), "host")
        .limit(10)
    )


@q(
    "cb_url_path_depth",
    f"""
    SELECT depth, count(*) AS n FROM (
      SELECT len(string_split(
        regexp_replace(regexp_extract({_URL_SQL}, 'https://[^/]+(/[^?]*)', 1),
                       '^/', ''), '/')) AS depth
      FROM events
    ) GROUP BY depth
    """,
    "clickbench", "url",
)
def cb_url_path_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL path-depth histogram: extract the path, strip the leading
    slash, count segments (q22-style URL structure breakdown)."""
    ev = _ev(spark, sf_dir)
    path = F.regexp_extract(_url_col(), r"https://[^/]+(/[^?]*)", 1)
    return (
        ev.select(
            F.size(F.split(F.regexp_replace(path, r"^/", ""), "/")).alias("depth")
        )
        .groupBy("depth")
        .agg(F.count("*").alias("n"))
    )


@q(
    "cb_query_param_extract",
    f"""
    SELECT ref, cmp, count(*) AS n FROM (
      SELECT coalesce(nullif(regexp_extract({_URL_SQL}, 'ref=([a-z]+)', 1), ''), 'none') AS ref,
             coalesce(nullif(regexp_extract({_URL_SQL}, 'cmp=([0-9]+)', 1), ''), '-') AS cmp
      FROM events
    ) GROUP BY ref, cmp
    """,
    "clickbench", "url", "regex",
)
def cb_query_param_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-parameter extraction (utm-style attribution): pull ref= and
    cmp= values out of the query string with anchored regexes, count every
    (ref, campaign) combination."""
    ev = _ev(spark, sf_dir)
    url = _url_col()
    ref = F.coalesce(
        F.nullif(F.regexp_extract(url, r"ref=([a-z]+)", 1), F.lit("")), F.lit("none")
    )
    cmp_ = F.coalesce(
        F.nullif(F.regexp_extract(url, r"cmp=([0-9]+)", 1), F.lit("")), F.lit("-")
    )
    return (
        ev.select(ref.alias("ref"), cmp_.alias("cmp"))
        .groupBy("ref", "cmp")
        .agg(F.count("*").alias("n"))
    )


@q(
    "cb_url_normalize_distinct",
    f"""
    SELECT count(DISTINCT url) AS n_raw,
           count(DISTINCT regexp_replace(url, '[?#].*$', '')) AS n_norm
    FROM (SELECT {_URL_SQL} AS url FROM events)
    """,
    "clickbench", "url",
)
def cb_url_normalize_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL normalization dedup: distinct URLs before vs after stripping
    query/fragment — the canonical-URL cardinality drop a crawler dedup
    pass measures."""
    ev = _ev(spark, sf_dir)
    url = _url_col()
    return ev.select(url.alias("url")).agg(
        F.countDistinct("url").alias("n_raw"),
        F.countDistinct(F.regexp_replace("url", r"[?#].*$", "")).alias("n_norm"),
    )


@q(
    "cb_ua_breakdown",
    f"""
    SELECT browser, is_mobile, count(*) AS n,
           count(DISTINCT user_id) AS users
    FROM (
      SELECT user_id,
             CASE WHEN {_UA_SQL} LIKE '%Chrome%' THEN 'Chrome'
                  WHEN {_UA_SQL} LIKE '%Safari%' THEN 'Safari'
                  ELSE 'other' END AS browser,
             ({_UA_SQL} LIKE '%Mobile%') AS is_mobile
      FROM events
    ) GROUP BY browser, is_mobile
    """,
    "clickbench", "useragent",
)
def cb_ua_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UserAgent breakdown (ClickBench q9/q10 family): classify browser by
    LIKE chain (Chrome before Safari — every Chrome UA contains Safari)
    and split by mobile flag."""
    ev = _ev(spark, sf_dir)
    ua = _ua_col()
    browser = (
        F.when(ua.like("%Chrome%"), "Chrome")
        .when(ua.like("%Safari%"), "Safari")
        .otherwise("other")
    )
    return (
        ev.select(
            "user_id", browser.alias("browser"), ua.like("%Mobile%").alias("is_mobile")
        )
        .groupBy("browser", "is_mobile")
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("users"))
    )


@q(
    "cb_mobile_share_hourly",
    f"""
    SELECT hour(CAST(ts AS TIMESTAMP)) AS hr,
           count(*) AS n,
           round(avg(CASE WHEN {_UA_SQL} LIKE '%Mobile%' THEN 1.0 ELSE 0.0 END), 4)
             AS mobile_share
    FROM events GROUP BY hr
    """,
    "clickbench", "useragent", "time-bucket",
)
def cb_mobile_share_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mobile traffic share per hour-of-day — the conditional-average
    time profile (ClickBench mobile-breakdown family)."""
    ev = _ev(spark, sf_dir)
    is_mobile = _ua_col().like("%Mobile%")
    return (
        ev.groupBy(F.hour("ts").alias("hr"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.when(is_mobile, 1.0).otherwise(0.0)), 4).alias(
                "mobile_share"
            ),
        )
    )


@q(
    "cb_word_heavy_hitters",
    r"""
    SELECT w, count(*) AS n FROM (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]{4,}')) AS w
      FROM documents
    ) GROUP BY w ORDER BY n DESC, w LIMIT 20
    """,
    "clickbench", "regex", "heavy-hitters",
)
def cb_word_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench q28-style heavy-hitter extraction: regex-tokenize every
    document (words of 4+ letters), explode, count, top-20 — the
    extract-explode-count pattern that dominates log analytics. Partial
    aggregation bounds the shuffle to the vocabulary, not the corpus."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        docs.select(
            F.explode(
                F.expr(r"regexp_extract_all(lower(text), '[a-z]{4,}', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(20)
    )


@q(
    "cb_referrer_classify",
    f"""
    SELECT chan, count(*) AS n, round(sum(value), 2) AS total
    FROM (
      SELECT CASE WHEN {_URL_SQL} LIKE '%ref=search%' THEN 'search'
                  WHEN {_URL_SQL} LIKE '%ref=social%' THEN 'social'
                  ELSE 'direct' END AS chan,
             value
      FROM events
    ) GROUP BY chan
    """,
    "clickbench", "url", "classify",
)
def cb_referrer_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referrer-channel classification by LIKE chain (search / social /
    direct) with per-channel volume and value."""
    ev = _ev(spark, sf_dir)
    url = _url_col()
    chan = (
        F.when(url.like("%ref=search%"), "search")
        .when(url.like("%ref=social%"), "social")
        .otherwise("direct")
    )
    return (
        ev.select(chan.alias("chan"), "value")
        .groupBy("chan")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )


@q(
    "cb_ip_octet_buckets",
    """
    SELECT octet1, count(*) AS n, count(DISTINCT user_id) AS users
    FROM (
      SELECT user_id,
             CAST(string_split('10.' || CAST(user_id % 256 AS VARCHAR) || '.'
                  || CAST(event_id % 256 AS VARCHAR) || '.'
                  || CAST((user_id + event_id) % 256 AS VARCHAR), '.')[2] AS INT)
               AS octet1
      FROM events
    ) GROUP BY octet1 HAVING count(*) >= 40
    """,
    "clickbench", "ip", "string",
)
def cb_ip_octet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench IP-grouping shape: synthesize a dotted-quad per event,
    split out the second octet, bucket traffic by it (the /16 subnet
    rollup a DDoS dashboard runs)."""
    ev = _ev(spark, sf_dir)
    ip = F.concat(
        F.lit("10."),
        (F.col("user_id") % 256).cast("string"),
        F.lit("."),
        (F.col("event_id") % 256).cast("string"),
        F.lit("."),
        ((F.col("user_id") + F.col("event_id")) % 256).cast("string"),
    )
    return (
        ev.select(
            "user_id",
            F.split(ip, r"\.").getItem(1).cast("int").alias("octet1"),
        )
        .groupBy("octet1")
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("users"))
        .filter(F.col("n") >= 40)
    )


@q(
    "cb_phrase_match_rate",
    r"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(count(CASE WHEN regexp_matches(text, '(spark|query|data)\s+\w+') THEN 1 END)
                AS BIGINT) AS n_match,
           round(count(CASE WHEN regexp_matches(text, '(spark|query|data)\s+\w+') THEN 1 END)
                 * 1.0 / count(*), 4) AS match_rate
    FROM documents GROUP BY lang
    """,
    "clickbench", "regex",
)
def cb_phrase_match_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-alternation phrase match rate per language — the
    LIKE-escalated-to-regex shape (ClickBench q19-20 string matching)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    hit = F.col("text").rlike(r"(spark|query|data)\s+\w+")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count_if(hit).cast("bigint").alias("n_match"),
        F.round(F.count_if(hit) * 1.0 / F.count("*"), 4).alias("match_rate"),
    )


@q(
    "cb_url_product_topk_per_host",
    f"""
    SELECT host, product, n FROM (
      SELECT host, product, n,
             row_number() OVER (PARTITION BY host ORDER BY n DESC, product) AS rn
      FROM (
        SELECT regexp_extract({_URL_SQL}, 'https://([^/]+)/', 1) AS host,
               regexp_extract({_URL_SQL}, '/p([0-9]+)', 1) AS product,
               count(*) AS n
        FROM events GROUP BY 1, 2
      )
    ) WHERE rn <= 3
    """,
    "clickbench", "url", "window",
)
def cb_url_product_topk_per_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top products per host: two regex extractions feeding a grouped
    count and a per-host WindowGroupLimit top-3 (rank pushed to
    per-partition top-k, no global sort)."""
    ev = _ev(spark, sf_dir)
    url = _url_col()
    agg = (
        ev.select(
            F.regexp_extract(url, r"https://([^/]+)/", 1).alias("host"),
            F.regexp_extract(url, r"/p([0-9]+)", 1).alias("product"),
        )
        .groupBy("host", "product")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("host").orderBy(F.desc("n"), "product")
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("host", "product", "n")
    )


@q(
    "cb_latest_wide_rows",
    """
    SELECT event_id, user_id, event_type, round(value, 4) AS value
    FROM events ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id LIMIT 10
    """,
    "clickbench", "topn", "wide-row",
)
def cb_latest_wide_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench q23-style 'latest N full rows': full-width
    TakeOrderedAndProject on the time axis — per-partition top-N merged
    on the driver, never a global sort."""
    ev = _ev(spark, sf_dir)
    return (
        ev.select("event_id", "user_id", "event_type", F.round("value", 4).alias("value"), "ts")
        .orderBy(F.desc("ts"), "event_id")
        .limit(10)
        .drop("ts")
    )


@q(
    "cb_url_length_stats",
    f"""
    SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           count(*) AS n,
           round(avg(length(url)), 4) AS avg_len,
           max(length(url)) AS max_len,
           min(length(url)) AS min_len
    FROM (SELECT {_URL_SQL} AS url FROM events)
    GROUP BY host
    """,
    "clickbench", "url", "string-stats",
)
def cb_url_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench q26-27 shape: URL length statistics per host (the
    string-length scan that exposes row-store vs column-store string
    handling)."""
    ev = _ev(spark, sf_dir)
    url = _url_col()
    return (
        ev.select(url.alias("url"))
        .groupBy(F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.length("url")), 4).alias("avg_len"),
            F.max(F.length("url")).alias("max_len"),
            F.min(F.length("url")).alias("min_len"),
        )
    )


@q(
    "cb_covisit_pairs",
    """
    SELECT t1, t2, count(*) AS n_users FROM (
      SELECT DISTINCT a.user_id, a.event_type AS t1, b.event_type AS t2
      FROM events a JOIN events b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
    ) GROUP BY t1, t2 ORDER BY n_users DESC, t1, t2 LIMIT 10
    """,
    "clickbench", "covisitation", "self-join",
)
def cb_covisit_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-visitation matrix (ClickBench URL-pair shape): event-type pairs
    sharing a user, ranked — the self-join runs on per-user DISTINCT
    types (5 rows/user), never raw events x events."""
    ev = _ev(spark, sf_dir)
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.alias("a")
    b = ut.select(
        F.col("user_id").alias("u2"), F.col("event_type").alias("t2")
    ).alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("u2"))
            & (F.col("a.event_type") < F.col("t2")),
        )
        .select(F.col("a.event_type").alias("t1"), "t2")
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.desc("n_users"), "t1", "t2")
        .limit(10)
    )


@q(
    "cb_paged_aggregate",
    """
    SELECT user_id, n, total FROM (
      SELECT user_id, count(*) AS n,
             CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
      FROM events GROUP BY user_id
    ) ORDER BY total DESC, user_id LIMIT 20 OFFSET 40
    """,
    "clickbench", "pagination",
)
def cb_paged_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickBench q39-43 pagination shape: page 3 of a ranked aggregate
    (LIMIT+OFFSET over a total order with a unique tiebreaker)."""
    ev = _ev(spark, sf_dir)
    agg = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total"),
    )
    return (
        agg.orderBy(F.desc("total"), "user_id")
        .offset(40)
        .limit(20)
    )
