"""As-of and range joins as scalable DataFrame compositions.

Neither exists in Spark's join menu (DuckDB ships ASOF JOIN natively;
Flink has temporal joins). The naive encodings — a theta join on
``r.ts <= l.ts`` with a per-row argmax, or an interval cross join — are
quadratic in the worst case. These implementations are the shapes that
survive scale:

* as-of: union both sides, ONE shuffle on the key, per-key sort on time,
  carry the last observation forward with an IGNORE NULLS window —
  O(n log n) per key group, no join blowup at all.
* range: band each side by interval-sized buckets so candidates come from
  an equi-join on (bucket), turning the interval predicate into a verify
  filter — the same blocking idea the LSH dedup uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    strict: bool = True,
) -> DataFrame:
    """For every left row, the most recent right row with
    ``right.ts < left.ts`` (``<=`` when strict=False) sharing `key`.

    Returns the left rows plus ``asof_<value_col>`` / ``asof_ts``.
    Rows with no prior right row keep NULLs (left-outer semantics).

    Mechanics: tag right rows 0 and left rows 1, union, and run
    ``last(value, ignorenulls=True)`` over (key ORDER BY ts, tag) up to
    the previous row. The tag ordering puts a right row at the same
    timestamp BEFORE the left row, so `strict` only changes whether that
    equal-timestamp row is visible (frame end -1 excludes the current
    row; with strict=False the frame ends at 0 but tags order the left
    row after its contemporaries)."""
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.col(value_col).alias("__v"),
        F.lit(None).cast("long").alias("__rowid"),
    )
    l_cols = left.columns
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__v"].dataType).alias("__v"),
        F.monotonically_increasing_id().alias("__rowid"),
        *l_cols,
    )
    # right rows carry NULLs for the left payload columns
    unioned = l.unionByName(r, allowMissingColumns=True)
    end = -1 if strict else 0
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, end)
    )
    carried = unioned.select(
        "*",
        F.last("__v", ignorenulls=True).over(w).alias("__asof_v"),
        F.last(F.when(F.col("__tag") == 0, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias("__asof_ts"),
    )
    out = carried.filter(F.col("__tag") == 1).select(
        *l_cols,
        F.col("__asof_v").alias(f"asof_{value_col}"),
        F.col("__asof_ts").alias("asof_ts"),
    )
    return out


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    band_width: float,
) -> DataFrame:
    """Join rows to the intervals containing their value
    (``lo <= v < hi``) without a cross join: both sides are banded into
    ``band_width`` buckets — an interval spanning k buckets is exploded
    into k banded rows — so candidates come from an equi-join on the
    bucket id and the interval predicate is a cheap verify filter.

    Choose ``band_width`` near the typical interval width: each interval
    then lands in O(1) buckets and the join stays linear. (Spark's own
    optimizer has no range-join strategy; this is the standard manual
    banding used on Databricks' range-join hints.)"""
    v_bucket = F.floor(F.col(value_col) / band_width).cast("long")
    banded_left = left.withColumn("__b", v_bucket)
    lo_b = F.floor(F.col(lo_col) / band_width).cast("long")
    hi_b = F.floor((F.col(hi_col) - 1e-12) / band_width).cast("long")
    banded_iv = intervals.withColumn(
        "__b", F.explode(F.sequence(lo_b, F.greatest(hi_b, lo_b)))
    )
    return (
        banded_left.join(banded_iv, "__b")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("__b")
    )
