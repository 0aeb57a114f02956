"""DuckDB differential harness — local mirror of the driver's t2 gate.

The reference's correctness strategy is differential: rerun Spark's own SQL
corpus + TPC-H golden outputs under the plugin and diff against vanilla
Spark (SURVEY §5; WholeStageTransformerSuite.compareResultStr:103). Ours is
the same shape with DuckDB as the oracle: run the Spark DataFrame and the
ANSI-SQL twin on identical parquet inputs, then compare row count, column
names, and order-insensitive values (floats within tolerance — the declared
queries round their float outputs anyway so the driver's value-hash is
stable).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from incubator_gluten_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Views registered exactly like the driver: raw parquet, no casts."""
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries round their float outputs; this guards residual 1-ulp noise
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _nonfloat_key(row):
    """Sort key over the non-float cells only — engine-stable, since floats
    are the only cells that can legitimately differ within tolerance."""
    return tuple(
        (x is None, str(type(x)), str(x))
        for x in row
        if not isinstance(x, float)
    )


def _sort_key(row):
    return (_nonfloat_key(row), tuple(str(x) for x in row))


def canonical(rows, colnames):
    """Column-name-sorted, row-sorted, cell-normalized table."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return sorted(colnames), out


def compare_frames(spark_df, con, sql: str, float_tol: float = 1e-6) -> None:
    """Assert the Spark result and the DuckDB oracle result match."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = con.sql(sql)
    d_rows = [tuple(r) for r in rel.fetchall()]
    d_cols = list(rel.columns)

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sc, s_canon = canonical(s_rows, s_cols)
    dc, d_canon = canonical(d_rows, d_cols)
    mismatches = []
    i = 0
    while i < len(s_canon):
        sr, dr = s_canon[i], d_canon[i]
        if sr == dr or _rows_close(sr, dr, float_tol):
            i += 1
            continue
        # rows with equal non-float keys may be ordered differently by
        # their float cells on the two sides: tolerantly match within the
        # contiguous group sharing this non-float key
        key = _nonfloat_key(sr)
        j = i
        while j < len(s_canon) and _nonfloat_key(s_canon[j]) == key:
            j += 1
        group_s = list(s_canon[i:j])
        group_d = list(d_canon[i:j])
        for srow in group_s:
            hit = next(
                (k for k, drow in enumerate(group_d) if _rows_close(srow, drow, float_tol)),
                None,
            )
            if hit is None:
                mismatches.append((i, srow, group_d[:1]))
            else:
                group_d.pop(hit)
            if len(mismatches) >= 5:
                break
        i = j
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"value mismatches (cols={sc}): {mismatches[:5]}"


def _rows_close(a, b, tol) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if isinstance(x, float) and isinstance(y, float):
            if math.isclose(x, y, rel_tol=tol, abs_tol=tol):
                continue
        if isinstance(x, tuple) and isinstance(y, tuple) and _rows_close(x, y, tol):
            continue
        return False
    return True
