"""Strict-hash differential checker — the driver's t2 protocol, locally.

Usage: python3 tools/check.py [name-prefix ...] [--sf /root/testdata/sf0.01]

Runs each registered query and its DuckDB oracle, compares row count,
column names, and a STRICT stringified value-hash (columns sorted by name,
rows sorted). This is deliberately stricter than tests/ (tolerance compare):
what passes here passes the driver.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def valhash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    norm = sorted(tuple(str(r[i]) for i in order) for r in rows)
    return hashlib.md5(str(norm).encode()).hexdigest()[:12]


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    args = []
    skip = False
    for i, a in enumerate(sys.argv[1:], start=1):
        if skip:
            skip = False
            continue
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
            skip = True
        elif not a.startswith("--"):
            args.append(a)

    from incubator_gluten_spark.plans import collect_all
    from incubator_gluten_spark.session import get_session
    from incubator_gluten_spark.testing.compare import duckdb_connection

    spark = get_session(app_name="check")
    con = duckdb_connection(sf_dir)
    all_q = collect_all()
    names = [
        n for n in sorted(all_q) if not args or any(n.startswith(p) for p in args)
    ]
    n_fail = 0
    for name in names:
        q = all_q[name]
        t0 = time.perf_counter()
        try:
            sdf = q.build(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if q.oracle is None:
            print(f"ok?  {name}: rows-only n={len(srows)} ({dt:.2f}s)")
            continue
        try:
            rel = con.sql(q.oracle)
            drows = rel.fetchall()
            dcols = list(rel.columns)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {exc}")
            n_fail += 1
            continue
        ok_n = len(srows) == len(drows)
        ok_c = sorted(sdf.columns) == sorted(dcols)
        ok_h = ok_c and valhash(srows, sdf.columns) == valhash(drows, dcols)
        if ok_n and ok_c and ok_h:
            print(f"PASS {name}: n={len(srows)} ({dt:.2f}s)")
        else:
            n_fail += 1
            print(
                f"FAIL {name}: rows {len(srows)}vs{len(drows)} "
                f"cols_ok={ok_c} hash_ok={ok_h}"
            )
            if ok_c and not ok_h:
                s2 = {tuple(str(x) for x in r) for r in srows}
                d2 = {tuple(str(x) for x in r) for r in drows}
                print("  spark-only:", sorted(s2 - d2)[:3])
                print("  duck-only :", sorted(d2 - s2)[:3])
            elif not ok_c:
                print(f"  spark cols: {sorted(sdf.columns)}")
                print(f"  duck  cols: {sorted(dcols)}")
    print(f"--- {len(names)} checked, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
