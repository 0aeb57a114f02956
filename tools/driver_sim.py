"""Simulate the grading driver's t2 gate EXACTLY: a BARE SparkSession
(none of session.py's tuned confs) running __spark_entry__.queries()
against oracle_sql() with the strict pandas-canonical hash.

Why this exists: tools/check.py runs on the tuned session, but the
driver builds its own plain SparkSession — a query that silently depends
on a tuned conf (timezone, nanosAsLong, join strategy affecting a
nondeterministic LIMIT, ...) passes check.py and fails the driver.
catalog.ensure_runtime_confs is the seam that makes bare sessions work;
this script proves it for the graded window before each round ships.

Usage: python3 tools/driver_sim.py [N]   # default N=50 (the window)
       python3 tools/driver_sim.py 0     # all entries
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.dirname(os.path.abspath(__file__))
)  # for check.canon_hash


def main() -> int:
    n_front = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry_mod
    from check import canon_hash

    from incubator_gluten_spark.testing.compare import duckdb_connection

    sf_dir = "/root/testdata/sf0.01"
    con = duckdb_connection(sf_dir)
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    names = list(qs)[:n_front] if n_front else list(qs)
    n_fail = 0
    for name in names:
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {type(exc).__name__}: {str(exc)[:150]}")
            n_fail += 1
            continue
        if name not in osql:
            try:
                canon_hash(spdf)
                print(f"ok?  {name}: rows-only n={len(spdf)}")
            except Exception as exc:  # noqa: BLE001
                print(f"FAIL {name}: rows-only canon raised {exc}")
                n_fail += 1
            continue
        dpdf = con.sql(osql[name]).df()
        ok = (
            len(spdf) == len(dpdf)
            and sorted(spdf.columns) == sorted(dpdf.columns)
            and canon_hash(spdf) == canon_hash(dpdf)
        )
        if not ok:
            print(f"FAIL {name}: rows {len(spdf)}vs{len(dpdf)}")
            n_fail += 1
        else:
            print(f"PASS {name}: n={len(spdf)}")
    print(f"--- bare-session: {len(names)} checked, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
