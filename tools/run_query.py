"""Run any registry query by name: result sample + timing + plan.

Usage: python3 tools/run_query.py <name> [--sf DIR] [--explain] [--oracle]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    explain = "--explain" in sys.argv
    show_oracle = "--oracle" in sys.argv
    names = []
    skip = False
    for i, a in enumerate(sys.argv[1:], start=1):
        if skip:
            skip = False
            continue
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
            skip = True
        elif not a.startswith("--"):
            names.append(a)
    if not names:
        print(__doc__)
        return 2

    from incubator_gluten_spark.plans import collect_all
    from incubator_gluten_spark.session import get_session

    all_q = collect_all()
    spark = get_session(app_name="run-query")
    for name in names:
        if name not in all_q:
            hits = [n for n in sorted(all_q) if name in n]
            print(f"unknown query '{name}'; close matches: {hits[:10]}")
            continue
        q = all_q[name]
        print(f"=== {name}  tags={list(q.tags or ())}")
        if q.build.__doc__:
            print(q.build.__doc__.strip())
        t0 = time.perf_counter()
        df = q.build(spark, sf_dir)
        df.show(10, truncate=False)
        print(f"[{time.perf_counter() - t0:.2f}s at {sf_dir}]")
        if explain:
            df.explain("formatted")
        if show_oracle and q.oracle:
            print("--- oracle SQL:\n" + q.oracle)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
