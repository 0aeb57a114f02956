"""Profile one registry entry: cProfile cumulative time, filtered to
this package — shows which protocol ops (writes, commits, collects) own
the wall time of a heavy entry.

Usage: python3 tools/profile_entry.py <name> [--sf DIR] [--top N]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    top = 40
    names = []
    it = iter(range(1, len(sys.argv)))
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--top":
            top = int(args[i + 1])
            i += 2
        else:
            names.append(a)
            i += 1
    if not names:
        print(__doc__)
        return 2

    from incubator_gluten_spark.plans import collect_all
    from incubator_gluten_spark.session import get_session

    all_q = collect_all()
    spark = get_session(app_name="profile-entry")
    for name in names:
        q = all_q[name]
        # warm once so JVM/codegen/footer caches don't pollute the profile
        q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        prof = cProfile.Profile()
        t0 = time.perf_counter()
        prof.enable()
        df = q.build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        prof.disable()
        wall = time.perf_counter() - t0
        print(f"=== {name}: {wall:.2f}s warm at {sf_dir}")
        st = pstats.Stats(prof)
        st.sort_stats("cumulative")
        # our package frames + the py4j boundary totals
        print("--- package frames (cumtime):")
        st.print_stats("incubator_gluten_spark", top)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
