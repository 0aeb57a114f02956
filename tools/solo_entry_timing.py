"""Solo min-of-N timing for registry entries on a fresh session — the
same timed action as bench.py (build + noop sink). Used to decompose
in-suite inflation (positional/JVM accumulation) from real per-entry
cost: a solo warm number near the committed minimum on a drifted host
means the suite-position inflated the bench figure, not the code.

Usage: python3 solo_ab.py <name> [name...] [--sf DIR] [--runs N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = "/root/testdata/sf0.1"
runs = 3
names = []
i = 0
args = sys.argv[1:]
while i < len(args):
    if args[i] == "--sf":
        sf_dir = args[i + 1]
        i += 2
    elif args[i] == "--runs":
        runs = int(args[i + 1])
        i += 2
    else:
        names.append(args[i])
        i += 1

from incubator_gluten_spark.plans import collect_all  # noqa: E402
from incubator_gluten_spark.session import get_session  # noqa: E402

spark = get_session()
all_q = collect_all()
for name in names:
    q = all_q[name]
    times = []
    for r in range(runs):
        t0 = time.perf_counter()
        df = q.build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    print(
        f"{name}: first={times[0]:.3f} min={min(times):.3f} "
        f"all={[round(t, 3) for t in times]}",
        flush=True,
    )
