"""Reproduce the suite-position inflation: time a CPU-bound entry warm,
run N other entries the way bench.py does, re-time it, and dump session
state (persistent RDDs, JVM memory, GC time) at each checkpoint.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_gluten_spark.plans import collect_all  # noqa: E402
from incubator_gluten_spark.session import get_session  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = get_session()
sc = spark.sparkContext
all_q = collect_all()


def jvm_state(tag):
    rt = sc._jvm.java.lang.Runtime.getRuntime()
    used = (rt.totalMemory() - rt.freeMemory()) / 1e9
    total = rt.totalMemory() / 1e9
    n_rdd = sc._jsc.sc().getPersistentRDDs().size()
    # total GC time across collectors
    beans = sc._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    gc_ms = sum(beans.get(i).getCollectionTime() for i in range(beans.size()))
    print(f"[{tag}] heap_used={used:.2f}g/{total:.2f}g persistent_rdds={n_rdd} gc_total_s={gc_ms/1000:.1f}", flush=True)


def run(name):
    q = all_q[name]
    t0 = time.perf_counter()
    q.build(spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def time3(name):
    ts = [run(name) for _ in range(3)]
    print(f"{name}: {[round(t,3) for t in ts]} min={min(ts):.3f}", flush=True)
    return min(ts)


probe = "dp_dedup_simhash"
jvm_state("fresh")
base = time3(probe)
jvm_state("after_probe_warm")

# run a slice of the suite the way bench does (single pass, lexical),
# choosing families that precede dp_* heavily in cost: ds_* + cb_* +
# fn_* (~190 entries, the cheap bulk) — if inflation needs the heavy
# lakehouse entries instead, a second probe will test those.
names = [n for n in sorted(all_q) if n.startswith(("ds_", "cb_", "fn_"))]
t0 = time.perf_counter()
for n in names:
    try:
        run(n)
    except Exception as e:  # noqa: BLE001
        print(f"skip {n}: {e}", file=sys.stderr)
print(f"ran {len(names)} filler entries in {time.perf_counter()-t0:.1f}s", flush=True)
jvm_state("after_fillers")
mid = time3(probe)
jvm_state("after_probe_mid")

# heavy lakehouse/stream slice
heavy = [n for n in sorted(all_q) if n.startswith(("src_delta", "src_iceberg", "src_hudi", "stream_"))]
t0 = time.perf_counter()
for n in heavy:
    try:
        run(n)
    except Exception as e:  # noqa: BLE001
        print(f"skip {n}: {e}", file=sys.stderr)
print(f"ran {len(heavy)} heavy entries in {time.perf_counter()-t0:.1f}s", flush=True)
jvm_state("after_heavy")
late = time3(probe)
jvm_state("final")
print(f"SUMMARY base={base:.3f} after_cheap_fillers={mid:.3f} after_heavy={late:.3f}")
