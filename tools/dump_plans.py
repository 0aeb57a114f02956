"""Dump .explain("formatted") for registry queries to plans/<dir>/.

Usage: python3 tools/dump_plans.py --out plans/r14 --suffix _before q1 q6 ...
       python3 tools/dump_plans.py --out plans/r14 --suffix _before --prefix q

NOTE: building an entry executes its side-effect pipeline (lakehouse
entries run their table ops during build); the dumped plan is the plan of
the RETURNED DataFrame — the declared query the driver hashes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    out_dir = "plans/r14"
    suffix = "_before"
    names: list[str] = []
    prefixes: list[str] = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--out":
            out_dir = args[i + 1]
            i += 2
        elif a == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif a == "--prefix":
            prefixes.append(args[i + 1])
            i += 2
        else:
            names.append(a)
            i += 1

    from incubator_gluten_spark.plans import collect_all
    from incubator_gluten_spark.session import get_session

    all_q = collect_all()
    for p in prefixes:
        names.extend(
            n for n in sorted(all_q) if n.startswith(p) and n not in names
        )
    if not names:
        print(__doc__)
        return 2
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="dump-plans")
    for name in names:
        q = all_q[name]
        try:
            df = q.build(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"BUILD FAILED: {exc}"
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
