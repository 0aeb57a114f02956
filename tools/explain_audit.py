"""Plan-quality audit: explain("formatted") every registry query and lint
the physical plan for the properties that matter at 100 TB.

Checks per plan:
  - cartesian  : no CartesianProduct unless the query is tagged 'cross'
  - pushdown   : parquet scans carry PushedFilters when the query filters
  - batched    : parquet scans are columnar (Batched: true); AQE hides
                 codegen ids pre-execution, so scan batching is the proxy
  - pyexec     : Arrow-batched python nodes only in udf/datapipe queries
                 (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)

Usage: python3 tools/explain_audit.py [prefix ...] [--sf DIR] [--report PATH]
Exit code = number of hard violations (cartesian only; the rest warn).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(jmode)


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    report_path = None
    args = []
    it = iter(range(1, len(sys.argv)))
    skip = False
    for i, a in enumerate(sys.argv[1:], start=1):
        if skip:
            skip = False
            continue
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
            skip = True
        elif a == "--report":
            report_path = sys.argv[i + 1]
            skip = True
        elif not a.startswith("--"):
            args.append(a)

    from incubator_gluten_spark.plans import collect_all
    from incubator_gluten_spark.session import get_session

    spark = get_session(app_name="explain-audit")
    all_q = collect_all()
    names = [
        n for n in sorted(all_q) if not args or any(n.startswith(p) for p in args)
    ]
    # streaming queries execute on build (availableNow) — skip, their plans
    # are micro-batch internals, and dp_* iterative ops run jobs on build
    names = [n for n in names if not n.startswith("stream_")]

    hard = 0
    lines = []
    for name in names:
        q = all_q[name]
        try:
            plan = plan_of(q.build(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            lines.append(f"{name}: SKIP (build raised {type(exc).__name__})")
            continue
        tags = set(q.tags or ())
        probs = []
        if "CartesianProduct" in plan and "cross" not in tags:
            probs.append("CARTESIAN")
            hard += 1
        if "Scan parquet" in plan and "PushedFilters: []" in plan and (
            "Filter" in plan
        ) and not tags & {"udf", "datapipe"}:
            # only warn when a filter exists but nothing reached the scan
            probs.append("no-pushdown")
        # AQE pre-execution plans carry no codegen ids, so lint the scan
        # instead: every parquet scan must be columnar ("Batched: true")
        if "Scan parquet" in plan and "Batched: true" not in plan:
            probs.append("unbatched-scan")
        py_nodes = [
            t
            for t in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas",
                      "MapInArrow", "BatchEvalPython")
            if t in plan
        ]
        if py_nodes and not tags & {
            "udf", "datapipe", "multimodal", "python-datasource", "arrow-kernel"
        }:
            probs.append(f"python-in-plan:{','.join(py_nodes)}")
        if "BatchEvalPython" in plan and "udf_python_row" not in name:
            probs.append("row-python-udf")
        lines.append(f"{name}: {'OK' if not probs else ' '.join(probs)}")

    n_ok = sum(1 for ln in lines if ln.endswith(": OK"))
    summary = f"--- {n_ok}/{len(lines)} plans clean, {hard} hard violations"
    print("\n".join(lines))
    print(summary)
    if report_path:
        with open(report_path, "w") as fh:
            fh.write("\n".join(lines) + "\n" + summary + "\n")
    return hard


if __name__ == "__main__":
    raise SystemExit(main())
