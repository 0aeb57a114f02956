"""Propose the next round's graded window (_FRONT rotation).

The external driver hash-grades the FIRST 50 registry entries each round;
rotating that window compounds driver-certified coverage (the reference's
gluten-ut reruns the whole upstream corpus rather than a fixed subset —
gluten-ut/common/.../GlutenTestsTrait.scala).  This tool reads
graded_history.json (per-round window lists) plus the live registry and
prints a proposed next window: the stable anchors + never-graded entries
chosen round-robin across name-prefix families, oracle-backed entries
first.

Usage: python3 tools/rotate_window.py            # print proposal
       (then hand-edit plans/__init__.py _FRONT and append the new list
        to graded_history.json for the round being shipped)
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one proven representative per SURVEY §2 family, kept every round so a
# regression in a core path is still caught by the hard gate
# Round 6 policy (r5 verdict directive #1): 10 anchors — the entire
# per-round overlap budget — so 40 slots go to never-graded names.
ANCHORS = [
    "q1", "q6", "q9",
    "win_topk_per_group",
    "src_bucketed_join",
    "stream_tumbling",
    "udf_pandas_vectorized",
    "dp_dedup_exact",
    "dp_sequence_packing",
    "dp_embedding_near_dup",
]


def family(name: str) -> str:
    if name.startswith("q") and name[1:].isdigit():
        return "tpch"
    return name.split("_", 1)[0]


def main() -> int:
    from incubator_gluten_spark.plans import collect_all

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "graded_history.json")) as fh:
        hist = json.load(fh)
    graded: set[str] = set()
    for k, v in hist.items():
        if isinstance(v, list):
            graded.update(v)

    qs = collect_all()
    never = [n for n in qs if n not in graded and n not in ANCHORS]
    # oracle-backed first (hard three-gate check beats rows-only), then
    # round-robin across families so no family floods the window
    buckets: dict[str, list[str]] = defaultdict(list)
    for n in sorted(never, key=lambda n: (qs[n].oracle is None, n)):
        buckets[family(n)].append(n)
    fams = sorted(buckets)
    picked: list[str] = []
    while len(picked) < 50 - len(ANCHORS) and any(buckets.values()):
        for f in fams:
            if buckets[f] and len(picked) < 50 - len(ANCHORS):
                picked.append(buckets[f].pop(0))

    window = ANCHORS + picked
    print(f"# cumulative graded so far: {len(graded)}")
    print(f"# never-graded remaining:   {len(never) - len(picked)}")
    print("# proposed next window (anchors + rotation):")
    for n in window:
        suffix = "" if qs[n].oracle else "   # rows-only"
        print(f'    "{n}",{suffix}')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
