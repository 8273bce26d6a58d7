"""Scripted same-day A/B bench: interleave two trees on one host window.

The r15 rounds measured day-scale host drift of 2-3x and minutes-scale
ambient windows of 2-5x on identical code (OPTIMIZATION_r15.md
"Methodology"), so cross-day absolute seconds are meaningless and even
min-of-2 inside ONE bench invocation can land entirely inside a bad
window. This tool is the protocol those rounds ran by hand: alternate
legs A,B,A,B,... over the SAME query subset in one session window, then
compare each side's MIN across its legs — the standard way to measure
the PLAN rather than the neighbors. A move is only called when one
side's min clears the other side's min by the threshold AND every leg
of the winner beats every leg of the loser ("all-legs" rule, the
strictest form used for the r14/r15 adjudications).

Usage:
    python tools/bench_ab.py --a /root/repo --b /tmp/wt_r14 \
        --queries q1,q2 [--legs 3] [--sf-dir /root/testdata/sf0.1] \
        [--cpus 32] [--threshold 0.15]

Each tree must hold a bench.py honoring SPARK_GRAFT_ONLY (both round-14
and round-15 trees do). Output: one JSON line per leg as it lands, then
a per-query verdict table.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def run_leg(tree: str, queries: str, sf_dir: str, cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_ONLY=queries,
    )
    out = subprocess.run(
        [sys.executable, "-u", "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
    ).stdout
    for line in reversed(out.splitlines()):
        if line.startswith('{"metric"'):
            return json.loads(line)
    raise RuntimeError(f"no bench JSON from {tree}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="tree A (e.g. the new code)")
    ap.add_argument("--b", required=True, help="tree B (e.g. a worktree of the old code)")
    ap.add_argument("--queries", required=True, help="comma-separated query names")
    ap.add_argument("--legs", type=int, default=3, help="legs PER SIDE (interleaved)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--threshold", type=float, default=0.15,
                    help="relative min-vs-min gap required to call a move")
    args = ap.parse_args()

    legs: dict[str, list[dict]] = {"A": [], "B": []}
    for i in range(args.legs):
        for side, tree in (("A", args.a), ("B", args.b)):
            r = run_leg(tree, args.queries, args.sf_dir, args.cpus)
            legs[side].append(r["queries"])
            print(json.dumps({"leg": f"{side}{i + 1}", "queries": r["queries"]}), flush=True)

    names = args.queries.split(",")
    verdicts = {}
    for q in names:
        a = [leg[q] for leg in legs["A"] if q in leg]
        b = [leg[q] for leg in legs["B"] if q in leg]
        if not a or not b:
            verdicts[q] = {"verdict": "missing"}
            continue
        ma, mb = min(a), min(b)
        gap = (mb - ma) / mb if mb else 0.0
        if ma < mb * (1 - args.threshold) and max(a) < mb:
            v = "A_faster_all_legs"
        elif mb < ma * (1 - args.threshold) and max(b) < ma:
            v = "B_faster_all_legs"
        elif abs(gap) >= args.threshold:
            v = "min_gap_but_legs_overlap_ambient"
        else:
            v = "wash"
        verdicts[q] = {
            "A_legs": a, "B_legs": b, "A_min": ma, "B_min": mb,
            "min_gap_pct": round(100 * gap, 1), "verdict": v,
        }
    print(json.dumps({"ab_verdicts": verdicts}, indent=2))


if __name__ == "__main__":
    main()
