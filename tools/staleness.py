"""Evidence-age report for the graded query registry.

The driver grades the FIRST 50 queries of ``__spark_entry__.queries()``
each round and records per-query results in ``CORRECTNESS_r{N}.json``;
with far more registered gates than window slots, window rotation is an
evidence-freshness problem. This tool derives, for every registered
query, the last round with a green driver row (rows_match and no err)
and its age relative to the next round — the input the rotation comment
in ``__spark_entry__.py`` is built from, kept runnable so the numbers
never go stale in prose.

Run:  python tools/staleness.py [next_round]
Prints ONE JSON line:
  {"next_round": N, "ages": {age: [names...]}, "never": [names...],
   "window_max_age": A, "out_of_window_max_age": B,
   "suggested_window": [50 names], "suggested_tail": [names...]}
``never`` lists registered gates with no green driver row in any round
(the rows-only sketches by design — each has a hash-gated twin — plus
any gate newer than its first window appearance).

``suggested_window`` is the staleness-greedy 50-slot fill: never-graded
HASH-GATED queries first (a registered gate with no green row is a
ledger hole — new gates must debut in-window), then strictly oldest
evidence first, alphabetical within an age class. It does NOT know
which gates' code changed in the current round — those must be added
by hand at the front (a changed gate needs a fresh green row
regardless of age), displacing the youngest suggestions. The
rows-only sketches are excluded from the suggestion (their driver row
is a weak rows-only check; their hash-gated twins rotate instead) and
appended to the tail.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as entrymod

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    rounds = []
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r0*(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        for q, v in json.load(open(f)).items():
            if v.get("rows_match") and not v.get("err"):
                last[q] = max(last.get(q, 0), rnd)
    next_round = (
        int(sys.argv[1]) if len(sys.argv) > 1 else (max(rounds) + 1 if rounds else 1)
    )

    names = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    window = set(names[:50])
    ages: dict[int, list[str]] = {}
    never = []
    for q in names:
        if q in last:
            ages.setdefault(next_round - last[q], []).append(q)
        else:
            never.append(q)
    # staleness-greedy fill: never-graded hash-gated debuts, then oldest
    # first; rows-only sketches rotate via their hash-gated twins and go
    # to the back of the tail.
    rows_only = [q for q in names if q not in oracles]
    ranked = sorted(never) + [
        q
        for a, qs in sorted(ages.items(), reverse=True)
        for q in sorted(qs)
    ]
    ranked = [q for q in ranked if q not in rows_only]
    suggested = ranked[:50]
    tail = ranked[50:] + rows_only  # ranked excludes rows-only entirely
    print(
        json.dumps(
            {
                "next_round": next_round,
                "n_registered": len(names),
                "ages": {str(a): sorted(qs) for a, qs in sorted(ages.items())},
                "never": never,
                "window_max_age": max(
                    (next_round - last[q] for q in window if q in last),
                    default=None,
                ),
                "out_of_window_max_age": max(
                    (
                        next_round - last[q]
                        for q in names
                        if q not in window and q in last
                    ),
                    default=None,
                ),
                "suggested_window": suggested,
                "suggested_tail": tail,
            }
        )
    )


if __name__ == "__main__":
    main()
