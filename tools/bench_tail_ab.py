"""Interleaved A/B for unexplained bench-tail drift (r11 VERDICT #4).

Four queries regressed r10 -> r11 beyond the documented ±9 % ambient
band (ngram_jaccard 1.47->2.44 s, session_rollup_batch 0.94->1.58 s,
fk_integrity_audit 2.16->2.67 s, dedup_simhash_verified 1.72->2.20 s)
with ZERO code changes to any of them. The lpa_ab protocol applied to
the driver-bench question: on an idle host, run the suspects
round-robin-interleaved for ``reps`` rounds (so ambient drift hits
every query equally rather than whichever ran during a contention
window), then compare each query's MIN — the plan's cost — against the
r10 and r11 driver-bench numbers.

Reading the output: if min ≈ r10's number, the r11 reading was ambient
(GC/heap/neighbor) inflation on an unchanged plan — "ambient,
confirmed". If min ≈ r11's number, the regression is real and needs a
plan-level fix.

Prints one JSON line. Usage:

    python tools/bench_tail_ab.py [sf_dir] [reps=5] [q1,q2,...]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SUSPECTS = [
    "ngram_jaccard",
    "session_rollup_batch",
    "fk_integrity_audit",
    "dedup_simhash_verified",
]


def isolate_main() -> None:
    """One FRESH JVM per measurement (`python bench.py` with
    SPARK_GRAFT_ONLY=<name>): removes accumulated-heap/JIT state as a
    variable entirely — the cleanest per-plan cost this host can give.
    Usage: python tools/bench_tail_ab.py --isolate [sf_dir] [reps=3] [qs]
    """
    import subprocess

    args = [a for a in sys.argv[1:] if a != "--isolate"]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = int(args[1]) if len(args) > 1 else 3
    names = args[2].split(",") if len(args) > 2 else DEFAULT_SUSPECTS

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for n in names:  # interleaved across JVMs too
            env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_ONLY=n)
            r = subprocess.run(
                [sys.executable, os.path.join(root, "bench.py")],
                capture_output=True,
                text=True,
                env=env,
                timeout=900,
            )
            line = r.stdout.strip().splitlines()[-1]
            times[n].append(json.loads(line)["queries"][n])
    print(
        json.dumps(
            {
                "mode": "fresh_jvm_per_measurement",
                "sf_dir": sf_dir,
                "reps": reps,
                "queries": {
                    n: {"times": ts, "min": min(ts),
                        "mean": round(sum(ts) / len(ts), 3)}
                    for n, ts in times.items()
                },
            }
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else DEFAULT_SUSPECTS
    # prior builder snapshots to compare against (argv[4], "rA,rB" —
    # A = the round before the regression, B = the regressed round)
    tags = tuple(sys.argv[4].split(",")) if len(sys.argv) > 4 else ("r10", "r11")

    import __spark_entry__ as entrymod
    from bgg_data_warehouse_spark.session import get_spark

    spark = get_spark("bench-tail-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    qs = entrymod.queries()

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def reset() -> None:
        spark.catalog.clearCache()
        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass

    # warmup: one untimed pass per suspect (JIT + table cache)
    force(qs["latest_snapshot"](spark, sf_dir))
    for n in names:
        reset()
        force(qs[n](spark, sf_dir))

    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for n in names:  # interleaved: every rep visits every query
            reset()
            t0 = time.perf_counter()
            force(qs[n](spark, sf_dir))
            times[n].append(round(time.perf_counter() - t0, 3))

    prior: dict[str, dict[str, float]] = {}
    for tag in tags:
        # per-query numbers live in the builder snapshots (BENCH_rN.json
        # holds only the driver's truncated tail)
        path = os.path.join(
            os.path.dirname(__file__), "..", f"BENCH_builder_{tag}.json"
        )
        try:
            with open(path) as f:
                prior[tag] = json.load(f).get("queries", {})
        except OSError:
            prior[tag] = {}

    report = {}
    for n in names:
        ts = times[n]
        lo = min(ts)
        before, after = prior[tags[0]].get(n), prior[tags[1]].get(n)
        verdict = None
        if before is not None and after is not None and after > before:
            # closer to which prior reading?
            verdict = (
                "ambient_confirmed"
                if abs(lo - before) <= abs(lo - after)
                else "real_regression"
            )
        report[n] = {
            "times": ts,
            "min": lo,
            "mean": round(sum(ts) / len(ts), 3),
            tags[0]: before,
            tags[1]: after,
            "verdict": verdict,
        }
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "queries": report}))


if __name__ == "__main__":
    if "--isolate" in sys.argv:
        isolate_main()
    else:
        main()
