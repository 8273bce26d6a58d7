"""Per-query scaling audit: how does every graded query's runtime grow
across a 10x data-size step (sf0.01 -> sf0.1)?

The suite's correctness gates prove WHAT each operator computes; this
tool measures how its cost MOVES with data size — the empirical check
behind every "bounded / one shuffle / never quadratic" docstring claim.
On 10x more data a healthy distributed plan grows at most ~10x
(compute-bound linear) and usually far less (fixed scheduling overhead
dominates small inputs); a ratio well past 10x is the signature of a
stage whose work grows faster than its input — the thing that dies at
100 TB no matter how green the gates are.

Method: same measurement discipline as bench.py (noop sink forces full
execution, cache cleared + GC settled between queries, min-of-2 on the
slow tail at each SF so one contention window can't fake a superlinear
ratio). Queries are measured at the SMALL sf first, then the large, so
page-cache warming biases AGAINST false negatives (the large run gets
no cold-read excuse).

Run:  python tools/scaling_curve.py [small_sf_dir] [big_sf_dir] [name ...]
Prints ONE JSON line:
  {"small": ..., "big": ..., "factor": 10.0,
   "queries": {name: {"t_small": s, "t_big": s, "ratio": r}},
   "flagged": [names with ratio > FLAG_RATIO], ...}
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 10x data, and small-SF timings sit on a fixed scheduling floor that
# deflates the denominator — so even a linear operator can brush 10.
# Past 12 the growth is faster than the data and worth an explanation.
FLAG_RATIO = 12.0


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]

    from bgg_data_warehouse_spark.session import get_spark
    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("scaling-curve", cpus=cpus)
    qs = entrymod.queries()
    if names:
        unknown = [n for n in names if n not in qs]
        if unknown:
            # fail loudly: a silently-dropped name would let "flagged: []"
            # read as coverage for a query that was never measured
            raise SystemExit(f"unknown query names: {unknown}")
        qs = {n: qs[n] for n in names}

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def reset() -> None:
        spark.catalog.clearCache()
        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass

    def timed(fn, sf_dir) -> float:
        reset()
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        t = time.perf_counter() - t0
        if t > 2.0:  # bench.py's min2_gt2s policy, per SF
            reset()
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            t = min(t, time.perf_counter() - t0)
        return t

    # warmup both directories' tables + JIT
    force(qs.get("latest_snapshot", next(iter(qs.values())))(spark, small))
    force(qs.get("latest_snapshot", next(iter(qs.values())))(spark, big))

    out: dict[str, dict[str, float]] = {}
    for name, fn in qs.items():
        ts = timed(fn, small)
        tb = timed(fn, big)
        out[name] = {
            "t_small": round(ts, 3),
            "t_big": round(tb, 3),
            "ratio": round(tb / ts, 2) if ts > 0 else None,
        }

    flagged = sorted(
        (n for n, v in out.items() if (v["ratio"] or 0) > FLAG_RATIO),
        key=lambda n: -out[n]["ratio"],
    )
    print(
        json.dumps(
            {
                "metric": "scaling_ratio_10x",
                "small": small,
                "big": big,
                "flag_ratio": FLAG_RATIO,
                "timing": "min2_gt2s_per_sf",
                "queries": dict(
                    sorted(out.items(), key=lambda kv: -(kv[1]["ratio"] or 0))
                ),
                "n_queries": len(out),
                "flagged": flagged,
            }
        )
    )


if __name__ == "__main__":
    main()
