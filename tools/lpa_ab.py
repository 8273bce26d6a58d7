"""Idle-host A/B of the LPA vote-round implementations (r10 VERDICT #2).

Times the label_propagation gate's two interchangeable round engines on
the SAME adjacency build at a given sf dir, interleaved A/B/A/B so
ambient drift hits both arms equally:

- dense: the r10 adjacency-array fast path (_lpa_rounds_dense) — one
  map stage per round, labels broadcast as a positional array;
- generic: the join+vote path (_lpa_rounds) with the broadcast hint the
  pre-r10 code used at this node count.

Prints one JSON line: per-arm times, means, and the dense/generic ratio.

Usage: python tools/lpa_ab.py [sf_dir] [reps=4]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    import __spark_entry__  # noqa: F401 — registers the workload
    from bgg_data_warehouse_spark.operators.label_prop import (
        _lpa_rounds,
        _lpa_rounds_dense,
        basket_sets,
        canonical_pairs_from_baskets,
        mirror_pairs,
    )
    from bgg_data_warehouse_spark.session import get_spark
    from bgg_data_warehouse_spark.sources.tables import load_table

    spark = get_spark("lpa-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    def build_adj():
        li = load_table(spark, sf_dir, "lineitem")
        mirrored = mirror_pairs(
            canonical_pairs_from_baskets(basket_sets(li, "l_orderkey", "l_partkey"))
        )
        return (
            mirrored.repartition("src")
            .groupBy("src")
            .agg(
                F.array_union(F.collect_set("dst"), F.array(F.col("src"))).alias(
                    "nbrs"
                )
            )
            .localCheckpoint(eager=True)
        )

    def summarize(labels):
        return labels.groupBy(F.col("label").alias("community")).agg(
            F.count("*").alias("n_nodes"),
            F.min("v").alias("min_member"),
            F.max("v").alias("max_member"),
        )

    def run_dense(adj, lo):
        summarize(_lpa_rounds_dense(adj, lo, 3)).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_generic(adj):
        work = adj.select("src", F.explode("nbrs").alias("dst"))
        nodes = adj.select(F.col("src").alias("v"))
        summarize(_lpa_rounds(work, nodes, 3, 2_000_000)).write.format(
            "noop"
        ).mode("overwrite").save()

    # warmup: one full adjacency build + one round-engine pass each
    adj = build_adj()
    stats = adj.agg(F.min("src").alias("lo")).collect()[0]
    lo = int(stats.lo)
    run_dense(adj, lo)
    run_generic(adj)

    times = {"dense": [], "generic": []}
    for _ in range(reps):
        for arm, fn in (("dense", lambda: run_dense(adj, lo)),
                        ("generic", lambda: run_generic(adj))):
            t0 = time.monotonic()
            fn()
            times[arm].append(round(time.monotonic() - t0, 3))
    mean = {k: sum(v) / len(v) for k, v in times.items()}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "reps": reps,
                "rounds_only_times": times,
                "mean": {k: round(v, 3) for k, v in mean.items()},
                "dense_over_generic": round(mean["dense"] / mean["generic"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
