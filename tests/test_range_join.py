"""time_range_join — boundary semantics, bucket-straddle correctness vs a
naive theta join, and the no-cartesian plan contract."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pyspark.sql.functions as F

from bgg_data_warehouse_spark.operators.range_join import time_range_join

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _mk(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "lid: long, k: long, ts: timestamp")
    right = spark.createDataFrame(right_rows, "k: long, r_ts: timestamp, v: double")
    return left, right


HOUR = 3_600_000_000


def test_window_boundaries_inclusive_exclusive(spark):
    # window [ts-1h, ts): row exactly 1h before is IN, row at ts is OUT
    left, right = _mk(
        spark,
        [(1, 7, T0 + timedelta(hours=2))],
        [
            (7, T0 + timedelta(hours=1), 10.0),            # exactly -1h → in
            (7, T0 + timedelta(hours=2), 20.0),            # at ts → out
            (7, T0 + timedelta(hours=1, minutes=30), 30.0),  # inside
            (7, T0 + timedelta(minutes=59), 40.0),         # too old
        ],
    )
    got = sorted(
        r.v
        for r in time_range_join(
            left, right, on="k", left_ts="ts", right_ts="r_ts",
            lower_micros=-HOUR, upper_micros=0,
        ).collect()
    )
    assert got == [10.0, 30.0]


def test_matches_naive_theta_join_on_random_data(spark):
    rng = random.Random(13)
    lrows = [
        (i, rng.randrange(3), T0 + timedelta(seconds=rng.randrange(20000)))
        for i in range(60)
    ]
    rrows = [
        (rng.randrange(3), T0 + timedelta(seconds=rng.randrange(20000)), float(i))
        for i in range(200)
    ]
    left, right = _mk(spark, lrows, rrows)
    fast = time_range_join(
        left, right, on="k", left_ts="ts", right_ts="r_ts",
        lower_micros=-HOUR, upper_micros=HOUR // 2,
    )
    naive = left.join(right, "k").where(
        (F.unix_micros("r_ts") >= F.unix_micros("ts") - HOUR)
        & (F.unix_micros("r_ts") < F.unix_micros("ts") + HOUR // 2)
    )
    key = lambda r: (r.lid, r.v)
    assert sorted(map(key, fast.collect())) == sorted(map(key, naive.collect()))


def test_no_duplicate_pairs_across_buckets(spark):
    # right row sits exactly on a bucket boundary relative to the window
    left, right = _mk(
        spark,
        [(1, 1, T0 + timedelta(hours=3))],
        [(1, T0 + timedelta(hours=2, minutes=30), 5.0)],
    )
    out = time_range_join(
        left, right, on="k", left_ts="ts", right_ts="r_ts",
        lower_micros=-HOUR, upper_micros=0,
    ).collect()
    assert len(out) == 1


def test_plan_is_equi_join_not_cartesian(spark):
    left, right = _mk(
        spark,
        [(1, 1, T0)],
        [(1, T0, 1.0)],
    )
    out = time_range_join(
        left, right, on="k", left_ts="ts", right_ts="r_ts",
        lower_micros=-HOUR, upper_micros=0,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
