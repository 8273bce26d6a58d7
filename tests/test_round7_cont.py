"""Round-7 continuation operators: AQP sampled aggregates with an exact
dyadic inclusion probability, and deterministic label-propagation
communities (the oracle-replayable iterative-graph pattern)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from bgg_data_warehouse_spark.operators.label_prop import (
    cooccurrence_edges,
    label_propagation,
    lpa_oracle_sql,
)
from tests.conftest import SF_SMALL
from tests.test_plan_audit import executed_plan, final_plan


def _edges(spark, pairs):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in sorted(set(sym))]
    )


def test_lpa_two_cliques_two_communities(spark):
    """Two disjoint triangles each converge onto their min member."""
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)])
    out = {r["v"]: r["label"] for r in label_propagation(e, iters=3).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_lpa_tie_breaks_to_smallest_label(spark):
    """A single edge is a pure tie (one neighbour vote vs one self vote)
    every round — both endpoints must deterministically take the min."""
    e = _edges(spark, [(7, 3)])
    out = {r["v"]: r["label"] for r in label_propagation(e, iters=1).collect()}
    assert out == {3: 3, 7: 3}


def test_lpa_rejects_nonpositive_iters(spark):
    with pytest.raises(ValueError):
        label_propagation(_edges(spark, [(1, 2)]), iters=0)


def test_cooccurrence_edges_symmetric_distinct_no_self(spark):
    df = spark.createDataFrame(
        [Row(g=1, p=10), Row(g=1, p=11), Row(g=1, p=10), Row(g=2, p=10)]
    )
    rows = {(r["src"], r["dst"])
            for r in cooccurrence_edges(df, "g", "p").collect()}
    assert rows == {(10, 11), (11, 10)}


def test_lpa_oracle_replays_spark_exactly(spark):
    """The generated DuckDB CTE chain must reproduce the Spark rounds
    bit-for-bit on a graph with a genuine multi-round frontier (a path
    long enough that labels are still moving at round 3)."""
    pairs = [(i, i + 1) for i in range(1, 9)]  # path 1-2-...-9
    e = _edges(spark, pairs)
    got = {
        (r["v"], r["label"])
        for r in label_propagation(e, iters=3).collect()
    }
    con = duckdb.connect()
    values = ", ".join(f"({a}, {b})" for a, b in sorted(
        {(a, b) for a, b in pairs} | {(b, a) for a, b in pairs}))
    sql = (
        lpa_oracle_sql(f"SELECT * FROM (VALUES {values}) t(src, dst)", 3)
        + " SELECT v, label FROM l3"
    )
    want = set(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_aqp_ci_brackets_exact_revenue(spark):
    """The 95% CI must bracket the true per-flag revenue on the fixed
    fixture (deterministic sample — verified to hold for all 3 groups;
    a bias in the inclusion probability would break this, which is why
    the predicate thresholds a uniform 16-bit value at 8192)."""
    est = {
        r["l_returnflag"]: r
        for r in entrymod.queries()["aqp_sampled_agg"](spark, SF_SMALL).collect()
    }
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    x = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    exact = {
        r["l_returnflag"]: (float(r["rev"]), r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum(x).cast("double").alias("rev"), F.count("*").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for flag, row in est.items():
        truth, n_rows = exact[flag]
        lo = row["est_revenue"] - row["ci95_revenue"]
        hi = row["est_revenue"] + row["ci95_revenue"]
        assert lo <= truth <= hi, (flag, lo, truth, hi)
        # the count estimate is within 3 binomial SEs of the truth
        se = (n_rows * (1 / 8) * (7 / 8)) ** 0.5 / (1 / 8)
        assert abs(row["est_rows"] - n_rows) <= 3 * se, (flag, row, n_rows)


def test_aqp_sample_fraction_near_p(spark):
    """Effective inclusion rate on the fixture must sit near the exact
    dyadic p = 1/8 (the ascii-fold-mod-100 predicate this replaced ran
    2.5% hot by construction)."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    total = li.count()
    kept = sum(
        r["n_sample"]
        for r in entrymod.queries()["aqp_sampled_agg"](spark, SF_SMALL).collect()
    )
    assert abs(kept / total - 0.125) < 0.015


def test_aqp_plans_single_exchange_filter_below(spark):
    """The sample predicate must run before the aggregate's shuffle:
    exactly one hash Exchange, with a Filter present on the scan side."""
    df = entrymod.queries()["aqp_sampled_agg"](spark, SF_SMALL)
    plan = final_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Filter" in plan, plan


def test_lpa_edges_join_is_equi_not_cartesian(spark):
    """The basket self-join must plan as an equi-join on the order key —
    never a cartesian / nested-loop product."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    plan = executed_plan(cooccurrence_edges(li, "l_orderkey", "l_partkey"))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_robust_outliers_pins_base_and_dev(spark):
    """base feeds med+dev and dev feeds mad+the final aggregate; both
    are lazily localCheckpointed, so the executed gate plan reads the
    pinned RDDs — zero parquet re-scans of events per consumer branch
    (the decision_stump convention, round-7 ADVICE)."""
    df = entrymod.queries()["robust_outliers"](spark, SF_SMALL)
    df.collect()
    plan = final_plan(df)
    assert "Scan ExistingRDD" in plan, plan
    assert plan.count("Scan parquet") == 0, plan


def test_hll_estimate_grouped_construction_runs_no_job(spark):
    """The grouped hll_estimate pin is LAZY (eager=False): building the
    query plan must not execute the grid-materialization job — plan-only
    consumers of the registry pay nothing (round-7 ADVICE). AQE is
    disabled for the probe because localCheckpoint's toRdd under AQE
    materializes UPSTREAM shuffle stages at construction regardless of
    eager — orthogonal to (and measured without) the eager count job
    this test guards against."""
    from bgg_data_warehouse_spark.operators.sketches import (
        hll_estimate,
        hll_register_grid,
    )

    sc = spark.sparkContext
    group = "hll-lazy-construction-probe"
    # read OUTSIDE the probe group: parquet schema/file-listing runs its
    # own driver job, which is not what this test is about
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup(group, "assert no eager job during plan construction")
    try:
        grid = hll_register_grid(
            ev, "user_id", m=16, group_cols=["event_type"]
        )
        est = hll_estimate(grid, m=16, group_cols=["event_type"])
        jobs = sc.statusTracker().getJobIdsForGroup(group)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    assert list(jobs) == [], jobs
    # and the frame still evaluates correctly afterwards
    assert est.count() > 0
