"""Round-10 additions.

Covers the r9 VERDICT work items:
- merge_intervals (gaps-and-islands, interval_islands gate): the
  running-max-of-ends formulation on the exact cases that distinguish
  it from a lag-based split, plus the on-the-boundary touch semantics
  (the session_rollup lesson: write a fixture that LANDS ON the
  boundary — testdata never will);
- embedding_exact_dup_pairs (radius-0 near-dup, now hash-gated):
  recall-1/precision-1 on planted duplicates through the PRODUCTION
  bits>0 LSH plan;
- the dense adjacency-array LPA fast path: equivalence with the
  generic join path on both dense and NON-dense id spaces (the latter
  must fall back), and the codegen'd array-mode fold vs a Python
  Counter;
- ols_two_feature's Cramer expansion vs numpy.linalg.lstsq;
- models.bgg_predictions' deterministic ``as_of`` anchor.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# merge_intervals
# ---------------------------------------------------------------------------


def _islands(spark, rows):
    from bgg_data_warehouse_spark.operators.sweepline import merge_intervals

    df = spark.createDataFrame(rows, "k string, s long, e long, id long")
    out = merge_intervals(df, ["k"], "s", "e", order_cols=["id"])
    return {
        (r["k"], r["id"]): r["island_id"] for r in out.collect()
    }


def test_merge_intervals_long_interval_swallows_later_shorts(spark):
    """[0, 100] overlaps [10, 20] AND [30, 40] even though [30, 40]
    starts after [10, 20] ENDS — lag(e) would split there; the running
    max of ends must not."""
    got = _islands(
        spark,
        [("a", 0, 100, 1), ("a", 10, 20, 2), ("a", 30, 40, 3), ("a", 150, 160, 4)],
    )
    assert got[("a", 1)] == got[("a", 2)] == got[("a", 3)] == 1
    assert got[("a", 4)] == 2


def test_merge_intervals_touching_boundary_merges(spark):
    """start == previous end MERGES (strictly-greater comparison), and
    start == previous end + 1 splits — the exact boundary, which the
    microsecond testdata would never exercise."""
    got = _islands(spark, [("a", 0, 10, 1), ("a", 10, 20, 2), ("a", 21, 30, 3)])
    assert got[("a", 1)] == got[("a", 2)] == 1
    assert got[("a", 3)] == 2


def test_merge_intervals_keys_are_independent(spark):
    got = _islands(spark, [("a", 0, 10, 1), ("b", 5, 15, 2), ("b", 100, 110, 3)])
    assert got[("a", 1)] == 1 and got[("b", 2)] == 1 and got[("b", 3)] == 2


# ---------------------------------------------------------------------------
# embedding_exact_dup_pairs
# ---------------------------------------------------------------------------


def test_embedding_exact_dup_recall_and_precision(spark):
    """Identical vectors (including a SCALED copy, which is cosine-1
    but NOT identical) through the production 8x8 LSH plan: every
    byte-identical pair is found (recall 1 — identical vectors collide
    in every table), and nothing else (the scaled copy shares all sign
    buckets yet must be rejected by the equality verifier)."""
    from bgg_data_warehouse_spark.operators.similarity import (
        embedding_exact_dup_pairs,
    )

    base = [float(x) for x in (1.0, -2.0, 3.0, 0.5)]
    other = [float(x) for x in (4.0, 1.0, -1.0, 2.0)]
    scaled = [2.0 * x for x in base]
    rows = [
        Row(id=1, v=base),
        Row(id=2, v=base),        # exact dup of 1
        Row(id=3, v=scaled),      # cosine 1 with 1/2, NOT identical
        Row(id=4, v=other),
        Row(id=5, v=other),       # exact dup of 4
        Row(id=6, v=base),        # exact dup of 1 and 2
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in embedding_exact_dup_pairs(df, "id", "v").collect()
    }
    assert got == {(1, 2), (1, 6), (2, 6), (4, 5)}


# ---------------------------------------------------------------------------
# LPA dense fast path
# ---------------------------------------------------------------------------


def test_array_mode_smallest_matches_counter(spark):
    """The codegen'd fold vs Python's Counter on assorted multisets,
    including all-distinct (smallest wins) and tie cases."""
    from bgg_data_warehouse_spark.operators.label_prop import (
        _array_mode_smallest,
    )

    cases = [
        [3, 1, 2],
        [5, 5, 1, 1, 2],
        [7],
        [2, 2, 3, 3, 1],
        [9, 8, 9, 8, 7, 7],
        [0, 0, 0, 4],
    ]
    df = spark.createDataFrame([(c,) for c in cases], "labs array<long>")
    got = [r[0] for r in df.select(_array_mode_smallest(F.col("labs"))).collect()]
    for c, g in zip(cases, got):
        cnt = Counter(c)
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert g == best, (c, g, best)


def _lpa_both_paths(spark, baskets_rows, iters=3):
    from bgg_data_warehouse_spark.operators.label_prop import (
        basket_sets,
        cooccurrence_edges,
        label_propagation,
        label_propagation_from_baskets,
    )

    df = spark.createDataFrame(baskets_rows, "g long, item long")
    generic = label_propagation(
        cooccurrence_edges(df, "g", "item"), iters=iters
    )
    fused = label_propagation_from_baskets(
        basket_sets(df, "g", "item"), iters=iters
    )
    to_map = lambda d: {r["v"]: r["label"] for r in d.collect()}  # noqa: E731
    return to_map(generic), to_map(fused)


def test_lpa_fused_equals_generic_dense_ids(spark):
    """Dense id space 1..8 → the fused path takes the adjacency-array
    rounds; labels must equal the generic join path exactly."""
    rows = [
        (10, 1), (10, 2), (10, 3),
        (11, 2), (11, 3),
        (12, 5), (12, 6),
        (13, 6), (13, 7), (13, 8),
        (14, 4), (14, 1),
    ]
    generic, fused = _lpa_both_paths(spark, rows)
    assert generic == fused and len(fused) == 8


def test_lpa_fused_equals_generic_sparse_ids(spark):
    """Gappy id space (multiples of 1000 + primes) → the dense check
    fails and the fused entry must FALL BACK to the join rounds with
    identical output."""
    rows = [
        (1, 1000), (1, 2003), (1, 3001),
        (2, 2003), (2, 3001),
        (3, 5000), (3, 7013),
        (4, 7013), (4, 9000),
    ]
    generic, fused = _lpa_both_paths(spark, rows)
    assert generic == fused and len(fused) == 6


def test_lpa_fused_empty_and_singleton_baskets(spark):
    """No basket has 2+ items → no edges, no nodes: the fused path must
    return an EMPTY (v, label) frame like the generic path, not
    TypeError on the NULL min/max of the dense check (code-review r10
    finding)."""
    from bgg_data_warehouse_spark.operators.label_prop import (
        basket_sets,
        label_propagation_from_baskets,
    )

    for rows in [[], [(1, 10), (2, 20), (3, 30)]]:
        df = spark.createDataFrame(rows, "g long, item long")
        out = label_propagation_from_baskets(basket_sets(df, "g", "item"))
        assert out.columns == ["v", "label"] and out.count() == 0


def test_lpa_fused_matches_duckdb_replay(spark):
    """End-to-end: the fused path on a random basket fixture vs the
    DuckDB CTE replay (the gate's oracle machinery), labels compared
    node-for-node."""
    import duckdb

    from bgg_data_warehouse_spark.operators.label_prop import (
        basket_sets,
        label_propagation_from_baskets,
        lpa_oracle_sql,
    )

    rng = np.random.RandomState(7)
    rows = [
        (int(g), int(rng.randint(1, 30)))
        for g in range(40)
        for _ in range(rng.randint(2, 6))
    ]
    df = spark.createDataFrame(rows, "g long, item long")
    got = {
        r["v"]: r["label"]
        for r in label_propagation_from_baskets(
            basket_sets(df, "g", "item"), iters=3
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE baskets AS SELECT * FROM (VALUES "
        + ",".join(f"({g},{i})" for g, i in rows)
        + ") t(g, item)"
    )
    edges_cte = """
      WITH items AS (SELECT DISTINCT g, item AS p FROM baskets)
      SELECT DISTINCT a.p AS src, b.p AS dst
      FROM items a JOIN items b ON a.g = b.g AND a.p <> b.p
    """
    want = dict(
        con.execute(
            lpa_oracle_sql(edges_cte, iters=3) + " SELECT v, label FROM l3"
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# ols_two_feature
# ---------------------------------------------------------------------------


def test_ols_two_feature_matches_numpy(spark):
    """The Cramer expansion vs numpy.linalg.lstsq on the sf0.001
    lineitem: per group, [b0, b1, b2] must agree to float tolerance
    (the moment sums are exact ints, so the only divergence budget is
    the final double solve)."""
    from bgg_data_warehouse_spark.workload import QUERIES

    out = {
        r["grp"]: (r["n_rows"], r["b0"], r["b1"], r["b2"])
        for r in QUERIES["ols_two_feature"](spark, "/root/testdata/sf0.001").collect()
    }
    li = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
        .toPandas()
    )
    for grp, sub in li.groupby("l_returnflag"):
        x1 = sub["l_quantity"].round().to_numpy()
        x2 = (sub["l_discount"] * 100).round().to_numpy()
        y = (sub["l_extendedprice"] * 100).round().to_numpy()
        a = np.column_stack([np.ones_like(x1), x1, x2])
        beta, *_ = np.linalg.lstsq(a, y, rcond=None)
        n_rows, b0, b1, b2 = out[grp]
        assert n_rows == len(sub)
        np.testing.assert_allclose([b0, b1, b2], beta, rtol=1e-6)


# ---------------------------------------------------------------------------
# models.bgg_predictions as_of anchor
# ---------------------------------------------------------------------------


def test_bgg_predictions_as_of_anchor(spark):
    """With an explicit as_of column the freshness flags are a pure
    function of the data (score two games 1 and 10 days before the
    anchor); without it the model keeps the reference's wall-clock
    CURRENT_DATE semantics (scored today → both flags true)."""
    from bgg_data_warehouse_spark.plans import models

    base = [
        Row(game_id=1, name="a", predicted_hurdle_prob=0.5,
            predicted_complexity=2.0, predicted_rating=7.0,
            predicted_users_rated=10, predicted_geek_rating=6.5,
            score_ts="2024-03-09 12:00:00", job_id=1),
        Row(game_id=2, name="b", predicted_hurdle_prob=0.5,
            predicted_complexity=2.0, predicted_rating=7.0,
            predicted_users_rated=10, predicted_geek_rating=6.5,
            score_ts="2024-02-29 12:00:00", job_id=2),
    ]
    landing = (
        spark.createDataFrame(base)
        .withColumn("score_ts", F.to_timestamp("score_ts"))
        .withColumn("as_of", F.to_date(F.lit("2024-03-10")))
    )
    got = {
        r["game_id"]: (r["is_new_1d"], r["is_new_7d"])
        for r in models.bgg_predictions(
            {"ml_predictions_landing": landing}, as_of=F.col("as_of")
        ).collect()
    }
    assert got == {1: (True, True), 2: (False, False)}

    wallclock = landing.withColumn("score_ts", F.current_timestamp())
    got_now = models.bgg_predictions(
        {"ml_predictions_landing": wallclock}
    ).collect()
    assert all(r["is_new_1d"] and r["is_new_7d"] for r in got_now)
