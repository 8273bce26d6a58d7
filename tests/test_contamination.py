"""ngram_contamination — hand-computed overlap fractions, short-doc
exclusion, and the broadcast-pool plan contract."""

from __future__ import annotations

from bgg_data_warehouse_spark.operators.contamination import ngram_contamination


def test_contamination_fractions(spark):
    train = spark.createDataFrame(
        [
            # shingles: "a b c", "b c d" — both in bench → 1.0
            (1, "a b c d"),
            # "x y z", "y z w" — none in bench → 0.0
            (2, "x y z w"),
            # "a b c", "b c x", "c x y" — 1 of 3 hits
            (3, "a b c x y"),
            # too short for a 3-gram → excluded
            (4, "a b"),
        ],
        "doc_id: long, text: string",
    )
    bench = spark.createDataFrame(
        [(100, "a b c d e")],  # pool: "a b c", "b c d", "c d e"
        "doc_id: long, text: string",
    )
    out = {
        r.doc: (r.n_shingles, r.n_hit, r.contamination, r.flagged)
        for r in ngram_contamination(
            train, bench, "doc_id", "text", n=3, flag_threshold=0.5
        ).collect()
    }
    assert out == {
        1: (2, 2, 1.0, True),
        2: (2, 0, 0.0, False),
        3: (3, 1, round(1 / 3, 6), False),
    }


def test_duplicate_shingles_counted_once(spark):
    train = spark.createDataFrame(
        [(1, "a b c a b c a b c")],  # distinct shingles: a b c / b c a / c a b
        "doc_id: long, text: string",
    )
    bench = spark.createDataFrame([(9, "a b c")], "doc_id: long, text: string")
    row = ngram_contamination(train, bench, "doc_id", "text", n=3).collect()[0]
    assert row.n_shingles == 3 and row.n_hit == 1


def test_bench_pool_is_broadcast(spark):
    train = spark.createDataFrame([(1, "a b c d")], "doc_id: long, text: string")
    bench = spark.createDataFrame([(2, "a b c")], "doc_id: long, text: string")
    out = ngram_contamination(train, bench, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
