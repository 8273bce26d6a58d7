"""Int8 embedding quantization + quantized search (operators/quantization.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_quantize_matches_numpy_and_bounds(spark):
    np = pytest.importorskip("numpy")
    from bgg_data_warehouse_spark.operators.quantization import (
        quantize_embeddings,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    out = quantize_embeddings(emb, "vec_id", "embedding").collect()
    raw = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    scale = max(float(np.abs(v).max()) for v in raw.values())
    for r in out:
        assert r.scale == pytest.approx(scale, abs=0.0)
        expect = np.round(raw[r.id] / scale * 127).astype(np.int64)
        assert list(expect) == list(r.qv)
        assert max(abs(v) for v in r.qv) <= 127
    # reconstruction error bounded by half a quantization step
    step = scale / 127
    for r in out:
        err = np.abs(np.array(r.qv) * step - raw[r.id]).max()
        assert err <= step / 2 + 1e-12


def test_quantized_topk_recall_vs_float_bruteforce(spark):
    """The quantized ranking is an approximation of float cosine on
    (near-)unit vectors: recall@5 against knn_bruteforce must be high
    on the real fixture, and the quantized ranking itself must be
    partition-invariant."""
    from bgg_data_warehouse_spark.operators.quantization import (
        quantize_embeddings,
        quantized_topk,
    )
    from bgg_data_warehouse_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    qv = quantize_embeddings(emb, "vec_id", "embedding")
    quant = quantized_topk(qv.where(F.col("id") < 10), qv, k=5)
    got = {}
    for r in quant.collect():
        got.setdefault(r.query_id, set()).add(r.nbr_id)
    exact = {}
    for r in brute_force_topk(
        emb.where(F.col("vec_id") < 10), emb, "vec_id", "embedding", k=5
    ).collect():
        exact.setdefault(r.query_id, set()).add(r.nbr_id)
    hits = sum(len(got[q] & exact[q]) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.8, (hits, total)
    again = {}
    for r in quantized_topk(
        qv.where(F.col("id") < 10).repartition(7), qv.repartition(13), k=5
    ).collect():
        again.setdefault(r.query_id, set()).add(r.nbr_id)
    assert again == got


def test_quantize_all_zero_corpus_fails_loudly(spark):
    # ADVICE r05: scale=0 must raise, never silently emit NULL/NaN qv.
    import pytest

    from bgg_data_warehouse_spark.operators.quantization import (
        quantize_embeddings,
    )

    zeros = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0])], "id2 long, v array<double>"
    )
    with pytest.raises(Exception) as ei:
        quantize_embeddings(zeros, "id2", "v").collect()
    assert "cannot quantize" in str(ei.value)
