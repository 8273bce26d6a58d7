"""kmeans_quantized + pagerank_integer: semantic fixed cases, a numpy
reference model, and partitioning-invariance (the 1000-executor
determinism claim both operators are built on)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bgg_data_warehouse_spark.operators.clustering import kmeans_quantized
from bgg_data_warehouse_spark.operators.pagerank import pagerank_integer


def _vec_rows(spark, rows):
    return spark.createDataFrame(rows, "id long, vec array<double>")


class TestKmeans:
    def test_recovers_separated_clusters(self, spark):
        # two tight blobs far apart; seeds (lowest 2 ids) land one per blob
        blob_a = [(i, [0.0 + i * 0.001, 0.0]) for i in range(0, 10, 2)]
        blob_b = [(i, [9.0 + i * 0.001, 9.0]) for i in range(1, 11, 2)]
        out = kmeans_quantized(
            _vec_rows(spark, blob_a + blob_b), "id", "vec", k=2, iters=2
        ).collect()
        by_cluster: dict[int, set[int]] = {}
        for r in out:
            by_cluster.setdefault(r["cluster"], set()).add(r["id"])
        assert sorted(len(v) for v in by_cluster.values()) == [5, 5]
        assert {frozenset(v) for v in by_cluster.values()} == {
            frozenset(range(0, 10, 2)),
            frozenset(range(1, 11, 2)),
        }

    def test_matches_numpy_lloyd(self, spark):
        np = pytest.importorskip("numpy")
        rng = np.random.RandomState(7)
        data = rng.standard_normal((60, 8))
        rows = [(i, [float(x) for x in data[i]]) for i in range(60)]
        k, iters, scale = 4, 2, 1000
        q = np.round(data * scale).astype(np.int64)
        cents = {i: q[i].copy() for i in range(k)}
        assign = {}
        for it in range(iters + 1):
            for i in range(60):
                best = min(
                    cents.items(),
                    key=lambda kv: (int(((q[i] - kv[1]) ** 2).sum()), kv[0]),
                )
                assign[i] = best[0]
            if it == iters:
                break
            new = {}
            for c in set(assign.values()):
                members = np.stack([q[i] for i in assign if assign[i] == c])
                new[c] = np.floor(
                    members.sum(axis=0) / len(members)
                ).astype(np.int64)
            cents = new
        out = kmeans_quantized(
            _vec_rows(spark, rows), "id", "vec", k=k, iters=iters, scale=scale
        ).collect()
        got = {r["id"]: r["cluster"] for r in out}
        assert got == assign

    def test_partitioning_invariant(self, spark):
        rows = [(i, [float(i % 7), float(i % 3)]) for i in range(40)]
        df = _vec_rows(spark, rows)
        a = {
            (r["id"], r["cluster"], r["dist"])
            for r in kmeans_quantized(df.repartition(1), "id", "vec", k=3).collect()
        }
        b = {
            (r["id"], r["cluster"], r["dist"])
            for r in kmeans_quantized(df.repartition(13), "id", "vec", k=3).collect()
        }
        assert a == b


class TestPagerank:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    def test_hub_ranks_highest(self, spark):
        # star: every leaf points at hub, hub points at one leaf
        pairs = [(f"leaf{i}", "hub") for i in range(10)] + [("hub", "leaf0")]
        out = pagerank_integer(self._edges(spark, pairs), "src", "dst").collect()
        ranks = {r["node"]: r["rank"] for r in out}
        assert max(ranks, key=ranks.get) == "hub"
        assert ranks["leaf0"] > ranks["leaf1"]  # hub's mass flows to leaf0

    def test_dangling_nodes_keep_base(self, spark):
        out = pagerank_integer(
            self._edges(spark, [("a", "b")]), "src", "dst", rounds=1
        ).collect()
        ranks = {r["node"]: r["rank"] for r in out}
        # b never emits; a receives nothing -> base rank only
        assert ranks["a"] == 150_000
        assert ranks["b"] == 150_000 + 1_000_000 * 85 // 100

    def test_partitioning_invariant(self, spark):
        import random

        rnd = random.Random(5)
        pairs = [
            (f"n{rnd.randrange(30)}", f"n{rnd.randrange(30)}") for _ in range(120)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        df = self._edges(spark, pairs)
        a = {
            (r["node"], r["rank"])
            for r in pagerank_integer(df.repartition(1), "src", "dst").collect()
        }
        b = {
            (r["node"], r["rank"])
            for r in pagerank_integer(df.repartition(11), "src", "dst").collect()
        }
        assert a == b

    def test_rank_is_exact_long(self, spark):
        out = pagerank_integer(
            self._edges(spark, [("a", "b"), ("b", "a")]), "src", "dst", rounds=2
        )
        assert dict(out.dtypes)["rank"] == "bigint"
        # symmetric 2-cycle: both nodes identical at every round
        vals = {r["rank"] for r in out.collect()}
        assert len(vals) == 1


class TestSemanticDedup:
    def test_prunes_within_cluster_keeps_across(self, spark):
        """Two tight blobs (k=2): near-identical vectors inside a blob
        prune down to the lowest id; parallel (cosine-similar) vectors
        that land in DIFFERENT clusters are both kept — pruning is
        cluster-scoped by design."""
        from bgg_data_warehouse_spark.operators.clustering import semantic_dedup

        rows = [
            (0, [1.0, 0.0]),      # blob A seed
            (1, [50.0, 50.0]),    # blob B seed
            (2, [1.01, 0.0]),     # near-dup of 0 (same cluster) -> pruned
            (3, [50.5, 50.5]),    # near-dup of 1 (same cluster) -> pruned
            (4, [0.0, 1.0]),      # blob A, orthogonal to 0 -> kept
        ]
        out = {
            r.id: (r.cluster, r.kept)
            for r in semantic_dedup(
                _vec_rows(spark, rows), "id", "vec", k=2, iters=2,
                threshold=0.99,
            ).collect()
        }
        assert len(out) == 5
        assert out[0][1] == 1 and out[1][1] == 1  # lowest ids kept
        assert out[2][1] == 0 and out[3][1] == 0  # higher-id near-dups pruned
        assert out[4][1] == 1  # dissimilar cluster-mate kept
        assert out[2][0] == out[0][0] and out[3][0] == out[1][0]

    def test_matches_numpy_reference_on_fixture(self, spark):
        """(cluster, kept) must equal a numpy replay (same integer
        k-means + within-cluster cosine + keep-first rule) on the real
        embeddings fixture."""
        np = pytest.importorskip("numpy")
        from bgg_data_warehouse_spark.operators.clustering import semantic_dedup
        from tests.conftest import SF_SMALL

        emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        got = {
            r.id: (r.cluster, r.kept)
            for r in semantic_dedup(
                emb, "vec_id", "embedding", k=4, iters=2, scale=1000,
                threshold=0.35,
            ).collect()
        }
        rows = sorted(
            (r.vec_id, np.array(r.embedding, dtype=np.float64))
            for r in emb.collect()
        )
        ids = [i for i, _ in rows]
        q = np.stack([np.round(v * 1000) for _, v in rows]).astype(np.int64)
        # iters+1 assignment passes with iters centroid updates between
        # them — the operator assigns against the centroids left after
        # `iters` updates.
        cents = {ids[j]: q[j].copy() for j in range(4)}
        assign = {}
        for it in range(3):
            assign = {}
            for j, i in enumerate(ids):
                best = min(
                    (int(((q[j] - cv) ** 2).sum()), c)
                    for c, cv in cents.items()
                )
                assign[i] = best[1]
            if it < 2:
                members = {}
                for j, i in enumerate(ids):
                    members.setdefault(assign[i], []).append(j)
                cents = {
                    c: np.floor(q[js].sum(axis=0) / len(js)).astype(np.int64)
                    for c, js in members.items()
                }
        vecs = {i: v for i, v in rows}
        pruned = set()
        for j, i in enumerate(ids):
            for j2, i2 in enumerate(ids):
                if i2 >= i or assign[i2] != assign[i]:
                    continue
                a, b = vecs[i], vecs[i2]
                cos = float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
                if cos >= 0.35:
                    pruned.add(i)
                    break
        expect = {i: (assign[i], 0 if i in pruned else 1) for i in ids}
        assert got == expect
