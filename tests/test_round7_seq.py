"""Round-7 session-3 operators: sequential statistics (CUSUM drift,
autocorrelation), largest-remainder allocation, multi-source BFS, and
the corpus shard manifest. Each gated query is re-derived here against
a straight-line Python/pandas reference — the recursion forms the
distributed rewrites replaced — so the closed-form identities are
pinned independently of the DuckDB oracle."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row

import __spark_entry__ as entrymod
from bgg_data_warehouse_spark.operators.bfs import bfs_hops
from tests.conftest import SF_SMALL


def _sym_edges(spark, pairs):
    sym = sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in sym])


# ---------------------------------------------------------------------------
# bfs_hops operator
# ---------------------------------------------------------------------------


def test_bfs_path_graph_hops(spark):
    """On a path 1-2-3-4-5 seeded at 1, hop == index distance, and the
    round bound truncates the walk."""
    edges = _sym_edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([Row(v=1)])
    got = {
        r.v: r.hop for r in bfs_hops(edges, seeds, rounds=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is 4 hops out — truncated


def test_bfs_min_hop_wins_on_diamond(spark):
    """A node reachable at hop 1 and hop 2 (diamond 1-2-4, 1-3, 3-4)
    reports the MINIMUM distance, and multi-seed frontiers merge."""
    edges = _sym_edges(spark, [(1, 2), (2, 4), (1, 3), (3, 4)])
    seeds = spark.createDataFrame([Row(v=1)])
    got = {r.v: r.hop for r in bfs_hops(edges, seeds, rounds=3).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}
    # two seeds cover the square in one round
    seeds2 = spark.createDataFrame([Row(v=1), Row(v=4)])
    got2 = {r.v: r.hop for r in bfs_hops(edges, seeds2, rounds=1).collect()}
    assert got2 == {1: 0, 4: 0, 2: 1, 3: 1}


def test_bfs_rejects_zero_rounds(spark):
    edges = _sym_edges(spark, [(1, 2)])
    seeds = spark.createDataFrame([Row(v=1)])
    with pytest.raises(ValueError, match="rounds"):
        bfs_hops(edges, seeds, rounds=0)


def test_bfs_reach_covers_subgraph_exactly_once(spark):
    """The gated summary partitions the %3 subgraph: every node appears
    under exactly one hop label (including -1), so hop counts sum to
    the node count."""
    rows = entrymod.queries()["bfs_reach"](spark, SF_SMALL).collect()
    con = duckdb.connect()
    n_nodes = con.execute(
        f"""
        SELECT count(DISTINCT a.l_partkey)
        FROM '{SF_SMALL}/lineitem.parquet' a
        JOIN '{SF_SMALL}/lineitem.parquet' b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        WHERE a.l_partkey % 3 = 0 AND b.l_partkey % 3 = 0
        """
    ).fetchone()[0]
    assert sum(r.n_nodes for r in rows) == n_nodes
    assert len({r.hop for r in rows}) == len(rows)
    for r in rows:
        assert r.min_part <= r.max_part


# ---------------------------------------------------------------------------
# cusum_drift — closed scan identity vs the textbook recursion
# ---------------------------------------------------------------------------


def test_cusum_scan_identity_matches_recursion(spark):
    """The gated query's s = P - min(0, running_min(P)) must equal the
    literal CUSUM recursion s_i = max(0, s_{i-1} + d_i) replayed in
    Python over the same per-region daily series."""
    rows = entrymod.queries()["cusum_drift"](spark, SF_SMALL).collect()
    con = duckdb.connect()
    daily = con.execute(
        f"""
        SELECT r_name, date_trunc('day', o_orderdate) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS HUGEINT) AS x
        FROM '{SF_SMALL}/orders.parquet'
        JOIN '{SF_SMALL}/customer.parquet' ON o_custkey = c_custkey
        JOIN '{SF_SMALL}/nation.parquet' ON c_nationkey = n_nationkey
        JOIN '{SF_SMALL}/region.parquet' ON n_regionkey = r_regionkey
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list] = {}
    for r_name, day, x in daily:
        series.setdefault(r_name, []).append((day, int(x)))
    expect = {}
    for r_name, pts in series.items():
        n = len(pts)
        s_tot = sum(x for _, x in pts)
        s = 0
        best = (-1, None)  # (cusum, day) — argmax with day asc tiebreak
        for day, x in pts:  # literal recursion
            s = max(0, s + (n * x - s_tot))
            if s > best[0]:
                best = (s, day)
        # duckdb's date_trunc yields date, Spark's a midnight timestamp
        expect[r_name] = (str(best[1])[:10], n, round(best[0] / (100.0 * n), 2))
    got = {
        r.r_name: (str(r.peak_day)[:10], r.n_days, r.peak_cusum_usd)
        for r in rows
    }
    assert got == expect


# ---------------------------------------------------------------------------
# acf_lags — cross-multiplied integers vs a float reference
# ---------------------------------------------------------------------------


def test_acf_matches_float_reference(spark):
    """The integer-exact ACF must agree with the straightforward
    mean-centered float computation to float tolerance, with
    n_pairs == n - lag and |acf| <= 1."""
    rows = entrymod.queries()["acf_lags"](spark, SF_SMALL).collect()
    con = duckdb.connect()
    xs = [
        int(v)
        for (v,) in con.execute(
            f"""
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS HUGEINT)
            FROM '{SF_SMALL}/orders.parquet'
            GROUP BY date_trunc('day', o_orderdate)
            ORDER BY date_trunc('day', o_orderdate)
            """
        ).fetchall()
    ]
    n = len(xs)
    mean = sum(xs) / n
    den = sum((x - mean) ** 2 for x in xs)
    assert len(rows) == 7
    for r in rows:
        k = r.lag
        assert r.n_pairs == n - k
        ref = (
            sum((xs[i] - mean) * (xs[i + k] - mean) for i in range(n - k))
            / den
        )
        assert abs(r.acf - ref) < 1e-6
        assert abs(r.acf) <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# budget_allocation — apportionment invariants
# ---------------------------------------------------------------------------


def test_budget_allocation_sums_exactly_and_floors(spark):
    """Hamilton apportionment: units sum EXACTLY to the budget, every
    base share is the floor of the exact proportional share, and the
    +1s go to the largest remainders."""
    rows = entrymod.queries()["budget_allocation"](spark, SF_SMALL).collect()
    con = duckdb.connect()
    rev = dict(
        con.execute(
            f"""
            SELECT n_name,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS HUGEINT)
            FROM '{SF_SMALL}/orders.parquet'
            JOIN '{SF_SMALL}/customer.parquet' ON o_custkey = c_custkey
            JOIN '{SF_SMALL}/nation.parquet' ON c_nationkey = n_nationkey
            GROUP BY 1
            """
        ).fetchall()
    )
    total = sum(int(v) for v in rev.values())
    assert sum(r.units for r in rows) == 1_000_000
    rem = {}
    for r in rows:
        exact = 1_000_000 * int(rev[r.n_name])
        assert r.base_units == exact // total
        assert r.extra in (0, 1)
        assert r.units == r.base_units + r.extra
        rem[r.n_name] = exact % total
    # every nation given an extra unit out-remainders every nation denied
    # one (ties broken by name, so compare the (rem, reversed-name) key)
    got_extra = {n for n in rem if next(r.extra for r in rows if r.n_name == n)}
    for winner in got_extra:
        for loser in set(rem) - got_extra:
            assert (rem[winner], loser) >= (rem[loser], winner)


# ---------------------------------------------------------------------------
# shard_manifest — contiguity and balance invariants
# ---------------------------------------------------------------------------


def test_shard_manifest_contiguous_and_complete(spark):
    """Shards tile the corpus: doc ranges are disjoint and ordered,
    counts/chars sum to the source totals, and every shard except the
    last starts before its 16k boundary is crossed."""
    rows = sorted(
        entrymod.queries()["shard_manifest"](spark, SF_SMALL).collect(),
        key=lambda r: r.shard,
    )
    con = duckdb.connect()
    n_docs, total_chars = con.execute(
        f"SELECT count(*), SUM(n_chars) FROM '{SF_SMALL}/documents.parquet'"
    ).fetchone()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.total_chars for r in rows) == total_chars
    for prev, nxt in zip(rows, rows[1:]):
        assert prev.max_doc < nxt.min_doc  # disjoint, ordered ranges
    # exclusive-prefix fill: cumulative chars before each shard's first
    # doc land inside that shard's 16k window
    cum = 0
    for r in rows:
        assert cum // 16000 == r.shard
        cum += r.total_chars


# ---------------------------------------------------------------------------
# survival_first_purchase — KM estimator vs a straight-line reference
# ---------------------------------------------------------------------------


def test_km_curve_matches_python_reference(spark):
    """The windowed KM pipeline must equal the textbook estimator
    computed row-by-row in Python: risk sets, event counts, and the
    product-limit survival (via the same micro-nat folds)."""
    import math

    rows = sorted(
        entrymod.queries()["survival_first_purchase"](
            spark, SF_SMALL
        ).collect(),
        key=lambda r: r.dur,
    )
    con = duckdb.connect()
    subj = con.execute(
        f"""
        SELECT date_diff('day', MIN(ts),
                 COALESCE(MIN(CASE WHEN event_type = 'purchase' THEN ts END),
                          MAX(ts))) AS dur,
               CASE WHEN MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                      IS NOT NULL THEN 1 ELSE 0 END AS observed
        FROM '{SF_SMALL}/events.parquet' GROUP BY user_id
        """
    ).fetchall()
    durs = sorted({d for d, _ in subj})
    log_micro = 0
    expect = []
    for t in durs:
        n = sum(1 for d, _ in subj if d >= t)
        d_ev = sum(1 for d, o in subj if d == t and o == 1)
        if d_ev > 0 and n > d_ev:
            log_micro += round(math.log((n - d_ev) / n) * 1_000_000)
            expect.append((t, n, d_ev, log_micro))
    assert [(r.dur, r.n_risk, r.d_event, r.log_surv_micro) for r in rows] == expect
    for r in rows:
        assert abs(r.surv - round(math.exp(r.log_surv_micro / 1e6), 4)) < 1e-12
    # survival is monotone nonincreasing and within (0, 1]
    survs = [r.surv for r in rows]
    assert all(a >= b for a, b in zip(survs, survs[1:]))
    assert all(0 < v <= 1 for v in survs)


# ---------------------------------------------------------------------------
# attribution_last_touch — window rewrite vs brute-force credit
# ---------------------------------------------------------------------------


def test_attribution_matches_bruteforce(spark):
    """The single-window as-of form must credit every purchase exactly
    as the brute-force 'scan all prior touches per purchase' loop."""
    rows = entrymod.queries()["attribution_last_touch"](
        spark, SF_SMALL
    ).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"""
        SELECT user_id, ts, event_id, event_type, CAST(value AS DECIMAL(18,2))
        FROM '{SF_SMALL}/events.parquet'
        WHERE event_type IN ('view','click','signup','purchase')
        """
    ).fetchall()
    from collections import defaultdict
    from datetime import timedelta

    by_user = defaultdict(list)
    for u, ts, eid, et, v in ev:
        by_user[u].append((ts, eid, et, v))
    credit = defaultdict(lambda: [0, 0])
    for u, es in by_user.items():
        touches = [(ts, eid, et) for ts, eid, et, _ in es if et != "purchase"]
        for ts, eid, et, v in es:
            if et != "purchase":
                continue
            cand = [
                (t_ts, t_eid, t_et)
                for t_ts, t_eid, t_et in touches
                if t_ts <= ts and t_ts >= ts - timedelta(days=3)
            ]
            ch = max(cand)[2] if cand else "direct"
            credit[ch][0] += 1
            credit[ch][1] += v
    got = {r.channel: (r.n_purchases, r.attributed_value) for r in rows}
    expect = {
        ch: (n, round(float(total), 2)) for ch, (n, total) in credit.items()
    }
    assert got == expect
    assert sum(n for n, _ in got.values()) == sum(
        1 for es in by_user.values() for e in es if e[2] == "purchase"
    )


# ---------------------------------------------------------------------------
# rolling_regression — windowed integer OLS vs numpy polyfit
# ---------------------------------------------------------------------------


def test_rolling_slope_matches_polyfit(spark):
    """Each full-window slope must match numpy's least-squares fit over
    the same trailing 28 (index, cents) points."""
    import numpy as np

    rows = sorted(
        entrymod.queries()["rolling_regression"](spark, SF_SMALL).collect(),
        key=lambda r: r.day,
    )
    con = duckdb.connect()
    ys = [
        int(v)
        for (v,) in con.execute(
            f"""
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
            FROM '{SF_SMALL}/orders.parquet'
            GROUP BY date_trunc('day', o_orderdate)
            ORDER BY date_trunc('day', o_orderdate)
            """
        ).fetchall()
    ]
    n_days = len(ys)
    assert len(rows) == n_days - 27
    for i, r in enumerate(rows):
        assert r.n_win == 28
        lo = i  # window covers series indices [i, i+27]
        xs = np.arange(lo + 1, lo + 29, dtype=float)
        slope = np.polyfit(xs, np.array(ys[lo : lo + 28], dtype=float), 1)[0]
        assert abs(r.slope_usd_per_day - slope / 100.0) < 1e-3


# ---------------------------------------------------------------------------
# event_debounce — burst-collapse invariants
# ---------------------------------------------------------------------------


def test_debounce_chain_semantics(spark):
    """The REAL gated query must reproduce a straight Python chain walk
    over the parquet streams: per (user, type) ordered by (ts,
    event_id), keep iff first or >= 6h since the previous RAW event —
    counts AND kept-value sums."""
    from collections import defaultdict
    from datetime import timedelta
    from decimal import Decimal

    rows = entrymod.queries()["event_debounce"](spark, SF_SMALL).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"""
        SELECT user_id, event_type, ts, event_id,
               CAST(value AS DECIMAL(18,2))
        FROM '{SF_SMALL}/events.parquet'
        ORDER BY user_id, event_type, ts, event_id
        """
    ).fetchall()
    stats = defaultdict(lambda: [0, 0, Decimal(0)])  # type -> [n, kept, val]
    prev_key, prev_ts = None, None
    for u, et, ts, eid, v in ev:
        st = stats[et]
        st[0] += 1
        if (u, et) != prev_key or ts - prev_ts >= timedelta(hours=6):
            st[1] += 1
            st[2] += v
        prev_key, prev_ts = (u, et), ts
    got = {r.event_type: (r.n_events, r.n_kept, r.kept_value) for r in rows}
    expect = {
        et: (n, k, round(float(val), 2)) for et, (n, k, val) in stats.items()
    }
    assert got == expect


def test_debounce_gate_totals_consistent(spark):
    """Per-type kept counts are bounded by totals and sum to the
    sessionize-style burst count derived independently."""
    rows = entrymod.queries()["event_debounce"](spark, SF_SMALL).collect()
    con = duckdb.connect()
    bursts = dict(
        con.execute(
            f"""
            WITH g AS (
              SELECT event_type,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR
                          THEN 1 ELSE 0 END AS b
              FROM '{SF_SMALL}/events.parquet'
              WINDOW w AS (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id))
            SELECT event_type, CAST(SUM(b) AS BIGINT) FROM g GROUP BY 1
            """
        ).fetchall()
    )
    for r in rows:
        assert 0 < r.n_kept <= r.n_events
        assert r.n_kept == bursts[r.event_type]


# ---------------------------------------------------------------------------
# hits_scores — power-iteration reference
# ---------------------------------------------------------------------------


def test_hits_matches_python_power_iteration(spark):
    """Three un-normalized HITS rounds replayed in pure Python over the
    same edge set must produce identical top-10 scores and ranks."""
    rows = entrymod.queries()["hits_scores"](spark, SF_SMALL).collect()
    con = duckdb.connect()
    edges = con.execute(
        f"""
        SELECT DISTINCT o_custkey, l_partkey
        FROM '{SF_SMALL}/orders.parquet'
        JOIN '{SF_SMALL}/lineitem.parquet' ON o_orderkey = l_orderkey
        """
    ).fetchall()
    from collections import defaultdict

    hub = defaultdict(int)
    for c, _ in edges:
        hub[c] += 1  # h1 = degree (auth0 = 1)
    for _ in range(2):
        auth = defaultdict(int)
        for c, p in edges:
            auth[p] += hub[c]
        hub = defaultdict(int)
        for c, p in edges:
            hub[c] += auth[p]
    auth = defaultdict(int)
    for c, p in edges:
        auth[p] += hub[c]
    top_a = sorted(auth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    top_h = sorted(hub.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got_a = sorted(
        (r.node_id, r.score, r.rn) for r in rows if r.role == "authority"
    )
    got_a.sort(key=lambda t: t[2])
    got_h = sorted(
        (r.node_id, r.score, r.rn) for r in rows if r.role == "hub"
    )
    got_h.sort(key=lambda t: t[2])
    assert got_a == [(n, s, i + 1) for i, (n, s) in enumerate(top_a)]
    assert got_h == [(n, s, i + 1) for i, (n, s) in enumerate(top_h)]


# ---------------------------------------------------------------------------
# random_projection / feature_mi_ranking — embedding feature engineering
# ---------------------------------------------------------------------------


def test_random_projection_exact_python_replay(spark):
    """Projections equal a Python replay of the md5 sign matrix over
    the quantized vectors — and the JL property holds loosely: no
    output dim is identically zero."""
    import hashlib

    rows = entrymod.queries()["random_projection"](spark, SF_SMALL).collect()
    con = duckdb.connect()
    embs = con.execute(
        f"SELECT vec_id, embedding FROM '{SF_SMALL}/embeddings.parquet'"
    ).fetchall()

    def fold2(s):
        h = hashlib.md5(s.encode()).hexdigest()
        acc = 0
        for i in range(4):
            acc = acc * 256 + ord(h[i])
        return acc % 2

    signs = {
        (d, i): 1 if fold2(f"{d}_{i}") == 0 else -1
        for d in range(8)
        for i in range(64)
    }
    expect = {}
    for vid, vec in embs:
        q = [round(float(x) * 1_000_000) for x in vec]
        for d in range(8):
            expect[(vid, d)] = sum(signs[(d, i)] * q[i] for i in range(64))
    got = {(r.vec_id, r.dim): r.proj for r in rows}
    assert got == expect
    for d in range(8):
        assert any(expect[(v, d)] != 0 for v, _ in embs)


def test_feature_mi_ranking_properties(spark):
    """MI scores are nonnegative-ish in aggregate (each dim's scaled MI
    can only be negative by micro-nat rounding jitter), ranks are a
    permutation of 1..64, and a label-shuffled control scores below the
    top-ranked real dim."""
    rows = entrymod.queries()["feature_mi_ranking"](spark, SF_SMALL).collect()
    assert len(rows) == 64
    assert sorted(r.rank for r in rows) == list(range(1, 65))
    assert sorted(r.dim for r in rows) == list(range(64))
    # micro-nat rounding can dip a truly-independent dim a hair below
    # zero; anything strongly negative would mean a broken estimator
    assert all(r.mi_scaled_micro > -1000 for r in rows)
    assert max(r.mi_scaled_micro for r in rows) > 0
