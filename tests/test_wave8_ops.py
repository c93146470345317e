"""Wave-8 operators (one-way ANOVA, MMR re-rank) vs python brute force."""

from __future__ import annotations


def test_anova_oneway_matches_numpy(spark):
    from graphlite_spark.operators.analytics import anova_oneway

    rows = [
        ("a", 1.00), ("a", 2.00), ("a", 3.00),
        ("b", 4.00), ("b", 5.00), ("b", 6.00), ("b", 7.00),
        ("c", 1.50), ("c", 1.50),
    ]
    events = spark.createDataFrame(
        rows, "event_type string, value double"
    )
    got = anova_oneway(events).collect()[0]
    # hand computation in exact cents
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(round(v * 100))
    n_tot = sum(len(v) for v in groups.values())
    s_tot = sum(sum(v) for v in groups.values())
    q_tot = sum(sum(x * x for x in v) for v in groups.values())
    sb_terms = sum(sum(v) ** 2 // len(v) for v in groups.values())
    ssb = sb_terms - (s_tot * s_tot) // n_tot
    ssw = q_tot - sb_terms
    g = len(groups)
    assert got["n_groups"] == g
    assert got["n_total"] == n_tot
    assert got["ssb_cents2"] == ssb
    assert got["ssw_cents2"] == ssw
    assert got["f_stat_micros"] == (
        1_000_000 * ssb * (n_tot - g)
    ) // (ssw * (g - 1))
    assert got["eta_sq_micros"] == 1_000_000 * ssb // (ssb + ssw)
    # cross-check F against the float formula (micros within 1)
    msb = ssb / (g - 1)
    msw = ssw / (n_tot - g)
    assert abs(got["f_stat_micros"] / 1e6 - msb / msw) < 2e-6


def test_anova_oneway_single_group_null_f(spark):
    from graphlite_spark.operators.analytics import anova_oneway

    events = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "event_type string, value double"
    )
    got = anova_oneway(events).collect()[0]
    assert got["n_groups"] == 1
    assert got["f_stat_micros"] is None


def test_mmr_topk_diversifies(spark):
    from graphlite_spark.operators.similarity import mmr_topk

    # two tight clusters around the centroid: nearest-first would take
    # both members of the near twin-pair; MMR must split across clusters
    vecs = [
        (1, [0.10, 0.00]),   # near cluster A
        (2, [0.11, 0.00]),   # near cluster A (twin of 1)
        (3, [-0.12, 0.00]),  # cluster B, slightly farther
        (4, [0.00, 0.50]),   # far outlier
    ]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    )
    got = mmr_topk(emb, k=3, shortlist=4, lam_milli=500)
    rows = {r["rank"]: r for r in got.collect()}
    picked = [rows[i]["vec_id"] for i in sorted(rows)]
    # brute-force replica of the greedy in exact micros
    cents = [
        sum(round(v[j] * 1e6) for _, v in vecs) for j in range(2)
    ]
    cent = [
        (abs(c) // len(vecs)) * (1 if c >= 0 else -1) for c in cents
    ]
    q = {
        i: [round(v[j] * 1e6) for j in range(2)] for i, v in vecs
    }
    dq = {
        i: sum((q[i][j] - cent[j]) ** 2 for j in range(2)) for i in q
    }
    sel = []
    for _ in range(3):
        best = None
        for i in q:
            if i in sel:
                continue
            if sel:
                mind = min(
                    sum((q[i][j] - q[s][j]) ** 2 for j in range(2))
                    for s in sel
                )
                score = 500 * dq[i] - 500 * mind
            else:
                score = 500 * dq[i]
            if best is None or (score, i) < best:
                best = (score, i)
        sel.append(best[1])
    assert picked == sel
    # the twin pair (1, 2) must NOT both be picked at lambda = 0.5
    assert not ({1, 2} <= set(picked))
    assert rows[1]["mmr_score"] == 500 * dq[sel[0]]


def test_mmr_topk_lambda_one_is_nearest_first(spark):
    from graphlite_spark.operators.similarity import mmr_topk

    vecs = [(i, [float(i) / 10.0, 0.0]) for i in range(1, 7)]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    )
    got = mmr_topk(emb, k=3, shortlist=6, lam_milli=1000)
    by_rank = [
        r["vec_id"] for r in sorted(got.collect(), key=lambda r: r["rank"])
    ]
    nearest = mmr_topk(emb, k=6, shortlist=6, lam_milli=1000)
    dqs = {r["vec_id"]: r["dist_q"] for r in nearest.collect()}
    expect = sorted(dqs, key=lambda i: (dqs[i], i))[:3]
    assert by_rank == expect


def test_spearman_matches_scipy_formula(spark):
    from graphlite_spark.operators.analytics import spearman_activity_value

    # users with (count, value) pairs incl. ties in both margins
    rows = []
    data = {
        1: [1.0, 2.0, 3.0],          # cnt 3, val 600
        2: [5.0],                    # cnt 1, val 500
        3: [2.0, 2.0, 2.0],          # cnt 3 (tie), val 600 (tie)
        4: [1.0, 1.0],               # cnt 2, val 200
        5: [10.0, 10.0, 10.0, 1.0],  # cnt 4, val 3100
    }
    for u, vals in data.items():
        for v in vals:
            rows.append((u, v))
    events = spark.createDataFrame(rows, "user_id long, value double")
    got = spearman_activity_value(events).collect()[0]
    # reference: average ranks + Pearson, in pure python
    cnts = {u: len(v) for u, v in data.items()}
    vals = {u: round(sum(v) * 100) for u, v in data.items()}

    def avg_ranks(m):
        s = sorted(m.values())
        return {
            u: (s.index(x) + 1 + s.index(x) + s.count(x)) / 2
            for u, x in m.items()
        }

    rx = avg_ranks(cnts)
    ry = avg_ranks(vals)
    n = len(data)
    sx = sum(rx.values()); sy = sum(ry.values())
    sxx = sum(x * x for x in rx.values())
    syy = sum(y * y for y in ry.values())
    sxy = sum(rx[u] * ry[u] for u in data)
    import math
    rho = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert got["n_users"] == n
    assert abs(got["rho_spearman"] - rho) < 1e-6
    # doubled-rank identities
    assert got["num_xy"] == round(4 * (n * sxy - sx * sy))
    assert got["den_x"] == round(4 * (n * sxx - sx * sx))


def test_spearman_perfect_monotone(spark):
    from graphlite_spark.operators.analytics import spearman_activity_value

    rows = []
    for u in range(1, 6):
        for _ in range(u):
            rows.append((u, float(u)))
    events = spark.createDataFrame(rows, "user_id long, value double")
    got = spearman_activity_value(events).collect()[0]
    assert got["rho_spearman"] == 1.0


def test_binseg_finds_level_shift(spark):
    from graphlite_spark.operators.analytics import binseg_changepoint
    from datetime import datetime, timedelta

    # 6 days at ~2/day then 6 days at ~10/day: split must land at x=5
    rows = []
    base = datetime(2026, 1, 1)
    counts = [2, 2, 2, 2, 2, 2, 10, 10, 10, 10, 10, 10]
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + timedelta(days=d, hours=1)))
            eid += 1
    events = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = binseg_changepoint(events).collect()[0]
    assert got["n_days"] == 12
    assert got["split_x"] == 5
    assert got["sse_split_micros"] == 0
    assert got["mean_left_micros"] == 2_000_000
    assert got["mean_right_micros"] == 10_000_000
    assert got["gain_micros"] == got["sse_total_micros"]
    # sse_total = 1e6*Q - (1e6*S^2) div D exactly
    s = sum(counts); q = sum(c * c for c in counts)
    assert got["sse_total_micros"] == 1_000_000 * q - (
        1_000_000 * s * s
    ) // 12


def test_binseg_brute_force_parity(spark):
    from graphlite_spark.operators.analytics import binseg_changepoint
    from datetime import datetime, timedelta

    rows = []
    base = datetime(2026, 3, 1)
    counts = [5, 1, 4, 4, 9, 2, 8, 3]
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + timedelta(days=d, hours=3)))
            eid += 1
    events = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = binseg_changepoint(events).collect()[0]

    def sse(seg):
        s = sum(seg); q = sum(x * x for x in seg)
        return 1_000_000 * q - (1_000_000 * s * s) // len(seg)

    best = min(
        (sse(counts[: x + 1]) + sse(counts[x + 1 :]), x)
        for x in range(len(counts) - 1)
    )
    assert (got["sse_split_micros"], got["split_x"]) == best


def test_shapley_attribution_axioms(spark):
    from graphlite_spark.operators.temporal import shapley_attribution
    from math import factorial

    # channels a, b, c; conversion type 'buy'
    # u1 touched {a}, converted; u2 touched {a,b}, converted;
    # u3 touched {b}, not converted; u4 touched {c}, converted;
    # u5 converted with no touches (baseline v(empty))
    rows = []
    touches = {
        1: (["a"], True),
        2: (["a", "b"], True),
        3: (["b"], False),
        4: (["c"], True),
        5: ([], True),
    }
    for u, (ts, conv) in touches.items():
        for t in ts:
            rows.append((u, t))
        if conv:
            rows.append((u, "buy"))
    events = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {
        r["channel"]: r
        for r in shapley_attribution(events, conversion_type="buy").collect()
    }
    assert set(got) == {"a", "b", "c"}
    n = 3
    # brute-force Shapley from first principles
    masks = {"a": 1, "b": 2, "c": 4}
    conv_masks = [1, 3, 4, 0]  # u1, u2, u4, u5

    def v(S):
        return sum(1 for m in conv_masks if m & ~S == 0)

    for ch, bit in masks.items():
        phi = 0
        for S in range(8):
            if S & bit:
                continue
            k = bin(S).count("1")
            phi += factorial(k) * factorial(n - 1 - k) * (v(S | bit) - v(S))
        assert got[ch]["phi_num"] == phi, ch
        assert got[ch]["phi_micros"] == 1_000_000 * phi // factorial(n)
    # efficiency: sum phi_num == n! * (v(all) - v(empty))
    assert sum(r["phi_num"] for r in got.values()) == factorial(n) * (
        v(7) - v(0)
    )
    # full-claim axiom: u4 is reachable only through c, so c is paid
    # exactly that one conversion: phi_c = 1, i.e. phi_num = n!
    assert got["c"]["phi_num"] == factorial(n)


def test_shapley_channel_guard(spark):
    import pytest
    from graphlite_spark.operators.temporal import shapley_attribution

    rows = [(1, f"t{i}") for i in range(15)] + [(1, "buy")]
    events = spark.createDataFrame(rows, "user_id long, event_type string")
    with pytest.raises(ValueError, match="max_channels"):
        shapley_attribution(events, conversion_type="buy")


def test_forecast_backtest_mase_hand(spark):
    from graphlite_spark.operators.analytics import forecast_backtest_mase
    from datetime import datetime, timedelta

    counts = [4, 8, 2, 6, 10]
    rows = []
    base = datetime(2026, 5, 1)
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + timedelta(days=d, hours=2)))
            eid += 1
    events = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = forecast_backtest_mase(events, 1, 4).collect()[0]
    # replicate: ewma s_t = (1e6*y_t + 3*s_{t-1}) div 4, resid = 1e6*y_t - s_{t-1}
    s = 1_000_000 * counts[0]
    se = 0
    sn = 0
    for t in range(1, len(counts)):
        se += abs(1_000_000 * counts[t] - s)
        sn += 1_000_000 * abs(counts[t] - counts[t - 1])
        raw = 1_000_000 * counts[t] + 3 * s
        s = (raw - raw % 4) // 4
    assert got["n_days"] == 5
    assert got["mae_naive_micros"] == sn // 4
    assert got["mae_ewma_micros"] == se // 4
    assert got["mase_micros"] == (1_000_000 * se) // sn


def test_ann_ndcg_hand(spark):
    from graphlite_spark.operators.similarity import ann_ndcg, _ndcg_weights

    # 1D line: query 1 (label 0) at 0.0; neighbors at increasing
    # distance with labels [0, 1, 0, 1] -> relevant at ranks 1 and 3
    vecs = [
        (1, [0.00], 0),
        (2, [0.10], 0),
        (3, [0.20], 1),
        (4, [0.30], 0),
        (5, [0.40], 1),
    ]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r["query_id"]: r
        for r in ann_ndcg(emb, n_queries=1, k=3).collect()
    }
    w = _ndcg_weights(3)
    r1 = got[1]
    assert r1["n_rel"] == 2  # vecs 2 and 4 share label 0
    assert r1["dcg"] == w[0] + w[2]  # relevant at ranks 1 and 3
    assert r1["idcg"] == w[0] + w[1]  # ideal puts both at front
    assert r1["ndcg_micros"] == (1_000_000 * (w[0] + w[2])) // (
        w[0] + w[1]
    )


def test_ann_ndcg_perfect_retrieval(spark):
    from graphlite_spark.operators.similarity import ann_ndcg

    # two tight clusters far apart: same-label neighbors always rank
    # first, so NDCG is exactly 1 for every query
    vecs = []
    for i in range(4):
        vecs.append((i, [0.0 + 0.01 * i], 0))
    for i in range(4, 8):
        vecs.append((i, [5.0 + 0.01 * i], 1))
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    rows = ann_ndcg(emb, n_queries=8, k=3).collect()
    assert len(rows) == 8
    assert all(r["ndcg_micros"] == 1_000_000 for r in rows)


def test_rbo_identical_and_disjoint(spark):
    from graphlite_spark.operators.analytics import rbo_activity_value

    # users where activity rank == value rank exactly (u1 most active
    # and biggest spender, etc.) -> overlap_d = d at every depth
    rows = []
    for u in range(1, 7):
        for _ in range(7 - u):
            rows.append((u, float(10 - u)))
    events = spark.createDataFrame(rows, "user_id long, value double")
    got = rbo_activity_value(events, depth=5).collect()
    assert [r["overlap"] for r in got] == [1, 2, 3, 4, 5]
    # terms: (1e6 * 1 * 9^(d-1) * d) // (10^d * d) = 1e6 * 9^(d-1) // 10^d
    cum = 0
    for r in got:
        d = r["d"]
        term = (1_000_000 * 9 ** (d - 1) * d) // (10 ** d * d)
        assert r["term_micros"] == term
        cum += term
        assert r["rbo_cum_micros"] == cum


def test_rbo_reversed_rankings_low(spark):
    from graphlite_spark.operators.analytics import rbo_activity_value

    # activity rank is the exact REVERSE of value rank: top-1 sets are
    # disjoint, overlap grows only when prefixes meet in the middle
    rows = []
    n = 6
    for u in range(1, n + 1):
        count = n + 1 - u  # u1 most active
        val = float(u)     # u6 biggest spender (one event each suffices)
        for i in range(count):
            rows.append((u, val / count))
    events = spark.createDataFrame(rows, "user_id long, value double")
    got = {r["d"]: r["overlap"] for r in
           rbo_activity_value(events, depth=6).collect()}
    assert got[1] == 0
    assert got[6] == 6
    assert got[3] == 0  # top-3 by activity = {1,2,3}; by value = {6,5,4}
    assert got[4] == 2  # prefixes {1..4} and {6..3} share {3,4}


def test_spectral_gap_complete_graph(spark):
    from graphlite_spark.algos.centrality import spectral_gap_lambda2

    # K5: walk-matrix spectrum is {1, -1/4 x4} -> SLEM = -0.25
    pairs = [(a, b) for a in range(5) for b in range(5) if a < b]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = spectral_gap_lambda2(edges, iterations=8).collect()[0]
    assert got["n_vertices"] == 5
    assert got["n_edges_und"] == 10
    assert abs(got["slem_micros"] - (-250_000)) <= 2
    assert got["gap_micros"] == 1_000_000 - abs(got["slem_micros"])


def test_spectral_gap_two_components(spark):
    from graphlite_spark.algos.centrality import spectral_gap_lambda2

    # two disjoint triangles: a second eigenvalue-1 direction (the
    # component contrast) dominates -> SLEM = +1, zero gap
    pairs = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = spectral_gap_lambda2(edges, iterations=16).collect()[0]
    assert abs(got["slem_micros"] - 1_000_000) <= 5
    assert abs(got["gap_micros"]) <= 5


def test_spectral_gap_path_bipartite(spark):
    import numpy as np
    from graphlite_spark.algos.centrality import spectral_gap_lambda2

    # a path is bipartite: the walk is periodic, SLEM = -1 (zero gap,
    # never mixes) - verify the signed value against numpy's extreme
    # eigenvalue of the exact column-stochastic matrix
    n = 12
    path = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(path, "src long, dst long")
    got = spectral_gap_lambda2(edges, iterations=24).collect()[0]

    A = np.zeros((n, n))
    for a, b in path:
        A[a, b] = A[b, a] = 1.0
    P = A / A.sum(axis=0, keepdims=True)  # column-stochastic
    ev = np.sort(np.linalg.eigvals(P).real)
    # convergence is geometric at |ev2/ev1| = cos(pi/11) ~ 0.959, so
    # 24 rounds land within ~0.96^24 ~ 0.36 of -1; assert the sign,
    # the magnitude band, and the no-mixing verdict rather than 6dp
    assert abs(got["slem_micros"] / 1e6 - ev[0]) < 0.15  # ev[0] = -1
    assert got["slem_micros"] < -850_000
    assert got["gap_micros"] < 150_000  # periodic chain: no mixing


def test_spectral_gap_star_fast_mixer(spark):
    import numpy as np
    from graphlite_spark.algos.centrality import spectral_gap_lambda2

    # barbell: two K4s joined by one edge - the bottleneck pushes a
    # POSITIVE eigenvalue near 1; verify against numpy
    k4a = [(a, b) for a in range(4) for b in range(4) if a < b]
    k4b = [(a + 10, b + 10) for a, b in k4a]
    bridge = [(3, 10)]
    pairs = k4a + k4b + bridge
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = spectral_gap_lambda2(edges, iterations=24).collect()[0]

    ids = sorted({v for e in pairs for v in e})
    ix = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for a, b in pairs:
        A[ix[a], ix[b]] = A[ix[b], ix[a]] = 1.0
    P = A / A.sum(axis=0, keepdims=True)
    ev = np.sort(np.linalg.eigvals(P).real)[::-1]
    slem = ev[1] if abs(ev[1]) >= abs(np.sort(
        np.linalg.eigvals(P).real)[0]) else np.sort(
        np.linalg.eigvals(P).real)[0]
    assert abs(got["slem_micros"] / 1e6 - slem) < 0.02
    assert got["slem_micros"] > 800_000  # bottleneck: slow mixing


def test_decision_stump_separating_dim(spark):
    from graphlite_spark.operators.similarity import decision_stump_dims

    # dim 0 perfectly separates the labels around the centroid;
    # dim 1 is pure noise (identical distribution across labels)
    vecs = [
        (1, [-0.5, 0.3], 0),
        (2, [-0.4, -0.3], 0),
        (3, [-0.6, 0.3], 0),
        (4, [0.5, -0.3], 1),
        (5, [0.4, 0.3], 1),
        (6, [0.6, -0.3], 1),
    ]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    got = decision_stump_dims(emb, k=2).collect()
    by_rank = sorted(got, key=lambda r: r["rank"])
    assert by_rank[0]["pos"] == 0
    assert by_rank[0]["gini_weighted_micros"] == 0  # pure split
    assert by_rank[0]["n_left"] == 3 and by_rank[0]["n_right"] == 3
    # the noise dim: each side holds a 2/1 label mix -> gini 4/9 per
    # side, weighted 4/9; trunc micros: 1e6 - (5e6 // 9) = 444445
    assert by_rank[1]["pos"] == 1
    assert by_rank[1]["gini_weighted_micros"] == 444_445


def test_decision_stump_matches_bruteforce(spark):
    from graphlite_spark.operators.similarity import decision_stump_dims

    vecs = [
        (i, [((i * 7) % 5) / 10.0, ((i * 3) % 4) / 10.0,
             ((i * 11) % 6) / 10.0], i % 3)
        for i in range(1, 25)
    ]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r["pos"]: r for r in decision_stump_dims(emb, k=3).collect()
    }
    # brute force in exact micros
    n = len(vecs)
    d = 3
    q = {i: [round(v[j] * 1e6) for j in range(d)] for i, v, _ in vecs}
    labels = {i: l for i, _, l in vecs}
    cent = []
    for j in range(d):
        s = sum(q[i][j] for i in q)
        cent.append((abs(s) // n) * (1 if s >= 0 else -1))
    for j in range(d):
        sides = {1: {}, 0: {}}
        for i in q:
            side = 1 if q[i][j] <= cent[j] else 0
            sides[side][labels[i]] = sides[side].get(labels[i], 0) + 1
        parts = {}
        for side in (1, 0):
            ns = sum(sides[side].values())
            qs = sum(c * c for c in sides[side].values())
            parts[side] = (
                ns,
                1_000_000 - (1_000_000 * qs) // (ns * ns) if ns else 0,
            )
        nl, gl = parts[1]
        nr, gr = parts[0]
        expect = (nl * gl + nr * gr) // (nl + nr)
        if j in got:
            assert got[j]["gini_weighted_micros"] == expect, j
            assert got[j]["n_left"] == nl and got[j]["n_right"] == nr


def test_seg_vopt_three_levels(spark):
    from graphlite_spark.operators.analytics import seg_vopt_daily
    from datetime import datetime, timedelta

    # three clean plateaus: DP must find both true breakpoints exactly
    counts = [2] * 4 + [9] * 5 + [4] * 4
    rows = []
    base = datetime(2026, 2, 1)
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + timedelta(days=d, hours=4)))
            eid += 1
    events = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = sorted(seg_vopt_daily(events).collect(), key=lambda r: r["seg"])
    assert [(r["start_x"], r["end_x"]) for r in got] == [
        (0, 3), (4, 8), (9, 12)
    ]
    assert [r["sse_micros"] for r in got] == [0, 0, 0]
    assert [r["mean_micros"] for r in got] == [
        2_000_000, 9_000_000, 4_000_000
    ]


def test_seg_vopt_matches_bruteforce_dp(spark):
    from graphlite_spark.operators.analytics import seg_vopt_daily
    from datetime import datetime, timedelta

    counts = [5, 1, 4, 9, 2, 8, 3, 7, 6, 1]
    rows = []
    base = datetime(2026, 4, 1)
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + timedelta(days=d, hours=5)))
            eid += 1
    events = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = sorted(seg_vopt_daily(events).collect(), key=lambda r: r["seg"])

    def sse(a, b):
        seg = counts[a : b + 1]
        s, q, n = sum(seg), sum(x * x for x in seg), len(seg)
        return 1_000_000 * q - (1_000_000 * s * s) // n

    best = min(
        (
            sse(0, i) + sse(i + 1, j) + sse(j + 1, len(counts) - 1),
            i,
            j,
        )
        for i in range(len(counts) - 2)
        for j in range(i + 1, len(counts) - 1)
    )
    assert (got[0]["end_x"], got[1]["end_x"]) == (best[1], best[2])
    assert sum(r["sse_micros"] for r in got) == best[0]


def test_layer_multiplexity_hand(spark):
    from graphlite_spark.operators.temporal import layer_multiplexity

    # type a stream: users 1,2,3 -> edges {1-2, 2-3}
    # type b stream: users 1,2,1 -> edges {1-2}
    rows = [
        (1, "a", 1, 100), (2, "a", 2, 200), (3, "a", 3, 300),
        (4, "b", 1, 100), (5, "b", 2, 200), (6, "b", 1, 300),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long, ts_us long"
    )
    got = layer_multiplexity(events).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["type_a"], r["type_b"]) == ("a", "b")
    assert (r["n_a"], r["n_b"], r["n_common"]) == (2, 1, 1)
    # jaccard = 1 / (2 + 1 - 1) = 0.5
    assert r["jaccard_micros"] == 500_000


def test_diff_in_diff_hand(spark):
    from graphlite_spark.operators.analytics import diff_in_diff
    from datetime import datetime, timedelta

    # 4 days: treat 2/day pre -> 6/day post (+4); ctrl 3/day -> 4/day
    # (+1, the common shock). DiD = +3/day.
    base = datetime(2026, 6, 1)
    rows = []
    eid = 0
    plan = {0: {"t": 2, "c": 3}, 1: {"t": 2, "c": 3},
            2: {"t": 6, "c": 4}, 3: {"t": 6, "c": 4}}
    for d, spec in plan.items():
        for _ in range(spec["t"]):
            rows.append((eid, "purchase", base + timedelta(days=d)))
            eid += 1
        for _ in range(spec["c"]):
            rows.append((eid, "click", base + timedelta(days=d)))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    got = diff_in_diff(events).collect()[0]
    assert got["n_days"] == 4 and got["split_x"] == 2
    assert got["pre_treat_micros"] == 2_000_000
    assert got["post_treat_micros"] == 6_000_000
    assert got["pre_ctrl_micros"] == 3_000_000
    assert got["post_ctrl_micros"] == 4_000_000
    assert got["did_micros"] == 3_000_000


def test_embedding_mmd_mean_vs_covariance_shift(spark):
    from graphlite_spark.operators.similarity import embedding_mmd_labels

    # group 0 and group 1 share the SAME mean (zero) but different
    # spread: the poly-2 kernel must see it (a pure mean statistic
    # like label_separability's centroid distance would read ~0)
    vecs = []
    vid = 0
    for s in (0.1, -0.1):
        vecs.append((vid, [s, 0.0], 0)); vid += 1
        vecs.append((vid, [0.0, s], 0)); vid += 1
    for s in (0.5, -0.5):
        vecs.append((vid, [s, 0.0], 1)); vid += 1
        vecs.append((vid, [0.0, s], 1)); vid += 1
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    got = embedding_mmd_labels(emb).collect()[0]
    assert got["n_a"] == 4 and got["n_b"] == 4
    # brute force: M_g = mean outer product, entries rescaled by
    # s // (n * 1e6), off-diagonal doubled
    import itertools
    def moments(rows):
        n = len(rows)
        out = {}
        for i, j in itertools.product(range(2), range(2)):
            if j < i:
                continue
            s = sum(round(v[i] * 1e6) * round(v[j] * 1e6) for v in rows)
            out[(i, j)] = s // (n * 1_000_000)
        return out
    ma = moments([[0.1, 0.0], [-0.1, 0.0], [0.0, 0.1], [0.0, -0.1]])
    mb = moments([[0.5, 0.0], [-0.5, 0.0], [0.0, 0.5], [0.0, -0.5]])
    expect = sum(
        (2 if j > i else 1) * (ma[(i, j)] - mb[(i, j)]) ** 2
        for (i, j) in ma
    )
    assert got["mmd2_scaled"] == expect
    assert got["mmd2_scaled"] > 0


def test_embedding_mmd_identical_groups_zero(spark):
    from graphlite_spark.operators.similarity import embedding_mmd_labels

    vecs = []
    vid = 0
    for lab in (0, 1):
        for v in ([0.3, -0.2], [-0.1, 0.4], [0.2, 0.2]):
            vecs.append((vid, v, lab)); vid += 1
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    got = embedding_mmd_labels(emb).collect()[0]
    assert got["mmd2_scaled"] == 0


def test_logrank_hand(spark):
    from graphlite_spark.operators.analytics import logrank_purchasers
    from datetime import datetime, timedelta

    base = datetime(2026, 6, 1)
    # (user, type, day): purchasers u1 (t=2, death), u2 (t=3, censored
    # at the horizon); others u3 (t=2, death), u4 (t=0, death)
    spec = [
        (1, "purchase", 0), (1, "click", 2),
        (2, "purchase", 0), (2, "click", 3),
        (3, "click", 0), (3, "view", 2),
        (4, "view", 1),
    ]
    events = spark.createDataFrame(
        [(i, u, t, base + timedelta(days=d))
         for i, (u, t, d) in enumerate(spec)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    r = logrank_purchasers(events).collect()[0]
    # death times t=0 (b only) and t=2 (one each); t=3 censored
    assert r["n_times"] == 2
    assert (r["deaths_a"], r["deaths_b"]) == (1, 2)
    # t=0: e=1e6*1*2//4=500000, v=((500000*2)//4*3)//3=250000
    # t=2: na=2 nb=1 dt=2: e=1e6*2*2//3=1333333,
    #      v=((1333333*1)//3*1)//2=222222
    assert r["expected_a_micros"] == 500_000 + 1_333_333
    assert r["var_micros"] == 250_000 + 222_222
    ome = 1_000_000 * 1 - r["expected_a_micros"]
    assert r["z2_micros"] == (ome * ome) // r["var_micros"]


def test_kendall_tau_hand(spark):
    from graphlite_spark.operators.analytics import kendall_tau_daily
    from datetime import datetime, timedelta

    base = datetime(2026, 6, 1)
    # daily (x=volume, y=distinct users): day0 (1,1), day1 (2,2),
    # day2 (2,2) -> pairs: 01 concordant, 02 concordant, 12 tie-both
    rows = [(0, 100, 0)]
    rows += [(1, 100, 1), (2, 200, 1)]
    rows += [(3, 100, 2), (4, 200, 2)]
    events = spark.createDataFrame(
        [(i, u, "click", base + timedelta(days=d))
         for i, (i2, u, d) in enumerate(rows)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    r = kendall_tau_daily(events).collect()[0]
    assert (r["n_days"], r["n_pairs"]) == (3, 3)
    assert (r["concordant"], r["discordant"]) == (2, 0)
    assert r["ties_both"] == 1
    assert r["tau_a_micros"] == 666_666

    # negative-tau shape: x up, y down -> remainder-subtract division
    # must agree across engines for negative numerators
    rows2 = [(0, 100, 0), (1, 100, 1), (2, 200, 1),
             (3, 100, 2), (4, 200, 2), (5, 300, 2)]
    ev2 = spark.createDataFrame(
        [(i, 100 + (i % (d + 1)), "click", base + timedelta(days=d))
         for i, (_, u, d) in enumerate(rows2)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    r2 = kendall_tau_daily(ev2).collect()[0]
    assert r2["n_pairs"] == 3


def test_degree_centralization_star_and_regular(spark):
    from graphlite_spark.algos.stats import degree_centralization

    # star K1,4: center degree 4, leaves 1 -> C = 1 exactly
    star = spark.createDataFrame(
        [(0, i, 1.0) for i in range(1, 5)],
        "src long, dst long, weight double",
    )
    r = degree_centralization(star).collect()[0]
    assert (r["n_vertices"], r["max_degree"]) == (5, 4)
    # sum_diff = 5*4 - (4 + 4*1) = 12; (n-1)(n-2) = 12
    assert r["sum_diff"] == 12
    assert r["centralization_micros"] == 1_000_000

    # 4-cycle: regular -> 0
    cyc = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 0, 1.0)],
        "src long, dst long, weight double",
    )
    r2 = degree_centralization(cyc).collect()[0]
    assert r2["centralization_micros"] == 0

    # dyad: n < 3 -> NULL
    dy = spark.createDataFrame(
        [(0, 1, 1.0)], "src long, dst long, weight double"
    )
    r3 = degree_centralization(dy).collect()[0]
    assert r3["centralization_micros"] is None


def test_cohens_kappa_identities(spark):
    from graphlite_spark.operators.classify import cohens_kappa_langid
    from graphlite_spark.operators.classify import naive_bayes_confusion

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    conf = {
        (r["true_label"], r["pred_label"]): r["n"]
        for r in naive_bayes_confusion(docs).collect()
    }
    n = sum(conf.values())
    diag = sum(v for (t, p), v in conf.items() if t == p)
    labels = {t for t, _ in conf} | {p for _, p in conf}
    rc = sum(
        sum(v for (t, _), v in conf.items() if t == l)
        * sum(v for (_, p), v in conf.items() if p == l)
        for l in labels
    )
    r = cohens_kappa_langid(docs).collect()[0]
    assert r["n_eval"] == n and r["n_agree"] == diag
    assert r["po_micros"] == (1_000_000 * diag) // n
    num = 1_000_000 * (n * diag - rc)
    den = n * n - rc
    # Spark's % takes the dividend's sign; the remainder-subtract form
    # divides an exact multiple, so the quotient is rounding-mode-free
    signed_mod = abs(num) % den * (1 if num >= 0 else -1)
    assert r["kappa_micros"] == (num - signed_mod) // den


def test_ann_map_hand(spark):
    from graphlite_spark.operators.similarity import ann_map

    # 1-D corpus: query id 0 at 0.0 label A; neighbors at distances
    # 1,2,3,4 with labels A,B,A,B -> relevant ranks 1 and 3:
    # P@1 = 1, P@3 = 2/3; R = 2 -> AP = (1e6 + 666666) // 2 = 833333
    rows = [
        (0, [0.0], "A"),
        (1, [1.0], "A"),
        (2, [2.0], "B"),
        (3, [3.0], "A"),
        (4, [4.0], "B"),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    out = {
        r["query_id"]: r
        for r in ann_map(emb, n_queries=1, k=4).collect()
    }
    r = out[0]
    assert (r["n_rel"], r["n_hits"]) == (2, 2)
    assert r["ap_micros"] == (1_000_000 + 666_666) // 2


def test_cramers_v2_bounds(spark):
    from graphlite_spark.operators.analytics import cramers_v2_type_dow
    from datetime import datetime, timedelta

    base = datetime(2026, 6, 1)  # a Monday
    # perfect association over 2 types x 2 dows -> V^2 = 1
    rows = []
    for i in range(8):
        rows.append((i, "click", base + timedelta(days=(i % 2) * 7)))
        rows.append(
            (100 + i, "view", base + timedelta(days=1 + (i % 2) * 7))
        )
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    r = cramers_v2_type_dow(ev).collect()[0]
    assert (r["dof"], r["k_min"]) == (1, 1)
    assert r["n_events"] == 16
    # chi2 = N for a perfect 2x2 association -> V^2 = 1 (floor slack
    # from the per-cell micro truncation only)
    assert 999_990 <= r["v2_micros"] <= 1_000_000


def test_morans_i_hand(spark):
    from graphlite_spark.operators.analytics import morans_i_activity
    # one stream: events u1,u1,u2,u2,u3 -> contacts 1-2, 2-3 (path);
    # x = (2, 2, 1); mean = 5/3 -> dev*3 = (1, 1, -2)
    rows = [
        (0, 1, "click", 1_000_000),
        (1, 1, "click", 2_000_000),
        (2, 2, "click", 3_000_000),
        (3, 2, "click", 4_000_000),
        (4, 3, "click", 5_000_000),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long"
    )
    r = morans_i_activity(ev).collect()[0]
    assert (r["n_vertices"], r["w_edges"]) == (3, 4)
    # sum over directed und reps: 2*(1*1) + 2*(1*-2) = -2; n*(-2) = -6
    assert r["num_scaled"] == -6
    # den1 = 1 + 1 + 4 = 6; W*den1 = 24
    assert r["den_scaled"] == 24
    # I = -6/24 = -0.25 -> exact micros via remainder-subtract
    assert r["morans_i_micros"] == -250_000


def test_assoc_rules_hand(spark):
    from graphlite_spark.operators.analytics import assoc_rules_types

    # u1 {a,b}, u2 {a}, u3 {a,b}, u4 {b,c}: N=4
    rows = [
        (0, 1, "a"), (1, 1, "b"), (2, 2, "a"),
        (3, 3, "a"), (4, 3, "b"), (5, 4, "b"), (6, 4, "c"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string"
    )
    out = {
        (r["type_a"], r["type_b"]): r
        for r in assoc_rules_types(ev).collect()
    }
    ab = out[("a", "b")]
    # n_a=3, n_b=3, n_ab=2: conf = 2/3, lift = 4*2/9
    assert ab["n_ab"] == 2
    assert ab["support_micros"] == 500_000
    assert ab["confidence_micros"] == 666_666
    assert ab["lift_micros"] == (1_000_000 * 4 * 2) // 9
    # directionality: b -> c confidence 1/3, c -> b confidence 1
    assert out[("b", "c")]["confidence_micros"] == 333_333
    assert out[("c", "b")]["confidence_micros"] == 1_000_000


def test_yules_k_hand(spark):
    from graphlite_spark.operators.packing import yules_k

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "b c")], "doc_id long, text string"
    )
    r = yules_k(docs).collect()[0]
    # tf: a=3, b=2, c=1 -> N=6, V=3, sum_tf2 = 9+4+1 = 14
    assert (r["n_tokens"], r["vocab_size"], r["sum_tf2"]) == (6, 3, 14)
    # K = 1e4*(14-6)/36 = 2222.22... -> micros
    a = 10_000 * 8
    assert r["yule_k_micros"] == 1_000_000 * (a // 36) + (
        1_000_000 * (a % 36)
    ) // 36


def test_emd_point_masses(spark):
    from graphlite_spark.operators.analytics import emd_type_daily
    from datetime import datetime, timedelta

    base = datetime(2026, 6, 1)
    ev = spark.createDataFrame(
        [
            (0, "purchase", base),
            (1, "click", base + timedelta(days=2)),
        ],
        "event_id long, event_type string, ts timestamp",
    )
    r = emd_type_daily(ev).collect()[0]
    # point mass at day 0 vs day 2: W1 = 2 days exactly, and the
    # empty day 1 must contribute through the gap weight
    assert (r["n_a"], r["n_b"], r["n_spine_days"]) == (1, 1, 2)
    assert r["emd_micros"] == 2_000_000

    # identical distributions -> 0
    ev2 = spark.createDataFrame(
        [
            (0, "purchase", base), (1, "click", base),
            (2, "purchase", base + timedelta(days=3)),
            (3, "click", base + timedelta(days=3)),
        ],
        "event_id long, event_type string, ts timestamp",
    )
    assert emd_type_daily(ev2).collect()[0]["emd_micros"] == 0


def test_cyclomatic_number_shapes(spark):
    from graphlite_spark.algos.stats import cyclomatic_number

    # triangle + isolate: mu = 3 - 4 + 2 = 1
    v = spark.createDataFrame([(i,) for i in range(4)], "id long")
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)],
        "src long, dst long, weight double",
    )
    r = cyclomatic_number(v, e).collect()[0]
    assert (r["n_vertices"], r["m_edges"], r["n_components"]) == (4, 3, 2)
    assert r["cyclomatic"] == 1

    # path: forest -> 0
    e2 = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, weight double"
    )
    v2 = spark.createDataFrame([(i,) for i in range(3)], "id long")
    assert cyclomatic_number(v2, e2).collect()[0]["cyclomatic"] == 0


def test_mcnemar_discordant_cells(spark):
    from graphlite_spark.operators.classify import (
        mcnemar_langid,
        naive_bayes_predictions,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    preds = naive_bayes_predictions(docs).collect()
    # majority train label from the even half
    from collections import Counter

    train = Counter(
        r["lang"]
        for r in docs.select("doc_id", "lang").collect()
        if r["doc_id"] % 2 == 0
        and r["lang"] in ("de", "en", "es", "fr", "zh")
    )
    best = max(train.items(), key=lambda kv: (kv[1], kv[0]))[0]
    b = sum(
        1
        for r in preds
        if r["pred_label"] == r["true_label"] and best != r["true_label"]
    )
    c = sum(
        1
        for r in preds
        if r["pred_label"] != r["true_label"] and best == r["true_label"]
    )
    r = mcnemar_langid(docs).collect()[0]
    assert (r["n_b"], r["n_c"]) == (b, c)
    assert r["n_eval"] == len(preds)
    if b + c:
        assert r["mcnemar_micros"] == (1_000_000 * (b - c) ** 2) // (b + c)


def test_cmh_no_association(spark):
    from graphlite_spark.operators.analytics import cmh_purchase_value
    from datetime import datetime, timedelta

    base = datetime(2026, 6, 1)
    # identical value mix for both types in every stratum -> sum_a
    # equals expectation exactly, CMH = 0
    rows = []
    eid = 0
    for d in range(4):
        for t in ("purchase", "click"):
            for v in (1.0, 100.0):
                rows.append((eid, t, v, base + timedelta(days=d)))
                eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ts timestamp"
    )
    r = cmh_purchase_value(ev).collect()[0]
    assert r["n_strata"] == 4
    assert 1_000_000 * r["sum_a"] == r["sum_e_micros"]
    assert r["cmh_micros"] == 0


def test_ccf_detects_known_lead(spark):
    from graphlite_spark.operators.analytics import ccf_type_daily
    from datetime import datetime, timedelta

    base = datetime(2026, 6, 1)
    # click spikes on days 0-1, purchase spikes EXACTLY 2 days later:
    # the max positive signed-square must land at lag = -2
    # (dev_a(t) pairs dev_b(t + lag); purchase trails click by 2)
    rows = []
    eid = 0
    click_days = {0: 9, 1: 9}
    purch_days = {2: 9, 3: 9}
    for d in range(8):
        for _ in range(click_days.get(d, 1)):
            rows.append((eid, "click", base + timedelta(days=d)))
            eid += 1
        for _ in range(purch_days.get(d, 1)):
            rows.append((eid, "purchase", base + timedelta(days=d)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    out = {r["lag"]: r for r in ccf_type_daily(ev, max_lag=3).collect()}
    assert len(out) == 7
    best = max(out.values(), key=lambda r: r["ccf2_signed_micros"])
    assert best["lag"] == -2
    # lag 0 must be below the aligned lag
    assert (
        out[0]["ccf2_signed_micros"] < out[-2]["ccf2_signed_micros"]
    )


def test_brier_perfect_and_base(spark):
    from graphlite_spark.operators.analytics import (
        brier_purchase_forecast,
    )
    from datetime import datetime, timedelta

    base = datetime(2026, 6, 1)
    # u1: all purchases first half -> p=1, purchases second half y=1
    # u2: no purchases first half -> p=0, none second half y=0
    rows = [
        (0, 1, "purchase", base),
        (1, 1, "purchase", base + timedelta(days=3)),
        (2, 2, "click", base),
        (3, 2, "click", base + timedelta(days=3)),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    r = brier_purchase_forecast(ev).collect()[0]
    assert (r["n_users"], r["n_positive"]) == (2, 1)
    assert r["brier_micros"] == 0
    assert r["base_rate_micros"] == 500_000

    # flip second-half outcomes -> worst case, brier = 1
    rows2 = [
        (0, 1, "purchase", base),
        (1, 1, "click", base + timedelta(days=3)),
        (2, 2, "click", base),
        (3, 2, "purchase", base + timedelta(days=3)),
    ]
    ev2 = spark.createDataFrame(
        rows2,
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    r2 = brier_purchase_forecast(ev2).collect()[0]
    assert r2["brier_micros"] == 1_000_000


def test_seq_patterns_hand(spark):
    from graphlite_spark.operators.analytics import seq_patterns_subseq

    # u1: a x b y c  (supports (a,b),(a,c),(b,c),(a,b,c) with gaps)
    # u2: b a        (supports (b,a) only)
    # u3: a a a      (supports (a,a) and (a,a,a))
    rows = []
    eid = 0
    for u, seq in [(1, "axbyc"), (2, "ba"), (3, "aaa")]:
        for i, ch in enumerate(seq):
            rows.append((eid, u, ch, 1_000 + eid))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long"
    )
    out = {
        (r["a"], r["b"], r["c"]): r["n_users"]
        for r in seq_patterns_subseq(ev, ts_col="ts").collect()
    }
    assert out[("a", "b", None)] == 1
    assert out[("b", "a", None)] == 1
    assert out[("a", "b", "c")] == 1
    assert out[("a", "a", None)] == 1      # u3 (two a's)
    assert out[("a", "a", "a")] == 1       # u3 (three a's)
    assert ("b", "a", "c") not in out      # no such ordering anywhere
    assert out[("a", "c", None)] == 1
    # u1's interleaved x/y must not block gap-tolerant patterns
    assert out[("x", "y", "c")] == 1


def test_hapax_profile_hand(spark):
    from graphlite_spark.operators.packing import hapax_profile

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "d")], "doc_id long, text string"
    )
    r = hapax_profile(docs).collect()[0]
    # tf: a=3 b=2 c=1 d=1 -> V=4, hapax=2, dis=1
    assert (r["n_tokens"], r["vocab_size"]) == (7, 4)
    assert (r["hapax"], r["dis"]) == (2, 1)
    assert r["hapax_share_micros"] == 500_000
    assert r["sichel_s_micros"] == 250_000


def test_dow_adjusted_anomaly_hand(spark):
    from graphlite_spark.operators.analytics import dow_adjusted_anomaly
    from datetime import datetime, timedelta

    base = datetime(2026, 6, 1)  # Monday
    # two weeks: Mondays 10 then 2 (anomaly), all other days 5
    counts = {0: 10, 7: 2}
    rows = []
    eid = 0
    for d in range(14):
        for _ in range(counts.get(d, 5)):
            rows.append((eid, base + timedelta(days=d)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = dow_adjusted_anomaly(ev, top_k=3).collect()
    by_rank = {r["rank"]: r for r in out}
    # Monday mean = 6: both Mondays are ~2/3 off their weekday mean
    # while every other day sits near 1 -> the two Mondays are the
    # top-2 anomalies
    top2_days = {by_rank[1]["y"], by_rank[2]["y"]}
    assert top2_days == {10, 2}
    # exact ratio check: dow_days=2, s_w=12 -> 1e6*2*10//12
    mon = [r for r in out if r["y"] in (10, 2)]
    for r in mon:
        assert r["dow_days"] == 2
        assert r["ratio_micros"] == (1_000_000 * 2 * r["y"]) // 12
