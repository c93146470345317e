"""Wave-7 operators vs python brute force on hand-built inputs."""

from __future__ import annotations


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _und_deg(pairs):
    und = set()
    for a, b in pairs:
        und.add((a, b))
        und.add((b, a))
    deg = {}
    for a, _ in und:
        deg[a] = deg.get(a, 0) + 1
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
    return und, deg, nbrs


# star hub 0 with leaves 1-4 (deg 5 incl. chord), a triangle (1,2,5),
# plus a path 6-7-8 giving a deg-2 center
PAIRS = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (1, 5), (2, 5), (6, 7), (7, 8)]


def test_resource_allocation_bruteforce(spark):
    from graphlite_spark.algos.linkpred import resource_allocation

    got = {
        (r["u"], r["v"]): r["ra_micros"]
        for r in resource_allocation(
            _edges(spark, PAIRS), max_wedge_degree=100, min_score_micros=1
        ).collect()
    }

    und, deg, nbrs = _und_deg(PAIRS)
    want = {}
    verts = sorted(deg)
    for i, u in enumerate(verts):
        for v in verts[i + 1:]:
            if (u, v) in und:
                continue
            s = sum(
                round(1_000_000.0 / deg[w])
                for w in nbrs[u] & nbrs[v]
                if deg[w] >= 2
            )
            if s >= 1:
                want[(u, v)] = s
    assert got == want
    # sanity: 6-8 share only the deg-2 center 7 → exactly 500000
    assert want[(6, 8)] == 500_000


def test_resource_allocation_hub_cap(spark):
    from graphlite_spark.algos.linkpred import resource_allocation

    # cap at 2: only deg-2 centers survive (vertex 5 and 7); the hub 0
    # and the deg-4 vertices 1/2 are excluded BEFORE the wedge join
    got = {
        (r["u"], r["v"]): r["ra_micros"]
        for r in resource_allocation(
            _edges(spark, PAIRS), max_wedge_degree=2, min_score_micros=1
        ).collect()
    }
    und, deg, nbrs = _und_deg(PAIRS)
    want = {}
    verts = sorted(deg)
    for i, u in enumerate(verts):
        for v in verts[i + 1:]:
            if (u, v) in und:
                continue
            s = sum(
                round(1_000_000.0 / deg[w])
                for w in nbrs[u] & nbrs[v]
                if 2 <= deg[w] <= 2
            )
            if s >= 1:
                want[(u, v)] = s
    assert got == want
    assert (6, 8) in got


def test_preferential_attachment_bruteforce(spark):
    from graphlite_spark.algos.linkpred import preferential_attachment

    got = {
        (r["u"], r["v"]): (r["cn"], r["pa_score"])
        for r in preferential_attachment(
            _edges(spark, PAIRS), max_wedge_degree=100
        ).collect()
    }

    und, deg, nbrs = _und_deg(PAIRS)
    want = {}
    verts = sorted(deg)
    for i, u in enumerate(verts):
        for v in verts[i + 1:]:
            if (u, v) in und:
                continue
            cn = sum(1 for w in nbrs[u] & nbrs[v] if deg[w] >= 2)
            if cn >= 1:
                want[(u, v)] = (cn, deg[u] * deg[v])
    assert got == want
    # leaves 3-4 share only the hub 0: one common neighbor, deg 1 each
    assert want[(3, 4)] == (1, 1)


def test_pa_score_uses_full_degree(spark):
    from graphlite_spark.algos.linkpred import preferential_attachment

    und, deg, _ = _und_deg(PAIRS)
    rows = preferential_attachment(
        _edges(spark, PAIRS), max_wedge_degree=100
    ).collect()
    for r in rows:
        assert r["pa_score"] == deg[r["u"]] * deg[r["v"]]


def _events(spark, rows):
    # rows: (day_offset, value) — one event per tuple at noon of that day
    import datetime

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    data = [
        (i, base + datetime.timedelta(days=d), 1, "click", v, "{}")
        for i, (d, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_theil_sen_bruteforce(spark):
    """Slope/intercept vs python over a noisy-linear series with one
    huge outlier day (day 3 has 50 events) and a zero-filled gap."""
    from graphlite_spark.operators.analytics import theil_sen_trend

    # day -> event count: 1,2,3,50,0(gap),6,7
    counts = {0: 1, 1: 2, 2: 3, 3: 50, 5: 6, 6: 7}
    rows = [(d, 1.0) for d, c in counts.items() for _ in range(c)]
    got = theil_sen_trend(_events(spark, rows)).collect()[0]

    days = list(range(7))
    y = [counts.get(d, 0) for d in days]

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    slopes = sorted(
        trunc_div(1_000_000 * (y[j] - y[i]), j - i)
        for i in range(7)
        for j in range(i + 1, 7)
    )
    np_ = len(slopes)
    slope = slopes[(np_ + 2) // 2 - 1]
    resid = sorted(1_000_000 * y[x] - slope * x for x in days)
    inter = resid[(7 + 2) // 2 - 1]
    assert got["n_days"] == 7
    assert got["n_pairs"] == np_
    assert got["slope_micros"] == slope
    assert got["intercept_micros"] == inter
    # robustness: the OLS slope would be dragged far above 1/day by the
    # day-3 spike; Theil-Sen stays near the underlying ~1/day trend
    assert abs(got["slope_micros"] - 1_000_000) <= 500_000


def test_max_drawdown_bruteforce(spark):
    """Peak/trough vs python on a rise-crash-recover revenue path with
    negative-revenue (refund) days and a gap day."""
    from graphlite_spark.operators.analytics import max_drawdown

    # day -> revenue: +10, +5, -12, (gap: 0), -4, +20
    vals = {0: 10.0, 1: 5.0, 2: -12.0, 4: -4.0, 5: 20.0}
    rows = [(d, v) for d, v in vals.items()]
    got = max_drawdown(_events(spark, rows)).collect()[0]

    cents = [round(vals.get(d, 0.0) * 100) for d in range(6)]
    cum = peak = 0
    best = (-1, None, None)  # dd, day, peak
    for x, c in enumerate(cents):
        cum += c
        peak = max(peak if x else cum, cum)
        dd = peak - cum
        if dd > best[0]:
            best = (dd, x, peak)
    assert got["n_days"] == 6
    assert got["max_drawdown_cents"] == best[0] == 1600
    assert got["dd_day"] == best[1] == 4
    assert got["peak_cents"] == best[2] == 1500


def test_max_drawdown_monotone_series(spark):
    """Strictly rising revenue → zero drawdown at day 0."""
    from graphlite_spark.operators.analytics import max_drawdown

    got = max_drawdown(
        _events(spark, [(d, 1.0 + d) for d in range(4)])
    ).collect()[0]
    assert got["max_drawdown_cents"] == 0
    assert got["dd_day"] == 0


def test_scd2_history_bruteforce(spark):
    """Versioned validity windows vs hand computation: repeats collapse,
    ties break by event_id, the open segment is current."""
    import datetime

    from graphlite_spark.operators.relational import scd2_history

    base = datetime.datetime(2024, 1, 1)
    # user 1: k = 10 (t0), 12 (t1, same tier -> collapsed), 30 (t2),
    #         5 (t3); user 2: single event
    data = [
        (0, base, 1, "click", 1.0, '{"k": 10}'),
        (1, base + datetime.timedelta(hours=1), 1, "click", 1.0, '{"k": 12}'),
        (2, base + datetime.timedelta(hours=2), 1, "click", 1.0, '{"k": 30}'),
        (3, base + datetime.timedelta(hours=3), 1, "click", 1.0, '{"k": 5}'),
        (4, base, 2, "view", 1.0, '{"k": 99}'),
    ]
    ev = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    rows = sorted(
        scd2_history(ev, bucket=25).collect(),
        key=lambda r: (r["user_id"], r["version"]),
    )
    us = lambda h: int((base + datetime.timedelta(hours=h)).timestamp()) * 10**6

    assert [
        (r["user_id"], r["tier"], r["valid_from_us"], r["valid_to_us"],
         r["version"], r["is_current"])
        for r in rows
    ] == [
        (1, 0, us(0), us(2), 1, False),
        (1, 1, us(2), us(3), 2, False),
        (1, 0, us(3), None, 3, True),
        (2, 3, us(0), None, 1, True),
    ]


def test_welch_ttest_bruteforce(spark):
    """t and df vs scipy-formula python on unequal-variance groups."""
    import math

    from graphlite_spark.operators.analytics import welch_ttest

    a_vals = [10.0, 12.0, 11.0, 13.0, 9.0]
    b_vals = [5.0, 25.0, 1.0, 40.0]
    got = welch_ttest(
        _events_typed(spark, [("purchase", v) for v in a_vals]
                      + [("click", v) for v in b_vals])
    ).collect()[0]

    ca = [round(v * 100) for v in a_vals]
    cb = [round(v * 100) for v in b_vals]
    na, nb = len(ca), len(cb)
    ma, mb = sum(ca) / na, sum(cb) / nb
    va = (sum(c * c for c in ca) - sum(ca) ** 2 / na) / (na - 1)
    vb = (sum(c * c for c in cb) - sum(cb) ** 2 / nb) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert got["n_a"] == na and got["n_b"] == nb
    assert got["mean_a_cents"] == round(ma, 6)
    assert got["mean_b_cents"] == round(mb, 6)
    assert got["t_stat"] == round(t, 6)
    assert got["df"] == round(df, 6)


def test_welch_ttest_degenerate(spark):
    """n<2 on one side -> NULL t/df, counts still reported."""
    from graphlite_spark.operators.analytics import welch_ttest

    got = welch_ttest(
        _events_typed(spark, [("purchase", 3.0), ("click", 1.0),
                              ("click", 2.0)])
    ).collect()[0]
    assert got["n_a"] == 1 and got["n_b"] == 2
    assert got["t_stat"] is None and got["df"] is None


def _events_typed(spark, rows):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    data = [
        (i, base + datetime.timedelta(minutes=i), 1, t, v, "{}")
        for i, (t, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_pca_top_component_bruteforce(spark):
    """Integer power iteration vs numpy eig on an anisotropic 3-d cloud:
    the loading direction must align with the true top eigenvector and
    the explained ratio with the true eigenvalue share."""
    import numpy as np

    from graphlite_spark.operators.similarity import pca_top_component

    # points spread mostly along (3, 4, 0)/5, slight noise on z —
    # deterministic hand-built cloud, no RNG
    base = [
        (i, [0.6 * t, 0.8 * t, 0.05 * ((i % 3) - 1)], 0)
        for i, t in enumerate(
            [-1.0, -0.6, -0.2, 0.2, 0.6, 1.0, -0.8, 0.8, 0.4, -0.4]
        )
    ]
    emb = spark.createDataFrame(
        base, "vec_id long, embedding array<float>, label int"
    )
    rows = sorted(
        pca_top_component(emb, iterations=8).collect(),
        key=lambda r: r["pos"],
    )
    assert len(rows) == 3
    assert all(r["n_vecs"] == 10 for r in rows)

    v = np.array([r["loading_micros"] for r in rows], dtype=float)
    X = np.array([e for _, e, _ in base])
    X = X - X.mean(axis=0)
    C = X.T @ X
    evals, evecs = np.linalg.eigh(C)
    top = evecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999
    ratio = rows[0]["explained_ratio_micros"] / 1e6
    assert abs(ratio - evals[-1] / evals.sum()) < 0.01
    assert all(
        r["explained_ratio_micros"] == rows[0]["explained_ratio_micros"]
        for r in rows
    )


def test_pca_degenerate_identical_vectors(spark):
    """All-identical vectors -> zero covariance -> zero loadings and
    NULL ratio, not a crash."""
    from graphlite_spark.operators.similarity import pca_top_component

    emb = spark.createDataFrame(
        [(i, [1.0, 2.0], 0) for i in range(4)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = pca_top_component(emb).collect()
    assert len(rows) == 2
    assert all(r["loading_micros"] == 0 for r in rows)
    assert all(r["explained_ratio_micros"] is None for r in rows)


def test_hurst_rs_bruteforce(spark):
    """R/S per window and the integer-log slope vs python on a 16-day
    alternating (anti-persistent) series — H must land well below 0.5."""
    import math

    from graphlite_spark.operators.analytics import hurst_rs

    counts = [5, 1, 6, 2, 7, 1, 5, 2, 6, 1, 7, 2, 5, 1, 6, 2]
    rows = [(d, 1.0) for d, c in enumerate(counts) for _ in range(c)]
    got = {
        r["w"]: r
        for r in hurst_rs(
            _events(spark, rows), window_sizes=(4, 8)
        ).collect()
    }

    def rs_windows(y, w):
        out = []
        for g in range(len(y) // w):
            seg = y[g * w:(g + 1) * w]
            sw = sum(seg)
            dev = [w * v - sw for v in seg]
            z, cur = [], 0
            for dv in dev:
                cur += dv
                z.append(cur)
            ssd = sum(dv * dv for dv in dev)
            if ssd == 0:
                continue
            r = max(z) - min(z)
            out.append(round(1e6 * r * math.sqrt(w) / math.sqrt(ssd)))
        return out

    lx, ly = [], []
    for w in (4, 8):
        rs = rs_windows(counts, w)
        mean = sum(rs) // len(rs)
        assert got[w]["n_windows"] == len(rs)
        assert got[w]["mean_rs_micros"] == mean
        lx.append(round(math.log(w) * 1e6))
        ly.append(round(math.log(mean / 1e6) * 1e6))
    k = 2
    num = k * sum(a * b for a, b in zip(lx, ly)) - sum(lx) * sum(ly)
    den = k * sum(a * a for a in lx) - sum(lx) ** 2
    want_h = round(num / den, 6)
    assert got[4]["hurst"] == got[8]["hurst"] == want_h
    # alternating series is anti-persistent: H clearly below 0.5
    assert want_h < 0.4


def test_hurst_rs_single_size_null_slope(spark):
    """Only one window size with complete windows -> hurst NULL."""
    from graphlite_spark.operators.analytics import hurst_rs

    rows = [(d, 1.0) for d, c in enumerate([3, 1, 4, 1]) for _ in range(c)]
    got = hurst_rs(_events(spark, rows), window_sizes=(4, 16)).collect()
    assert {r["w"] for r in got} == {4}
    assert got[0]["hurst"] is None
