"""Spearman rank agreement, Chao1 vocabulary richness, hot-set churn vs
Python brute force."""

from __future__ import annotations

import datetime

import pytest


def test_rank_agreement_bruteforce(spark):
    from graphlite_spark.algos.stats import rank_agreement

    a = [(0, 100), (1, 90), (2, 80), (3, 70), (4, 60)]
    b = [(0, 5), (1, 50), (2, 40), (3, 30), (4, 20)]  # 0 drops to last
    da = spark.createDataFrame(a, "id long, score long")
    db = spark.createDataFrame(b, "id long, score long")
    got = rank_agreement(da, db).collect()[0]

    def ranks(rows):
        ordered = sorted(rows, key=lambda t: (-t[1], t[0]))
        return {i: r for r, (i, _) in enumerate(ordered)}

    ra, rb = ranks(a), ranks(b)
    d2 = sum((ra[i] - rb[i]) ** 2 for i in ra)
    n = 5
    rho = round(1.0 - (6.0 * d2) / (n * (n * n - 1)), 6)
    assert (got["n"], got["sum_d2"]) == (n, d2)
    assert got["rho"] == pytest.approx(rho, abs=1e-9)

    # identical scores -> identical ranks -> rho = 1
    same = rank_agreement(da, da).collect()[0]
    assert same["sum_d2"] == 0 and same["rho"] == 1.0

    # exactly reversed order -> rho = -1
    rev = spark.createDataFrame(
        [(i, 1000 - s) for i, s in a], "id long, score long"
    )
    opp = rank_agreement(da, rev).collect()[0]
    assert opp["rho"] == -1.0


def test_chao1_vocab_bruteforce(spark):
    from graphlite_spark.operators.profiling import chao1_vocab

    docs = [
        (0, "a a a b b c d e"),   # a:3 b:2 c,d,e singletons
        (1, "b f"),               # b:3 total, f singleton
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = chao1_vocab(df).collect()[0]
    # counts: a3 b3 c1 d1 e1 f1 -> V=6, f1=4, f2=0, N=10
    assert (got["v_obs"], got["f1"], got["f2"], got["n_tokens"]) == (
        6, 4, 0, 10,
    )
    # f2=0 branch: V + f1(f1-1)/2 = 6 + 6 = 12
    assert got["chao1"] == pytest.approx(12.0, abs=1e-9)
    assert got["p_unseen_micros"] == 400000

    # f2 > 0 branch
    docs2 = [(0, "x x y y z")]
    g2 = chao1_vocab(
        spark.createDataFrame(docs2, "doc_id long, text string")
    ).collect()[0]
    # V=3, f1=1 (z), f2=2 (x,y) -> chao1 = 3 + 1/4
    assert g2["chao1"] == pytest.approx(3.25, abs=1e-9)


def test_hotset_churn_bruteforce(spark):
    from graphlite_spark.operators.analytics import hotset_churn

    base = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    # day 0: users 1,2,3 hot; day 1: users 2,3,4; day 3 (gap!): user 9
    for day, users in [(0, [1, 1, 2, 2, 3]), (1, [2, 3, 3, 4]),
                       (3, [9, 9])]:
        for u in users:
            rows.append((eid, u, base + datetime.timedelta(days=day)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r["day"]: r for r in hotset_churn(df, k=2).collect()}
    d0 = int((base - datetime.datetime(1970, 1, 1)).days)

    # day 0 top-2 by (count desc, key asc): {1, 2}; day 1: {3, 2}
    r0 = got[d0]
    assert (r0["n_top"], r0["n_prev"], r0["n_common"]) == (2, 0, 0)
    assert r0["jaccard"] is None  # no previous day
    r1 = got[d0 + 1]
    assert (r1["n_top"], r1["n_prev"], r1["n_common"]) == (2, 2, 1)
    assert r1["jaccard"] == pytest.approx(round(1 / 3, 6), abs=1e-9)
    r3 = got[d0 + 3]  # gap day: previous day absent
    assert r3["jaccard"] is None and r3["n_prev"] == 0


def test_label_separability_bruteforce(spark):
    from graphlite_spark.operators.kmeans import _tdiv, label_separability

    vecs = [
        (0, [1.0, 1.0], 0), (1, [1.2, 0.8], 0), (2, [0.8, 1.2], 0),
        (3, [-1.0, -1.0], 1), (4, [-1.2, -0.8], 1),
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    got = {r["label"]: r for r in label_separability(df).collect()}

    q = {i: ([round(x * 1_000_000) for x in v], lab) for i, v, lab in vecs}
    by_lab: dict[int, list] = {}
    for v, lab in q.values():
        by_lab.setdefault(lab, []).append(v)
    cents = {
        lab: [_tdiv(sum(v[j] for v in vs), len(vs)) for j in range(2)]
        for lab, vs in by_lab.items()
    }
    n_tot = len(q)
    gcent = [
        _tdiv(sum(v[j] for v, _ in q.values()), n_tot) for j in range(2)
    ]
    for lab, vs in by_lab.items():
        within = sum(
            (v[j] - cents[lab][j]) ** 2 for v in vs for j in range(2)
        )
        cdist = sum((cents[lab][j] - gcent[j]) ** 2 for j in range(2))
        r = got[lab]
        assert (r["n"], r["within_ss"], r["centroid_dist_sq"]) == (
            len(vs), within, cdist,
        )
        assert r["between_term"] == len(vs) * cdist
    # the two clusters are well separated: between dwarfs within
    assert sum(r["between_term"] for r in got.values()) > 10 * sum(
        r["within_ss"] for r in got.values()
    )


def test_triangle_surprise_bruteforce(spark):
    from graphlite_spark.algos.triangles import triangle_surprise

    # K4 plus a pendant: 4 triangles, heavy clustering
    arcs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in arcs], "src long, dst long, weight double"
    )
    got = triangle_surprise(e).collect()[0]
    deg = {0: 3, 1: 3, 2: 3, 3: 4, 4: 1}
    s1 = sum(deg.values())
    s2x = sum(d * (d - 1) for d in deg.values())
    r = s2x / s1
    assert (got["triangles"], got["s1"], got["s2x"]) == (4, s1, s2x)
    assert got["expected"] == pytest.approx(round(r ** 3 / 6.0, 6), abs=1e-9)
    assert got["surprise"] == pytest.approx(
        round(4 / (r ** 3 / 6.0), 6), abs=1e-9
    )
    assert got["surprise"] > 1.0  # K4 clusters more than its null model


def test_l_diversity_bruteforce(spark):
    import datetime

    from graphlite_spark.operators.profiling import l_diversity

    base = datetime.datetime(2024, 5, 1, 10)
    rows = [
        # class (click, day0, h10): users 1,1,2 -> l=2, 3 rows
        (0, 1, "click", base),
        (1, 1, "click", base + datetime.timedelta(minutes=5)),
        (2, 2, "click", base + datetime.timedelta(minutes=10)),
        # class (view, day0, h10): user 3 alone -> l=1 (the exposure)
        (3, 3, "view", base),
        # class (view, day0, h11): users 4,5 -> l=2, 2 rows
        (4, 4, "view", base + datetime.timedelta(hours=1)),
        (5, 5, "view", base + datetime.timedelta(hours=1, minutes=2)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {r["l_value"]: r for r in l_diversity(df).collect()}
    assert got[1]["n_classes"] == 1 and got[1]["n_rows"] == 1
    assert got[2]["n_classes"] == 2 and got[2]["n_rows"] == 5


def test_cusum_changepoint_bruteforce(spark):
    import datetime

    from graphlite_spark.operators.analytics import cusum_changepoint

    base = datetime.datetime(2024, 6, 1)
    # type 'a': level shift on day 4 (2/day -> 8/day over 8 days)
    rows = []
    eid = 0
    counts = {0: 2, 1: 2, 2: 2, 3: 2, 4: 8, 5: 8, 6: 8, 7: 8}
    for d, c in counts.items():
        for _ in range(c):
            rows.append((eid, 1, "a", base + datetime.timedelta(days=d)))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = cusum_changepoint(df).collect()[0]

    ys = [counts[d] for d in range(8)]
    total, n = sum(ys), len(ys)
    mean_m = (1_000_000 * total - (1_000_000 * total) % n) // n
    best = None
    ps = 0
    for d, y in enumerate(ys):
        ps += y
        sabs = abs(1_000_000 * ps - (d + 1) * mean_m)
        if best is None or sabs > best[1]:
            best = (d, sabs)
    d0 = int((base - datetime.datetime(1970, 1, 1)).days)
    assert (got["n_days"], got["total"]) == (8, total)
    assert got["cp_day"] == d0 + best[0]
    assert got["cusum_abs_micros"] == best[1]
    assert best[0] == 3  # the CUSUM minimum sits on the last pre-shift day


def test_source_jsd_bruteforce(spark):
    import math

    from graphlite_spark.operators.cooccurrence import source_jsd

    docs = [
        (0, "a", "x x x y"),          # a: x:3 y:1, T=4
        (1, "b", "x y y y z"),        # b: x:1 y:3 z:1, T=5
        (2, "c", "w w"),              # c: w:2, disjoint from a
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {
        (r["source_a"], r["source_b"]): r for r in source_jsd(df).collect()
    }

    cnt = {"a": {"x": 3, "y": 1}, "b": {"x": 1, "y": 3, "z": 1},
           "c": {"w": 2}}
    tot = {g: sum(c.values()) for g, c in cnt.items()}

    def jsd_micros(ga, gb):
        shared = set(cnt[ga]) & set(cnt[gb])
        sa = sb = csa = csb = 0
        for t in shared:
            ca, cb = cnt[ga][t], cnt[gb][t]
            ta, tb = tot[ga], tot[gb]
            den = ca * tb + cb * ta
            sa += round((ca / ta) * math.log((2.0 * ca * tb) / den) * 1e6)
            sb += round((cb / tb) * math.log((2.0 * cb * ta) / den) * 1e6)
            csa += ca
            csb += cb
        ra = round((1.0 - csa / tot[ga]) * math.log(2.0) * 1e6)
        rb = round((1.0 - csb / tot[gb]) * math.log(2.0) * 1e6)
        s = sa + ra + sb + rb
        return abs(s) // 2 if s >= 0 else -(abs(s) // 2), len(shared)

    for pair in [("a", "b"), ("a", "c"), ("b", "c")]:
        want, n_sh = jsd_micros(*pair)
        if n_sh == 0:
            assert pair not in got  # no shared tokens -> no pair row
        else:
            assert got[pair]["n_shared"] == n_sh
            assert got[pair]["jsd_micros"] == want
    # disjoint sources never surface; the overlapping pair is present
    # and strictly between 0 and ln2 (the JSD maximum)
    assert 0 < got[("a", "b")]["jsd_micros"] < 693148


def test_kmeans_elbow_consistent_with_assignment(spark):
    import random

    from graphlite_spark.operators.kmeans import (
        kmeans_elbow, kmeans_embeddings,
    )

    random.seed(3)
    df = spark.createDataFrame(
        [(i, [random.uniform(-1, 1) for _ in range(6)]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    got = {r["k"]: r for r in kmeans_elbow(df, ks=(2, 4), iterations=2).collect()}
    for k in (2, 4):
        assign = kmeans_embeddings(df, k=k, iterations=2).collect()
        assert got[k]["n_vectors"] == 50
        assert got[k]["inertia"] == sum(r["dist_sq"] for r in assign)
    # more clusters can only tighten the fit (same seeds prefix is NOT
    # guaranteed, but on this data the elbow must be monotone)
    assert got[4]["inertia"] <= got[2]["inertia"]


def test_attack_tolerance_bruteforce(spark):
    from graphlite_spark.algos.components import attack_tolerance

    # star (hub 0 with 5 leaves) + a 4-chain: removing the hub shatters
    # the star into singletons, leaving the chain as the giant
    arcs = [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
            (10, 11), (11, 12), (12, 13)]
    ids = sorted({x for a in arcs for x in a})
    v = spark.createDataFrame([(i,) for i in ids], "id long")
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in arcs], "src long, dst long, weight double"
    )
    got = attack_tolerance(v, e, remove_k=1).collect()[0]
    n = len(ids)
    assert got["removed"] == 1
    assert got["n_vertices"] == n
    assert got["giant_size"] == 4  # the chain 10-11-12-13
    assert got["giant_micros"] == (
        1_000_000 * 4 - (1_000_000 * 4) % n
    ) // n


def test_random_failure_tolerance_bruteforce(spark):
    import hashlib

    from graphlite_spark.algos.components import random_failure_tolerance

    # same star + chain fixture as the attack test; the victim is the
    # hash48-smallest vertex, recomputed here independently
    arcs = [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
            (10, 11), (11, 12), (12, 13)]
    ids = sorted({x for a in arcs for x in a})
    v = spark.createDataFrame([(i,) for i in ids], "id long")
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in arcs], "src long, dst long, weight double"
    )

    def h48(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)

    victim = min(ids, key=lambda i: (h48(i), i))
    survivors = [i for i in ids if i != victim]
    # brute-force CC over the surviving subgraph
    parent = {i: i for i in survivors}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in arcs:
        if a != victim and b != victim:
            parent[find(a)] = find(b)
    from collections import Counter

    giant = max(Counter(find(i) for i in survivors).values())
    got = random_failure_tolerance(v, e, remove_k=1).collect()[0]
    n = len(ids)
    assert got["removed"] == 1
    assert got["n_vertices"] == n
    assert got["giant_size"] == giant
    assert got["giant_micros"] == (
        1_000_000 * giant - (1_000_000 * giant) % n
    ) // n


def test_graph_hygiene_bruteforce(spark):
    from graphlite_spark.algos.stats import graph_hygiene

    # vertices 0..5; vertex 5 isolated; arc to 9 dangles; 1->2 repeated;
    # 3->3 self-loop
    v = spark.createDataFrame([(i,) for i in range(6)], "id long")
    arcs = [(0, 1), (1, 2), (1, 2), (3, 3), (2, 9)]
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in arcs], "src long, dst long, weight double"
    )
    r = graph_hygiene(v, e).collect()[0]
    assert r["n_vertices"] == 6
    assert r["n_arcs"] == 5
    assert r["n_self_loops"] == 1
    assert r["n_parallel_arcs"] == 1      # the duplicated 1->2
    assert r["n_isolated"] == 2           # 4 and 5 touch no arc
    assert r["n_dangling"] == 1           # endpoint 9 not in vertices


def test_degree_mixing_matrix_bruteforce(spark):
    from collections import Counter

    from graphlite_spark.algos.stats import degree_mixing_matrix

    # star (hub 0, leaves 1-5) + chain 10-11-12-13 + dup arc + self-loop
    arcs = [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
            (10, 11), (11, 12), (12, 13), (1, 0), (7, 7)]
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in arcs], "src long, dst long, weight double"
    )
    got = {(r["bucket_a"], r["bucket_b"]): r["n_edges"]
           for r in degree_mixing_matrix(e).collect()}
    pairs = {(min(a, b), max(a, b)) for a, b in arcs if a != b}
    deg = Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    want = Counter()
    for a, b in pairs:
        ba, bb = len(bin(deg[a])) - 2, len(bin(deg[b])) - 2
        want[(min(ba, bb), max(ba, bb))] += 1
    assert got == dict(want), (got, want)
    # hub degree 5 -> bucket 3; leaves bucket 1: the star's 5 edges
    assert got[(1, 3)] == 5


def test_closing_wave_invariants_random_graph(spark):
    """Cross-operator consistency on a random digraph: the closing-wave
    readouts must agree with each other and with the older operators on
    the same graph."""
    from graphlite_spark.algos.stats import (
        degree_mixing_matrix,
        graph_hygiene,
    )
    from graphlite_spark.algos.triangles import (
        clustering_by_degree,
        triangle_count,
    )
    from tests.reference_sim import random_digraph

    edges = random_digraph(60, 220, seed=11)
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    v = spark.range(60).select("id")

    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}

    # hygiene: arcs/self-loop/parallel bookkeeping is exact
    h = graph_hygiene(v, e).collect()[0]
    n_self = sum(1 for s, d in edges if s == d)
    assert h["n_arcs"] == len(edges)
    assert h["n_self_loops"] == n_self
    assert h["n_parallel_arcs"] == len(edges) - len(set(edges))
    assert h["n_dangling"] == 0  # ids all within range(60)

    # mixing matrix covers every undirected edge exactly once
    mm = degree_mixing_matrix(e).collect()
    assert sum(r["n_edges"] for r in mm) == len(und)

    # c(k) buckets partition the vertex set; triangle mass is consistent
    cbd = clustering_by_degree(v, e).collect()
    assert sum(r["n_vertices"] for r in cbd) == 60
    tri_total = triangle_count(e, orient="degree").collect()[0][0]
    # Σ per-vertex triangles = 3 · #triangles
    assert sum(r["n_triangles"] for r in cbd) == 3 * tri_total


def test_t_closeness_hand_computed(spark):
    """Two 5-row classes against a 6/3/1 global sensitive distribution:
    micro shares, present |p-q| sums and the absent-value complement
    all hand-computed (both classes land at t=0.2 -> bucket 2)."""
    from graphlite_spark.operators.profiling import t_closeness

    rows = (
        [(0, "a")] * 4 + [(0, "b")]
        + [(1, "a")] * 2 + [(1, "b")] * 2 + [(1, "c")]
    )
    df = spark.createDataFrame(rows, "grp long, sv string")
    got = [
        (r["t_bucket"], r["n_classes"], r["n_rows"])
        for r in t_closeness(
            df, sensitive_col="sv", qi_cols=["grp"]
        ).collect()
    ]
    # class 0: p=(.8,.2,0) vs q=(.6,.3,.1): dev 300000, complement
    # 100000 -> t 200000; class 1: p=(.4,.4,.2): dev 400000,
    # complement 0 -> t 200000
    assert got == [(2, 2, 10)]


def test_t_closeness_bruteforce(spark):
    """Scattered deterministic rows vs a python brute force of the
    identical quantize/sum/complement/bucket math."""
    from graphlite_spark.operators.profiling import t_closeness

    rows = [((i * 7) % 5, f"u{(i * i * 13) % 9}") for i in range(97)]
    df = spark.createDataFrame(rows, "grp long, sv string")
    got = {
        r["t_bucket"]: (r["n_classes"], r["n_rows"])
        for r in t_closeness(
            df, sensitive_col="sv", qi_cols=["grp"], bucket_micros=50000
        ).collect()
    }

    n = len(rows)
    from collections import Counter

    g = Counter(sv for _, sv in rows)
    qh = {sv: (1000000 * c) // n for sv, c in g.items()}
    s_q = sum(qh.values())
    hist: dict = {}
    for grp in sorted({gr for gr, _ in rows}):
        cl = Counter(sv for gr, sv in rows if gr == grp)
        n_c = sum(cl.values())
        dev = sum(
            abs((1000000 * c) // n_c - qh[sv]) for sv, c in cl.items()
        )
        present_q = sum(qh[sv] for sv in cl)
        t = (dev + (s_q - present_q)) // 2
        b = t // 50000
        nc_, nr_ = hist.get(b, (0, 0))
        hist[b] = (nc_ + 1, nr_ + n_c)
    assert got == hist
    assert sum(nr for _, nr in got.values()) == n
