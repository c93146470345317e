"""Midrank Mann-Whitney AUC of the Jaccard scorer vs pure Python."""

from __future__ import annotations

from itertools import combinations

from graphlite_spark.algos.linkpred import linkpred_auc


def _brute(und_pairs):
    nbrs: dict[int, set[int]] = {}
    for a, b in und_pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    edge = {tuple(sorted(p)) for p in und_pairs}
    rows = []
    for u, v in combinations(sorted(nbrs), 2):
        cn = len(nbrs[u] & nbrs[v])
        if cn == 0:
            continue
        score = (1_000_000 * cn) // (len(nbrs[u]) + len(nbrs[v]) - cn)
        rows.append((score, 1 if (u, v) in edge else 0))
    pos = [s for s, l in rows if l == 1]
    neg = [s for s, l in rows if l == 0]
    p, n = len(pos), len(neg)
    two_u = sum(
        2 if s > t else (1 if s == t else 0) for s in pos for t in neg
    )
    return p, n, (1_000_000 * two_u) // (2 * p * n)


def _run(spark, und):
    sym = und + [(b, a) for a, b in und]
    edf = spark.createDataFrame(sym, "src long, dst long")
    r = linkpred_auc(edf).collect()[0]
    return r["n_pos"], r["n_neg"], r["auc_micros"]


def test_linkpred_auc_bruteforce(spark):
    # two 4-cliques joined by a bridge: every edge outscores every
    # wedge non-edge -> perfect separation
    cliques = [
        (a, b) for grp in ([0, 1, 2, 3], [4, 5, 6, 7])
        for a, b in combinations(grp, 2)
    ]
    und = cliques + [(3, 4)]
    got = _run(spark, und)
    assert got == _brute(und)
    assert got[2] == 1_000_000
    # hub-centred graph with ties and an ODD 2U (midrank half-win path):
    # here non-edges outscore edges, AUC < 0.5 — exactness must hold
    # on the anti-correlated side too
    und2 = [
        (0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4),
        (4, 5), (5, 6), (6, 7),
    ]
    got2 = _run(spark, und2)
    assert got2 == _brute(und2)
    assert got2[2] < 500_000
    # a single edge produces no wedge pairs at all -> NULL AUC
    r = _run(spark, [(0, 1)])
    assert r[0] == 0 and r[2] is None
