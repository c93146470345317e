"""KMV neighborhood function: exact below k, estimation regime sane, and
a python replay of the deterministic sketch rule."""

from __future__ import annotations

import hashlib

from graphlite_spark.algos.anf import neighborhood_function
from tests.reference_sim import random_digraph
from tests.test_algorithms import make_graph


def _balls(edges, n, max_h):
    und = {i: set() for i in range(n)}
    for s, d in edges:
        if s != d:
            und[s].add(d); und[d].add(s)
    out = []
    for h in range(max_h + 1):
        total = 0
        for v in range(n):
            ball = {v}
            frontier = {v}
            for _ in range(h):
                frontier = {w for u in frontier for w in und[u]} - ball
                ball |= frontier
            total += len(ball)
        out.append(total)
    return out


def test_exact_when_k_large(spark):
    # k=64 >> any ball size on a 40-vertex sparse graph: the KMV sketch
    # is exact, so est_pairs equals the true neighborhood function
    edges, n = random_digraph(40, 60, seed=3), 40
    v, e = make_graph(spark, edges, n)
    got = {r["h"]: r["est_pairs"] for r in
           neighborhood_function(v, e, max_h=4, k=64).collect()}
    assert got == dict(enumerate(_balls(edges, n, 4)))


def test_estimation_regime_replay(spark):
    # k=4 forces estimation; replay the identical sketch evolution in
    # python (same md5 hashes, same k-min merge, same integer estimate)
    edges, n = random_digraph(40, 120, seed=5), 40
    und = {i: set() for i in range(n)}
    for s, d in edges:
        if s != d:
            und[s].add(d); und[d].add(s)
    k, max_h = 4, 3
    hv = {
        i: int(hashlib.md5(f"nf:{i}".encode()).hexdigest()[:12], 16)
        for i in range(n)
    }
    sk = {i: [hv[i]] for i in range(n)}
    expect = []
    mult = (k - 1) * (1 << 48)

    def nf(sketches):
        tot = 0
        for s in sketches.values():
            tot += len(s) if len(s) < k else mult // max(s)
        return tot

    expect.append(nf(sk))
    for _ in range(max_h):
        nxt = {}
        for i in range(n):
            merged = set(sk[i])
            for w in und[i]:
                merged |= set(sk[w])
            nxt[i] = sorted(merged)[:k]
        sk = nxt
        expect.append(nf(sk))
    v, e = make_graph(spark, edges, n)
    got = {r["h"]: r["est_pairs"] for r in
           neighborhood_function(v, e, max_h=max_h, k=k).collect()}
    assert got == dict(enumerate(expect))
    # monotone: balls only grow, and so do the KMV estimates (h_k only
    # ever shrinks as more hashes merge in)
    assert all(got[h + 1] >= got[h] for h in range(max_h))
