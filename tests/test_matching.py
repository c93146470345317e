"""Maximal matching: combinatorial invariants and a pure-python replay
of the identical deterministic round rule."""

from __future__ import annotations

import hashlib

from graphlite_spark.algos.matching import maximal_matching
from tests.reference_sim import random_digraph
from tests.test_algorithms import make_graph


def _key(u: int, v: int) -> tuple[int, int, int]:
    h = int(hashlib.md5(f"match:{u}:{v}".encode()).hexdigest()[:12], 16)
    return (h, u, v)


def _replay(edges, max_rounds=16):
    live = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    mate: dict[int, int] = {}
    for _ in range(max_rounds):
        if not live:
            break
        key = {e: _key(*e) for e in live}
        vmin: dict[int, tuple[int, int, int]] = {}
        for e in live:
            for x in e:
                vmin[x] = min(vmin.get(x, key[e]), key[e])
        sel = [e for e in live if key[e] == vmin[e[0]] and key[e] == vmin[e[1]]]
        for u, v in sel:
            mate[u] = v
            mate[v] = u
        live = {e for e in live if e[0] not in mate and e[1] not in mate}
    return mate, live


def test_matching_invariants_and_replay(spark):
    edges, n = random_digraph(100, 400, seed=11), 100
    v, e = make_graph(spark, edges, n)
    got = {r["id"]: r["mate"] for r in maximal_matching(v, e).collect()}
    assert set(got) == set(range(n))
    mate, live = _replay(edges)
    assert not live, "replay did not converge in 16 rounds"
    # exact replay parity (includes every unmatched -1)
    want = {i: mate.get(i, -1) for i in range(n)}
    assert got == want
    # reciprocity: a matched vertex's mate points back
    for i, m in got.items():
        if m != -1:
            assert got[m] == i
    # maximality: no edge with both endpoints unmatched
    for s, d in edges:
        if s != d:
            assert got[s] != -1 or got[d] != -1


def test_matching_star_and_isolated(spark):
    # star 0-{1..5}: exactly one leaf pairs with the center (the leaf
    # whose edge priority is minimal); others stay -1.  Vertex 7 is
    # isolated (no edges at all) and must still appear with mate -1.
    edges = [(0, i) for i in range(1, 6)]
    v, e = make_graph(spark, edges, 8)
    got = {r["id"]: r["mate"] for r in maximal_matching(v, e).collect()}
    assert set(got) == set(range(8))
    winner = min(range(1, 6), key=lambda i: _key(0, i))
    assert got[0] == winner and got[winner] == 0
    for i in range(1, 6):
        if i != winner:
            assert got[i] == -1
    assert got[6] == -1 and got[7] == -1


def test_matching_partition_invariance(spark):
    edges, n = random_digraph(60, 200, seed=5), 60
    v, e = make_graph(spark, edges, n)
    a = {r["id"]: r["mate"]
         for r in maximal_matching(v, e.repartition(2)).collect()}
    b = {r["id"]: r["mate"]
         for r in maximal_matching(v, e.repartition(8)).collect()}
    assert a == b
