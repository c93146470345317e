"""Densest-subgraph peel: pure-python replay of the exact BKV rounds on
a planted-clique fixture — the peel must strip the sparse periphery and
the max-density iterate must be the clique."""

from __future__ import annotations

from graphlite_spark.algos.densest import densest_subgraph_peel
from tests.test_algorithms import make_graph


def _brute(pairs, n, rounds=8, eps_permille=100):
    thresh = 2 * (1000 + eps_permille)
    alive = set(range(n))
    rows = []
    for r in range(rounds + 1):
        e_t = {(a, b) for (a, b) in pairs if a in alive and b in alive}
        v_t = len(alive)
        if v_t > 0:
            rows.append((r, v_t, len(e_t), (1_000_000 * len(e_t)) // v_t))
        if r == rounds:
            break
        deg = {}
        for a, b in e_t:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        alive = {
            v
            for v in alive
            if deg.get(v, 0) * v_t * 1000 > thresh * len(e_t)
        }
    return rows


def test_densest_peel_replay(spark):
    # a 6-clique (density 2.5) + a 30-vertex path periphery hanging off it
    K = list(range(6))
    pairs = {(a, b) for a in K for b in K if a < b}
    for i in range(6, 36):
        pairs.add((i - 1, i))
    n = 36
    edges = [(a, b) for (a, b) in pairs] + [(b, a) for (a, b) in pairs]
    v, e = make_graph(spark, edges, n)

    got = sorted(
        (r["round"], r["n_vertices"], r["n_edges"], r["density_ppm"])
        for r in densest_subgraph_peel(v, e, rounds=8).collect()
    )
    want = _brute(pairs, n, rounds=8)
    assert got == want
    # the peel reaches the planted clique: some iterate is exactly
    # (6 vertices, 15 edges, density 2.5) and that is the max density
    assert (6, 15, 2_500_000) in {(v_, e_, d) for (_, v_, e_, d) in got}
    assert max(d for (_, _, _, d) in got) == 2_500_000
